"""Legacy .jpt -> v2 conversion test.

The current reference code is no longer TorchScript-scriptable (its .jpt
artifacts predate it), so we fabricate a TorchScript container with the
reference's state_dict layout + cutoff attribute — exactly what
convert_v1_model consumes — and verify the converted artifact reproduces the
original (embedded-LR) model's energies.
"""

import numpy as np
import pytest

from conftest import random_molecule


def _make_fake_jpt(sd, cutoff, path):
    import torch

    class Leaf(torch.nn.Module):
        def forward(self) -> int:
            return 0

    root = Leaf()
    for key, val in sd.items():
        parts = key.split(".")
        mod = root
        for p in parts[:-1]:
            if not hasattr(mod, p):
                mod.add_module(p, Leaf())
            mod = getattr(mod, p)
        mod.register_buffer(parts[-1], val.detach().clone())
    root.cutoff = float(cutoff)
    scripted = torch.jit.script(root)
    scripted.save(path)


def test_convert_v1_roundtrip(reference_aimnet2, rng, tmp_path):
    import torch

    from aimnetcentral_tpu.calculators import AIMNet2Calculator
    from aimnetcentral_tpu.models.convert_v1 import convert_v1_model
    from aimnetcentral_tpu.models.loader import load_model

    model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    sd = model.state_dict()

    jpt = str(tmp_path / "legacy.jpt")
    _make_fake_jpt(sd, 5.0, jpt)

    import yaml as _yaml

    ycfg = str(tmp_path / "model.yaml")
    with open(ycfg, "w") as f:
        _yaml.safe_dump(cfg_yaml, f, sort_keys=False)

    out_pt = str(tmp_path / "converted.pt")
    loaded, artifact = convert_v1_model(jpt, ycfg, output_path=out_pt)
    assert artifact["needs_coulomb"]  # LR externalized
    assert artifact["coulomb_mode"] == "sr_embedded"
    assert artifact["cutoff"] == 5.0

    # the converted artifact (SRCoulomb in-model + external full Coulomb)
    # must reproduce the original embedded-LR model
    reloaded = load_model(out_pt)
    calc = AIMNet2Calculator(reloaded.as_calculator_model())
    coord, numbers = random_molecule(rng, 9)
    out = calc({"coord": coord, "numbers": numbers})

    data = {
        "coord": torch.tensor(coord).unsqueeze(0),
        "numbers": torch.tensor(numbers).unsqueeze(0),
        "charge": torch.zeros(1),
    }
    with torch.no_grad():
        ref = model(data)
    np.testing.assert_allclose(
        out["energy"], ref["energy"].numpy().reshape(-1), atol=5e-4
    )
