"""Export round-trip INTO the PyTorch reference: an artifact written by
train/export.py must load through the reference's own ``load_model``
(reference aimnet/models/base.py:116-211) and produce matching energies.
This is the interop gate the round-1 PARITY.md claimed but never tested."""

import numpy as np
import jax
import pytest

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.calculators import AIMNet2Calculator
from aimnetcentral_tpu.models import AIMNet2Config, aimnet2_init
from aimnetcentral_tpu.models.heads import (
    AtomicShiftHead,
    AtomicSumHead,
    LRCoulombHead,
    OutputHead,
)
from aimnetcentral_tpu.models.loader import load_v2_artifact
from aimnetcentral_tpu.models.modules import MLPSpec
from aimnetcentral_tpu.train.export import export_model

from conftest import _install_reference_stubs, random_molecule

SAE = {1: -13.6, 6: -1029.5, 7: -1485.3, 8: -2042.6}


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """A small trained-in-JAX model exported to the v2 .pt format."""
    cfg = AIMNet2Config(
        hidden=((96,), (96,), (96, 64)),
        outputs=(
            (
                "energy_mlp",
                OutputHead(
                    n_in=256,
                    n_out=1,
                    key_in="aim",
                    key_out="energy",
                    mlp=MLPSpec(hidden=(64,), last_linear=True),
                ),
            ),
            # NOTE: no SRRep head — the reference's default artifact import
            # allowlist (reference aimnet/models/artifact_validation.py:46-71)
            # does not include it; released artifacts never embed SRRep.
            ("atomic_shift", AtomicShiftHead(key_in="energy", key_out="energy")),
            ("atomic_sum", AtomicSumHead(key_in="energy", key_out="energy")),
            (
                "lrcoulomb",
                LRCoulombHead(rc=4.6, method="simple", key_in="charges", key_out="energy"),
            ),
        ),
    )
    params = aimnet2_init(jax.random.key(7), cfg)
    path = str(tmp_path_factory.mktemp("export") / "jax_trained.pt")
    export_model(
        params, cfg, path, sae=SAE, implemented_species=sorted(SAE)
    )
    return path, params, cfg


def test_reference_load_model_accepts_export(exported):
    path, _params, _cfg = exported
    _install_reference_stubs()
    from aimnet.models.base import load_model as ref_load_model

    model, meta = ref_load_model(path)
    assert meta["format_version"] == 2
    assert meta["needs_coulomb"] is True
    assert meta["coulomb_mode"] == "sr_embedded"
    assert sorted(meta["implemented_species"]) == sorted(SAE)
    # SAE survived in float64 inside the reference module
    import torch

    tensors = dict(model.named_parameters())
    tensors.update(dict(model.named_buffers()))
    shift = tensors["outputs.atomic_shift.shifts.weight"]
    assert shift.dtype == torch.float64
    assert shift[1, 0].item() == pytest.approx(SAE[1], abs=1e-9)


def test_reference_eval_matches_jax(exported, rng):
    path, params, cfg = exported
    _install_reference_stubs()
    import torch
    from aimnet.models.base import load_model as ref_load_model

    model, _meta = ref_load_model(path)
    coord, numbers = random_molecule(rng, 11)

    t_coord = torch.tensor(coord, dtype=torch.float32, requires_grad=True)
    data = {
        "coord": t_coord.unsqueeze(0),
        "numbers": torch.tensor(numbers, dtype=torch.int64).unsqueeze(0),
        "charge": torch.tensor([0.0], dtype=torch.float32),
    }
    ref_out = model(data)
    (g,) = torch.autograd.grad(ref_out["energy"].sum(), t_coord)
    ref_forces = -g.detach().numpy()
    ref_e = ref_out["energy"].detach().numpy().reshape(-1)
    ref_q = ref_out["charges"].detach().numpy().reshape(-1)

    # our loader reads the exported artifact back; compare the bare model
    # (no external Coulomb) against the reference's bare eval — the explicit
    # needs_coulomb=False override keeps the calculator from re-attaching
    # what the metadata asks for
    loaded = load_v2_artifact(path, attach_lr=False)
    calc = AIMNet2Calculator(loaded.as_calculator_model(), needs_coulomb=False)
    out = calc({"coord": coord, "numbers": numbers}, forces=True, validate_species=True)

    # energy: |E| here is a few kilo-eV (the f64 SAE bake dominates), so the
    # bound is the SAE's exact f64 transfer + f32 NN noise, not the loose
    # 2e-4 cross-framework default
    np.testing.assert_allclose(out["energy"], ref_e, atol=2e-5)
    np.testing.assert_allclose(out["charges"], ref_q, atol=1e-4)
    mae = np.abs(out["forces"].reshape(-1, 3) - ref_forces).mean()
    assert mae < 1e-4, f"force MAE vs reference: {mae:.2e} eV/A"


def test_export_metadata_validates_species(exported, rng):
    path, _params, _cfg = exported
    loaded = load_v2_artifact(path, attach_lr=False)
    calc = AIMNet2Calculator(loaded.as_calculator_model(), needs_coulomb=False)
    coord, numbers = random_molecule(rng, 6)
    bad = numbers.copy()
    bad[0] = 35  # Br not in implemented_species
    with pytest.raises(ValueError, match="implemented_species"):
        calc({"coord": coord, "numbers": bad})
