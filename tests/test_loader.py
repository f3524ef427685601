"""Artifact loading tests: v2 .pt round-trip, metadata-driven external LR
attachment, registry resolution, forbidden-kwarg validation."""

import numpy as np
import pytest

from aimnetcentral_tpu.calculators import AIMNet2Calculator
from aimnetcentral_tpu.calculators.registry import (
    available_models,
    get_family_policy,
    resolve_name,
)
from aimnetcentral_tpu.models.loader import load_model, load_v2_artifact

from conftest import random_molecule, REFERENCE_ROOT
import os


@pytest.fixture(scope="module")
def v2_artifact(reference_aimnet2, tmp_path_factory):
    """Build a v2 .pt artifact from the reference torch model (sr_embedded
    variant: SRCoulomb in-model, external full Coulomb via metadata)."""
    import torch

    model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    import yaml as _yaml

    # strip the embedded LRCoulomb, add SRCoulomb — externalized-LR artifact
    cfg = dict(cfg_yaml)
    outputs = dict(cfg["kwargs"]["outputs"])
    lr_kwargs = outputs.pop("lrcoulomb")["kwargs"]
    outputs["srcoulomb"] = {
        "class": "aimnet.modules.SRCoulomb",
        "kwargs": {"rc": lr_kwargs["rc"], "key_in": "charges", "key_out": "energy"},
    }
    cfg["kwargs"] = {**cfg["kwargs"], "outputs": outputs}

    sd = {
        k: v
        for k, v in model.state_dict().items()
        if not k.startswith("outputs.lrcoulomb")
    }
    sd["outputs.srcoulomb.rc"] = torch.tensor(float(lr_kwargs["rc"]))

    artifact = {
        "format_version": 2,
        "model_yaml": _yaml.safe_dump(cfg, sort_keys=False),
        "cutoff": 5.0,
        "needs_coulomb": True,
        "needs_dispersion": False,
        "coulomb_mode": "sr_embedded",
        "coulomb_sr_rc": lr_kwargs["rc"],
        "coulomb_sr_envelope": "exp",
        "d3_params": None,
        "has_embedded_lr": True,
        "has_embedded_d3ts": False,
        "implemented_species": [1, 6, 7, 8],
        "state_dict": sd,
    }
    path = tmp_path_factory.mktemp("artifacts") / "model.pt"
    torch.save(artifact, str(path))
    return str(path), model


def test_v2_roundtrip_matches_embedded_lr(v2_artifact, rng):
    """sr_embedded artifact + external simple Coulomb == embedded LRCoulomb
    model: -SR (in model) + FULL (external, subtract_sr=False) == FULL - SR."""
    path, torch_model = v2_artifact
    loaded = load_model(path)
    assert loaded.metadata["needs_coulomb"]
    assert loaded.metadata["coulomb_mode"] == "sr_embedded"
    names = [n for n, _ in loaded.cfg.outputs]
    assert "external_coulomb" in names

    coord, numbers = random_molecule(rng, 10)
    calc = AIMNet2Calculator(loaded.as_calculator_model())
    out = calc({"coord": coord, "numbers": numbers}, forces=True)

    # reference model (with embedded LRCoulomb) on same geometry
    import torch

    data = {
        "coord": torch.tensor(coord).unsqueeze(0),
        "numbers": torch.tensor(numbers).unsqueeze(0),
        "charge": torch.zeros(1),
    }
    with torch.no_grad():
        ref = torch_model(data)
    np.testing.assert_allclose(
        out["energy"], ref["energy"].numpy().reshape(-1), atol=5e-4
    )


def test_forbidden_kwargs_rejected(v2_artifact, tmp_path):
    import torch
    import yaml as _yaml

    path, _ = v2_artifact
    data = torch.load(path, map_location="cpu", weights_only=True)
    cfg = _yaml.safe_load(data["model_yaml"])
    # lr.DispParam is the allowlisted spelling (the barrel path is
    # deliberately NOT allowlisted, matching the reference); the forbidden
    # ptfile kwarg must still be rejected on an allowlisted class
    cfg["kwargs"]["outputs"]["evil"] = {
        "class": "aimnet.modules.lr.DispParam",
        "kwargs": {"ptfile": "/etc/passwd"},
    }
    data["model_yaml"] = _yaml.safe_dump(cfg, sort_keys=False)
    bad = tmp_path / "bad.pt"
    torch.save(data, str(bad))
    with pytest.raises(ValueError, match="forbidden"):
        load_v2_artifact(str(bad))


def test_unknown_head_class_rejected(v2_artifact, tmp_path):
    import torch
    import yaml as _yaml

    path, _ = v2_artifact
    data = torch.load(path, map_location="cpu", weights_only=True)
    cfg = _yaml.safe_load(data["model_yaml"])
    cfg["kwargs"]["outputs"]["evil"] = {"class": "os.system", "kwargs": {}}
    data["model_yaml"] = _yaml.safe_dump(cfg, sort_keys=False)
    bad = tmp_path / "bad2.pt"
    torch.save(data, str(bad))
    # rejected by the import policy before the builder registry is consulted
    with pytest.raises(ValueError, match="Untrusted import path"):
        load_v2_artifact(str(bad))
    # unsafe mode skips the allowlist but the closed builder registry still
    # cannot construct it (structural layer; nothing ever executes)
    with pytest.raises(ValueError, match="unsupported output head"):
        load_v2_artifact(str(bad), model_import_mode="unsafe")


def test_registry_resolution():
    names = available_models()
    assert "aimnet2-wb97m-d3_0" in names
    canonical, entry = resolve_name("aimnet2")  # alias
    assert entry["sha256"]
    assert entry["url"].startswith("https://")
    pol = get_family_policy("rxn")
    assert pol.supports_charged_systems is False
    assert pol.posthoc_d3_params["s8"] == pytest.approx(0.3908)
    assert get_family_policy("wb97m-d3").supports_charged_systems is None
