"""HF-hub loading tests (reference tests/test_hf_hub.py analogues, fully
offline): local snapshot-dir loading through ``load_model``, the
config-validated-BEFORE-weights download ordering, revision pinning, and
the family-schema registry fallback — all against a recorded fake
``hf_hub_download``."""

import json
import os

import numpy as np
import pytest
import yaml

from aimnetcentral_tpu.models.loader import fetch_hf_snapshot, load_model

from conftest import random_molecule


@pytest.fixture(scope="module")
def hf_repo_dir(reference_aimnet2, tmp_path_factory):
    """A fake local HF snapshot: config.json + ensemble_0.safetensors."""
    from safetensors.numpy import save_file

    model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    repo = tmp_path_factory.mktemp("hf_repo")
    # exported artifacts are LR-STRIPPED (the allowlist rejects embedded
    # LRCoulomb by design) — externalize like train/export does
    cfg = dict(cfg_yaml)
    outputs = dict(cfg["kwargs"]["outputs"])
    lr_kwargs = outputs.pop("lrcoulomb")["kwargs"]
    outputs["srcoulomb"] = {
        "class": "aimnet.modules.SRCoulomb",
        "kwargs": {"rc": lr_kwargs["rc"], "key_in": "charges", "key_out": "energy"},
    }
    cfg["kwargs"] = {**cfg["kwargs"], "outputs": outputs}
    config = {
        "format_version": 2,
        "model_yaml": yaml.safe_dump(cfg, sort_keys=False),
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
    }
    with open(repo / "config.json", "w") as f:
        json.dump(config, f)
    sd = {
        k: v.detach().numpy()
        for k, v in model.state_dict().items()
        if not k.startswith("outputs.lrcoulomb")
    }
    sd["outputs.srcoulomb.rc"] = np.full((), lr_kwargs["rc"], np.float32)
    save_file(sd, str(repo / "ensemble_0.safetensors"))
    return str(repo), config


def test_load_model_dispatches_local_hf_dir(hf_repo_dir, rng):
    from aimnetcentral_tpu.calculators import AIMNet2Calculator

    repo, _config = hf_repo_dir
    loaded = load_model(repo)
    assert loaded.metadata["format_version"] == 2
    calc = AIMNet2Calculator(loaded.as_calculator_model())
    coord, numbers = random_molecule(rng, 6)
    out = calc({"coord": coord, "numbers": numbers}, forces=True)
    assert np.isfinite(out["energy"]).all()
    assert out["forces"].shape == (6, 3)


class _RecordingHub:
    """Stands in for huggingface_hub.hf_hub_download; records request order."""

    def __init__(self, repo_dir):
        self.repo_dir = repo_dir
        self.calls: list[tuple[str, str, str | None]] = []

    def __call__(self, repo_id, filename, revision=None, token=None):
        self.calls.append((repo_id, filename, revision))
        path = os.path.join(self.repo_dir, filename)
        if not os.path.exists(path):
            raise FileNotFoundError(filename)
        return path


@pytest.fixture()
def record_hub(hf_repo_dir, monkeypatch):
    import huggingface_hub

    repo, _ = hf_repo_dir
    rec = _RecordingHub(repo)
    monkeypatch.setattr(huggingface_hub, "hf_hub_download", rec)
    return rec


def test_fetch_validates_config_before_weights(record_hub):
    local = fetch_hf_snapshot("acme/aimnet2-demo", revision="abc123")
    files = [c[1] for c in record_hub.calls]
    assert files == ["config.json", "ensemble_0.safetensors"]
    # revision pinning propagates to EVERY download
    assert all(c[2] == "abc123" for c in record_hub.calls)
    assert os.path.isdir(local)


def test_fetch_rejects_malicious_yaml_without_downloading_weights(
    hf_repo_dir, tmp_path, monkeypatch
):
    """An artifact whose model_yaml names an unlisted class must fail AFTER
    config.json but BEFORE any weights request (reference
    hf_hub.py:330-365 ordering)."""
    import huggingface_hub

    repo, config = hf_repo_dir
    bad = dict(config, model_yaml="class: evil.Backdoor\nkwargs: {}\n")
    with open(tmp_path / "config.json", "w") as f:
        json.dump(bad, f)
    rec = _RecordingHub(str(tmp_path))
    monkeypatch.setattr(huggingface_hub, "hf_hub_download", rec)
    with pytest.raises(ValueError, match="Untrusted|not allowed"):
        fetch_hf_snapshot("acme/evil")
    assert [c[1] for c in rec.calls] == ["config.json"]


def test_fetch_family_schema_falls_back_to_registry(tmp_path, monkeypatch):
    """A family-level config.json (no model_yaml, member_names list) resolves
    through the model registry (reference hf_hub.py:217-273)."""
    import huggingface_hub

    from aimnetcentral_tpu.calculators import registry

    config = {
        "format_version": 2,
        "cutoff": 5.0,
        "needs_coulomb": True,
        "needs_dispersion": False,
        "coulomb_mode": "none",
        "d3_params": None,
        "has_embedded_lr": False,
        "has_embedded_d3ts": False,
        "implemented_species": [1, 6, 7, 8],
        "member_names": ["aimnet2-wb97m-d3_0", "aimnet2-wb97m-d3_1"],
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(config, f)
    rec = _RecordingHub(str(tmp_path))
    monkeypatch.setattr(huggingface_hub, "hf_hub_download", rec)
    fetched = []
    monkeypatch.setattr(
        registry, "download_model", lambda name: fetched.append(name) or "/fake/path.pt"
    )
    assert fetch_hf_snapshot("acme/family", member=1) == "/fake/path.pt"
    assert fetched == ["aimnet2-wb97m-d3_1"]
    # out-of-range member is a clear error, not an IndexError
    with pytest.raises(ValueError, match="out of range"):
        fetch_hf_snapshot("acme/family", member=5)


def test_fetch_incomplete_family_config_is_rejected(tmp_path, monkeypatch):
    import huggingface_hub

    config = {
        "format_version": 2,
        "cutoff": 5.0,
        "needs_coulomb": False,
        "needs_dispersion": False,
        "coulomb_mode": "none",
        "d3_params": None,
        "has_embedded_lr": True,
        "has_embedded_d3ts": False,
        "implemented_species": [1],
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(config, f)
    rec = _RecordingHub(str(tmp_path))
    monkeypatch.setattr(huggingface_hub, "hf_hub_download", rec)
    with pytest.raises(ValueError, match="member_names"):
        fetch_hf_snapshot("acme/incomplete")


def test_fetch_rejects_non_mapping_config_root(tmp_path, monkeypatch):
    # config.json whose root is a list must fail cleanly, before weights
    # (reference tests/test_hf_hub.py:639-645)
    import huggingface_hub

    with open(tmp_path / "config.json", "w") as f:
        json.dump(["not", "a", "mapping"], f)
    rec = _RecordingHub(str(tmp_path))
    monkeypatch.setattr(huggingface_hub, "hf_hub_download", rec)
    with pytest.raises(TypeError, match="mapping"):
        fetch_hf_snapshot("acme/broken")
    assert [c[1] for c in rec.calls] == ["config.json"]


def test_fetch_rejects_invalid_format_version(hf_repo_dir, tmp_path, monkeypatch):
    # (reference tests/test_hf_hub.py:121-141)
    import huggingface_hub

    _, config = hf_repo_dir
    bad = dict(config, format_version=99)
    with open(tmp_path / "config.json", "w") as f:
        json.dump(bad, f)
    rec = _RecordingHub(str(tmp_path))
    monkeypatch.setattr(huggingface_hub, "hf_hub_download", rec)
    with pytest.raises(ValueError, match="format_version"):
        fetch_hf_snapshot("acme/badver")
    assert [c[1] for c in rec.calls] == ["config.json"]


@pytest.mark.parametrize("member", [-1, "x", 2.5, None])
def test_fetch_rejects_invalid_member_before_any_repo_access(
    monkeypatch, member
):
    # invalid ensemble member fails BEFORE config.json is even requested
    # (reference tests/test_hf_hub.py:181-239)
    import huggingface_hub

    def explode(*a, **k):  # no repo access allowed
        raise AssertionError("hub was contacted")

    monkeypatch.setattr(huggingface_hub, "hf_hub_download", explode)
    with pytest.raises(ValueError, match="member"):
        fetch_hf_snapshot("acme/any", member=member)


def test_registry_fallback_accepts_registry_names_only(tmp_path, monkeypatch):
    """A malicious family config cannot point the fallback at arbitrary
    artifacts — member_names resolve through the pinned registry or fail
    (reference tests/test_hf_hub.py:86-103)."""
    import huggingface_hub

    config = {
        "format_version": 2,
        "cutoff": 5.0,
        "needs_coulomb": False,
        "needs_dispersion": False,
        "coulomb_mode": "none",
        "d3_params": None,
        "has_embedded_lr": False,
        "has_embedded_d3ts": False,
        "implemented_species": [1],
        "member_names": ["https://evil.example/trojan.pt"],
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(config, f)
    rec = _RecordingHub(str(tmp_path))
    monkeypatch.setattr(huggingface_hub, "hf_hub_download", rec)
    with pytest.raises(KeyError, match="not in registry"):
        fetch_hf_snapshot("acme/trojan")


def test_hf_load_preserves_float64_sae(hf_repo_dir):
    """Atomic-shift SAE tables survive the HF round trip in exact float64
    (reference tests/test_hf_hub.py:796-828; our SAE is applied host-side,
    see AtomicShiftHead docs)."""
    repo, _ = hf_repo_dir
    loaded = load_model(repo)
    sae = loaded.aux["sae"]
    assert sae, "expected at least one atomic-shift SAE table"
    for table in sae.values():
        assert np.asarray(table).dtype == np.float64


def test_hf_missing_weight_key_raises_by_name(hf_repo_dir, tmp_path):
    """A safetensors file missing a required parameter fails with the
    parameter's name (reference tests/test_hf_hub.py:850-868)."""
    import shutil

    from safetensors.numpy import load_file, save_file

    repo, _ = hf_repo_dir
    broken = tmp_path / "repo"
    broken.mkdir()
    shutil.copy(os.path.join(repo, "config.json"), broken / "config.json")
    sd = load_file(os.path.join(repo, "ensemble_0.safetensors"))
    dropped = next(k for k in sd if "weight" in k)
    sd.pop(dropped)
    save_file(sd, str(broken / "ensemble_0.safetensors"))
    with pytest.raises(ValueError, match="missing"):
        load_model(str(broken))


def test_hf_unexpected_weight_key_warns(hf_repo_dir, tmp_path):
    import shutil

    from safetensors.numpy import load_file, save_file

    repo, _ = hf_repo_dir
    extra = tmp_path / "repo"
    extra.mkdir()
    shutil.copy(os.path.join(repo, "config.json"), extra / "config.json")
    sd = load_file(os.path.join(repo, "ensemble_0.safetensors"))
    sd["outputs.mystery.weight"] = np.zeros(3, np.float32)
    save_file(sd, str(extra / "ensemble_0.safetensors"))
    with pytest.warns(UserWarning, match="mystery|unconsumed|unexpected"):
        load_model(str(extra))
