"""Registry download machinery tests against a fake transport (reference
tests/test_model_registry.py analogues): checksum verification, atomic
writes, one-shot corrupt-cache replacement, cache reuse without network."""

import hashlib
import os

import pytest

from aimnetcentral_tpu.calculators import registry


class _FakeResponse:
    def __init__(self, payload: bytes):
        self.payload = payload

    def raise_for_status(self):
        pass

    def iter_content(self, _size):
        yield self.payload

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


@pytest.fixture()
def fake_registry(tmp_path, monkeypatch):
    payload = b"fake artifact bytes"
    sha = hashlib.sha256(payload).hexdigest()
    entry = {
        "file": "demo_model.pt",
        "url": "https://example.invalid/demo_model.pt",
        "sha256": sha,
        "family": "demo",
    }
    monkeypatch.setattr(registry, "cache_dir", lambda: str(tmp_path))
    monkeypatch.setattr(registry, "resolve_name", lambda name: ("demo", entry))
    calls = []

    import requests

    def fake_get(url, stream=True, timeout=None):
        calls.append(url)
        return _FakeResponse(payload)

    monkeypatch.setattr(requests, "get", fake_get)
    return payload, sha, entry, calls, tmp_path


def test_download_verifies_checksum_and_caches(fake_registry):
    payload, _sha, entry, calls, tmp_path = fake_registry
    p = registry.download_model("demo")
    assert open(p, "rb").read() == payload
    assert calls == [entry["url"]]
    # second call: cache hit, NO network
    assert registry.download_model("demo") == p
    assert len(calls) == 1


def test_corrupt_cache_is_replaced_once(fake_registry):
    payload, _sha, entry, calls, tmp_path = fake_registry
    dest = tmp_path / entry["file"]
    dest.write_bytes(b"corrupted!!")
    p = registry.download_model("demo")
    assert open(p, "rb").read() == payload
    assert len(calls) == 1  # re-downloaded exactly once


def test_checksum_mismatch_leaves_no_artifact(fake_registry, monkeypatch):
    _payload, _sha, entry, calls, tmp_path = fake_registry
    import requests

    monkeypatch.setattr(
        requests, "get", lambda url, stream=True, timeout=None: _FakeResponse(b"evil")
    )
    with pytest.raises(RuntimeError, match="checksum mismatch"):
        registry.download_model("demo")
    # atomicity: neither the dest nor a temp file survives
    assert os.listdir(tmp_path) == []


def test_force_redownloads(fake_registry):
    _payload, _sha, _entry, calls, _tmp = fake_registry
    registry.download_model("demo")
    registry.download_model("demo", force=True)
    assert len(calls) == 2


def test_ensemble_calculator_from_registry(tmp_path, monkeypatch):
    """EnsembleCalculator.from_registry loads EVERY {base}_{i} member of a
    family, stacks params, and averages the per-member float64 SAE tables
    (exact for the ensemble mean)."""
    import jax
    import numpy as np

    from aimnetcentral_tpu.calculators import AIMNet2Calculator
    from aimnetcentral_tpu.calculators.ensemble import EnsembleCalculator
    from aimnetcentral_tpu.models import (
        AEVConfig,
        AIMNet2Config,
        aimnet2_init,
    )
    from aimnetcentral_tpu.models.heads import (
        AtomicShiftHead,
        AtomicSumHead,
        OutputHead,
    )
    from aimnetcentral_tpu.models.modules import MLPSpec
    from aimnetcentral_tpu.train.export import export_model

    cfg = AIMNet2Config(
        aev=AEVConfig(rc_s=5.0, nshifts_s=8),
        nfeature=4,
        d2features=True,
        ncomb_v=4,
        hidden=((16,), (16,), (16,)),
        aim_size=16,
        outputs=(
            ("energy_mlp", OutputHead(n_in=16, n_out=1, key_in="aim",
                                      key_out="energy",
                                      mlp=MLPSpec(hidden=(8,), last_linear=True))),
            ("atomic_shift", AtomicShiftHead(key_in="energy", key_out="energy")),
            ("atomic_sum", AtomicSumHead(key_in="energy", key_out="energy")),
        ),
    )
    files = {}
    for i in range(2):
        params = aimnet2_init(jax.random.key(i), cfg)
        path = str(tmp_path / f"demo_{i}.pt")
        # per-member SAE differs: the averaged table must be used
        export_model(params, cfg, path, sae={1: -13.0 - i, 8: -2000.0 + i},
                     implemented_species=[1, 8])
        files[f"demo_{i}"] = path

    reg = {
        "models": {
            n: {"file": os.path.basename(p), "url": f"https://x.invalid/{n}",
                "sha256": "0" * 64}
            for n, p in files.items()
        },
        "aliases": {"demo-alias": "demo"},
        "families": {},
    }
    monkeypatch.setattr(registry, "_load_registry", lambda: reg)
    monkeypatch.setattr(
        registry, "download_model", lambda name, force=False: files[name]
    )

    assert registry.ensemble_members("demo") == ["demo_0", "demo_1"]
    assert registry.ensemble_members("demo-alias") == ["demo_0", "demo_1"]
    assert registry.ensemble_members("demo_1") == ["demo_0", "demo_1"]

    ens = EnsembleCalculator.from_registry("demo")
    data = {"coord": [[0, 0, 0.119], [0, 0.763, -0.477], [0, -0.763, -0.477]],
            "numbers": [8, 1, 1]}
    out = ens(data)

    from aimnetcentral_tpu.models.loader import load_model

    singles = [
        AIMNet2Calculator(load_model(p).as_calculator_model())(data)["energy"][0]
        for p in files.values()
    ]
    assert out["energy"][0] == pytest.approx(np.mean(singles), abs=1e-4)
    # the averaged SAE table really is the member mean
    sae = next(iter(ens.aux["sae"].values()))
    assert sae[1] == pytest.approx(-13.5) and sae[8] == pytest.approx(-1999.5)
