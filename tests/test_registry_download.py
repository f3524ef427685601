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
