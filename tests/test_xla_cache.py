"""Persistent XLA compilation cache wiring (xla_cache.py).

TPU-native analogue of the reference's on-disk Warp kernel cache
(/root/reference/docs/tutorials/performance.md:31-36).
"""

from __future__ import annotations

import os

import jax


def test_enable_persistent_cache_idempotent(tmp_path, monkeypatch):
    import aimnetcentral_tpu.xla_cache as xc
    from aimnetcentral_tpu.xla_cache import enable_persistent_cache

    # earlier tests (CLI journeys) may have enabled the process-wide cache
    # already — reset the latch so this test owns its directory
    monkeypatch.setattr(xc, "_ENABLED", False)
    monkeypatch.setenv("AIMNET_XLA_CACHE", str(tmp_path / "xc"))
    p = enable_persistent_cache()
    assert p == str(tmp_path / "xc")
    assert os.path.isdir(p)
    assert jax.config.jax_compilation_cache_dir == p
    # idempotent: second call keeps the first directory
    monkeypatch.setenv("AIMNET_XLA_CACHE", str(tmp_path / "other"))
    assert enable_persistent_cache() == p


def test_enable_persistent_cache_opt_out(monkeypatch):
    import aimnetcentral_tpu.xla_cache as xc

    monkeypatch.setattr(xc, "_ENABLED", False)
    monkeypatch.setenv("AIMNET_XLA_CACHE", "off")
    assert xc.enable_persistent_cache() is None
