"""Persistent XLA compilation cache.

The fused 10k-atom MD executable costs ~80 s of real XLA compile per
process (docs/performance.md).  JAX's persistent compilation cache
amortizes that across processes: the first run pays the compile, every
subsequent process with identical HLO (same shapes, same engine flags)
deserializes the executable in seconds.  This is the TPU-native analogue
of the reference's on-disk Warp kernel cache
(/root/reference/docs/tutorials/performance.md:31-36 — "10-30 s first
call, disk-cached").

Opt-out with AIMNET_XLA_CACHE=off; override the location with
AIMNET_XLA_CACHE=/path.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Safe to call multiple times (idempotent) and before or after the
    backend initializes.  Returns the cache dir, or None if disabled.
    """
    global _ENABLED
    env = os.environ.get("AIMNET_XLA_CACHE", "")
    if env.lower() in ("off", "0", "none", "disable"):
        return None
    if _ENABLED:
        import jax

        return jax.config.jax_compilation_cache_dir
    path = path or env or os.path.join(
        os.environ.get("AIMNET_CACHE_DIR", os.path.expanduser("~/.cache/aimnet-tpu")),
        "xla_cache",
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache anything that took >1 s to compile, regardless of size —
        # the MD step executable is the target, tiny reductions are not
        min_s = float(os.environ.get("AIMNET_XLA_CACHE_MIN_S", "1.0"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_s)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _ENABLED = True
        return path
    except Exception:  # pragma: no cover - never break user code over a cache
        return None
