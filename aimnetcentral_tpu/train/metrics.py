"""Streaming regression metrics: MAE / RMSE / R^2 per target
(reference aimnet/train/metrics.py:87-187).

Accumulators are plain pytrees of device scalars, so they can be updated
inside jit and psum-reduced across a device mesh (the reference's
``idist.all_reduce``, aimnet/train/metrics.py:146-152, becomes a
``jax.lax.psum`` when the eval step runs under ``shard_map``; on a single
host the sums are already global because batches are fully evaluated).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

EV2KCAL = 23.060547830619026  # eV -> kcal/mol


@dataclasses.dataclass
class MetricConfig:
    key_pred: str
    key_true: str
    peratom: bool = False  # normalize counts by atoms instead of molecules
    scale: float = 1.0  # e.g. EV2KCAL for reporting


class RegMultiMetric:
    """Accumulates sum/abs-sum/sq-sum statistics per target."""

    def __init__(self, configs: list[MetricConfig]):
        self.configs = configs
        self.reset()

    def reset(self) -> None:
        self._acc = {
            c.key_pred: {
                "n": 0.0,
                "sum_err": 0.0,
                "sum_abs": 0.0,
                "sum_sq": 0.0,
                "sum_true": 0.0,
                "sum_true_sq": 0.0,
            }
            for c in self.configs
        }

    def update(self, pred: dict, true: dict, weights: dict | None = None) -> None:
        """Accumulate one batch (host-side numpy; padding excluded via a
        per-target boolean mask in ``weights``)."""
        for c in self.configs:
            if c.key_true not in true or c.key_pred not in pred:
                continue
            p = np.asarray(pred[c.key_pred], dtype=np.float64).ravel()
            t = np.asarray(true[c.key_true], dtype=np.float64).ravel()
            if weights and c.key_pred in weights:
                w = np.asarray(weights[c.key_pred], dtype=bool).ravel()
                # broadcast per-atom masks over vector components
                if w.shape[0] != p.shape[0] and p.shape[0] % w.shape[0] == 0:
                    w = np.repeat(w, p.shape[0] // w.shape[0])
                p, t = p[w], t[w]
            err = p - t
            a = self._acc[c.key_pred]
            a["n"] += len(err)
            a["sum_err"] += err.sum()
            a["sum_abs"] += np.abs(err).sum()
            a["sum_sq"] += (err**2).sum()
            a["sum_true"] += t.sum()
            a["sum_true_sq"] += (t**2).sum()

    def update_from_stats(self, stats: dict[str, dict[str, Any]]) -> None:
        """Merge device-land ``batch_stats`` pytrees (possibly already
        psum-reduced over the dp axis) into the host accumulators."""
        for key, st in stats.items():
            a = self._acc[key]
            for f, v in st.items():
                a[f] += float(np.asarray(v))

    def compute(self, multihost: bool = False) -> dict[str, float]:
        """``multihost=True`` all-reduces the accumulators across
        ``jax.distributed`` processes first (the reference's
        ``idist.all_reduce``, aimnet/train/metrics.py:146-152)."""
        if multihost:
            self._acc = allreduce_accumulators_multihost(self._acc)
        out: dict[str, float] = {}
        for c in self.configs:
            a = self._acc[c.key_pred]
            n = max(a["n"], 1.0)
            mae = a["sum_abs"] / n * c.scale
            rmse = np.sqrt(a["sum_sq"] / n) * c.scale
            var = a["sum_true_sq"] / n - (a["sum_true"] / n) ** 2
            r2 = 1.0 - (a["sum_sq"] / n) / var if var > 0 else float("nan")
            out[f"{c.key_pred}_mae"] = float(mae)
            out[f"{c.key_pred}_rmse"] = float(rmse)
            out[f"{c.key_pred}_r2"] = float(r2)
        return out


# ---------------------------------------------------------------------------
# distributed accumulation (reference aimnet/train/metrics.py:146-152)


def batch_stats(
    pred: Array, true: Array, mask: Array | None = None
) -> dict[str, Array]:
    """Device-land accumulator contribution for one target: jit-safe, so it
    can run INSIDE a sharded eval step and be ``jax.lax.psum``-reduced over
    the dp mesh axis (``reduce_stats``) before anything reaches the host."""
    p = pred.reshape(-1).astype(jnp.float32)
    t = true.reshape(-1).astype(jnp.float32)
    if mask is not None:
        m = mask.reshape(-1)
        if m.shape[0] != p.shape[0] and p.shape[0] % m.shape[0] == 0:
            m = jnp.repeat(m, p.shape[0] // m.shape[0])
        m = m.astype(jnp.float32)
    else:
        m = jnp.ones_like(p)
    err = (p - t) * m
    return {
        "n": m.sum(),
        "sum_err": err.sum(),
        "sum_abs": jnp.abs(err).sum(),
        "sum_sq": (err * err).sum(),
        "sum_true": (t * m).sum(),
        "sum_true_sq": (t * t * m).sum(),
    }


def reduce_stats(stats: dict[str, Any], axis_name: str) -> dict[str, Any]:
    """All-reduce accumulator pytrees across a mesh axis (call inside
    ``shard_map``; the TPU-native twin of the reference's
    ``idist.all_reduce``)."""
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), stats)


def allreduce_accumulators_multihost(acc: dict[str, dict[str, float]]) -> dict:
    """Sum host-side accumulators across ``jax.distributed`` processes
    (multi-host data-parallel evaluation; no-op for a single process)."""
    if jax.process_count() == 1:
        return acc
    from jax.experimental import multihost_utils

    keys = sorted(acc)
    fields = sorted(next(iter(acc.values())))
    local = np.array(
        [[acc[k][f] for f in fields] for k in keys], dtype=np.float64
    )
    total = np.asarray(multihost_utils.process_allgather(local)).sum(axis=0)
    return {
        k: {f: float(total[i, j]) for j, f in enumerate(fields)}
        for i, k in enumerate(keys)
    }
