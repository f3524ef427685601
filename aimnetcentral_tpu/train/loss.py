"""Multi-target training loss (reference aimnet/train/loss.py:10-83).

Weighted sum over targets with padding-aware per-atom terms.  Pure function
over (predictions, labels, system) — no module state.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aimnetcentral_tpu.ops import nb as nbops
from aimnetcentral_tpu.system import System

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LossTerm:
    kind: str  # "energy" | "peratom" | "permol" | "charge_conservation"
    key_pred: str
    key_true: str
    weight: float = 1.0


@dataclasses.dataclass(frozen=True)
class LossConfig:
    terms: tuple[LossTerm, ...] = (
        LossTerm(kind="energy", key_pred="energy", key_true="energy", weight=1.0),
        LossTerm(kind="peratom", key_pred="forces", key_true="forces", weight=0.1),
        LossTerm(kind="peratom", key_pred="charges", key_true="charges", weight=0.05),
    )


class MTLoss:
    """Weighted multi-target loss; returns (total, per-term dict)."""

    def __init__(self, cfg: LossConfig):
        self.cfg = cfg

    def __call__(
        self, pred: dict, true: dict, system: System
    ) -> tuple[Array, dict[str, Array]]:
        real_atom = (system.numbers > 0).astype(jnp.float32)
        mol_sizes = nbops.mol_sum(real_atom, system.mol_idx, system.num_mol)
        n_mol = jnp.maximum(system.num_mol, 1)

        components: dict[str, Array] = {}
        total = jnp.float32(0.0)
        for term in self.cfg.terms:
            if term.key_true not in true and term.kind != "charge_conservation":
                continue
            if term.kind == "energy":
                # MSE of energy / sqrt(natoms) (reference aimnet/train/loss.py:75-83)
                diff = pred[term.key_pred] - true[term.key_true]
                val = jnp.mean(diff * diff / jnp.maximum(mol_sizes, 1.0))
            elif term.kind == "peratom":
                # padding-aware per-atom MSE (reference aimnet/train/loss.py:59-72)
                diff = pred[term.key_pred] - true[term.key_true]
                if diff.ndim == 1:
                    diff = diff[:, None]
                se = jnp.sum(diff * diff, axis=-1) * real_atom
                val = jnp.sum(se) / jnp.maximum(jnp.sum(real_atom), 1.0)
            elif term.kind == "permol":
                diff = pred[term.key_pred] - true[term.key_true]
                val = jnp.mean(jnp.sum(diff.reshape(system.num_mol, -1) ** 2, axis=-1))
            elif term.kind == "charge_conservation":
                dq = pred.get("_delta_Q")
                val = jnp.mean(dq * dq) if dq is not None else jnp.float32(0.0)
            else:
                raise ValueError(f"unknown loss term kind {term.kind}")
            components[f"{term.kind}:{term.key_pred}"] = val
            total = total + term.weight * val
        return total, components
