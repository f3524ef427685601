"""Neighbor-layout primitives for the single flat padded layout.

TPU-native replacement for the reference's three-mode dispatch
(reference aimnet/nbops.py:262-377): every op below is shape-static, pure,
and differentiable; ``mol_sum`` is a sorted segment reduction instead of a
scatter_add with data-dependent output size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def gather_nb(x: Array, nbmat: Array) -> Array:
    """Gather per-neighbor values: ``x[nbmat]`` -> (N, M, ...).

    The fill value N-1 points at the guaranteed padding row, so gathers are
    always in-bounds (no clipping needed) and padded lanes read the padding
    atom's (zero) features.
    """
    return jnp.take(x, nbmat, axis=0)


def pair_mask(nbmat: Array) -> Array:
    """(N, M) bool, True for VALID pairs (fill entries are False).

    Fill convention: ``nbmat == N-1`` marks an unused neighbor slot
    (the last atom row is guaranteed padding).
    """
    return nbmat != (nbmat.shape[0] - 1)


def mask_pad_atoms(x: Array, numbers: Array, fill: float = 0.0) -> Array:
    """Zero (or fill) entries belonging to padding atoms (numbers == 0)."""
    mask = numbers == 0
    return jnp.where(mask.reshape(mask.shape + (1,) * (x.ndim - 1)), fill, x)


def mol_sum(x: Array, mol_idx: Array, num_mol: int) -> Array:
    """Per-molecule sum: (N, ...) -> (num_mol, ...).

    Padding rows carry segment id ``num_mol`` which lands in a trash segment
    and is dropped.  Replaces the reference's scatter_add with data-dependent
    out_size (reference aimnet/nbops.py:309-377).  ``indices_are_sorted`` is
    not promised: the bin-sorted slot layout interleaves molecules.
    """
    out = jax.ops.segment_sum(x, mol_idx, num_segments=num_mol + 1)
    return out[:num_mol]


def expand_mol(x_mol: Array, mol_idx: Array) -> Array:
    """Broadcast per-molecule values back to atoms: (num_mol, ...) -> (N, ...).

    Padding atoms with ``mol_idx == num_mol`` read an appended zero row.
    """
    zero = jnp.zeros_like(x_mol[:1])
    return jnp.take(jnp.concatenate([x_mol, zero], axis=0), mol_idx, axis=0)
