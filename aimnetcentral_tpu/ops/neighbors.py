"""Neighbor-matrix construction (host-side numpy builders + jit-friendly policies).

TPU-native inversion of the reference's exception-driven adaptive neighbor
list (reference aimnet/calculators/neighbors.py:21-147): instead of resizing
buffers via ``NeighborOverflowError`` retries inside the hot loop, capacity is
a STATIC shape chosen from density + a safety factor, and builders report an
overflow count that callers check OUTSIDE jit (recompile only on true
overflow).  A jit-compatible on-device builder (``nbmat_within_cutoff``) keeps
MD loops fully on-device; the numpy builders serve the calculator facade.

Conventions (see aimnetcentral_tpu/system.py): flat padded atoms, nbmat
``(N, M)`` int32 with fill = N-1 (last row guaranteed padding), ordered pairs
(both (i,j) and (j,i) present), optional fractional lattice shifts.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def density_max_neighbors(cutoff: float, n_atoms_hint: int | None = None, density: float = 0.2) -> int:
    """Density-based capacity heuristic, rounded up to 16
    (reference aimnet/calculators/neighbors.py:56-58)."""
    sphere = 4.0 / 3.0 * math.pi * cutoff**3
    m = max(16, ((int(density * sphere) + 15) // 16) * 16)
    if n_atoms_hint is not None:
        m = min(m, max(1, n_atoms_hint - 1))
    return m


def allpairs_nbmat(mol_sizes: list[int], n_pad: int, max_mol_size: int | None = None) -> np.ndarray:
    """All-pairs intra-molecular neighbor matrix for a packed batch.

    ``mol_sizes`` are the real atom counts per molecule (packed contiguously);
    ``n_pad`` is the total padded atom count (>= sum + 1).  Capacity
    M = max(mol_sizes) - 1 unless overridden.
    """
    fill = n_pad - 1
    m_cap = (max_mol_size or max(mol_sizes)) - 1
    m_cap = max(m_cap, 1)
    nbmat = np.full((n_pad, m_cap), fill, dtype=np.int32)
    off = 0
    for sz in mol_sizes:
        idx = np.arange(sz)
        # row i: all other atoms of the molecule
        others = (idx[None, :] + idx[:, None] + 1) % sz + off  # cyclic enumeration, excludes self
        nbmat[off : off + sz, : sz - 1] = others[:, : sz - 1]
        off += sz
    return nbmat


def brute_force_nbmat(
    coord: np.ndarray,
    mol_idx: np.ndarray,
    cutoff: float,
    max_neighbors: int | None = None,
    cell: np.ndarray | None = None,
    n_pad: int | None = None,
) -> tuple[np.ndarray, np.ndarray | None, int]:
    """O(N^2) host-side neighbor matrix builder (tests + calculator fallback).

    Returns ``(nbmat, shifts_frac_or_None, max_seen)``.  For PBC, enumerates
    lattice images within the cutoff (single cell shared by all molecules, or
    per-molecule cells (B,3,3)).  ``coord`` holds real atoms only (n_real,3);
    the returned matrices have ``n_pad`` rows (default n_real+1).
    """
    n_real = coord.shape[0]
    n_pad = n_pad or (n_real + 1)
    fill = n_pad - 1

    pairs_i: list[np.ndarray] = []
    pairs_j: list[np.ndarray] = []
    pairs_s: list[np.ndarray] = []
    if cell is None:
        d = np.linalg.norm(coord[:, None, :] - coord[None, :, :], axis=-1)
        same_mol = mol_idx[:, None] == mol_idx[None, :]
        mask = (d < cutoff) & same_mol & ~np.eye(n_real, dtype=bool)
        ii, jj = np.nonzero(mask)
        pairs_i.append(ii)
        pairs_j.append(jj)
    else:
        cells = cell if cell.ndim == 3 else cell[None]
        # generous image range from cell heights
        for b in np.unique(mol_idx):
            sel = np.nonzero(mol_idx == b)[0]
            cb = cells[b if cells.shape[0] > 1 else 0]
            inv = np.linalg.inv(cb).T
            nrep = np.ceil(cutoff * np.linalg.norm(inv, axis=-1)).astype(int)
            rng = [np.arange(-r, r + 1) for r in nrep]
            shifts = np.stack(np.meshgrid(*rng, indexing="ij"), axis=-1).reshape(-1, 3)
            xyz = coord[sel]
            for s in shifts:
                disp = xyz[None, :, :] + (s.astype(np.float64) @ cb) - xyz[:, None, :]
                d = np.linalg.norm(disp, axis=-1)
                mask = d < cutoff
                if (s == 0).all():
                    mask &= ~np.eye(len(sel), dtype=bool)
                ii, jj = np.nonzero(mask)
                if len(ii):
                    pairs_i.append(sel[ii])
                    pairs_j.append(sel[jj])
                    pairs_s.append(np.broadcast_to(s, (len(ii), 3)))

    ii = np.concatenate(pairs_i) if pairs_i else np.zeros(0, dtype=int)
    jj = np.concatenate(pairs_j) if pairs_j else np.zeros(0, dtype=int)
    ss = np.concatenate(pairs_s) if pairs_s else None

    counts = np.bincount(ii, minlength=n_pad)
    max_seen = int(counts.max()) if len(ii) else 0
    m_cap = max_neighbors or max(1, ((max_seen + 15) // 16) * 16)

    nbmat = np.full((n_pad, m_cap), fill, dtype=np.int32)
    shifts_out = np.zeros((n_pad, m_cap, 3), dtype=np.float32) if ss is not None else None
    slot = np.zeros(n_pad, dtype=int)
    for k in range(len(ii)):
        i = ii[k]
        s = slot[i]
        if s < m_cap:
            nbmat[i, s] = jj[k]
            if shifts_out is not None:
                shifts_out[i, s] = ss[k]
            slot[i] = s + 1
    return nbmat, shifts_out, max_seen


def nbmat_within_cutoff(
    coord: Array,
    mol_idx: Array,
    numbers: Array,
    cutoff: float,
    max_neighbors: int,
) -> tuple[Array, Array]:
    """Jit-compatible O(N^2) on-device neighbor matrix (gas phase).

    Returns ``(nbmat, overflow_count)`` with static shape (N, max_neighbors).
    Pairs beyond capacity are dropped and counted — callers check the overflow
    scalar outside jit and rebuild with larger capacity (compile-once design).
    Suitable up to a few thousand atoms; the cell-list builder covers larger
    systems.
    """
    n = coord.shape[0]
    fill = n - 1
    d2 = jnp.sum((coord[:, None, :] - coord[None, :, :]) ** 2, axis=-1)
    same = mol_idx[:, None] == mol_idx[None, :]
    real = (numbers > 0)[:, None] & (numbers > 0)[None, :]
    eye = jnp.eye(n, dtype=bool)
    ok = (d2 < cutoff * cutoff) & same & real & ~eye
    # stable top-M selection: sort candidate flags per row
    idx = jnp.argsort(~ok, axis=1, stable=True)[:, :max_neighbors]  # valid first
    taken_ok = jnp.take_along_axis(ok, idx, axis=1)
    nbmat = jnp.where(taken_ok, idx, fill).astype(jnp.int32)
    counts = ok.sum(axis=1)
    overflow = jnp.maximum(counts - max_neighbors, 0).sum()
    return nbmat, overflow
