"""On-device cell-list neighbor matrix construction (pure XLA, static shapes).

This is the TPU replacement for the reference's exception-driven adaptive
neighbor list (reference aimnet/calculators/neighbors.py:21-147, K5 in
SURVEY.md §2.2): all shapes are static (bin counts, per-bin capacity, neighbor
capacity chosen host-side from density), outputs include overflow counters
checked OUTSIDE jit, and the whole build runs on device inside the MD step
loop — coordinates never leave HBM.

Algorithm (orthorhombic or triclinic cells via fractional coordinates):
1. bin atoms into an (nx, ny, nz) grid in fractional space,
2. build the bin->atom table with one sort + segment ranking (no atomics),
3. per atom, gather candidates from the 27 neighboring bins (with their
   lattice wrap shifts), filter by cutoff, compact valid entries to the left
   with one more sort.

Gas-phase systems use a bounding box with no wrapping.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from aimnetcentral_tpu.ops import math as aops
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CellListSpec:
    """Static discretization for a cell-list build (host-chosen)."""

    nbins: tuple[int, int, int]
    bin_capacity: int
    max_neighbors: int
    cutoff: float
    periodic: bool

    @property
    def total_bins(self) -> int:
        return self.nbins[0] * self.nbins[1] * self.nbins[2]


def plan_cell_list(
    cell: np.ndarray | None,
    n_atoms: int,
    cutoff: float,
    extent: float | None = None,
    density_safety: float = 2.0,
    max_neighbors: int | None = None,
) -> CellListSpec:
    """Choose static bin/capacity sizes from geometry + density safety factor."""
    if cell is not None:
        cell = np.asarray(cell, dtype=np.float64)
        # perpendicular heights of the cell -> number of bins with bin >= cutoff
        vol = abs(np.linalg.det(cell))
        heights = vol / np.linalg.norm(
            np.cross(np.roll(cell, -1, axis=0), np.roll(cell, -2, axis=0)), axis=1
        )
        nbins = tuple(max(1, int(h // cutoff)) for h in heights)
        density = n_atoms / vol
    else:
        assert extent is not None, "gas phase needs a bounding-box extent"
        nbins = tuple(max(1, int(extent // cutoff)) for _ in range(3))
        density = n_atoms / max(extent**3, 1.0)
    total_bins = nbins[0] * nbins[1] * nbins[2]
    per_bin = n_atoms / total_bins
    bin_capacity = max(8, int(math.ceil(per_bin * density_safety / 8)) * 8)
    if max_neighbors is None:
        sphere = 4.0 / 3.0 * math.pi * cutoff**3
        max_neighbors = max(16, int(math.ceil(density * sphere * density_safety / 16)) * 16)
        if cell is None:
            # gas phase: an atom has at most n_atoms-1 neighbors; under PBC
            # periodic images make the sphere estimate the right bound
            max_neighbors = min(max_neighbors, max(1, n_atoms - 1))
    return CellListSpec(
        nbins=nbins,
        bin_capacity=bin_capacity,
        max_neighbors=max_neighbors,
        cutoff=cutoff,
        periodic=cell is not None,
    )


_NEIGHBOR_OFFSETS = np.stack(
    np.meshgrid(*([np.arange(-1, 2)] * 3), indexing="ij"), axis=-1
).reshape(27, 3)


def build_cell_list(
    coord: Array,
    numbers: Array,
    spec: CellListSpec,
    cell: Array | None = None,
    origin: Array | None = None,
) -> tuple[Array, Array | None, Array]:
    """Build ``(nbmat, shifts, overflow)`` on device.

    ``coord`` (N, 3) with the padded-layout conventions (last row padding,
    numbers==0 padding).  For periodic systems ``cell`` is (3, 3) (single
    cell; MD boxes).  ``shifts`` is None for gas phase.  ``overflow`` counts
    dropped candidates (bin overflow + neighbor overflow) — check outside jit.
    """
    n = coord.shape[0]
    fill = n - 1
    nx, ny, nz = spec.nbins
    nbins_arr = jnp.array(spec.nbins, dtype=jnp.int32)
    real = numbers > 0

    if spec.periodic:
        assert cell is not None
        inv_cell = jnp.linalg.inv(cell)
        frac_raw = coord @ inv_cell  # row-vector convention
        atom_wrap = jnp.floor(frac_raw)  # per-atom wrap count (coords may be unwrapped)
        frac = frac_raw - atom_wrap
        bin_idx3 = jnp.clip((frac * nbins_arr).astype(jnp.int32), 0, nbins_arr - 1)
    else:
        lo = jnp.min(jnp.where(real[:, None], coord, jnp.inf), axis=0) if origin is None else origin
        rel = (coord - lo) / spec.cutoff
        bin_idx3 = jnp.clip(rel.astype(jnp.int32), 0, nbins_arr - 1)

    bin_id = (bin_idx3[:, 0] * ny + bin_idx3[:, 1]) * nz + bin_idx3[:, 2]
    bin_id = jnp.where(real, bin_id, spec.total_bins)  # padding -> overflow bin

    # --- bin -> atom table via sort + rank-in-bin
    order = jnp.argsort(bin_id)
    sorted_bins = bin_id[order]
    # rank of each sorted atom within its bin
    same_as_prev = jnp.concatenate(
        [jnp.zeros(1, dtype=jnp.int32), (sorted_bins[1:] == sorted_bins[:-1]).astype(jnp.int32)]
    )
    seg_start = jnp.where(same_as_prev == 0, jnp.arange(n, dtype=jnp.int32), 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = jnp.arange(n, dtype=jnp.int32) - seg_start

    table = jnp.full((spec.total_bins + 1, spec.bin_capacity), fill, dtype=jnp.int32)
    # only REAL-bin atoms enter the table: padding atoms carry bin id
    # total_bins, and row total_bins doubles as the all-fill row that
    # out-of-grid probes read — it must never receive atom indices
    in_cap = (rank < spec.bin_capacity) & (sorted_bins < spec.total_bins)
    safe_rank = jnp.where(in_cap, rank, 0)
    safe_bin = jnp.where(in_cap, sorted_bins, spec.total_bins)
    table = table.at[safe_bin, safe_rank].set(
        jnp.where(in_cap, order.astype(jnp.int32), fill), mode="drop"
    )
    table = table.at[spec.total_bins].set(fill)
    bin_overflow = jnp.sum((~in_cap) & (sorted_bins < spec.total_bins))

    # --- candidate gathering from 27 neighbor bins
    offsets = jnp.asarray(_NEIGHBOR_OFFSETS, dtype=jnp.int32)  # (27, 3)
    nb_bins3 = bin_idx3[:, None, :] + offsets[None, :, :]  # (N, 27, 3)
    if spec.periodic:
        wrap = jnp.floor_divide(nb_bins3, nbins_arr)  # lattice wrap count
        nb_bins3_w = nb_bins3 - wrap * nbins_arr
        # probed bin position = wrapped bin + wrap * cell, so the neighbor's
        # image shift IS the wrap count
        cand_shift = wrap.astype(coord.dtype)
        valid_bin = jnp.ones(nb_bins3.shape[:2], dtype=bool)
    else:
        nb_bins3_w = nb_bins3
        cand_shift = None
        valid_bin = jnp.all((nb_bins3 >= 0) & (nb_bins3 < nbins_arr), axis=-1)
        nb_bins3_w = jnp.clip(nb_bins3_w, 0, nbins_arr - 1)

    nb_bin_id = (nb_bins3_w[..., 0] * ny + nb_bins3_w[..., 1]) * nz + nb_bins3_w[..., 2]
    nb_bin_id = jnp.where(valid_bin, nb_bin_id, spec.total_bins)
    cand = table[nb_bin_id]  # (N, 27, C)
    cand_flat = cand.reshape(n, 27 * spec.bin_capacity)

    # candidate displacement
    cand_coord = coord[cand_flat]  # (N, 27C, 3)
    if spec.periodic:
        # Shift in the ORIGINAL (possibly unwrapped) coordinate frame:
        # wrap of the probed bin, corrected by both atoms' own wrap counts,
        # so callers never need a separate wrap-into-cell pass.
        shift_flat = jnp.repeat(cand_shift, spec.bin_capacity, axis=1)  # (N, 27C, 3)
        shift_flat = shift_flat - atom_wrap[cand_flat] + atom_wrap[:, None, :]
        cand_coord = cand_coord + aops.cellmul(shift_flat, cell)
    d2 = jnp.sum((cand_coord - coord[:, None, :]) ** 2, axis=-1)

    is_fill = cand_flat == fill
    is_self = (cand_flat == jnp.arange(n, dtype=jnp.int32)[:, None]) & (
        (shift_flat == 0).all(-1) if spec.periodic else True
    )
    ok = (~is_fill) & (~is_self) & (d2 < spec.cutoff**2) & real[:, None]

    # compact valid candidates to the left
    key = jnp.where(ok, jnp.arange(cand_flat.shape[1], dtype=jnp.int32)[None, :], 1 << 30)
    sel = jnp.argsort(key, axis=1)[:, : spec.max_neighbors]
    sel_ok = jnp.take_along_axis(ok, sel, axis=1)
    nbmat = jnp.where(sel_ok, jnp.take_along_axis(cand_flat, sel, axis=1), fill).astype(
        jnp.int32
    )
    nb_overflow = jnp.maximum(ok.sum(axis=1) - spec.max_neighbors, 0).sum()

    shifts = None
    if spec.periodic:
        shifts = jnp.where(
            sel_ok[..., None],
            jnp.take_along_axis(shift_flat, sel[..., None], axis=1),
            0.0,
        )
    return nbmat, shifts, bin_overflow + nb_overflow
