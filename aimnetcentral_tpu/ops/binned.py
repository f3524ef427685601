"""Stencil-roll dense pair engine: the TPU-native neighbor representation.

Motivation (measured on TPU v5e): XLA gathers/scatters execute at ~30 ns per
row regardless of width, so any (N, M) indexed-neighbor formulation is
row-count-bound — 1.9M pair gathers cost ~10 ms while the same math as dense
ops costs microseconds.  This module therefore replaces indexed neighbor
matrices for large systems with a layout where neighbor structure is
IMPLICIT:

- Atoms are sorted into a (nx, ny, nz) bin grid with bin edge >= the SR
  cutoff and a static per-bin capacity C; the atom array has length
  L = nx*ny*nz*C and bin b owns the contiguous slot rows [b*C, (b+1)*C).
- A pair interaction with cutoff r iterates over the constant set of bin
  offsets within radius ceil(r/edge); for each offset (dx,dy,dz) the
  candidate features of EVERY bin are obtained with one ``jnp.roll`` of the
  slot array over the grid axes — a dense memory move, no gathers — followed
  by dense (C x C) block-pair math on VPU/MXU.  Periodic wrap is exact: the
  roll wraps bins and the per-bin lattice shift is floor((bin+d)/nbins).
- Rebuilds collapse to one argsort of N scalars + one N-row scatter
  (vs. the reference's adaptive index-matrix reconstruction,
  reference aimnet/calculators/neighbors.py:21-147).

Compact (N, M) indexed systems remain supported everywhere (gas-phase
molecules, golden tests); this engine is selected for large/periodic systems.
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
class BinGrid:
    """Static bin-grid metadata (hashable; lives in System's meta fields)."""

    nbins: tuple[int, int, int]
    capacity: int
    edge_hint: float  # informational: targeted bin edge (Angstrom)
    periodic: bool
    # extra stencil coverage (Angstrom) for stale binnings between MD
    # re-bin events (set to the Verlet skin by the MD driver)
    margin: float = 0.0
    # per-axis override of ``periodic`` (spatial domain decomposition: a
    # shard's extended local grid is bounded in the sharded axis — halo
    # planes supply the neighbors — but keeps global periodicity in the
    # others).  None = all axes follow ``periodic``.
    periodic_axes: tuple[bool, bool, bool] | None = None
    # "one molecule per bin" packed layout (training batches): every pair
    # interaction is within-bin by construction, so EVERY stencil sweep runs
    # at radius 0 (a single (0,0,0) step of dense (C, C) block math — the
    # reference's dense mode-0 batching expressed as MXU blocks,
    # reference aimnet/nbops.py mode 0 / calculators docs nb_threshold).
    # Unbounded pair terms (simple Coulomb) are exact on this layout: the
    # whole molecule shares one bin.
    molecule_bins: bool = False

    @property
    def axes_periodic(self) -> tuple[bool, bool, bool]:
        if self.periodic_axes is not None:
            return self.periodic_axes
        return (self.periodic,) * 3

    @property
    def total_bins(self) -> int:
        return self.nbins[0] * self.nbins[1] * self.nbins[2]

    @property
    def num_slots(self) -> int:
        return self.total_bins * self.capacity


def plan_bins(
    cell: np.ndarray | None,
    n_atoms: int,
    edge: float,
    extent: tuple[np.ndarray, np.ndarray] | None = None,
    safety: float = 2.0,
) -> BinGrid:
    """Choose a static grid: bin edge >= ``edge``, capacity from density."""
    if cell is not None:
        cell = np.asarray(cell, dtype=np.float64)
        vol = abs(np.linalg.det(cell))
        heights = vol / np.linalg.norm(
            np.cross(np.roll(cell, -1, axis=0), np.roll(cell, -2, axis=0)), axis=1
        )
        nbins = tuple(max(1, int(h // edge)) for h in heights)
    else:
        assert extent is not None
        lo, hi = extent
        span = np.maximum(np.asarray(hi) - np.asarray(lo), 1e-3)
        nbins = tuple(max(1, int(s // edge) + 1) for s in span)
        vol = float(np.prod(span))
    total = nbins[0] * nbins[1] * nbins[2]
    per_bin = n_atoms / total
    # capacity covers a relative safety factor AND a fluctuation tail
    # (mean + 3.5 sqrt(mean) + 2 — measured: a 300 K liquid at mean 19.5
    # atoms/bin reaches max occupancies of ~33-35, i.e. ~3σ excursions are
    # routine over thousands of rebuilds); rarer excursions are handled by
    # the graceful capacity regrow at chunk boundaries.  Rounded UP to a
    # multiple of 8: pair blocks are (C, C)/(C, gamma*C) f32 tiles of
    # (8, 128), so off-8 capacities pay whole phantom sublane rows (C=36
    # costs exactly as much as C=40) — 8 is the capacity granularity on TPU.
    need = max(per_bin * safety, per_bin + 3.5 * math.sqrt(per_bin) + 2.0)
    capacity = max(8, int(math.ceil(need / 8)) * 8)
    return BinGrid(
        nbins=nbins, capacity=capacity, edge_hint=edge, periodic=cell is not None
    )


def plan_lr_bins(
    cell: np.ndarray | None,
    n_atoms: int,
    lr_cutoff: float,
    extent: tuple[np.ndarray, np.ndarray] | None = None,
    safety: float = 1.6,
    margin: float = 0.0,
) -> BinGrid:
    """Coarse grid for long-range sweeps: bin edge ~ (cutoff+margin)/2 keeps
    the stencil at radius 2 (125 offsets) while the ~4x larger average bin
    occupancy shrinks the relative capacity slack — together roughly halving
    LR pair-slot work vs sweeping the fine SR grid at radius 3+."""
    edge = max((lr_cutoff + margin) / 2.0, 1e-3)
    grid = plan_bins(cell, n_atoms, edge, extent=extent, safety=safety)
    return dataclasses.replace(grid, margin=margin)


def stencil_offsets(radius: int) -> np.ndarray:
    """All integer offsets in [-radius, radius]^3, ordered with (0,0,0) first."""
    r = np.arange(-radius, radius + 1)
    pts = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    order = np.argsort((pts != 0).any(axis=1), stable=True)
    return pts[order].astype(np.int32)


def bin_atoms(
    coord: Array,
    numbers: Array,
    grid: BinGrid,
    cell: Array | None = None,
    origin: Array | None = None,
) -> tuple[Array, Array, Array]:
    """Compute the slot permutation for the bin-sorted layout.

    Returns ``(perm, wrap, overflow)``:
    - ``perm`` (L,) int32: compact atom index feeding each slot (fill =
      n_compact - 1, the compact padding row),
    - ``wrap`` (N_compact, 3) float32: per-atom lattice wrap (slot coordinate
      = coord - wrap @ cell keeps every slot coordinate inside the box),
    - ``overflow``: count of atoms whose bin exceeded capacity.
    """
    n = coord.shape[0]
    nx, ny, nz = grid.nbins
    nbins_arr = jnp.array(grid.nbins, dtype=jnp.int32)
    real = numbers > 0

    if grid.periodic:
        assert cell is not None
        frac = aops.cellmul(coord, jnp.linalg.inv(cell))
        wrap = jnp.floor(frac)
        fracw = frac - wrap
        bin3 = jnp.clip((fracw * nbins_arr).astype(jnp.int32), 0, nbins_arr - 1)
    else:
        lo = (
            jnp.min(jnp.where(real[:, None], coord, jnp.inf), axis=0)
            if origin is None
            else origin
        )
        wrap = jnp.zeros_like(coord)
        bin3 = jnp.clip(
            ((coord - lo) / grid.edge_hint).astype(jnp.int32), 0, nbins_arr - 1
        )

    bin_id = (bin3[:, 0] * ny + bin3[:, 1]) * nz + bin3[:, 2]
    bin_id = jnp.where(real, bin_id, grid.total_bins)

    order = jnp.argsort(bin_id)
    sorted_bins = bin_id[order]
    same = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), (sorted_bins[1:] == sorted_bins[:-1]).astype(jnp.int32)]
    )
    seg_start = jnp.where(same == 0, jnp.arange(n, dtype=jnp.int32), 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = jnp.arange(n, dtype=jnp.int32) - seg_start

    in_cap = (rank < grid.capacity) & (sorted_bins < grid.total_bins)
    slot = jnp.where(in_cap, sorted_bins * grid.capacity + rank, grid.num_slots)
    # empty-slot fill: index of SOME padding row of the input (argmin of the
    # real mask -> first padding atom).  If the input has no padding, every
    # slot gets written and the fill is never read.  This makes re-binning
    # from an existing slot layout (no guaranteed trailing pad row) correct.
    pad_src = jnp.argmin(real).astype(jnp.int32)
    perm = jnp.full((grid.num_slots + 1,), 0, dtype=jnp.int32) + pad_src
    perm = perm.at[slot].set(order.astype(jnp.int32), mode="drop")[: grid.num_slots]
    overflow = jnp.sum((~in_cap) & (sorted_bins < grid.total_bins))
    return perm, wrap.astype(coord.dtype), overflow


def to_slots(x: Array, perm: Array) -> Array:
    """Permute a compact per-atom array into the slot layout (one gather of L
    rows — done once per rebuild, not per pair interaction)."""
    return jnp.take(x, perm, axis=0)


def _wrap_shift(bin3_grid: Array, offset: Array, nbins: Array) -> Array:
    """Per-bin lattice wrap for a stencil offset: floor((bin + d) / nbins)."""
    return jnp.floor_divide(bin3_grid + offset, nbins)


def stencil_tables(grid: BinGrid, radius: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side constant tables for a stencil sweep.

    Returns ``(nbr_bins, wraps, is_zero_offset)`` with shapes
    (S, B) int32 / (S, B, 3) float32 / (S,) bool:
    for sweep step s, bin b's candidate bin is ``nbr_bins[s, b]`` whose atoms
    must be shifted by ``wraps[s, b] @ cell``.  For gas-phase grids,
    out-of-range targets get nbr_bins = -1 (masked).
    """
    nx, ny, nz = grid.nbins
    offs = stencil_offsets(radius)  # (S, 3), (0,0,0) first
    bx, by, bz = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    bin3 = np.stack([bx, by, bz], axis=-1).reshape(-1, 3)  # (B, 3)
    target = bin3[None, :, :] + offs[:, None, :]  # (S, B, 3)
    nbins = np.array(grid.nbins)
    per = np.array(grid.axes_periodic)
    # periodic axes wrap (recording the lattice shift); bounded axes mark
    # out-of-range targets invalid (gas phase, or the sharded axis of a
    # spatial-decomposition shard whose halos cover the interior range)
    wrap = np.where(per, np.floor_divide(target, nbins), 0)
    t = np.where(per, target - wrap * nbins, np.clip(target, 0, nbins - 1))
    inside = np.all(per | ((target >= 0) & (target < nbins)), axis=-1)
    nbr = np.where(inside, (t[..., 0] * ny + t[..., 1]) * nz + t[..., 2], -1)
    is_zero = (offs == 0).all(axis=1)
    return (
        nbr.astype(np.int32),
        wrap.astype(np.float32),
        is_zero,
    )


def stencil_map(
    grid: BinGrid,
    radius: int,
    f,
    acc_init,
    blocks: dict[str, Array],
    cell: Array | None = None,
):
    """Accumulate a pair interaction over all bin offsets within ``radius``.

    ``blocks``: per-slot arrays of shape (L, ...), viewed as (B, C, ...).
    For each sweep step the candidate blocks come from ONE bin-level gather
    (B rows of C-row blocks — bin-granularity gathers are cheap; per-ATOM
    gathers are the thing this engine exists to avoid).  ``f`` is called as
    ``f(acc, self_blocks, cand_blocks, shift_cart, valid, not_self)`` with

    - self/cand blocks: dicts of (B, C, ...) arrays,
    - ``shift_cart`` (B, 1, 3): cartesian lattice shift to ADD to candidate
      coordinates (zero for gas phase),
    - ``valid`` (B, 1, 1) bool: candidate-bin validity (gas-phase boundary),
    - ``not_self`` (B, C, C) or (1, C, C): self-pair diagonal mask,
    and returns the updated accumulator.

    The sweep is a ``lax.scan`` over static per-step tables (neighbor bin ids
    + wraps precomputed on host); the body is checkpointed so the backward
    pass recomputes per-step pair tensors instead of storing S of them.
    """
    b_tot = grid.total_bins
    c = grid.capacity

    def to_blocks(x: Array) -> Array:
        return x.reshape((b_tot, c) + x.shape[1:])

    self_blocks = {k: to_blocks(v) for k, v in blocks.items()}

    nbr_np, wrap_np, zero_np = stencil_tables(grid, radius)
    nbr = jnp.asarray(nbr_np)  # (S, B)
    wraps = jnp.asarray(wrap_np)  # (S, B, 3)
    is_zero = jnp.asarray(zero_np)  # (S,)

    diag = jnp.eye(c, dtype=bool)[None]  # (1, C, C)
    dtype = blocks["coord"].dtype

    @jax.checkpoint
    def inner(acc, step):
        nbr_s, wrap_s, zero_s = step
        safe_nbr = jnp.maximum(nbr_s, 0)
        cand = {k: v[safe_nbr] for k, v in self_blocks.items()}  # bin-level gather
        if grid.periodic:
            shift_cart = aops.cellmul(wrap_s, cell)[:, None, :]  # (B, 1, 3)
        else:
            shift_cart = jnp.zeros((b_tot, 1, 3), dtype=dtype)
        if all(grid.axes_periodic):
            valid = jnp.ones((b_tot, 1, 1), dtype=bool)
        else:
            # gas phase, or a spatial shard's bounded axis: -1 targets
            valid = (nbr_s >= 0)[:, None, None]
        not_self = ~(zero_s & diag)
        return f(acc, self_blocks, cand, shift_cart, valid, not_self)

    def body(acc, step):
        return inner(acc, step), None

    acc, _ = jax.lax.scan(body, acc_init, (nbr, wraps, is_zero))
    return acc


def to_binned_system(system, grid: BinGrid, lr_grid: BinGrid | None = None):
    """Convert a compact flat System into the slot-padded binned layout.

    Returns ``(binned_system, perm, overflow)``; ``perm`` maps slots to
    compact rows (for scattering results back).  Coordinates are wrapped
    into the cell (gradients flow through unchanged: the wrap is a
    piecewise-constant shift).  Single shared cell only.

    ``lr_grid`` additionally attaches the coarse long-range twin layout
    (``lr_bins``/``lr_slot``, consumed by engine_binned.pair_energy_binned
    with ``layout="lr"``); its bin-capacity overflow is folded into the
    returned ``overflow`` count.  Any stale LR layout is dropped when
    ``lr_grid`` is None (SR slots are re-permuted here, invalidating it).
    """
    cell0 = None
    if system.cell is not None:
        cell0 = system.cell[0]
    perm, wrap, overflow = bin_atoms(system.coord, system.numbers, grid, cell0)
    coord = system.coord
    if cell0 is not None:
        coord = coord - aops.cellmul(wrap, cell0)
    binned = system.replace(
        coord=to_slots(coord, perm),
        numbers=to_slots(system.numbers, perm),
        mol_idx=to_slots(system.mol_idx, perm),
        nbmat=None,
        shifts=None,
        nbmat_lr=None,
        shifts_lr=None,
        nbmat_coulomb=None,
        shifts_coulomb=None,
        nbmat_dftd3=None,
        shifts_dftd3=None,
        bins=grid,
        lr_bins=None,
        lr_slot=None,
    )
    if lr_grid is not None:
        lr_perm, _lr_wrap, lr_ovf = bin_atoms(
            binned.coord, binned.numbers, lr_grid, cell0
        )
        binned = binned.replace(
            lr_bins=lr_grid,
            lr_slot=lr_perm,
            lr_inv=invert_slot_map(lr_perm, binned.coord.shape[0]),
        )
        overflow = overflow + lr_ovf
    return binned, perm, overflow


def invert_slot_map(lr_perm: Array, n_src: int) -> Array:
    """Invert an (L_dst,) slot->source map: returns (n_src,) int32 giving the
    destination slot of each source row (sentinel = L_dst for sources no
    destination points at — only padding rows, by construction).  One
    scatter-set per REBUILD so every per-eval reassembly can be a gather."""
    l_dst = lr_perm.shape[0]
    return (
        jnp.full((n_src,), l_dst, jnp.int32)
        .at[lr_perm]
        .set(jnp.arange(l_dst, dtype=jnp.int32))
    )


def row_stencil_tables(grid: BinGrid, radius: int) -> tuple[np.ndarray, np.ndarray]:
    """Row-granular stencil tables for bin-ROW-tiled Pallas sweeps.

    Bins are z-fastest (b = (x*ny + y)*nz + z), so a whole z-row of T = nz
    bins shares one candidate row per offset: for offset (dx, dy, dz), row
    r = (x, y) pairs against row r' = (x+dy wrap...) with a z-rotation of dz.
    Returns ``(row_nbr (S, R) int32, dz_mod (S,) int32)`` with R = nx*ny;
    out-of-grid rows (gas phase) are -1.  Per-BIN validity/lattice shifts
    still come from :func:`stencil_tables` (z-range misses and wrap shifts
    are per-bin, not per-row).
    """
    assert grid.periodic_axes is None or all(grid.axes_periodic) == grid.periodic, (
        "row-tiled kernels do not support mixed per-axis periodicity; use the "
        "XLA engine on spatial-decomposition shards"
    )
    nx, ny, nz = grid.nbins
    offs = stencil_offsets(radius)
    rx, ry = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    rows = np.stack([rx, ry], axis=-1).reshape(-1, 2)  # (R, 2)
    tx = rows[None, :, 0] + offs[:, None, 0]  # (S, R)
    ty = rows[None, :, 1] + offs[:, None, 1]
    if grid.periodic:
        row_nbr = (tx % nx) * ny + (ty % ny)
    else:
        inside = (tx >= 0) & (tx < nx) & (ty >= 0) & (ty < ny)
        row_nbr = np.where(
            inside, np.clip(tx, 0, nx - 1) * ny + np.clip(ty, 0, ny - 1), -1
        )
    dz_mod = np.mod(offs[:, 2], nz)
    return row_nbr.astype(np.int32), dz_mod.astype(np.int32)


def mirror_row_stencil_tables(grid: BinGrid, radius: int) -> tuple[np.ndarray, np.ndarray]:
    """Receiver-centric twin of :func:`row_stencil_tables`: for sweep step s
    and row r, ``mrow[s, r]`` is the row whose FORWARD step s had r as its
    candidate row, and receiver bin z pairs with partner slot (z + mdz) % nz.
    """
    nx, ny, nz = grid.nbins
    offs = stencil_offsets(radius)
    key = {tuple(o): i for i, o in enumerate(offs)}
    mirror = np.array([key[tuple(-o)] for o in offs], dtype=np.int64)
    row_nbr, _dz = row_stencil_tables(grid, radius)
    mrow = row_nbr[mirror]
    mdz_mod = np.mod(-offs[:, 2], nz)
    return mrow.astype(np.int32), mdz_mod.astype(np.int32)


def xy_band_tables(grid: BinGrid, radius: int) -> dict[str, np.ndarray]:
    """Host tables for the xy-banded row-tiled Pallas conv kernels.

    The banded kernels put only the (2r+1)^2 xy offsets in the program grid;
    the z dimension is a static in-program BAND of W = 2r+1 candidate slots
    per receiver bin (slot (t + dz_w) mod T, dz_w = w - r).  This cuts the
    program count (and the per-program DMA of candidate rows / cotangent
    blocks) by (2r+1)x versus the per-offset grid at identical MXU work.

    Returns a dict of host arrays (S = (2r+1)^2 xy offsets, (0,0) first;
    W = 2r+1; R = nx*ny; T = nz; B = R*T):

    - ``xyrow (S, R)`` int32  forward candidate row; -1 out of grid
    - ``mxyrow (S, R)`` int32  partner (mirror) row for the bwd sweep
    - ``wrap (S, R, T, W, 3)`` f32  forward lattice wrap of candidate slot
      (t+dz_w) as seen from self bin (row, t)
    - ``valid (S, R, T, W)`` bool  candidate existence (gas-phase bounds)
    - ``mwrap (S, R, T, W, 3)`` f32  FORWARD wrap in the receiver frame for
      the bwd sweep (partner slot (t - dz_w) mod T); ``mvalid`` likewise
    - ``pinv (S, W, B)`` int32 / ``pvalid (S, W, B)`` f32  static inverse
      tables turning the bwd sweep's partner-contribution side output
      (flat rows ((s*R + r)*T + t)*W + w) into forward-frame (s, w, b_self)
      adjoints with one gather.
    """
    assert grid.periodic_axes is None or all(grid.axes_periodic) == grid.periodic, (
        "row-tiled kernels do not support mixed per-axis periodicity; use the "
        "XLA engine on spatial-decomposition shards"
    )
    nx, ny, nz = grid.nbins
    per = np.array(grid.axes_periodic)
    r = np.arange(-radius, radius + 1)
    offs2 = np.stack(np.meshgrid(r, r, indexing="ij"), axis=-1).reshape(-1, 2)
    offs2 = offs2[np.argsort((offs2 != 0).any(axis=1), stable=True)]  # (0,0) first
    s_tot, w_tot = offs2.shape[0], 2 * radius + 1
    rx, ry = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    rows = np.stack([rx, ry], axis=-1).reshape(-1, 2)  # (R, 2)
    r_tot = rows.shape[0]
    dzs = np.arange(-radius, radius + 1)  # dz_w = w - radius
    t_idx = np.arange(nz)

    def _axis(coord, n, periodic):
        if periodic:
            return coord % n, np.floor_divide(coord, n), np.ones_like(coord, bool)
        ok = (coord >= 0) & (coord < n)
        return np.clip(coord, 0, n - 1), np.zeros_like(coord), ok

    # forward: candidate row (s, R) and per-(t, w) z wrap
    tx = rows[None, :, 0] + offs2[:, None, 0]  # (S, R)
    ty = rows[None, :, 1] + offs2[:, None, 1]
    cx, wx, okx = _axis(tx, nx, per[0])
    cy, wy, oky = _axis(ty, ny, per[1])
    xyrow = np.where(okx & oky, cx * ny + cy, -1).astype(np.int32)
    tz = t_idx[:, None] + dzs[None, :]  # (T, W)
    _cz, wz, okz = _axis(tz, nz, per[2])
    wrap = np.zeros((s_tot, r_tot, nz, w_tot, 3), np.float32)
    wrap[..., 0] = wx[:, :, None, None]
    wrap[..., 1] = wy[:, :, None, None]
    wrap[..., 2] = wz[None, None, :, :]
    valid = (okx & oky)[:, :, None, None] & okz[None, None, :, :]

    # mirror (bwd): partner row p = row - (dx, dy); partner slot (t - dz_w).
    # forward wrap as seen from the partner's WRAPPED coordinates.
    px = rows[None, :, 0] - offs2[:, None, 0]
    py = rows[None, :, 1] - offs2[:, None, 1]
    mcx, _wpx, mokx = _axis(px, nx, per[0])
    mcy, _wpy, moky = _axis(py, ny, per[1])
    mxyrow = np.where(mokx & moky, mcx * ny + mcy, -1).astype(np.int32)
    # Wf_x = floor((px_wrapped + dx) / nx) etc. (zero on non-periodic axes)
    wfx = np.floor_divide(mcx + offs2[:, None, 0], nx) * per[0]
    wfy = np.floor_divide(mcy + offs2[:, None, 1], ny) * per[1]
    pz = t_idx[:, None] - dzs[None, :]  # (T, W)
    mcz, _wpz, mokz = _axis(pz, nz, per[2])
    wfz = np.floor_divide(mcz + dzs[None, :], nz) * per[2]
    mwrap = np.zeros((s_tot, r_tot, nz, w_tot, 3), np.float32)
    mwrap[..., 0] = wfx[:, :, None, None]
    mwrap[..., 1] = wfy[:, :, None, None]
    mwrap[..., 2] = wfz[None, None, :, :]
    mvalid = (mokx & moky)[:, :, None, None] & mokz[None, None, :, :]

    # static inverse tables: forward (s, w, self bin b=(rho, tp)) -> the bwd
    # side-output row written by receiver (s, r_recv=xyrow[s,rho],
    # t_recv=(tp+dz_w) mod T, w)
    b_tot = r_tot * nz
    pinv = np.zeros((s_tot, w_tot, b_tot), np.int32)
    pvalid = np.zeros((s_tot, w_tot, b_tot), np.float32)
    rho = np.arange(r_tot)
    for s_i in range(s_tot):
        r_recv = xyrow[s_i]  # (R,)
        ok_row = r_recv >= 0
        for w_i in range(w_tot):
            t_recv = (t_idx[None, :] + dzs[w_i]) % nz  # (1, T) broadcast over rho
            b_self = (rho[:, None] * nz + t_idx[None, :]).reshape(-1)
            flat = (
                (s_i * r_tot + np.where(ok_row, r_recv, 0)[:, None]) * nz + t_recv
            ) * w_tot + w_i
            ok = ok_row[:, None] & valid[s_i, :, :, w_i]
            pinv[s_i, w_i, b_self] = flat.reshape(-1)
            pvalid[s_i, w_i, b_self] = ok.reshape(-1).astype(np.float32)
    return {
        "xyrow": xyrow,
        "mxyrow": mxyrow,
        "wrap": wrap,
        "valid": valid,
        "mwrap": mwrap,
        "mvalid": mvalid,
        "pinv": pinv,
        "pvalid": pvalid,
        "offs2": offs2.astype(np.int32),
        "s_tot": s_tot,
        "w_tot": w_tot,
    }


def xy_band_tables_half(grid: BinGrid, radius: int) -> dict[str, np.ndarray]:
    """Host tables for the banded HALF-stencil Pallas pair sweep.

    Half-stencil enumeration of a SYMMETRIC pair term (each unordered pair
    computed once): the xy offsets in the program grid are (0, 0) first,
    then the ((2r+1)^2 - 1)/2 offsets with (dx, dy) > (0, 0) lexicographic;
    their negations are covered by mirror accumulation.  The z dimension is
    a static in-program band of W = 2r+1 candidate slots per receiver bin
    (slot (t + dz_w) mod T).  For s = 0 the band is cut to dz >= 0 (the
    dz < 0 pairs are the mirrors of dz > 0 of other bins in the same row),
    and the dz = 0 block is the full ORDERED in-bin enumeration (both
    orderings computed, so it needs no mirror accumulation).

    Returns (S = half xy offsets, W = 2r+1, R = nx*ny, T = nz, B = R*T):

    - ``xyrow (S, R)`` int32  candidate row; -1 out of grid (gas phase)
    - ``wrap (S, R, T, W, 3)`` f32  lattice wrap of candidate slot (t+dz_w)
    - ``valid (S, R, T, W)`` bool  candidate exists AND the (s, w) slot is
      inside the half band (False pushes the pair out of range via the
      +1e6 shift, exactly like the conv tables)
    - ``pinv (S, W, B)`` int32 / ``pvalid (S, W, B)`` f32  static inverse
      tables for mirror reassembly: ``pinv[s, w, b]`` flat-indexes the
      side-output row ((s*R + rho)*T + t)*W + w whose candidate bin is b;
      ``pvalid`` masks missing sources and non-mirroring blocks (all of
      s = 0 except dz > 0, and gas-phase grid boundaries)
    """
    assert grid.periodic_axes is None or all(grid.axes_periodic) == grid.periodic, (
        "row-tiled kernels do not support mixed per-axis periodicity; use the "
        "XLA engine on spatial-decomposition shards"
    )
    nx, ny, nz = grid.nbins
    per = np.array(grid.axes_periodic)
    r = np.arange(-radius, radius + 1)
    offs_all = np.stack(np.meshgrid(r, r, indexing="ij"), axis=-1).reshape(-1, 2)
    offs2 = np.concatenate(
        [np.zeros((1, 2), np.int64), offs_all[[tuple(o) > (0, 0) for o in offs_all]]]
    )
    s_tot, w_tot = offs2.shape[0], 2 * radius + 1
    rx, ry = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    rows = np.stack([rx, ry], axis=-1).reshape(-1, 2)  # (R, 2)
    r_tot = rows.shape[0]
    dzs = np.arange(-radius, radius + 1)  # dz_w = w - radius
    t_idx = np.arange(nz)

    def _axis(coord, n, periodic):
        if periodic:
            return coord % n, np.floor_divide(coord, n), np.ones_like(coord, bool)
        ok = (coord >= 0) & (coord < n)
        return np.clip(coord, 0, n - 1), np.zeros_like(coord), ok

    tx = rows[None, :, 0] + offs2[:, None, 0]  # (S, R)
    ty = rows[None, :, 1] + offs2[:, None, 1]
    cx, wx, okx = _axis(tx, nx, per[0])
    cy, wy, oky = _axis(ty, ny, per[1])
    xyrow = np.where(okx & oky, cx * ny + cy, -1).astype(np.int32)
    tz = t_idx[:, None] + dzs[None, :]  # (T, W)
    _cz, wz, okz = _axis(tz, nz, per[2])
    wrap = np.zeros((s_tot, r_tot, nz, w_tot, 3), np.float32)
    wrap[..., 0] = wx[:, :, None, None]
    wrap[..., 1] = wy[:, :, None, None]
    wrap[..., 2] = wz[None, None, :, :]
    valid = (okx & oky)[:, :, None, None] & okz[None, None, :, :]
    valid[0, :, :, :radius] = False  # half-band cut: s = 0 keeps dz >= 0

    # which (s, w) blocks mirror-accumulate to the candidate side
    mirror = np.ones((s_tot, w_tot), np.float32)
    mirror[0, : radius + 1] = 0.0  # dz < 0 cut; dz = 0 ordered in-bin

    # inverse tables: destination bin b = (x, y, t_dst) receives the mirror
    # of source (s, rho_src = (x - dx, y - dy), t_src = t_dst - dz_w, w)
    b_tot = r_tot * nz
    pinv = np.zeros((s_tot, w_tot, b_tot), np.int32)
    pvalid = np.zeros((s_tot, w_tot, b_tot), np.float32)
    for s_i, (dx, dy) in enumerate(offs2):
        px = rows[:, 0] - dx
        py = rows[:, 1] - dy
        cpx, _wpx, okpx = _axis(px, nx, per[0])
        cpy, _wpy, okpy = _axis(py, ny, per[1])
        rho_src = cpx * ny + cpy  # (R,)
        ok_row = okpx & okpy
        for w_i, dz in enumerate(dzs):
            ct, _wt, okt = _axis(t_idx - dz, nz, per[2])  # (T,) source slot
            flat = (
                (s_i * r_tot + rho_src[:, None]) * nz + ct[None, :]
            ) * w_tot + w_i  # (R, T) by destination (rho, t)
            ok = ok_row[:, None] & okt[None, :]
            pinv[s_i, w_i] = flat.reshape(-1)
            pvalid[s_i, w_i] = (ok.reshape(-1)).astype(np.float32) * mirror[s_i, w_i]
    return {
        "xyrow": xyrow,
        "wrap": wrap,
        "valid": valid,
        "pinv": pinv,
        "pvalid": pvalid,
        "s_tot": s_tot,
        "w_tot": w_tot,
    }


def mirror_stencil_tables(grid: BinGrid, radius: int) -> tuple[np.ndarray, np.ndarray]:
    """Receiver-centric stencil tables for adjoint (mirror) sweeps.

    For sweep step s and bin b, ``mnbr[s, b]`` is the bin b' whose FORWARD
    step s had b as its candidate (nbr[s, b'] == b), and ``mwrap[s, b]`` is
    the lattice wrap that forward step applied — i.e. coordinates satisfy
    cand_position = coord[b-region] + mwrap @ cell as seen from b'.
    Built from the offset mirror: b' = nbr(-offset, b), mwrap = -wrap(-offset, b).
    Gas-phase out-of-grid entries are -1.
    """
    offs = stencil_offsets(radius)
    # index of -offset for each offset
    key = {tuple(o): i for i, o in enumerate(offs)}
    mirror = np.array([key[tuple(-o)] for o in offs], dtype=np.int64)
    nbr, wrap, _zero = stencil_tables(grid, radius)
    mnbr = nbr[mirror]
    mwrap = -wrap[mirror]
    return mnbr.astype(np.int32), mwrap.astype(np.float32)
