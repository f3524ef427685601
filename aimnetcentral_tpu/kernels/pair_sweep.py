"""Pallas TPU kernel: fused symmetric pair-energy sweep on the binned layout.

TPU-native replacement for the XLA ``lax.scan`` sweep in
``engine_binned.pair_energy_binned`` (the DSF/SR-Coulomb/SR-repulsion/D3-CN
long-range machinery — reference kernels K6/K9 territory,
/root/reference/aimnet/modules/lr.py + nvalchemiops pair kernels).  The XLA
formulation materializes (B, C, C) pair tensors in HBM per stencil offset
(and rematerializes them in the backward via checkpointing); this kernel
keeps every pair tile in VMEM.

One production kernel family: **banded HALF-stencil row tiles**
(``pair_acc_hb``) — the conv kernel's xy-banded grid (programs = z-row x
half xy offset, z as a static in-program band) applied to the pair sweep.
Each unordered pair is computed ONCE — the same pair count as the XLA half
sweep; receiver-side sums/adjoints accumulate resident, candidate-side
contributions leave as small per-(s, row) side outputs reassembled by
one static gather (ops/binned.py::xy_band_tables_half).  Dispatched
whenever nz >= 2*radius + 1 and the grid's periodicity is uniform; the
small/mixed-periodicity grids the banded tables don't cover route to the
XLA twin (an earlier per-bin full-stencil kernel covered them and measured
as an end-to-end wash — trimmed, VERDICT r2 item 10).

Design:

- The same ``e_fn(d, valid, self_b, cand_b)`` term functions used by the
  XLA twin are traced INSIDE the kernel on (C, Cc) VMEM tiles (elementwise
  jnp math only); their derivatives come from ``jax.vjp`` in-kernel — one
  differentiable implementation, kernel included.
- Per-atom extras (charges, element parameters) ride as one packed
  (B, C, K) block; lattice-shift adjoints (cell/stress gradients) are
  lane sums of per-(offset, row) side-output rows, exactly like the conv
  kernel's ``pgrad`` side output.

Contract: ``e_fn`` must be symmetric under the full i<->j swap and may only
close over HOST constants (Python floats) — traced values must arrive as
extra blocks.  Callers in engine_binned guard this.

Measured (TPU v5e): see docs/performance.md — hardware parity vs the XLA
half-sweep ~1e-7 on energies and every gradient (a Pallas sweep matching the
f64 brute-force truth is what exposed the default-matmul-precision geometry
bug fixed in ops/math.cellmul).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PAIR_SWEEP_ENABLED = True
except ImportError:  # pragma: no cover
    PAIR_SWEEP_ENABLED = False


def pair_sweep_available() -> bool:
    return PAIR_SWEEP_ENABLED


# XLA's default scoped-VMEM budget for custom calls rejects kernels at
# larger block shapes inside big surrounding graphs (see conv_stencil.py);
# declare the real per-core budget up front.
if PAIR_SWEEP_ENABLED:
    _COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _unpack_bin(ext_bin, keys):
    """(C, K_tot) packed extras -> {name: (C,) | (C, k)} per-bin views."""
    out = {}
    for name, off, k, scalar in keys:
        out[name] = ext_bin[:, off] if scalar else ext_bin[:, off : off + k]
    return out




# ---------------------------------------------------------------------------
# public wrapper (twin of engine_binned.pair_energy_binned)


def pair_energy_pallas(
    system,
    cutoff: float,
    e_pair_fn,
    extra_blocks: dict | None = None,
    layout: str = "sr",
):
    """Drop-in Pallas twin of ``engine_binned.pair_energy_binned``.

    Same contract (symmetric ``e_pair_fn``, per-atom ordered-pair sums in SR
    slot order), same LR-layout routing.  ``e_pair_fn`` must close over host
    constants only.
    """
    from aimnetcentral_tpu.models.engine_binned import stencil_radius
    from aimnetcentral_tpu.ops import binned as B

    grid = system.bins
    assert grid is not None
    lr_slot = None
    if layout == "lr" and system.lr_bins is not None:
        grid = system.lr_bins
        lr_slot = system.lr_slot
    cell0 = system.cell[0] if system.cell is not None else None
    radius = stencil_radius(cutoff, grid, cell0)

    nx, ny, nz = grid.nbins
    uniform_axes = all(grid.axes_periodic) or not any(grid.axes_periodic)
    if nz < 2 * radius + 1 or not uniform_axes:
        # Grids the banded tables don't cover (nz < 2r+1 or mixed-
        # periodicity axes) are SMALL by construction — route them to the
        # XLA twin rather than maintaining a second full-stencil kernel for
        # them (the per-bin v1 kernel measured as an end-to-end wash and
        # was trimmed per VERDICT r2 item 10).
        from aimnetcentral_tpu.models.engine_binned import pair_energy_binned

        return pair_energy_binned(
            system, cutoff, e_pair_fn, extra_blocks, layout, allow_pallas=False
        )

    coord = system.coord
    numbers = system.numbers
    extras = dict(extra_blocks or {})
    if lr_slot is not None:
        coord = jnp.take(coord, lr_slot, axis=0)
        numbers = jnp.take(numbers, lr_slot, axis=0)
        extras = {k: jnp.take(v, lr_slot, axis=0) for k, v in extras.items()}

    b_tot, c = grid.total_bins, grid.capacity
    mask = (numbers > 0).astype(jnp.float32).reshape(b_tot, 1, c)

    # pack extras: scalars one column, trailing-dim vectors k columns
    keys = []
    cols = []
    off = 0
    for name in sorted(extras):
        v = extras[name].reshape(b_tot * c, -1).astype(jnp.float32)
        k = v.shape[1]
        scalar = extras[name].ndim == 1
        keys.append((name, off, k, scalar))
        cols.append(v)
        off += k
    k_tot = max(off, 1)
    if cols:
        ext = jnp.concatenate(cols, axis=1).reshape(b_tot, c, off)
        if off < k_tot:  # pragma: no cover - off >= 1 when cols non-empty
            ext = jnp.pad(ext, ((0, 0), (0, 0), (0, k_tot - off)))
    else:
        ext = jnp.zeros((b_tot, c, 1), jnp.float32)

    # banded half-stencil sweep: one (C, W*C) band tile per
    # (bin, xy half-offset) — same pair count as the XLA half sweep
    acc = _pair_acc_hb_call(
        grid, radius, cell0, coord, mask, ext, tuple(keys), k_tot, cutoff,
        e_pair_fn,
    )
    if lr_slot is not None:
        acc_ext = jnp.concatenate([acc, jnp.zeros((1,), acc.dtype)])
        acc = jnp.take(acc_ext, system.lr_inv, axis=0)
    return acc



# ---------------------------------------------------------------------------
# v3: banded HALF-stencil row tiles — the production sweep.
#
# One program = one (z-row, xy half-offset); the z dimension is a static
# in-program band of W = 2r+1 candidate slots per receiver bin, exactly the
# conv kernel's grid shape (ops/binned.py::xy_band_tables_half).  Each
# unordered pair is computed ONCE — the same pair count as the XLA half
# sweep — with every tile resident in VMEM: the receiver-side energy and
# adjoints accumulate in this row's output blocks, and the candidate-side
# contributions (mirror energy, coordinate and extras adjoints) are emitted
# as small per-(s, row) side outputs and reassembled on the XLA side with
# one static gather (pinv/pvalid — scatters lower to serial loops on TPU).
# The lattice-shift adjoint (cell/stress) is the lane sum of the candidate
# coordinate side output: the shift rides on the candidate coordinates.
#
# s = 0 carries the (0, 0) xy offset: its dz = 0 block is the full ORDERED
# in-bin enumeration (both orderings computed, no mirror — the candidate
# cotangent is masked), its dz < 0 slots are cut (mirrors of dz > 0),
# handled entirely by the static tables (+1e6 shift push / pvalid).


@dataclasses.dataclass(frozen=True)
class PairStaticHB:
    b_tot: int
    c: int
    k_tot: int
    s_tot: int  # half xy offsets ((2r+1)^2 + 1) / 2, (0, 0) first
    t_row: int  # T = nz
    w_band: int  # 2r+1 candidate slots per bin
    keys: tuple

    @property
    def r_tot(self) -> int:
        return self.b_tot // self.t_row


def _tile_geometry_hb(ci, cj, s, c, wc, r_mid, mask_self, mask_cand, cutoff):
    """(C, W*C) band pair distances + validity.  Self pairs sit on the
    dz = 0 block diagonal (col == row + r_mid*C), suppressed only at the
    zero xy offset; invalid band slots arrive pre-pushed out of range.
    ``mask_cand`` is the (1, W*C) band row (2D — Mosaic cannot concatenate
    1D lane vectors)."""
    d2 = jnp.zeros((c, wc), jnp.float32)
    diffs = []
    for k in range(3):
        dk = ci[k][:, None] - cj[k][None, :]
        diffs.append(dk)
        d2 = d2 + dk * dk
    real = jnp.logical_and(mask_self[:, None] > 0.5, mask_cand > 0.5)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 1)
    not_self = jnp.logical_or(s != 0, col_ids != row_ids + r_mid * c)
    vp = jnp.logical_and(jnp.logical_and(real, not_self), d2 > 1e-10)
    d = jnp.sqrt(jnp.where(vp, d2, 1.0))
    vp = jnp.logical_and(vp, d < cutoff)
    inv_d = 1.0 / d
    return d, inv_d, diffs, vp


def _fwd_kernel_hb(
    row_ref,  # (S*R,) int32 candidate-row table (half xy offsets)
    coord_self_ref,  # (T, 4, C)
    coord_cand_ref,  # (T, 4, C)
    mask_self_ref,  # (T, 1, C)
    mask_cand_ref,  # (T, 1, C)
    ext_self_ref,  # (T, C, K)
    ext_cand_ref,  # (T, C, K)
    shift_ref,  # (1, 1, T, W, 4) banded lattice shifts for this (s, row)
    scal_ref,  # (1, 4) [cutoff, 0, 0, 0]
    out_ref,  # (T, 1, C) receiver-side sums, resident over s
    me_ref,  # (1, T*W, C) candidate-side (mirror) sums for this (s, row)
    *,
    t_row: int,
    c: int,
    w_band: int,
    keys: tuple,
    e_fn,
):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    cutoff = scal_ref[0, 0]
    wc = w_band * c
    r_mid = (w_band - 1) // 2
    for t in range(t_row):
        slots = [(t + w - r_mid) % t_row for w in range(w_band)]
        ci = coord_self_ref[t]  # (4, C)
        shift_t = shift_ref[0, 0, t]  # (W, 4)
        cj = jnp.concatenate(
            [coord_cand_ref[slots[w]] + shift_t[w].reshape(4, 1) for w in range(w_band)],
            axis=1,
        )  # (4, W*C)
        mask_band = jnp.concatenate(
            [mask_cand_ref[slots[w]] for w in range(w_band)], axis=1
        )  # (1, W*C)
        d, _inv_d, _diffs, vp = _tile_geometry_hb(
            ci, cj, s, c, wc, r_mid, mask_self_ref[t, 0], mask_band, cutoff
        )
        self_b = _unpack_bin(ext_self_ref[t], keys)
        ext_band = jnp.concatenate(
            [ext_cand_ref[slots[w]] for w in range(w_band)], axis=0
        )  # (W*C, K)
        cand_b = _unpack_bin(ext_band, keys)
        e = jnp.where(vp, e_fn(d, vp, self_b, cand_b), 0.0)
        out_ref[t, 0, :] += e.sum(axis=1)
        for w in range(w_band):
            # candidate-side pair sums per band slot; non-mirroring blocks
            # (s = 0) are masked by pvalid in the reassembly gather
            me_ref[0, t * w_band + w, :] = e[:, w * c : (w + 1) * c].sum(axis=0)


def _bwd_kernel_hb(
    row_ref,
    coord_self_ref,  # (T, 4, C)
    coord_cand_ref,
    mask_self_ref,
    mask_cand_ref,
    ext_self_ref,  # (T, C, K)
    ext_cand_ref,
    ct_self_ref,  # (T, 1, C)
    ct_cand_ref,
    shift_ref,  # (1, 1, T, W, 4)
    scal_ref,
    g_coord_ref,  # (T, 4, C) receiver-side coordinate adjoint
    g_ext_ref,  # (T, C, K) receiver-side extras adjoint
    gmc_ref,  # (1, T*W*4, C) candidate-side coordinate adjoint rows
    gme_ref,  # (1, T*W*K, C) candidate-side extras adjoint rows
    *,
    t_row: int,
    c: int,
    w_band: int,
    k_tot: int,
    keys: tuple,
    e_fn,
):
    """One fused adjoint sweep over the same half stencil: every pair's
    chain-rule cotangent is ct_i + ct_j (the forward accumulated e to both
    endpoints; for the s = 0 ordered in-bin block the same cotangent makes
    the self-side sum two-sided-complete by symmetry — see inline note)."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        g_coord_ref[...] = jnp.zeros_like(g_coord_ref)
        g_ext_ref[...] = jnp.zeros_like(g_ext_ref)

    cutoff = scal_ref[0, 0]
    wc = w_band * c
    r_mid = (w_band - 1) // 2
    for t in range(t_row):
        slots = [(t + w - r_mid) % t_row for w in range(w_band)]
        ci = coord_self_ref[t]
        shift_t = shift_ref[0, 0, t]
        cj = jnp.concatenate(
            [coord_cand_ref[slots[w]] + shift_t[w].reshape(4, 1) for w in range(w_band)],
            axis=1,
        )
        mask_band = jnp.concatenate(
            [mask_cand_ref[slots[w]] for w in range(w_band)], axis=1
        )  # (1, W*C)
        d, inv_d, diffs, vp = _tile_geometry_hb(
            ci, cj, s, c, wc, r_mid, mask_self_ref[t, 0], mask_band, cutoff
        )
        self_b = _unpack_bin(ext_self_ref[t], keys)
        ext_band = jnp.concatenate(
            [ext_cand_ref[slots[w]] for w in range(w_band)], axis=0
        )
        cand_b = _unpack_bin(ext_band, keys)
        ct_i = ct_self_ref[t, 0]  # (C,)
        ct_j = jnp.concatenate(
            [ct_cand_ref[slots[w]] for w in range(w_band)], axis=1
        )  # (1, W*C)
        # Every block uses the full pair cotangent ct_i + ct_j.  For the
        # s = 0 ordered in-bin block (whose candidate side is dropped by
        # pvalid) this is still exact: by e's i<->j symmetry the self-side
        # sum over both orderings with ct_i + ct_j equals the complete
        # two-sided adjoint (the v1 full-stencil identity).
        vf = vp.astype(jnp.float32)
        cbar = vf * (ct_i[:, None] + ct_j)

        def f(d_, sv, cv):
            return jnp.where(vp, e_fn(d_, vp, sv, cv), 0.0)

        _e, vjp_fn = jax.vjp(f, d, self_b, cand_b)
        dd, gsv, gcv = vjp_fn(cbar)
        for k in range(3):
            uk = diffs[k] * inv_d  # (r_i - r_j)/d
            dk = dd * uk
            g_coord_ref[t, k, :] += dk.sum(axis=1)
            for w in range(w_band):
                gmc_ref[0, (t * w_band + w) * 4 + k, :] = -dk[
                    :, w * c : (w + 1) * c
                ].sum(axis=0)
        for w in range(w_band):
            gmc_ref[0, (t * w_band + w) * 4 + 3, :] = jnp.zeros((c,), jnp.float32)
        kk_used = 0
        for name, off, k, scalar in keys:
            gs_v = gsv[name]
            gc_v = gcv[name]
            if scalar:
                g_ext_ref[t, :, off] += gs_v
                for w in range(w_band):
                    gme_ref[0, (t * w_band + w) * k_tot + off, :] = gc_v[
                        w * c : (w + 1) * c
                    ]
                kk_used += 1
            else:
                g_ext_ref[t, :, off : off + k] += gs_v
                for kk in range(k):
                    for w in range(w_band):
                        gme_ref[0, (t * w_band + w) * k_tot + off + kk, :] = gc_v[
                            w * c : (w + 1) * c, kk
                        ]
                kk_used += k
        if kk_used < k_tot:  # padding column of the packed extras block
            for kk in range(kk_used, k_tot):
                for w in range(w_band):
                    gme_ref[0, (t * w_band + w) * k_tot + kk, :] = jnp.zeros(
                        (c,), jnp.float32
                    )


def _hb_specs(st: PairStaticHB, with_ct: bool):
    t_row, c, k, r_tot = st.t_row, st.c, st.k_tot, st.r_tot
    self_idx = lambda r, s, rt: (r, 0, 0)
    cand_idx = lambda r, s, rt: (rt[s * r_tot + r], 0, 0)
    specs = [
        pl.BlockSpec((t_row, 4, c), self_idx),
        pl.BlockSpec((t_row, 4, c), cand_idx),
        pl.BlockSpec((t_row, 1, c), self_idx),
        pl.BlockSpec((t_row, 1, c), cand_idx),
        pl.BlockSpec((t_row, c, k), self_idx),
        pl.BlockSpec((t_row, c, k), cand_idx),
    ]
    if with_ct:
        specs += [
            pl.BlockSpec((t_row, 1, c), self_idx),
            pl.BlockSpec((t_row, 1, c), cand_idx),
        ]
    specs += [
        pl.BlockSpec((1, 1, t_row, st.w_band, 4), lambda r, s, rt: (s, r, 0, 0, 0)),
        pl.BlockSpec((1, 4), lambda r, s, rt: (0, 0)),
    ]
    return specs


@functools.partial(jax.jit, static_argnames=("st", "e_fn"))
def pair_sweep_forward_hb(st, e_fn, row_flat, coord_t, mask, ext, shift_band, scal):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(st.r_tot, st.s_tot),
        in_specs=_hb_specs(st, with_ct=False),
        out_specs=(
            pl.BlockSpec((st.t_row, 1, st.c), lambda r, s, rt: (r, 0, 0)),
            pl.BlockSpec(
                (1, st.t_row * st.w_band, st.c),
                lambda r, s, rt: (s * st.r_tot + r, 0, 0),
            ),
        ),
    )
    kernel = functools.partial(
        _fwd_kernel_hb, t_row=st.t_row, c=st.c, w_band=st.w_band,
        keys=st.keys, e_fn=e_fn,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=(
            jax.ShapeDtypeStruct((st.b_tot, 1, st.c), jnp.float32),
            jax.ShapeDtypeStruct(
                (st.s_tot * st.r_tot, st.t_row * st.w_band, st.c), jnp.float32
            ),
        ),
    )(row_flat, coord_t, coord_t, mask, mask, ext, ext, shift_band, scal)


@functools.partial(jax.jit, static_argnames=("st", "e_fn"))
def pair_sweep_backward_hb(
    st, e_fn, row_flat, coord_t, mask, ext, ct, shift_band, scal
):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(st.r_tot, st.s_tot),
        in_specs=_hb_specs(st, with_ct=True),
        out_specs=(
            pl.BlockSpec((st.t_row, 4, st.c), lambda r, s, rt: (r, 0, 0)),
            pl.BlockSpec((st.t_row, st.c, st.k_tot), lambda r, s, rt: (r, 0, 0)),
            pl.BlockSpec(
                (1, st.t_row * st.w_band * 4, st.c),
                lambda r, s, rt: (s * st.r_tot + r, 0, 0),
            ),
            pl.BlockSpec(
                (1, st.t_row * st.w_band * st.k_tot, st.c),
                lambda r, s, rt: (s * st.r_tot + r, 0, 0),
            ),
        ),
    )
    kernel = functools.partial(
        _bwd_kernel_hb, t_row=st.t_row, c=st.c, w_band=st.w_band,
        k_tot=st.k_tot, keys=st.keys, e_fn=e_fn,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=(
            jax.ShapeDtypeStruct((st.b_tot, 4, st.c), jnp.float32),
            jax.ShapeDtypeStruct((st.b_tot, st.c, st.k_tot), jnp.float32),
            jax.ShapeDtypeStruct(
                (st.s_tot * st.r_tot, st.t_row * st.w_band * 4, st.c), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (st.s_tot * st.r_tot, st.t_row * st.w_band * st.k_tot, st.c),
                jnp.float32,
            ),
        ),
    )(row_flat, coord_t, coord_t, mask, mask, ext, ext, ct, ct, shift_band, scal)


def _hb_gather(side, pinv, pvalid, st, trail):
    """Reassemble a candidate-side side output: ``side`` (S*R, T*W*prod(trail), C)
    -> per-destination-bin sums (B, *trail, C) via the static inverse gather."""
    rows = side.reshape((st.s_tot * st.r_tot * st.t_row * st.w_band,) + trail + (st.c,))
    taken = jnp.take(rows, pinv.reshape(-1), axis=0).reshape(
        (st.s_tot, st.w_band, st.b_tot) + trail + (st.c,)
    )
    pv = pvalid.reshape((st.s_tot, st.w_band, st.b_tot) + (1,) * (len(trail) + 1))
    return (taken * pv).sum((0, 1))


def _pair_hb_primal(st, e_fn, coord_t, mask, ext, row_flat, pinv, pvalid, shift_band, scal):
    out, me = pair_sweep_forward_hb(
        st, e_fn, row_flat, coord_t, mask, ext, shift_band, scal
    )
    return out + _hb_gather(me, pinv, pvalid, st, ())[:, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def pair_acc_hb(st, e_fn, coord_t, mask, ext, row_flat, pinv, pvalid, shift_band, scal):
    """Per-atom symmetric pair sums (B, 1, C), banded half-stencil sweep with
    a fused Pallas adjoint and static-gather mirror reassembly."""
    return _pair_hb_primal(
        st, e_fn, coord_t, mask, ext, row_flat, pinv, pvalid, shift_band, scal
    )


def _pair_acc_hb_fwd(st, e_fn, coord_t, mask, ext, row_flat, pinv, pvalid, shift_band, scal):
    out = _pair_hb_primal(
        st, e_fn, coord_t, mask, ext, row_flat, pinv, pvalid, shift_band, scal
    )
    return out, (coord_t, mask, ext, row_flat, pinv, pvalid, shift_band, scal)


def _pair_acc_hb_bwd(st, e_fn, res, ct):
    coord_t, mask, ext, row_flat, pinv, pvalid, shift_band, scal = res
    gc, gext, gmc, gme = pair_sweep_backward_hb(
        st, e_fn, row_flat, coord_t, mask, ext, ct, shift_band, scal
    )
    # lattice-shift adjoint: the shift rides on the candidate coordinates, so
    # its adjoint is the LANE sum of the candidate coordinate rows, back in
    # the (S, R, T, W, 4) frame of the shift_band input
    ds_band = gmc.reshape(
        st.s_tot, st.r_tot, st.t_row, st.w_band, 4, st.c
    ).sum(-1)
    gc = gc + _hb_gather(gmc, pinv, pvalid, st, (4,))
    gext = gext + jnp.swapaxes(_hb_gather(gme, pinv, pvalid, st, (st.k_tot,)), 1, 2)
    return (
        gc,
        jnp.zeros_like(mask),
        gext,
        jnp.zeros_like(row_flat),
        jnp.zeros_like(pinv),
        jnp.zeros_like(pvalid),
        ds_band,
        jnp.zeros_like(scal),
    )


pair_acc_hb.defvjp(_pair_acc_hb_fwd, _pair_acc_hb_bwd)


def _pair_acc_hb_call(grid, radius, cell0, coord, mask, ext, keys, k_tot, cutoff, e_fn):
    """Build banded half-stencil tables and invoke the v3 custom_vjp.

    ``coord`` (L, 3) in this grid's slot order; ``mask`` (B, 1, C);
    ``ext`` (B, C, K).  Returns per-atom ordered-pair sums (L,) in slot
    order.
    """
    from aimnetcentral_tpu.ops import binned as B

    b_tot, c = grid.total_bins, grid.capacity
    t_row = grid.nbins[2]
    dtype = coord.dtype

    bt = B.xy_band_tables_half(grid, radius)
    s_tot, w_band = int(bt["s_tot"]), int(bt["w_tot"])
    r_tot = bt["xyrow"].shape[1]

    if cell0 is not None:
        sh = jnp.einsum(
            "srtwk,kh->srtwh", jnp.asarray(bt["wrap"]), cell0,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        sh = jnp.zeros((s_tot, r_tot, t_row, w_band, 3), dtype)
    push = ~bt["valid"]
    if push.any():
        sh = sh + jnp.asarray(push[..., None].astype(np.float32)) * 1e6
    shift_band = jnp.concatenate(
        [sh, jnp.zeros((s_tot, r_tot, t_row, w_band, 1), dtype)], axis=-1
    )

    coord_t = jnp.concatenate(
        [
            coord.reshape(b_tot, c, 3).transpose(0, 2, 1),
            jnp.zeros((b_tot, 1, c), dtype),
        ],
        axis=1,
    )
    st = PairStaticHB(
        b_tot=b_tot, c=c, k_tot=k_tot, s_tot=s_tot, t_row=t_row,
        w_band=w_band, keys=keys,
    )
    scal = jnp.asarray([cutoff, 0.0, 0.0, 0.0], jnp.float32).reshape(1, 4)
    row_flat = jnp.asarray(np.where(bt["xyrow"] < 0, 0, bt["xyrow"]).reshape(-1))
    acc = pair_acc_hb(
        st, e_fn, coord_t, mask, ext, row_flat,
        jnp.asarray(bt["pinv"]), jnp.asarray(bt["pvalid"]), shift_band, scal,
    )
    return acc.reshape(-1)
