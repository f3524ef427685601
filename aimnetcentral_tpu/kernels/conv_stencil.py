"""Pallas TPU kernel: fused stencil ConvSV contraction, xy-banded bin rows.

The TPU-native replacement for the reference's Warp CUDA kernel family K1-K4
(reference aimnet/kernels/conv_sv_2d_sp_wp.py) on top of the binned layout.

Bins are z-fastest, so one program processes a whole z-row of T = nz bins.
Only the (2r+1)^2 XY offsets live in the program grid; the z dimension is a
static in-program BAND: receiver bin t pairs against candidate slots
(t + dz) mod T for dz in [-r, r] (W = 2r+1 slots, unrolled — the slot
indices are compile-time constants).  Versus the earlier per-offset grid
((2r+1)^3 steps with a dynamic z-rotation) this cuts the program count and
the per-program DMA of candidate rows / cotangent blocks by (2r+1)x at
identical MXU work — the ~1.65 us/program dispatch floor and the candidate
re-fetch were a measured ~20% of the 10k-atom force call.

Per (row, xy-offset) program:

1. the pipeline DMAs the candidate row's coordinates + feature block
   (T, C, G*F) into VMEM (row index from the scalar-prefetched row table),
2. for each of the T bins: band pair distances (C, W*C), cosine-cutoff
   Gaussian basis and unit vectors on full (C, gamma*W*C) lanes; the grouped
   block-diagonal candidate matrix as a masked vertical tile; ONE
   (4C x gamma*W*C) @ (gamma*W*C x gamma*F) MXU matmul per g-group,
3. accumulates into the row's output block, resident across the offset
   dimension of the grid.

The gradient is ONE fused Pallas adjoint sweep (wired via custom_vjp in
conv_pallas.py): ``conv_stencil_bwd_banded`` runs the RECEIVER-centric
mirror stencil and accumulates the feature adjoint and the receiver-side
coordinate adjoint resident (no scatters — the TPU-native answer to the
reference's atomic-add scatter backward, conv_sv_2d_sp_wp.py:115-164),
while emitting the partner(self)-side row sums of the same per-pair
cotangent into a small (S*R, T*W*4, C) side output; the self-side
coordinate adjoint and the lattice-shift adjoint (cell/strain gradients)
are reassembled from it with one static gather (conv_pallas._conv_acc_bwd).

Layout contracts:
- coords are passed TRANSPOSED per bin: (B, 4, C) (lanes = C),
- features and cotangents are G-MAJOR: (B*C, G*F) with column g*F + f,
- output: (B, 4C, G*F), row j = d*C + i (direction-major), same g-major cols,
- row tables: (S, R) int32 with R = nx*ny (ops/binned.py::xy_band_tables);
  banded lattice shifts: (S, R, T, W, 4) f32, slot (t + (w - r)) mod T.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_CONV_ENABLED = True
except ImportError:  # pragma: no cover
    PALLAS_CONV_ENABLED = False


def conv_stencil_available() -> bool:
    return PALLAS_CONV_ENABLED


# XLA's default scoped-VMEM budget for custom calls (~16 MB) rejects the
# kernels at larger (T, C, G*F) block shapes when they compile inside a big
# surrounding graph (seen: the calculator's eval_grad at an 8^3/C=40 grid,
# "Scoped allocation with size 28.88M ... exceeded scoped vmem limit").
# Declare the real per-core VMEM budget instead; the pipeline's actual
# working set (two banded blocks + scratch) stays far below it.
if PALLAS_CONV_ENABLED:
    _COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pair_geom_rect(ci, cj, s, m, n, rc, mask_i, mask_j, self_diag):
    """Rectangular pair geometry.  ``ci`` (4, m) / ``cj`` (4, n), shifts
    already applied; ``self_diag`` is the static (m, n) bool mask of
    self-pairs (suppressed only when s == 0, the zero xy offset — the
    band's dz = 0 block).  Returns (d, inv_d, within_f, fc, fcp)."""
    d2 = jnp.zeros((m, n), jnp.float32)
    for k in range(3):
        dk = cj[k][None, :] - ci[k][:, None]
        d2 = d2 + dk * dk

    real_i = mask_i[:, None] > 0.5  # (m, 1)
    real_j = mask_j[None, :] > 0.5  # (1, n)
    not_self = jnp.logical_or(s != 0, ~self_diag)
    vp = jnp.logical_and(jnp.logical_and(real_i, real_j), not_self)

    d2s = jnp.where(vp, d2, 1.0)
    d = jnp.sqrt(d2s)
    inv_d = 1.0 / d
    within = jnp.logical_and(vp, d < rc)
    within_f = within.astype(jnp.float32)
    arg = jnp.minimum(d, rc) * (jnp.pi / rc)
    fc = jnp.where(within, 0.5 * (jnp.cos(arg) + 1.0), 0.0)
    fcp = jnp.where(within, -0.5 * (jnp.pi / rc) * jnp.sin(arg), 0.0)
    return d, inv_d, within_f, fc, fcp


def _chain_accumulate(
    wbar, gs_all, dgs_all, u_tiled, dbar, ubar, gamma, m, width, bsum=None,
    pin_default=False,
):
    """Accumulate one g-group's weight cotangents into the (dbar, ubar)
    chain-rule accumulators (all full-lane (m, gamma*width) ops,
    block-summed down to (m, width)).

    W rows are [gs, gs*u_x, gs*u_y, gs*u_z]:
        gsbar  = Wbar_0 + sum_k Wbar_k u_k
        ubar_k += sum_g Wbar_k gs_g ;  dbar += sum_g gsbar_g dgs_g/dd

    ``bsum`` (gamma*width, width) is the constant block-sum matrix: when
    given, the gamma-block reductions run as MXU dots instead of gamma-1
    VPU slice-adds.  Mosaic's default dot truncates f32 inputs to one bf16
    pass (~2e-3 relative — measured to break force parity) and HIGHEST
    costs 6 passes (slower than the VPU adds), so the dot is double-pumped
    by hand: a bf16-exact high part plus a bf16 low part (two 1-pass dots,
    ~1e-5 relative — the 0/1 block-sum matrix is exact in bf16).
    """
    def _bs(x):
        if bsum is None:
            return _block_sum(x, gamma, width)

        return _dp_dot(x, bsum, (((1,), (0,)), ((), ())), pin_default=pin_default)

    gsbar = wbar[0:m, :]
    for k in range(3):
        wk = wbar[(k + 1) * m : (k + 2) * m, :]
        gsbar = gsbar + wk * u_tiled[k]
        ubar[k] = ubar[k] + _bs(wk * gs_all)
    dbar = dbar + _bs(gsbar * dgs_all)
    return dbar, ubar


def _block_sum_matrix(gamma, width):
    """(gamma*width, width) f32 constant: out = x @ M sums the gamma column
    blocks of x — an MXU reduction replacing gamma-1 VPU slice-adds."""
    row_i = jax.lax.broadcasted_iota(jnp.int32, (gamma * width, width), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (gamma * width, width), 1)
    return (row_i % width == col_i).astype(jnp.float32)


def _hi_lo(x):
    """Split f32 into a bf16-exact high part + the bf16-sized residual.
    The single split shared by _dp_dot and _mxu_dot — hi carries the top 8
    mantissa bits, lo the next ~8; (hi + lo) represents x to ~2^-17."""
    x_hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return x_hi, x - x_hi


def _dp_dot(x, m, dims, pin_default=False):
    """Double-pumped exact-enough dot (see _chain_accumulate): Mosaic's
    default dot truncates f32 operands to one bf16 pass; splitting x into a
    bf16-exact high part + bf16 low part costs two 1-pass dots for ~1e-5
    relative (m is a 0/1 constant, exact in bf16 — hence one-sided:
    splitting m would be a no-op).

    ``pin_default`` (the f32x3 / "balanced" mode) pins both dots to
    Precision.DEFAULT so the exact calculator surface's ambient HIGHEST
    cannot silently turn them into 2x6 passes."""
    x_hi, x_lo = _hi_lo(x)
    prec = jax.lax.Precision.DEFAULT if pin_default else None
    return jax.lax.dot_general(
        x_hi, m, dims, precision=prec, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        x_lo, m, dims, precision=prec, preferred_element_type=jnp.float32
    )


def _mxu_dot(x, y, dims, mxu_dtype, split3):
    """The kernels' MXU contraction with a precision-mode switch.

    ``split3=False``: ONE dot at the ambient matmul precision — 1 bf16 MXU
    pass under the JAX default (the MD fast path), 6 passes when the exact
    calculator surface sets ambient HIGHEST.

    ``split3=True`` (kernel precision "f32x3", the calculator's
    ``precision="balanced"``): both operands split into a bf16-exact high
    part + bf16 low part and contracted with THREE explicitly-DEFAULT
    1-pass dots (hi@hi + hi@lo + lo@hi; the dropped lo@lo term is
    ~2^-18 relative).  Measured 6.5e-6 eV/A max force delta on 10k-atom
    forces vs exact, 1000x tighter than the 1-pass default's 7.6e-3 — at
    half the MXU passes of HIGHEST, immune to the ambient context (Mosaic
    cannot lower ambient "high", and XLA's own 3-pass tier measured no
    faster than HIGHEST on this toolchain: 956 vs 983 ms/call)."""
    if not split3:
        return jax.lax.dot_general(
            x.astype(mxu_dtype),
            y.astype(mxu_dtype),
            dims,
            preferred_element_type=jnp.float32,
        )
    dflt = jax.lax.Precision.DEFAULT
    x_hi, x_lo = _hi_lo(x)
    y_hi, y_lo = _hi_lo(y)

    def d(a, b):
        return jax.lax.dot_general(
            a, b, dims, precision=dflt, preferred_element_type=jnp.float32
        )

    return d(x_hi, y_hi) + d(x_hi, y_lo) + d(x_lo, y_hi)


def _coord_chain_finish(uk, inv_d, within_f, dbar, ubar):
    """Finish the chain rule: the cotangent of r_k = cj_k - ci_k is
        rbar_k = dbar u_k + (ubar_k - (sum_l ubar_l u_l) u_k) / d
    """
    uu = ubar[0] * uk[0] + ubar[1] * uk[1] + ubar[2] * uk[2]
    return [
        within_f * (dbar * uk[k] + (ubar[k] - uu * uk[k]) * inv_d)
        for k in range(3)
    ]


def _group_shift_rows(shifts_g_ref, gamma, width, n_groups):
    """Block-constant radial-shift rows, one (1, gamma*width) per g-group:
    column j carries shift_{gi*gamma + j // width}.  Hoisted to the top of
    every kernel — they depend only on the (static-shape) shift table, and
    they are what lets the pair math run on full (m, gamma*width) lanes
    instead of gamma separate (m, width) tiles."""
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (1, gamma * width), 1) // width
    rows = []
    for gi in range(n_groups):
        row = jnp.zeros((1, gamma * width), jnp.float32)
        for g2 in range(gamma):
            row = row + shifts_g_ref[0, gi * gamma + g2] * (
                col_blk == g2
            ).astype(jnp.float32)
        rows.append(row)
    return rows


def _gs_tiled(d_t, fc_t, fcp_t, sg_row, eta, want_dgs):
    """Gaussian basis (and optionally its d-derivative) for a whole g-group
    at once on (m, gamma*width) lanes: gs = exp(-eta (d - s_g)^2) fc.
    ``d_t``/``fc_t``/``fcp_t`` are the PRE-TILED tensors (group-independent
    — tiled once per bin pair)."""
    dd = d_t - sg_row
    e = jnp.exp(-eta * dd * dd)
    gs_all = e * fc_t
    if not want_dgs:
        return gs_all, None
    dgs_all = e * (fcp_t - 2.0 * eta * dd * fc_t)
    return gs_all, dgs_all


def _block_sum(x, gamma, width):
    """Sum the gamma column blocks of (m, gamma*width) down to (m, width)."""
    acc = x[:, 0:width]
    for g2 in range(1, gamma):
        acc = acc + x[:, g2 * width : (g2 + 1) * width]
    return acc


def _fill_w(w_scratch, gs_all, u_tiled, m):
    """Fill the (4m, gamma*width) pair-weight scratch: rows [gs; gs*u_x;
    gs*u_y; gs*u_z], each a full-lane (m, gamma*width) store."""
    w_scratch[0:m, :] = gs_all
    for k in range(3):
        w_scratch[(k + 1) * m : (k + 2) * m, :] = gs_all * u_tiled[k]


def _block_mask(gamma, width, f):
    """(gamma*width, gamma*F) f32 block-diagonal mask: row block i//width ==
    col block j//F.  Constant — hoisted to the top of each kernel body."""
    row_blk = (
        jax.lax.broadcasted_iota(jnp.int32, (gamma * width, gamma * f), 0) // width
    )
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (gamma * width, gamma * f), 1) // f
    return (row_blk == col_blk).astype(jnp.float32)


def _mxu_dtype(precision: str):
    if precision == "bf16":
        return jnp.bfloat16
    if precision not in ("f32", "f32x3"):
        raise ValueError(
            f"precision must be 'f32', 'f32x3' or 'bf16', got {precision!r}"
        )
    return jnp.float32


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(
    # scalar prefetch
    row_ref,  # (S*R,) int32 candidate-row table (xy offsets)
    # inputs
    coord_self_ref,  # (T, 4, C)
    coord_cand_ref,  # (T, 4, C)  candidate row
    mask_self_ref,  # (T, 1, C)
    mask_cand_ref,  # (T, 1, C)
    a_cand_ref,  # (T, C, G*F)
    shift_ref,  # (1, 1, T, W, 4)  banded cartesian shifts for this (s, row)
    shifts_g_ref,  # (1, G)
    scal_ref,  # (1, 4) [eta, rc, unused, unused]
    # output
    out_ref,  # (T, 4*C, G*F)
    *,
    t_row: int,
    c: int,
    g: int,
    f: int,
    gamma: int,
    w_band: int,
    mxu_dtype=jnp.float32,
    split3: bool = False,
):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    eta = scal_ref[0, 0]
    rc = scal_ref[0, 1]
    n_groups = g // gamma
    wc = w_band * c
    r_mid = (w_band - 1) // 2
    sg_rows = _group_shift_rows(shifts_g_ref, gamma, wc, n_groups)
    blockmask = _block_mask(gamma, wc, f)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 1)
    self_diag = col_i == row_i + r_mid * c  # dz = 0 block diagonal

    def body(w_scratch):
        # UNROLLED t loop: measured 26% faster than a fori_loop + pl.ds
        # dynamic form on this toolchain (static addressing; the backward
        # kernel uses the dynamic form instead — it is runtime-neutral
        # there and compiles 5x faster with a per-iteration-bounded stack)
        for t in range(t_row):
            slots = [(t + w - r_mid) % t_row for w in range(w_band)]
            ci = coord_self_ref[t]  # (4, C)
            shift_t = shift_ref[0, 0, t]  # (W, 4)
            cj = jnp.concatenate(
                [
                    coord_cand_ref[slots[w]] + shift_t[w].reshape(4, 1)
                    for w in range(w_band)
                ],
                axis=1,
            )  # (4, W*C)
            mask_band = jnp.concatenate(
                [mask_cand_ref[slots[w], 0] for w in range(w_band)], axis=0
            )
            d, inv_d, _within, fc, _fcp = _pair_geom_rect(
                ci, cj, s, c, wc, rc, mask_self_ref[t, 0], mask_band, self_diag
            )
            u_tiled = [
                pltpu.repeat(
                    (cj[k][None, :] - ci[k][:, None]) * inv_d, gamma, axis=1
                )
                for k in range(3)
            ]
            d_t = pltpu.repeat(d, gamma, axis=1)
            fc_t = pltpu.repeat(fc, gamma, axis=1)
            for gi in range(n_groups):
                a_band = jnp.concatenate(
                    [
                        a_cand_ref[slots[w]][
                            :, gi * gamma * f : (gi + 1) * gamma * f
                        ]
                        for w in range(w_band)
                    ],
                    axis=0,
                )  # (W*C, gamma*F)
                abig = pltpu.repeat(a_band, gamma, axis=0) * blockmask
                gs_all, _ = _gs_tiled(d_t, fc_t, None, sg_rows[gi], eta, False)
                _fill_w(w_scratch, gs_all, u_tiled, c)
                contrib = _mxu_dot(
                    w_scratch[...],
                    abig,
                    (((1,), (0,)), ((), ())),
                    mxu_dtype,
                    split3,
                )  # (4C, gamma*F)
                out_ref[t, :, gi * gamma * f : (gi + 1) * gamma * f] += contrib

    pl.run_scoped(
        body,
        w_scratch=pltpu.VMEM((4 * c, gamma * w_band * c), jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("r_tot", "t_row", "c", "g", "f", "gamma", "w_band", "precision"),
)
def conv_stencil_forward(
    row_flat: jax.Array,  # (S*R,) int32
    coord_t: jax.Array,  # (B, 4, C) f32
    mask: jax.Array,  # (B, 1, C) f32
    a_gmajor: jax.Array,  # (B, C, G*F) f32
    shift_band: jax.Array,  # (S, R, T, W, 4) f32
    shifts_g: jax.Array,  # (1, G)
    scal: jax.Array,  # (1, 4) [eta, rc, 0, 0]
    r_tot: int,
    t_row: int,
    c: int,
    g: int,
    f: int,
    gamma: int = 8,
    w_band: int = 3,
    precision: str = "f32",
) -> jax.Array:
    s_tot = shift_band.shape[0]
    b_tot = r_tot * t_row

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_tot, s_tot),
        in_specs=[
            pl.BlockSpec((t_row, 4, c), lambda r, s, rt: (r, 0, 0)),
            pl.BlockSpec((t_row, 4, c), lambda r, s, rt: (rt[s * r_tot + r], 0, 0)),
            pl.BlockSpec((t_row, 1, c), lambda r, s, rt: (r, 0, 0)),
            pl.BlockSpec((t_row, 1, c), lambda r, s, rt: (rt[s * r_tot + r], 0, 0)),
            pl.BlockSpec((t_row, c, g * f), lambda r, s, rt: (rt[s * r_tot + r], 0, 0)),
            pl.BlockSpec(
                (1, 1, t_row, w_band, 4), lambda r, s, rt: (s, r, 0, 0, 0)
            ),
            pl.BlockSpec((1, g), lambda r, s, rt: (0, 0)),
            pl.BlockSpec((1, 4), lambda r, s, rt: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (t_row, 4 * c, g * f), lambda r, s, rt: (r, 0, 0)
        ),
    )

    kernel = functools.partial(
        _fwd_kernel, t_row=t_row, c=c, g=g, f=f, gamma=gamma, w_band=w_band,
        mxu_dtype=_mxu_dtype(precision), split3=precision == "f32x3",
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_tot, 4 * c, g * f), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
    )(
        row_flat,
        coord_t,
        coord_t,  # candidate view (indexed via the row table)
        mask,
        mask,
        a_gmajor,
        shift_band,
        shifts_g,
        scal,
    )


# ---------------------------------------------------------------------------
# backward: ONE fused mirror sweep — grad_a + both coordinate adjoints
#
# The mirror sweep forms every forward pair's full chain-rule cotangent rbar
# (rows = partner/self band atoms i, cols = receiver/candidate atoms j).
# The receiver-side gradient is resident (column sums into this row's
# block); the partner-side gradient and the lattice-shift adjoint are ROW
# sums of the same rbar, emitted per (xy-offset, receiver-row) into a small
# (S*R, T*W*4, C) side output and reassembled on the XLA side with one
# static gather (conv_pallas._conv_acc_bwd).


def _bwd_kernel(
    # scalar prefetch
    mrow_ref,  # (S*R,) int32 receiver-centric mirror row table
    # inputs
    coord_partner_ref,  # (T, 4, C)   partner row (forward self side)
    coord_recv_ref,  # (T, 4, C)      this row (forward candidates)
    mask_partner_ref,  # (T, 1, C)
    mask_recv_ref,  # (T, 1, C)
    a_recv_ref,  # (T, C, G*F)        this row's features
    gbar_ref,  # (T, 4*C, G*F)        partner row's cotangent block
    mshift_ref,  # (1, 1, T, W, 4)    forward shifts, receiver frame
    shifts_g_ref,  # (1, G)
    scal_ref,  # (1, 4)
    # outputs
    grad_a_ref,  # (T, C, G*F)
    grad_coord_ref,  # (T, 4, C)
    pgrad_ref,  # (1, T*W*4, C)  partner-side row sums for this (s, row)
    *,
    t_row: int,
    c: int,
    g: int,
    f: int,
    gamma: int,
    w_band: int,
    mxu_dtype=jnp.float32,
    split3: bool = False,
):
    """For every forward pair (i in the partner band, j in this row's bin t),
    accumulate W^T @ gbar into grad_a and the j-side coordinate cotangent —
    mirror tables keep every write resident in this row's blocks.  The
    i-side cotangent (row sums of the same rbar) goes to ``pgrad_ref``,
    written once per (s, row) program."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        grad_a_ref[...] = jnp.zeros_like(grad_a_ref)
        grad_coord_ref[...] = jnp.zeros_like(grad_coord_ref)

    eta = scal_ref[0, 0]
    rc = scal_ref[0, 1]
    n_groups = g // gamma
    wc = w_band * c
    r_mid = (w_band - 1) // 2
    sg_rows = _group_shift_rows(shifts_g_ref, gamma, c, n_groups)
    blockmask = _block_mask(gamma, c, f)
    bsum = _block_sum_matrix(gamma, c)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (wc, c), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (wc, c), 1)
    self_diag = row_i == col_i + r_mid * c

    def body(w_scratch, gband_scratch):
        # DYNAMIC t loop (fori_loop + pl.ds): T x less unrolled Mosaic code
        # compiles 5x faster and bounds the VMEM stack to one iteration's
        # liveness (the unrolled form sailed close to XLA's scoped-vmem
        # budget at larger block shapes); measured runtime-neutral here,
        # unlike the lean forward where dynamic addressing cost 26%
        def body_t(t, carry):
            # partner slot for band index w is (t - dz_w) mod T
            sls = [
                jax.lax.rem(t - (w - r_mid) + t_row, t_row)
                for w in range(w_band)
            ]
            mshift_t = mshift_ref[0, 0, pl.ds(t, 1)][0]  # (W, 4)
            # partner band pre-shifted: ci_w = coord_partner[tp_w] - Wf_w,
            # so that cj - ci == (receiver + Wf) - partner, the forward
            # orientation (u signs and all)
            ci = jnp.concatenate(
                [
                    coord_partner_ref[pl.ds(sls[w], 1)][0]
                    - mshift_t[w].reshape(4, 1)
                    for w in range(w_band)
                ],
                axis=1,
            )  # (4, W*C)
            cj = coord_recv_ref[pl.ds(t, 1)][0]  # (4, C)
            mask_band = jnp.concatenate(
                [mask_partner_ref[pl.ds(sls[w], 1)][0] for w in range(w_band)],
                axis=1,
            )[0]
            d, inv_d, within_f, fc, fcp = _pair_geom_rect(
                ci, cj, s, wc, c, rc, mask_band,
                mask_recv_ref[pl.ds(t, 1)][0, 0], self_diag,
            )
            uk = [(cj[k][None, :] - ci[k][:, None]) * inv_d for k in range(3)]
            u_tiled = [pltpu.repeat(u, gamma, axis=1) for u in uk]
            d_t = pltpu.repeat(d, gamma, axis=1)
            fc_t = pltpu.repeat(fc, gamma, axis=1)
            fcp_t = pltpu.repeat(fcp, gamma, axis=1)

            dbar = jnp.zeros((wc, c), jnp.float32)
            ubar = [jnp.zeros((wc, c), jnp.float32) for _ in range(3)]
            for gi in range(n_groups):
                cols = slice(gi * gamma * f, (gi + 1) * gamma * f)
                # this bin's block-diagonal candidate matrix (full-lane
                # masked tile)
                a_grp = a_recv_ref[pl.ds(t, 1)][0, :, cols]
                abig = pltpu.repeat(a_grp, gamma, axis=0) * blockmask
                # partner-band cotangent rows (d, w, i): 4*W full-lane
                # (C, gamma*F) copies
                for w in range(w_band):
                    gb = gbar_ref[pl.ds(sls[w], 1)][0, :, cols]  # (4C, gamma*F)
                    for dd in range(4):
                        gband_scratch[
                            dd * wc + w * c : dd * wc + (w + 1) * c, :
                        ] = gb[dd * c : (dd + 1) * c, :]
                gband = gband_scratch[...]
                # weight cotangent: Wbar = gbar_band @ Abig^T : (4WC, gamma*C)
                wbar = _mxu_dot(
                    gband,
                    abig,
                    (((1,), (1,)), ((), ())),
                    mxu_dtype,
                    split3,
                )
                gs_all, dgs_all = _gs_tiled(
                    d_t, fc_t, fcp_t, sg_rows[gi], eta, True
                )
                _fill_w(w_scratch, gs_all, u_tiled, wc)
                dbar, ubar = _chain_accumulate(
                    wbar, gs_all, dgs_all, u_tiled, dbar, ubar, gamma, wc, c,
                    bsum=bsum, pin_default=split3,
                )
                # feature adjoint: grad_abig = W^T @ gbar_band
                grad_abig = _mxu_dot(
                    w_scratch[...],
                    gband,
                    (((0,), (0,)), ((), ())),
                    mxu_dtype,
                    split3,
                )  # (gamma*C, gamma*F)
                # block-diagonal extract, full-lane: mask off-diagonal
                # blocks, then sum the gamma ROW blocks down to (C, gamma*F)
                # (VPU slice-adds: the MXU left-contraction variant was
                # measured 10% SLOWER — small-C output starves the MXU)
                masked = grad_abig * blockmask
                acc = masked[0:c, :]
                for g2 in range(1, gamma):
                    acc = acc + masked[g2 * c : (g2 + 1) * c, :]
                grad_a_ref[pl.ds(t, 1), :, cols] = (
                    grad_a_ref[pl.ds(t, 1), :, cols] + acc[None]
                )

            rbar = _coord_chain_finish(uk, inv_d, within_f, dbar, ubar)
            for k in range(3):
                # receiver-side cotangent: column sums (j lives in this bin)
                grad_coord_ref[pl.ds(t, 1), k, :] = (
                    grad_coord_ref[pl.ds(t, 1), k, :]
                    + jnp.sum(rbar[k], axis=0)[None]
                )
                # partner-side cotangent: -row sums per band block (i lives
                # in the partner bin at slot (t - dz_w) % T of row mrow[s,r];
                # reassembled by a static gather in conv_pallas._conv_acc_bwd)
                for w in range(w_band):
                    pgrad_ref[0, pl.ds((t * w_band + w) * 4 + k, 1), :] = -jnp.sum(
                        rbar[k][w * c : (w + 1) * c, :], axis=1
                    )[None]
            for w in range(w_band):
                pgrad_ref[0, pl.ds((t * w_band + w) * 4 + 3, 1), :] = jnp.zeros(
                    (1, c), jnp.float32
                )
            return carry

        jax.lax.fori_loop(0, t_row, body_t, 0)

    pl.run_scoped(
        body,
        w_scratch=pltpu.VMEM((4 * w_band * c, gamma * c), jnp.float32),
        gband_scratch=pltpu.VMEM((4 * w_band * c, gamma * f), jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("r_tot", "t_row", "c", "g", "f", "gamma", "w_band", "precision"),
)
def conv_stencil_bwd_banded(
    mrow_flat: jax.Array,  # (S*R,) int32
    coord_t: jax.Array,  # (B, 4, C)
    mask: jax.Array,  # (B, 1, C)
    a_gmajor: jax.Array,  # (B, C, G*F)
    gbar: jax.Array,  # (B, 4C, G*F)
    mshift_band: jax.Array,  # (S, R, T, W, 4) forward shifts, receiver frame
    shifts_g: jax.Array,
    scal: jax.Array,
    r_tot: int,
    t_row: int,
    c: int,
    g: int,
    f: int,
    gamma: int = 8,
    w_band: int = 3,
    precision: str = "f32",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (grad_a (B, C, G*F), grad_coord_recv (B, 4, C),
    pgrad (S*R, T*W*4, C)) — reshaped to (-1, 4, C), row
    ((s*R + r)*T + t)*W + w is the partner-side coordinate cotangent
    destined for bin ``mrow[s,r]*T + (t - (w - r_mid)) % T``."""
    s_tot = mshift_band.shape[0]
    b_tot = r_tot * t_row
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_tot, s_tot),
        in_specs=[
            pl.BlockSpec((t_row, 4, c), lambda r, s, rt: (rt[s * r_tot + r], 0, 0)),
            pl.BlockSpec((t_row, 4, c), lambda r, s, rt: (r, 0, 0)),
            pl.BlockSpec((t_row, 1, c), lambda r, s, rt: (rt[s * r_tot + r], 0, 0)),
            pl.BlockSpec((t_row, 1, c), lambda r, s, rt: (r, 0, 0)),
            pl.BlockSpec((t_row, c, g * f), lambda r, s, rt: (r, 0, 0)),
            pl.BlockSpec(
                (t_row, 4 * c, g * f), lambda r, s, rt: (rt[s * r_tot + r], 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, t_row, w_band, 4), lambda r, s, rt: (s, r, 0, 0, 0)
            ),
            pl.BlockSpec((1, g), lambda r, s, rt: (0, 0)),
            pl.BlockSpec((1, 4), lambda r, s, rt: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((t_row, c, g * f), lambda r, s, rt: (r, 0, 0)),
            pl.BlockSpec((t_row, 4, c), lambda r, s, rt: (r, 0, 0)),
            pl.BlockSpec(
                (1, t_row * w_band * 4, c), lambda r, s, rt: (s * r_tot + r, 0, 0)
            ),
        ),
    )
    kernel = functools.partial(
        _bwd_kernel, t_row=t_row, c=c, g=g, f=f, gamma=gamma, w_band=w_band,
        mxu_dtype=_mxu_dtype(precision), split3=precision == "f32x3",
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=(
            jax.ShapeDtypeStruct((b_tot, c, g * f), jnp.float32),
            jax.ShapeDtypeStruct((b_tot, 4, c), jnp.float32),
            jax.ShapeDtypeStruct((s_tot * r_tot, t_row * w_band * 4, c), jnp.float32),
        ),
    )(
        mrow_flat,
        coord_t,
        coord_t,
        mask,
        mask,
        a_gmajor,
        gbar,
        mshift_band,
        shifts_g,
        scal,
    )
