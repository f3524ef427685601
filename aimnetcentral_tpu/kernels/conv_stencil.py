"""Pallas TPU kernel: fused stencil ConvSV contraction, bin-ROW tiled.

The TPU-native replacement for the reference's Warp CUDA kernel family K1-K4
(reference aimnet/kernels/conv_sv_2d_sp_wp.py) on top of the binned layout.
Bins are z-fastest, so one program processes a whole z-row of T = nz bins
against ONE candidate row per stencil offset (the z-offset is a rotation
within the row): program count drops from B x S to (B/T) x S, amortizing the
per-program dispatch overhead that capped the per-bin variant at large B
(measured ~4 us/program; at 10k atoms that floor exceeded the math).

Per (row, offset) program:

1. the pipeline DMAs the candidate row's coordinates + feature block
   (T, C, G*F) into VMEM (row index from the scalar-prefetched row table),
2. for each of the T bins: pair distances, cosine-cutoff Gaussian basis and
   unit vectors in VMEM; the grouped block-diagonal candidate matrix; ONE
   (4C x gamma*C) @ (gamma*C x gamma*F) MXU matmul per g-group,
3. accumulates into the row's output block, resident across the offset
   dimension of the grid.

The gradient is ONE fused Pallas adjoint sweep (wired via custom_vjp in
conv_pallas.py): ``conv_stencil_bwd_cand`` runs the RECEIVER-centric mirror
stencil and accumulates the feature adjoint and the candidate-side
coordinate adjoint resident (no scatters — the TPU-native answer to the
reference's atomic-add scatter backward, conv_sv_2d_sp_wp.py:115-164),
while emitting the partner(self)-side row sums of the same per-pair
cotangent into a small (S, R, T, 4, C) side output; the self-side
coordinate adjoint and the lattice-shift adjoint (cell/strain gradients)
are reassembled from it with one static XLA scatter-add
(conv_pallas._conv_acc_bwd).  A second forward-orientation sweep — a full
extra set of pair geometry + Wbar matmuls — is thereby eliminated.

Layout contracts:
- coords are passed TRANSPOSED per bin: (B, 4, C) (lanes = C),
- features and cotangents are G-MAJOR: (B*C, G*F) with column g*F + f,
- output: (B, 4C, G*F), row j = d*C + i (direction-major), same g-major cols,
- row tables: (S, R) int32 with R = B/T; z-rotations dz/mdz: (S,) int32 in
  [0, T) (ops/binned.py::row_stencil_tables / mirror_row_stencil_tables);
  per-bin lattice shifts stay (S, B, 4) from stencil_tables.
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


def _pair_geom(ci, cj, s, c, rc, mask_self, mask_cand):
    """Shared pair geometry.  ``ci``/``cj`` are (4, C) (cj already shifted);
    returns (d, inv_d, within_f, fc, fcp): distances, float validity*cutoff
    mask, the cosine cutoff, and its d-derivative (both pre-masked)."""
    d2 = jnp.zeros((c, c), jnp.float32)
    for k in range(3):
        dk = cj[k][None, :] - ci[k][:, None]
        d2 = d2 + dk * dk

    real_i = mask_self[:, None] > 0.5  # (C, 1)
    real_j = mask_cand[None, :] > 0.5  # (1, C)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    not_self = jnp.logical_or(s != 0, row_ids != col_ids)
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


def _chain_accumulate(wbar, gs_all, dgs_all, u_tiled, dbar, ubar, gamma, c):
    """Accumulate one g-group's weight cotangents into the (dbar, ubar)
    chain-rule accumulators (all full-lane (C, gamma*C) ops, block-summed
    down to (C, C)).

    W rows are [gs, gs*u_x, gs*u_y, gs*u_z]:
        gsbar  = Wbar_0 + sum_k Wbar_k u_k
        ubar_k += sum_g Wbar_k gs_g ;  dbar += sum_g gsbar_g dgs_g/dd
    """
    gsbar = wbar[0:c, :]
    for k in range(3):
        wk = wbar[(k + 1) * c : (k + 2) * c, :]
        gsbar = gsbar + wk * u_tiled[k]
        ubar[k] = ubar[k] + _block_sum(wk * gs_all, gamma, c)
    dbar = dbar + _block_sum(gsbar * dgs_all, gamma, c)
    return dbar, ubar


def _coord_chain_finish(uk, inv_d, within_f, dbar, ubar):
    """Finish the chain rule: the cotangent of r_k = cj_k - ci_k is
        rbar_k = dbar u_k + (ubar_k - (sum_l ubar_l u_l) u_k) / d
    """
    uu = ubar[0] * uk[0] + ubar[1] * uk[1] + ubar[2] * uk[2]
    return [
        within_f * (dbar * uk[k] + (ubar[k] - uu * uk[k]) * inv_d)
        for k in range(3)
    ]


def _group_shift_rows(shifts_g_ref, gamma, c, n_groups):
    """Block-constant radial-shift rows, one (1, gamma*C) per g-group:
    column j carries shift_{gi*gamma + j // C}.  Hoisted to the top of every
    kernel — they depend only on the (static-shape) shift table, and they are
    what lets the pair math run on full (C, gamma*C) lanes instead of gamma
    separate (C, C) tiles (C < 128 wastes most of the VPU otherwise)."""
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (1, gamma * c), 1) // c
    rows = []
    for gi in range(n_groups):
        row = jnp.zeros((1, gamma * c), jnp.float32)
        for g2 in range(gamma):
            row = row + shifts_g_ref[0, gi * gamma + g2] * (
                col_blk == g2
            ).astype(jnp.float32)
        rows.append(row)
    return rows


def _gs_tiled(d_t, fc_t, fcp_t, sg_row, eta, gamma, want_dgs):
    """Gaussian basis (and optionally its d-derivative) for a whole g-group
    at once on (C, gamma*C) lanes: gs = exp(-eta (d - s_g)^2) fc.
    ``d_t``/``fc_t``/``fcp_t`` are the PRE-TILED (C, gamma*C) distance /
    cutoff tensors (group-independent — tiled once per bin pair)."""
    dd = d_t - sg_row
    e = jnp.exp(-eta * dd * dd)
    gs_all = e * fc_t
    if not want_dgs:
        return gs_all, None
    dgs_all = e * (fcp_t - 2.0 * eta * dd * fc_t)
    return gs_all, dgs_all


def _block_sum(x, gamma, c):
    """Sum the gamma column blocks of (C, gamma*C) down to (C, C)."""
    acc = x[:, 0:c]
    for g2 in range(1, gamma):
        acc = acc + x[:, g2 * c : (g2 + 1) * c]
    return acc


def _fill_w(w_scratch, gs_all, u_tiled, c):
    """Fill the (4C, gamma*C) pair-weight scratch: rows [gs; gs*u_x; gs*u_y;
    gs*u_z], each a full-lane (C, gamma*C) store.  Scratch stays f32;
    precision="bf16" downcasts at the dot_general inputs instead (the MXU
    runs bf16 x bf16 with f32 accumulation via preferred_element_type —
    bf16 VMEM scratch mis-lowered on real hardware)."""
    w_scratch[0:c, :] = gs_all
    for k in range(3):
        w_scratch[(k + 1) * c : (k + 2) * c, :] = gs_all * u_tiled[k]


def _block_mask(gamma, c, f):
    """(gamma*C, gamma*F) f32 block-diagonal mask: row block i//C == col
    block j//F.  Constant — hoisted to the top of each kernel body."""
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (gamma * c, gamma * f), 0) // c
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (gamma * c, gamma * f), 1) // f
    return (row_blk == col_blk).astype(jnp.float32)


def _abig(a_row_ref, tc, gi, blockmask, gamma, c, f):
    """The (gamma*C, gamma*F) block-diagonal candidate matrix for group
    ``gi`` of candidate bin slot ``tc`` (dynamic index into the row), built
    as a full-lane masked vertical tile: the group's contiguous (C, gamma*F)
    feature slice repeated gamma times down the sublanes, then multiplied by
    the block-diagonal mask.  Replaces gamma narrow (C, F) strided stores
    per group (F=16 < 128 lanes -> 1/8-efficiency lane writes) with two
    full-lane ops."""
    a_grp = a_row_ref[pl.ds(tc, 1)][0][:, gi * gamma * f : (gi + 1) * gamma * f]
    return pltpu.repeat(a_grp, gamma, axis=0) * blockmask


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(
    # scalar prefetch
    row_ref,  # (S*R,) int32 candidate-row table
    dz_ref,  # (S,) int32 z-rotation in [0, T)
    # inputs
    coord_self_ref,  # (T, 4, C)
    coord_cand_ref,  # (T, 4, C)  candidate row
    mask_self_ref,  # (T, 1, C)
    mask_cand_ref,  # (T, 1, C)
    a_cand_ref,  # (T, C, G*F)
    shift_ref,  # (1, 1, T, 4)  per-bin cartesian lattice shifts for this (s, row)
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
    mxu_dtype=jnp.float32,
):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    eta = scal_ref[0, 0]
    rc = scal_ref[0, 1]
    dz = dz_ref[s]
    n_groups = g // gamma
    sg_rows = _group_shift_rows(shifts_g_ref, gamma, c, n_groups)
    blockmask = _block_mask(gamma, c, f)

    def body(w_scratch):
        for t in range(t_row):
            tc = jax.lax.rem(t + dz, t_row)
            ci = coord_self_ref[t]  # (4, C)
            shift = shift_ref[0, 0, t]  # (4,)
            cj = coord_cand_ref[pl.ds(tc, 1)][0] + shift.reshape(4, 1)
            mask_c = mask_cand_ref[pl.ds(tc, 1)][0, 0]
            d, inv_d, _within, fc, _fcp = _pair_geom(
                ci, cj, s, c, rc, mask_self_ref[t, 0], mask_c
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
                abig = _abig(a_cand_ref, tc, gi, blockmask, gamma, c, f)
                gs_all, _ = _gs_tiled(d_t, fc_t, None, sg_rows[gi], eta, gamma, False)
                _fill_w(w_scratch, gs_all, u_tiled, c)
                contrib = jax.lax.dot_general(
                    w_scratch[...].astype(mxu_dtype),
                    abig.astype(mxu_dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (4C, gamma*F)
                out_ref[t, :, gi * gamma * f : (gi + 1) * gamma * f] += contrib

    pl.run_scoped(
        body,
        w_scratch=pltpu.VMEM((4 * c, gamma * c), jnp.float32),
    )


def _mxu_dtype(precision: str):
    if precision == "bf16":
        return jnp.bfloat16
    if precision != "f32":
        raise ValueError(f"precision must be 'f32' or 'bf16', got {precision!r}")
    return jnp.float32


@functools.partial(
    jax.jit, static_argnames=("r_tot", "t_row", "c", "g", "f", "gamma", "precision")
)
def conv_stencil_forward(
    row_flat: jax.Array,  # (S*R,) int32
    dz: jax.Array,  # (S,) int32
    coord_t: jax.Array,  # (B, 4, C) f32
    mask: jax.Array,  # (B, 1, C) f32
    a_gmajor: jax.Array,  # (B, C, G*F) f32
    shift_cart: jax.Array,  # (S, R, T, 4) f32
    shifts_g: jax.Array,  # (1, G)
    scal: jax.Array,  # (1, 4) [eta, rc, 0, 0]
    r_tot: int,
    t_row: int,
    c: int,
    g: int,
    f: int,
    gamma: int = 8,
    precision: str = "f32",
) -> jax.Array:
    s_tot = shift_cart.shape[0]
    b_tot = r_tot * t_row

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r_tot, s_tot),
        in_specs=[
            pl.BlockSpec((t_row, 4, c), lambda r, s, rt, dzt: (r, 0, 0)),
            pl.BlockSpec((t_row, 4, c), lambda r, s, rt, dzt: (rt[s * r_tot + r], 0, 0)),
            pl.BlockSpec((t_row, 1, c), lambda r, s, rt, dzt: (r, 0, 0)),
            pl.BlockSpec((t_row, 1, c), lambda r, s, rt, dzt: (rt[s * r_tot + r], 0, 0)),
            pl.BlockSpec((t_row, c, g * f), lambda r, s, rt, dzt: (rt[s * r_tot + r], 0, 0)),
            pl.BlockSpec((1, 1, t_row, 4), lambda r, s, rt, dzt: (s, r, 0, 0)),
            pl.BlockSpec((1, g), lambda r, s, rt, dzt: (0, 0)),
            pl.BlockSpec((1, 4), lambda r, s, rt, dzt: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (t_row, 4 * c, g * f), lambda r, s, rt, dzt: (r, 0, 0)
        ),
    )

    kernel = functools.partial(
        _fwd_kernel, t_row=t_row, c=c, g=g, f=f, gamma=gamma,
        mxu_dtype=_mxu_dtype(precision),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_tot, 4 * c, g * f), jnp.float32),
    )(
        row_flat,
        dz,
        coord_t,
        coord_t,  # candidate view (indexed via the row table)
        mask,
        mask,
        a_gmajor,
        shift_cart,
        shifts_g,
        scal,
    )


# ---------------------------------------------------------------------------
# backward: ONE fused mirror sweep — grad_a + both coordinate adjoints
#
# The mirror sweep already forms every forward pair's full chain-rule
# cotangent rbar (rows = partner/self atoms i, cols = receiver/candidate
# atoms j).  The receiver-side gradient is resident (column sums into this
# row's block); the partner-side gradient and the lattice-shift adjoint are
# ROW sums of the same rbar, emitted per (offset, receiver-row) into a small
# (S, R, T, 4, C) side output and reassembled on the XLA side with one
# static scatter-add (conv_pallas._conv_acc_bwd).  This replaces the former
# second (forward-orientation) adjoint sweep entirely — one full set of pair
# geometry + Wbar matmuls per pass saved.


def _bwd_cand_kernel(
    # scalar prefetch
    mrow_ref,  # (S*R,) int32 receiver-centric mirror row table
    mdz_ref,  # (S,) int32
    # inputs
    coord_partner_ref,  # (T, 4, C)   partner row (forward self side)
    coord_recv_ref,  # (T, 4, C)      this row (forward candidates)
    mask_partner_ref,  # (T, 1, C)
    mask_recv_ref,  # (T, 1, C)
    a_recv_ref,  # (T, C, G*F)        this row's features
    gbar_ref,  # (T, 4*C, G*F)        partner row's cotangent block
    mshift_ref,  # (1, 1, T, 4)          forward shifts, receiver frame
    shifts_g_ref,  # (1, G)
    scal_ref,  # (1, 4)
    # outputs
    grad_a_ref,  # (T, C, G*F)
    grad_coord_ref,  # (T, 4, C)
    pgrad_ref,  # (1, T*4, C)  partner-side row sums for this (s, row)
    *,
    t_row: int,
    c: int,
    g: int,
    f: int,
    gamma: int,
    mxu_dtype=jnp.float32,
):
    """For every forward pair (i in partner bin, j in this row's bin),
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
    mdz = mdz_ref[s]
    n_groups = g // gamma
    sg_rows = _group_shift_rows(shifts_g_ref, gamma, c, n_groups)
    blockmask = _block_mask(gamma, c, f)

    def body(w_scratch):
        for t in range(t_row):
            tp = jax.lax.rem(t + mdz, t_row)  # partner slot
            ci = coord_partner_ref[pl.ds(tp, 1)][0]  # forward self side
            shift = mshift_ref[0, 0, t]
            cj = coord_recv_ref[t] + shift.reshape(4, 1)
            mask_p = mask_partner_ref[pl.ds(tp, 1)][0, 0]
            d, inv_d, within_f, fc, fcp = _pair_geom(
                ci, cj, s, c, rc, mask_p, mask_recv_ref[t, 0]
            )
            uk = [(cj[k][None, :] - ci[k][:, None]) * inv_d for k in range(3)]
            u_tiled = [pltpu.repeat(u, gamma, axis=1) for u in uk]
            d_t = pltpu.repeat(d, gamma, axis=1)
            fc_t = pltpu.repeat(fc, gamma, axis=1)
            fcp_t = pltpu.repeat(fcp, gamma, axis=1)

            dbar = jnp.zeros((c, c), jnp.float32)
            ubar = [jnp.zeros((c, c), jnp.float32) for _ in range(3)]
            for gi in range(n_groups):
                # this bin's block-diagonal candidate matrix (full-lane
                # masked tile; the dynamic slot index is the loop-static t)
                abig = _abig(a_recv_ref, t, gi, blockmask, gamma, c, f)
                gbar_grp = gbar_ref[pl.ds(tp, 1)][
                    0, :, gi * gamma * f : (gi + 1) * gamma * f
                ].astype(mxu_dtype)
                # weight cotangent: Wbar = gbar @ Abig^T : (4C, gamma*C)
                wbar = jax.lax.dot_general(
                    gbar_grp,
                    abig.astype(mxu_dtype),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                gs_all, dgs_all = _gs_tiled(
                    d_t, fc_t, fcp_t, sg_rows[gi], eta, gamma, True
                )
                _fill_w(w_scratch, gs_all, u_tiled, c)
                dbar, ubar = _chain_accumulate(
                    wbar, gs_all, dgs_all, u_tiled, dbar, ubar, gamma, c
                )
                # feature adjoint: grad_abig = W^T @ gbar_group
                grad_abig = jax.lax.dot_general(
                    w_scratch[...].astype(mxu_dtype),
                    gbar_grp,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # block-diagonal extract, full-lane: mask off-diagonal
                # blocks, then sum the gamma row blocks down to (C, gamma*F)
                # (row block g2's surviving cols are exactly [g2*F,(g2+1)*F)
                # — the group's g-major column layout)
                masked = grad_abig * blockmask
                acc = masked[0:c, :]
                for g2 in range(1, gamma):
                    acc = acc + masked[g2 * c : (g2 + 1) * c, :]
                grad_a_ref[t, :, gi * gamma * f : (gi + 1) * gamma * f] += acc

            rbar = _coord_chain_finish(uk, inv_d, within_f, dbar, ubar)
            for k in range(3):
                # candidate-side cotangent: column sums (j lives in this bin)
                grad_coord_ref[t, k, :] += jnp.sum(rbar[k], axis=0)
                # partner-side cotangent: -row sums (i lives in the partner
                # bin at slot (t + mdz) % T of row mrow[s, r]; reassembled by
                # a static scatter in conv_pallas._conv_acc_bwd)
                pgrad_ref[0, t * 4 + k, :] = -jnp.sum(rbar[k], axis=1)
            pgrad_ref[0, t * 4 + 3, :] = jnp.zeros((c,), jnp.float32)

    pl.run_scoped(
        body,
        w_scratch=pltpu.VMEM((4 * c, gamma * c), jnp.float32),
    )


@functools.partial(
    jax.jit, static_argnames=("r_tot", "t_row", "c", "g", "f", "gamma", "precision")
)
def conv_stencil_bwd_cand(
    mrow_flat: jax.Array,  # (S*R,) int32
    mdz: jax.Array,  # (S,) int32
    coord_t: jax.Array,  # (B, 4, C)
    mask: jax.Array,  # (B, 1, C)
    a_gmajor: jax.Array,  # (B, C, G*F)
    gbar: jax.Array,  # (B, 4C, G*F)
    mshift_cart: jax.Array,  # (S, R, T, 4) forward shifts, receiver frame
    shifts_g: jax.Array,
    scal: jax.Array,
    r_tot: int,
    t_row: int,
    c: int,
    g: int,
    f: int,
    gamma: int = 8,
    precision: str = "f32",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (grad_a (B, C, G*F), grad_coord_cand (B, 4, C),
    pgrad (S*R, T*4, C)) — reshaped to (S, R, T, 4, C), ``pgrad[s, r, t]``
    is the partner-side coordinate cotangent destined for bin
    ``mrow[s,r]*T + (t+mdz[s])%T``."""
    s_tot = mshift_cart.shape[0]
    b_tot = r_tot * t_row
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r_tot, s_tot),
        in_specs=[
            pl.BlockSpec((t_row, 4, c), lambda r, s, rt, dzt: (rt[s * r_tot + r], 0, 0)),
            pl.BlockSpec((t_row, 4, c), lambda r, s, rt, dzt: (r, 0, 0)),
            pl.BlockSpec((t_row, 1, c), lambda r, s, rt, dzt: (rt[s * r_tot + r], 0, 0)),
            pl.BlockSpec((t_row, 1, c), lambda r, s, rt, dzt: (r, 0, 0)),
            pl.BlockSpec((t_row, c, g * f), lambda r, s, rt, dzt: (r, 0, 0)),
            pl.BlockSpec(
                (t_row, 4 * c, g * f), lambda r, s, rt, dzt: (rt[s * r_tot + r], 0, 0)
            ),
            pl.BlockSpec((1, 1, t_row, 4), lambda r, s, rt, dzt: (s, r, 0, 0)),
            pl.BlockSpec((1, g), lambda r, s, rt, dzt: (0, 0)),
            pl.BlockSpec((1, 4), lambda r, s, rt, dzt: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((t_row, c, g * f), lambda r, s, rt, dzt: (r, 0, 0)),
            pl.BlockSpec((t_row, 4, c), lambda r, s, rt, dzt: (r, 0, 0)),
            pl.BlockSpec(
                (1, t_row * 4, c), lambda r, s, rt, dzt: (s * r_tot + r, 0, 0)
            ),
        ),
    )
    kernel = functools.partial(
        _bwd_cand_kernel, t_row=t_row, c=c, g=g, f=f, gamma=gamma,
        mxu_dtype=_mxu_dtype(precision),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b_tot, c, g * f), jnp.float32),
            jax.ShapeDtypeStruct((b_tot, 4, c), jnp.float32),
            jax.ShapeDtypeStruct((s_tot * r_tot, t_row * 4, c), jnp.float32),
        ),
    )(
        mrow_flat,
        mdz,
        coord_t,
        coord_t,
        mask,
        mask,
        a_gmajor,
        gbar,
        mshift_cart,
        shifts_g,
        scal,
    )
