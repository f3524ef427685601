"""Pallas TPU kernel: fused stencil ConvSV contraction.

The TPU-native replacement for the reference's Warp CUDA kernel family K1-K4
(reference aimnet/kernels/conv_sv_2d_sp_wp.py) on top of the binned layout:
for every (bin, stencil-offset) pair the kernel

1. DMAs the candidate bin's feature block (C, G*F) and coordinates into VMEM
   (block indices come from the scalar-prefetched neighbor-bin table),
2. computes pair distances, the cosine-cutoff Gaussian basis, and the unit
   vectors entirely in VMEM,
3. assembles the grouped block-diagonal candidate matrix and runs ONE
   (4C x gamma*C) @ (gamma*C x gamma*F) MXU matmul per g-group,
4. accumulates into the bin's output block, which stays resident across the
   (innermost) offset dimension of the grid.

Why: in the XLA formulation the per-pair weight tensor must materialize in
HBM as an einsum operand (~100s of MB per offset sweep); here it never leaves
VMEM.  Gradients are dedicated Pallas adjoint sweeps (wired via custom_vjp in
conv_pallas.py): ``conv_stencil_bwd_cand`` accumulates the feature adjoint
and the candidate-side coordinate adjoint over the RECEIVER-centric mirror
stencil (every write resident — no scatters, the TPU-native answer to the
reference's atomic-add scatter backward), and ``conv_stencil_bwd_self``
accumulates the self-side coordinate adjoint plus the lattice-shift adjoint
(cell/strain gradients) over the forward stencil.

Layout contracts:
- coords are passed TRANSPOSED per bin: (B, 4, C) (lanes = C),
- features and cotangents are G-MAJOR: (B*C, G*F) with column g*F + f,
- output: (B, 4C, G*F), row j = d*C + i (direction-major), same g-major cols.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_CONV_ENABLED = True
except ImportError:  # pragma: no cover
    PALLAS_CONV_ENABLED = False


def conv_stencil_available() -> bool:
    return PALLAS_CONV_ENABLED


def _kernel(
    # scalar prefetch
    nbr_ref,  # (S*B,) int32
    # inputs
    coord_self_ref,  # (1, 4, C)
    coord_cand_ref,  # (1, 4, C)
    mask_self_ref,  # (1, 1, C) f32 (1=real)
    mask_cand_ref,  # (1, 1, C)
    a_cand_ref,  # (1, C, G*F)
    shift_ref,  # (1, 1, 4)  cartesian lattice shift for this (s, b)
    shifts_g_ref,  # (1, G) radial shifts
    scal_ref,  # (1, 4) [eta, rc, unused, unused]
    # output
    out_ref,  # (1, 4*C, G*F)
    *,
    c: int,
    g: int,
    f: int,
    gamma: int,
):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    eta = scal_ref[0, 0]
    rc = scal_ref[0, 1]

    ci = coord_self_ref[0]  # (4, C)
    shift = shift_ref[0, 0]  # (1, 4) -> read, then broadcast as array
    cj = coord_cand_ref[0] + shift.reshape(4, 1)  # (4, C)

    d2 = jnp.zeros((c, c), jnp.float32)
    for k in range(3):
        dk = cj[k][None, :] - ci[k][:, None]
        d2 = d2 + dk * dk

    real_i = mask_self_ref[0, 0][:, None] > 0.5  # (C, 1)
    real_j = mask_cand_ref[0, 0][None, :] > 0.5  # (1, C)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    not_self = jnp.logical_or(s != 0, row_ids != col_ids)
    vp = jnp.logical_and(jnp.logical_and(real_i, real_j), not_self)

    d2s = jnp.where(vp, d2, 1.0)
    d = jnp.sqrt(d2s)
    inv_d = 1.0 / d
    within = jnp.logical_and(vp, d < rc)
    fc = jnp.where(
        within, 0.5 * (jnp.cos(jnp.minimum(d, rc) * (jnp.pi / rc)) + 1.0), 0.0
    )

    n_groups = g // gamma

    def body(w_scratch, abig_scratch):
        for gi in range(n_groups):
            # --- candidate block-diagonal matrix (gamma*C, gamma*F)
            abig_scratch[...] = jnp.zeros_like(abig_scratch)
            for g2 in range(gamma):
                g_abs = gi * gamma + g2
                abig_scratch[g2 * c : (g2 + 1) * c, g2 * f : (g2 + 1) * f] = (
                    a_cand_ref[0][:, g_abs * f : (g_abs + 1) * f]
                )
            # --- pair weights (4C, gamma*C): column block g2 holds the
            #     (C, C) pair matrix for radial shift g_abs
            for g2 in range(gamma):
                g_abs = gi * gamma + g2
                dd = d - shifts_g_ref[0, g_abs]
                gs = jnp.exp(-eta * dd * dd) * fc
                w_scratch[0 * c : 1 * c, g2 * c : (g2 + 1) * c] = gs
                for k in range(3):
                    dk = cj[k][None, :] - ci[k][:, None]
                    w_scratch[(k + 1) * c : (k + 2) * c, g2 * c : (g2 + 1) * c] = (
                        gs * dk * inv_d
                    )
            contrib = jax.lax.dot_general(
                w_scratch[...],
                abig_scratch[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (4C, gamma*F)
            out_ref[0, :, gi * gamma * f : (gi + 1) * gamma * f] += contrib

    pl.run_scoped(
        body,
        w_scratch=pltpu.VMEM((4 * c, gamma * c), jnp.float32),
        abig_scratch=pltpu.VMEM((gamma * c, gamma * f), jnp.float32),
    )


@functools.partial(
    jax.jit, static_argnames=("b_tot", "c", "g", "f", "gamma")
)
def conv_stencil_forward(
    nbr_flat: jax.Array,  # (S*B,) int32
    coord_t: jax.Array,  # (B, 4, C) f32
    mask: jax.Array,  # (B, 1, C) f32
    a_gmajor: jax.Array,  # (B, C, G*F) f32
    shift_cart: jax.Array,  # (S, B, 1, 4) f32
    shifts_g: jax.Array,  # (1, G)
    scal: jax.Array,  # (1, 4) [eta, rc, 0, 0]
    b_tot: int,
    c: int,
    g: int,
    f: int,
    gamma: int = 8,
) -> jax.Array:
    s_tot = shift_cart.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_tot, s_tot),
        in_specs=[
            pl.BlockSpec((1, 4, c), lambda b, s, nbr: (b, 0, 0)),
            pl.BlockSpec((1, 4, c), lambda b, s, nbr: (nbr[s * b_tot + b], 0, 0)),
            pl.BlockSpec((1, 1, c), lambda b, s, nbr: (b, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda b, s, nbr: (nbr[s * b_tot + b], 0, 0)),
            pl.BlockSpec((1, c, g * f), lambda b, s, nbr: (nbr[s * b_tot + b], 0, 0)),
            pl.BlockSpec((1, 1, 1, 4), lambda b, s, nbr: (s, b, 0, 0)),
            pl.BlockSpec((1, g), lambda b, s, nbr: (0, 0)),
            pl.BlockSpec((1, 4), lambda b, s, nbr: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 4 * c, g * f), lambda b, s, nbr: (b, 0, 0)),
    )

    kernel = functools.partial(_kernel, c=c, g=g, f=f, gamma=gamma)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_tot, 4 * c, g * f), jnp.float32),
    )(
        nbr_flat,
        coord_t,
        coord_t,  # candidate view (indexed via the neighbor table)
        mask,
        mask,
        a_gmajor,
        shift_cart.reshape(s_tot, b_tot, 1, 4),
        shifts_g,
        scal,
    )


def _pair_geom(coord_self, coord_cand, shift, mask_self, mask_cand, s, c, rc):
    """Shared pair geometry for all sweeps.  Returns (cj, d, inv_d, within_f,
    fc, fcp) where ``within_f`` is the float validity*cutoff mask, ``fc`` the
    cosine cutoff and ``fcp`` its d-derivative (both pre-masked)."""
    ci = coord_self  # (4, C)
    cj = coord_cand + shift.reshape(4, 1)  # (4, C)

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
    return cj, d, inv_d, within_f, fc, fcp


def _coord_chain(ci, cj, d, inv_d, within_f, wbar_rows, gs_list, dgs_list, c):
    """Chain rule from the per-(pair, g) weight cotangents back to the pair
    displacement: returns rbar_k (C, C) for k = 0..2.

    For each radial index, W rows are [gs, gs*u_x, gs*u_y, gs*u_z] with
    u_k = (cj_k - ci_k)/d, gs = exp(-eta*(d-shift_g)^2)*fc(d).  Given the
    cotangents of those rows this produces the cotangent of r_k = cj_k - ci_k:
        gsbar  = Wbar_0 + sum_k Wbar_k u_k
        ubar_k = sum_g Wbar_k gs_g ;  dbar = sum_g gsbar_g dgs_g/dd
        rbar_k = dbar u_k + (ubar_k - (sum_l ubar_l u_l) u_k) / d
    """
    uk = [(cj[k][None, :] - ci[k][:, None]) * inv_d for k in range(3)]
    dbar = jnp.zeros((c, c), jnp.float32)
    ubar = [jnp.zeros((c, c), jnp.float32) for _ in range(3)]
    for (wb0, wbk), gs, dgs in zip(wbar_rows, gs_list, dgs_list):
        gsbar = wb0
        for k in range(3):
            gsbar = gsbar + wbk[k] * uk[k]
            ubar[k] = ubar[k] + wbk[k] * gs
        dbar = dbar + gsbar * dgs
    uu = ubar[0] * uk[0] + ubar[1] * uk[1] + ubar[2] * uk[2]
    return [
        within_f * (dbar * uk[k] + (ubar[k] - uu * uk[k]) * inv_d)
        for k in range(3)
    ]


def _bwd_cand_kernel(
    # scalar prefetch: receiver-centric mirror table
    mnbr_ref,  # (S*B,) int32
    # inputs
    coord_partner_ref,  # (1, 4, C)   self-bin coords of the FORWARD pair (b')
    coord_recv_ref,  # (1, 4, C)      this bin's coords (the forward candidate)
    mask_partner_ref,  # (1, 1, C)
    mask_recv_ref,  # (1, 1, C)
    a_recv_ref,  # (1, C, G*F)        this bin's features (forward candidate side)
    gbar_ref,  # (1, 4*C, G*F)        cotangent block of the partner bin
    mshift_ref,  # (1, 1, 1, 4)       forward shift (receiver frame)
    shifts_g_ref,  # (1, G)
    scal_ref,  # (1, 4)
    # outputs
    grad_a_ref,  # (1, C, G*F)
    grad_coord_ref,  # (1, 4, C)      candidate-side coordinate adjoint
    *,
    c: int,
    g: int,
    f: int,
    gamma: int,
):
    """Candidate-side adjoint sweep: for every forward pair (i in partner bin
    b', j in this bin b), accumulate W(b',s)^T @ gbar[b'] into grad_a[b] and
    the j-side coordinate cotangent into grad_coord[b] — the mirror tables
    make every write land in THIS bin's resident output blocks (no scatters)."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        grad_a_ref[...] = jnp.zeros_like(grad_a_ref)
        grad_coord_ref[...] = jnp.zeros_like(grad_coord_ref)

    eta = scal_ref[0, 0]
    rc = scal_ref[0, 1]

    ci = coord_partner_ref[0]  # (4, C)  forward self side (rows of W)
    cj, d, inv_d, within_f, fc, fcp = _pair_geom(
        ci, coord_recv_ref[0], mshift_ref[0, 0],
        mask_partner_ref[0, 0], mask_recv_ref[0, 0], s, c, rc,
    )

    n_groups = g // gamma

    def body(w_scratch, abig_scratch):
        wbar_rows, gs_list, dgs_list = [], [], []
        for gi in range(n_groups):
            # --- this bin's block-diagonal candidate matrix (gamma*C, gamma*F)
            abig_scratch[...] = jnp.zeros_like(abig_scratch)
            for g2 in range(gamma):
                g_abs = gi * gamma + g2
                abig_scratch[g2 * c : (g2 + 1) * c, g2 * f : (g2 + 1) * f] = (
                    a_recv_ref[0][:, g_abs * f : (g_abs + 1) * f]
                )
            gbar_grp = gbar_ref[0][:, gi * gamma * f : (gi + 1) * gamma * f]
            # --- weight cotangent: Wbar = gbar @ Abig^T : (4C, gamma*C)
            wbar = jax.lax.dot_general(
                gbar_grp,
                abig_scratch[...],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for g2 in range(gamma):
                g_abs = gi * gamma + g2
                dd = d - shifts_g_ref[0, g_abs]
                e = jnp.exp(-eta * dd * dd)
                gs = e * fc
                dgs = e * (fcp - 2.0 * eta * dd * fc)
                w_scratch[0 * c : 1 * c, g2 * c : (g2 + 1) * c] = gs
                for k in range(3):
                    dk = cj[k][None, :] - ci[k][:, None]
                    w_scratch[(k + 1) * c : (k + 2) * c, g2 * c : (g2 + 1) * c] = (
                        gs * dk * inv_d
                    )
                wb0 = wbar[0 * c : 1 * c, g2 * c : (g2 + 1) * c]
                wbk = [
                    wbar[(k + 1) * c : (k + 2) * c, g2 * c : (g2 + 1) * c]
                    for k in range(3)
                ]
                wbar_rows.append((wb0, wbk))
                gs_list.append(gs)
                dgs_list.append(dgs)
            # --- feature adjoint: grad_abig = W^T @ gbar_group
            grad_abig = jax.lax.dot_general(
                w_scratch[...],
                gbar_grp,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # diagonal blocks -> grad_a columns of the matching g
            for g2 in range(gamma):
                g_abs = gi * gamma + g2
                grad_a_ref[0, :, g_abs * f : (g_abs + 1) * f] += grad_abig[
                    g2 * c : (g2 + 1) * c, g2 * f : (g2 + 1) * f
                ]

        rbar = _coord_chain(
            ci, cj, d, inv_d, within_f, wbar_rows, gs_list, dgs_list, c
        )
        for k in range(3):
            # candidate-side cotangent: column sums (j lives in this bin)
            grad_coord_ref[0, k, :] += jnp.sum(rbar[k], axis=0)

    pl.run_scoped(
        body,
        w_scratch=pltpu.VMEM((4 * c, gamma * c), jnp.float32),
        abig_scratch=pltpu.VMEM((gamma * c, gamma * f), jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("b_tot", "c", "g", "f", "gamma"))
def conv_stencil_bwd_cand(
    mnbr_flat: jax.Array,  # (S*B,) int32 (receiver-centric mirror table)
    coord_t: jax.Array,  # (B, 4, C)
    mask: jax.Array,  # (B, 1, C)
    a_gmajor: jax.Array,  # (B, C, G*F) candidate features
    gbar: jax.Array,  # (B, 4C, G*F) cotangent of the forward output
    mshift_cart: jax.Array,  # (S, B, 1, 4) forward shift, receiver frame
    shifts_g: jax.Array,
    scal: jax.Array,
    b_tot: int,
    c: int,
    g: int,
    f: int,
    gamma: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Returns (grad_a (B, C, G*F), grad_coord_cand (B, 4, C))."""
    s_tot = mshift_cart.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_tot, s_tot),
        in_specs=[
            pl.BlockSpec((1, 4, c), lambda b, s, t: (t[s * b_tot + b], 0, 0)),
            pl.BlockSpec((1, 4, c), lambda b, s, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda b, s, t: (t[s * b_tot + b], 0, 0)),
            pl.BlockSpec((1, 1, c), lambda b, s, t: (b, 0, 0)),
            pl.BlockSpec((1, c, g * f), lambda b, s, t: (b, 0, 0)),
            pl.BlockSpec((1, 4 * c, g * f), lambda b, s, t: (t[s * b_tot + b], 0, 0)),
            pl.BlockSpec((1, 1, 1, 4), lambda b, s, t: (s, b, 0, 0)),
            pl.BlockSpec((1, g), lambda b, s, t: (0, 0)),
            pl.BlockSpec((1, 4), lambda b, s, t: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, c, g * f), lambda b, s, t: (b, 0, 0)),
            pl.BlockSpec((1, 4, c), lambda b, s, t: (b, 0, 0)),
        ),
    )
    kernel = functools.partial(_bwd_cand_kernel, c=c, g=g, f=f, gamma=gamma)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b_tot, c, g * f), jnp.float32),
            jax.ShapeDtypeStruct((b_tot, 4, c), jnp.float32),
        ),
    )(
        mnbr_flat,
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


def conv_stencil_bwd_a(*args, **kwargs) -> jax.Array:
    """Feature adjoint only (compat wrapper over conv_stencil_bwd_cand)."""
    mnbr_flat, coord_t, mask, gbar, mshift_cart, shifts_g, scal = args
    b_tot = kwargs["b_tot"]
    c = kwargs["c"]
    g = kwargs["g"]
    f = kwargs["f"]
    a_zero = jnp.zeros((b_tot, c, g * f), jnp.float32)
    grad_a, _ = conv_stencil_bwd_cand(
        mnbr_flat, coord_t, mask, a_zero, gbar, mshift_cart, shifts_g, scal, **kwargs
    )
    return grad_a


def _bwd_self_kernel(
    # scalar prefetch: forward neighbor-bin table
    nbr_ref,  # (S*B,) int32
    # inputs
    coord_self_ref,  # (1, 4, C)
    coord_cand_ref,  # (1, 4, C)
    mask_self_ref,  # (1, 1, C)
    mask_cand_ref,  # (1, 1, C)
    a_cand_ref,  # (1, C, G*F)   candidate features (neighbor bin)
    gbar_ref,  # (1, 4*C, G*F)   cotangent block of THIS bin
    shift_ref,  # (1, 1, 1, 4)
    shifts_g_ref,  # (1, G)
    scal_ref,  # (1, 4)
    # outputs
    grad_coord_ref,  # (1, 4, C)  self-side coordinate adjoint
    grad_shift_ref,  # (1, 1, 1, 4)  lattice-shift adjoint for this (s, b)
    *,
    c: int,
    g: int,
    f: int,
    gamma: int,
):
    """Self-side adjoint sweep (forward orientation): for every forward pair
    (i in this bin, j in candidate bin nbr[s, b]), accumulate the i-side
    coordinate cotangent (resident) and the per-(s, b) lattice-shift
    cotangent (one write per program)."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        grad_coord_ref[...] = jnp.zeros_like(grad_coord_ref)

    eta = scal_ref[0, 0]
    rc = scal_ref[0, 1]

    ci = coord_self_ref[0]  # (4, C)
    cj, d, inv_d, within_f, fc, fcp = _pair_geom(
        ci, coord_cand_ref[0], shift_ref[0, 0],
        mask_self_ref[0, 0], mask_cand_ref[0, 0], s, c, rc,
    )

    n_groups = g // gamma

    def body(abig_scratch):
        wbar_rows, gs_list, dgs_list = [], [], []
        for gi in range(n_groups):
            abig_scratch[...] = jnp.zeros_like(abig_scratch)
            for g2 in range(gamma):
                g_abs = gi * gamma + g2
                abig_scratch[g2 * c : (g2 + 1) * c, g2 * f : (g2 + 1) * f] = (
                    a_cand_ref[0][:, g_abs * f : (g_abs + 1) * f]
                )
            gbar_grp = gbar_ref[0][:, gi * gamma * f : (gi + 1) * gamma * f]
            wbar = jax.lax.dot_general(
                gbar_grp,
                abig_scratch[...],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for g2 in range(gamma):
                g_abs = gi * gamma + g2
                dd = d - shifts_g_ref[0, g_abs]
                e = jnp.exp(-eta * dd * dd)
                gs = e * fc
                dgs = e * (fcp - 2.0 * eta * dd * fc)
                wb0 = wbar[0 * c : 1 * c, g2 * c : (g2 + 1) * c]
                wbk = [
                    wbar[(k + 1) * c : (k + 2) * c, g2 * c : (g2 + 1) * c]
                    for k in range(3)
                ]
                wbar_rows.append((wb0, wbk))
                gs_list.append(gs)
                dgs_list.append(dgs)

        rbar = _coord_chain(
            ci, cj, d, inv_d, within_f, wbar_rows, gs_list, dgs_list, c
        )
        for k in range(3):
            # self-side cotangent: -row sums (i lives in this bin)
            grad_coord_ref[0, k, :] += -jnp.sum(rbar[k], axis=1)
        # lattice shift enters through cj only: total pair sum per component
        grad_shift_ref[...] = jnp.concatenate(
            [jnp.sum(rbar[k]).reshape(1, 1, 1, 1) for k in range(3)]
            + [jnp.zeros((1, 1, 1, 1), jnp.float32)],
            axis=3,
        )

    pl.run_scoped(
        body, abig_scratch=pltpu.VMEM((gamma * c, gamma * f), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("b_tot", "c", "g", "f", "gamma"))
def conv_stencil_bwd_self(
    nbr_flat: jax.Array,  # (S*B,) int32 (forward neighbor table)
    coord_t: jax.Array,  # (B, 4, C)
    mask: jax.Array,  # (B, 1, C)
    a_gmajor: jax.Array,  # (B, C, G*F)
    gbar: jax.Array,  # (B, 4C, G*F)
    shift_cart: jax.Array,  # (S, B, 1, 4)
    shifts_g: jax.Array,
    scal: jax.Array,
    b_tot: int,
    c: int,
    g: int,
    f: int,
    gamma: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Returns (grad_coord_self (B, 4, C), grad_shift (S, B, 1, 4))."""
    s_tot = shift_cart.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_tot, s_tot),
        in_specs=[
            pl.BlockSpec((1, 4, c), lambda b, s, t: (b, 0, 0)),
            pl.BlockSpec((1, 4, c), lambda b, s, t: (t[s * b_tot + b], 0, 0)),
            pl.BlockSpec((1, 1, c), lambda b, s, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda b, s, t: (t[s * b_tot + b], 0, 0)),
            pl.BlockSpec((1, c, g * f), lambda b, s, t: (t[s * b_tot + b], 0, 0)),
            pl.BlockSpec((1, 4 * c, g * f), lambda b, s, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, 1, 4), lambda b, s, t: (s, b, 0, 0)),
            pl.BlockSpec((1, g), lambda b, s, t: (0, 0)),
            pl.BlockSpec((1, 4), lambda b, s, t: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 4, c), lambda b, s, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, 1, 4), lambda b, s, t: (s, b, 0, 0)),
        ),
    )
    kernel = functools.partial(_bwd_self_kernel, c=c, g=g, f=f, gamma=gamma)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b_tot, 4, c), jnp.float32),
            jax.ShapeDtypeStruct((s_tot, b_tot, 1, 4), jnp.float32),
        ),
    )(
        nbr_flat,
        coord_t,
        coord_t,
        mask,
        mask,
        a_gmajor,
        gbar,
        shift_cart,
        shifts_g,
        scal,
    )
