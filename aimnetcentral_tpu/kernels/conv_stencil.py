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
VMEM.  Gradients: `conv_stencil` is wrapped in `jax.custom_vjp` whose
backward re-runs the mathematically-identical XLA formulation under
`jax.vjp` — forward speed from Pallas, correctness-by-construction backward.
The first dedicated backward kernel (``conv_stencil_bwd_a``, the mirror-sweep
feature adjoint) is implemented and autodiff-validated below; the coordinate
adjoint and bin tiling (which amortizes the per-program overhead that
currently caps both directions) are scheduled in ROADMAP.md.

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


def _bwd_a_kernel(
    # scalar prefetch: receiver-centric mirror table
    mnbr_ref,  # (S*B,) int32
    # inputs
    coord_partner_ref,  # (1, 4, C)   self-bin coords of the FORWARD pair (b')
    coord_recv_ref,  # (1, 4, C)      this bin's coords (the forward candidate)
    mask_partner_ref,  # (1, 1, C)
    mask_recv_ref,  # (1, 1, C)
    gbar_ref,  # (1, 4*C, G*F)        cotangent block of the partner bin
    mshift_ref,  # (1, 1, 1, 4)       forward shift (receiver frame)
    shifts_g_ref,  # (1, G)
    scal_ref,  # (1, 4)
    # output
    grad_a_ref,  # (1, C, G*F)
    *,
    c: int,
    g: int,
    f: int,
    gamma: int,
):
    """Adjoint sweep for the candidate features: for every forward pair
    (i in partner bin b', j in this bin b), accumulate W(b',s)^T @ gbar[b']
    into grad_a[b] — the mirror tables make every write land in THIS bin's
    resident output block (no scatters)."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        grad_a_ref[...] = jnp.zeros_like(grad_a_ref)

    eta = scal_ref[0, 0]
    rc = scal_ref[0, 1]

    ci = coord_partner_ref[0]  # (4, C)  forward self side (rows of W)
    shift = mshift_ref[0, 0]
    cj = coord_recv_ref[0] + shift.reshape(4, 1)  # forward candidate side

    d2 = jnp.zeros((c, c), jnp.float32)
    for k in range(3):
        dk = cj[k][None, :] - ci[k][:, None]
        d2 = d2 + dk * dk

    real_i = mask_partner_ref[0, 0][:, None] > 0.5
    real_j = mask_recv_ref[0, 0][None, :] > 0.5
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

    def body(w_scratch):
        for gi in range(n_groups):
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
            # grad_abig = W^T @ gbar_group : (gamma*C, gamma*F)
            gbar_grp = gbar_ref[0][:, gi * gamma * f : (gi + 1) * gamma * f]
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

    pl.run_scoped(body, w_scratch=pltpu.VMEM((4 * c, gamma * c), jnp.float32))


@functools.partial(jax.jit, static_argnames=("b_tot", "c", "g", "f", "gamma"))
def conv_stencil_bwd_a(
    mnbr_flat: jax.Array,  # (S*B,) int32 (receiver-centric mirror table)
    coord_t: jax.Array,  # (B, 4, C)
    mask: jax.Array,  # (B, 1, C)
    gbar: jax.Array,  # (B, 4C, G*F) cotangent of the forward output
    mshift_cart: jax.Array,  # (S, B, 1, 4) forward shift, receiver frame
    shifts_g: jax.Array,
    scal: jax.Array,
    b_tot: int,
    c: int,
    g: int,
    f: int,
    gamma: int = 8,
) -> jax.Array:
    s_tot = mshift_cart.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_tot, s_tot),
        in_specs=[
            pl.BlockSpec((1, 4, c), lambda b, s, t: (t[s * b_tot + b], 0, 0)),
            pl.BlockSpec((1, 4, c), lambda b, s, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda b, s, t: (t[s * b_tot + b], 0, 0)),
            pl.BlockSpec((1, 1, c), lambda b, s, t: (b, 0, 0)),
            pl.BlockSpec((1, 4 * c, g * f), lambda b, s, t: (t[s * b_tot + b], 0, 0)),
            pl.BlockSpec((1, 1, 1, 4), lambda b, s, t: (s, b, 0, 0)),
            pl.BlockSpec((1, g), lambda b, s, t: (0, 0)),
            pl.BlockSpec((1, 4), lambda b, s, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, g * f), lambda b, s, t: (b, 0, 0)),
    )
    kernel = functools.partial(_bwd_a_kernel, c=c, g=g, f=f, gamma=gamma)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_tot, c, g * f), jnp.float32),
    )(
        mnbr_flat,
        coord_t,
        coord_t,
        mask,
        mask,
        gbar,
        mshift_cart,
        shifts_g,
        scal,
    )
