"""Dedicated Pallas backward kernel (fused banded mirror adjoint sweep):
interpret-mode correctness against autodiff of the XLA twin, periodic and
gas-phase, plus the full custom_vjp route with Pallas on both sides."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: minutes on CPU

import jax
import jax.numpy as jnp

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.ops.binned import plan_bins, to_binned_system


def _make_case(periodic: bool, seed: int = 7, n: int = 40):
    rng = np.random.default_rng(seed)
    a = 12.0
    coord = rng.uniform(0, a, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    mol = {"coord": coord, "numbers": numbers}
    if periodic:
        cell = np.eye(3, dtype=np.float32) * a
        mol["cell"] = cell
        sys_c = system_from_molecules([mol], cutoff=5.0, max_neighbors=8)
        grid = plan_bins(cell, n, 5.2, safety=3.0)
    else:
        sys_c = system_from_molecules([mol], cutoff=5.0, max_neighbors=8)
        lo, hi = coord.min(axis=0), coord.max(axis=0)
        grid = plan_bins(None, n, 5.2, extent=(lo, hi), safety=3.0)
    sysb, perm, ovf = to_binned_system(sys_c, grid)
    assert int(ovf) == 0
    aev = {
        "rc_s": jnp.float32(5.0),
        "eta_s": jnp.float32(14.5),
        "shifts_s": jnp.linspace(0.8, 5.0, 17)[:16],
    }
    lshape = sysb.natoms
    a_feat = jnp.asarray(rng.normal(size=(lshape, 16, 16)).astype(np.float32)) * 0.3
    q = jnp.asarray(rng.normal(size=(lshape, 1)).astype(np.float32)) * 0.1
    agh_a = jnp.asarray(rng.normal(size=(16, 16, 12)).astype(np.float32)) * 0.2
    agh_q = jnp.asarray(rng.normal(size=(1, 16, 12)).astype(np.float32)) * 0.2
    return sysb, aev, a_feat, q, agh_a, agh_q


def _prepared_inputs(sysb, aev, a_feat):
    """Build the raw conv_acc operands exactly as conv_pass_pallas does
    (a-only, no q channels)."""
    from aimnetcentral_tpu.kernels import conv_pallas as cp
    from aimnetcentral_tpu.models.engine_binned import stencil_radius

    grid = sysb.bins
    cell0 = sysb.cell[0] if sysb.cell is not None else None
    radius = stencil_radius(5.0, grid, cell0)
    b_tot, c = grid.total_bins, grid.capacity
    g_dim, f_dim = 16, 16

    tables = cp.build_conv_tables(grid, radius, cell0)
    coord_t = jnp.concatenate(
        [
            sysb.coord.reshape(b_tot, c, 3).transpose(0, 2, 1),
            jnp.zeros((b_tot, 1, c)),
        ],
        axis=1,
    )
    mask = (sysb.numbers > 0).astype(jnp.float32).reshape(b_tot, 1, c)
    a_gmajor = a_feat.transpose(0, 2, 1).reshape(b_tot, c, g_dim * f_dim)
    shifts_g = aev["shifts_s"].reshape(1, g_dim)
    scal = jnp.stack(
        [aev["eta_s"], aev["rc_s"], jnp.float32(0.0), jnp.float32(0.0)]
    ).reshape(1, 4)
    st = cp.ConvStatic(
        b_tot=b_tot, c=c, g=g_dim, f=f_dim, gamma=8,
        s_tot=tables["s_tot"], t_row=grid.nbins[2], w_band=tables["w_band"],
    )
    return st, a_gmajor, coord_t, mask, tables, shifts_g, scal, radius


@pytest.mark.parametrize("periodic", [True, False])
def test_bwd_kernel_matches_autodiff(periodic):
    """The fused banded mirror-sweep adjoint (interpret mode) + the gather
    reassembly from _conv_acc_bwd == autodiff of the XLA twin for grad-a,
    grad-coord, and grad-shift simultaneously."""
    from jax.experimental.pallas import tpu as pltpu

    from aimnetcentral_tpu.kernels import conv_pallas as cp
    from aimnetcentral_tpu.kernels.conv_stencil import conv_stencil_bwd_banded
    from aimnetcentral_tpu.ops.binned import stencil_offsets

    sysb, aev, a_feat, *_ = _make_case(periodic)
    (
        st, a_gmajor, coord_t, mask, tables, shifts_g, scal, radius,
    ) = _prepared_inputs(sysb, aev, a_feat)

    rng = np.random.default_rng(3)
    gbar = jnp.asarray(
        rng.normal(size=(st.b_tot, 4 * st.c, st.g * st.f)).astype(np.float32)
    )

    _, vjp = jax.vjp(
        lambda a_, c_, s_: cp._conv_acc_xla(
            st, a_, c_, s_, mask, tables["nbr"], shifts_g, scal
        ),
        a_gmajor,
        coord_t,
        tables["shift_cart"],
    )
    da_ref, dc_ref, ds_ref = vjp(gbar)

    with pltpu.force_tpu_interpret_mode():
        da_pal, dc_cand, pgrad = conv_stencil_bwd_banded(
            tables["mrow_flat"], coord_t, mask, a_gmajor, gbar,
            tables["mshift_band"], shifts_g, scal,
            r_tot=st.r_tot, t_row=st.t_row, c=st.c, g=st.g, f=st.f,
            gamma=st.gamma, w_band=st.w_band,
        )
    # reassembly exactly as _conv_acc_bwd does it
    pg = pgrad.reshape(-1, 4, st.c)
    taken = jnp.take(pg, tables["pinv"], axis=0).reshape(
        st.s_tot, st.w_band, st.b_tot, 4, st.c
    ) * tables["pvalid"][:, :, :, None, None]
    dc_pal = dc_cand + taken.sum((0, 1))
    ds_swb = -taken.sum(-1)  # (S, W, B, 4)
    ds_band = ds_swb.reshape(
        st.s_tot, st.w_band, st.r_tot, st.t_row, 4
    ).transpose(0, 2, 3, 1, 4)

    np.testing.assert_allclose(
        np.asarray(da_pal), np.asarray(da_ref), atol=3e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(dc_pal), np.asarray(dc_ref), atol=5e-3, rtol=1e-3
    )
    # grad-shift: map the per-offset reference onto banded (s_xy, w) indices
    offs = stencil_offsets(radius)  # (S_off, 3), same order as shift_cart
    r_ = np.arange(-radius, radius + 1)
    offs2 = np.stack(np.meshgrid(r_, r_, indexing="ij"), -1).reshape(-1, 2)
    offs2 = offs2[np.argsort((offs2 != 0).any(axis=1), stable=True)]
    key2 = {tuple(o): i for i, o in enumerate(offs2)}
    ds_band_np = np.asarray(ds_band)
    ds_ref_np = np.asarray(ds_ref).reshape(-1, st.r_tot, st.t_row, 4)
    for s_o, (dx, dy, dz) in enumerate(offs):
        got = ds_band_np[key2[(dx, dy)], :, :, dz + radius]
        np.testing.assert_allclose(
            got, ds_ref_np[s_o], atol=5e-3, rtol=1e-3,
            err_msg=f"offset {(dx, dy, dz)}",
        )


def test_full_vjp_pallas_backward_matches_engine():
    """jax.grad through conv_pass_pallas (Pallas fwd + Pallas bwd, interpret
    mode) == jax.grad through the production XLA engine, coord AND cell."""
    from jax.experimental.pallas import tpu as pltpu

    from aimnetcentral_tpu.kernels.conv_pallas import conv_pass_pallas
    from aimnetcentral_tpu.models.engine_binned import conv_pass_binned

    sysb, aev, a_feat, q, agh_a, agh_q = _make_case(True)

    def loss_ref(coord, cell):
        out_a, out_q = conv_pass_binned(
            sysb.replace(coord=coord, cell=cell), aev, a_feat, q, agh_a, agh_q,
            True, rc_static=5.0,
        )
        return (out_a**2).sum() + (out_q**2).sum()

    def loss_pal(coord, cell):
        out_a, out_q = conv_pass_pallas(
            sysb.replace(coord=coord, cell=cell), aev, a_feat, q, agh_a, agh_q,
            rc_static=5.0,
        )
        return (out_a**2).sum() + (out_q**2).sum()

    g_ref_c, g_ref_cell = jax.grad(loss_ref, argnums=(0, 1))(sysb.coord, sysb.cell)
    with pltpu.force_tpu_interpret_mode():
        g_pal_c, g_pal_cell = jax.grad(loss_pal, argnums=(0, 1))(
            sysb.coord, sysb.cell
        )
    np.testing.assert_allclose(
        np.asarray(g_pal_c), np.asarray(g_ref_c), atol=5e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(g_pal_cell), np.asarray(g_ref_cell), atol=2e-2, rtol=1e-3
    )


def test_second_order_jvp_of_grad_matches_engine():
    """K3 parity: forward-over-reverse (the HVP/Hessian pattern) through the
    Pallas conv (fwd kernel + fused bwd kernel + the custom JVP second-order
    rule routing tangents through the XLA twin) == the same through the
    production XLA engine.  Also exercises reverse-over-reverse via
    grad-of-grad on a force-norm loss (the force-training pattern)."""
    from jax.experimental.pallas import tpu as pltpu

    from aimnetcentral_tpu.kernels.conv_pallas import conv_pass_pallas
    from aimnetcentral_tpu.models.engine_binned import conv_pass_binned

    sysb, aev, a_feat, q, agh_a, agh_q = _make_case(True)
    rng = np.random.default_rng(9)
    v = jnp.asarray(rng.normal(size=sysb.coord.shape).astype(np.float32))

    def weighted(out_a):
        w = jnp.cos(jnp.arange(out_a.size).reshape(out_a.shape) * 0.01)
        return (out_a * w).sum()

    def e_pallas(coord):
        out_a, _ = conv_pass_pallas(
            sysb.replace(coord=coord), aev, a_feat, None, agh_a, None,
            rc_static=5.0,
        )
        return weighted(out_a)

    def e_xla(coord):
        out_a, _ = conv_pass_binned(
            sysb.replace(coord=coord), aev, a_feat, None, agh_a, None,
            d2features=True, rc_static=5.0,
        )
        return weighted(out_a)

    # forward-over-reverse: Hv = jvp(grad)
    gx, hvx = jax.jvp(jax.grad(e_xla), (sysb.coord,), (v,))
    with pltpu.force_tpu_interpret_mode():
        gp, hvp_ = jax.jvp(jax.grad(e_pallas), (sysb.coord,), (v,))
    sg = max(float(jnp.abs(gx).max()), 1e-8)
    sh = max(float(jnp.abs(hvx).max()), 1e-8)
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gx), atol=2e-4 * sg, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(hvp_), np.asarray(hvx), atol=2e-4 * sh, rtol=1e-3
    )

    # reverse-over-reverse: d/dcoord of |grad|^2 (force-loss pattern)
    def floss_x(coord):
        return (jax.grad(e_xla)(coord) ** 2).sum()

    def floss_p(coord):
        return (jax.grad(e_pallas)(coord) ** 2).sum()

    ggx = jax.grad(floss_x)(sysb.coord)
    with pltpu.force_tpu_interpret_mode():
        ggp = jax.grad(floss_p)(sysb.coord)
    sgg = max(float(jnp.abs(ggx).max()), 1e-8)
    np.testing.assert_allclose(
        np.asarray(ggp), np.asarray(ggx), atol=3e-4 * sgg, rtol=1e-3
    )
