"""Dedicated Pallas backward kernels (grad-a + grad-coord adjoint sweeps):
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
    from aimnetcentral_tpu.ops import binned as B

    grid = sysb.bins
    cell0 = sysb.cell[0] if sysb.cell is not None else None
    radius = stencil_radius(5.0, grid, cell0)
    b_tot, c = grid.total_bins, grid.capacity
    g_dim, f_dim = 16, 16

    nbr_np, wrap_np, _z = B.stencil_tables(grid, radius)
    s_tot = nbr_np.shape[0]
    invalid = nbr_np < 0
    nbr = jnp.asarray(np.where(invalid, 0, nbr_np))
    if cell0 is not None:
        shift3 = jnp.einsum("sbk,kh->sbh", jnp.asarray(wrap_np), cell0)
    else:
        shift3 = jnp.zeros((s_tot, b_tot, 3), jnp.float32)
    if invalid.any():
        shift3 = shift3 + jnp.asarray(invalid[..., None].astype(np.float32)) * 1e6
    shift_cart = jnp.concatenate([shift3, jnp.zeros((s_tot, b_tot, 1))], axis=-1)

    mnbr_np, mwrap_np = B.mirror_stencil_tables(grid, radius)
    minvalid = mnbr_np < 0
    if cell0 is not None:
        mshift3 = jnp.einsum("sbk,kh->sbh", jnp.asarray(mwrap_np), cell0)
    else:
        mshift3 = jnp.zeros((s_tot, b_tot, 3), jnp.float32)
    if minvalid.any():
        mshift3 = mshift3 + jnp.asarray(minvalid[..., None].astype(np.float32)) * 1e6
    mshift_cart = jnp.concatenate([mshift3, jnp.zeros((s_tot, b_tot, 1))], axis=-1)

    row_np, dz_np = B.row_stencil_tables(grid, radius)
    mrow_np, mdz_np = B.mirror_row_stencil_tables(grid, radius)
    row_nbr = jnp.asarray(np.where(row_np < 0, 0, row_np))
    mrow_nbr = jnp.asarray(np.where(mrow_np < 0, 0, mrow_np))
    dz = jnp.asarray(dz_np)
    mdz = jnp.asarray(mdz_np)

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
        b_tot=b_tot, c=c, g=g_dim, f=f_dim, gamma=8, s_tot=s_tot,
        t_row=grid.nbins[2],
    )
    tables = {
        "nbr": nbr, "row_nbr": row_nbr, "dz": dz,
        "mrow_nbr": mrow_nbr, "mdz": mdz, "mshift_cart": mshift_cart,
    }
    return st, a_gmajor, coord_t, shift_cart, mask, tables, shifts_g, scal


@pytest.mark.parametrize("periodic", [True, False])
def test_bwd_kernels_match_autodiff(periodic):
    """The fused mirror-sweep adjoint (interpret mode) + XLA reassembly ==
    autodiff of the XLA twin for grad-a, grad-coord, and grad-shift
    simultaneously."""
    from jax.experimental.pallas import tpu as pltpu

    from aimnetcentral_tpu.kernels import conv_pallas as cp
    from aimnetcentral_tpu.kernels.conv_stencil import conv_stencil_bwd_cand

    sysb, aev, a_feat, *_ = _make_case(periodic)
    (
        st, a_gmajor, coord_t, shift_cart, mask, tables, shifts_g, scal,
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
        shift_cart,
    )
    da_ref, dc_ref, ds_ref = vjp(gbar)

    kw = dict(
        r_tot=st.r_tot, t_row=st.t_row, c=st.c, g=st.g, f=st.f, gamma=st.gamma
    )
    with pltpu.force_tpu_interpret_mode():
        da_pal, dc_cand, pgrad = conv_stencil_bwd_cand(
            tables["mrow_nbr"].reshape(-1), tables["mdz"], coord_t, mask,
            a_gmajor, gbar,
            tables["mshift_cart"].reshape(st.s_tot, st.r_tot, st.t_row, 4),
            shifts_g, scal, **kw,
        )
    # reassembly exactly as _conv_acc_bwd does it
    pgrad = pgrad.reshape(st.s_tot, st.r_tot, st.t_row, 4, st.c)
    mdz = tables["mdz"]
    t_iota = jnp.arange(st.t_row, dtype=mdz.dtype)
    pslot = jax.lax.rem(t_iota[None, None, :] + mdz[:, None, None], st.t_row)
    pidx = (
        tables["mrow_nbr"].reshape(st.s_tot, st.r_tot)[:, :, None] * st.t_row
        + pslot
    )
    dc_self = (
        jnp.zeros((st.b_tot, 4, st.c))
        .at[pidx.reshape(-1)]
        .add(pgrad.reshape(-1, 4, st.c))
    )
    dc_pal = dc_self + dc_cand
    sflat = (
        jnp.arange(st.s_tot, dtype=pidx.dtype)[:, None, None] * st.b_tot + pidx
    ).reshape(-1)
    ds_pal = (
        jnp.zeros((st.s_tot * st.b_tot, 4))
        .at[sflat]
        .add(-pgrad.sum(-1).reshape(-1, 4))
        .reshape(st.s_tot, st.b_tot, 4)
    )

    np.testing.assert_allclose(
        np.asarray(da_pal), np.asarray(da_ref), atol=3e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(dc_pal), np.asarray(dc_ref), atol=5e-3, rtol=1e-3
    )
    # grad-shift: only compare the finite entries (invalid probes carry the
    # 1e6 push; the XLA twin zeroes them identically)
    np.testing.assert_allclose(
        np.asarray(ds_pal), np.asarray(ds_ref), atol=5e-3, rtol=1e-3
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
