"""Pallas stencil-conv kernel: XLA-twin equivalence + interpret-mode kernel
correctness + gradient correctness of the custom_vjp wrapper."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: minutes on CPU

import jax
import jax.numpy as jnp

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.ops.binned import plan_bins, to_binned_system


@pytest.fixture(scope="module")
def case(rng=None):
    rng = np.random.default_rng(7)
    n, a = 40, 12.0
    coord = rng.uniform(0, a, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    cell = np.eye(3, dtype=np.float32) * a
    sys_c = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}], cutoff=5.0, max_neighbors=8
    )
    grid = plan_bins(cell, n, 5.2, safety=3.0)
    sysb, perm, ovf = to_binned_system(sys_c, grid)
    assert int(ovf) == 0
    aev = {
        "rc_s": jnp.float32(5.0),
        "eta_s": jnp.float32(14.5),
        "shifts_s": jnp.linspace(0.8, 5.0, 17)[:16],
    }
    L = sysb.natoms
    a_feat = jnp.asarray(rng.normal(size=(L, 16, 16)).astype(np.float32)) * 0.3
    q = jnp.asarray(rng.normal(size=(L, 1)).astype(np.float32)) * 0.1
    agh_a = jnp.asarray(rng.normal(size=(16, 16, 12)).astype(np.float32)) * 0.2
    agh_q = jnp.asarray(rng.normal(size=(1, 16, 12)).astype(np.float32)) * 0.2
    return sysb, aev, a_feat, q, agh_a, agh_q


def test_xla_twin_matches_engine(case):
    """The g-major XLA twin must reproduce conv_pass_binned exactly."""
    sysb, aev, a_feat, q, agh_a, agh_q = case
    from aimnetcentral_tpu.kernels.conv_pallas import conv_pass_pallas
    from aimnetcentral_tpu.models.engine_binned import conv_pass_binned

    ref_a, ref_q = conv_pass_binned(
        sysb, aev, a_feat, q, agh_a, agh_q, True, rc_static=5.0
    )
    twin_a, twin_q = conv_pass_pallas(
        sysb, aev, a_feat, q, agh_a, agh_q, rc_static=5.0, interpret_xla=True
    )
    np.testing.assert_allclose(np.asarray(twin_a), np.asarray(ref_a), atol=2e-4)
    np.testing.assert_allclose(np.asarray(twin_q), np.asarray(ref_q), atol=2e-4)


def test_pallas_kernel_interpret_matches_twin(case):
    """The actual Pallas kernel (interpret mode on CPU) == XLA twin."""
    from jax.experimental.pallas import tpu as pltpu

    sysb, aev, a_feat, q, agh_a, agh_q = case
    from aimnetcentral_tpu.kernels.conv_pallas import conv_pass_pallas

    twin_a, twin_q = conv_pass_pallas(
        sysb, aev, a_feat, q, agh_a, agh_q, rc_static=5.0, interpret_xla=True
    )
    with pltpu.force_tpu_interpret_mode():
        pal_a, pal_q = conv_pass_pallas(
            sysb, aev, a_feat, q, agh_a, agh_q, rc_static=5.0
        )
    np.testing.assert_allclose(np.asarray(pal_a), np.asarray(twin_a), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pal_q), np.asarray(twin_q), atol=2e-4)


def test_custom_vjp_gradients(case):
    """Gradients through the custom_vjp wrapper == gradients of the engine
    path (coord gradients incl. padding handling)."""
    from jax.experimental.pallas import tpu as pltpu

    sysb, aev, a_feat, q, agh_a, agh_q = case
    from aimnetcentral_tpu.kernels.conv_pallas import conv_pass_pallas
    from aimnetcentral_tpu.models.engine_binned import conv_pass_binned

    def loss_ref(coord):
        out_a, out_q = conv_pass_binned(
            sysb.replace(coord=coord), aev, a_feat, q, agh_a, agh_q, True, rc_static=5.0
        )
        return (out_a**2).sum() + (out_q**2).sum()

    def loss_pal(coord):
        out_a, out_q = conv_pass_pallas(
            sysb.replace(coord=coord), aev, a_feat, q, agh_a, agh_q, rc_static=5.0
        )
        return (out_a**2).sum() + (out_q**2).sum()

    g_ref = jax.grad(loss_ref)(sysb.coord)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pal)(sysb.coord)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=5e-3)


def test_bwd_a_kernel_matches_autodiff(case):
    """The mirror-sweep grad-a kernel (interpret mode) must equal the
    autodiff gradient of the XLA twin w.r.t. the candidate features."""
    from jax.experimental.pallas import tpu as pltpu

    sysb, aev, a_feat, q, agh_a, agh_q = case
    from aimnetcentral_tpu.kernels import conv_pallas as cp
    from aimnetcentral_tpu.kernels.conv_stencil import conv_stencil_bwd_a
    from aimnetcentral_tpu.models.engine_binned import stencil_radius
    from aimnetcentral_tpu.ops import binned as B

    grid = sysb.bins
    cell0 = sysb.cell[0]
    radius = stencil_radius(5.0, grid, cell0)
    b_tot, c = grid.total_bins, grid.capacity
    L = sysb.natoms
    g_dim, f_dim = 16, 16

    # prepare the same inputs conv_pass_pallas builds (a-only, no q)
    nbr_np, wrap_np, _z = B.stencil_tables(grid, radius)
    s_tot = nbr_np.shape[0]
    nbr = jnp.asarray(np.maximum(nbr_np, 0))
    shift3 = jnp.einsum("sbk,kh->sbh", jnp.asarray(wrap_np), cell0)
    shift_cart = jnp.concatenate(
        [shift3, jnp.zeros((s_tot, b_tot, 1))], axis=-1
    )
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
    st = cp.ConvStatic(b_tot=b_tot, c=c, g=g_dim, f=f_dim, gamma=8, s_tot=s_tot)

    rng = np.random.default_rng(3)
    gbar = jnp.asarray(
        rng.normal(size=(b_tot, 4 * c, g_dim * f_dim)).astype(np.float32)
    )

    _, vjp = jax.vjp(
        lambda a_: cp._conv_acc_xla(
            st, a_, coord_t, shift_cart, mask, nbr, shifts_g, scal
        ),
        a_gmajor,
    )
    (grad_ref,) = vjp(gbar)

    mnbr_np, mwrap_np = B.mirror_stencil_tables(grid, radius)
    mnbr = jnp.asarray(np.maximum(mnbr_np, 0))
    mshift3 = jnp.einsum("sbk,kh->sbh", jnp.asarray(mwrap_np), cell0)
    mshift = jnp.concatenate(
        [mshift3, jnp.zeros((s_tot, b_tot, 1))], axis=-1
    ).reshape(s_tot, b_tot, 1, 4)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        grad_pal = conv_stencil_bwd_a(
            mnbr.reshape(-1),
            coord_t,
            mask,
            gbar,
            mshift,
            shifts_g,
            scal,
            b_tot=b_tot,
            c=c,
            g=g_dim,
            f=f_dim,
            gamma=8,
        )
    np.testing.assert_allclose(
        np.asarray(grad_pal), np.asarray(grad_ref), atol=3e-3, rtol=1e-3
    )
