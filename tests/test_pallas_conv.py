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


def test_bf16_precision_option(case, monkeypatch):
    """AIMNET_CONV_PRECISION=bf16 runs the MXU in bfloat16 (f32 accumulate):
    outputs and gradients must track the f32 kernel to bf16-roundoff
    tolerance, and the flag must reject unknown values."""
    from jax.experimental.pallas import tpu as pltpu

    sysb, aev, a_feat, q, agh_a, agh_q = case
    from aimnetcentral_tpu.kernels.conv_pallas import conv_pass_pallas

    def loss(coord):
        out_a, out_q = conv_pass_pallas(
            sysb.replace(coord=coord), aev, a_feat, q, agh_a, agh_q, rc_static=5.0
        )
        return (out_a**2).sum() + (out_q**2).sum()

    with pltpu.force_tpu_interpret_mode():
        f32_a, f32_q = conv_pass_pallas(
            sysb, aev, a_feat, q, agh_a, agh_q, rc_static=5.0
        )
        g_f32 = jax.grad(loss)(sysb.coord)
        monkeypatch.setenv("AIMNET_CONV_PRECISION", "bf16")
        bf_a, bf_q = conv_pass_pallas(
            sysb, aev, a_feat, q, agh_a, agh_q, rc_static=5.0
        )
        g_bf = jax.grad(loss)(sysb.coord)

    # bf16 mantissa is 8 bits: ~4e-3 relative per product, partially
    # cancelling over the pair sum.  Scale-aware tolerance.
    scale_a = float(np.abs(np.asarray(f32_a)).max())
    np.testing.assert_allclose(
        np.asarray(bf_a), np.asarray(f32_a), atol=2e-2 * scale_a
    )
    scale_q = float(np.abs(np.asarray(f32_q)).max())
    np.testing.assert_allclose(
        np.asarray(bf_q), np.asarray(f32_q), atol=2e-2 * scale_q
    )
    scale_g = float(np.abs(np.asarray(g_f32)).max())
    np.testing.assert_allclose(
        np.asarray(g_bf), np.asarray(g_f32), atol=3e-2 * scale_g
    )

    monkeypatch.setenv("AIMNET_CONV_PRECISION", "f16")
    with pytest.raises(ValueError, match="precision"):
        with pltpu.force_tpu_interpret_mode():
            conv_pass_pallas(sysb, aev, a_feat, q, agh_a, agh_q, rc_static=5.0)


def test_f32x3_split_precision_option(case):
    """precision="f32x3" (the calculator's "balanced" tier) runs every
    kernel dot as hand-split hi/lo 1-pass contractions (conv_stencil.
    _mxu_dot): outputs and gradients must track the f32 kernel to the
    ~1e-5-relative split error — two orders tighter than bf16 — and the
    real kernel body (interpret mode) must lower the extra casts."""
    from jax.experimental.pallas import tpu as pltpu

    sysb, aev, a_feat, q, agh_a, agh_q = case
    from aimnetcentral_tpu.kernels.conv_pallas import conv_pass_pallas

    def loss(coord, precision=None):
        out_a, out_q = conv_pass_pallas(
            sysb.replace(coord=coord), aev, a_feat, q, agh_a, agh_q,
            rc_static=5.0, precision=precision,
        )
        return (out_a**2).sum() + (out_q**2).sum()

    with pltpu.force_tpu_interpret_mode():
        f32_a, f32_q = conv_pass_pallas(
            sysb, aev, a_feat, q, agh_a, agh_q, rc_static=5.0
        )
        g_f32 = jax.grad(loss)(sysb.coord)
        x3_a, x3_q = conv_pass_pallas(
            sysb, aev, a_feat, q, agh_a, agh_q, rc_static=5.0,
            precision="f32x3",
        )
        g_x3 = jax.grad(lambda c: loss(c, precision="f32x3"))(sysb.coord)

    scale_a = float(np.abs(np.asarray(f32_a)).max())
    np.testing.assert_allclose(
        np.asarray(x3_a), np.asarray(f32_a), atol=1e-4 * scale_a
    )
    scale_q = float(np.abs(np.asarray(f32_q)).max())
    np.testing.assert_allclose(
        np.asarray(x3_q), np.asarray(f32_q), atol=1e-4 * scale_q
    )
    scale_g = float(np.abs(np.asarray(g_f32)).max())
    np.testing.assert_allclose(
        np.asarray(g_x3), np.asarray(g_f32), atol=2e-4 * scale_g
    )


# The adjoint kernels are covered in tests/test_pallas_bwd.py (row-tiled
# sweeps vs autodiff of the XLA twin, periodic + gas-phase, full custom_vjp).
