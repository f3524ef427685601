"""Coarse long-range twin layout (System.lr_bins/lr_slot): LR sweeps on the
radius-2 coarse grid must reproduce the fine-grid (SR-layout) sweeps exactly
— same pairs, same math, different bin walk."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.ops.binned import plan_bins, plan_lr_bins, to_binned_system


def _periodic_case(n=300, a=18.0, seed=11):
    rng = np.random.default_rng(seed)
    coord = rng.uniform(0, a, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    cell = np.eye(3, dtype=np.float32) * a
    mol = {"coord": coord, "numbers": numbers, "cell": cell}
    sys_c = system_from_molecules([mol], cutoff=5.0, max_neighbors=1)
    return sys_c, cell, n


@pytest.mark.parametrize(
    "lr_cut", [pytest.param(7.5, marks=pytest.mark.slow), 12.0]
)
def test_dsf_lr_layout_matches_sr_layout(lr_cut):
    sys_c, cell, n = _periodic_case()
    grid = plan_bins(cell, n, 5.2, safety=3.0)
    lr_grid = plan_lr_bins(cell, n, lr_cut, safety=2.0)

    sys_sr, _, ovf1 = to_binned_system(sys_c, grid)
    sys_lr, _, ovf2 = to_binned_system(sys_c, grid, lr_grid)
    assert int(ovf1) == 0 and int(ovf2) == 0
    assert sys_lr.lr_bins is not None and sys_lr.lr_slot is not None
    # the SR slot layout itself is identical
    np.testing.assert_array_equal(
        np.asarray(sys_sr.numbers), np.asarray(sys_lr.numbers)
    )

    from aimnetcentral_tpu.models.engine_binned import coulomb_dsf_binned

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(sys_sr.natoms,)).astype(np.float32)) * 0.2

    def e_dsf(s):
        return coulomb_dsf_binned(
            s, q, 4.6, dsf_alpha=0.2, dsf_rc=lr_cut, envelope="cosine",
            subtract_sr=True,
        )

    e_sr = np.asarray(jax.jit(e_dsf)(sys_sr))
    e_lr = np.asarray(jax.jit(e_dsf)(sys_lr))
    np.testing.assert_allclose(e_lr, e_sr, rtol=1e-5, atol=1e-5)

    # gradients flow identically through the gather/scatter reassembly
    g_sr = jax.jit(jax.grad(lambda c: e_dsf(sys_sr.replace(coord=c)).sum()))(
        sys_sr.coord
    )
    g_lr = jax.jit(jax.grad(lambda c: e_dsf(sys_lr.replace(coord=c)).sum()))(
        sys_lr.coord
    )
    np.testing.assert_allclose(np.asarray(g_lr), np.asarray(g_sr), atol=1e-5)


def test_d3_lr_layout_matches_sr_layout():
    import jax.numpy as _jnp

    from aimnetcentral_tpu.constants import get_d3_tables

    sys_c, cell, n = _periodic_case(seed=5)
    grid = plan_bins(cell, n, 5.2, safety=3.0)
    lr_grid = plan_lr_bins(cell, n, 11.0, safety=2.0)
    sys_sr, _, _ = to_binned_system(sys_c, grid)
    sys_lr, _, ovf = to_binned_system(sys_c, grid, lr_grid)
    assert int(ovf) == 0

    from aimnetcentral_tpu.models.engine_binned import dftd3_binned

    tables = {k: _jnp.asarray(v) for k, v in get_d3_tables().items()}

    def e_d3(s):
        return dftd3_binned(
            s, tables, a1=0.566, a2=3.128, s8=0.3908,
            smoothing_on=8.8, smoothing_off=11.0,
        )

    e_sr = np.asarray(jax.jit(e_d3)(sys_sr))
    e_lr = np.asarray(jax.jit(e_d3)(sys_lr))
    np.testing.assert_allclose(e_lr, e_sr, rtol=1e-5, atol=1e-6)


def test_gas_phase_lr_layout():
    rng = np.random.default_rng(3)
    n = 200
    coord = rng.uniform(0, 22.0, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    sys_c = system_from_molecules(
        [{"coord": coord, "numbers": numbers}], cutoff=5.0, max_neighbors=1
    )
    lo, hi = coord.min(axis=0), coord.max(axis=0)
    grid = plan_bins(None, n, 5.2, extent=(lo, hi), safety=3.0)
    # gas-phase density is uneven: generous slack (the calculator's retry
    # loop grows safety automatically in production)
    lr_grid = plan_lr_bins(None, n, 10.0, extent=(lo, hi), safety=6.0)
    sys_sr, _, _ = to_binned_system(sys_c, grid)
    sys_lr, _, ovf = to_binned_system(sys_c, grid, lr_grid)
    assert int(ovf) == 0

    from aimnetcentral_tpu.models.engine_binned import coulomb_dsf_binned

    q = jnp.asarray(rng.normal(size=(sys_sr.natoms,)).astype(np.float32)) * 0.2

    def e_dsf(s):
        return coulomb_dsf_binned(
            s, q, 4.6, dsf_alpha=0.2, dsf_rc=10.0, envelope="cosine",
            subtract_sr=False,
        )

    e_sr = np.asarray(jax.jit(e_dsf)(sys_sr))
    e_lr = np.asarray(jax.jit(e_dsf)(sys_lr))
    np.testing.assert_allclose(e_lr, e_sr, rtol=1e-5, atol=1e-5)
