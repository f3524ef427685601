"""Fused Pallas pair-sweep kernel (kernels/pair_sweep.py) vs the XLA twin
(engine_binned.pair_energy_binned): energies, coordinate/extras/cell
gradients, LR-layout routing, and the full D3 two-sweep path."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels on CPU

import jax
import jax.numpy as jnp

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.ops.binned import plan_bins, plan_lr_bins, to_binned_system


def _dsf_like(rc=5.0, alpha=0.2):
    import math

    erfc_rc = math.erfc(alpha * rc)
    shift = erfc_rc / rc

    def e_fn(d, valid, self_b, cand_b):
        qq = self_b["q"][..., :, None] * cand_b["q"][..., None, :]
        return qq * (jax.scipy.special.erfc(alpha * d) / d - shift)

    return e_fn


def _rep_like(rc=5.0):
    def e_fn(d, valid, self_b, cand_b):
        alpha_ij = self_b["p"][..., :, None, 0] * cand_b["p"][..., None, :, 0]
        zeff_ij = self_b["p"][..., :, None, 1] * cand_b["p"][..., None, :, 1]
        return jnp.exp(-alpha_ij * d**1.5) * zeff_ij / d

    return e_fn


def _make_case(periodic=True, n=40, seed=7, lr=False):
    rng = np.random.default_rng(seed)
    a = 12.0
    coord = rng.uniform(0, a, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    cell = np.eye(3, dtype=np.float32) * a if periodic else None
    mol = {"coord": coord, "numbers": numbers}
    if periodic:
        mol["cell"] = cell
    sys_c = system_from_molecules([mol], cutoff=5.0, max_neighbors=16)
    extent = None if periodic else (coord.min(0), coord.max(0))
    grid = plan_bins(cell, n, 5.2, safety=3.0, extent=extent)
    lr_grid = plan_lr_bins(cell, n, 5.0, extent=extent, safety=3.0) if lr else None
    sysb, perm, ovf = to_binned_system(sys_c, grid, lr_grid=lr_grid)
    assert int(ovf) == 0
    q = jnp.asarray(rng.normal(size=(sysb.natoms,)).astype(np.float32)) * 0.3
    return sysb, q


def _xla(system, cutoff, e_fn, extras, layout="sr"):
    from aimnetcentral_tpu.models.engine_binned import pair_energy_binned

    return pair_energy_binned(
        system, cutoff, e_fn, extras, layout, allow_pallas=False
    )


def _pal(system, cutoff, e_fn, extras, layout="sr"):
    from jax.experimental.pallas import tpu as pltpu

    from aimnetcentral_tpu.kernels.pair_sweep import pair_energy_pallas

    with pltpu.force_tpu_interpret_mode():
        return pair_energy_pallas(system, cutoff, e_fn, extras, layout)


def test_small_grid_routes_to_xla_twin():
    """Grids the banded tables don't cover (nz < 2r+1) route to the XLA
    twin — numerically identical by construction (the per-bin v1 kernel
    that used to cover them was trimmed, VERDICT r2 item 10)."""
    sysb, q = _make_case()
    assert sysb.bins.nbins[2] < 3  # NOT band-eligible at radius 1
    e_fn = _dsf_like()
    ref = _xla(sysb, 5.0, e_fn, {"q": q})
    pal = _pal(sysb, 5.0, e_fn, {"q": q})
    np.testing.assert_array_equal(np.asarray(pal), np.asarray(ref))


def test_small_grid_lr_layout_routes_to_xla_twin():
    sysb, q = _make_case(lr=True)
    if sysb.lr_bins is None:
        pytest.skip("case has no LR twin layout")
    e_fn = _dsf_like()
    ref = _xla(sysb, 5.0, e_fn, {"q": q}, layout="lr")
    pal = _pal(sysb, 5.0, e_fn, {"q": q}, layout="lr")
    np.testing.assert_array_equal(np.asarray(pal), np.asarray(ref))


@pytest.mark.parametrize("banded", [False, True])
def test_dftd3_full_path_matches(monkeypatch, banded):
    """dftd3_binned end-to-end (CN sweep + factorized energy sweep) through
    the Pallas engine == XLA engine.  banded=True runs the banded
    half-stencil kernel (exercising the asymmetric p/r extras through the
    two-sided in-kernel vjp); banded=False covers the small-grid routing
    back to the XLA twin."""
    from jax.experimental.pallas import tpu as pltpu

    from aimnetcentral_tpu import constants
    from aimnetcentral_tpu.models.engine_binned import dftd3_binned

    sysb, _q = _make_banded_case(n=60) if banded else _make_case()
    t = constants.get_d3_tables()
    tables = {"rcov": jnp.asarray(t["rcov"]), "r4r2": jnp.asarray(t["r4r2"])}
    kw = dict(a1=0.49, a2=5.0, s8=0.78)
    if banded:
        # cutoffs that keep the sweep band-eligible on the small test box
        kw.update(smoothing_on=4.0, smoothing_off=5.0)

    monkeypatch.setenv("AIMNET_PAIR_ENGINE", "xla")
    ref = dftd3_binned(sysb, tables, **kw)
    monkeypatch.setenv("AIMNET_PAIR_ENGINE", "pallas")
    with pltpu.force_tpu_interpret_mode():
        pal = dftd3_binned(sysb, tables, **kw)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), rtol=1e-5, atol=1e-7)


def _make_banded_case(periodic=True, n=120, seed=11):
    """Case whose grid hits the banded half-stencil (v3) path:
    nz >= 2*radius + 1."""
    rng = np.random.default_rng(seed)
    a = 18.0
    coord = rng.uniform(0, a, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    cell = np.eye(3, dtype=np.float32) * a if periodic else None
    mol = {"coord": coord, "numbers": numbers}
    if periodic:
        mol["cell"] = cell
    sys_c = system_from_molecules([mol], cutoff=5.0, max_neighbors=16)
    extent = None if periodic else (coord.min(0), coord.max(0))
    grid = plan_bins(cell, n, 5.5, safety=3.0, extent=extent)
    sysb, perm, ovf = to_binned_system(sys_c, grid)
    assert int(ovf) == 0
    assert grid.nbins[2] >= 3, grid  # banded eligibility at radius 1
    q = jnp.asarray(rng.normal(size=(sysb.natoms,)).astype(np.float32)) * 0.3
    return sysb, q


@pytest.mark.parametrize("periodic", [True, False])
def test_banded_energy_matches_xla(periodic):
    sysb, q = _make_banded_case(periodic=periodic)
    e_fn = _dsf_like()
    ref = _xla(sysb, 5.0, e_fn, {"q": q})
    pal = _pal(sysb, 5.0, e_fn, {"q": q})
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-5)


def test_banded_gradients_match_xla():
    from jax.experimental.pallas import tpu as pltpu

    from aimnetcentral_tpu.kernels.pair_sweep import pair_energy_pallas

    sysb, q = _make_banded_case()
    e_fn = _dsf_like()
    ct = jnp.asarray(
        np.random.default_rng(5).normal(size=(sysb.natoms,)).astype(np.float32)
    )

    def loss_x(coord, q_):
        return (_xla(sysb.replace(coord=coord), 5.0, e_fn, {"q": q_}) * ct).sum()

    def loss_p(coord, q_):
        return (
            pair_energy_pallas(sysb.replace(coord=coord), 5.0, e_fn, {"q": q_}) * ct
        ).sum()

    gx_c, gx_q = jax.grad(loss_x, argnums=(0, 1))(sysb.coord, q)
    with pltpu.force_tpu_interpret_mode():
        gp_c, gp_q = jax.grad(loss_p, argnums=(0, 1))(sysb.coord, q)
    np.testing.assert_allclose(np.asarray(gp_c), np.asarray(gx_c), atol=3e-5)
    np.testing.assert_allclose(np.asarray(gp_q), np.asarray(gx_q), atol=3e-5)


def test_banded_cell_gradient_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from aimnetcentral_tpu.kernels.pair_sweep import pair_energy_pallas

    sysb, q = _make_banded_case()
    e_fn = _dsf_like()

    def loss_x(cell):
        return _xla(sysb.replace(cell=cell), 5.0, e_fn, {"q": q}).sum()

    def loss_p(cell):
        return pair_energy_pallas(sysb.replace(cell=cell), 5.0, e_fn, {"q": q}).sum()

    gx = jax.grad(loss_x)(sysb.cell)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p)(sysb.cell)
    scale = max(float(np.abs(np.asarray(gx)).max()), 1e-8)
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gx), atol=3e-5 * scale + 1e-6
    )


def test_banded_vector_extras_and_lr_layout():
    """Banded path with (C, k) vector extras on the coarse LR twin layout
    (the production DSF/D3 configuration): energies + coord/extras grads."""
    from jax.experimental.pallas import tpu as pltpu

    from aimnetcentral_tpu.kernels.pair_sweep import pair_energy_pallas

    rng = np.random.default_rng(3)
    n, a = 120, 18.0
    coord = rng.uniform(0, a, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    cell = np.eye(3, dtype=np.float32) * a
    sys_c = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}],
        cutoff=5.0, max_neighbors=16,
    )
    grid = plan_bins(cell, n, 5.5, safety=3.0)
    lr_grid = plan_lr_bins(cell, n, 7.0, safety=3.0)
    sysb, _perm, ovf = to_binned_system(sys_c, grid, lr_grid=lr_grid)
    assert int(ovf) == 0
    assert lr_grid.nbins[2] >= 5  # banded eligibility at radius 2
    p = jnp.asarray(rng.uniform(0.5, 1.5, size=(sysb.natoms, 2)).astype(np.float32))
    e_fn = _rep_like()
    ct = jnp.asarray(rng.normal(size=(sysb.natoms,)).astype(np.float32))

    def loss_x(coord_, p_):
        return (
            _xla(sysb.replace(coord=coord_), 7.0, e_fn, {"p": p_}, layout="lr") * ct
        ).sum()

    def loss_p(coord_, p_):
        return (
            pair_energy_pallas(
                sysb.replace(coord=coord_), 7.0, e_fn, {"p": p_}, layout="lr"
            )
            * ct
        ).sum()

    ex = loss_x(sysb.coord, p)
    with pltpu.force_tpu_interpret_mode():
        ep = loss_p(sysb.coord, p)
    np.testing.assert_allclose(float(ep), float(ex), rtol=1e-5)
    gx_c, gx_p = jax.grad(loss_x, argnums=(0, 1))(sysb.coord, p)
    with pltpu.force_tpu_interpret_mode():
        gp_c, gp_p = jax.grad(loss_p, argnums=(0, 1))(sysb.coord, p)
    scale_c = max(float(np.abs(np.asarray(gx_c)).max()), 1e-8)
    np.testing.assert_allclose(
        np.asarray(gp_c), np.asarray(gx_c), atol=3e-5 * scale_c
    )
    scale_p = max(float(np.abs(np.asarray(gx_p)).max()), 1e-8)
    np.testing.assert_allclose(
        np.asarray(gp_p), np.asarray(gx_p), atol=3e-5 * scale_p
    )
