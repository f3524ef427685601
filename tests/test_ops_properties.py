"""Property tests for the math substrate (ops/math.py) — the analogue of
reference tests/test_ops.py:14-490 (cutoff limits/smoothness, radial basis,
NSE conservation under net charge, transition functions, DSF kernel
structure, erfc accuracy)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aimnetcentral_tpu.ops import math as om


# -- cutoffs -------------------------------------------------------------


def test_cosine_cutoff_limits_and_monotonic():
    rc = 5.0
    d = jnp.linspace(0.01, rc, 200)
    f = om.cosine_cutoff(d, rc)
    assert abs(float(om.cosine_cutoff(jnp.asarray(1e-6), rc)) - 1.0) < 1e-5
    assert float(om.cosine_cutoff(jnp.asarray(rc), rc)) < 1e-6
    assert np.all(np.diff(np.asarray(f)) <= 1e-7)  # monotone decreasing
    assert np.all((np.asarray(f) >= 0.0) & (np.asarray(f) <= 1.0))


def test_exp_cutoff_limits_and_smooth_tail():
    rc = 5.0
    assert abs(float(om.exp_cutoff(jnp.asarray(0.0), rc)) - 1.0) < 1e-6
    assert float(om.exp_cutoff(jnp.asarray(rc - 1e-4), rc)) < 1e-3
    # derivative vanishes at BOTH ends (mollifier)
    g = jax.grad(lambda x: om.exp_cutoff(x, rc))
    assert abs(float(g(jnp.asarray(1e-4)))) < 1e-2
    assert abs(float(g(jnp.asarray(rc - 1e-4)))) < 1e-2


def test_cutoff_gradients_finite_everywhere():
    rc = 5.0
    d = jnp.linspace(0.0, rc + 1.0, 101)  # includes both clamped regions
    for fn in (om.cosine_cutoff, om.exp_cutoff):
        g = jax.vmap(jax.grad(lambda x: fn(x, rc)))(d)
        assert np.isfinite(np.asarray(g)).all(), fn.__name__


# -- radial basis ---------------------------------------------------------


def test_exp_expand_shape_and_peak():
    shifts = jnp.linspace(0.8, 5.0, 16)
    d = jnp.asarray([[1.0, 2.0, 3.0]])
    out = om.exp_expand(d, shifts, eta=4.0)
    assert out.shape == (1, 3, 16)
    # each basis function peaks exactly at its own shift
    peak = om.exp_expand(shifts[None], shifts, eta=4.0)[0]
    assert np.allclose(np.asarray(peak).diagonal(), 1.0)
    # and decays away from it
    assert float(om.exp_expand(jnp.asarray(0.8 + 1.5), shifts, 4.0)[0]) < 1.0


def test_exp_expand_gradient_finite():
    shifts = jnp.linspace(0.8, 5.0, 8)
    g = jax.grad(lambda d: om.exp_expand(d, shifts, 4.0).sum())(jnp.asarray(2.3))
    assert np.isfinite(float(g))


# -- NSE charge equilibration ----------------------------------------------


def _nse_inputs(rng, n, num_mol, channels):
    q_u = jnp.asarray(rng.normal(size=(n, channels)), dtype=jnp.float32)
    f_u = jnp.asarray(rng.uniform(0.1, 2.0, size=(n, channels)), dtype=jnp.float32)
    mol_idx = jnp.asarray(np.sort(rng.integers(0, num_mol, size=n)))
    return q_u, f_u, mol_idx


def test_nse_conserves_nonzero_total_charge():
    rng = np.random.default_rng(3)
    q_u, f_u, mol_idx = _nse_inputs(rng, 12, 3, 1)
    Q = jnp.asarray([[1.0], [-2.0], [0.0]], dtype=jnp.float32)
    q, dQ = om.nse(Q, q_u, f_u, mol_idx, 3)
    totals = om.mol_sum(q, mol_idx, 3)
    np.testing.assert_allclose(np.asarray(totals), np.asarray(Q), atol=1e-5)


def test_nse_two_channel_conserves_each_channel():
    rng = np.random.default_rng(4)
    q_u, f_u, mol_idx = _nse_inputs(rng, 10, 2, 2)
    Q = jnp.asarray([[1.0, 0.0], [0.0, 1.0]], dtype=jnp.float32)
    q, _ = om.nse(Q, q_u, f_u, mol_idx, 2)
    totals = om.mol_sum(q, mol_idx, 2)
    np.testing.assert_allclose(np.asarray(totals), np.asarray(Q), atol=1e-5)


def test_nse_reports_conservation_violation():
    rng = np.random.default_rng(5)
    q_u, f_u, mol_idx = _nse_inputs(rng, 8, 2, 1)
    Q = jnp.asarray([[0.5], [-0.5]], dtype=jnp.float32)
    _, dQ = om.nse(Q, q_u, f_u, mol_idx, 2)
    expect = np.asarray(Q) - np.asarray(om.mol_sum(q_u, mol_idx, 2))
    np.testing.assert_allclose(np.asarray(dQ), expect, atol=1e-6)


def test_nse_gradient_finite():
    rng = np.random.default_rng(6)
    q_u, f_u, mol_idx = _nse_inputs(rng, 8, 2, 1)
    Q = jnp.zeros((2, 1), dtype=jnp.float32)

    def loss(q_u, f_u):
        q, _ = om.nse(Q, q_u, f_u, mol_idx, 2)
        return (q**2).sum()

    g1, g2 = jax.grad(loss, argnums=(0, 1))(q_u, f_u)
    assert np.isfinite(np.asarray(g1)).all() and np.isfinite(np.asarray(g2)).all()


# -- loss/transition functions ----------------------------------------------


def test_huber_quadratic_core_linear_tail():
    assert abs(float(om.huber(jnp.asarray(0.1))) - 0.005) < 1e-7
    # linear tail: slope == delta
    y1, y2 = float(om.huber(jnp.asarray(3.0))), float(om.huber(jnp.asarray(4.0)))
    assert abs((y2 - y1) - 1.0) < 1e-6
    # continuous at |x| == delta
    assert abs(float(om.huber(jnp.asarray(1.0))) - 0.5) < 1e-6


def test_bumpfn_boundaries_midpoint_monotone():
    x = jnp.linspace(-0.5, 1.5, 401)
    y = np.asarray(om.bumpfn(x))
    assert y[0] < 1e-5 and y[-1] > 1 - 1e-5
    assert abs(float(om.bumpfn(jnp.asarray(0.5))) - 0.5) < 1e-6
    assert np.all(np.diff(y) >= -1e-7)


def test_smoothstep_boundaries_and_flat_ends():
    assert float(om.smoothstep(jnp.asarray(0.0))) == 0.0
    assert float(om.smoothstep(jnp.asarray(1.0))) == 1.0
    g = jax.grad(lambda x: om.smoothstep(x))
    assert abs(float(g(jnp.asarray(0.0)))) < 1e-6
    assert abs(float(g(jnp.asarray(1.0)))) < 1e-6
    assert abs(float(om.smoothstep(jnp.asarray(0.5))) - 0.5) < 1e-6


def test_expstep_boundaries():
    assert abs(float(om.expstep(jnp.asarray(0.0))) - 1.0) < 1e-5
    assert float(om.expstep(jnp.asarray(1.0))) < 1e-5


def test_transition_gradients_finite_at_clamps():
    x = jnp.asarray([-1.0, 0.0, 0.5, 1.0, 2.0])
    for fn in (om.bumpfn, om.smoothstep, om.expstep):
        g = jax.vmap(jax.grad(fn))(x)
        assert np.isfinite(np.asarray(g)).all(), fn.__name__


# -- erfc + DSF kernel -------------------------------------------------------


def test_erfc_approx_accuracy():
    x = jnp.linspace(0.0, 6.0, 500)
    ours = np.asarray(om.erfc_approx(x), dtype=np.float64)
    exact = np.asarray(jax.scipy.special.erfc(x), dtype=np.float64)
    # A&S 7.1.26 bound is 1.5e-7 in exact arithmetic (measured 1.39e-7 in
    # f64); f32 polynomial evaluation adds rounding noise up to ~2e-6
    assert np.abs(ours - exact).max() < 4e-6


def test_coulomb_dsf_zero_beyond_cutoff_and_continuous_at_rc():
    Rc, alpha = 15.0, 0.2
    d = jnp.asarray([[1.0, 5.0, 14.999, 15.5]])
    valid = jnp.ones_like(d, dtype=bool)
    J = np.asarray(om.coulomb_matrix_dsf(d, Rc, alpha, valid))
    assert J[0, 3] == 0.0  # beyond cutoff: exactly zero
    assert abs(J[0, 2]) < 1e-6  # shifted force: J(Rc) -> 0 (continuous)
    assert J[0, 0] > J[0, 1] > 0.0  # decays with distance inside the cutoff


def test_coulomb_dsf_force_continuous_at_rc():
    # DSF also shifts the FORCE to zero at the cutoff (the defining property
    # vs plain shifted Coulomb; reference aimnet/ops.py:148-157)
    Rc, alpha = 15.0, 0.2
    g = jax.grad(
        lambda d: om.coulomb_matrix_dsf(
            d[None, None], Rc, alpha, jnp.ones((1, 1), bool)
        ).sum()
    )
    assert abs(float(g(jnp.asarray(Rc - 1e-3)))) < 1e-6


def test_coulomb_dsf_masks_invalid_entries():
    d = jnp.asarray([[1.0, 2.0]])
    valid = jnp.asarray([[True, False]])
    J = np.asarray(om.coulomb_matrix_dsf(d, 15.0, 0.2, valid))
    assert J[0, 0] != 0.0 and J[0, 1] == 0.0
