"""Min-mode TS search: analytic-saddle convergence + Lanczos eigenpair
correctness + model-surface smoke test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aimnetcentral_tpu.dynamics.saddle import lanczos_min_mode, min_mode_search


def test_lanczos_matches_dense_eigh():
    """Lanczos lowest eigenpair == dense eigh on a random symmetric matrix."""
    rng = np.random.default_rng(0)
    n = 12  # atoms; 3n-dim Hessian
    m = rng.normal(size=(3 * n, 3 * n)).astype(np.float32)
    h = (m + m.T) / 2
    evals, evecs = np.linalg.eigh(h)
    hj = jnp.asarray(h)

    def hvp(coord, v):
        return (hj @ v.reshape(-1)).reshape(n, 3)

    coord = jnp.zeros((n, 3), jnp.float32)
    real = jnp.ones((n, 1), bool)
    v0 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    lam, v = jax.jit(
        lambda c, v0: lanczos_min_mode(hvp, c, v0, real, k=3 * n)
    )(coord, v0)
    assert abs(float(lam) - evals[0]) < 1e-3
    overlap = abs(float(np.asarray(v).reshape(-1) @ evecs[:, 0]))
    assert overlap > 0.999


def test_min_mode_finds_analytic_saddle():
    """Quartic double-well x-channel + harmonic rest: first-order saddle at
    the origin; start displaced in every direction."""

    def energy(coord):
        x = coord[0, 0]
        rest = (coord**2).sum() - x * x
        return (x**2 - 1.0) ** 2 - x**2 + 0.5 * rest  # saddle at x=0 (max in x)

    # Actually make x=0 a genuine max along x: E_x = -(x^2-1)^2 has max at... use
    # E = -0.5 x^2 + 0.25 x^4 + 0.5 |rest|^2: saddle at origin, minima at x=+-1.
    def energy2(coord):
        x = coord[0, 0]
        rest = (coord**2).sum() - x * x
        return -0.5 * x**2 + 0.25 * x**4 + 0.5 * rest

    coord0 = jnp.asarray(
        np.array([[0.6, 0.3, -0.2], [0.1, -0.4, 0.25]], dtype=np.float32)
    )
    real = jnp.ones((2, 1), bool)
    coord, info = min_mode_search(
        energy2, coord0, real, fmax=1e-4, max_steps=400, step_size=0.5,
        trust=0.2, lanczos_k=6,
    )
    assert info["converged"], info
    assert info["is_saddle"], info
    c = np.asarray(coord)
    np.testing.assert_allclose(c, 0.0, atol=2e-3)
    assert info["lambda_min"] < -0.5  # the -x^2 mode (curvature -1)


@pytest.mark.slow
def test_ts_search_on_model_surface():
    """ts_search runs end-to-end on the network surface and reports a
    negative lowest mode when converged onto a stretched-bond ridge."""
    from aimnetcentral_tpu.builders import system_from_molecules
    from aimnetcentral_tpu.dynamics import ts_search
    from aimnetcentral_tpu.models import aimnet2_init
    from aimnetcentral_tpu.models.aimnet2 import AEVConfig, AIMNet2Config
    from aimnetcentral_tpu.models.heads import AtomicSumHead, OutputHead
    from aimnetcentral_tpu.models.modules import MLPSpec

    cfg = AIMNet2Config(
        aev=AEVConfig(rc_s=5.0, nshifts_s=8),
        nfeature=4,
        d2features=True,
        ncomb_v=4,
        hidden=((32,), (32,), (32,)),
        aim_size=32,
        outputs=(
            (
                "energy_mlp",
                OutputHead(n_in=32, n_out=1, key_in="aim", key_out="energy",
                           mlp=MLPSpec(hidden=(16,), last_linear=True)),
            ),
            ("atomic_sum", AtomicSumHead(key_in="energy", key_out="energy")),
        ),
    )
    params = aimnet2_init(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    coord = rng.normal(size=(5, 3)).astype(np.float32) * 1.5
    numbers = np.array([6, 1, 1, 1, 8], dtype=np.int64)
    system = system_from_molecules(
        [{"coord": coord, "numbers": numbers}], cutoff=5.0, max_neighbors=4
    )
    _, info = ts_search(params, cfg, system, fmax=0.05, max_steps=30, lanczos_k=8)
    # random weights: no convergence guarantee — the contract is that the
    # loop runs, reports finite diagnostics, and respected max_steps
    assert info["steps"] <= 30
    assert np.isfinite(info["fmax"]) and np.isfinite(info["lambda_min"])
