"""Climbing-image NEB (dynamics/neb.py) — beyond-reference capability (the
reference delegates band searches to PySisyphus / ORCA NEB-TS).

The analytic gate uses a 2-D double well with a KNOWN off-path saddle, so
the band must genuinely curve away from the linear interpolation; the model
gate drives the batched-System route end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimnetcentral_tpu.dynamics.neb import linear_band, neb, neb_core, neb_forces


def _double_well(c):
    """V(x, y) = (x^2-1)^2 + 2 (y - 0.2 (1-x^2))^2.

    Minima at (+-1, 0) with V=0; saddle at (0, 0.2) with V=1 — OFF the
    straight line between the minima."""
    x, y = c[0, 0], c[0, 1]
    return (x**2 - 1.0) ** 2 + 2.0 * (y - 0.2 * (1.0 - x**2)) ** 2


def _analytic_fn(band):
    e = jax.vmap(_double_well)(band)
    f = -jax.vmap(jax.grad(_double_well))(band)
    return e, f


def test_neb_core_finds_off_path_saddle():
    band0 = linear_band(
        jnp.array([[-1.0, 0.0, 0.0]]), jnp.array([[1.0, 0.0, 0.0]]), 13
    )
    band, energies, info = neb_core(
        _analytic_fn, band0, k_spring=1.0, fmax=1e-3, max_steps=2000
    )
    assert info["converged"], info
    ts = band[info["i_ts"], 0]
    np.testing.assert_allclose(ts[:2], [0.0, 0.2], atol=2e-2)
    np.testing.assert_allclose(info["barrier"], 1.0, atol=1e-2)
    # endpoints frozen bit-exactly
    np.testing.assert_array_equal(band[0], band0[0])
    np.testing.assert_array_equal(band[-1], band0[-1])
    # the band curved off the linear path to find the saddle
    assert float(jnp.max(band[:, 0, 1])) > 0.15


def test_neb_forces_zero_on_converged_straight_band():
    """On a symmetric 1-D profile sampled exactly along the MEP, the
    perpendicular force and spring force both vanish."""
    xs = jnp.linspace(-1.0, 1.0, 9)
    band = jnp.stack([jnp.stack([x, 0.0 * x, 0.0 * x])[None, :] for x in xs])

    def v(c):
        return (c[0, 0] ** 2 - 1.0) ** 2  # pure 1-D double well

    e = jax.vmap(v)(band)
    f = -jax.vmap(jax.grad(v))(band)
    f_neb = neb_forces(band, e, f, k_spring=1.0, climb=False)
    # equally-spaced images on a straight path: springs cancel; true force
    # is parallel to the tangent, so the projection removes it
    np.testing.assert_allclose(np.asarray(f_neb), 0.0, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_model():
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
    return aimnet2_init(jax.random.key(0), cfg), cfg


def test_neb_model_band_end_to_end(tiny_model):
    """The batched-System route: band of water bend geometries through the
    real forward; endpoints frozen, interior relaxes, residual drops."""
    params, cfg = tiny_model
    numbers = np.array([8, 1, 1])
    bent = np.array([[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]],
                    dtype=np.float32)
    wide = np.array([[0.0, 0.0, 0.119], [0.0, 0.95, -0.2], [0.0, -0.95, -0.2]],
                    dtype=np.float32)
    band, energies, info = neb(
        params, cfg,
        {"coord": bent, "numbers": numbers},
        {"coord": wide, "numbers": numbers},
        n_images=7, fmax=0.02, max_steps=300,
    )
    assert band.shape == (7, 3, 3) and energies.shape == (7,)
    assert np.isfinite(np.asarray(energies)).all()
    np.testing.assert_allclose(np.asarray(band[0]), bent, atol=1e-6)
    np.testing.assert_allclose(np.asarray(band[-1]), wide, atol=1e-6)
    assert info["steps"] > 0
    assert info["fmax"] < 1.0  # residual is sane on a random surface
    assert 1 <= info["i_ts"] <= 5


def test_neb_input_validation(tiny_model):
    params, cfg = tiny_model
    a = {"coord": np.zeros((2, 3), np.float32), "numbers": np.array([1, 1])}
    b = {"coord": np.zeros((2, 3), np.float32), "numbers": np.array([1, 8])}
    with pytest.raises(ValueError, match="atom ordering"):
        neb(params, cfg, a, b)
    c = dict(a, cell=np.eye(3, dtype=np.float32))
    with pytest.raises(ValueError, match="gas-phase"):
        neb(params, cfg, a, c)
    # different electronic states across the band are physically meaningless
    with pytest.raises(ValueError, match="charge"):
        neb(params, cfg, dict(a, charge=1.0), a)
    with pytest.raises(ValueError, match="mult"):
        neb(params, cfg, a, dict(a, mult=3.0))
    # explicit-but-equal values are fine (defaults: charge 0, mult 1)
    with pytest.raises(ValueError, match="atom ordering"):
        neb(params, cfg, dict(a, charge=0.0), dict(b, charge=0.0))
