"""Vibrational analysis tests: exact translational null modes, analytic
diatomic frequency, reduced-mass scaling, CLI output."""

import numpy as np
import pytest

from aimnetcentral_tpu.dynamics import harmonic_frequencies

from conftest import random_molecule


def _diatomic_hessian(k, u):
    """Analytic Hessian of a harmonic bond along unit vector u: blocks
    +/- k * (u u^T)."""
    blk = k * np.outer(u, u)
    h = np.zeros((2, 3, 2, 3))
    h[0, :, 0, :] = blk
    h[1, :, 1, :] = blk
    h[0, :, 1, :] = -blk
    h[1, :, 0, :] = -blk
    return h


def test_diatomic_matches_reduced_mass_formula():
    """omega = sqrt(k/mu): CO-like pair, k = 100 eV/A^2."""
    k = 100.0
    m = np.array([12.011, 15.999])
    u = np.array([1.0, 0.0, 0.0])
    freqs, modes = harmonic_frequencies(_diatomic_hessian(k, u), m)
    mu = m[0] * m[1] / m.sum()
    expected = 521.4708 * np.sqrt(k / mu)
    # 5 null modes (3 translations projected + 2 transverse), 1 stretch
    np.testing.assert_allclose(freqs[:5], 0.0, atol=1e-6)
    np.testing.assert_allclose(freqs[5], expected, rtol=1e-10)
    # the stretch mode displaces the atoms along the bond, oppositely
    stretch = modes[5]
    assert abs(stretch[0, 0]) > 0.1 and np.sign(stretch[0, 0]) != np.sign(stretch[1, 0])
    assert np.abs(stretch[:, 1:]).max() < 1e-8


def test_heavier_isotope_lower_frequency():
    k = 50.0
    u = np.array([0.0, 0.0, 1.0])
    f_h = harmonic_frequencies(_diatomic_hessian(k, u), np.array([1.008, 35.45]))[0][-1]
    f_d = harmonic_frequencies(_diatomic_hessian(k, u), np.array([2.014, 35.45]))[0][-1]
    assert f_d < f_h
    mu_h = 1.008 * 35.45 / (1.008 + 35.45)
    mu_d = 2.014 * 35.45 / (2.014 + 35.45)
    np.testing.assert_allclose(f_h / f_d, np.sqrt(mu_d / mu_h), rtol=1e-10)


def test_imaginary_mode_reported_negative():
    """A negative curvature direction (saddle) must come out as a negative
    frequency, not NaN."""
    k = -30.0
    u = np.array([1.0, 0.0, 0.0])
    freqs, _ = harmonic_frequencies(_diatomic_hessian(k, u), np.array([12.0, 12.0]))
    assert freqs[0] < -100.0
    assert np.isfinite(freqs).all()


@pytest.mark.slow
def test_model_hessian_has_exact_translation_nulls(reference_aimnet2, rng):
    """Translation invariance makes H @ (uniform shift) == 0 at ANY geometry:
    the 3 projected translational modes must be numerically zero for the
    full model's Hessian."""
    from aimnetcentral_tpu.calculators import AIMNet2Calculator
    from aimnetcentral_tpu.dynamics import frequencies_from_calculator
    from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict

    model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, aux = convert_state_dict(sd, cfg)
    calc = AIMNet2Calculator((params, cfg, aux))

    coord, numbers = random_molecule(rng, 5)
    freqs, _ = frequencies_from_calculator(
        calc, {"coord": coord, "numbers": numbers, "charge": 0.0}
    )
    assert freqs.shape == (15,)
    # 3 projected translations ~0 (|f| < 2 cm^-1 covers f32 Hessian noise)
    assert np.sort(np.abs(freqs))[:3].max() < 2.0
    assert np.isfinite(freqs).all()
