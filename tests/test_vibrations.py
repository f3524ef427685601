"""Vibrational analysis tests: exact translational null modes, analytic
diatomic frequency, reduced-mass scaling, CLI output."""

import numpy as np
import pytest

from aimnetcentral_tpu.dynamics import harmonic_frequencies

from conftest import random_molecule


@pytest.fixture(scope="module")
def calc_small():
    import jax

    from aimnetcentral_tpu.calculators import AIMNet2Calculator
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
    params = aimnet2_init(jax.random.key(3), cfg)
    return AIMNet2Calculator((params, cfg, {"sae": {}}))


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


def test_rotation_projection_nulls_six_modes(calc_small):
    """With project_rotations=True the 3 translations + 3 rotations are exact
    null directions of the projected Hessian — even at a NON-stationary
    geometry — leaving exactly 3N-6 finite modes for thermochemistry."""
    from aimnetcentral_tpu.dynamics import frequencies_from_calculator

    coord = np.array(
        [[0.0, 0.0, 0.1193], [0.0, 0.7632, -0.477], [0.0, -0.7632, -0.477]],
        dtype=np.float32,
    )
    data = {"coord": coord, "numbers": np.array([8, 1, 1]), "charge": 0.0}
    f_t, _ = frequencies_from_calculator(calc_small, data)
    f_tr, _ = frequencies_from_calculator(calc_small, data, project_rotations=True)
    # unprojected rotations at a random (non-stationary) geometry are NOT null
    assert np.sort(np.abs(f_t))[5] > 2.0
    assert np.sort(np.abs(f_tr))[:6].max() < 1e-4
    # exactly 3N-6 = 3 finite modes remain; the stiffest is barely affected
    # (low modes legitimately shift: rotations mix with soft vibrations away
    # from a stationary point)
    assert (np.abs(f_tr) > 1e-2).sum() == 3
    np.testing.assert_allclose(
        np.abs(f_tr).max(), np.abs(f_t).max(), rtol=0.05
    )


def test_rotation_projection_linear_molecule_rank():
    """A diatomic has only 2 independent rotations: the QR rank guard must
    drop the axial rotation vector instead of crashing, and the stretch
    frequency must be untouched."""
    k = 100.0
    m = np.array([12.011, 15.999])
    u = np.array([1.0, 0.0, 0.0])
    coord = np.array([[0.0, 0.0, 0.0], [1.128, 0.0, 0.0]])
    freqs, _ = harmonic_frequencies(
        _diatomic_hessian(k, u), m, coord=coord, project_rotations=True
    )
    mu = m[0] * m[1] / m.sum()
    np.testing.assert_allclose(freqs[:5], 0.0, atol=1e-6)
    np.testing.assert_allclose(freqs[5], 521.4708 * np.sqrt(k / mu), rtol=1e-10)


def test_project_rotations_requires_coord():
    with pytest.raises(ValueError, match="coord"):
        harmonic_frequencies(
            _diatomic_hessian(10.0, np.array([1.0, 0, 0])),
            np.array([1.0, 1.0]),
            project_rotations=True,
        )


# -- IR intensities + RRHO thermochemistry -------------------------------------


def test_rrho_water_textbook_values():
    """Experimental water frequencies against standard reference values:
    ZPE = 0.558 eV, S_trans(298.15 K, 1 atm) = 144.8 J/mol/K."""
    from aimnetcentral_tpu.dynamics.vibrations import rrho_thermochemistry

    freqs = np.array([1594.8, 3657.1, 3755.9])
    coord = np.array([[0.0, 0.0, 0.1193], [0.0, 0.7632, -0.477], [0.0, -0.7632, -0.477]])
    th = rrho_thermochemistry(freqs, [8, 1, 1], coord, symmetry_number=2)
    assert abs(th["zpe"] - 0.5584) < 2e-3
    J_MOL_K = 96485.33212  # eV/K -> J/mol/K
    assert abs(th["s_trans"] * J_MOL_K - 144.8) < 1.5
    # water rotational entropy (sigma=2): ~43.8 J/mol/K
    assert abs(th["s_rot"] * J_MOL_K - 43.8) < 1.0
    assert abs(th["g"] - (th["h"] - 298.15 * th["s"])) < 1e-12
    assert th["n_skipped_modes"] == 0


def test_project_rotations_single_atom_is_noop():
    """All three rotation vectors vanish for a single atom — the projection
    basis is empty and harmonic_frequencies must not crash (np.stack on an
    empty list raised before)."""
    h = np.diag([1.0, 2.0, 3.0]).reshape(1, 3, 1, 3)
    freqs, _modes = harmonic_frequencies(
        h, [39.948], coord=np.zeros((1, 3)),
        project_translations=False, project_rotations=True,
    )
    assert np.isfinite(freqs).all() and freqs.shape == (3,)


def test_rrho_linear_and_monatomic():
    from aimnetcentral_tpu.dynamics.vibrations import rrho_thermochemistry
    from aimnetcentral_tpu import constants

    kT = constants.kB * 298.15
    co2 = rrho_thermochemistry(
        np.array([667.0, 667.0, 1333.0, 2349.0]),
        [8, 6, 8],
        np.array([[0, 0, -1.16], [0, 0, 0.0], [0, 0, 1.16]]),
        symmetry_number=2,
    )
    assert abs(co2["u_rot"] - kT) < 1e-12  # linear rotor: kT, not 3/2 kT
    atom = rrho_thermochemistry(np.array([]), [18], np.zeros((1, 3)))
    assert atom["u_rot"] == 0.0 and abs(atom["s_rot"]) < 1e-15
    assert atom["zpe"] == 0.0


def test_rrho_skips_imaginary_and_low_modes():
    from aimnetcentral_tpu.dynamics.vibrations import rrho_thermochemistry

    th = rrho_thermochemistry(
        np.array([-350.0, 4.0, 1500.0]),
        [8, 1, 1],
        np.array([[0.0, 0.0, 0.1193], [0.0, 0.7632, -0.477], [0.0, -0.7632, -0.477]]),
    )
    assert th["n_skipped_modes"] == 2
    assert abs(th["zpe"] - 0.5 * 1500.0 * 1.239842e-4) < 1e-6


def test_rrho_caps_vibrations_at_3n_minus_6():
    """Rotational pseudo-frequencies above the cutoff (unprojected Hessian at
    an ML-potential minimum) must NOT be double-counted: the vibrational sum
    keeps only the 3N-6 HIGHEST real modes (ASE IdealGasThermo requires
    exactly 3N-6 vib energies)."""
    from aimnetcentral_tpu.dynamics.vibrations import rrho_thermochemistry

    coord = np.array(
        [[0.0, 0.0, 0.1193], [0.0, 0.7632, -0.477], [0.0, -0.7632, -0.477]]
    )
    clean = rrho_thermochemistry(
        np.array([1594.8, 3657.1, 3755.9]), [8, 1, 1], coord, symmetry_number=2
    )
    # two rotational contaminants at 25/40 cm^-1 sneak past the 10 cm^-1
    # cutoff; the cap drops them and WARNS (the heuristic can misfire on
    # floppy molecules - the warning points at projected frequencies)
    with pytest.warns(UserWarning, match="project_rotations"):
        dirty = rrho_thermochemistry(
            np.array([25.0, 40.0, 1594.8, 3657.1, 3755.9]),
            [8, 1, 1],
            coord,
            symmetry_number=2,
        )
    assert dirty["n_skipped_modes"] == 2
    for key in ("zpe", "u_vib", "s_vib", "g"):
        assert abs(dirty[key] - clean[key]) < 1e-12, key


def test_ir_translation_mode_is_dark_for_neutral(calc_small):
    """A rigid translation leaves a NEUTRAL molecule's dipole unchanged —
    its double-harmonic IR intensity must vanish (the dipole-derivative
    analogue of force translation invariance)."""
    from aimnetcentral_tpu.dynamics.vibrations import ir_intensities

    coord = np.array(
        [[0.0, 0.0, 0.1193], [0.0, 0.7632, -0.477], [0.0, -0.7632, -0.477]],
        dtype=np.float32,
    )
    data = {"coord": coord, "numbers": np.array([8, 1, 1]), "charge": 0.0}
    trans = np.zeros((1, 3, 3))
    trans[0, :, 0] = 1.0 / np.sqrt(3.0)
    intens = ir_intensities(calc_small, data, trans)
    assert intens.shape == (1,)
    assert intens[0] < 1e-3  # km/mol — numerically dark


def test_ir_intensities_finite_for_real_modes(calc_small):
    from aimnetcentral_tpu.dynamics import frequencies_from_calculator
    from aimnetcentral_tpu.dynamics.vibrations import ir_intensities

    coord = np.array(
        [[0.0, 0.0, 0.1193], [0.0, 0.7632, -0.477], [0.0, -0.7632, -0.477]],
        dtype=np.float32,
    )
    data = {"coord": coord, "numbers": np.array([8, 1, 1]), "charge": 0.0}
    freqs, modes = frequencies_from_calculator(calc_small, data)
    intens = ir_intensities(calc_small, data, modes)
    assert intens.shape == (9,)
    assert np.isfinite(intens).all() and (intens >= 0).all()
    # vibrational modes of a polar molecule under a random potential: at
    # least one bright mode
    assert intens.max() > 1e-3
