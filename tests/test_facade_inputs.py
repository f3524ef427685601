"""Calculator facade input-contract and edge-case tests, mirroring the
reference's TestInputValidation / TestEdgeCases / TestEnergyConsistency /
TestBatchCorrectness groups (reference tests/test_calculator.py:102-1521)
plus the mult/NSE guards (:1740-1786)."""

import numpy as np
import pytest

from aimnetcentral_tpu.calculators import AIMNet2Calculator
from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict

from conftest import random_molecule


@pytest.fixture(scope="module")
def calc(reference_aimnet2):
    model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, aux = convert_state_dict(sd, cfg)
    return AIMNet2Calculator((params, cfg, aux))


@pytest.fixture(scope="module")
def nse_calc(reference_aimnet2):
    model, cfg_yaml = reference_aimnet2("aimnet2.yaml", num_charge_channels=2)
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, aux = convert_state_dict(sd, cfg)
    return AIMNet2Calculator((params, cfg, aux))


# -- input contract ----------------------------------------------------------


def test_missing_coord_raises(calc):
    with pytest.raises((KeyError, ValueError)):
        calc({"numbers": [8, 1, 1], "charge": 0.0})


def test_missing_numbers_raises(calc):
    with pytest.raises((KeyError, ValueError)):
        calc({"coord": np.zeros((3, 3)), "charge": 0.0})


def test_list_and_numpy_inputs_agree(calc, rng):
    coord, numbers = random_molecule(rng, 6)
    a = calc({"coord": coord, "numbers": numbers})
    b = calc({"coord": coord.tolist(), "numbers": numbers.tolist()})
    np.testing.assert_allclose(a["energy"], b["energy"], atol=1e-6)
    np.testing.assert_allclose(a["charges"], b["charges"], atol=1e-6)


def test_charge_broadcast_scalar_vs_vector(calc, rng):
    coord, numbers = random_molecule(rng, 6)
    a = calc({"coord": coord, "numbers": numbers, "charge": 0.0})
    b = calc({"coord": coord[None], "numbers": numbers[None], "charge": [0.0]})
    np.testing.assert_allclose(a["energy"], b["energy"], atol=1e-6)


def test_invalid_coulomb_method_raises(calc):
    with pytest.raises(ValueError, match="unknown Coulomb method"):
        calc.set_lrcoulomb_method("not_a_method")


def test_ewald_without_cell_raises(calc, rng):
    coord, numbers = random_molecule(rng, 6)
    calc.set_lrcoulomb_method("ewald")
    try:
        with pytest.raises(ValueError, match="periodic cell"):
            calc({"coord": coord, "numbers": numbers})
    finally:
        calc.set_lrcoulomb_method("simple")


def test_mult_ignored_warns_once_on_closed_shell_model(calc, rng):
    coord, numbers = random_molecule(rng, 5)
    calc._mult_warned = False
    with pytest.warns(UserWarning, match="mult is ignored"):
        calc({"coord": coord, "numbers": numbers, "mult": 3.0})
    # second call: silent (warn-once, reference test_calculator.py:1740)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        calc({"coord": coord, "numbers": numbers, "mult": 3.0})


def test_nse_model_requires_mult(nse_calc, rng):
    coord, numbers = random_molecule(rng, 5)
    with pytest.raises(ValueError, match="mult"):
        nse_calc({"coord": coord, "numbers": numbers})
    out = nse_calc({"coord": coord, "numbers": numbers, "mult": 2.0, "charge": 1.0})
    assert np.isfinite(out["energy"]).all()
    assert "spin_charges" in out and out["spin_charges"].shape == (5,)


def test_nse_model_does_not_warn_on_mult(nse_calc, rng):
    import warnings as _w

    coord, numbers = random_molecule(rng, 5)
    with _w.catch_warnings():
        _w.simplefilter("error")
        nse_calc({"coord": coord, "numbers": numbers, "mult": 2.0})


# -- edge cases ---------------------------------------------------------------


def test_single_atom_molecule(calc):
    out = calc({"coord": [[0.0, 0.0, 0.0]], "numbers": [6]}, forces=True)
    assert np.isfinite(out["energy"]).all()
    np.testing.assert_allclose(out["forces"], 0.0, atol=1e-6)
    # an isolated neutral atom carries the whole (zero) net charge
    # (f32 NSE redistribution noise on this random-weight model ~1e-4)
    np.testing.assert_allclose(out["charges"].sum(), 0.0, atol=5e-4)


def test_atoms_far_from_origin(calc, rng):
    coord, numbers = random_molecule(rng, 6)
    a = calc({"coord": coord, "numbers": numbers}, forces=True)
    b = calc({"coord": coord + 1000.0, "numbers": numbers}, forces=True)
    np.testing.assert_allclose(a["energy"], b["energy"], atol=5e-4)
    np.testing.assert_allclose(a["forces"], b["forces"], atol=5e-4)


def test_very_close_atoms_finite(calc):
    """r -> 0.05 A: energies/forces must stay finite (1/r guards)."""
    out = calc(
        {"coord": [[0.0, 0.0, 0.0], [0.05, 0.0, 0.0]], "numbers": [1, 1]},
        forces=True,
    )
    assert np.isfinite(out["energy"]).all()
    assert np.isfinite(out["forces"]).all()


def test_rotation_invariance(calc, rng):
    coord, numbers = random_molecule(rng, 8)
    # random rotation via QR
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q = q * np.sign(np.diag(r))
    a = calc({"coord": coord, "numbers": numbers}, forces=True)
    b = calc({"coord": coord @ q.T, "numbers": numbers}, forces=True)
    np.testing.assert_allclose(a["energy"], b["energy"], atol=2e-4)
    np.testing.assert_allclose(a["forces"] @ q.T, b["forces"], atol=2e-4)
    np.testing.assert_allclose(a["charges"], b["charges"], atol=1e-4)


# -- batch correctness --------------------------------------------------------


def test_ragged_list_batch_matches_individual(calc, rng):
    mols = []
    singles = []
    for n in (4, 7, 11):
        coord, numbers = random_molecule(rng, n)
        mols.append({"coord": coord, "numbers": numbers, "charge": 0.0})
        singles.append(calc({"coord": coord, "numbers": numbers}, forces=True))
    out = calc(mols, forces=True)
    assert out["energy"].shape == (3,)
    np.testing.assert_allclose(
        out["energy"], np.concatenate([s["energy"] for s in singles]), atol=1e-4
    )
    np.testing.assert_allclose(
        out["forces"],
        np.concatenate([s["forces"] for s in singles]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        out["charges"],
        np.concatenate([s["charges"] for s in singles]),
        atol=1e-4,
    )


def test_hessian_multi_molecule_returns_list(calc, rng):
    c1, z1 = random_molecule(rng, 4)
    c2, z2 = random_molecule(rng, 6)
    out = calc(
        [
            {"coord": c1, "numbers": z1, "charge": 0.0},
            {"coord": c2, "numbers": z2, "charge": 0.0},
        ],
        hessian=True,
    )
    assert out["energy"].shape == (2,)
    assert isinstance(out["hessian"], list) and len(out["hessian"]) == 2
    assert out["hessian"][0].shape == (4, 3, 4, 3)
    assert out["hessian"][1].shape == (6, 3, 6, 3)
    for h in out["hessian"]:
        flat = h.reshape(h.shape[0] * 3, -1)
        np.testing.assert_allclose(flat, flat.T, atol=1e-4)


def test_validate_species_false_bypasses_guard(calc, rng):
    """Unsupported species must raise with validation on and evaluate
    (undefined but finite-shaped output) with validation off."""
    impl = calc.metadata.get("implemented_species")
    if not impl:
        pytest.skip("fixture model has no implemented_species metadata")
    coord, numbers = random_molecule(rng, 4)
    numbers = numbers.copy()
    numbers[0] = 118  # oganesson is definitely not trained
    with pytest.raises(ValueError, match="implemented_species"):
        calc({"coord": coord, "numbers": numbers})
    out = calc({"coord": coord, "numbers": numbers}, validate_species=False)
    assert out["energy"].shape == (1,)
