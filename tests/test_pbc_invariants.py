"""Calculator-level periodic invariants, mirroring the reference's PBC suite
(reference tests/test_pbc.py:107-1292 and tests/test_calculator.py:976-1017,
1419-1545): lattice-translation invariance, supercell extensivity, rotation
invariance of the Ewald sum, triclinic cells through the full facade, and the
wrapped/unwrapped coordinate contract."""

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


def _periodic_box(rng, n=8, a=8.0):
    coord, numbers = random_molecule(rng, n, spread=a / 2 - 1.2)
    coord = (coord + a / 2).astype(np.float32)
    cell = np.eye(3, dtype=np.float32) * a
    return coord, numbers, cell


# -- lattice-translation / wrapping contract ---------------------------------


def test_lattice_translation_invariance(calc, rng):
    """Shifting every atom by an integer combination of lattice vectors must
    leave energy AND forces unchanged (reference wraps inputs into the cell,
    calculator.py:1220-1299 move_coord_to_cell)."""
    coord, numbers, cell = _periodic_box(rng)
    data = {"coord": coord, "numbers": numbers, "cell": cell}
    ref = calc(data, forces=True)
    shifts = rng.integers(-2, 3, size=(len(numbers), 3)).astype(np.float32)
    data2 = {"coord": coord + shifts @ cell, "numbers": numbers, "cell": cell}
    out = calc(data2, forces=True)
    np.testing.assert_allclose(out["energy"], ref["energy"], atol=2e-4)
    np.testing.assert_allclose(out["forces"], ref["forces"], atol=2e-4)


def test_rigid_translation_invariance_pbc(calc, rng):
    """Rigid (non-lattice) translation of the whole box contents is also an
    identity for a periodic system."""
    coord, numbers, cell = _periodic_box(rng)
    ref = calc({"coord": coord, "numbers": numbers, "cell": cell}, forces=True)
    t = np.array([1.234, -0.567, 2.891], dtype=np.float32)
    out = calc({"coord": coord + t, "numbers": numbers, "cell": cell}, forces=True)
    np.testing.assert_allclose(out["energy"], ref["energy"], atol=2e-4)
    np.testing.assert_allclose(out["forces"], ref["forces"], atol=2e-4)


def test_translation_invariance_gas_phase(calc, rng):
    """Reference tests/test_calculator.py:979 analogue."""
    coord, numbers = random_molecule(rng, 9)
    ref = calc({"coord": coord, "numbers": numbers}, forces=True)
    out = calc({"coord": coord + 37.5, "numbers": numbers}, forces=True)
    np.testing.assert_allclose(out["energy"], ref["energy"], atol=1e-4)
    np.testing.assert_allclose(out["forces"], ref["forces"], atol=1e-4)


def test_forces_sum_zero_gas_phase(calc, rng):
    """Newton's third law at the facade (reference test_calculator.py:731)."""
    coord, numbers = random_molecule(rng, 10)
    out = calc({"coord": coord, "numbers": numbers}, forces=True)
    np.testing.assert_allclose(out["forces"].sum(axis=0), 0.0, atol=1e-4)


# -- extensivity / supercell --------------------------------------------------


@pytest.mark.parametrize("method", ["dsf", "ewald"])
def test_supercell_energy_and_forces(calc, rng, method):
    """A 2x1x1 supercell must have exactly twice the energy, with replica
    forces equal to the originals (extensivity of NN + LR + wrapping).
    Reference checks per-method PBC consistency (tests/test_pbc.py:932-1025)
    but never extensivity — this is a stronger invariant."""
    coord, numbers, cell = _periodic_box(rng, n=6, a=7.0)
    calc.set_lrcoulomb_method(method)
    try:
        ref = calc({"coord": coord, "numbers": numbers, "cell": cell}, forces=True)
        coord2 = np.concatenate([coord, coord + cell[0]], axis=0)
        numbers2 = np.concatenate([numbers, numbers])
        cell2 = cell.copy()
        cell2[0] *= 2.0
        out = calc({"coord": coord2, "numbers": numbers2, "cell": cell2}, forces=True)
        np.testing.assert_allclose(out["energy"], 2.0 * ref["energy"], atol=5e-4)
        np.testing.assert_allclose(out["forces"][:6], ref["forces"], atol=5e-4)
        np.testing.assert_allclose(out["forces"][6:], ref["forces"], atol=5e-4)
    finally:
        calc.set_lrcoulomb_method("simple")


# -- rotation -----------------------------------------------------------------


def test_rotation_invariance_pbc_ewald(calc, rng):
    """Rotating cell AND coordinates together is an identity for the full
    periodic surface including the Ewald reciprocal sum (k-vectors rotate
    with the cell)."""
    coord, numbers, cell = _periodic_box(rng, n=6, a=7.0)
    calc.set_lrcoulomb_method("ewald")
    try:
        ref = calc({"coord": coord, "numbers": numbers, "cell": cell}, forces=True)
        # random rotation via QR
        q, r = np.linalg.qr(rng.normal(size=(3, 3)))
        q = (q * np.sign(np.diag(r))).astype(np.float32)
        out = calc(
            {"coord": coord @ q, "numbers": numbers, "cell": cell @ q}, forces=True
        )
        np.testing.assert_allclose(out["energy"], ref["energy"], atol=5e-4)
        np.testing.assert_allclose(out["forces"], ref["forces"] @ q, atol=5e-4)
    finally:
        calc.set_lrcoulomb_method("simple")


# -- triclinic cells ----------------------------------------------------------


def _triclinic(rng, n=8):
    cell = np.array(
        [[7.5, 0.0, 0.0], [2.1, 7.0, 0.0], [-1.3, 1.7, 6.8]], dtype=np.float32
    )
    frac = rng.uniform(0.05, 0.95, size=(n, 3)).astype(np.float32)
    # push apart in cartesian space
    coord = frac @ cell
    for _ in range(200):
        d = np.linalg.norm(coord[:, None] - coord[None, :], axis=-1)
        np.fill_diagonal(d, 10.0)
        if d.min() > 1.3:
            break
        i, j = np.unravel_index(d.argmin(), d.shape)
        push = coord[i] - coord[j]
        push /= np.linalg.norm(push) + 1e-9
        coord[i] += 0.4 * push
        coord[j] -= 0.4 * push
    numbers = rng.choice([1, 6, 7, 8], size=n).astype(np.int64)
    return coord.astype(np.float32), numbers, cell


def test_triclinic_energy_forces_stress_finite(calc, rng):
    coord, numbers, cell = _triclinic(rng)
    out = calc(
        {"coord": coord, "numbers": numbers, "cell": cell}, forces=True, stress=True
    )
    assert np.isfinite(out["energy"]).all()
    assert np.isfinite(out["forces"]).all()
    assert np.isfinite(out["stress"]).all()
    np.testing.assert_allclose(out["stress"][0], out["stress"][0].T, atol=1e-3)


def test_triclinic_forces_match_fd(calc, rng):
    """Finite-difference force check in a skewed cell — exercises the
    fractional-coordinate wrapping and triclinic shift machinery end-to-end."""
    coord, numbers, cell = _triclinic(rng, n=6)
    data = {"coord": coord, "numbers": numbers, "cell": cell}
    out = calc(data, forces=True)
    eps = 1e-3
    for (i, k) in [(0, 0), (3, 1), (5, 2)]:
        cp = coord.copy()
        cp[i, k] += eps
        ep = calc({**data, "coord": cp})["energy"][0]
        cm = coord.copy()
        cm[i, k] -= eps
        em = calc({**data, "coord": cm})["energy"][0]
        fd = -(ep - em) / (2 * eps)
        assert out["forces"][i, k] == pytest.approx(fd, abs=5e-3)


def test_triclinic_lattice_translation_invariance(calc, rng):
    coord, numbers, cell = _triclinic(rng)
    ref = calc({"coord": coord, "numbers": numbers, "cell": cell}, forces=True)
    shifts = rng.integers(-1, 2, size=(len(numbers), 3)).astype(np.float32)
    out = calc(
        {"coord": coord + shifts @ cell, "numbers": numbers, "cell": cell},
        forces=True,
    )
    np.testing.assert_allclose(out["energy"], ref["energy"], atol=2e-4)
    np.testing.assert_allclose(out["forces"], ref["forces"], atol=2e-4)


@pytest.mark.slow
def test_triclinic_ewald_matches_dsf_dense_limit(calc, rng):
    """In a large triclinic cell with well-separated atoms, Ewald and DSF
    agree (reference DSF<->Ewald consistency, tests/test_pbc.py:287 — here in
    a skewed cell)."""
    coord, numbers, cell = _triclinic(rng, n=5)
    cell3 = cell * 3.0  # blow the box up so LR differences vanish
    coord3 = coord + cell3.sum(axis=0) / 3.0
    data = {"coord": coord3, "numbers": numbers, "cell": cell3}
    try:
        calc.set_lrcoulomb_method("dsf")
        e_dsf = calc(data)["energy"][0]
        calc.set_lrcoulomb_method("ewald")
        e_ew = calc(data)["energy"][0]
    finally:
        calc.set_lrcoulomb_method("simple")
    assert e_ew == pytest.approx(e_dsf, abs=5e-3)


# -- edge inputs (reference TestEdgeCases analogues) --------------------------


def test_nan_coord_rejected_or_nan_energy(calc):
    """Reference contract (test_calculator.py:1521): NaN input either raises
    or propagates to a non-finite energy — it must not silently produce a
    plausible number."""
    coord = np.array([[0.0, 0.0, 0.0], [np.nan, 0.0, 0.0], [-0.24, 0.93, 0.0]])
    try:
        out = calc({"coord": coord, "numbers": np.array([8, 1, 1])})
        assert not np.isfinite(out["energy"]).all()
    except (ValueError, RuntimeError):
        pass


def test_large_charge_finite(calc, rng):
    coord, numbers = random_molecule(rng, 6)
    out = calc({"coord": coord, "numbers": numbers, "charge": 3.0}, forces=True)
    assert np.isfinite(out["energy"]).all()
    assert np.isfinite(out["forces"]).all()


def test_dsf_custom_params(calc, rng):
    """set_lrcoulomb_method forwards DSF parameters (reference
    test_calculator.py:241-249 set_coulomb_dsf_with_params)."""
    coord, numbers = random_molecule(rng, 8)
    data = {"coord": coord, "numbers": numbers}
    try:
        calc.set_lrcoulomb_method("dsf")
        e_default = calc(data)["energy"][0]
        calc.set_lrcoulomb_method("dsf", dsf_rc=12.0, dsf_alpha=0.25)
        heads = [h for _, h in calc.cfg.outputs if getattr(h, "kind", "") == "lrcoulomb"]
        assert heads and heads[0].dsf_rc == 12.0 and heads[0].dsf_alpha == 0.25
        e_custom = calc(data)["energy"][0]
        assert e_custom != e_default
    finally:
        calc.set_lrcoulomb_method("simple")


def test_ewald_custom_accuracy(calc, rng):
    """Tighter ewald_accuracy changes parameters but not physics (reference
    test_calculator.py:318-339)."""
    coord, numbers, cell = _periodic_box(rng, n=6, a=7.0)
    data = {"coord": coord, "numbers": numbers, "cell": cell}
    try:
        calc.set_lrcoulomb_method("ewald", ewald_accuracy=1e-4)
        e_loose = calc(data)["energy"][0]
        calc.set_lrcoulomb_method("ewald", ewald_accuracy=1e-8)
        e_tight = calc(data)["energy"][0]
        assert e_loose == pytest.approx(e_tight, abs=1e-3)
    finally:
        calc.set_lrcoulomb_method("simple")
