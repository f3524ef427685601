"""ASE adapter unit tests without ASE installed (mirrors the stub-class
treatment the torchsim adapter got — reference tests/test_ase.py exercises
aimnet/calculators/aimnet2ase.py:35-274; here a fake ``ase`` package +
FakeAtoms cover the adapter's own logic: property mapping, charge/mult
precedence from atoms.info, stress Voigt order, batch-of-1 unsqueeze,
get_hessian shape)."""

import importlib
import sys
import types

import numpy as np
import pytest

import jax

from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator
from aimnetcentral_tpu.models import aimnet2_init
from aimnetcentral_tpu.models.aimnet2 import AEVConfig, AIMNet2Config
from aimnetcentral_tpu.models.heads import AtomicSumHead, OutputHead
from aimnetcentral_tpu.models.modules import MLPSpec


@pytest.fixture(scope="module")
def ase_adapter_module():
    """Install a minimal fake ``ase`` package and import the adapter
    against it (the image has no ASE; the adapter is import-gated)."""
    fake_calc_mod = types.ModuleType("ase.calculators.calculator")

    class Calculator:
        def __init__(self):
            self.results = {}
            self.atoms = None

        def calculate(self, atoms=None, properties=(), system_changes=None):
            if atoms is not None:
                self.atoms = atoms
            self.results = {}

    fake_calc_mod.Calculator = Calculator
    fake_calc_mod.all_changes = ["positions", "numbers", "cell", "pbc"]
    fake_pkg = types.ModuleType("ase")
    fake_sub = types.ModuleType("ase.calculators")
    saved = {k: sys.modules.get(k) for k in
             ("ase", "ase.calculators", "ase.calculators.calculator")}
    sys.modules["ase"] = fake_pkg
    sys.modules["ase.calculators"] = fake_sub
    sys.modules["ase.calculators.calculator"] = fake_calc_mod
    import aimnetcentral_tpu.calculators.ase_adapter as mod

    mod = importlib.reload(mod)
    assert mod.ASE_AVAILABLE
    yield mod
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v
    importlib.reload(mod)


class FakeAtoms:
    def __init__(self, positions, numbers, info=None, cell=None, pbc=False):
        self.positions = np.asarray(positions, dtype=np.float64)
        self.numbers = np.asarray(numbers)
        self.info = dict(info or {})
        self.cell = np.asarray(cell) if cell is not None else np.zeros((3, 3))
        self.pbc = np.asarray([pbc] * 3)

    def get_positions(self):
        return self.positions

    def get_atomic_numbers(self):
        return self.numbers

    def get_cell(self):
        return self.cell

    def __len__(self):
        return len(self.numbers)


@pytest.fixture(scope="module")
def calc():
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
    return AIMNet2Calculator((params, cfg, {"sae": {}}))


class RecordingCalc:
    """Spy wrapper: record the data dict the adapter hands to the base
    calculator (reference tests use the same doubles-at-the-seam style)."""

    def __init__(self, inner):
        self.inner = inner
        self.calls = []

    def __call__(self, data, **kw):
        self.calls.append((dict(data), dict(kw)))
        return self.inner(data, **kw)


def _water(info=None, **kw):
    return FakeAtoms(
        positions=[[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]],
        numbers=[8, 1, 1],
        info=info,
        **kw,
    )


def test_property_mapping_gas_phase(ase_adapter_module, calc):
    ase_calc = ase_adapter_module.AIMNet2ASE(calc)
    atoms = _water()
    ase_calc.calculate(atoms, properties=("energy", "forces"))
    r = ase_calc.results
    assert isinstance(r["energy"], float)  # batch-of-1 unsqueezed to scalar
    assert r["free_energy"] == r["energy"]
    assert r["forces"].shape == (3, 3) and r["forces"].dtype == np.float64
    assert np.isfinite(r["forces"]).all()
    if "charges" in r:
        np.testing.assert_allclose(
            r["dipole_moment"],
            (r["charges"][:, None] * atoms.get_positions()).sum(0),
        )


def test_charge_mult_precedence(ase_adapter_module, calc):
    """atoms.info overrides constructor values
    (reference aimnet/calculators/aimnet2ase.py:114-135)."""
    spy = RecordingCalc(calc)
    ase_calc = ase_adapter_module.AIMNet2ASE(spy, charge=1.0, mult=2.0)
    ase_calc.calculate(_water(), properties=("energy",))
    data, _ = spy.calls[-1]
    assert data["charge"] == 1.0 and data["mult"] == 2.0
    ase_calc.calculate(_water(info={"charge": -1.0, "mult": 3.0}), properties=("energy",))
    data, _ = spy.calls[-1]
    assert data["charge"] == -1.0 and data["mult"] == 3.0


def test_no_cell_passed_for_gas_phase(ase_adapter_module, calc):
    spy = RecordingCalc(calc)
    ase_adapter_module.AIMNet2ASE(spy).calculate(_water(), properties=("energy",))
    data, kw = spy.calls[-1]
    assert "cell" not in data
    assert kw.get("stress") in (False, None)


def test_periodic_stress_voigt(ase_adapter_module, calc):
    rng = np.random.default_rng(0)
    a = 7.0
    atoms = FakeAtoms(
        positions=rng.uniform(0, a, (8, 3)),
        numbers=[8, 1, 1, 6, 1, 1, 1, 1],
        cell=np.eye(3) * a,
        pbc=True,
    )
    ase_calc = ase_adapter_module.AIMNet2ASE(calc)
    ase_calc.calculate(atoms, properties=("energy", "forces", "stress"))
    s = ase_calc.results["stress"]
    assert s.shape == (6,)  # ASE Voigt order xx,yy,zz,yz,xz,xy
    assert np.isfinite(s).all()
    # cross-check against the raw (3,3) symmetrized tensor
    out = calc(
        {"coord": atoms.positions.astype(np.float32), "numbers": atoms.numbers,
         "charge": 0.0, "cell": atoms.cell.astype(np.float32)},
        forces=True, stress=True,
    )
    full = 0.5 * (out["stress"][0] + out["stress"][0].T)
    np.testing.assert_allclose(
        s, [full[0, 0], full[1, 1], full[2, 2], full[1, 2], full[0, 2], full[0, 1]],
        atol=1e-6,
    )


def test_get_hessian_shape(ase_adapter_module, calc):
    atoms = _water()
    ase_calc = ase_adapter_module.AIMNet2ASE(calc)
    h = ase_calc.get_hessian(atoms)
    assert h.shape == (9, 9)
    np.testing.assert_allclose(h, h.T, atol=1e-4)  # symmetric


# -- PySisyphus adapter (reference tests/test_pysis.py analogues) -------------


class _CountingCalc:
    """Stands in for AIMNet2Calculator: records calls, returns canned eV/A
    results sized to the input."""

    def __init__(self):
        self.calls = []

    def __call__(self, data, **kw):
        self.calls.append((np.asarray(data["coord"]).copy(), dict(kw)))
        n = len(data["numbers"])
        out = {"energy": np.array([-2.0]), "charges": np.zeros(n)}
        if kw.get("forces"):
            out["forces"] = np.full((n, 3), 0.5)
        if kw.get("hessian"):
            out["hessian"] = np.eye(3 * n).reshape(n, 3, n, 3) * 4.0
        return out


def test_pysis_unit_conversions():
    from aimnetcentral_tpu import constants
    from aimnetcentral_tpu.calculators.ase_adapter import AIMNet2Pysis

    base = _CountingCalc()
    p = AIMNet2Pysis(base, charge=1.0)
    elem = ["O", "H", "H"]
    coords_bohr = np.arange(9, dtype=np.float64)

    r = p.get_energy(elem, coords_bohr)
    assert r["energy"] == pytest.approx(-2.0 / constants.Hartree)
    # the calculator saw ANGSTROM coordinates and the ctor charge
    coord_seen = base.calls[0][0]
    np.testing.assert_allclose(
        coord_seen, coords_bohr.reshape(-1, 3) * constants.Bohr, rtol=1e-6
    )

    r = p.get_forces(elem, coords_bohr)
    # eV/A -> Hartree/Bohr
    np.testing.assert_allclose(
        r["forces"], 0.5 * constants.Bohr / constants.Hartree, rtol=1e-12
    )
    assert r["forces"].shape == (9,)

    r = p.get_hessian(elem, coords_bohr)
    assert r["hessian"].shape == (9, 9)
    np.testing.assert_allclose(
        r["hessian"], np.eye(9) * 4.0 * constants.Bohr**2 / constants.Hartree,
        rtol=1e-12,
    )


def test_pysis_coordinate_keyed_cache():
    from aimnetcentral_tpu.calculators.ase_adapter import AIMNet2Pysis

    base = _CountingCalc()
    p = AIMNet2Pysis(base)
    elem = ["C", "O"]
    c1 = np.arange(6, dtype=np.float64)

    p.get_forces(elem, c1)
    p.get_forces(elem, c1)  # same coords: cached, no new eval
    assert len(base.calls) == 1
    p.get_forces(elem, c1 + 0.1)  # moved: re-evaluates
    assert len(base.calls) == 2


# -- NSE surface (reference tests/test_ase.py:245-335) ------------------------


@pytest.fixture(scope="module")
def nse_calc():
    cfg = AIMNet2Config(
        aev=AEVConfig(rc_s=5.0, nshifts_s=8),
        nfeature=4,
        d2features=True,
        ncomb_v=4,
        hidden=((32,), (32,), (32,)),
        aim_size=32,
        num_charge_channels=2,
        outputs=(
            (
                "energy_mlp",
                OutputHead(n_in=32, n_out=1, key_in="aim", key_out="energy",
                           mlp=MLPSpec(hidden=(16,), last_linear=True)),
            ),
            ("atomic_sum", AtomicSumHead(key_in="energy", key_out="energy")),
        ),
    )
    params = aimnet2_init(jax.random.key(1), cfg)
    return AIMNet2Calculator((params, cfg, {"sae": {}}))


def test_is_nse_flags(ase_adapter_module, calc, nse_calc):
    assert not ase_adapter_module.AIMNet2ASE(calc).is_nse
    assert ase_adapter_module.AIMNet2ASE(nse_calc).is_nse


def test_spin_charges_in_implemented_properties_only_for_nse(
    ase_adapter_module, calc, nse_calc
):
    # class-level list stays closed-shell; NSE instances extend their OWN copy
    # (reference aimnet/calculators/aimnet2ase.py:62-63)
    assert "spin_charges" not in ase_adapter_module.AIMNet2ASE.implemented_properties
    std = ase_adapter_module.AIMNet2ASE(calc)
    assert "spin_charges" not in std.implemented_properties
    nse = ase_adapter_module.AIMNet2ASE(nse_calc, mult=2.0)
    assert "spin_charges" in nse.implemented_properties
    # and the class list was not mutated by constructing the NSE instance
    assert "spin_charges" not in ase_adapter_module.AIMNet2ASE.implemented_properties


def test_get_spin_charges_raises_for_standard_model(ase_adapter_module, calc):
    std = ase_adapter_module.AIMNet2ASE(calc)
    std.calculate(_water(), properties=("energy",))
    with pytest.raises(RuntimeError, match="NSE"):
        std.get_spin_charges()


def test_spin_charges_shape_and_sum_rule(ase_adapter_module, nse_calc):
    nse = ase_adapter_module.AIMNet2ASE(nse_calc, charge=1.0, mult=2.0)
    atoms = _water()
    nse.calculate(atoms, properties=("energy",))
    sc = nse.get_spin_charges()
    assert sc.shape == (3,)
    # NSE normalization: total spin charge == number of unpaired electrons
    # == mult - 1 (reference tests/test_ase.py:315-334)
    np.testing.assert_allclose(np.asarray(sc).sum(), 1.0, atol=1e-4)


def test_spin_info_alias_maps_to_mult(ase_adapter_module, nse_calc):
    # MACE-style atoms.info["spin"] names the multiplicity too
    # (reference aimnet/calculators/aimnet2ase.py:129-135)
    spy = RecordingCalc(nse_calc)
    ase_calc = ase_adapter_module.AIMNet2ASE(spy, charge=1.0, mult=2.0)
    ase_calc.calculate(_water(info={"spin": 4.0, "charge": 1.0}), properties=("energy",))
    data, _ = spy.calls[-1]
    assert data["mult"] == 4.0


def test_get_hessian_without_atoms_raises(ase_adapter_module, calc):
    with pytest.raises(ValueError, match="atoms"):
        ase_adapter_module.AIMNet2ASE(calc).get_hessian()


def test_forces_sum_nearly_zero(ase_adapter_module, calc):
    ase_calc = ase_adapter_module.AIMNet2ASE(calc)
    ase_calc.calculate(_water(), properties=("energy", "forces"))
    np.testing.assert_allclose(
        ase_calc.results["forces"].sum(0), np.zeros(3), atol=1e-5
    )


def test_set_charge_mult_invalidate_and_apply(ase_adapter_module, calc):
    """set_charge/set_mult (reference aimnet2ase.py:104-113) clear cached
    results and feed the next evaluation."""
    rec = RecordingCalc(calc)
    ase_calc = ase_adapter_module.AIMNet2ASE(rec)
    atoms = _water()
    ase_calc.calculate(atoms, properties=("energy",))
    assert "energy" in ase_calc.results
    ase_calc.set_charge(1.0)
    assert ase_calc.results == {}
    ase_calc.calculate(atoms, properties=("energy",))
    assert rec.calls[-1][0]["charge"] == 1.0
    ase_calc.set_mult(3.0)
    assert ase_calc.results == {}
    ase_calc.calculate(atoms, properties=("energy",))
    assert rec.calls[-1][0]["mult"] == 3.0


def test_check_state_flags_info_charge_change(ase_adapter_module, calc):
    """ASE's geometry-only check_state would serve stale results after an
    atoms.info charge/mult edit (reference aimnet2ase.py:85-102)."""
    ase_calc = ase_adapter_module.AIMNet2ASE(calc)
    atoms = _water()
    ase_calc.calculate(atoms, properties=("energy",))
    assert ase_calc.check_state(atoms) == []
    atoms.info["charge"] = -1
    assert "info" in ase_calc.check_state(atoms)
    ase_calc.calculate(atoms, properties=("energy",))
    assert ase_calc.check_state(atoms) == []
    atoms.info["spin"] = 2  # MACE-style mult alias counts too
    assert "info" in ase_calc.check_state(atoms)


def test_get_dipole_moment_method(ase_adapter_module, calc):
    ase_calc = ase_adapter_module.AIMNet2ASE(calc)
    atoms = _water()
    dm = ase_calc.get_dipole_moment(atoms)
    if "charges" not in ase_calc.results:
        pytest.skip("tiny fixture model emits no charges")
    assert dm.shape == (3,)
    np.testing.assert_allclose(dm, ase_calc.results["dipole_moment"])


def test_string_ctor_resolves_artifact_path(ase_adapter_module, tmp_path):
    """AIMNet2ASE('path/to/model.pt') builds the base calculator itself
    (reference aimnet2ase.py:45-59 accepts names and paths)."""
    from aimnetcentral_tpu.train.export import export_model

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
    p = str(tmp_path / "m.pt")
    export_model(aimnet2_init(jax.random.key(3), cfg), cfg, p,
                 sae={1: -13.6, 8: -2042.6}, implemented_species=[1, 8])
    ase_calc = ase_adapter_module.AIMNet2ASE(p)
    ase_calc.calculate(_water(), properties=("energy", "forces"))
    assert np.isfinite(ase_calc.results["energy"])
    assert ase_calc.results["forces"].shape == (3, 3)
