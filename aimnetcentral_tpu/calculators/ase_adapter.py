"""ASE calculator adapter (reference aimnet/calculators/aimnet2ase.py:35-274).

Import-gated: ASE is an optional dependency.  Implements energy / forces /
free_energy / charges / stress / dipole_moment (+ spin_charges for NSE
models), charge/mult via ``atoms.info`` precedence, and ``get_hessian`` for
Sella-style transition-state searches.
"""

from __future__ import annotations

import numpy as np

try:
    from ase.calculators.calculator import Calculator, all_changes

    ASE_AVAILABLE = True
except ImportError:  # pragma: no cover
    ASE_AVAILABLE = False

    class Calculator:  # type: ignore[no-redef]
        pass

    all_changes = []


class AIMNet2ASE(Calculator):
    implemented_properties = [
        "energy",
        "forces",
        "free_energy",
        "charges",
        "stress",
        "dipole_moment",
    ]

    def __init__(self, base_calc, charge: float = 0.0, mult: float | None = None):
        if not ASE_AVAILABLE:
            raise ImportError("ase is required for AIMNet2ASE")
        super().__init__()
        if isinstance(base_calc, str):
            # registry alias / artifact path, like the reference's
            # AIMNet2ASE("aimnet2") (reference aimnet2ase.py:45-59)
            from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator

            base_calc = AIMNet2Calculator(base_calc)
        self.base_calc = base_calc
        self.charge = charge
        self.mult = mult
        self._last_charge_mult = None
        if getattr(base_calc, "is_nse", False):
            # per-INSTANCE extension, the class list stays closed-shell
            # (reference aimnet/calculators/aimnet2ase.py:62-63)
            self.__dict__["implemented_properties"] = [
                *self.__class__.implemented_properties,
                "spin_charges",
            ]

    @property
    def is_nse(self) -> bool:
        return bool(getattr(self.base_calc, "is_nse", False))

    def _charge_mult(self, atoms):
        """atoms.info takes precedence over constructor values; both
        ``mult`` (AIMNet2 style) and ``spin`` (MACE style) name the
        multiplicity 2S+1 (reference aimnet/calculators/
        aimnet2ase.py:114-135)."""
        charge = atoms.info.get("charge", self.charge)
        mult = atoms.info.get("mult", atoms.info.get("spin", self.mult))
        return charge, mult

    def set_charge(self, charge):
        """Set the default total charge and invalidate cached results
        (reference aimnet/calculators/aimnet2ase.py:104-107).  Overridden
        per-geometry by ``atoms.info['charge']``."""
        self.charge = charge
        self.results = {}

    def set_mult(self, mult):
        """Set the default multiplicity 2S+1 and invalidate cached results
        (reference aimnet/calculators/aimnet2ase.py:109-112)."""
        self.mult = mult
        self.results = {}

    def check_state(self, atoms, tol=1e-15):
        """ASE's base check only watches geometry — a changed
        ``atoms.info['charge'/'mult'/'spin']`` must also force a
        recalculation (reference aimnet/calculators/aimnet2ase.py:85-102)."""
        base = getattr(super(), "check_state", None)
        state = list(base(atoms, tol=tol)) if base is not None else []
        if self._charge_mult(atoms) != self._last_charge_mult:
            if "info" not in state:
                state.append("info")
        return state

    def _data(self, atoms):
        charge, mult = self._charge_mult(atoms)
        data = {
            "coord": atoms.get_positions().astype(np.float32),
            "numbers": atoms.get_atomic_numbers(),
            "charge": charge,
        }
        if mult is not None:
            data["mult"] = mult
        if atoms.pbc.any():
            data["cell"] = np.asarray(atoms.get_cell(), dtype=np.float32)
        return data

    def calculate(self, atoms=None, properties=("energy",), system_changes=all_changes):
        super().calculate(atoms, properties, system_changes)
        atoms = self.atoms
        self._last_charge_mult = self._charge_mult(atoms)
        need_stress = "stress" in properties and atoms.pbc.any()
        out = self.base_calc(
            self._data(atoms),
            forces="forces" in properties or True,
            stress=need_stress,
        )
        self.results["energy"] = float(out["energy"][0])
        self.results["free_energy"] = self.results["energy"]
        if "forces" in out:
            self.results["forces"] = np.asarray(out["forces"], dtype=np.float64)
        if "charges" in out:
            q = np.asarray(out["charges"], dtype=np.float64)
            self.results["charges"] = q
            self.results["dipole_moment"] = (
                q[:, None] * atoms.get_positions()
            ).sum(0)
        if "spin_charges" in out:
            self.results["spin_charges"] = np.asarray(out["spin_charges"])
        if need_stress and "stress" in out:
            s = np.asarray(out["stress"][0], dtype=np.float64)
            s = 0.5 * (s + s.T)
            # ASE Voigt order: xx, yy, zz, yz, xz, xy
            self.results["stress"] = np.array(
                [s[0, 0], s[1, 1], s[2, 2], s[1, 2], s[0, 2], s[0, 1]]
            )

    def get_dipole_moment(self, atoms):
        """Point-charge dipole from the model's partial charges (reference
        aimnet/calculators/aimnet2ase.py:153-156)."""
        if "charges" not in self.results:
            self.calculate(atoms, properties=("energy",))
        q = np.asarray(self.results["charges"], dtype=np.float64)
        return (q[:, None] * atoms.get_positions()).sum(0)

    def get_spin_charges(self, atoms=None):
        """Per-atom spin populations; NSE models only (reference
        aimnet/calculators/aimnet2ase.py:158-161)."""
        if "spin_charges" not in self.results:
            raise RuntimeError(
                "spin_charges is not available. Use an NSE model "
                "(e.g. 'aimnet2nse')."
            )
        return self.results["spin_charges"]

    def get_hessian(self, atoms=None):
        """(3N, 3N) Hessian for Sella (reference aimnet/calculators/
        aimnet2ase.py:163-226)."""
        atoms = atoms if atoms is not None else self.atoms
        if atoms is None:
            raise ValueError("get_hessian requires atoms (none attached)")
        out = self.base_calc(self._data(atoms), hessian=True)
        n = len(atoms)
        return np.asarray(out["hessian"], dtype=np.float64).reshape(3 * n, 3 * n)


class AIMNet2Pysis:
    """PySisyphus adapter (reference aimnet/calculators/aimnet2pysis.py:29-106):
    Bohr/Hartree unit conversion, energy/forces/hessian endpoints with a
    coordinate-keyed result cache."""

    def __init__(self, base_calc, charge: float = 0.0, mult: float = 1.0):
        from aimnetcentral_tpu import constants

        self.base_calc = base_calc
        self.charge = charge
        self.mult = mult
        self._bohr = constants.Bohr
        self._hartree = constants.Hartree
        self._cache_key = None
        self._cache = None

    def _eval(self, elem, coords_bohr, **kw):
        key = (tuple(elem), coords_bohr.tobytes(), tuple(sorted(kw)))
        if key == self._cache_key:
            return self._cache
        symbols = {
            s: z
            for z, s in enumerate(
                "X H He Li Be B C N O F Ne Na Mg Al Si P S Cl Ar K Ca Sc Ti V Cr Mn "
                "Fe Co Ni Cu Zn Ga Ge As Se Br Kr".split()
            )
        }
        numbers = np.array([symbols[e.capitalize()] for e in elem])
        coord = (coords_bohr.reshape(-1, 3) * self._bohr).astype(np.float32)
        data = {"coord": coord, "numbers": numbers, "charge": self.charge, "mult": self.mult}
        out = self.base_calc(data, **kw)
        self._cache_key, self._cache = key, out
        return out

    def get_energy(self, elem, coords):
        out = self._eval(elem, np.asarray(coords))
        return {"energy": float(out["energy"][0]) / self._hartree}

    def get_forces(self, elem, coords):
        out = self._eval(elem, np.asarray(coords), forces=True)
        f = np.asarray(out["forces"]) * self._bohr / self._hartree
        return {
            "energy": float(out["energy"][0]) / self._hartree,
            "forces": f.reshape(-1),
        }

    def get_hessian(self, elem, coords):
        out = self._eval(elem, np.asarray(coords), hessian=True)
        n = len(elem)
        h = np.asarray(out["hessian"]).reshape(3 * n, 3 * n) * self._bohr**2 / self._hartree
        return {
            "energy": float(out["energy"][0]) / self._hartree,
            "hessian": h,
        }


def run_pysis() -> None:
    """Console entry: register ``aimnet`` in PySisyphus's CALC_DICT and hand
    off to its runner (reference aimnet/calculators/aimnet2pysis.py:109-117).
    Installed as the ``aimnet2pysis-tpu`` script."""
    try:
        import pysisyphus.run
    except ImportError as e:  # pragma: no cover — optional extra
        raise ImportError(
            "run_pysis requires PySisyphus (`pip install pysisyphus`)."
        ) from e

    pysisyphus.run.CALC_DICT["aimnet"] = AIMNet2Pysis
    pysisyphus.run.run()
