"""Physical constants and element data tables.

Mirrors the unit system of the reference (reference aimnet/constants.py:4-9):
energies in eV, distances in Angstrom, charges in e.  The Coulomb prefactor is
``half_Hartree * Bohr`` for ordered-pair sums.

Element data (masses, GFN1 repulsion parameters, D3 r4r2 expectation values,
D3(BJ) reference C6 / coordination-number tables) are standard published
physics tables, stored as npz files in ``aimnetcentral_tpu/data/``.
"""

from __future__ import annotations

import functools
import os

import numpy as np

# from ase.units (reference aimnet/constants.py:4-9)
kB = 8.617330337217213e-05  # eV / K
fs = 0.09822694788464063  # ASE time unit conversion: x [fs] * fs = ASE time
Hartree = 27.211386024367243  # eV
half_Hartree = 0.5 * Hartree
Bohr = 0.5291772105638411  # Angstrom
Bohr_inv = 1.0 / Bohr

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@functools.cache
def _element_tables() -> dict[str, np.ndarray]:
    with np.load(os.path.join(_DATA_DIR, "element_tables.npz")) as z:
        return {k: z[k].copy() for k in z}


@functools.cache
def _d3_tables() -> dict[str, np.ndarray]:
    with np.load(os.path.join(_DATA_DIR, "d3_tables.npz")) as z:
        return {k: z[k].copy() for k in z}


def get_masses() -> np.ndarray:
    """Atomic masses (amu) indexed by atomic number; index 0 is the dummy atom."""
    return _element_tables()["masses"]


def get_gfn1_rep() -> tuple[np.ndarray, np.ndarray]:
    """GFN1-xTB short-range repulsion (alpha, Z_eff) tables, indices 0..86."""
    t = _element_tables()
    return t["gfn1_repa"], t["gfn1_repb"]


def get_r4r2() -> np.ndarray:
    """D3 sqrt(0.5 * sqrt(Z) * <r4>/<r2>) table used by D3TS (reference aimnet/constants.py:324)."""
    return _element_tables()["r4r2"]


def get_d3_tables() -> dict[str, np.ndarray]:
    """DFT-D3 reference data: c6ab (95,95,5,5), cn_ref (95,95,5,5), rcov (95,), r4r2 (95,).

    Same unpacked layout as the reference DFTD3 module
    (reference aimnet/modules/lr.py:1405-1422).
    """
    return _d3_tables()
