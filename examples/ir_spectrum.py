"""Harmonic IR spectrum + gas-phase thermochemistry for one molecule.

Frequencies from the dense Hessian (mass-weighted normal modes),
double-harmonic IR intensities from batched finite-difference dipole
derivatives, and ideal-gas RRHO thermochemistry — the end-to-end workflow
the reference delegates to ase.vibrations/ase.thermochemistry.

Usage: python examples/ir_spectrum.py <model.pt> <molecule.xyz> [charge]
"""

import sys

sys.path.insert(0, ".")
import numpy as np

from aimnetcentral_tpu.calculators import AIMNet2Calculator
from aimnetcentral_tpu.cli import _read_xyz
from aimnetcentral_tpu.dynamics import frequencies_from_calculator
from aimnetcentral_tpu.dynamics.vibrations import (
    ir_intensities,
    rrho_thermochemistry,
)
from aimnetcentral_tpu.models.loader import load_model

model_path, xyz = sys.argv[1], sys.argv[2]
charge = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0

loaded = load_model(model_path)
calc = AIMNet2Calculator(loaded.as_calculator_model())
coord, numbers = _read_xyz(xyz)
data = {"coord": coord, "numbers": numbers, "charge": charge}

freqs, modes = frequencies_from_calculator(calc, data)
intens = ir_intensities(calc, data, modes)

print(f"{'freq (cm^-1)':>14} {'IR (km/mol)':>12}")
for f, a in zip(freqs, intens):
    tag = "  (imaginary)" if f < -10 else ""
    print(f"{f:14.1f} {a:12.3f}{tag}")

th = rrho_thermochemistry(freqs, numbers, coord)
print(f"\nZPE = {th['zpe']:.4f} eV")
print(f"thermal H(298.15 K) = {th['h']:.4f} eV")
print(f"S = {th['s'] * 1e3:.4f} meV/K  (trans {th['s_trans']*1e3:.4f}, "
      f"rot {th['s_rot']*1e3:.4f}, vib {th['s_vib']*1e3:.4f})")
print(f"G correction = {th['g']:.4f} eV")
