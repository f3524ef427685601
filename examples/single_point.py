"""Single-point energy/forces/charges (reference examples analogue).

Usage: python examples/single_point.py <model.pt> <molecule.xyz> [charge]
"""

import sys

sys.path.insert(0, ".")
import numpy as np

from aimnetcentral_tpu.calculators import AIMNet2Calculator
from aimnetcentral_tpu.cli import _read_xyz
from aimnetcentral_tpu.models.loader import load_model

model_path, xyz = sys.argv[1], sys.argv[2]
charge = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0

loaded = load_model(model_path)
calc = AIMNet2Calculator(loaded.as_calculator_model())
coord, numbers = _read_xyz(xyz)

out = calc({"coord": coord, "numbers": numbers, "charge": charge}, forces=True)
print(f"energy: {out['energy'][0]:.6f} eV")
print(f"max |F|: {np.abs(out['forces']).max():.6f} eV/A")
print(f"charges: {np.round(out['charges'], 4)}")
