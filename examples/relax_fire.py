"""On-device FIRE geometry relaxation (reference examples/ase_opt.py analogue).

Usage: python examples/relax_fire.py <model.pt> <molecule.xyz>
"""

import sys
import time

sys.path.insert(0, ".")

from aimnetcentral_tpu.calculators import AIMNet2Calculator
from aimnetcentral_tpu.cli import _read_xyz
from aimnetcentral_tpu.dynamics import fire_relax
from aimnetcentral_tpu.models.loader import load_model

loaded = load_model(sys.argv[1])
calc = AIMNet2Calculator(loaded.as_calculator_model())
coord, numbers = _read_xyz(sys.argv[2])
system = calc.prepare_system({"coord": coord, "numbers": numbers})

t0 = time.time()
relaxed, info = fire_relax(loaded.params, calc.cfg, system, fmax=0.05)
print(f"relaxed in {info['steps']} FIRE steps ({time.time() - t0:.1f}s), "
      f"fmax {info['fmax']:.4f} eV/A, converged={info['converged']}")
