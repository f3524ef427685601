"""On-device transition-state search (reference examples/sella_ts.py /
ts_opt.py analogue, BASELINE config 5).

Min-mode following with Lanczos lowest-eigenvector estimation — every
Hessian-vector product is one exact `jvp` of the gradient (works for every
LR method incl. Ewald/PME; the reference needs Sella + a dense Hessian
callback here).  Afterwards, `freq`-style analysis confirms exactly one
imaginary mode.

Usage: python examples/ts_search.py <model.pt> <guess.xyz>
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from aimnetcentral_tpu.calculators import AIMNet2Calculator
from aimnetcentral_tpu.cli import _read_xyz
from aimnetcentral_tpu.dynamics import frequencies_from_calculator, ts_search
from aimnetcentral_tpu.models.loader import load_model

loaded = load_model(sys.argv[1])
calc = AIMNet2Calculator(loaded.as_calculator_model())
coord, numbers = _read_xyz(sys.argv[2])
system = calc.prepare_system({"coord": coord, "numbers": numbers})

t0 = time.time()
ts, info = ts_search(loaded.params, calc.cfg, system, fmax=0.02)
print(
    f"TS search: {info['steps']} steps ({time.time() - t0:.1f}s), "
    f"fmax {info['fmax']:.4f} eV/A, converged={info['converged']}"
)

n_real = int(np.asarray(system.numbers > 0).sum())
freqs, _modes = frequencies_from_calculator(
    calc,
    {
        "coord": np.asarray(ts.coord)[:n_real],
        "numbers": np.asarray(ts.numbers)[:n_real],
    },
)
n_imag = int((freqs < -10.0).sum())
print(f"imaginary modes: {n_imag} (a first-order saddle has exactly 1); "
      f"lowest: {freqs[:4].round(1).tolist()} cm^-1")
