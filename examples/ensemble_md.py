"""4-member ensemble NVT MD on one chip (BASELINE config 4; no reference
analogue — the reference runs members sequentially).

Member parameter stacks ride a leading axis; the MD driver evaluates
mean-ensemble forces inside the same compiled chunk scan as single-model
MD.  For one-artifact-per-member registries, pass the four loaded param
pytrees to ``stack_params``.

Usage: python examples/ensemble_md.py <model.pt> [n_atoms=2000] [steps=200]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from aimnetcentral_tpu.calculators import AIMNet2Calculator
from aimnetcentral_tpu.calculators.ensemble import stack_params
from aimnetcentral_tpu.dynamics import MDConfig, MDDriver
from aimnetcentral_tpu.models.loader import load_model

loaded = load_model(sys.argv[1])
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 200

# demo: 4 copies of one artifact (swap in 4 registry members for real use)
stacked = stack_params([loaded.params] * 4)

rng = np.random.default_rng(0)
a = (n / 0.09) ** (1 / 3)
coord = rng.uniform(0.5, a - 0.5, size=(n, 3)).astype(np.float32)
numbers = rng.choice([1, 6, 7, 8], size=n, p=[0.5, 0.35, 0.05, 0.1])

calc = AIMNet2Calculator(loaded.as_calculator_model())
drv = MDDriver(
    stacked, calc.cfg, calc.prepare_system(
        {"coord": coord, "numbers": numbers, "cell": np.eye(3) * a}
    ),
    MDConfig(dt_fs=0.5, temperature_K=300.0),
    ensemble=True,
)
drv.run(20, chunk=20)  # compile + equilibrate
t0 = time.time()
obs = drv.run(steps, chunk=50)
dt = time.time() - t0
print(f"{n} atoms x 4 members: {steps / dt:.2f} steps/s, "
      f"mean T {float(obs['temperature'].mean()):.0f} K")
