"""On-device NVT MD of a periodic box (BASELINE config 4 analogue).

Usage: python examples/md_nvt.py <model.pt> [n_atoms] [n_steps]
Builds a synthetic organic box; the entire MD loop runs on the TPU.
"""

import sys
import time

sys.path.insert(0, ".")
import numpy as np

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.dynamics import MDConfig, MDDriver
from aimnetcentral_tpu.models.loader import load_model
from bench import build_box

model_path = sys.argv[1]
n_atoms = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

loaded = load_model(model_path)
coord, numbers, cell = build_box(n_atoms)
system = system_from_molecules(
    [{"coord": coord, "numbers": numbers, "cell": cell}], cutoff=5.5, max_neighbors=64
)

drv = MDDriver(
    loaded.params,
    loaded.cfg,
    system,
    # precision=None (default) is the fast 1-pass regime; for NVE /
    # drift-sensitive runs use precision="balanced" (~1e-4 eV/A forces at
    # 1.38x step cost) or "exact" — docs/dynamics.md has the measured table
    MDConfig(dt_fs=0.5, temperature_K=300.0, thermostat="langevin"),
)
t0 = time.time()
obs = drv.run(n_steps, chunk=100)
dt = time.time() - t0
print(f"{n_steps} steps in {dt:.1f}s -> {n_steps / dt:.2f} steps/s")
print(f"mean T: {obs['temperature'][n_steps // 2:].mean():.1f} K")
print(f"final E_pot: {obs['epot'][-1]:.3f} eV")
