"""Precision-tier measurement: facade calls/s + MD steps/s + max force
delta vs the exact tier, on the 10k BASELINE box (TPU).

Reproduces the numbers in docs/performance.md "Matmul precision" and
docs/dynamics.md (round 5):

    facade  exact 2.99 / balanced 5.23 (6.5e-6 eV/A) / fast 7.10 (7.6e-3)
    MD      default 9.73 (1.8e-2) / balanced 7.06 (8.8e-5) / exact 4.36 (3.1e-6)

Usage:  python tools/bench_precision.py [facade|md|both]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "both"


def _facade(cfg, params, data):
    from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator

    f_ref = None
    for prec in ("exact", "balanced", "fast"):
        calc = AIMNet2Calculator((params, cfg, {"sae": {}}), precision=prec)
        out = calc.eval(data, forces=True)  # compile
        f = np.asarray(out["forces"])
        if f_ref is None:
            f_ref = f
        err = float(np.abs(f - f_ref).max())
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            out = calc.eval(data, forces=True)
            np.asarray(out["energy"])
        dt = (time.perf_counter() - t0) / reps
        print(
            f"facade {prec:9s} {1 / dt:5.2f} calls/s "
            f"({dt * 1e3:6.1f} ms)  dF_vs_exact {err:.2e} eV/A",
            flush=True,
        )
        calc = None


def _md(cfg, params, coord, numbers, cell):
    from aimnetcentral_tpu.builders import system_from_molecules
    from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator
    from aimnetcentral_tpu.dynamics import MDConfig, MDDriver

    system = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}], build_nbmat=False
    )
    md0 = MDConfig(dt_fs=0.5, temperature_K=300.0, thermostat="langevin", skin=0.3)
    drv0 = MDDriver(params, cfg, system, md0)
    drv0.run(50, chunk=25)
    numbers_b = np.asarray(drv0.state.system.numbers)
    real = numbers_b > 0
    coord_eq = np.asarray(drv0.state.coord)[real]
    system_eq = system_from_molecules(
        [{"coord": coord_eq, "numbers": numbers_b[real], "cell": cell}],
        build_nbmat=False,
    )
    drv0 = None
    exact_calc = AIMNet2Calculator((params, cfg, {"sae": {}}))
    for prec in (None, "balanced", "exact"):
        md = MDConfig(
            dt_fs=0.5, temperature_K=300.0, thermostat="langevin", skin=0.3,
            precision=prec,
        )
        drv = MDDriver(params, cfg, system_eq, md)
        # run FIRST: forces prime through the chunk executable (reading
        # .state before run() would compile a second standalone force graph
        # per tier — dynamics/md.py's documented cold-start cost); the
        # velocity-Verlet carry leaves state.forces at the final coords
        drv.run(25, chunk=25)
        t0 = time.time()
        drv.run(100, chunk=25)
        sps = 100 / (time.time() - t0)
        # driver-frame -> caller-frame forces via the carried atom_id map,
        # compared against an exact facade eval AT the evolved geometry
        st = drv.state
        nb = np.asarray(st.system.numbers)
        m = nb > 0
        aid = np.asarray(st.atom_id)
        n_real = int(m.sum())
        coord_now = np.zeros((n_real, 3), np.float32)
        coord_now[aid[m]] = np.asarray(st.coord)[m]
        f_compact = np.zeros((n_real, 3), np.float32)
        f_compact[aid[m]] = np.asarray(st.forces)[m]
        numbers_now = np.zeros((n_real,), nb.dtype)
        numbers_now[aid[m]] = nb[m]
        ref = np.asarray(
            exact_calc.eval(
                {"coord": coord_now, "numbers": numbers_now, "cell": cell},
                forces=True,
            )["forces"]
        )
        err = float(np.abs(f_compact - ref).max())
        print(
            f"MD     {str(prec):9s} {sps:5.2f} steps/s  "
            f"dF_vs_exact {err:.2e} eV/A",
            flush=True,
        )
        drv = None


def main() -> None:
    import jax

    from aimnetcentral_tpu.xla_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from bench import build_box
    from __graft_entry__ import _flagship

    cfg, params = _flagship()
    coord, numbers, cell = build_box(10000)
    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8,))))
    if MODE in ("facade", "both"):
        _facade(cfg, params, {"coord": coord, "numbers": numbers, "cell": cell})
    if MODE in ("md", "both"):
        _md(cfg, params, coord, numbers, cell)


if __name__ == "__main__":
    main()
