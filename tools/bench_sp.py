"""Single-point throughput: AIMNet2Calculator energy+forces calls/sec at
1k/10k atoms (BASELINE.md metric), including all host-side work (layout
reuse, D2H of energy/forces).  Coordinates are jittered per call so the
binned-layout reuse path is exercised the way an optimizer would.

Usage:  python tools/bench_sp.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def main() -> None:
    from bench import build_box
    from __graft_entry__ import _flagship
    from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator

    cfg, params = _flagship()
    calc = AIMNet2Calculator((params, cfg, {"sae": {}}))

    for n in (1000, 10000):
        coord, numbers, cell = build_box(n)
        rng = np.random.default_rng(1)

        def one(i):
            data = {
                "coord": coord + rng.normal(scale=1e-3, size=coord.shape),
                "numbers": numbers,
                "cell": cell,
            }
            out = calc.eval(data, forces=True)
            return float(np.asarray(out["energy"]).sum())

        one(0)  # compile
        t0 = time.perf_counter()
        for i in range(REPS):
            one(i)
        dt = (time.perf_counter() - t0) / REPS
        print(f"N={n:6d}  {1.0 / dt:7.2f} calls/s  ({dt * 1e3:.1f} ms/call)")


if __name__ == "__main__":
    main()
