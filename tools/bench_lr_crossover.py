"""Ewald vs batched-PME crossover: energy+forces wall time per call at
10k/30k/60k/100k atoms on one chip (VERDICT r4 next #8 — measure the
"PME pays off >~50k atoms" claim in models/pme.py instead of asserting it).

Method: AIMNet2Calculator with the flagship architecture, LR Coulomb method
switched between "ewald" and "pme" (`set_lrcoulomb_method`), identical
random organic boxes (bench.build_box).  Each (size, method) cell reports
median ms/call over REPS force evals (coordinates jittered per call so the
layout-reuse path is exercised) — or OOM/FAIL when the method cannot run at
that size (the Ewald phase matrix is (N, K); at 100k atoms K ~ 3e4 makes it
~12 GB and the method is expected to fall over, which IS the crossover
result).

Usage:  python tools/bench_lr_crossover.py [reps] [sizes...]
Writes a markdown table to stdout (docs/long_range.md cites it).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
SIZES = [int(s) for s in sys.argv[2:]] or [10_000, 30_000, 60_000, 100_000]


def main() -> None:
    from bench import build_box
    from __graft_entry__ import _flagship
    from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator
    from aimnetcentral_tpu.xla_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg, params = _flagship()

    rows = []
    for n in SIZES:
        coord, numbers, cell = build_box(n)
        rng = np.random.default_rng(1)
        cells = {}
        for method in ("ewald", "pme"):
            calc = AIMNet2Calculator((params, cfg, {"sae": {}}))
            calc.set_lrcoulomb_method(method)
            try:
                def one():
                    data = {
                        "coord": coord
                        + rng.normal(scale=1e-3, size=coord.shape).astype(
                            np.float32
                        ),
                        "numbers": numbers,
                        "cell": cell,
                    }
                    out = calc.eval(data, forces=True)
                    return float(np.asarray(out["energy"]).sum())

                one()  # compile
                times = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    one()
                    times.append(time.perf_counter() - t0)
                ms = 1e3 * float(np.median(times))
                cells[method] = f"{ms:.0f}"
                print(
                    f"[crossover] N={n} {method}: {ms:.0f} ms/call",
                    file=sys.stderr, flush=True,
                )
            except Exception as e:  # OOM / compile failure IS a data point
                kind = "OOM" if "RESOURCE_EXHAUSTED" in str(e) else "FAIL"
                cells[method] = kind
                print(
                    f"[crossover] N={n} {method}: {kind} ({str(e)[:120]})",
                    file=sys.stderr, flush=True,
                )
            finally:
                calc = None
        rows.append((n, cells.get("ewald", "-"), cells.get("pme", "-")))

    print("| atoms | Ewald ms/call | PME ms/call |")
    print("|---|---|---|")
    for n, ew, pm in rows:
        print(f"| {n:,} | {ew} | {pm} |")


if __name__ == "__main__":
    main()
