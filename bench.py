"""Headline benchmark: NVT MD steps/sec on a 10k-atom periodic organic box
(BASELINE.json config 4), fully on-device (lax.scan + cell-list rebuilds).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baselines (bench_baseline.json, PINNED — never overwritten by this script):
- "pinned": this repo's round-1 XLA-engine numbers per atom count
  (10k: 1.901 steps/s, 2k: 7.392 steps/s).  ``vs_baseline`` is the
  progression ratio against the matching pin.
- "reference_cpu_sp": measured PyTorch-reference energy+forces calls/s on
  the identical box (bench_reference.py; torch CPU — this image has no
  CUDA).  ``vs_reference_cpu`` compares our MD steps/s against it (one
  force call per MD step is the dominant cost; our number additionally
  includes integration + neighbor maintenance, so the ratio is
  conservative).  The reference publishes no GPU numbers (BASELINE.md).

Config: BENCH_ATOMS (default 10000 — the BASELINE north-star box; 2000 for
quick iteration), BENCH_STEPS, BENCH_ENSEMBLE, AIMNET_CONV_ENGINE
(default auto = fused Pallas stencil conv on TPU).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_ATOMS = int(os.environ.get("BENCH_ATOMS", "10000"))
N_STEPS = int(os.environ.get("BENCH_STEPS", "100"))
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def build_box(n_atoms: int, density: float = 0.09, seed: int = 0):
    """Random organic-ish periodic box (CHNO, ~0.09 atoms/Angstrom^3) with a
    minimum-distance jitter-relax so initial forces are sane."""
    rng = np.random.default_rng(seed)
    a = (n_atoms / density) ** (1.0 / 3.0)
    # jittered lattice placement -> guaranteed minimum separation
    m = int(np.ceil(n_atoms ** (1.0 / 3.0)))
    spacing = a / m
    grid = np.stack(
        np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3)[:n_atoms]
    coord = (grid + 0.5) * spacing + rng.uniform(-0.15, 0.15, size=(n_atoms, 3)) * spacing
    numbers = rng.choice([1, 6, 7, 8], size=n_atoms, p=[0.5, 0.35, 0.05, 0.1])
    cell = np.eye(3) * a
    return coord.astype(np.float32), numbers.astype(np.int32), cell.astype(np.float32)


def main() -> None:
    import jax

    from aimnetcentral_tpu.xla_cache import enable_persistent_cache

    enable_persistent_cache()

    from aimnetcentral_tpu.builders import system_from_molecules
    from aimnetcentral_tpu.dynamics import MDConfig, MDDriver
    from __graft_entry__ import _flagship

    cfg, params = _flagship()
    ensemble = int(os.environ.get("BENCH_ENSEMBLE", "0"))
    if ensemble > 1:
        import jax as _jax

        from aimnetcentral_tpu.calculators.ensemble import stack_params
        from aimnetcentral_tpu.models import aimnet2_init

        params = stack_params(
            [aimnet2_init(_jax.random.key(i), cfg) for i in range(ensemble)]
        )

    coord, numbers, cell = build_box(N_ATOMS)
    # the MD driver builds its own binned layout: skip the host NL entirely
    # (a brute-force 10k-atom host build costs minutes and is never used)
    system = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}],
        build_nbmat=False,
    )

    # skin 0.3: the finer 9-bin grid at 10k lands on capacity 32 — exact
    # (8,128) f32 tiles with ~4.5-sigma occupancy headroom (no mid-run
    # regrow); on-device rebuilds cost ~3 ms, so the short skin is free
    md = MDConfig(dt_fs=0.5, temperature_K=300.0, thermostat="langevin", skin=0.3)
    chunk = max(10, N_STEPS // 4)
    t0 = time.time()
    # equilibration pass: the synthetic box's first steps are violent (large
    # initial forces); density spikes there can trigger a capacity regrow
    # that is NOT representative of steady-state throughput.  Run the
    # transient out, then RE-PLAN the grid from equilibrated coordinates
    # (exactly what a production MD user does) and time the steady state.
    drv0 = MDDriver(params, cfg, system, md, ensemble=ensemble > 1)
    drv0.run(2 * chunk, chunk=chunk)
    # map the (possibly binned) carried state back to a compact system
    numbers_b = np.asarray(drv0.state.system.numbers)
    coord_b = np.asarray(drv0.state.coord)
    real = numbers_b > 0
    system_eq = system_from_molecules(
        [{"coord": coord_b[real], "numbers": numbers_b[real], "cell": cell}],
        build_nbmat=False,
    )
    drv = MDDriver(params, cfg, system_eq, md, ensemble=ensemble > 1)
    # warmup with the SAME chunk size as the timed run (one compile)
    drv.run(chunk, chunk=chunk)
    compile_s = time.time() - t0

    t0 = time.time()
    drv.run(N_STEPS, chunk=chunk)
    elapsed = time.time() - t0
    steps_per_sec = N_STEPS / elapsed

    pins = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            pins = json.load(f)
    pin = pins.get("pinned", {}).get(str(N_ATOMS))
    ref = pins.get("reference_cpu_sp", {}).get(str(N_ATOMS))

    result = {
        "metric": f"nvt_md_steps_per_sec_{N_ATOMS}atoms",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / pin, 3) if pin else 1.0,
        "atoms": N_ATOMS,
        "steps": N_STEPS,
        "compile_s": round(compile_s, 1),
        "conv_engine": os.environ.get("AIMNET_CONV_ENGINE", "auto"),
        "conv_precision": os.environ.get("AIMNET_CONV_PRECISION", "f32"),
        "device": str(jax.devices()[0]),
        "ns_per_day": round(steps_per_sec * 0.5e-6 * 86400, 4),
    }
    if pin:
        result["baseline_round1_steps_per_sec"] = pin
    if ref:
        result["vs_reference_cpu"] = round(steps_per_sec / ref, 2)
        result["reference_cpu_calls_per_sec"] = ref
    print(json.dumps(result))


if __name__ == "__main__":
    main()
