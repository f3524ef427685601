"""Drive every BASELINE.json eval config end-to-end and record outputs.

Configs (BASELINE.json):
  1. taxol.xyz single-point energy+forces+charges (AIMNet2Calculator)
  2. taxol geometry relaxation (on-device FIRE; the reference uses ASE BFGS)
  3. periodic 2019828.cif crystal: Ewald (or PME) Coulomb + D3 + stress
  4. 10k-atom periodic NVT MD  -> covered by bench.py (the headline bench)
  5. TS refinement with matrix-free HVPs (min-mode Lanczos; the reference
     uses Sella)

Weights: pass ``--model <artifact|registry-name>`` to run a released model
(requires network or a warm cache); default is the random-init flagship so
the full pipeline is exercisable offline — outputs are then structural
evidence (shapes/finiteness/convergence), not chemistry.

Writes ``baseline_outputs.json`` next to this script.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

REF_EXAMPLES = "/root/reference/examples"


def get_calc(model: str | None):
    import dataclasses

    import jax

    from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator
    from aimnetcentral_tpu.models import aimnet2_init
    from aimnetcentral_tpu.models.heads import DFTD3Head

    if model:
        return AIMNet2Calculator(model)
    from __graft_entry__ import _flagship

    cfg, _ = _flagship()
    # append D3 dispersion (wB97M-D3BJ parameters, the released models'
    # functional) so config 3 exercises the full Ewald/PME + D3 + stress stack
    cfg = dataclasses.replace(
        cfg,
        outputs=cfg.outputs + (("dftd3", DFTD3Head(s8=0.3908, a1=0.566, a2=3.128)),),
    )
    params = aimnet2_init(jax.random.key(0), cfg)
    return AIMNet2Calculator((params, cfg, {"sae": {}}))


def config1_taxol_sp(calc) -> dict:
    from aimnetcentral_tpu.io import read_xyz

    coord, numbers = read_xyz(os.path.join(REF_EXAMPLES, "taxol.xyz"))
    t0 = time.time()
    out = calc({"coord": coord, "numbers": numbers, "charge": 0.0}, forces=True)
    return {
        "n_atoms": len(numbers),
        "energy_eV": float(out["energy"][0]),
        "max_force_eV_A": float(np.abs(out["forces"]).max()),
        "net_charge_e": float(out["charges"].sum()),
        "wall_s": round(time.time() - t0, 2),
    }


def config2_taxol_relax(calc, max_steps: int) -> dict:
    from aimnetcentral_tpu.dynamics import fire_relax
    from aimnetcentral_tpu.io import read_xyz

    coord, numbers = read_xyz(os.path.join(REF_EXAMPLES, "taxol.xyz"))
    system = calc.prepare_system({"coord": coord, "numbers": numbers})
    e0 = float(calc({"coord": coord, "numbers": numbers})["energy"][0])
    t0 = time.time()
    relaxed, info = fire_relax(
        calc.params, calc.cfg, system, fmax=0.05, max_steps=max_steps
    )
    e1 = float(
        calc({"coord": np.asarray(relaxed.coord)[: len(numbers)], "numbers": numbers})[
            "energy"
        ][0]
    )
    return {
        "steps": info["steps"],
        "fmax_eV_A": info["fmax"],
        "converged": info["converged"],
        "energy_initial_eV": e0,
        "energy_final_eV": e1,
        "energy_decreased": e1 < e0,
        "wall_s": round(time.time() - t0, 2),
    }


def config3_crystal(calc, method: str) -> dict:
    from aimnetcentral_tpu.io import read_cif

    s = read_cif(os.path.join(REF_EXAMPLES, "2019828.cif"))
    calc.set_lrcoulomb_method(method)
    t0 = time.time()
    out = calc(
        {"coord": s["coord"], "numbers": s["numbers"], "cell": s["cell"]},
        forces=True,
        stress=True,
    )
    res = {
        "n_atoms": len(s["numbers"]),
        "coulomb_method": method,
        "energy_eV": float(out["energy"][0]),
        "max_force_eV_A": float(np.abs(out["forces"]).max()),
        "stress_trace_eV_A3": float(np.trace(np.asarray(out["stress"])[0])),
        "wall_s": round(time.time() - t0, 2),
    }
    calc.set_lrcoulomb_method("simple")
    return res


def config5_ts_search(calc, max_steps: int) -> dict:
    from aimnetcentral_tpu.dynamics import ts_search

    # HCN <-> HNC -like bent arrangement as the TS starting guess
    coord = np.array(
        [[0.0, 0.0, 0.0], [1.16, 0.0, 0.0], [0.7, 1.15, 0.0]], dtype=np.float32
    )
    numbers = np.array([6, 7, 1], dtype=np.int64)
    system = calc.prepare_system({"coord": coord, "numbers": numbers})
    t0 = time.time()
    _, info = ts_search(
        calc.params, calc.cfg, system, fmax=0.02, max_steps=max_steps, lanczos_k=8
    )
    info["wall_s"] = round(time.time() - t0, 2)
    return info


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="artifact path or registry name")
    ap.add_argument("--coulomb", default="ewald", choices=["ewald", "pme", "dsf"])
    ap.add_argument("--max-steps", type=int, default=200)
    args = ap.parse_args()

    calc = get_calc(args.model)
    results = {"model": args.model or "random-init flagship"}
    results["config1_taxol_sp"] = config1_taxol_sp(calc)
    print("config1", json.dumps(results["config1_taxol_sp"]))
    results["config2_taxol_relax"] = config2_taxol_relax(calc, args.max_steps)
    print("config2", json.dumps(results["config2_taxol_relax"]))
    results["config3_crystal"] = config3_crystal(calc, args.coulomb)
    print("config3", json.dumps(results["config3_crystal"]))
    results["config5_ts_search"] = config5_ts_search(calc, args.max_steps)
    print("config5", json.dumps(results["config5_ts_search"]))

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baseline_outputs.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
