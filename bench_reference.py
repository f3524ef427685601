"""Measured PyTorch-reference baseline on the IDENTICAL benchmark box.

BASELINE.md requires the rebuild to measure its own reference baseline (the
reference publishes no throughput numbers).  This runs the reference package
(/root/reference, torch CPU — no CUDA in this image) on the same periodic
box bench.py uses, through the reference's own model stack:

- model built from aimnet/models/aimnet2.yaml (the same architecture as this
  repo's flagship; random weights — throughput does not depend on weights),
- packed mode-1 layout with a precomputed neighbor matrix + PBC shifts
  (the CUDA neighbor_list kernel is absent on CPU; NL build time is NOT
  charged to the reference),
- DSF Coulomb through the reference's differentiable pure-torch path
  (`training_derivatives=True`, aimnet/modules/lr.py:947 — its own CPU
  fallback; the CUDA DSF kernel is stubbed exactly as in tests/conftest.py),
- one energy+forces evaluation per "step" (the dominant per-MD-step cost;
  integration and NL maintenance are excluded, which favors the reference).

Prints one JSON line and records the rate into bench_baseline.json under
"reference_cpu_sp" (keyed by atom count) for bench.py's vs-reference ratio.

Usage: BENCH_ATOMS=2000 python bench_reference.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np

N_ATOMS = int(os.environ.get("BENCH_ATOMS", "2000"))
N_CALLS = int(os.environ.get("BENCH_CALLS", "10"))
BASELINE_FILE = os.path.join(REPO, "bench_baseline.json")
REFERENCE_ROOT = "/root/reference"


def _install_reference_stubs() -> None:
    """Stub the CUDA kernel seams (same as tests/conftest.py)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "aimnet.kernels" not in sys.modules:
        kern = types.ModuleType("aimnet.kernels")
        kern.WARP_CUDA_AVAILABLE = False
        kern.conv_sv_2d_sp = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("warp kernel unavailable")
        )
        kern.load_ops = lambda: None
        sys.modules["aimnet.kernels"] = kern
    if "nvalchemiops" not in sys.modules:
        def _unavailable(*a, **k):
            raise RuntimeError("nvalchemiops unavailable on CPU")

        nv = types.ModuleType("nvalchemiops")
        nv_neighbors = types.ModuleType("nvalchemiops.neighbors")
        nv_neighbors.NeighborOverflowError = type(
            "NeighborOverflowError", (Exception,), {}
        )
        nv_torch = types.ModuleType("nvalchemiops.torch")
        nv_torch_nb = types.ModuleType("nvalchemiops.torch.neighbors")
        nv_torch_nb.neighbor_list = _unavailable
        nv_inter = types.ModuleType("nvalchemiops.torch.interactions")
        nv_disp = types.ModuleType("nvalchemiops.torch.interactions.dispersion")
        nv_disp.dftd3 = _unavailable
        nv_elec = types.ModuleType("nvalchemiops.torch.interactions.electrostatics")
        nv_elec.dsf_coulomb = _unavailable
        nv_elec.ewald_summation = _unavailable
        nv_elec.particle_mesh_ewald = _unavailable
        for name, mod in {
            "nvalchemiops": nv,
            "nvalchemiops.neighbors": nv_neighbors,
            "nvalchemiops.torch": nv_torch,
            "nvalchemiops.torch.neighbors": nv_torch_nb,
            "nvalchemiops.torch.interactions": nv_inter,
            "nvalchemiops.torch.interactions.dispersion": nv_disp,
            "nvalchemiops.torch.interactions.electrostatics": nv_elec,
        }.items():
            sys.modules[name] = mod


def neighbor_matrix_pbc(coord: np.ndarray, box: float, cutoff: float):
    """Fixed-capacity (N, M) neighbor matrix + integer PBC shifts via a
    periodic KD-tree (cubic box).  Padding index = N (the trailing pad atom).
    """
    from scipy.spatial import cKDTree

    n = len(coord)
    wrapped = coord % box
    tree = cKDTree(wrapped, boxsize=box)
    pairs = tree.query_pairs(cutoff, output_type="ndarray")  # (P, 2), i<j
    i, j = pairs[:, 0], pairs[:, 1]
    # both directions
    src = np.concatenate([i, j])
    dst = np.concatenate([j, i])
    # MIC integer shift: dst + shift*box closest to src
    dvec = wrapped[src] - wrapped[dst]
    shift = np.round(dvec / box).astype(np.int64)

    order = np.argsort(src, kind="stable")
    src, dst, shift = src[order], dst[order], shift[order]
    counts = np.bincount(src, minlength=n)
    m = int(counts.max())
    nbmat = np.full((n + 1, m), n, dtype=np.int64)
    shifts = np.zeros((n + 1, m, 3), dtype=np.float32)
    slot = np.zeros(n, dtype=np.int64)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    for a in range(n):
        s, e = starts[a], starts[a + 1]
        nbmat[a, : e - s] = dst[s:e]
        shifts[a, : e - s] = shift[s:e]
    del slot
    return nbmat, shifts


def main() -> None:
    _install_reference_stubs()
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    from aimnet.config import build_module, load_yaml

    cfg = load_yaml(os.path.join(REFERENCE_ROOT, "aimnet", "models", "aimnet2.yaml"))
    cfg = dict(cfg)
    # periodic box: the reference calculator auto-switches simple -> DSF
    # (calculator.py:1044-1062); build the model in that effective state
    cfg["kwargs"]["outputs"]["lrcoulomb"]["kwargs"]["method"] = "dsf"
    torch.manual_seed(0)
    model = build_module(cfg)
    model.eval()

    # force the differentiable pure-torch DSF path (the CUDA kernel is absent)
    for m in model.outputs.children():
        if m.__class__.__name__ == "LRCoulomb":
            orig = m.forward
            m.forward = lambda data, _orig=orig, **kw: _orig(
                data, training_derivatives=True
            )

    from bench import build_box

    coord_np, numbers_np, cell_np = build_box(N_ATOMS)
    box = float(cell_np[0, 0])
    sr_cut = 5.0
    lr_cut = float(os.environ.get("BENCH_REF_LR_CUT", "15.0"))

    t0 = time.time()
    nbmat, shifts = neighbor_matrix_pbc(coord_np, box, sr_cut)
    nbmat_lr, shifts_lr = neighbor_matrix_pbc(coord_np, box, lr_cut)
    nl_s = time.time() - t0

    n = N_ATOMS
    coord = torch.zeros((n + 1, 3), dtype=torch.float32)
    coord[:n] = torch.from_numpy(coord_np % box)
    numbers = torch.zeros(n + 1, dtype=torch.int64)
    numbers[:n] = torch.from_numpy(numbers_np.astype(np.int64))
    base = {
        "numbers": numbers,
        "charge": torch.zeros(1, dtype=torch.float32),
        "mol_idx": torch.zeros(n + 1, dtype=torch.int64),
        "cell": torch.from_numpy(cell_np),
        "nbmat": torch.from_numpy(nbmat),
        "shifts": torch.from_numpy(shifts),
        "nbmat_lr": torch.from_numpy(nbmat_lr),
        "shifts_lr": torch.from_numpy(shifts_lr),
    }

    def one_call(jitter: float) -> float:
        c = coord.clone()
        c[:n] += jitter  # avoid any identity caching
        c.requires_grad_(True)
        data = dict(base)
        data["coord"] = c
        out = model(data)
        e = out["energy"].sum()
        (g,) = torch.autograd.grad(e, c)
        return float(e) + float(g[0, 0])

    one_call(0.0)  # warmup
    t0 = time.time()
    for k in range(N_CALLS):
        one_call(1e-4 * (k + 1))
    elapsed = time.time() - t0
    rate = N_CALLS / elapsed

    result = {
        "metric": f"reference_cpu_energy_forces_calls_per_sec_{N_ATOMS}atoms",
        "value": round(rate, 4),
        "unit": "calls/s",
        "atoms": N_ATOMS,
        "calls": N_CALLS,
        "nl_build_s": round(nl_s, 2),
        "torch_threads": torch.get_num_threads(),
        "note": "torch CPU; NL prebuilt (not charged); DSF via the reference's pure-torch path",
    }
    print(json.dumps(result))

    pins = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            pins = json.load(f)
    pins.setdefault("reference_cpu_sp", {})[str(N_ATOMS)] = round(rate, 4)
    with open(BASELINE_FILE, "w") as f:
        json.dump(pins, f, indent=1)


if __name__ == "__main__":
    main()
