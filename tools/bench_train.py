"""Training-step throughput: energy+forces multi-target training on random
molecular batches (flagship architecture), samples/s and atoms/s on one
chip — the training twin of bench.py's MD numbers.

Layouts:
- ``packed`` (default): molecule-bin binned engine — one molecule per bin,
  radius-0 dense block math, zero per-pair gathers.
- ``indexed``: flat all-pairs neighbor matrices (per-pair gather path).

Usage:  python tools/bench_train.py [mols_per_batch] [atoms_per_mol] [reps] [layout]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

N_MOL = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_ATOM = int(sys.argv[2]) if len(sys.argv) > 2 else 48
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
LAYOUT = sys.argv[4] if len(sys.argv) > 4 else "packed"


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from aimnetcentral_tpu.builders import system_from_molecules, system_molecule_bins
    from aimnetcentral_tpu.train.loss import LossConfig, MTLoss
    from aimnetcentral_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg, params = _flagship()
    rng = np.random.default_rng(0)

    def mol():
        n = N_ATOM
        coord = rng.uniform(0, (n ** (1 / 3)) * 2.6, size=(n, 3)).astype(np.float32)
        numbers = rng.choice([1, 6, 7, 8], size=n, p=[0.5, 0.35, 0.05, 0.1])
        return {"coord": coord, "numbers": numbers}

    mols = [mol() for _ in range(N_MOL)]
    if LAYOUT == "packed":
        system = system_molecule_bins(mols)
    else:
        system = system_from_molecules(
            mols, cutoff=float(cfg.aev.rc_s), max_neighbors=64
        )
    batch = jax.tree.map(lambda x: x[None] if hasattr(x, "ndim") else x, system)
    labels = {
        "energy": jnp.asarray(
            rng.normal(size=(1, system.num_mol)).astype(np.float32)
        ),
        "forces": jnp.asarray(
            rng.normal(size=(1,) + system.coord.shape).astype(np.float32) * 0.1
        ),
        "charges": jnp.asarray(
            rng.normal(size=(1,) + system.numbers.shape).astype(np.float32) * 0.1
        ),
    }

    loss = MTLoss(LossConfig())
    opt = make_optimizer(learning_rate=1e-3)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(cfg, loss, opt, with_forces=True))

    t0 = time.perf_counter()
    state, metrics = step(state, batch, labels)
    np.asarray(metrics["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        state, metrics = step(state, batch, labels)
    np.asarray(metrics["loss"])
    dt = (time.perf_counter() - t0) / REPS
    n_atoms = N_MOL * N_ATOM
    print(
        f"{LAYOUT} batch={N_MOL}x{N_ATOM} atoms: {dt * 1e3:7.1f} ms/step  "
        f"{N_MOL / dt:8.1f} mol/s  {n_atoms / dt:9.0f} atoms/s  "
        f"(compile {compile_s:.1f}s, loss {float(np.asarray(metrics['loss'])):.4f})"
    )


if __name__ == "__main__":
    main()
