"""Force-call ablation at bench shapes: time value_and_grad of the binned
energy for model variants (message-pass count, LR head on/off) to attribute
the per-step cost.  Components measured on the real device with lax.scan
repetition (docs/performance.md measurement rules).

Usage:  python tools/ablate_force.py [n_atoms] [reps]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import build_box
    from __graft_entry__ import _flagship
    from aimnetcentral_tpu.builders import system_from_molecules
    from aimnetcentral_tpu.models import aimnet2_apply, aimnet2_init
    from aimnetcentral_tpu.ops.binned import plan_bins, plan_lr_bins, to_binned_system

    coord, numbers, cell = build_box(N)
    sys_c = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}], build_nbmat=False
    )
    cfg_full, _ = _flagship()

    grid = plan_bins(cell, N, 5.3)
    lr_grid = plan_lr_bins(cell, N, 15.0)
    sysb, _perm, ovf = to_binned_system(sys_c, grid, lr_grid=lr_grid)
    assert int(ovf) == 0
    print(f"N={N} sr={grid.nbins}/C{grid.capacity} lr={lr_grid.nbins}/C{lr_grid.capacity}")

    def timed(cfg, label):
        params = aimnet2_init(jax.random.key(0), cfg)

        def energy(coord_):
            out = aimnet2_apply(params, cfg, sysb.replace(coord=coord_))
            return out["energy"].sum()

        g = jax.grad(energy)

        @jax.jit
        def run(c0):
            def body(carry, _):
                return carry + 1e-6 * g(carry), None

            acc, _ = jax.lax.scan(body, c0, None, length=REPS)
            return acc

        t0 = time.perf_counter()
        r = run(sysb.coord)
        np.asarray(r)[:1]
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = run(sysb.coord)
        np.asarray(r)[:1]
        ms = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{label:28s} {ms:7.2f} ms/force-call (compile {compile_s:5.1f}s)")
        return ms

    # DSF variant of the flagship (what bench.py's MD runs after the
    # periodic auto-switch)
    from aimnetcentral_tpu.models.heads import LRCoulombHead

    def with_lr(cfg, method):
        outs = []
        for nm, h in cfg.outputs:
            if isinstance(h, LRCoulombHead):
                h = dataclasses.replace(h, method=method)
            outs.append((nm, h))
        return dataclasses.replace(cfg, outputs=tuple(outs))

    def without_lr(cfg):
        return dataclasses.replace(
            cfg,
            outputs=tuple(
                (nm, h) for nm, h in cfg.outputs if not isinstance(h, LRCoulombHead)
            ),
        )

    cfg_dsf = with_lr(cfg_full, "dsf")
    full = timed(cfg_dsf, "full (3 passes + DSF)")
    nolr = timed(without_lr(cfg_full), "no LR head")
    # 2-pass variant (a 1-pass model has no charge channel): the 3->2 delta
    # is the marginal message-pass cost (conv + MLP + NSE)
    cfg_2p = dataclasses.replace(without_lr(cfg_full), hidden=cfg_full.hidden[-2:])
    two = timed(cfg_2p, "no LR, 2 passes")
    print(f"DSF sweep: {full - nolr:.2f} ms | marginal pass: {nolr - two:.2f} ms")


if __name__ == "__main__":
    main()
