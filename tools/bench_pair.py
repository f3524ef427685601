"""Microbenchmark + hardware parity: the banded half-stencil Pallas pair
sweep vs the XLA half-sweep scan on the production DSF configuration
(coarse LR layout, 10k-atom box).

Times the value and the coordinate+charge gradient of the per-atom pair sums
on the real device (measurement rules in docs/performance.md: lax.scan
repetition inside one jit, D2H sync).

Usage:  python tools/bench_pair.py [n_atoms] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
LR_CUT = 15.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import build_box
    from aimnetcentral_tpu.builders import system_from_molecules
    from aimnetcentral_tpu.kernels.pair_sweep import pair_energy_pallas
    from aimnetcentral_tpu.models.engine_binned import pair_energy_binned
    from aimnetcentral_tpu.ops.binned import plan_bins, plan_lr_bins, to_binned_system

    coord, numbers, cell = build_box(N)
    sys_c = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}], build_nbmat=False
    )
    grid = plan_bins(cell, N, 5.3)
    lr_grid = plan_lr_bins(cell, N, LR_CUT)
    sysb, _perm, ovf = to_binned_system(sys_c, grid, lr_grid=lr_grid)
    assert int(ovf) == 0, int(ovf)
    print(
        f"N={N} sr_bins={grid.nbins} C={grid.capacity} "
        f"lr_bins={lr_grid.nbins} C_lr={lr_grid.capacity}"
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(sysb.natoms,)).astype(np.float32)) * 0.2

    import math

    alpha, rc = 0.2, LR_CUT
    erfc_rc = math.erfc(alpha * rc)
    shift = erfc_rc / rc

    from aimnetcentral_tpu.ops.math import erfc_approx

    def e_fn(d, valid, self_b, cand_b):
        qq = self_b["q"][..., :, None] * cand_b["q"][..., None, :]
        return qq * (erfc_approx(alpha * d) / d - shift)

    ct = jnp.asarray(rng.normal(size=(sysb.natoms,)).astype(np.float32))

    def make_fns(engine):
        def val(coord_, q_):
            os.environ["AIMNET_PAIR_ENGINE"] = engine
            if engine == "pallas":
                return pair_energy_pallas(
                    sysb.replace(coord=coord_), LR_CUT, e_fn, {"q": q_}, "lr"
                )
            return pair_energy_binned(
                sysb.replace(coord=coord_), LR_CUT, e_fn, {"q": q_}, "lr",
                allow_pallas=False,
            )

        def loss(coord_, q_):
            return (val(coord_, q_) * ct).sum()

        grad = jax.grad(loss, argnums=(0, 1))
        return val, grad

    def scan_time(f, args, reps):
        @jax.jit
        def run():
            def body(c_, _):
                out = f(*args)
                leaves = jax.tree_util.tree_leaves(out)
                return c_ + leaves[0].reshape(-1)[0], None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
            return acc

        t0 = time.perf_counter()
        r = run()
        np.asarray(r)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = run()
        np.asarray(r)
        return (time.perf_counter() - t0) / reps * 1e3, compile_s

    results = {}
    for engine in ("xla", "pallas"):
        val, grad = make_fns(engine)
        v = np.asarray(val(sysb.coord, q))
        g = grad(sysb.coord, q)
        g = (np.asarray(g[0]), np.asarray(g[1]))
        results[engine] = (v, g)
        tv, cv = scan_time(val, (sysb.coord, q), REPS)
        tg, cg = scan_time(grad, (sysb.coord, q), REPS)
        print(f"{engine:7s} val {tv:7.2f} ms (compile {cv:5.1f}s)   "
              f"grad {tg:7.2f} ms (compile {cg:5.1f}s)")

    vx, gx = results["xla"]
    vp, gp = results["pallas"]
    sv = max(np.abs(vx).max(), 1e-8)
    sc = max(np.abs(gx[0]).max(), 1e-8)
    sq = max(np.abs(gx[1]).max(), 1e-8)
    print(
        f"parity: dval {np.abs(vp - vx).max() / sv:.2e}  "
        f"dgc {np.abs(gp[0] - gx[0]).max() / sc:.2e}  "
        f"dgq {np.abs(gp[1] - gx[1]).max() / sq:.2e}"
    )


if __name__ == "__main__":
    main()
