"""Microbenchmark: the fused Pallas stencil-conv kernel at 10k-atom shapes.

Times forward and forward+backward per conv pass on the real device,
isolating the kernel from the rest of the MD step (measurement rules in
docs/performance.md: one process, lax.scan repetition inside one jit, D2H
sync).  Run variants via AIMNET_CONV_* env knobs.

Usage:  python tools/bench_conv.py [n_atoms] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import build_box
    from aimnetcentral_tpu.builders import system_from_molecules
    from aimnetcentral_tpu.kernels.conv_pallas import conv_pass_pallas
    from aimnetcentral_tpu.ops.binned import plan_bins, to_binned_system

    coord, numbers, cell = build_box(N)
    sys_c = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}], build_nbmat=False
    )
    grid = plan_bins(cell, N, 5.0 + 0.3)
    sysb, _perm, ovf = to_binned_system(sys_c, grid)
    assert int(ovf) == 0, int(ovf)
    print(
        f"n={N} bins={grid.nbins} C={grid.capacity} B={grid.total_bins} "
        f"L={sysb.natoms}",
        flush=True,
    )

    rng = np.random.default_rng(0)
    L = sysb.natoms
    aev = {
        "rc_s": jnp.float32(5.0),
        "eta_s": jnp.float32((1.0 / ((5.0 - 0.8) / 16)) ** 2),
        "shifts_s": jnp.asarray(
            np.linspace(0.8, 5.0, 17, dtype=np.float32)[:16]
        ),
    }
    a_feat = jnp.asarray(rng.normal(size=(L, 16, 16)).astype(np.float32)) * 0.3
    q1 = jnp.asarray(rng.normal(size=(L, 1)).astype(np.float32)) * 0.1
    agh_a = jnp.asarray(rng.normal(size=(16, 16, 12)).astype(np.float32)) * 0.2
    agh_q = jnp.asarray(rng.normal(size=(1, 16, 12)).astype(np.float32)) * 0.2
    coord_b = sysb.coord

    def run(label, fn, *args):
        jfn = jax.jit(fn)
        t0 = time.time()
        out = jfn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        compile_s = time.time() - t0
        t0 = time.time()
        out = jfn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ms = (time.time() - t0) * 1e3 / REPS
        print(f"{label:32s} {ms:8.2f} ms/pass   (compile {compile_s:.1f} s)", flush=True)
        return ms

    def chain(step):
        """REPS-iteration scan, each iteration data-dependent on the last."""

        def body(carry, _):
            a, c = carry
            val = step(a, c)
            eps = 1e-12 * val
            return (a + eps, c + eps), None

        def fn(a, c):
            (a_out, _), _ = jax.lax.scan(body, (a, c), None, length=REPS)
            # scalar result: the relay D2H is slow (~MB/ms) — never fetch
            # a full tensor inside a timing loop
            return a_out.sum()

        return fn

    for tag, q, agq in (("f16/gamma8 (pass0-like)", None, None),
                        ("f32-cols/gamma4 (q pass)", q1, agh_q)):
        def fwd(a, c, q=q, agq=agq):
            s2 = sysb.replace(coord=c)
            oa, oq = conv_pass_pallas(s2, aev, a, q, agh_a, agq, rc_static=5.0)
            r = oa.sum()
            return r + (oq.sum() if oq is not None else 0.0)

        def fwdbwd(a, c, fwd=fwd):
            val, g = jax.value_and_grad(fwd, argnums=(0, 1))(a, c)
            return val + g[0].sum() + g[1].sum()

        run(f"fwd      {tag}", chain(fwd), a_feat, coord_b)
        run(f"fwd+bwd  {tag}", chain(fwdbwd), a_feat, coord_b)


if __name__ == "__main__":
    main()
