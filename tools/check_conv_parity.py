"""Quick on-device parity check: Pallas stencil conv vs the XLA twin.

Runs the real kernel (fwd + custom_vjp grads, both the plain and the
q-carrying pass) against ``interpret_xla`` math on the same device and
asserts agreement.  Used to validate kernel changes on hardware without
waiting for the interpret-mode CPU suite (minutes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from aimnetcentral_tpu.builders import system_from_molecules
    from aimnetcentral_tpu.kernels.conv_pallas import conv_pass_pallas
    from aimnetcentral_tpu.ops.binned import plan_bins, to_binned_system

    rng = np.random.default_rng(7)
    n, a_box = 300, 16.0
    coord = rng.uniform(0, a_box, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    cell = np.eye(3, dtype=np.float32) * a_box
    sys_c = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}], build_nbmat=False
    )
    grid = plan_bins(cell, n, 5.3, safety=3.0)
    sysb, _perm, ovf = to_binned_system(sys_c, grid)
    assert int(ovf) == 0
    aev = {
        "rc_s": jnp.float32(5.0),
        "eta_s": jnp.float32(14.5),
        "shifts_s": jnp.asarray(np.linspace(0.8, 5.0, 17, dtype=np.float32)[:16]),
    }
    L = sysb.natoms
    a_feat = jnp.asarray(rng.normal(size=(L, 16, 16)).astype(np.float32)) * 0.3
    q = jnp.asarray(rng.normal(size=(L, 1)).astype(np.float32)) * 0.1
    agh_a = jnp.asarray(rng.normal(size=(16, 16, 12)).astype(np.float32)) * 0.2
    agh_q = jnp.asarray(rng.normal(size=(1, 16, 12)).astype(np.float32)) * 0.2

    for tag, qq, agq in (("plain", None, None), ("q-pass", q, agh_q)):

        def loss(a_, c_, interp, qq=qq, agq=agq):
            s2 = sysb.replace(coord=c_)
            oa, oq = conv_pass_pallas(
                s2, aev, a_, qq, agh_a, agq, rc_static=5.0, interpret_xla=interp
            )
            r = (oa * jnp.cos(jnp.arange(oa.size).reshape(oa.shape) * 0.01)).sum()
            if oq is not None:
                r = r + (oq * 0.7).sum()
            return r

        val_p, grads_p = jax.jit(
            jax.value_and_grad(lambda a_, c_: loss(a_, c_, False), argnums=(0, 1))
        )(a_feat, sysb.coord)
        val_x, grads_x = jax.jit(
            jax.value_and_grad(lambda a_, c_: loss(a_, c_, True), argnums=(0, 1))
        )(a_feat, sysb.coord)
        dv = abs(float(val_p) - float(val_x)) / max(1.0, abs(float(val_x)))
        da = float(jnp.max(jnp.abs(grads_p[0] - grads_x[0])))
        dc = float(jnp.max(jnp.abs(grads_p[1] - grads_x[1])))
        sc = float(jnp.max(jnp.abs(grads_x[1])))
        print(f"{tag}: dval_rel={dv:.2e} dgrad_a={da:.2e} dgrad_c={dc:.2e} (|gc|max={sc:.2e})")
        assert dv < 1e-5 and da < 2e-4 and dc < 2e-3 * max(1.0, sc), (dv, da, dc)
    print("conv parity OK")


if __name__ == "__main__":
    main()
