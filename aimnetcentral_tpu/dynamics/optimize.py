"""On-device geometry relaxation: FIRE fused into ``lax.while_loop``.

Native replacement for the BFGS-over-calculator loop of the reference's ASE
workflow (reference examples/ase_opt.py, aimnet/calculators/aimnet2ase.py):
the entire relaxation — forces, FIRE velocity mixing, adaptive timestep,
convergence test — is one compiled XLA program; the host gets back the final
geometry and step count.  (The ASE adapter in ``calculators/ase_adapter.py``
still works with external ASE optimizers when ASE is installed.)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aimnetcentral_tpu.models.aimnet2 import AIMNet2Config, aimnet2_apply
from aimnetcentral_tpu.system import System

Array = jax.Array


def fire_relax(
    params: Any,
    cfg: AIMNet2Config,
    system: System,
    fmax: float = 0.05,
    max_steps: int = 1000,
    dt_start: float = 0.1,
    dt_max: float = 0.5,
    n_min: int = 5,
    f_inc: float = 1.1,
    f_dec: float = 0.5,
    alpha_start: float = 0.1,
    f_alpha: float = 0.99,
) -> tuple[System, dict[str, Any]]:
    """FIRE relaxation (Bitzek et al. 2006).  Returns (relaxed system, info).

    Note: neighbor matrices are NOT rebuilt inside the loop (relaxations move
    atoms far less than the Verlet skin); for large displacements re-invoke
    with rebuilt neighbors.
    """
    real = (system.numbers > 0)[:, None]

    def force_of(coord: Array) -> Array:
        g = jax.grad(
            lambda c: aimnet2_apply(
                params, cfg, system.replace(coord=c), sae_external=True
            )["energy"].sum()
        )(coord)
        return jnp.where(real, -g, 0.0)

    def cond(carry):
        _coord, _v, _dt, _alpha, _npos, step, fnorm = carry
        return (fnorm > fmax) & (step < max_steps)

    def body(carry):
        coord, v, dt, alpha, npos, step, _ = carry
        f = force_of(coord)
        p = jnp.sum(f * v)
        f_unit = f / jnp.maximum(jnp.linalg.norm(f), 1e-10)
        v_mixed = (1.0 - alpha) * v + alpha * jnp.linalg.norm(v) * f_unit

        uphill = p <= 0.0
        v = jnp.where(uphill, 0.0, v_mixed)
        dt = jnp.where(
            uphill, dt * f_dec, jnp.where(npos > n_min, jnp.minimum(dt * f_inc, dt_max), dt)
        )
        alpha = jnp.where(
            uphill, alpha_start, jnp.where(npos > n_min, alpha * f_alpha, alpha)
        )
        npos = jnp.where(uphill, 0, npos + 1)

        v = v + dt * f
        coord = coord + dt * v
        fnorm = jnp.sqrt(jnp.max(jnp.sum(f * f, axis=-1)))
        return (coord, v, dt, alpha, npos, step + 1, fnorm)

    init = (
        system.coord,
        jnp.zeros_like(system.coord),
        jnp.float32(dt_start),
        jnp.float32(alpha_start),
        jnp.int32(0),
        jnp.int32(0),
        jnp.float32(jnp.inf),
    )

    @jax.jit
    def run(init):
        coord, _v, _dt, _alpha, _npos, steps, fnorm = jax.lax.while_loop(
            cond, body, init
        )
        f_final = force_of(coord)
        fmax_final = jnp.sqrt(jnp.max(jnp.sum(f_final * f_final, axis=-1)))
        return coord, steps, fmax_final

    coord, steps, fmax_final = run(init)
    info = {
        "steps": int(steps),
        "fmax": float(fmax_final),
        "converged": bool(fmax_final <= fmax),
    }
    return system.replace(coord=coord), info
