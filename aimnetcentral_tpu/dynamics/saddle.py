"""On-device transition-state search: minimum-mode following with Lanczos
HVPs, fused into ``lax.while_loop``.

TPU-native replacement for the reference's Sella workflow
(reference examples/sella_ts.py, ts_opt.py): where the reference feeds dense
analytic Hessians to Sella's P-RFO on the host, here the lowest Hessian
eigenpair comes from a fixed-iteration Lanczos built on matrix-free
Hessian-vector products (one ``jax.jvp`` of the gradient each — the same
HVP primitive as ``calculators/derivatives.py::make_hvp_fn``), and the
dimer-style force inversion + trust-radius translation all run inside one
compiled XLA program.  Memory is O(k * N) for the Lanczos basis instead of
O(N^2) for a dense Hessian, which is what makes 10k-atom TS refinement
feasible at all (SURVEY.md §7.5e).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from aimnetcentral_tpu.models.aimnet2 import AIMNet2Config, aimnet2_apply
from aimnetcentral_tpu.system import System

Array = jax.Array


def lanczos_min_mode(
    hvp: Callable[[Array, Array], Array],
    coord: Array,
    v0: Array,
    real: Array,
    k: int = 15,
) -> tuple[Array, Array]:
    """Lowest Hessian eigenpair by k-step Lanczos with full reorthogonalization.

    ``hvp(coord, v) -> H @ v`` (padding rows must map to zero);
    ``v0`` the starting direction (warm-started across TS steps).
    Returns (lambda_min, v_min) with ``v_min`` unit-normalized over real atoms.
    """
    shape = coord.shape

    def norm(v):
        return jnp.sqrt(jnp.sum(v * v))

    q0 = jnp.where(real, v0, 0.0)
    q0 = q0 / jnp.maximum(norm(q0), 1e-12)

    def body(i, carry):
        qs, alphas, betas, q_prev, q_cur, beta_prev = carry
        w = hvp(coord, q_cur)
        w = jnp.where(real, w, 0.0)
        alpha = jnp.sum(w * q_cur)
        w = w - alpha * q_cur - beta_prev * q_prev
        # full reorthogonalization against the stored basis (k is small)
        proj = jnp.einsum("kni,ni->k", qs, w)
        w = w - jnp.einsum("k,kni->ni", proj, qs)
        beta = norm(w)
        q_next = jnp.where(beta > 1e-10, w / jnp.maximum(beta, 1e-12), q_cur)
        qs = qs.at[i].set(q_cur)
        alphas = alphas.at[i].set(alpha)
        betas = betas.at[i].set(beta)
        return (qs, alphas, betas, q_cur, q_next, beta)

    qs0 = jnp.zeros((k,) + shape, coord.dtype)
    init = (
        qs0,
        jnp.zeros(k, coord.dtype),
        jnp.zeros(k, coord.dtype),
        jnp.zeros_like(q0),
        q0,
        jnp.zeros((), coord.dtype),
    )
    qs, alphas, betas, *_ = jax.lax.fori_loop(0, k, body, init)

    # tridiagonal T: diag=alphas, offdiag=betas[:-1]
    t_mat = (
        jnp.diag(alphas)
        + jnp.diag(betas[:-1], 1)
        + jnp.diag(betas[:-1], -1)
    )
    evals, evecs = jnp.linalg.eigh(t_mat)
    v_min = jnp.einsum("k,kni->ni", evecs[:, 0], qs)
    v_min = jnp.where(real, v_min, 0.0)
    v_min = v_min / jnp.maximum(norm(v_min), 1e-12)
    return evals[0], v_min


def min_mode_search(
    energy_fn: Callable[[Array], Array],
    coord0: Array,
    real: Array,
    fmax: float = 0.01,
    max_steps: int = 200,
    step_size: float = 0.35,
    trust: float = 0.12,
    lanczos_k: int = 15,
    seed: int = 0,
) -> tuple[Array, dict[str, Any]]:
    """Core min-mode (dimer-style) saddle search on an arbitrary energy
    function.  Returns (coord, info).

    The translation rule is the standard minimum-mode inversion: with the
    lowest eigenpair (lam, v), the effective force is
    ``F - 2 (F.v) v`` once a negative mode exists, and pure mode-climbing
    ``-(F.v) v`` while the surface is still locally convex.  Steps are
    steepest-ascent/descent on the effective force with a per-step trust
    radius (max total displacement norm).
    """
    grad_fn = jax.grad(energy_fn)

    def force_of(coord):
        return jnp.where(real, -grad_fn(coord), 0.0)

    def hvp(coord, v):
        _, hv = jax.jvp(grad_fn, (coord,), (v,))
        return jnp.where(real, hv, 0.0)

    v_init = jax.random.normal(jax.random.key(seed), coord0.shape, coord0.dtype)
    v_init = jnp.where(real, v_init, 0.0)

    def cond(carry):
        _coord, _v, step, fnorm, _lam = carry
        return (fnorm > fmax) & (step < max_steps)

    def body(carry):
        coord, v, step, _, _ = carry
        f = force_of(coord)
        lam, v = lanczos_min_mode(hvp, coord, v, real, k=lanczos_k)
        f_par = jnp.sum(f * v) * v
        f_eff = jnp.where(lam < 0.0, f - 2.0 * f_par, -f_par)
        dx = step_size * f_eff
        dx_norm = jnp.sqrt(jnp.sum(dx * dx))
        dx = dx * jnp.minimum(1.0, trust / jnp.maximum(dx_norm, 1e-12))
        coord = coord + jnp.where(real, dx, 0.0)
        fnorm = jnp.sqrt(jnp.max(jnp.sum(f * f, axis=-1)))
        return (coord, v, step + 1, fnorm, lam)

    init = (
        coord0,
        v_init,
        jnp.int32(0),
        jnp.float32(jnp.inf),
        jnp.float32(0.0),
    )

    @jax.jit
    def run(init):
        coord, v, steps, _, lam = jax.lax.while_loop(cond, body, init)
        f_final = force_of(coord)
        fmax_final = jnp.sqrt(jnp.max(jnp.sum(f_final * f_final, axis=-1)))
        lam_final, _ = lanczos_min_mode(hvp, coord, v, real, k=lanczos_k)
        return coord, steps, fmax_final, lam_final

    coord, steps, fmax_final, lam_final = run(init)
    info = {
        "steps": int(steps),
        "fmax": float(fmax_final),
        "lambda_min": float(lam_final),
        "converged": bool(fmax_final <= fmax),
        "is_saddle": bool(fmax_final <= fmax and lam_final < 0.0),
    }
    return coord, info


def ts_search(
    params: Any,
    cfg: AIMNet2Config,
    system: System,
    fmax: float = 0.01,
    max_steps: int = 200,
    **kwargs: Any,
) -> tuple[System, dict[str, Any]]:
    """Transition-state refinement of ``system`` on the model surface
    (BASELINE config 5; replaces reference examples/sella_ts.py)."""
    real = (system.numbers > 0)[:, None]

    def energy_of(coord: Array) -> Array:
        # jvp-of-grad works on the Pallas conv (K3 rules), but the XLA
        # engine is faster for second-order-dominated graphs (the K3
        # tangents fall back to the XLA twin regardless)
        return aimnet2_apply(
            params,
            cfg,
            system.replace(coord=coord),
            sae_external=True,
            conv_engine="xla",
        )["energy"].sum()

    coord, info = min_mode_search(
        energy_of, system.coord, real, fmax=fmax, max_steps=max_steps, **kwargs
    )
    return system.replace(coord=coord), info
