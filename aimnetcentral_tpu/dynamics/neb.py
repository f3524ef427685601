"""On-device batched NEB (climbing-image nudged elastic band).

Beyond-reference capability: the reference delegates reaction-path searches
to external drivers (PySisyphus, ORCA NEB-TS — reference
docs/external/pysis.md, docs/advanced/reaction_paths.md); here the ENTIRE
band evaluates as one padded batch per iteration (K images = K molecules in
the packed gas-phase layout = one forward+backward on the MXU), and the
FIRE update, tangent projection, spring forces, and climbing-image switch
all run inside one ``lax.while_loop`` — zero host round trips during the
optimization.

Methods: improved tangent (Henkelman & Jonsson, J. Chem. Phys. 113, 9978,
2000) and climbing image (Henkelman, Uberuaga & Jonsson, J. Chem. Phys.
113, 9901, 2000), with a global FIRE integrator (Bitzek et al. 2006) over
the interior images.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from aimnetcentral_tpu.models.aimnet2 import AIMNet2Config, aimnet2_apply
from aimnetcentral_tpu.system import System

Array = jax.Array


def linear_band(coord_r: Array, coord_p: Array, n_images: int) -> Array:
    """(K, N, 3) linear interpolation between reactant and product,
    endpoints included."""
    w = jnp.linspace(0.0, 1.0, n_images)[:, None, None]
    return (1.0 - w) * coord_r[None] + w * coord_p[None]


def _tangents(band: Array, energies: Array) -> Array:
    """Improved-tangent estimate for the K-2 interior images
    (Henkelman & Jonsson 2000, eqs. 8-11).  Returns unit tangents
    (K-2, N, 3)."""
    tau_plus = band[2:] - band[1:-1]
    tau_minus = band[1:-1] - band[:-2]
    e_prev, e_i, e_next = energies[:-2], energies[1:-1], energies[2:]

    de_max = jnp.maximum(jnp.abs(e_next - e_i), jnp.abs(e_prev - e_i))
    de_min = jnp.minimum(jnp.abs(e_next - e_i), jnp.abs(e_prev - e_i))
    uphill = e_next > e_prev
    mixed = jnp.where(
        uphill[:, None, None],
        tau_plus * de_max[:, None, None] + tau_minus * de_min[:, None, None],
        tau_plus * de_min[:, None, None] + tau_minus * de_max[:, None, None],
    )
    tau = jnp.where(
        ((e_next > e_i) & (e_i > e_prev))[:, None, None],
        tau_plus,
        jnp.where(((e_next < e_i) & (e_i < e_prev))[:, None, None], tau_minus, mixed),
    )
    norm = jnp.sqrt(jnp.sum(tau * tau, axis=(1, 2), keepdims=True))
    return tau / jnp.maximum(norm, 1e-10)


def neb_forces(
    band: Array,
    energies: Array,
    f_true: Array,
    k_spring: float,
    climb: bool,
) -> Array:
    """Project true forces into NEB forces.  ``band``/``f_true`` are
    (K, N, 3), ``energies`` (K,).  Endpoint rows come back zero (frozen)."""
    tau = _tangents(band, energies)
    f_int = f_true[1:-1]
    f_par = jnp.sum(f_int * tau, axis=(1, 2), keepdims=True)
    f_perp = f_int - f_par * tau

    d_plus = jnp.sqrt(jnp.sum((band[2:] - band[1:-1]) ** 2, axis=(1, 2)))
    d_minus = jnp.sqrt(jnp.sum((band[1:-1] - band[:-2]) ** 2, axis=(1, 2)))
    f_spring = k_spring * (d_plus - d_minus)[:, None, None] * tau

    f_neb = f_perp + f_spring
    if climb:
        # highest-energy interior image: full true force with the parallel
        # component inverted, no springs — it rides the band UP the tangent
        i_max = jnp.argmax(energies[1:-1])
        mask = (jnp.arange(band.shape[0] - 2) == i_max)[:, None, None]
        f_ci = f_int - 2.0 * f_par * tau
        f_neb = jnp.where(mask, f_ci, f_neb)

    return jnp.concatenate(
        [jnp.zeros_like(band[:1]), f_neb, jnp.zeros_like(band[:1])], axis=0
    )


def neb_core(
    energy_forces_fn: Callable[[Array], tuple[Array, Array]],
    band0: Array,
    k_spring: float = 0.1,
    climb: bool = True,
    fmax: float = 0.05,
    max_steps: int = 500,
    dt_start: float = 0.05,
    dt_max: float = 0.2,
    n_min: int = 5,
    f_inc: float = 1.1,
    f_dec: float = 0.5,
    alpha_start: float = 0.1,
    f_alpha: float = 0.99,
) -> tuple[Array, Array, dict[str, Any]]:
    """Optimize a band with global FIRE under the NEB force field.

    ``energy_forces_fn(band) -> ((K,), (K, N, 3))`` evaluates all images at
    once.  Returns (band, per-image energies, info).  Convergence is the
    max per-atom NEB-force norm over interior images."""

    def neb_f(band):
        e, f = energy_forces_fn(band)
        return e, neb_forces(band, e, f, k_spring, climb)

    def fmax_of(f):
        return jnp.sqrt(jnp.max(jnp.sum(f[1:-1] * f[1:-1], axis=-1)))

    def cond(carry):
        _band, _v, _dt, _alpha, _npos, step, fnorm = carry
        return (fnorm > fmax) & (step < max_steps)

    def body(carry):
        band, v, dt, alpha, npos, step, _ = carry
        _e, f = neb_f(band)
        p = jnp.sum(f * v)
        f_unit = f / jnp.maximum(jnp.linalg.norm(f), 1e-10)
        v_mixed = (1.0 - alpha) * v + alpha * jnp.linalg.norm(v) * f_unit

        uphill = p <= 0.0
        v = jnp.where(uphill, 0.0, v_mixed)
        dt = jnp.where(
            uphill,
            dt * f_dec,
            jnp.where(npos > n_min, jnp.minimum(dt * f_inc, dt_max), dt),
        )
        alpha = jnp.where(
            uphill, alpha_start, jnp.where(npos > n_min, alpha * f_alpha, alpha)
        )
        npos = jnp.where(uphill, 0, npos + 1)

        v = v + dt * f
        band = band + dt * v
        return (band, v, dt, alpha, npos, step + 1, fmax_of(f))

    init = (
        band0,
        jnp.zeros_like(band0),
        jnp.float32(dt_start),
        jnp.float32(alpha_start),
        jnp.int32(0),
        jnp.int32(0),
        jnp.float32(jnp.inf),
    )

    @jax.jit
    def run(init):
        band, _v, _dt, _alpha, _npos, steps, _ = jax.lax.while_loop(
            cond, body, init
        )
        e_final, f_final = neb_f(band)
        return band, e_final, steps, fmax_of(f_final)

    band, energies, steps, fmax_final = run(init)
    i_ts = int(jnp.argmax(energies[1:-1])) + 1
    info = {
        "steps": int(steps),
        "fmax": float(fmax_final),
        "converged": bool(fmax_final <= fmax),
        "i_ts": i_ts,
        "barrier": float(energies[i_ts] - energies[0]),
        "barrier_reverse": float(energies[i_ts] - energies[-1]),
    }
    return band, energies, info


def neb(
    params: Any,
    cfg: AIMNet2Config,
    reactant: dict,
    product: dict,
    n_images: int = 11,
    band0: Array | None = None,
    **core_kwargs: Any,
) -> tuple[Array, Array, dict[str, Any]]:
    """Climbing-image NEB between two gas-phase endpoints.

    ``reactant``/``product``: molecule dicts (``coord`` (N, 3), ``numbers``
    (N,), optional ``charge``/``mult``) with identical atom ordering.  The
    band is packed as ONE batched System (all-pairs intra-molecular
    neighbors, so no list rebuilds as the path deforms) and every iteration
    is a single batched force call.  Endpoints should be pre-relaxed
    (``fire_relax``).  Returns (band (K, N, 3), energies (K,), info) —
    energies exclude the SAE shift (constant across a band; barriers are
    unaffected).  ``info["i_ts"]`` hands the climbing image to ``ts_search``
    for refinement."""
    from aimnetcentral_tpu.builders import system_from_molecules

    coord_r = np.asarray(reactant["coord"], dtype=np.float32)
    coord_p = np.asarray(product["coord"], dtype=np.float32)
    numbers = np.asarray(reactant["numbers"], dtype=np.int32)
    if not np.array_equal(numbers, np.asarray(product["numbers"], dtype=np.int32)):
        raise ValueError("reactant and product must share atom ordering")
    if "cell" in reactant or "cell" in product:
        raise ValueError("NEB supports gas-phase endpoints (no cell)")
    # endpoints on different electronic states give a meaningless band: the
    # whole band runs at the REACTANT's charge/mult, so mismatches must error
    # (mirrors the atom-ordering check above)
    for key in ("charge", "mult"):
        a = float(reactant.get(key, 1.0 if key == "mult" else 0.0))
        b = float(product.get(key, 1.0 if key == "mult" else 0.0))
        if a != b:
            raise ValueError(
                f"reactant and product disagree on {key} ({a} vs {b}); "
                "NEB requires one electronic state along the band"
            )

    if band0 is None:
        band0 = linear_band(jnp.asarray(coord_r), jnp.asarray(coord_p), n_images)
    else:
        band0 = jnp.asarray(band0, dtype=jnp.float32)
        n_images = band0.shape[0]
    n = len(numbers)

    mols = []
    for i in range(n_images):
        m = {"coord": coord_r, "numbers": numbers}
        if "charge" in reactant:
            m["charge"] = reactant["charge"]
        if "mult" in reactant:
            m["mult"] = reactant["mult"]
        mols.append(m)
    system = system_from_molecules(mols, n_pad=n_images * n + 1)

    def energy_forces(band):
        flat = system.coord.at[: n_images * n].set(band.reshape(n_images * n, 3))

        def e_of(c):
            out = aimnet2_apply(
                params, cfg, system.replace(coord=c), sae_external=True
            )
            return out["energy"].sum(), out["energy"]

        grads, energies = jax.grad(e_of, has_aux=True)(flat)
        forces = -grads[: n_images * n].reshape(n_images, n, 3)
        return energies, forces

    return neb_core(energy_forces, band0, **core_kwargs)
