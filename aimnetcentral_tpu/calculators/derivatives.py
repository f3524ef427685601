"""Derivatives: forces, stress, dense Hessians, and Hessian-vector products.

ONE autograd story (SURVEY.md §7.3): because every energy term in this
framework is differentiable JAX (including DSF/Ewald/PME Coulomb and D3),
forces are ``jax.grad``, stress is the gradient w.r.t. a per-molecule
row-vector strain (mirroring the reference's convention,
reference aimnet/calculators/derivatives.py:68-92), Hessians are forward-over-
reverse (``jax.jacfwd(jax.grad)``), and HVPs are a single ``jax.jvp`` of the
gradient.  This subsumes the reference's per-method derivative zoo
(fixed-charge FD vs relaxed-charge autograd, reference aimnet/modules/lr.py):
every derivative here is exact and relaxed-charge.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from aimnetcentral_tpu.ops import math as aops

from aimnetcentral_tpu.models.aimnet2 import AIMNet2Config, aimnet2_apply
from aimnetcentral_tpu.ops import nb as nbops
from aimnetcentral_tpu.system import System

Array = jax.Array


def apply_strain(system: System, scaling: Array) -> System:
    """Apply per-molecule row-vector strain: coord' = coord @ S[mol], cell' = cell @ S.

    ``scaling`` is (num_mol, 3, 3).  Padding atoms read the identity (their
    coordinates are inert but must stay finite).
    """
    eye = jnp.eye(3, dtype=scaling.dtype)[None]
    scaling_ext = jnp.concatenate([scaling, eye], axis=0)
    atom_scaling = jnp.take(scaling_ext, system.mol_idx, axis=0)  # (N, 3, 3)
    coord = jnp.einsum("ni,nij->nj", system.coord, atom_scaling, precision=jax.lax.Precision.HIGHEST)
    cell = aops.cellmul(system.cell, scaling) if system.cell is not None else None
    return system.replace(coord=coord, cell=cell)


def _resolve_precision(matmul_precision: str) -> str:
    """Validated AIMNET_MATMUL_PRECISION: only precisions every backend of
    the eval surface supports.  The Pallas kernels inherit the ambient
    matmul-precision context and Mosaic only lowers DEFAULT/HIGHEST dots
    (ambient "high" fails inside the kernels with an opaque lowering error;
    measured on v5e it is also no faster than "highest" here)."""
    import os

    prec = os.environ.get("AIMNET_MATMUL_PRECISION", matmul_precision)
    if prec not in ("default", "highest", "float32"):
        raise ValueError(
            f"AIMNET_MATMUL_PRECISION={prec!r} unsupported: use 'default' "
            "(fast, ~4e-3 eV/A force noise) or 'highest' (exact f32)"
        )
    return prec


def make_eval_fn(
    cfg: AIMNet2Config,
    *,
    forces: bool = False,
    stress: bool = False,
    hessian: bool = False,
    sae_external: bool = True,
    extra_keys: tuple[str, ...] = (),
    conv_engine: str | None = None,
    matmul_precision: str = "highest",
    conv_precision: str | None = None,
) -> Callable[[dict, System], dict]:
    """Build a jittable evaluation function ``f(params, system) -> outputs``.

    Output keys: ``energy`` (num_mol,), plus ``forces`` (N, 3),
    ``stress`` (num_mol, 3, 3), ``hessian`` (n_real, 3, n_real, 3) as
    requested, plus any model keys listed in ``extra_keys`` and always
    ``charges`` (and ``mol_element_counts`` under SAE externalization).

    ``matmul_precision`` pins every matmul issued by the eval to that XLA
    precision (default "highest" = exact f32).  This is the TPU analogue of
    the reference pinning TF32 OFF for its validation surface
    (reference aimnet/validation/gpu_observables.py:33-40): the MXU's
    default bf16 passes cost ~4e-3 eV/A force noise — fine for
    thermostatted MD (the MD driver runs at the JAX default), fatal for the
    <1e-4 eV/A parity gate.  Override with AIMNET_MATMUL_PRECISION.

    ``conv_precision`` selects the Pallas conv kernels' internal MXU mode
    ("f32x3" = hand-split 3x1-pass dots, the calculator's "balanced" tier;
    None = inherit the ambient context).
    """
    prec = _resolve_precision(matmul_precision)

    keep = ("charges", "spin_charges", "dipole", "quadrupole", "mol_element_counts")

    def collect(data: dict) -> dict:
        out = {"energy": data["energy"]}
        for k in keep + tuple(extra_keys):
            if k in data and data[k] is not None:
                out[k] = data[k]
        return out

    def energy_of(params: dict, system: System) -> tuple[Array, dict]:
        data = aimnet2_apply(
            params, cfg, system, sae_external=sae_external,
            conv_engine=conv_engine, conv_precision=conv_precision,
        )
        return data["energy"].sum(), collect(data)

    if not (forces or stress or hessian):

        def eval_plain(params: dict, system: System) -> dict:
            with jax.default_matmul_precision(prec):
                _, out = energy_of(params, system)
            return out

        return eval_plain

    def eval_grad(params: dict, system: System) -> dict:
        with jax.default_matmul_precision(prec):
            return _eval_grad_inner(params, system)

    def _eval_grad_inner(params: dict, system: System) -> dict:
        if stress:
            assert system.cell is not None, "stress requires a periodic cell"
            scaling0 = jnp.broadcast_to(
                jnp.eye(3, dtype=system.coord.dtype), (system.num_mol, 3, 3)
            )

            def e_fn(coord: Array, scaling: Array) -> tuple[Array, dict]:
                sys2 = apply_strain(system.replace(coord=coord), scaling)
                return energy_of(params, sys2)

            (de_dc, de_ds), out = jax.grad(e_fn, argnums=(0, 1), has_aux=True)(
                system.coord, scaling0
            )
            volume = jnp.abs(jnp.linalg.det(system.cell))[:, None, None]
            out["stress"] = de_ds / volume
            if forces:
                out["forces"] = -de_dc
        else:

            def e_fn_c(coord: Array) -> tuple[Array, dict]:
                return energy_of(params, system.replace(coord=coord))

            de_dc, out = jax.grad(e_fn_c, has_aux=True)(system.coord)
            out["forces"] = -de_dc

        if hessian:
            # forward-over-reverse traverses the Pallas conv via its K3
            # second-order rules (conv_pallas.py), but those route tangents
            # through the XLA twin anyway — pinning the XLA engine for this
            # second-order-dominated graph skips the duplicated Pallas
            # primal (measured 2x faster HVPs at 2k atoms)
            def force_of(coord: Array) -> Array:
                return -jax.grad(
                    lambda c: aimnet2_apply(
                        params,
                        cfg,
                        system.replace(coord=c),
                        sae_external=sae_external,
                        conv_engine="xla",
                    )["energy"].sum()
                )(coord)

            h = -jax.jacfwd(force_of)(system.coord)  # (N, 3, N, 3)
            out["hessian"] = h
        return out

    return eval_grad


def make_hvp_fn(
    cfg: AIMNet2Config,
    sae_external: bool = True,
    matmul_precision: str = "highest",
):
    """Matrix-free Hessian-vector product: one jvp of the gradient
    (replaces reference aimnet/calculators/calculator.py:1755-1987).
    Pinned to exact-f32 matmuls like make_eval_fn (see its docstring)."""
    prec = _resolve_precision(matmul_precision)

    def hvp(params: dict, system: System, v: Array) -> Array:
        with jax.default_matmul_precision(prec):
            return _hvp_inner(params, system, v)

    def _hvp_inner(params: dict, system: System, v: Array) -> Array:
        # jvp-of-grad traverses the Pallas conv via its K3 rules, but the
        # XLA engine is ~2x faster for this second-order-dominated graph
        # (the K3 tangents fall back to the XLA twin regardless)
        def grad_e(coord: Array) -> Array:
            return jax.grad(
                lambda c: aimnet2_apply(
                    params,
                    cfg,
                    system.replace(coord=c),
                    sae_external=sae_external,
                    conv_engine="xla",
                )["energy"].sum()
            )(coord)

        _, hv = jax.jvp(grad_e, (system.coord,), (v,))
        return hv

    return hvp


def real_atom_hessian(h: Array, n_real: int) -> Array:
    """Slice the padded (N,3,N,3) Hessian down to real atoms."""
    return h[:n_real, :, :n_real, :]
