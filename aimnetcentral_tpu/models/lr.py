"""Long-range physics heads: Coulomb (simple / DSF), SR subtraction,
DFT-D3(BJ) dispersion, D3TS learned dispersion, GFN1 short-range repulsion.

Every term here is written ONCE, differentiably, in pure JAX: forces, stress,
Hessians and HVPs all flow through ``jax.grad``-family transforms.  This
replaces the reference's three parallel derivative strategies per method
(explicit kernel force injection / fixed-charge FD / relaxed-charge autograd,
reference aimnet/modules/lr.py:117-209, 850-960) with a single relaxed-charge
autograd story.  Ewald / PME live in ``aimnetcentral_tpu/models/ewald.py``.

Unit system: energies eV, distances Angstrom; ordered-pair sums carry the
factor ``half_Hartree * Bohr`` (reference aimnet/modules/lr.py:294-296).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from aimnetcentral_tpu import constants
from aimnetcentral_tpu.ops import math as aops
from aimnetcentral_tpu.ops import nb as nbops
from aimnetcentral_tpu.system import System

Array = jax.Array

FACTOR = constants.half_Hartree * constants.Bohr  # ordered-pair Coulomb prefactor


def ensure_dij(data: dict, system: System, suffix: str) -> dict:
    """Lazily compute & cache d_ij for a neighbor-matrix suffix
    (reference aimnet/ops.py:9-34)."""
    key = f"d_ij{suffix}"
    if key not in data:
        nb, sh, _ = system.resolve_nb(suffix)
        d, _ = aops.calc_distances(system.coord, nb, sh, system.cell, system.mol_idx)
        data = {**data, key: d}
    return data


def _pair_sum_energy(e_ij: Array, valid: Array, mol_idx: Array, num_mol: int) -> Array:
    """Masked ordered-pair energy -> per-molecule sum.

    The inner (neighbor) reduction happens first, then the sorted segment sum —
    a two-stage tree reduction that keeps f32 accumulation error low without
    paying TPU float64 (the reference accumulates in f64 instead,
    reference aimnet/modules/lr.py:61)."""
    e_i = jnp.where(valid, e_ij, 0.0).sum(axis=-1)
    return nbops.mol_sum(e_i, mol_idx, num_mol)


def coulomb_sr(
    data: dict,
    system: System,
    rc: Array,
    envelope: str,
    key_in: str = "charges",
) -> Array:
    """Envelope-weighted short-range Coulomb on the base (SR) neighbor matrix
    (reference aimnet/modules/lr.py:21-62)."""
    data = ensure_dij(data, system, "")
    d_ij = data["d_ij"]
    q = data[key_in]
    q_ij = q[:, None] * nbops.gather_nb(q, system.nbmat)
    fc = aops.exp_cutoff(d_ij, rc) if envelope == "exp" else aops.cosine_cutoff(d_ij, rc)
    e_ij = fc * q_ij / d_ij
    valid = nbops.pair_mask(system.nbmat)
    return FACTOR * _pair_sum_energy(e_ij, valid, system.mol_idx, system.num_mol)


def coulomb_sr_multi(
    data: dict,
    system: System,
    rc: Array,
    envelope: str,
    q_st: Array,  # (N, E) member-stacked charges
) -> Array:
    """Member-fused twin of :func:`coulomb_sr`: the envelope/d kernel is
    member-independent (one evaluation); members contribute bilinear charge
    products -> (num_mol, E)."""
    data = ensure_dij(data, system, "")
    d_ij = data["d_ij"]
    fc = aops.exp_cutoff(d_ij, rc) if envelope == "exp" else aops.cosine_cutoff(d_ij, rc)
    kernel = jnp.where(nbops.pair_mask(system.nbmat), fc / d_ij, 0.0)  # (N, M)
    q_nb = nbops.gather_nb(q_st, system.nbmat)  # (N, M, E)
    e_i = (
        jnp.einsum("nm,nme->ne", kernel, q_nb, precision=jax.lax.Precision.HIGHEST)
        * q_st
    )
    return FACTOR * nbops.mol_sum(e_i, system.mol_idx, system.num_mol)


def coulomb_simple(
    data: dict,
    system: System,
    rc: Array,
    envelope: str = "exp",
    subtract_sr: bool = True,
    key_in: str = "charges",
) -> Array:
    """Full pairwise Coulomb over the LR neighbor matrix, optionally minus the
    SR part the NN has learned (reference aimnet/modules/lr.py:311-331)."""
    nb, _sh, suffix = system.resolve_nb("_coulomb", "_lr", "")
    data = ensure_dij(data, system, suffix)
    d_ij = data[f"d_ij{suffix}"]
    q = data[key_in]
    q_ij = q[:, None] * nbops.gather_nb(q, nb)
    e_ij = q_ij / d_ij
    valid = nbops.pair_mask(nb)
    e = FACTOR * _pair_sum_energy(e_ij, valid, system.mol_idx, system.num_mol)
    if subtract_sr:
        e = e - coulomb_sr(data, system, rc, envelope, key_in)
    return e


def coulomb_dsf(
    data: dict,
    system: System,
    rc: Array,
    dsf_alpha: float,
    dsf_rc: float,
    envelope: str = "exp",
    subtract_sr: bool = True,
    key_in: str = "charges",
) -> Array:
    """Damped-shifted-force (Fennell-Gezelter) Coulomb, closed form.

    Matches the reference's twice-differentiable torch path including the
    self-energy term (reference aimnet/modules/lr.py:559-615); C^1 at the
    cutoff.  One implementation serves energy/forces/stress/Hessian alike.
    """
    nb, _sh, suffix = system.resolve_nb("_coulomb", "_lr", "")
    data = ensure_dij(data, system, suffix)
    d_ij = data[f"d_ij{suffix}"]
    q = data[key_in]
    q_ij = q[:, None] * nbops.gather_nb(q, nb)

    alpha = dsf_alpha
    erfc_rc = math.erfc(alpha * dsf_rc)
    shift_val = erfc_rc / dsf_rc
    shift_slope = erfc_rc / dsf_rc**2 + (
        2.0 * alpha / math.sqrt(math.pi) * math.exp(-((alpha * dsf_rc) ** 2)) / dsf_rc
    )
    e_pair = (
        jax.scipy.special.erfc(alpha * d_ij) / d_ij
        - shift_val
        + (d_ij - dsf_rc) * shift_slope
    )
    valid = nbops.pair_mask(nb) & (d_ij < dsf_rc)
    e = FACTOR * _pair_sum_energy(q_ij * e_pair, valid, system.mol_idx, system.num_mol)

    # self-energy: -(erfc(a*rc)/(2 rc) + a/sqrt(pi)) * q_i^2, full k_e factor
    self_coeff = -(shift_val / 2.0 + alpha / math.sqrt(math.pi))
    q_real = nbops.mask_pad_atoms(q, system.numbers)
    e_self = nbops.mol_sum(self_coeff * q_real * q_real, system.mol_idx, system.num_mol)
    e = e + 2.0 * FACTOR * e_self
    if subtract_sr:
        e = e - coulomb_sr(data, system, rc, envelope, key_in)
    return e


def srrep_energy(
    data: dict,
    system: System,
    params: dict[str, Array],
    rc: float,
    cutoff_fn: str = "none",
) -> Array:
    """GFN1-style short-range repulsion (reference aimnet/modules/core.py:195-232)."""
    data = ensure_dij(data, system, "")
    d_ij = data["d_ij"]
    p = params["gfn1_ab"][system.numbers]  # (N, 2) = (alpha, zeff)
    p_ij = p[:, None, :] * nbops.gather_nb(p, system.nbmat)
    alpha_ij = p_ij[..., 0]
    zeff_ij = p_ij[..., 1]
    e = jnp.exp(-alpha_ij * d_ij**1.5) * zeff_ij / d_ij
    valid = nbops.pair_mask(system.nbmat)
    e = jnp.where(valid, e, 0.0)
    if cutoff_fn == "exp_cutoff":
        e = e * aops.exp_cutoff(d_ij, rc)
    elif cutoff_fn == "cosine_cutoff":
        e = e * aops.cosine_cutoff(d_ij, rc)
    return nbops.mol_sum(e.sum(-1), system.mol_idx, system.num_mol)


def disp_param_apply(data: dict, params: dict[str, Array], key_in: str, key_out: str) -> dict:
    """NN-scaled dispersion parameters (C6, alpha)
    (reference aimnet/modules/lr.py:1106-1111)."""
    mult = jnp.exp(jnp.clip(data[key_in], -4.0, 4.0))
    vals = params["disp_param0"][data["_numbers"]] * mult
    return {**data, key_out: vals}


def d3ts_energy(
    data: dict,
    system: System,
    params: dict[str, Array],
    a1: float,
    a2: float,
    s8: float,
    s6: float = 1.0,
    key_in: str = "disp_param",
) -> Array:
    """D3-like pairwise dispersion with TS combination rule
    (reference aimnet/modules/lr.py:1128-1157)."""
    nb, _sh, suffix = system.resolve_nb("_dftd3", "_lr", "")
    data = ensure_dij(data, system, suffix)
    valid = nbops.pair_mask(nb)

    dp = data[key_in]  # (N, 2)
    dp_j = nbops.gather_nb(dp, nb)
    c6_i, alpha_i = dp[:, None, 0], dp[:, None, 1]
    c6_j, alpha_j = dp_j[..., 0], dp_j[..., 1]
    denom = jnp.clip(c6_i * alpha_j / alpha_i + c6_j * alpha_i / alpha_j, min=1e-4)
    c6ij = jnp.where(valid, 2.0 * c6_i * c6_j / denom, 0.0)

    rr = params["r4r2"][system.numbers]
    rrij = 3.0 * rr[:, None] * nbops.gather_nb(rr, nb)
    rrij = jnp.where(valid, rrij, 1.0)
    r0ij = a1 * jnp.sqrt(rrij) + a2

    d_ij = data[f"d_ij{suffix}"] * constants.Bohr_inv
    e_ij = c6ij * (s6 / (d_ij**6 + r0ij**6) + s8 * rrij / (d_ij**8 + r0ij**8))
    return -constants.half_Hartree * nbops.mol_sum(
        e_ij.sum(-1), system.mol_idx, system.num_mol
    )


def _s5_switch(d_bohr: Array, r_on_bohr: float, r_off_bohr: float) -> Array:
    """nvalchemiops-compatible quintic S5 switch-off
    (reference aimnet/modules/lr.py:1580-1593)."""
    if r_off_bohr <= r_on_bohr:
        return jnp.ones_like(d_bohr)
    t = jnp.clip((d_bohr - r_on_bohr) / (r_off_bohr - r_on_bohr), 0.0, 1.0)
    switch = 1.0 - (10.0 * t**3 - 15.0 * t**4 + 6.0 * t**5)
    return jnp.where(d_bohr <= r_on_bohr, 1.0, switch)


def dftd3_energy(
    data: dict,
    system: System,
    tables: dict[str, Array],
    a1: float,
    a2: float,
    s8: float,
    s6: float = 1.0,
    smoothing_on: float = 12.0,
    smoothing_off: float = 15.0,
) -> Array:
    """DFT-D3(BJ) dispersion (C6+C8, no 3-body), fully differentiable.

    One implementation for energy / forces / stress / Hessians, matching the
    reference's differentiable torch path (reference aimnet/modules/lr.py:
    1595-1657): sigmoid coordination numbers, Gaussian-weighted C6
    interpolation over the (5, 5) reference grid, quintic S5 switch.
    Input distances in Angstrom; D3 math in Bohr/Hartree internally.
    """
    nb, _sh, suffix = system.resolve_nb("_dftd3", "_lr", "")
    data = ensure_dij(data, system, suffix)
    d_bohr = jnp.clip(data[f"d_ij{suffix}"], min=1e-12) * constants.Bohr_inv
    valid = nbops.pair_mask(nb)

    z = system.numbers
    z_j = nbops.gather_nb(z, nb)  # (N, M)
    rcov = tables["rcov"]
    rcov_sum = rcov[z][:, None] + rcov[z_j]
    cn_ij = jax.nn.sigmoid(16.0 * (rcov_sum / d_bohr - 1.0))
    cn = jnp.where(valid, cn_ij, 0.0).sum(-1)  # (N,)

    # C6 interpolation over reference coordination numbers
    c6ref = tables["c6ab"][z[:, None], z_j]  # (N, M, 5, 5)
    cnref_i = tables["cn_ref"][z[:, None], z_j]  # (N, M, 5, 5)
    cnref_j = jnp.swapaxes(tables["cn_ref"][z_j, z[:, None]], -1, -2)
    cn_i = cn[:, None, None, None]
    cn_j = nbops.gather_nb(cn, nb)[..., None, None]
    ok = c6ref != 0
    exp_arg = -4.0 * ((cn_i - cnref_i) ** 2 + (cn_j - cnref_j) ** 2)
    max_exp = jnp.max(jnp.where(ok, exp_arg, -jnp.inf), axis=(-1, -2), keepdims=True)
    finite = jnp.isfinite(max_exp)
    shifted = jnp.where(finite, exp_arg - jnp.where(finite, max_exp, 0.0), 0.0)
    w = jnp.where(ok & finite & (shifted >= -12.0), jnp.exp(shifted), 0.0)
    w_sum = w.sum(axis=(-1, -2))
    c6_sum = (c6ref * w).sum(axis=(-1, -2))
    c6ij = jnp.where(w_sum > 1e-12, c6_sum / jnp.clip(w_sum, min=1e-12), 0.0)

    r4r2_ij = 3.0 * tables["r4r2"][z][:, None] * tables["r4r2"][z_j]
    r0 = a1 * jnp.sqrt(r4r2_ij) + a2
    d2 = d_bohr * d_bohr
    d6 = d2 * d2 * d2
    d8 = d6 * d2
    r0_2 = r0 * r0
    r0_6 = r0_2 * r0_2 * r0_2
    r0_8 = r0_6 * r0_2
    damping = s6 / (d6 + r0_6) + s8 * r4r2_ij / (d8 + r0_8)
    switch = _s5_switch(d_bohr, smoothing_on * constants.Bohr_inv, smoothing_off * constants.Bohr_inv)
    e_ij = jnp.where(valid, -c6ij * damping * switch, 0.0)
    return constants.half_Hartree * nbops.mol_sum(
        e_ij.sum(-1), system.mol_idx, system.num_mol
    )
