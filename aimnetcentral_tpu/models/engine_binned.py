"""Binned (stencil-roll) implementations of the model's pair interactions.

Dense counterparts of the indexed-gather paths (see ops/binned.py for the
layout and why): the ConvSV message-passing contraction, pairwise energy
sums (SR Coulomb, DSF, GFN1 repulsion, Ewald real space), and factorized
DFT-D3.  Each function is numerically equivalent to its indexed sibling in
models/aimnet2.py / models/lr.py — tested against them pairwise — but runs
as dense rolls + block matmuls with zero per-pair gathers.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from aimnetcentral_tpu import constants
from aimnetcentral_tpu.ops import binned as B
from aimnetcentral_tpu.ops import nb as nbops
from aimnetcentral_tpu.system import System

Array = jax.Array


def _pair_geometry(self_blocks, cand_blocks, shift_cart, valid, not_self):
    """Common per-offset geometry: (diff_k closure, d, valid_pair).

    Shapes: coord blocks (nx,ny,nz,C,3); returns d / valid_pair of shape
    (...,Ci,Cc) and ``diff_k(k)`` giving the k-th displacement component.
    Deliberately never materializes a (...,Ci,Cc,3) tensor: a trailing dim
    of 3 tiles to 128 lanes on TPU (3.2x memory blowup) and the per-offset
    scan would hold S of them.
    """
    ci = self_blocks["coord"]
    cj = cand_blocks["coord"] + shift_cart  # (...,Cc,3) + (...,1,3)

    def diff_k(k: int):
        return cj[..., None, :, k] - ci[..., :, None, k]

    real_i = (self_blocks["numbers"] > 0)[..., :, None]
    real_j = (cand_blocks["numbers"] > 0)[..., None, :]
    valid_pair = valid & real_i & real_j & not_self
    d2 = sum(diff_k(k) ** 2 for k in range(3))
    d2 = jnp.where(valid_pair, d2, 1.0)
    d = jnp.sqrt(d2)
    return diff_k, d, valid_pair


def stencil_radius(cutoff: float, grid: B.BinGrid, cell=None) -> int:
    """Offsets needed to cover ``cutoff`` (+ the grid's stale-binning margin).

    Uses ``edge_hint``, which is a lower bound on the true bin edge by
    construction (``plan_bins`` takes floor(height/edge) bins), so the radius
    is conservative.  The cell may be traced under jit — it is not consulted.
    Bins at axis offset k have minimum face separation (k-1)*edge, so pairs
    within the cutoff live at offsets up to ceil(cutoff/edge) (the exact-
    multiple boundary case only contains zero-measure d == cutoff pairs,
    which the cutoff mask excludes).
    """
    return max(1, int(math.ceil((cutoff + grid.margin) / grid.edge_hint)))


# ---------------------------------------------------------------------------
# ConvSV message passing


def conv_pass_binned(
    system: System,
    aev: dict[str, Array],
    a: Array,  # (L, F, G) d2features (or (L, F))
    q: Array | None,  # (L, Cq) charges, None on pass 0
    agh_a: Array,
    agh_q: Array | None,
    d2features: bool,
    rc_static: float,
) -> tuple[Array, Array | None]:
    """One message-pass worth of ConvSV(a) [and ConvSV(q)] on the binned
    layout; equivalent to models/aimnet2.py::_conv_sv over an exact neighbor
    matrix with the same cutoff.  ``rc_static``: the AEV cutoff as a host
    float (from the static model config) — sizes the stencil."""
    grid = system.bins
    assert grid is not None
    cell0 = system.cell[0] if system.cell is not None else None
    rc = aev["rc_s"]
    radius = stencil_radius(rc_static, grid, cell0)

    lshape = a.shape[0]
    blocks = {"coord": system.coord, "numbers": system.numbers, "a": a}
    if q is not None:
        blocks["q"] = q

    f_dim = a.shape[1]
    g_dim = aev["shifts_s"].shape[0]
    acc0 = {
        "a_s": jnp.zeros((lshape, f_dim, g_dim), a.dtype),
        "a_v": jnp.zeros((3, lshape, f_dim, g_dim), a.dtype),
    }
    if q is not None:
        cq = q.shape[1]
        acc0["q_s"] = jnp.zeros((lshape, cq, g_dim), a.dtype)
        acc0["q_v"] = jnp.zeros((3, lshape, cq, g_dim), a.dtype)

    def f(acc, self_b, cand_b, shift_cart, valid, not_self):
        diff_k, d, valid_pair = _pair_geometry(
            self_b, cand_b, shift_cart, valid, not_self
        )
        fc = 0.5 * (jnp.cos(jnp.clip(d, 1e-6, rc) * (jnp.pi / rc)) + 1.0)
        fc = jnp.where(valid_pair & (d < rc), fc, 0.0)
        dd = d[..., None] - aev["shifts_s"]
        gs = jnp.exp(-aev["eta_s"] * dd * dd) * fc[..., None]  # (...,Ci,Cc,G)

        a_cand = cand_b["a"]
        if d2features:
            sub = "...icg,...cfg->...ifg"
        else:
            sub = "...icg,...cf->...ifg"
        new = dict(acc)
        new["a_s"] = acc["a_s"] + jnp.einsum(sub, gs, a_cand).reshape(acc["a_s"].shape)
        av = acc["a_v"]
        qv = acc.get("q_v")
        if q is not None:
            q_cand = cand_b["q"]
            new["q_s"] = acc["q_s"] + jnp.einsum(
                "...icg,...cq->...iqg", gs, q_cand
            ).reshape(acc["q_s"].shape)
        for k in range(3):
            uk = diff_k(k) / d
            gk = gs * uk[..., None]
            av = av.at[k].add(jnp.einsum(sub, gk, a_cand).reshape(acc["a_s"].shape))
            if q is not None:
                qv = qv.at[k].add(
                    jnp.einsum("...icg,...cq->...iqg", gk, q_cand).reshape(
                        acc["q_s"].shape
                    )
                )
        new["a_v"] = av
        if q is not None:
            new["q_v"] = qv
        return new

    acc = B.stencil_map(grid, radius, f, acc0, blocks, cell=cell0)

    def combine(avf_s, avf_v, agh):
        # avf_v: (3, L, F, G) -> (L, F, G, 3); comb with agh (F, G, H)
        v = jnp.moveaxis(avf_v, 0, -1)
        comb = jnp.einsum("fgh,lfgd->lfhd", agh, v)
        vv = (comb * comb).sum(-1)  # (L, F, H)
        n = avf_s.shape[0]
        return jnp.concatenate([avf_s.reshape(n, -1), vv.reshape(n, -1)], axis=-1)

    out_a = combine(acc["a_s"], acc["a_v"], agh_a)
    out_q = None
    if q is not None:
        out_q = combine(acc["q_s"], acc["q_v"], agh_q)
    return out_a, out_q


# ---------------------------------------------------------------------------
# pairwise energy sums


def pair_energy_binned(
    system: System,
    cutoff: float,
    e_pair_fn: Callable,
    extra_blocks: dict[str, Array] | None = None,
) -> Array:
    """Sum a pair energy over all pairs within ``cutoff``: returns per-atom
    (ordered-pair) energies (L,).  ``e_pair_fn(d, valid_pair, self_b, cand_b)``
    returns the per-pair energy (...,Ci,Cc) (already masked by valid_pair)."""
    grid = system.bins
    assert grid is not None
    cell0 = system.cell[0] if system.cell is not None else None
    radius = stencil_radius(cutoff, grid, cell0)

    blocks = {"coord": system.coord, "numbers": system.numbers}
    if extra_blocks:
        blocks.update(extra_blocks)

    acc0 = jnp.zeros((system.natoms,), system.coord.dtype)

    def f(acc, self_b, cand_b, shift_cart, valid, not_self):
        _diff_k, d, valid_pair = _pair_geometry(
            self_b, cand_b, shift_cart, valid, not_self
        )
        valid_pair = valid_pair & (d < cutoff)
        e = e_pair_fn(d, valid_pair, self_b, cand_b)
        e_i = jnp.where(valid_pair, e, 0.0).sum(-1)  # (...,Ci)
        return acc + e_i.reshape(-1)

    return B.stencil_map(grid, radius, f, acc0, blocks, cell=cell0)


def coulomb_sr_binned(system: System, q: Array, rc, envelope: str) -> Array:
    """Binned twin of models/lr.py::coulomb_sr (per-molecule energies)."""

    def e_fn(d, valid, self_b, cand_b):
        qq = self_b["q"][..., :, None] * cand_b["q"][..., None, :]
        if envelope == "exp":
            x = jnp.clip(d / rc, 0.0, 1.0 - 1e-6)
            fc = jnp.exp(-1.0 / (1.0 - x * x)) / 0.36787944117144233
        else:
            fc = 0.5 * (jnp.cos(jnp.clip(d, 1e-6, rc) * (jnp.pi / rc)) + 1.0)
            fc = jnp.where(d < rc, fc, 0.0)
        return fc * qq / d

    # exp envelope is identically zero at d >= rc; cosine needs the cut
    e_i = pair_energy_binned(system, float(rc), e_fn, {"q": q})
    from aimnetcentral_tpu.models.lr import FACTOR

    return FACTOR * nbops.mol_sum(e_i, system.mol_idx, system.num_mol)


def coulomb_dsf_binned(
    system: System,
    q: Array,
    rc,
    dsf_alpha: float,
    dsf_rc: float,
    envelope: str,
    subtract_sr: bool,
) -> Array:
    """Binned twin of models/lr.py::coulomb_dsf."""
    from aimnetcentral_tpu.models.lr import FACTOR

    alpha = dsf_alpha
    erfc_rc = math.erfc(alpha * dsf_rc)
    shift_val = erfc_rc / dsf_rc
    shift_slope = erfc_rc / dsf_rc**2 + (
        2.0 * alpha / math.sqrt(math.pi) * math.exp(-((alpha * dsf_rc) ** 2)) / dsf_rc
    )

    def e_fn(d, valid, self_b, cand_b):
        qq = self_b["q"][..., :, None] * cand_b["q"][..., None, :]
        e_pair = (
            jax.scipy.special.erfc(alpha * d) / d
            - shift_val
            + (d - dsf_rc) * shift_slope
        )
        return qq * e_pair

    e_i = pair_energy_binned(system, dsf_rc, e_fn, {"q": q})
    e = FACTOR * nbops.mol_sum(e_i, system.mol_idx, system.num_mol)

    self_coeff = -(shift_val / 2.0 + alpha / math.sqrt(math.pi))
    q_real = jnp.where(system.numbers > 0, q, 0.0)
    e = e + 2.0 * FACTOR * nbops.mol_sum(
        self_coeff * q_real * q_real, system.mol_idx, system.num_mol
    )
    if subtract_sr:
        e = e - coulomb_sr_binned(system, q, rc, envelope)
    return e


def srrep_binned(
    system: System, gfn1_ab: Array, rc: float, cutoff_fn: str
) -> Array:
    """Binned twin of models/lr.py::srrep_energy."""
    p = gfn1_ab[system.numbers]  # (L, 2)

    def e_fn(d, valid, self_b, cand_b):
        alpha_ij = self_b["p"][..., :, None, 0] * cand_b["p"][..., None, :, 0]
        zeff_ij = self_b["p"][..., :, None, 1] * cand_b["p"][..., None, :, 1]
        e = jnp.exp(-alpha_ij * d**1.5) * zeff_ij / d
        if cutoff_fn == "exp_cutoff":
            x = jnp.clip(d / rc, 0.0, 1.0 - 1e-6)
            e = e * jnp.exp(-1.0 / (1.0 - x * x)) / 0.36787944117144233
        elif cutoff_fn == "cosine_cutoff":
            e = e * 0.5 * (jnp.cos(jnp.clip(d, 1e-6, rc) * (jnp.pi / rc)) + 1.0)
        return e

    # SRRep in the reference runs on the model's SR neighbor matrix: same
    # cutoff as the AEV (bin edge), radius 1
    e_i = pair_energy_binned(system, rc, e_fn, {"p": p})
    return nbops.mol_sum(e_i, system.mol_idx, system.num_mol)


def ewald_real_binned(
    system: System, q: Array, eta, r_cutoff_static: float
) -> Array:
    """Real-space Ewald sum on the binned layout (per-molecule, no k_e).

    ``r_cutoff_static`` must be a host float (sets the static stencil
    radius); ``eta`` may be traced."""

    def e_fn(d, valid, self_b, cand_b):
        qq = self_b["q"][..., :, None] * cand_b["q"][..., None, :]
        return qq * jax.scipy.special.erfc(d / (math.sqrt(2.0) * eta)) / d

    e_i = pair_energy_binned(system, r_cutoff_static, e_fn, {"q": q})
    return 0.5 * nbops.mol_sum(e_i, system.mol_idx, system.num_mol)
