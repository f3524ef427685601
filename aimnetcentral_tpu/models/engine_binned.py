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
import numpy as np

from aimnetcentral_tpu import constants
from aimnetcentral_tpu.ops import binned as B
from aimnetcentral_tpu.ops import math as aops
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

    Molecule-bin grids (one molecule per bin, training batches) sweep at
    radius 0 regardless of cutoff: every pair is within-bin by construction.
    """
    if grid.molecule_bins:
        return 0
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
    b_tot = grid.total_bins
    ci = grid.capacity
    f_dim = a.shape[1] if a.ndim == 3 else 1
    g_dim = int(aev["shifts_s"].shape[0])

    # TPU mapping: the contraction is over candidate slots c for each basis
    # index g — block-sparse for the MXU.  We densify with a block-diagonal
    # layout, but GROUPED: g is split into groups of gamma=8 so each matmul is
    # (4C x C*8) @ (C*8 x F*8=128) — the N dim is exactly the 128-lane width,
    # and the zero-fill inflation is 8x instead of 16x (half the FLOPs of a
    # full-G block diagonal at full MXU utilization).  All materialized
    # tensors have trailing dims >= 128 (no tile padding waste).
    gamma = 8 if g_dim % 8 == 0 else g_dim
    ng = g_dim // gamma
    blocks = {
        "coord": system.coord,
        "numbers": system.numbers,
        "a": a.reshape(lshape, f_dim * g_dim),
    }
    cq = 0
    if q is not None:
        cq = q.shape[1]
        blocks["q"] = q

    eyeg = jnp.eye(gamma, dtype=a.dtype)
    acc0 = {"a": jnp.zeros((b_tot, 4 * ci, f_dim * g_dim), a.dtype)}
    if q is not None:
        acc0["q"] = jnp.zeros((b_tot, 4 * ci, cq * g_dim), a.dtype)

    def f(acc, self_b, cand_b, shift_cart, valid, not_self):
        diff_k, d, valid_pair = _pair_geometry(
            self_b, cand_b, shift_cart, valid, not_self
        )
        fc = 0.5 * (jnp.cos(jnp.clip(d, 1e-6, rc) * (jnp.pi / rc)) + 1.0)
        fc = jnp.where(valid_pair & (d < rc), fc, 0.0)
        dd = d[..., None] - aev["shifts_s"]
        gs = jnp.exp(-aev["eta_s"] * dd * dd) * fc[..., None]  # (B,Ci,Cc,G)

        parts = [gs] + [gs * (diff_k(k) / d)[..., None] for k in range(3)]
        w = jnp.concatenate(parts, axis=1)  # (B, 4Ci, Cc, G)
        a_cand = cand_b["a"].reshape(-1, grid.capacity, f_dim, g_dim)

        out_groups = []
        outq_groups = []
        for gidx in range(ng):
            sl = slice(gidx * gamma, (gidx + 1) * gamma)
            w_g = w[..., sl].reshape(-1, 4 * ci, grid.capacity * gamma)
            # abig[(c,g),(f,g')] = a[c,f,g'] * delta(g,g'), g within the group
            abig = (
                a_cand[:, :, None, :, sl] * eyeg[None, None, :, None, :]
            ).reshape(-1, grid.capacity * gamma, f_dim * gamma)
            out_groups.append(jnp.einsum("bjx,bxy->bjy", w_g, abig))
            if q is not None:
                q_cand = cand_b["q"]  # (B, C, Cq)
                qbig = (
                    q_cand[:, :, None, :, None] * eyeg[None, None, :, None, :]
                ).reshape(-1, grid.capacity * gamma, cq * gamma)
                outq_groups.append(jnp.einsum("bjx,bxy->bjy", w_g, qbig))

        # out_groups[gidx] is (B, 4C, F*gamma) with trailing layout (f, g2);
        # fold into the accumulator layout (f, g) with g = gidx*gamma + g2
        out = jnp.stack(out_groups, axis=2).reshape(-1, 4 * ci, ng, f_dim, gamma)
        out = jnp.swapaxes(out, 2, 3)  # (B, 4C, F, ng, gamma)
        new = {"a": acc["a"] + out.reshape(-1, 4 * ci, f_dim * g_dim)}
        if q is not None:
            outq = jnp.stack(outq_groups, axis=2).reshape(-1, 4 * ci, ng, cq, gamma)
            outq = jnp.swapaxes(outq, 2, 3)
            new["q"] = acc["q"] + outq.reshape(-1, 4 * ci, cq * g_dim)
        return new

    acc = B.stencil_map(grid, radius, f, acc0, blocks, cell=cell0)

    def combine(avf, agh, nch):
        # (B, 4C, F*G) -> scalar (L, F, G) + vector combination (L, F, H)
        avf = avf.reshape(b_tot, 4, ci, nch, g_dim)
        avf_s = avf[:, 0].reshape(lshape, nch, g_dim)
        avf_v = jnp.moveaxis(avf[:, 1:4], 1, -1).reshape(lshape, nch, g_dim, 3)
        comb = jnp.einsum("fgh,lfgd->lfhd", agh, avf_v)
        vv = (comb * comb).sum(-1)  # (L, F, H)
        return jnp.concatenate(
            [avf_s.reshape(lshape, -1), vv.reshape(lshape, -1)], axis=-1
        )

    out_a = combine(acc["a"], agh_a, f_dim)
    out_q = combine(acc["q"], agh_q, cq) if q is not None else None
    return out_a, out_q


# ---------------------------------------------------------------------------
# pairwise energy sums


def pair_energy_binned(
    system: System,
    cutoff: float,
    e_pair_fn: Callable,
    extra_blocks: dict[str, Array] | None = None,
    layout: str = "sr",
    allow_pallas: bool = True,
    n_out: int = 1,
) -> Array:
    """Sum a SYMMETRIC pair term over all pairs within ``cutoff``: returns
    per-atom (ordered-pair-convention) sums (L,) in the SR slot layout.

    ``e_pair_fn(d, valid_pair, self_b, cand_b)`` must be symmetric under
    i<->j (true for every physics term here: Coulomb, dispersion, repulsion,
    coordination numbers).  This enables a HALF-stencil sweep: each pair is
    computed once and its value accumulated to both endpoints (the mirror
    side lands via a bin-granular scatter back to the candidate bin) —
    half the pair math of a full sweep.

    ``layout="lr"`` runs the sweep on the coarse long-range twin layout
    (``system.lr_bins``/``lr_slot``) when attached: one gather into LR slot
    order, the sweep on the radius-2 coarse stencil, one scatter-add back to
    SR order (empty LR slots point at SR padding, contributing zero).  Falls
    back to the SR grid when no LR layout is attached.

    ``AIMNET_PAIR_ENGINE={xla,auto,pallas}`` (default xla) picks the sweep
    engine.  ``auto`` routes to the fused Pallas kernel
    (kernels/pair_sweep.py: VMEM-resident pair tiles, ONE fused adjoint
    sweep; hardware-parity-verified to ~2e-7 vs this XLA scan) on TPU
    backends whenever the banded half-stencil tables apply (nz >= 2r+1,
    uniform periodicity — the same pair count as this XLA half sweep).
    The DEFAULT stays on the XLA scan: measured head-to-head (TPU v5e,
    10k atoms, coarse LR layout) the banded kernel wins the isolated
    gradient microbench by ~7% (5.7 vs 6.1 ms, tools/bench_pair.py) but is
    a wash end-to-end in MD (9.0 steps/s both ways) at ~4x the kernel
    compile time — XLA's fused scan is already near the VPU envelope for
    these elementwise-dominated sweeps.  ``pallas`` forces the kernel even
    where only the slower full-stencil fallback applies.
    ``allow_pallas=False`` pins the XLA path for e_pair_fns that close over
    traced values (the Pallas kernel traces e_pair_fn in-kernel and can only
    capture host constants).

    ``n_out > 1`` (ensemble fusion): ``e_pair_fn`` must return a TUPLE of
    ``n_out`` per-pair arrays sharing this sweep's geometry — one per
    ensemble member — and the result is ``(L, n_out)``.  Pair distances,
    masks, and whatever radial kernel the e_fn hoists are computed ONCE for
    all members (the per-member work is one multiply-accumulate each).
    Multi-output sweeps always run the XLA scan engine.
    """
    import os

    grid = system.bins
    assert grid is not None
    lr_slot = None
    if layout == "lr" and system.lr_bins is not None:
        grid = system.lr_bins
        lr_slot = system.lr_slot
    cell0 = system.cell[0] if system.cell is not None else None
    radius = stencil_radius(cutoff, grid, cell0)

    engine = os.environ.get("AIMNET_PAIR_ENGINE", "xla")
    if grid.molecule_bins:
        engine = "xla"  # radius-0 within-bin sweeps: no banded tables apply
    if n_out > 1:
        engine = "xla"  # multi-member sweeps: tuple accumulators, XLA scan
    if allow_pallas and engine in ("pallas", "auto"):
        from aimnetcentral_tpu.kernels.pair_sweep import (
            pair_energy_pallas,
            pair_sweep_available,
        )

        banded_ok = grid.nbins[2] >= 2 * radius + 1 and (
            all(grid.axes_periodic) or not any(grid.axes_periodic)
        )
        use = pair_sweep_available() and (
            engine == "pallas"
            or (banded_ok and jax.default_backend() == "tpu")
        )
        if use:
            return pair_energy_pallas(
                system, cutoff, e_pair_fn, extra_blocks, layout
            )

    blocks = {"coord": system.coord, "numbers": system.numbers}
    if extra_blocks:
        blocks.update(extra_blocks)
    n_sr = system.coord.shape[0]
    if lr_slot is not None:
        blocks = {k: jnp.take(v, lr_slot, axis=0) for k, v in blocks.items()}

    b_tot, c = grid.total_bins, grid.capacity
    self_blocks = {k: v.reshape((b_tot, c) + v.shape[1:]) for k, v in blocks.items()}

    nbr_np, wrap_np, zero_np = B.stencil_tables(grid, radius)
    half = np.zeros(len(zero_np), dtype=bool)
    offs = B.stencil_offsets(radius)
    for i, o in enumerate(offs):
        half[i] = bool(zero_np[i]) or (tuple(o) > (0, 0, 0))
    nbr = jnp.asarray(nbr_np[half])
    wraps = jnp.asarray(wrap_np[half])
    is_zero = jnp.asarray(zero_np[half])

    diag = jnp.eye(c, dtype=bool)[None]
    dtype = system.coord.dtype
    acc0 = tuple(jnp.zeros((b_tot, c), dtype) for _ in range(n_out))

    @jax.checkpoint
    def inner(acc, step):
        nbr_s, wrap_s, zero_s = step
        safe_nbr = jnp.maximum(nbr_s, 0)
        cand = {k: v[safe_nbr] for k, v in self_blocks.items()}
        if grid.periodic:
            shift_cart = aops.cellmul(wrap_s, cell0)[:, None, :]
        else:
            shift_cart = jnp.zeros((b_tot, 1, 3), dtype=dtype)
        if all(grid.axes_periodic):
            valid = jnp.ones((b_tot, 1, 1), dtype=bool)
        else:
            valid = (nbr_s >= 0)[:, None, None]
        not_self = ~(zero_s & diag)
        _dk, d, valid_pair = _pair_geometry(self_blocks, cand, shift_cart, valid, not_self)
        valid_pair = valid_pair & (d < cutoff)
        es = e_pair_fn(d, valid_pair, self_blocks, cand)
        if n_out == 1:
            es = (es,)
        new_acc = []
        for a_prev, e_raw in zip(acc, es):
            e = jnp.where(valid_pair, e_raw, 0.0)
            a_new = a_prev + e.sum(-1)  # self side (B, C)
            # mirror side: scatter pair sums back to the candidate bin (skip
            # the zero offset — its within-bin enumeration covers both sides)
            mirror = jnp.where(zero_s, 0.0, e.sum(-2))  # (B, Cc)
            new_acc.append(a_new.at[safe_nbr].add(mirror))
        return tuple(new_acc)

    def body(acc, step):
        return inner(acc, step), None

    accs, _ = jax.lax.scan(body, acc0, (nbr, wraps, is_zero))
    accs = [a.reshape(-1) for a in accs]
    if lr_slot is not None:
        # back to SR slot order via the prebuilt inverse map — a GATHER
        # (sentinel row appended for SR padding slots absent from the LR
        # layout; real atoms map bijectively)
        accs = [
            jnp.take(
                jnp.concatenate([a, jnp.zeros((1,), a.dtype)]),
                system.lr_inv,
                axis=0,
            )
            for a in accs
        ]
    if n_out == 1:
        return accs[0]
    return jnp.stack(accs, axis=-1)  # (L, n_out)


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


def coulomb_simple_binned(
    system: System, q: Array, rc, envelope: str, subtract_sr: bool
) -> Array:
    """Unbounded pairwise Coulomb, optionally minus the SR-envelope part
    (twin of models/lr.py::coulomb_simple).  Only exact on molecule-bin
    grids, where the radius-0 sweep enumerates ALL intra-molecular pairs —
    on spatial grids a bare-1/r sum would be stencil-truncated (that is why
    periodic systems auto-switch to DSF)."""
    grid = system.bins
    assert grid is not None and grid.molecule_bins, (
        "simple Coulomb on the binned engine requires the molecule-bin "
        "packed layout (training batches); periodic/spatial systems use DSF"
    )

    def e_fn(d, valid, self_b, cand_b):
        qq = self_b["q"][..., :, None] * cand_b["q"][..., None, :]
        e_pair = 1.0 / d
        if subtract_sr:
            if envelope == "exp":
                x = jnp.clip(d / rc, 0.0, 1.0 - 1e-6)
                fc = jnp.where(
                    d < rc,
                    jnp.exp(-1.0 / (1.0 - x * x)) / 0.36787944117144233,
                    0.0,
                )
            else:
                fc = jnp.where(
                    d < rc,
                    0.5 * (jnp.cos(jnp.clip(d, 1e-6, rc) * (jnp.pi / rc)) + 1.0),
                    0.0,
                )
            e_pair = e_pair - fc / d
        return qq * e_pair

    e_i = pair_energy_binned(system, float("inf"), e_fn, {"q": q})
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
            aops.erfc_approx(alpha * d) / d
            - shift_val
            + (d - dsf_rc) * shift_slope
        )
        if subtract_sr:
            # fuse the SR subtraction into the same sweep: the SR envelope is
            # identically zero beyond its rc << dsf_rc, so evaluating it on
            # the DSF stencil is exact and saves a second pair sweep
            if envelope == "exp":
                x = jnp.clip(d / rc, 0.0, 1.0 - 1e-6)
                fc = jnp.exp(-1.0 / (1.0 - x * x)) / 0.36787944117144233
            else:
                fc = jnp.where(
                    d < rc,
                    0.5 * (jnp.cos(jnp.clip(d, 1e-6, rc) * (jnp.pi / rc)) + 1.0),
                    0.0,
                )
            e_pair = e_pair - fc / d
        return qq * e_pair

    e_i = pair_energy_binned(system, dsf_rc, e_fn, {"q": q}, layout="lr")
    e = FACTOR * nbops.mol_sum(e_i, system.mol_idx, system.num_mol)

    self_coeff = -(shift_val / 2.0 + alpha / math.sqrt(math.pi))
    q_real = jnp.where(system.numbers > 0, q, 0.0)
    e = e + 2.0 * FACTOR * nbops.mol_sum(
        self_coeff * q_real * q_real, system.mol_idx, system.num_mol
    )
    return e


def _sr_envelope(d: Array, rc, envelope: str) -> Array:
    """SR Coulomb cutoff envelope (identically zero at d >= rc for exp)."""
    if envelope == "exp":
        x = jnp.clip(d / rc, 0.0, 1.0 - 1e-6)
        fc = jnp.exp(-1.0 / (1.0 - x * x)) / 0.36787944117144233
        return jnp.where(d < rc, fc, 0.0)
    fc = 0.5 * (jnp.cos(jnp.clip(d, 1e-6, rc) * (jnp.pi / rc)) + 1.0)
    return jnp.where(d < rc, fc, 0.0)


def coulomb_dsf_binned_multi(
    system: System,
    q: Array,  # (L, E) member-stacked charges
    rc,
    dsf_alpha: float,
    dsf_rc: float,
    envelope: str,
    subtract_sr: bool,
) -> Array:
    """Member-stacked twin of :func:`coulomb_dsf_binned`: ONE pair sweep
    (geometry + erfc kernel + SR envelope computed once, shared across all
    ensemble members — the per-member cost is one charge product each)
    returning per-member per-molecule energies ``(num_mol, E)``.

    This is the ensemble-fusion lever for the LR stack (VERDICT r3 next #1):
    members share identical pair geometry, so the radial kernel must never
    be recomputed per member.
    """
    from aimnetcentral_tpu.models.lr import FACTOR

    n_e = q.shape[1]
    alpha = dsf_alpha
    erfc_rc = math.erfc(alpha * dsf_rc)
    shift_val = erfc_rc / dsf_rc
    shift_slope = erfc_rc / dsf_rc**2 + (
        2.0 * alpha / math.sqrt(math.pi) * math.exp(-((alpha * dsf_rc) ** 2)) / dsf_rc
    )

    def e_fn(d, valid, self_b, cand_b):
        kernel = (
            aops.erfc_approx(alpha * d) / d
            - shift_val
            + (d - dsf_rc) * shift_slope
        )
        if subtract_sr:
            kernel = kernel - _sr_envelope(d, rc, envelope) / d
        return tuple(
            kernel
            * (self_b["q"][..., :, None, e] * cand_b["q"][..., None, :, e])
            for e in range(n_e)
        )

    e_i = pair_energy_binned(
        system, dsf_rc, e_fn, {"q": q}, layout="lr", n_out=n_e
    )  # (L, E)
    e = FACTOR * nbops.mol_sum(e_i, system.mol_idx, system.num_mol)  # (M, E)

    self_coeff = -(shift_val / 2.0 + alpha / math.sqrt(math.pi))
    q_real = jnp.where((system.numbers > 0)[:, None], q, 0.0)
    e = e + 2.0 * FACTOR * nbops.mol_sum(
        self_coeff * q_real * q_real, system.mol_idx, system.num_mol
    )
    return e


def coulomb_sr_binned_multi(system: System, q: Array, rc, envelope: str) -> Array:
    """Member-stacked twin of :func:`coulomb_sr_binned`: q ``(L, E)`` ->
    ``(num_mol, E)``, one shared sweep."""
    from aimnetcentral_tpu.models.lr import FACTOR

    n_e = q.shape[1]

    def e_fn(d, valid, self_b, cand_b):
        kernel = _sr_envelope(d, rc, envelope) / d
        return tuple(
            kernel
            * (self_b["q"][..., :, None, e] * cand_b["q"][..., None, :, e])
            for e in range(n_e)
        )

    e_i = pair_energy_binned(system, float(rc), e_fn, {"q": q}, n_out=n_e)
    return FACTOR * nbops.mol_sum(e_i, system.mol_idx, system.num_mol)


def coulomb_simple_binned_multi(
    system: System, q: Array, rc, envelope: str, subtract_sr: bool
) -> Array:
    """Member-stacked twin of :func:`coulomb_simple_binned` (molecule-bin
    packed layouts only): q ``(L, E)`` -> ``(num_mol, E)``, one shared sweep."""
    grid = system.bins
    assert grid is not None and grid.molecule_bins, (
        "simple Coulomb on the binned engine requires the molecule-bin "
        "packed layout (training batches); periodic/spatial systems use DSF"
    )
    from aimnetcentral_tpu.models.lr import FACTOR

    n_e = q.shape[1]

    def e_fn(d, valid, self_b, cand_b):
        kernel = 1.0 / d
        if subtract_sr:
            kernel = kernel - _sr_envelope(d, rc, envelope) / d
        return tuple(
            kernel
            * (self_b["q"][..., :, None, e] * cand_b["q"][..., None, :, e])
            for e in range(n_e)
        )

    e_i = pair_energy_binned(system, float("inf"), e_fn, {"q": q}, n_out=n_e)
    return FACTOR * nbops.mol_sum(e_i, system.mol_idx, system.num_mol)


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
        return qq * aops.erfc_approx(d / (math.sqrt(2.0) * eta)) / d

    # eta may be traced (per-system accuracy estimation): the Pallas kernel
    # can only trace e_fns over host-constant closures
    e_i = pair_energy_binned(
        system, r_cutoff_static, e_fn, {"q": q}, layout="lr",
        allow_pallas=isinstance(eta, (int, float)),
    )
    return 0.5 * nbops.mol_sum(e_i, system.mol_idx, system.num_mol)


def ewald_real_binned_multi(
    system: System, q: Array, eta, r_cutoff_static: float
) -> Array:
    """Member-stacked twin of :func:`ewald_real_binned`: q ``(L, E)`` ->
    ``(num_mol, E)`` (no k_e).  One pair sweep evaluates the erfc screening
    kernel; each member pays only its charge product — the real-space leg of
    the fused-ensemble Ewald."""
    n_e = q.shape[1]

    def e_fn(d, valid, self_b, cand_b):
        kernel = aops.erfc_approx(d / (math.sqrt(2.0) * eta)) / d
        return tuple(
            kernel
            * (self_b["q"][..., :, None, e] * cand_b["q"][..., None, :, e])
            for e in range(n_e)
        )

    e_i = pair_energy_binned(
        system, r_cutoff_static, e_fn, {"q": q}, layout="lr", n_out=n_e,
        allow_pallas=isinstance(eta, (int, float)),
    )
    return 0.5 * nbops.mol_sum(e_i, system.mol_idx, system.num_mol)


def pair_sum_binned(
    system: System,
    cutoff: float,
    e_pair_fn: Callable,
    extra_blocks: dict[str, Array] | None = None,
    layout: str = "sr",
) -> Array:
    """Alias of :func:`pair_energy_binned` for non-energy per-atom pair sums
    (coordination numbers etc.)."""
    return pair_energy_binned(system, cutoff, e_pair_fn, extra_blocks, layout)


def dftd3_binned(
    system: System,
    tables: dict[str, Array],
    a1: float,
    a2: float,
    s8: float,
    s6: float = 1.0,
    smoothing_on: float = 12.0,
    smoothing_off: float = 15.0,
) -> Array:
    """DFT-D3(BJ) on the binned layout via an exactly factorized C6 model.

    The Grimme D3 reference tables factorize (verified numerically from the
    data): validity c6ab[zi,zj,k,l] != 0 iff k < nref(zi) and l < nref(zj),
    and cn_ref[zi,zj,k,:] depends only on (zi,k).  The Gaussian CN weights
    therefore split per atom, and

        c6_ij = P_i^T  M  P_j,   P_i = normalized_weights(cn_i) x onehot(spec_i)

    with M a constant (5S x 5S) matrix over the S species present (static on
    the System).  The per-pair C6 becomes one dense dot over 5S dims — MXU
    work instead of (N, M, 5, 5) per-pair table gathers
    (cf. the indexed path models/lr.py::dftd3_energy).
    """
    assert system.species, "binned D3 needs System.species (set by builders)"
    cn = pair_sum_binned(
        system, smoothing_off, d3_cn_fn(),
        {"rcov": tables["rcov"][system.numbers]}, layout="lr",
    )
    extras = d3_pair_extras(system.species, system.numbers, cn, tables)
    e_i = pair_energy_binned(
        system, smoothing_off,
        d3_e_fn(a1, a2, s8, s6, smoothing_on, smoothing_off),
        extras, layout="lr",
    )
    return constants.half_Hartree * nbops.mol_sum(e_i, system.mol_idx, system.num_mol)


def d3_cn_fn() -> Callable:
    """Pair term for the D3 coordination-number sweep."""
    bohr_inv = constants.Bohr_inv

    def cn_fn(d, valid, self_b, cand_b):
        rsum = self_b["rcov"][..., :, None] + cand_b["rcov"][..., None, :]
        return jax.nn.sigmoid(16.0 * (rsum / jnp.clip(d * bohr_inv, 1e-12, None) - 1.0))

    return cn_fn


def d3_pair_extras(
    species: tuple, numbers: Array, cn: Array, tables: dict[str, Array]
) -> dict[str, Array]:
    """Factorized per-atom D3 vectors (p, r, rr) from coordination numbers.

    The (nref, cnref, M) factorization structure is built HOST-side from the
    canonical constant copies — ``tables`` entries may be jit tracers (they
    ride in the param pytree), which must never feed host numpy control flow.
    """
    s_count = len(species)
    # map atomic numbers -> species slot (0 for padding; padding masked later)
    zmap = np.zeros(95, dtype=np.int32)
    for i, zz in enumerate(species):
        zmap[zz] = i
    spec_idx = jnp.asarray(zmap)[numbers]  # (L,)

    species_arr = np.asarray(species)
    tables_np = constants.get_d3_tables()
    c6_sp = tables_np["c6ab"][species_arr[:, None], species_arr[None, :]]  # (S,S,5,5)
    cn_sp = tables_np["cn_ref"][species_arr[:, None], species_arr[None, :]]
    nz = np.asarray(c6_sp) != 0
    nref = jnp.asarray(nz.any(axis=(1, 3)).sum(axis=1).astype(np.int32))  # (S,)
    # cnref_i(z, k): read off any valid (zj, l) column
    cnref_sp = np.zeros((s_count, 5), dtype=np.float32)
    cn_sp_np = np.asarray(cn_sp)
    for a in range(s_count):
        for k in range(5):
            vals = cn_sp_np[a, :, k, :][nz[a, :, k, :]]
            cnref_sp[a, k] = vals[0] if len(vals) else 0.0
    cnref_sp = jnp.asarray(cnref_sp)
    # M[(k,a),(l,b)] = c6ab[a,b,k,l]
    m_mat = jnp.asarray(
        np.transpose(np.asarray(c6_sp), (2, 0, 3, 1)).reshape(5 * s_count, 5 * s_count)
    )

    k_ids = jnp.arange(5, dtype=jnp.int32)
    w = jnp.exp(-4.0 * (cn[:, None] - cnref_sp[spec_idx]) ** 2)
    w = jnp.where(k_ids[None, :] < nref[spec_idx][:, None], w, 0.0)
    wsum = w.sum(-1)
    v = w / jnp.clip(wsum, 1e-12, None)[:, None]
    v = jnp.where((wsum > 1e-12)[:, None], v, 0.0)
    p_vec = (
        v[:, :, None] * jax.nn.one_hot(spec_idx, s_count, dtype=v.dtype)[:, None, :]
    ).reshape(-1, 5 * s_count)
    r_vec = p_vec @ m_mat.T  # (L, 5S): c6_ij = p_i . r_j
    return {"p": p_vec, "r": r_vec, "rr": tables["r4r2"][numbers]}


def d3_e_fn(a1, a2, s8, s6, smoothing_on, smoothing_off) -> Callable:
    """Pair term for the D3(BJ) energy sweep over the factorized extras."""
    bohr_inv = constants.Bohr_inv
    r_on = smoothing_on * bohr_inv
    r_off = smoothing_off * bohr_inv

    def e_fn(d, valid, self_b, cand_b):
        d_b = jnp.clip(d * bohr_inv, 1e-12, None)
        # rank-agnostic: (..., C, 5S) x (..., Cc, 5S) -> (..., C, Cc), so the
        # same fn traces on (B, C, K) XLA blocks and (C, K) Pallas tiles
        c6 = jnp.einsum("...ix,...cx->...ic", self_b["p"], cand_b["r"])
        rr = 3.0 * self_b["rr"][..., :, None] * cand_b["rr"][..., None, :]
        r0 = a1 * jnp.sqrt(rr) + a2
        d2 = d_b * d_b
        d6 = d2 * d2 * d2
        d8 = d6 * d2
        r0_2 = r0 * r0
        r0_6 = r0_2 * r0_2 * r0_2
        r0_8 = r0_6 * r0_2
        damping = s6 / (d6 + r0_6) + s8 * rr / (d8 + r0_8)
        from aimnetcentral_tpu.models.lr import _s5_switch

        switch = _s5_switch(d_b, r_on, r_off)
        return -c6 * damping * switch

    return e_fn


def d3ts_binned(
    system: System,
    params: dict[str, Array],
    disp_param: Array,
    a1: float,
    a2: float,
    s8: float,
    s6: float = 1.0,
    cutoff: float = 15.0,
) -> Array:
    """Binned twin of models/lr.py::d3ts_energy (TS combination rule over
    NN-predicted per-atom C6/alpha)."""
    rr_at = params["r4r2"][system.numbers]
    bohr_inv = constants.Bohr_inv

    def e_fn(d, valid, self_b, cand_b):
        c6_i = self_b["dp"][..., :, None, 0]
        al_i = self_b["dp"][..., :, None, 1]
        c6_j = cand_b["dp"][..., None, :, 0]
        al_j = cand_b["dp"][..., None, :, 1]
        denom = jnp.clip(c6_i * al_j / al_i + c6_j * al_i / al_j, 1e-4, None)
        c6ij = 2.0 * c6_i * c6_j / denom
        rr = 3.0 * self_b["rr"][..., :, None] * cand_b["rr"][..., None, :]
        rr = jnp.where(valid, rr, 1.0)
        r0 = a1 * jnp.sqrt(rr) + a2
        d_b = d * bohr_inv
        return -c6ij * (
            s6 / (d_b**6 + r0**6) + s8 * rr / (d_b**8 + r0**8)
        )

    e_i = pair_energy_binned(
        system, cutoff, e_fn, {"dp": disp_param, "rr": rr_at}, layout="lr"
    )
    return constants.half_Hartree * nbops.mol_sum(e_i, system.mol_idx, system.num_mol)


def d3ts_binned_multi(
    system: System,
    params: dict[str, Array],
    disp_param: Array,  # (L, E, 2) member-stacked NN dispersion params
    a1: float,
    a2: float,
    s8: float,
    s6: float = 1.0,
    cutoff: float = 15.0,
) -> Array:
    """Member-stacked twin of :func:`d3ts_binned`: ONE pair sweep — geometry,
    ``rr``, ``r0`` and the BJ damping factor are member-independent and
    computed once; each member pays only its TS C6 combination.  Returns
    ``(num_mol, E)``."""
    rr_at = params["r4r2"][system.numbers]
    bohr_inv = constants.Bohr_inv
    n_e = disp_param.shape[1]

    def e_fn(d, valid, self_b, cand_b):
        rr = 3.0 * self_b["rr"][..., :, None] * cand_b["rr"][..., None, :]
        rr = jnp.where(valid, rr, 1.0)
        r0 = a1 * jnp.sqrt(rr) + a2
        d_b = d * bohr_inv
        damp = s6 / (d_b**6 + r0**6) + s8 * rr / (d_b**8 + r0**8)
        outs = []
        for e in range(n_e):
            c6_i = self_b["dp"][..., :, None, e, 0]
            al_i = self_b["dp"][..., :, None, e, 1]
            c6_j = cand_b["dp"][..., None, :, e, 0]
            al_j = cand_b["dp"][..., None, :, e, 1]
            denom = jnp.clip(c6_i * al_j / al_i + c6_j * al_i / al_j, 1e-4, None)
            outs.append(-2.0 * c6_i * c6_j / denom * damp)
        return tuple(outs)

    e_i = pair_energy_binned(
        system, cutoff, e_fn, {"dp": disp_param, "rr": rr_at},
        layout="lr", n_out=n_e,
    )
    return constants.half_Hartree * nbops.mol_sum(e_i, system.mol_idx, system.num_mol)
