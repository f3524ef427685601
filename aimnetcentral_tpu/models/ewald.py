"""Periodic Coulomb: differentiable Ewald summation (and PME) in pure JAX.

Replaces the reference's nvalchemiops Ewald/PME CUDA kernels and their
three-way derivative workarounds (reference aimnet/modules/lr.py:617-960):
written differentiably, so forces/stress/Hessians/HVPs are exact relaxed-
charge autograd for every method.

Conventions: coordinates in Angstrom, charges in e, energies in eV.
Screening Gaussian width ``eta`` (erfc(d / (sqrt(2) eta)) real-space kernel),
matching the reference's legacy pure-torch Ewald
(reference aimnet/ops.py:196-273) which serves as the regression cross-check.

The reciprocal-space structure factors are one (N, K) matmul + two
elementwise trig ops + a segment reduction — MXU/VPU-friendly, no scatter.
The k-grid is chosen on the host at neighbor-build time (static shape; cells
change slowly, recompilation is rare and cheap relative to MD trajectories).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST
import numpy as np

from aimnetcentral_tpu import constants
from aimnetcentral_tpu.ops import nb as nbops
from aimnetcentral_tpu.system import System

Array = jax.Array

KE = constants.Hartree * constants.Bohr  # e^2/Angstrom -> eV


@dataclasses.dataclass(frozen=True)
class EwaldParams:
    """Host-side Ewald discretization (static under jit)."""

    eta: float
    r_cutoff: float
    k_cutoff: float
    kmax: tuple[int, int, int]


def estimate_ewald_parameters(
    cell: np.ndarray, n_atoms: int, accuracy: float = 1e-6
) -> EwaldParams:
    """Balance real/reciprocal work (reference aimnet/ops.py:230-233 heuristic)."""
    volume = abs(np.linalg.det(np.asarray(cell, dtype=np.float64)))
    eta = (volume**2 / max(n_atoms, 1)) ** (1.0 / 6.0) / math.sqrt(2.0 * math.pi)
    w = math.sqrt(-2.0 * math.log(accuracy))
    r_cutoff = w * eta
    k_cutoff = w / eta
    recip = 2.0 * math.pi * np.linalg.inv(np.asarray(cell, dtype=np.float64)).T
    b_norm = np.linalg.norm(recip, axis=1)
    kmax = tuple(int(np.ceil(k_cutoff / b)) for b in b_norm)
    return EwaldParams(eta=eta, r_cutoff=r_cutoff, k_cutoff=k_cutoff, kmax=kmax)


def _k_grid(kmax: tuple[int, int, int]) -> np.ndarray:
    """Integer reciprocal lattice points, zero excluded (host-side, static)."""
    rng = [np.arange(-k, k + 1) for k in kmax]
    pts = np.stack(np.meshgrid(*rng, indexing="ij"), axis=-1).reshape(-1, 3)
    return pts[np.any(pts != 0, axis=1)].astype(np.float32)


def _param_views(eta, r_cutoff, num_mol: int, mol_idx: Array, dtype):
    """Broadcast scalar-or-(num_mol,) Ewald parameters to per-molecule (B,)
    and per-atom (N,) views (padding atoms carry ``mol_idx == B`` and read
    inert values: eta 1, cutoff 0)."""
    ones_b = jnp.ones((num_mol,), dtype)
    eta_b = jnp.asarray(eta).reshape(-1) * ones_b
    rcut_b = jnp.asarray(r_cutoff).reshape(-1) * ones_b
    eta_at = jnp.take(jnp.concatenate([eta_b, jnp.ones(1, eta_b.dtype)]), mol_idx)
    rcut_at = jnp.take(jnp.concatenate([rcut_b, jnp.zeros(1, rcut_b.dtype)]), mol_idx)
    return eta_b, rcut_b, eta_at, rcut_at


def _real_erfc_st(
    coord: Array,
    q_st: Array,  # (N, E) member-stacked charges (padding rows zeroed)
    cell: Array,
    mol_idx: Array,
    num_mol: int,
    nbmat: Array,
    shifts: Array,
    eta_at: Array,
    rcut_at: Array,
) -> Array:
    """Real-space erfc pair sum on the indexed layout -> (num_mol, E), no
    k_e.  The masked pair kernel is member-INDEPENDENT and computed once;
    each member pays one bilinear charge contraction (ordered pairs, 1/2
    factor)."""
    from aimnetcentral_tpu.ops.math import calc_distances

    d_ij, _ = calc_distances(coord, nbmat, shifts, cell, mol_idx)
    valid = nbops.pair_mask(nbmat) & (d_ij < rcut_at[:, None])
    e_pair = jnp.where(
        valid,
        jax.scipy.special.erfc(d_ij / (math.sqrt(2.0) * eta_at[:, None])) / d_ij,
        0.0,
    )  # (N, M_nb) shared kernel
    q_nb = nbops.gather_nb(q_st, nbmat)  # (N, M_nb, E)
    e_real_i = jnp.einsum("nm,nme->ne", e_pair, q_nb, precision=HI) * q_st
    return 0.5 * nbops.mol_sum(e_real_i, mol_idx, num_mol)


def _self_bg_st(
    q_st: Array,  # (N, E)
    eta_b: Array,  # (B,)
    eta_at: Array,  # (N,)
    mol_idx: Array,
    num_mol: int,
    volume: Array,  # (B,)
) -> Array:
    """Self-interaction + neutralizing-background terms -> (num_mol, E), no
    k_e.  E_bg = -pi Q_tot^2 / (2 V alpha^2) with alpha = 1/(sqrt(2) eta),
    so charged cells are well-defined."""
    e_self = -nbops.mol_sum(
        q_st * q_st / eta_at[:, None], mol_idx, num_mol
    ) / math.sqrt(2.0 * math.pi)
    q_tot = nbops.mol_sum(q_st, mol_idx, num_mol)  # (B, E)
    e_bg = -jnp.pi * q_tot * q_tot * (eta_b * eta_b)[:, None] / volume[:, None]
    return e_self + e_bg


def ewald_energy(
    coord: Array,
    charges: Array,
    cell: Array,
    mol_idx: Array,
    num_mol: int,
    numbers: Array,
    nbmat: Array,
    shifts: Array,
    eta: Array,
    r_cutoff: Array,
    k_cutoff: Array,
    k_pts: Array,
) -> Array:
    """Total Ewald electrostatic energy per molecule (num_mol,) in eV.

    ``cell`` is (num_mol, 3, 3); the real-space part runs over the provided
    cutoff-bounded neighbor matrix; the reciprocal part evaluates all
    molecules' structure factors in one batched matmul.  Includes self and
    neutralizing-background terms, so charged cells are well-defined.

    ``eta`` / ``r_cutoff`` / ``k_cutoff`` may be scalars (shared) or
    (num_mol,) arrays (per-molecule accuracy for heterogeneous cells).

    Thin E=1 view of the member-stacked implementation (one shared set of
    formulas serves single models and fused ensembles)."""
    q = jnp.where(numbers > 0, charges, 0.0)
    _eta_b, _rcut_b, eta_at, rcut_at = _param_views(
        eta, r_cutoff, num_mol, mol_idx, coord.dtype
    )
    e_real = _real_erfc_st(
        coord, q[:, None], cell, mol_idx, num_mol, nbmat, shifts, eta_at, rcut_at
    )
    e_other = ewald_nonreal_multi(
        coord, q[:, None], cell, mol_idx, num_mol, eta, k_cutoff, k_pts
    )
    return KE * (e_real + e_other)[:, 0]


def coulomb_periodic_binned(
    data: dict,
    system: System,
    accuracy: float = 1e-6,
    key_in: str = "charges",
) -> Array:
    """Ewald on the binned layout: real-space part via the stencil-roll pair
    engine, reciprocal/self/background parts are layout-agnostic."""
    from aimnetcentral_tpu.models.engine_binned import ewald_real_binned
    from aimnetcentral_tpu.ops import nb as nbops

    if system.cell is None:
        raise ValueError("periodic Coulomb requires a cell")
    if system.ewald_kpts is None or system.ewald_r_static is None:
        raise ValueError("call models.ewald.attach_ewald on the System first")

    q = jnp.where(system.numbers > 0, data[key_in], 0.0)
    # binned systems are single-molecule: collapse per-mol params to scalars
    eta = jnp.asarray(system.ewald_eta).reshape(-1)[0]
    k_cutoff = jnp.asarray(system.ewald_k_cutoff).reshape(-1)[0]
    e_real = ewald_real_binned(system, q, eta, system.ewald_r_static)

    if system.pme_mesh is not None:
        # PME requested (attach_ewald(pme=True)): FFT-mesh reciprocal space
        # instead of the k-point sum; real/self/background are identical
        from aimnetcentral_tpu.models.pme import pme_reciprocal_energy_batched

        _eta_b, _r, eta_at, _rc = _param_views(
            eta, 0.0, system.num_mol, system.mol_idx, system.coord.dtype
        )
        e_recip = pme_reciprocal_energy_batched(
            system.coord, q, system.cell, system.mol_idx, system.num_mol,
            eta.reshape(1), system.pme_mesh,
        )
        volume = jnp.abs(jnp.linalg.det(system.cell))
        e_sb = _self_bg_st(
            q[:, None], _eta_b, eta_at, system.mol_idx, system.num_mol, volume
        )[:, 0]
        return KE * (e_real + e_recip + e_sb)

    e_other = ewald_nonreal_multi(
        system.coord,
        q[:, None],
        system.cell,
        system.mol_idx,
        system.num_mol,
        eta,
        k_cutoff,
        system.ewald_kpts,
    )[:, 0]
    return KE * (e_real + e_other)


def ewald_nonreal_multi(
    coord: Array,
    q_st: Array,  # (N, E) member-stacked charges (padding rows zeroed)
    cell: Array,  # (B, 3, 3)
    mol_idx: Array,
    num_mol: int,
    eta,
    k_cutoff,
    k_pts: Array,
) -> Array:
    """Member-fused reciprocal + self + background terms (no k_e): (M, E).

    The expensive parts — the (N, K) phase matrix e^{ik.r}, its trig images,
    and the k-space Green weights — are member-INDEPENDENT and computed
    exactly once; each member's structure factor S_e(k) is one bilinear
    charge contraction (a (K, E) GEMM for the single-cell case).  This is
    the Ewald leg of the ensemble-fusion lever (same structure as
    engine_binned.coulomb_dsf_binned_multi): 4 members cost ~1x the
    single-member k-space work instead of 4x.  Cf. the reference evaluating
    one PME per batch (reference aimnet/modules/lr.py:674-700) — here the
    member axis is served the same way.
    """
    n_e = q_st.shape[1]
    eta_b, kcut_b, eta_at, _ = _param_views(
        eta, k_cutoff, num_mol, mol_idx, coord.dtype
    )

    recip = 2.0 * jnp.pi * jnp.linalg.inv(cell).transpose(0, 2, 1)  # (B,3,3)
    kvec = jnp.einsum("kd,bdh->bkh", k_pts, recip, precision=HI)
    k2 = jnp.sum(kvec * kvec, axis=-1)  # (B, K)
    kmask = (k2 > 1e-12) & (k2 < (kcut_b * kcut_b)[:, None])
    cell_ext = jnp.concatenate([recip, jnp.zeros((1, 3, 3), recip.dtype)], axis=0)
    atom_recip = jnp.take(cell_ext, mol_idx, axis=0)
    kdir = jnp.einsum("kd,ndh->nkh", k_pts, atom_recip, precision=HI)
    phase = jnp.einsum("nkh,nh->nk", kdir, coord, precision=HI)  # (N, K) shared
    cos_p = jnp.cos(phase)
    sin_p = jnp.sin(phase)
    volume = jnp.abs(jnp.linalg.det(cell))  # (B,)
    w = jnp.where(
        kmask,
        jnp.exp(-0.5 * (eta_b * eta_b)[:, None] * k2) / jnp.where(kmask, k2, 1.0),
        0.0,
    )
    if num_mol == 1:
        # single cell (MD, crystals): the structure factors are ONE GEMM
        s_re = jnp.einsum("nk,ne->ke", cos_p, q_st, precision=HI)  # (K, E)
        s_im = jnp.einsum("nk,ne->ke", sin_p, q_st, precision=HI)
        e_recip = (2.0 * jnp.pi / volume)[:, None] * jnp.sum(
            w[0][:, None] * (s_re * s_re + s_im * s_im), axis=0
        )[None]
    else:
        # batched cells: per-member segment contraction over the SHARED trig
        # images (the member loop re-reads cos_p/sin_p, never recomputes them)
        e_recip = jnp.stack(
            [
                jnp.sum(
                    w
                    * (
                        nbops.mol_sum(q_st[:, e, None] * cos_p, mol_idx, num_mol) ** 2
                        + nbops.mol_sum(q_st[:, e, None] * sin_p, mol_idx, num_mol)
                        ** 2
                    ),
                    axis=-1,
                )
                * (2.0 * jnp.pi / volume)
                for e in range(n_e)
            ],
            axis=-1,
        )  # (M, E)
    return e_recip + _self_bg_st(q_st, eta_b, eta_at, mol_idx, num_mol, volume)


def coulomb_periodic_binned_multi(
    system: System,
    q_st: Array,  # (L, E) member-stacked charges
) -> Array:
    """Member-fused twin of :func:`coulomb_periodic_binned`: (num_mol, E) in
    eV.  Real-space erfc sweep shared via ``ewald_real_binned_multi`` (one
    pair sweep, per-member charge products); reciprocal space via the shared
    phase matrix (Ewald) or shared B-spline spread weights (PME)."""
    from aimnetcentral_tpu.models.engine_binned import ewald_real_binned_multi

    if system.cell is None:
        raise ValueError("periodic Coulomb requires a cell")
    if system.ewald_kpts is None or system.ewald_r_static is None:
        raise ValueError("call models.ewald.attach_ewald on the System first")

    q_st = jnp.where((system.numbers > 0)[:, None], q_st, 0.0)
    # binned systems are single-molecule: collapse per-mol params to scalars
    eta = jnp.asarray(system.ewald_eta).reshape(-1)[0]
    k_cutoff = jnp.asarray(system.ewald_k_cutoff).reshape(-1)[0]
    e_real = ewald_real_binned_multi(system, q_st, eta, system.ewald_r_static)

    if system.pme_mesh is not None:
        from aimnetcentral_tpu.models.pme import pme_reciprocal_energy_batched_multi

        e_recip = pme_reciprocal_energy_batched_multi(
            system.coord, q_st, system.cell, system.mol_idx, system.num_mol,
            eta.reshape(1), system.pme_mesh,
        )
        eta_b, _r, eta_at, _rc = _param_views(
            eta, 0.0, system.num_mol, system.mol_idx, system.coord.dtype
        )
        volume = jnp.abs(jnp.linalg.det(system.cell))  # (M,)
        e_sb = _self_bg_st(
            q_st, eta_b, eta_at, system.mol_idx, system.num_mol, volume
        )
        return KE * (e_real + e_recip + e_sb)

    e_other = ewald_nonreal_multi(
        system.coord,
        q_st,
        system.cell,
        system.mol_idx,
        system.num_mol,
        eta,
        k_cutoff,
        system.ewald_kpts,
    )
    return KE * (e_real + e_other)


def ewald_energy_multi(
    coord: Array,
    q_st: Array,  # (N, E)
    cell: Array,
    mol_idx: Array,
    num_mol: int,
    numbers: Array,
    nbmat: Array,
    shifts: Array,
    eta,
    r_cutoff,
    k_cutoff,
    k_pts: Array,
) -> Array:
    """Member-fused twin of :func:`ewald_energy` on the INDEXED layout:
    (num_mol, E) in eV.  The erfc pair kernel and the phase matrix are
    computed once; members contribute bilinear charge products."""
    q_st = jnp.where((numbers > 0)[:, None], q_st, 0.0)
    _eta_b, _rcut_b, eta_at, rcut_at = _param_views(
        eta, r_cutoff, num_mol, mol_idx, coord.dtype
    )
    e_real = _real_erfc_st(
        coord, q_st, cell, mol_idx, num_mol, nbmat, shifts, eta_at, rcut_at
    )
    e_other = ewald_nonreal_multi(
        coord, q_st, cell, mol_idx, num_mol, eta, k_cutoff, k_pts
    )
    return KE * (e_real + e_other)


def coulomb_periodic_multi(
    q_st: Array,  # (N, E)
    system: System,
    method: str = "ewald",
) -> Array:
    """Member-fused twin of :func:`coulomb_periodic` on the INDEXED layout:
    (num_mol, E) in eV.  Ewald shares the erfc pair kernel + phase matrix;
    PME shares the pair kernel + B-spline spread geometry."""
    if system.cell is None:
        raise ValueError(f"{method} Coulomb requires a periodic cell")
    if system.ewald_kpts is None:
        raise ValueError(
            "System lacks Ewald parameters; call models.ewald.attach_ewald first"
        )
    nb, sh, _sfx = system.resolve_nb("_coulomb", "_lr", "")
    if sh is None:
        raise ValueError("periodic Coulomb requires a PBC neighbor matrix with shifts")
    if method == "pme" and system.pme_mesh is not None:
        from aimnetcentral_tpu.models.pme import pme_reciprocal_energy_batched_multi

        num_mol = system.num_mol
        mol_idx = system.mol_idx
        q_st = jnp.where((system.numbers > 0)[:, None], q_st, 0.0)
        eta_b, _rcut_b, eta_at, rcut_at = _param_views(
            system.ewald_eta, system.ewald_r_cutoff, num_mol, mol_idx,
            system.coord.dtype,
        )
        e_real = _real_erfc_st(
            system.coord, q_st, system.cell, mol_idx, num_mol, nb, sh,
            eta_at, rcut_at,
        )
        e_recip = pme_reciprocal_energy_batched_multi(
            system.coord, q_st, system.cell, mol_idx, num_mol, eta_b,
            system.pme_mesh,
        )
        volume = jnp.abs(jnp.linalg.det(system.cell))
        e_sb = _self_bg_st(q_st, eta_b, eta_at, mol_idx, num_mol, volume)
        return KE * (e_real + e_recip + e_sb)
    return ewald_energy_multi(
        system.coord,
        q_st,
        system.cell,
        system.mol_idx,
        system.num_mol,
        system.numbers,
        nb,
        sh,
        system.ewald_eta,
        system.ewald_r_cutoff,
        system.ewald_k_cutoff,
        system.ewald_kpts,
    )


def attach_ewald(system: System, accuracy: float = 1e-6, pme: bool = False) -> System:
    """Host-side: estimate Ewald discretization from the (concrete) cells and
    attach it to the System.  Call OUTSIDE jit (the calculator does).
    With ``pme=True`` also attaches static FFT mesh dims.

    Batched heterogeneous cells get PER-MOLECULE parameters (eta/k_cutoff
    arrays of shape (num_mol,)); the shared integer k-grid covers the largest
    per-molecule kmax and each molecule masks it at its own k_cutoff, so the
    requested accuracy holds for every cell — not just the first (closes the
    reference-parity gap noted in round 1; cf. reference
    aimnet/calculators/calculator.py:1565-1603 which estimates per call)."""
    assert system.cell is not None
    cells = np.asarray(system.cell)
    numbers = np.asarray(system.numbers)
    mol_idx = np.asarray(system.mol_idx)
    etas, r_cuts, k_cuts = [], [], []
    kmax = (1, 1, 1)
    for m in range(system.num_mol):
        n_at = max(int(((mol_idx == m) & (numbers > 0)).sum()), 1)
        p = estimate_ewald_parameters(cells[m], n_at, accuracy)
        etas.append(p.eta)
        r_cuts.append(p.r_cutoff)
        k_cuts.append(p.k_cutoff)
        kmax = tuple(max(a, b) for a, b in zip(kmax, p.kmax))
    pme_mesh = None
    if pme:
        from aimnetcentral_tpu.models.pme import estimate_pme_mesh

        # one shared padded FFT shape covering every molecule's mesh (a
        # finer-than-needed mesh is strictly MORE accurate, so per-molecule
        # accuracy holds — same policy as the shared k-grid above)
        meshes = [estimate_pme_mesh(cells[m], accuracy) for m in range(system.num_mol)]
        pme_mesh = tuple(max(mm[i] for mm in meshes) for i in range(3))
    return system.replace(
        ewald_kpts=jnp.asarray(_k_grid(kmax)),
        ewald_eta=jnp.asarray(np.array(etas, dtype=np.float32)),
        ewald_r_cutoff=jnp.asarray(np.array(r_cuts, dtype=np.float32)),
        ewald_k_cutoff=jnp.asarray(np.array(k_cuts, dtype=np.float32)),
        ewald_r_static=float(max(r_cuts)),
        pme_mesh=pme_mesh,
    )


def coulomb_periodic(
    data: dict,
    system: System,
    method: str = "ewald",
    accuracy: float = 1e-6,
    key_in: str = "charges",
) -> Array:
    """Entry point used by LRCoulombHead for periodic cells.

    The k-grid and eta must be attached to the System via ``attach_ewald``
    (host-side, outside jit); the calculator does this in ``prepare_system``.
    ``method='pme'`` uses the batched FFT-mesh reciprocal space (reference
    batch_idx PME, aimnet/modules/lr.py:674-700) when ``attach_ewald(
    pme=True)`` sized a mesh, else falls back to the exact Ewald k-sum.
    Thin E=1 view of :func:`coulomb_periodic_multi` — one shared
    implementation serves single models and fused ensembles."""
    return coulomb_periodic_multi(
        jnp.asarray(data[key_in])[:, None], system, method=method
    )[:, 0]
