"""Particle-Mesh Ewald: B-spline charge spreading + FFT reciprocal space.

Differentiable replacement for the reference's nvalchemiops PME kernel (K8 in
SURVEY.md §2.2; reference aimnet/modules/lr.py:74-115, 752-765) — as with
every other long-range term here, it is written once, differentiably, so
forces/stress/Hessians are plain autograd (the reference needs fixed-charge
finite differences for PME Hessians, aimnet/modules/lr.py:850-901).

Standard smooth-PME formulation (Essmann et al. 1995), single cell:
- cardinal B-spline (order 4) charge spreading onto a (K1,K2,K3) mesh,
- 3D FFT, reciprocal energy with Gaussian screen and |B(m)|^2 deconvolution,
- real-space erfc part over the neighbor structure + self + background.

Measured crossover (TPU v5e, tools/bench_lr_crossover.py, round 5): PME
matches exact Ewald at 10k atoms already (379 vs 399 ms/call for
energy+forces) and is the ONLY feasible method beyond ~30k — the exact
Ewald's materialized (N, K) phase matrix outgrows HBM there (K scales with
N at fixed accuracy) and the compile fails.  PME scales near-linearly
through 100k (4.1 s/call).  Guidance: ewald up to ~10-20k atoms, pme
beyond; see docs/long_range.md for the measured table.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from aimnetcentral_tpu.ops import math as aops
import numpy as np

from aimnetcentral_tpu import constants

Array = jax.Array

SPLINE_ORDER = 4


def bspline4_weights(u: Array) -> Array:
    """Cardinal B-spline order-4 weights for fractional offset u in [0,1).

    Returns (..., 4) weights for mesh points floor(u)-1 .. floor(u)+2
    (M4 evaluated at u+1, u, u-1... standard smooth-PME spreading).
    """
    # M4(x) on knots: weights for the 4 nearest mesh points
    w0 = (1.0 - u) ** 3 / 6.0
    w1 = (3.0 * u**3 - 6.0 * u**2 + 4.0) / 6.0
    w2 = (-3.0 * u**3 + 3.0 * u**2 + 3.0 * u + 1.0) / 6.0
    w3 = u**3 / 6.0
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def _bspline_moduli(k: int) -> np.ndarray:
    """|b(m)|^2 deconvolution factors for one dimension (host-side)."""
    # Fourier transform of the order-4 cardinal B-spline sampled on the mesh
    m4 = np.zeros(k)
    # M4 values at integer nodes 1, 2, 3 (M4(1)=1/6, M4(2)=2/3, M4(3)=1/6)
    m4[1 % k] = 1.0 / 6.0
    m4[2 % k] = 2.0 / 3.0
    m4[3 % k] = 1.0 / 6.0
    b = np.fft.fft(m4)
    mod = np.abs(b) ** 2
    # guard zeros (odd mesh points where the spline transform vanishes)
    tiny = mod < 1e-7
    if tiny.any():
        mod[tiny] = (np.roll(mod, 1)[tiny] + np.roll(mod, -1)[tiny]) / 2.0
    return mod


def estimate_pme_mesh(cell: np.ndarray, accuracy: float = 1e-6) -> tuple[int, int, int]:
    """Mesh dims: ~1 point per Angstrom scaled by accuracy, FFT-friendly."""
    lengths = np.linalg.norm(np.asarray(cell, dtype=np.float64), axis=1)
    scale = max(1.0, (math.log10(1.0 / max(accuracy, 1e-12)) / 6.0))

    def nice(n: int) -> int:
        n = max(8, n)
        while True:
            m = n
            for p in (2, 3, 5):
                while m % p == 0:
                    m //= p
            if m == 1:
                return n
            n += 1

    return tuple(nice(int(np.ceil(l * scale))) for l in lengths)


def pme_reciprocal_energy(
    coord: Array,
    charges: Array,
    cell: Array,
    eta: Array,
    mesh: tuple[int, int, int],
) -> Array:
    """Reciprocal-space PME energy (single system, no k_e factor)."""
    k1, k2, k3 = mesh
    inv_cell = jnp.linalg.inv(cell)
    frac = aops.cellmul(coord, inv_cell)
    frac = frac - jnp.floor(frac)  # [0, 1)

    mesh_arr = jnp.array(mesh, dtype=coord.dtype)
    scaled = frac * mesh_arr  # (N, 3)
    base = jnp.floor(scaled).astype(jnp.int32)  # (N, 3)
    u = scaled - base
    w = bspline4_weights(u)  # (N, 3, 4)

    offs = jnp.arange(-1, 3, dtype=jnp.int32)  # spline support points
    # grid indices per dim: (N, 4)
    idx = (base[:, :, None] + offs[None, None, :]) % jnp.array(mesh, dtype=jnp.int32)[
        None, :, None
    ]

    # outer-product weights (N, 4, 4, 4) and flat mesh scatter
    w3 = w[:, 0, :, None, None] * w[:, 1, None, :, None] * w[:, 2, None, None, :]
    flat_idx = (
        (idx[:, 0, :, None, None] * k2 + idx[:, 1, None, :, None]) * k3
        + idx[:, 2, None, None, :]
    ).reshape(-1)
    vals = (charges[:, None, None, None] * w3).reshape(-1)
    rho = jnp.zeros((k1 * k2 * k3,), coord.dtype).at[flat_idx].add(vals)
    rho = rho.reshape(mesh)

    rho_k = jnp.fft.fftn(rho)

    # reciprocal vectors for FFT frequencies
    recip = 2.0 * jnp.pi * inv_cell.T  # rows = b_i
    fx = jnp.fft.fftfreq(k1) * k1
    fy = jnp.fft.fftfreq(k2) * k2
    fz = jnp.fft.fftfreq(k3) * k3
    kx = (
        fx[:, None, None, None] * recip[0]
        + fy[None, :, None, None] * recip[1]
        + fz[None, None, :, None] * recip[2]
    )  # (k1,k2,k3,3)
    kk = jnp.sum(kx * kx, axis=-1)

    bmod = (
        jnp.asarray(_bspline_moduli(k1))[:, None, None]
        * jnp.asarray(_bspline_moduli(k2))[None, :, None]
        * jnp.asarray(_bspline_moduli(k3))[None, None, :]
    )

    volume = jnp.abs(jnp.linalg.det(cell))
    mask = kk > 1e-12
    green = jnp.where(mask, jnp.exp(-0.5 * eta * eta * kk) / jnp.where(mask, kk, 1.0), 0.0)
    s2 = jnp.abs(rho_k) ** 2
    return (2.0 * jnp.pi / volume) * jnp.sum(green * s2 / bmod)


def pme_spread_charges(
    coord: Array,
    charges: Array,
    inv_cells_at: Array,  # (N, 3, 3) per-atom inverse cell (HIGHEST products)
    mol_idx: Array,
    num_mol: int,
    mesh: tuple[int, int, int],
) -> Array:
    """B-spline charge spreading onto per-molecule meshes of ONE shared
    padded FFT shape: (num_mol, K1, K2, K3).  Padding atoms carry
    ``mol_idx == num_mol`` and land in a trash mesh that is dropped.
    Shared by the batched PME (below) and the spatial PME route
    (parallel/spatial.py — shard-local spreads psum'd over the ring)."""
    k1, k2, k3 = mesh
    ktot = k1 * k2 * k3
    frac = jnp.einsum(
        "nd,ndh->nh", coord, inv_cells_at, precision=jax.lax.Precision.HIGHEST
    )
    frac = frac - jnp.floor(frac)  # [0, 1)
    mesh_arr = jnp.array(mesh, dtype=coord.dtype)
    scaled = frac * mesh_arr
    base = jnp.floor(scaled).astype(jnp.int32)
    u = scaled - base
    w = bspline4_weights(u)  # (N, 3, 4)
    offs = jnp.arange(-1, 3, dtype=jnp.int32)
    idx = (base[:, :, None] + offs[None, None, :]) % jnp.array(
        mesh, dtype=jnp.int32
    )[None, :, None]
    w3 = w[:, 0, :, None, None] * w[:, 1, None, :, None] * w[:, 2, None, None, :]
    flat_idx = (
        (idx[:, 0, :, None, None] * k2 + idx[:, 1, None, :, None]) * k3
        + idx[:, 2, None, None, :]
    )
    flat_idx = (flat_idx + mol_idx[:, None, None, None] * ktot).reshape(-1)
    vals = (charges[:, None, None, None] * w3).reshape(-1)
    rho = jnp.zeros(((num_mol + 1) * ktot,), coord.dtype).at[flat_idx].add(vals)
    return rho[: num_mol * ktot].reshape((num_mol, k1, k2, k3))


def pme_reciprocal_from_rho(
    rho: Array,  # (B, K1, K2, K3) spread charge meshes
    cells: Array,  # (B, 3, 3)
    eta_b: Array,  # (B,)
    mesh: tuple[int, int, int],
) -> Array:
    """Reciprocal energies (B,) from already-spread meshes (no k_e)."""
    k1, k2, k3 = mesh
    rho_k = jnp.fft.fftn(rho, axes=(1, 2, 3))
    recip = 2.0 * jnp.pi * jnp.linalg.inv(cells).transpose(0, 2, 1)  # (B,3,3)
    fx = jnp.fft.fftfreq(k1) * k1
    fy = jnp.fft.fftfreq(k2) * k2
    fz = jnp.fft.fftfreq(k3) * k3
    fgrid = jnp.stack(
        jnp.meshgrid(fx, fy, fz, indexing="ij"), axis=-1
    ).astype(rho.dtype)  # (K1,K2,K3,3) integer frequencies
    kvec = jnp.einsum(
        "xyzd,bdh->bxyzh", fgrid, recip, precision=jax.lax.Precision.HIGHEST
    )
    kk = jnp.sum(kvec * kvec, axis=-1)  # (B,K1,K2,K3)
    bmod = (
        jnp.asarray(_bspline_moduli(k1))[:, None, None]
        * jnp.asarray(_bspline_moduli(k2))[None, :, None]
        * jnp.asarray(_bspline_moduli(k3))[None, None, :]
    ).astype(rho.dtype)
    volume = jnp.abs(jnp.linalg.det(cells))  # (B,)
    mask = kk > 1e-12
    green = jnp.where(
        mask,
        jnp.exp(-0.5 * (eta_b * eta_b)[:, None, None, None] * kk)
        / jnp.where(mask, kk, 1.0),
        0.0,
    )
    s2 = jnp.abs(rho_k) ** 2
    return (2.0 * jnp.pi / volume) * jnp.sum(
        green * s2 / bmod[None], axis=(1, 2, 3)
    )


def pme_reciprocal_energy_batched(
    coord: Array,
    charges: Array,
    cells: Array,  # (B, 3, 3)
    mol_idx: Array,
    num_mol: int,
    eta_b: Array,  # (B,)
    mesh: tuple[int, int, int],
) -> Array:
    """Batched reciprocal-space PME (B,): per-molecule meshes over ONE
    shared padded FFT shape (batched 3D FFT + per-molecule Green function).
    The reference PME handles batches via batch_idx
    (reference aimnet/modules/lr.py:674-700); here the batch axis is the
    leading mesh axis — shared static shape, per-molecule masking, exactly
    like the shared Ewald k-grid."""
    inv_cells = jnp.linalg.inv(cells)
    inv_ext = jnp.concatenate(
        [inv_cells, jnp.eye(3, dtype=cells.dtype)[None]], axis=0
    )
    inv_at = jnp.take(inv_ext, mol_idx, axis=0)  # (N,3,3)
    rho = pme_spread_charges(coord, charges, inv_at, mol_idx, num_mol, mesh)
    return pme_reciprocal_from_rho(rho, cells, eta_b, mesh)


def pme_spread_charges_multi(
    coord: Array,
    q_st: Array,  # (N, E) member-stacked charges
    inv_cells_at: Array,  # (N, 3, 3)
    mol_idx: Array,
    num_mol: int,
    mesh: tuple[int, int, int],
) -> Array:
    """Member-fused B-spline spreading: ONE set of spline weights + mesh
    indices (geometry-only, member-independent) scattered with an E-wide
    value vector -> (num_mol, E, K1, K2, K3).  The PME leg of the ensemble
    fusion: members share the spread geometry exactly, so the only per-member
    cost is the charge payload of the same scatter."""
    k1, k2, k3 = mesh
    ktot = k1 * k2 * k3
    n_e = q_st.shape[1]
    frac = jnp.einsum(
        "nd,ndh->nh", coord, inv_cells_at, precision=jax.lax.Precision.HIGHEST
    )
    frac = frac - jnp.floor(frac)
    mesh_arr = jnp.array(mesh, dtype=coord.dtype)
    scaled = frac * mesh_arr
    base = jnp.floor(scaled).astype(jnp.int32)
    u = scaled - base
    w = bspline4_weights(u)  # (N, 3, 4) shared
    offs = jnp.arange(-1, 3, dtype=jnp.int32)
    idx = (base[:, :, None] + offs[None, None, :]) % jnp.array(
        mesh, dtype=jnp.int32
    )[None, :, None]
    w3 = w[:, 0, :, None, None] * w[:, 1, None, :, None] * w[:, 2, None, None, :]
    flat_idx = (
        (idx[:, 0, :, None, None] * k2 + idx[:, 1, None, :, None]) * k3
        + idx[:, 2, None, None, :]
    )
    flat_idx = (flat_idx + mol_idx[:, None, None, None] * ktot).reshape(-1)
    vals = (q_st[:, None, None, None, :] * w3[..., None]).reshape(-1, n_e)
    rho = jnp.zeros(((num_mol + 1) * ktot, n_e), coord.dtype).at[flat_idx].add(vals)
    rho = rho[: num_mol * ktot].reshape((num_mol, k1, k2, k3, n_e))
    return jnp.moveaxis(rho, -1, 1)  # (M, E, K1, K2, K3)


def pme_reciprocal_energy_batched_multi(
    coord: Array,
    q_st: Array,  # (N, E)
    cells: Array,  # (M, 3, 3)
    mol_idx: Array,
    num_mol: int,
    eta_b: Array,  # (M,)
    mesh: tuple[int, int, int],
) -> Array:
    """Member-fused batched reciprocal PME -> (num_mol, E): shared spread
    geometry, one batched FFT over the (M*E) mesh stack, per-molecule Green
    function broadcast over members."""
    n_e = q_st.shape[1]
    inv_cells = jnp.linalg.inv(cells)
    inv_ext = jnp.concatenate(
        [inv_cells, jnp.eye(3, dtype=cells.dtype)[None]], axis=0
    )
    inv_at = jnp.take(inv_ext, mol_idx, axis=0)
    rho = pme_spread_charges_multi(coord, q_st, inv_at, mol_idx, num_mol, mesh)
    rho_flat = rho.reshape((num_mol * n_e,) + tuple(mesh))
    cells_rep = jnp.repeat(cells, n_e, axis=0)
    eta_rep = jnp.repeat(jnp.asarray(eta_b).reshape(-1), n_e)
    e = pme_reciprocal_from_rho(rho_flat, cells_rep, eta_rep, mesh)
    return e.reshape(num_mol, n_e)


def pme_energy(
    coord: Array,
    charges: Array,
    cell: Array,
    numbers: Array,
    eta: Array,
    mesh: tuple[int, int, int],
    e_real: Array,
) -> Array:
    """Total PME energy in eV for ONE periodic system: caller supplies the
    real-space erfc pair sum ``e_real`` (computed on its neighbor structure —
    indexed or binned), this adds reciprocal + self + background."""
    q = jnp.where(numbers > 0, charges, 0.0)
    e_recip = pme_reciprocal_energy(coord, q, cell, eta, mesh)
    e_self = -jnp.sum(q * q) / (jnp.sqrt(2.0 * jnp.pi) * eta)
    volume = jnp.abs(jnp.linalg.det(cell))
    q_tot = q.sum()
    e_bg = -jnp.pi * q_tot * q_tot * (eta * eta) / volume
    return constants.Hartree * constants.Bohr * (e_real + e_recip + e_self + e_bg)
