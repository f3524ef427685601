"""Geometry and physics math ops (distances, cutoffs, basis, charge equilibration).

JAX counterparts of reference aimnet/ops.py, written once for the single flat
layout and fully differentiable (including through PBC shifts and cells).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from aimnetcentral_tpu.ops.nb import expand_mol, gather_nb, mol_sum, pair_mask

Array = jax.Array


HIGHEST = jax.lax.Precision.HIGHEST


def cellmul(a: Array, b: Array) -> Array:
    """Exact-f32 geometry contraction (``a @ b`` at HIGHEST precision).

    Every 3-dim geometry product — ``wraps @ cell``, ``coord @ inv_cell``,
    strain application, Ewald phases — must NEVER run at the TPU's default
    matmul precision: the MXU's bf16 passes truncate the operands to 8
    mantissa bits, displacing periodic images by ~2e-2 A (measured: a 13 A
    cell rounds to 13.0625), which corrupts every boundary-crossing pair
    distance.  K=3 contractions cost nothing at full precision.
    """
    return jnp.matmul(a, b, precision=HIGHEST)


def calc_distances(
    coord: Array,
    nbmat: Array,
    shifts: Array | None = None,
    cell: Array | None = None,
    mol_idx: Array | None = None,
    pad_value: float = 1.0,
) -> tuple[Array, Array]:
    """Pairwise displacement vectors and distances to neighbors.

    Returns ``(d_ij, r_ij)`` with shapes ``(N, M)`` / ``(N, M, 3)``;
    ``r_ij = coord[j] + shift - coord[i]``.  Invalid (fill) pairs are set to
    ``pad_value`` per component BEFORE the norm, exactly mirroring
    reference aimnet/ops.py:37-66 (so masked d_ij = sqrt(3)*pad_value), which
    keeps gradients NaN-free without a ``where``-of-``sqrt`` hazard.

    PBC: ``shifts`` are fractional lattice shifts, ``cell`` is per-molecule
    (num_mol, 3, 3) in the row-vector convention (cartesian = frac @ cell).
    """
    coord_j = gather_nb(coord, nbmat)  # (N, M, 3)
    if shifts is not None:
        assert cell is not None and mol_idx is not None, "cell+mol_idx required with shifts"
        cell_ext = jnp.concatenate([cell, jnp.eye(3, dtype=cell.dtype)[None]], axis=0)
        atom_cell = jnp.take(cell_ext, mol_idx, axis=0)  # (N, 3, 3)
        coord_j = coord_j + jnp.einsum(
            "nmd,ndh->nmh", shifts.astype(coord.dtype), atom_cell,
            precision=HIGHEST,
        )
    r_ij = coord_j - coord[:, None, :]
    valid = pair_mask(nbmat)[..., None]
    r_ij = jnp.where(valid, r_ij, pad_value)
    d_ij = jnp.linalg.norm(r_ij, axis=-1)
    return d_ij, r_ij


def cosine_cutoff(d_ij: Array, rc) -> Array:
    """0.5*(cos(pi*d/rc)+1) clamped to [1e-6, rc] (reference aimnet/ops.py:82-85)."""
    rc = jnp.asarray(rc, dtype=d_ij.dtype)
    d = jnp.clip(d_ij, 1e-6, rc)
    return 0.5 * (jnp.cos(d * (jnp.pi / rc)) + 1.0)


def exp_cutoff(d: Array, rc) -> Array:
    """Mollifier cutoff exp(-1/(1-(d/rc)^2))/e^-1 (reference aimnet/ops.py:88-90)."""
    rc = jnp.asarray(rc, dtype=d.dtype)
    x = jnp.clip(d / rc, 0.0, 1.0 - 1e-6)
    return jnp.exp(-1.0 / (1.0 - x * x)) / 0.36787944117144233


def exp_expand(d_ij: Array, shifts: Array, eta) -> Array:
    """Gaussian radial basis: (..., m) -> (..., m, nshifts) (reference aimnet/ops.py:93-96)."""
    eta = jnp.asarray(eta, dtype=d_ij.dtype)
    diff = d_ij[..., None] - shifts
    return jnp.exp(-eta * diff * diff)


def nse(
    Q: Array,
    q_u: Array,
    f_u: Array,
    mol_idx: Array,
    num_mol: int,
    epsilon: float = 1.0e-6,
) -> tuple[Array, Array]:
    """Charge equilibration with exact total-charge constraint.

    ``q = q_u + (f_u / sum_mol f_u) * (Q - sum_mol q_u)`` per charge channel.
    Returns ``(q, dQ)`` where dQ is the per-molecule conservation violation
    (used as a training loss term).  Reference aimnet/ops.py:99-145.

    Shapes: Q (num_mol, C), q_u/f_u (N, C).
    """
    F_u = mol_sum(f_u, mol_idx, num_mol) + epsilon  # (num_mol, C)
    Q_u = mol_sum(q_u, mol_idx, num_mol)
    dQ = Q - Q_u
    f = f_u / expand_mol(F_u, mol_idx).clip(min=epsilon * 0.5)
    q = q_u + f * expand_mol(dQ, mol_idx)
    return q, dQ


def huber(x: Array, delta: float = 1.0) -> Array:
    ax = jnp.abs(x)
    return jnp.where(ax < delta, 0.5 * x * x, delta * (ax - 0.5 * delta))


def bumpfn(x: Array, low: float = 0.0, high: float = 1.0) -> Array:
    """Smooth 0->1 transition over [low, high] (reference aimnet/ops.py:280-287)."""
    x = (x - low) / (high - low)
    x = jnp.clip(x, 1e-6, 1 - 1e-6)
    a = jnp.exp(-1.0 / x)
    b = jnp.exp(-1.0 / (1.0 - x))
    return a / (a + b)


def smoothstep(x: Array, low: float = 0.0, high: float = 1.0) -> Array:
    """Quintic smoothstep 0->1 over [low, high] (reference aimnet/ops.py:289-294)."""
    x = jnp.clip((x - low) / (high - low), 0.0, 1.0)
    return x**3 * (x * (x * 6.0 - 15.0) + 10.0)


def expstep(x: Array, low: float = 0.0, high: float = 1.0) -> Array:
    x = jnp.clip((x - low) / (high - low), 1e-6, 1 - 1e-6)
    return jnp.exp(-1.0 / (1.0 - x * x)) / 0.36787944117144233


def erfc_approx(x: Array) -> Array:
    """f32-grade complementary error function for x >= 0 (Abramowitz &
    Stegun 7.1.26, |error| < 1.5e-7).

    Exists because ``jax.scipy.special.erfc`` has no Mosaic (Pallas TPU)
    lowering; this rational form uses only exp and lowers everywhere.  Used
    by the binned DSF/Ewald-real pair terms so the SAME term function traces
    on XLA blocks and inside the Pallas pair-sweep kernel."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t
        * (
            -0.284496736
            + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
        )
    )
    return poly * jnp.exp(-x * x)


def coulomb_matrix_dsf(d_ij: Array, Rc: float, alpha: float, valid: Array) -> Array:
    """Damped-shifted-force Coulomb kernel matrix (reference aimnet/ops.py:148-157)."""
    _c1 = jax.scipy.special.erfc(alpha * d_ij) / d_ij
    _c2 = math.erfc(alpha * Rc) / Rc
    _c3 = _c2 / Rc
    _c4 = 2 * alpha * math.exp(-((alpha * Rc) ** 2)) / (Rc * math.pi**0.5)
    J = _c1 - _c2 + (d_ij - Rc) * (_c3 + _c4)
    return jnp.where(valid & (d_ij <= Rc), J, 0.0)
