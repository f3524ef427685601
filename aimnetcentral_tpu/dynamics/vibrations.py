"""Harmonic vibrational analysis from the calculator's dense Hessian.

The reference exposes Hessians for exactly this workflow (Sella TS search
checks imaginary modes, reference aimnet/calculators/aimnet2ase.py:163
``get_hessian``); this module completes the loop with mass-weighted normal
modes and frequencies.  Host-side numpy: the (3N, 3N) eigendecomposition is
a one-shot O(N^3) post-processing step, not a device hot path.

Conventions: Hessian in eV/A^2 (calculator output, (N,3,N,3)), masses in
amu; frequencies returned in cm^-1, with IMAGINARY modes reported as
negative numbers (the usual quantum-chemistry convention).
"""

from __future__ import annotations

import numpy as np

from aimnetcentral_tpu import constants

# sqrt(eV / (amu * A^2)) -> angular frequency, over 2*pi*c in cm/s:
#   sqrt(1.602176634e-19 J / (1.66053906892e-27 kg * 1e-20 m^2))
#     = 9.82269e13 rad/s per sqrt(eV/amu/A^2)
#   / (2*pi * 2.99792458e10 cm/s) = 521.471 cm^-1
EV_AMU_A2_TO_CM1 = 521.4708


def harmonic_frequencies(
    hessian: np.ndarray,
    masses: np.ndarray,
    project_translations: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Mass-weighted normal-mode analysis.

    Parameters
    ----------
    hessian : (N, 3, N, 3) or (3N, 3N) second derivatives in eV/A^2
    masses : (N,) atomic masses in amu
    project_translations : project the 3 exact translational null vectors
        out of the mass-weighted Hessian before diagonalizing (rotations are
        NOT projected — at a non-stationary geometry they are not null)

    Returns
    -------
    freqs_cm1 : (3N,) frequencies in cm^-1, ascending; imaginary modes are
        returned as negative values
    modes : (3N, N, 3) Cartesian displacement of each mode (mass-weighted
        eigenvectors un-weighted by 1/sqrt(m), normalized)
    """
    masses = np.asarray(masses, dtype=np.float64)
    n = masses.shape[0]
    h = np.asarray(hessian, dtype=np.float64).reshape(3 * n, 3 * n)
    h = 0.5 * (h + h.T)
    inv_sqrt_m = np.repeat(1.0 / np.sqrt(masses), 3)
    hw = h * inv_sqrt_m[:, None] * inv_sqrt_m[None, :]

    if project_translations:
        # translation vectors in mass-weighted coords: sqrt(m_i) * e_ax
        t = np.zeros((3, 3 * n))
        sm = np.sqrt(masses)
        for ax in range(3):
            t[ax, ax::3] = sm
        t /= np.linalg.norm(t, axis=1, keepdims=True)
        p = np.eye(3 * n) - t.T @ t
        hw = p @ hw @ p

    w, v = np.linalg.eigh(hw)
    freqs = np.sign(w) * np.sqrt(np.abs(w)) * EV_AMU_A2_TO_CM1
    modes = (v.T * inv_sqrt_m[None, :]).reshape(3 * n, n, 3)
    norm = np.linalg.norm(modes.reshape(3 * n, -1), axis=1, keepdims=True)
    modes = modes / np.clip(norm, 1e-30, None)[:, :, None]
    return freqs, modes


def frequencies_from_calculator(
    calc, data: dict, project_translations: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Convenience: dense Hessian via the calculator, then normal modes."""
    out = calc(data, hessian=True)
    h = out["hessian"]
    if isinstance(h, list):
        raise ValueError("vibrational analysis takes ONE structure at a time")
    numbers = np.asarray(data["numbers"]).reshape(-1)
    masses = np.asarray(constants.get_masses(), dtype=np.float64)[numbers]
    return harmonic_frequencies(h, masses, project_translations)
