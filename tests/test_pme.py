"""PME vs Ewald consistency (same physics, different reciprocal machinery)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimnetcentral_tpu import constants
from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.models.ewald import attach_ewald, estimate_ewald_parameters
from aimnetcentral_tpu.models.pme import estimate_pme_mesh, pme_energy
from aimnetcentral_tpu.ops import nb as nbops
from aimnetcentral_tpu.ops.math import calc_distances


def _real_space(sys, q, eta, r_cut):
    nb = sys.nbmat_lr
    sh = sys.shifts_lr
    d, _ = calc_distances(sys.coord, nb, sh, sys.cell, sys.mol_idx)
    valid = nbops.pair_mask(nb) & (d < r_cut)
    qq = q[:, None] * nbops.gather_nb(q, nb)
    e = jnp.where(valid, qq * jax.scipy.special.erfc(d / (math.sqrt(2.0) * eta)) / d, 0.0)
    return 0.5 * e.sum()


@pytest.mark.parametrize(
    "charged", [pytest.param(False, marks=pytest.mark.slow), True]
)
def test_pme_matches_ewald(rng, charged):
    n, a = 20, 9.0
    coord = rng.uniform(0, a, size=(n, 3)).astype(np.float32)
    q = rng.normal(size=n).astype(np.float32) * 0.4
    if not charged:
        q -= q.mean()
    cell = np.eye(3, dtype=np.float32) * a
    numbers = np.full(n, 6)

    acc = 1e-7
    p = estimate_ewald_parameters(cell, n, acc)
    sys = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}],
        cutoff=4.0,
        lr_cutoff=float(p.r_cutoff),
    )
    sys = attach_ewald(sys, acc)
    qp = np.zeros(sys.natoms, dtype=np.float32)
    qp[:n] = q
    qp = jnp.asarray(qp)

    from aimnetcentral_tpu.models.ewald import ewald_energy

    e_ewald = float(
        np.asarray(
            ewald_energy(
                sys.coord, qp, sys.cell, sys.mol_idx, sys.num_mol, sys.numbers,
                sys.nbmat_lr, sys.shifts_lr,
                sys.ewald_eta, sys.ewald_r_cutoff, sys.ewald_k_cutoff, sys.ewald_kpts,
            )
        )[0]
    )

    mesh = estimate_pme_mesh(cell, accuracy=1e-7)
    e_real = _real_space(sys, qp, float(p.eta), float(p.r_cutoff))
    e_pme = float(
        pme_energy(
            sys.coord, qp, sys.cell[0], sys.numbers, jnp.float32(p.eta), mesh, e_real
        )
    )
    assert e_pme == pytest.approx(e_ewald, abs=2e-3 * max(1.0, abs(e_ewald)))


@pytest.mark.slow
def test_pme_forces_differentiable(rng):
    n, a = 12, 8.0
    coord = rng.uniform(0, a, size=(n, 3)).astype(np.float32)
    q = rng.normal(size=n).astype(np.float32)
    q -= q.mean()
    cell = jnp.eye(3) * a
    numbers = jnp.full(n, 6)
    mesh = estimate_pme_mesh(np.eye(3) * a)
    eta = jnp.float32(1.5)

    def e_of(c):
        return pme_energy(c, jnp.asarray(q), cell, numbers, eta, mesh, jnp.float32(0.0))

    g = jax.grad(e_of)(jnp.asarray(coord))
    assert np.isfinite(np.asarray(g)).all()
    # FD check one component
    eps = 1e-2
    cp = np.array(coord)
    cp[3, 1] += eps
    ep = float(e_of(jnp.asarray(cp)))
    cp[3, 1] -= 2 * eps
    em = float(e_of(jnp.asarray(cp)))
    fd = (ep - em) / (2 * eps)
    assert float(g[3, 1]) == pytest.approx(fd, rel=0.05, abs=2e-3)
