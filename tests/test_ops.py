"""Unit tests for layout + math ops (physics-invariant style, mirroring the
reference's tests/test_nbops.py + tests/test_ops.py strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.ops import math as aops
from aimnetcentral_tpu.ops import nb as nbops
from aimnetcentral_tpu.ops.neighbors import allpairs_nbmat, brute_force_nbmat, nbmat_within_cutoff

from conftest import random_molecule


def test_cosine_cutoff_limits():
    d = jnp.array([1e-7, 2.5, 5.0, 6.0])
    fc = aops.cosine_cutoff(d, 5.0)
    assert fc[0] == pytest.approx(1.0, abs=1e-5)
    assert fc[1] == pytest.approx(0.5, abs=1e-6)
    assert fc[2] == pytest.approx(0.0, abs=1e-6)
    assert fc[3] == pytest.approx(0.0, abs=1e-6)


def test_exp_cutoff_limits():
    d = jnp.array([0.0, 5.0, 7.0])
    fc = aops.exp_cutoff(d, 5.0)
    assert fc[0] == pytest.approx(1.0, abs=1e-5)
    assert fc[1] == pytest.approx(0.0, abs=1e-5)
    assert fc[2] == pytest.approx(0.0, abs=1e-5)


def test_cutoff_smooth_gradients():
    g = jax.grad(lambda d: aops.exp_cutoff(d, 5.0))
    for d in [0.1, 2.0, 4.9, 4.999]:
        assert np.isfinite(g(jnp.float32(d)))


def test_mol_sum_and_expand(rng):
    mol_idx = jnp.array([0, 0, 0, 1, 1, 2], dtype=jnp.int32)
    x = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    s = nbops.mol_sum(x, mol_idx, 2)
    assert s.shape == (2, 4)
    np.testing.assert_allclose(s[0], np.asarray(x[:3]).sum(0), rtol=1e-6)
    np.testing.assert_allclose(s[1], np.asarray(x[3:5]).sum(0), rtol=1e-6)
    # expand: padding atoms (segment 2) read zeros
    e = nbops.expand_mol(s, mol_idx)
    np.testing.assert_allclose(e[5], 0.0)
    np.testing.assert_allclose(e[0], s[0])


def test_nse_charge_conservation(rng):
    n, num_mol = 12, 3
    mol_idx = jnp.asarray(np.sort(rng.integers(0, num_mol, size=n)).astype(np.int32))
    Q = jnp.asarray(rng.normal(size=(num_mol, 1)).astype(np.float32))
    q_u = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
    f_u = jnp.asarray((rng.uniform(0.1, 2.0, size=(n, 1))).astype(np.float32))
    q, dq = aops.nse(Q, q_u, f_u, mol_idx, num_mol)
    total = nbops.mol_sum(q, mol_idx, num_mol)
    np.testing.assert_allclose(np.asarray(total), np.asarray(Q), atol=2e-5)


def test_allpairs_nbmat():
    nb = allpairs_nbmat([3, 2], 6)
    assert nb.shape == (6, 2)
    # molecule 0: atoms 0,1,2
    assert set(nb[0].tolist()) == {1, 2}
    assert set(nb[1].tolist()) == {0, 2}
    # molecule 1: atoms 3,4 (capacity 2, one fill)
    assert nb[3][0] == 4 and nb[3][1] == 5
    # padding row all fill
    assert (nb[5] == 5).all()


def test_distances_symmetry(rng):
    coord, numbers = random_molecule(rng, 8)
    sys = system_from_molecules([{"coord": coord, "numbers": numbers}])
    d_ij, r_ij = aops.calc_distances(sys.coord, sys.nbmat)
    d = np.asarray(d_ij)
    nb = np.asarray(sys.nbmat)
    # d(i->j) must equal d(j->i)
    for i in range(8):
        for m, j in enumerate(nb[i]):
            if j == sys.pad_idx:
                continue
            back = list(nb[j]).index(i)
            assert d[i, m] == pytest.approx(d[j, back], rel=1e-6)


def test_brute_force_nbmat_pbc_counts():
    # simple cubic lattice of one atom, a=2: 6 nearest images at distance 2
    cell = np.eye(3, dtype=np.float64) * 2.0
    coord = np.zeros((1, 3), dtype=np.float32)
    nb, shifts, max_seen = brute_force_nbmat(
        coord, np.zeros(1, dtype=int), cutoff=2.1, cell=cell, n_pad=2
    )
    valid = nb[0] != 1
    assert valid.sum() == 6
    assert shifts is not None
    s = shifts[0][valid]
    assert sorted(np.abs(s).sum(axis=1).tolist()) == [1.0] * 6


def test_nbmat_within_cutoff_matches_brute_force(rng):
    coord, numbers = random_molecule(rng, 20, spread=5.0)
    sys = system_from_molecules([{"coord": coord, "numbers": numbers}])
    nb_dev, overflow = nbmat_within_cutoff(
        sys.coord, sys.mol_idx, sys.numbers, cutoff=4.0, max_neighbors=19
    )
    assert int(overflow) == 0
    nb_host, _, _ = brute_force_nbmat(coord, np.zeros(20, dtype=int), 4.0, n_pad=21)
    for i in range(20):
        a = sorted(j for j in np.asarray(nb_dev)[i] if j != 20)
        b = sorted(j for j in nb_host[i] if j != 20)
        assert a == b


def test_pair_mask_and_gather(rng):
    coord, numbers = random_molecule(rng, 5)
    sys = system_from_molecules([{"coord": coord, "numbers": numbers}])
    mask = nbops.pair_mask(sys.nbmat)
    assert mask.shape == sys.nbmat.shape
    assert not np.asarray(mask)[-1].any()  # padding row: no valid pairs
    g = nbops.gather_nb(sys.coord, sys.nbmat)
    assert g.shape == (*sys.nbmat.shape, 3)
