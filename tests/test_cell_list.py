"""Cell-list builder vs brute force (gas + periodic), overflow accounting."""

import jax.numpy as jnp
import numpy as np
import pytest

from aimnetcentral_tpu.ops.cell_list import build_cell_list, plan_cell_list
from aimnetcentral_tpu.ops.neighbors import brute_force_nbmat


def _pairs_from_nbmat(nbmat, shifts=None):
    n = nbmat.shape[0]
    fill = n - 1
    pairs = set()
    for i in range(n - 1):
        for m, j in enumerate(np.asarray(nbmat)[i]):
            if j == fill:
                continue
            s = (0, 0, 0) if shifts is None else tuple(int(x) for x in np.asarray(shifts)[i, m])
            pairs.add((i, int(j), s))
    return pairs


def test_gas_phase_matches_brute_force(rng):
    n_real = 60
    coord = rng.uniform(0, 12, size=(n_real, 3)).astype(np.float32)
    numbers = np.full(n_real, 6)
    cutoff = 4.0

    coord_pad = np.concatenate([coord, np.ones((1, 3), np.float32) * 1e3])
    numbers_pad = np.concatenate([numbers, [0]])
    spec = plan_cell_list(None, n_real, cutoff, extent=13.0)
    nbmat, shifts, overflow = build_cell_list(
        jnp.asarray(coord_pad), jnp.asarray(numbers_pad), spec
    )
    assert int(overflow) == 0
    assert shifts is None

    nb_ref, _, _ = brute_force_nbmat(coord, np.zeros(n_real, int), cutoff, n_pad=n_real + 1)
    assert _pairs_from_nbmat(nbmat) == _pairs_from_nbmat(nb_ref)


def test_periodic_matches_brute_force(rng):
    n_real = 40
    a = 10.0
    coord = rng.uniform(0, a, size=(n_real, 3)).astype(np.float32)
    numbers = np.full(n_real, 6)
    cell = np.eye(3, dtype=np.float32) * a
    cutoff = 3.0

    coord_pad = np.concatenate([coord, np.ones((1, 3), np.float32) * 1e3])
    numbers_pad = np.concatenate([numbers, [0]])
    spec = plan_cell_list(cell, n_real, cutoff)
    nbmat, shifts, overflow = build_cell_list(
        jnp.asarray(coord_pad), jnp.asarray(numbers_pad), spec, cell=jnp.asarray(cell)
    )
    assert int(overflow) == 0

    nb_ref, sh_ref, _ = brute_force_nbmat(
        coord, np.zeros(n_real, int), cutoff, cell=cell, n_pad=n_real + 1
    )
    # shifts conventions must agree pair-by-pair
    assert _pairs_from_nbmat(nbmat, shifts) == _pairs_from_nbmat(nb_ref, sh_ref)


@pytest.mark.slow
def test_periodic_wrapped_coordinates(rng):
    """Atoms outside the box must wrap correctly into bins."""
    n_real = 20
    a = 8.0
    coord = rng.uniform(-a, 2 * a, size=(n_real, 3)).astype(np.float32)
    numbers = np.full(n_real, 6)
    cell = np.eye(3, dtype=np.float32) * a
    cutoff = 3.0

    coord_pad = np.concatenate([coord, np.ones((1, 3), np.float32) * 1e3])
    numbers_pad = np.concatenate([numbers, [0]])
    spec = plan_cell_list(cell, n_real, cutoff)
    nbmat, shifts, overflow = build_cell_list(
        jnp.asarray(coord_pad), jnp.asarray(numbers_pad), spec, cell=jnp.asarray(cell)
    )
    # pair distances computed through (nbmat, shifts) must all be < cutoff
    from aimnetcentral_tpu.ops.math import calc_distances
    from aimnetcentral_tpu.ops.nb import pair_mask

    d, _ = calc_distances(
        jnp.asarray(coord_pad),
        nbmat,
        shifts,
        jnp.asarray(cell)[None],
        jnp.zeros(n_real + 1, dtype=jnp.int32),
    )
    valid = np.asarray(pair_mask(nbmat))
    assert (np.asarray(d)[valid] < cutoff + 1e-4).all()

    # count must match brute force on wrapped coordinates
    wrapped = coord - np.floor(coord / a) * a
    nb_ref, _, _ = brute_force_nbmat(
        wrapped, np.zeros(n_real, int), cutoff, cell=cell, n_pad=n_real + 1
    )
    n_pairs_ref = sum(1 for _ in _pairs_from_nbmat(nb_ref))
    assert valid.sum() == n_pairs_ref


def test_overflow_reported(rng):
    coord = rng.uniform(0, 2.0, size=(30, 3)).astype(np.float32)  # very dense
    coord_pad = np.concatenate([coord, np.ones((1, 3), np.float32) * 1e3])
    numbers_pad = np.concatenate([np.full(30, 6), [0]])
    spec = plan_cell_list(None, 30, 3.0, extent=3.0, max_neighbors=4)
    _, _, overflow = build_cell_list(jnp.asarray(coord_pad), jnp.asarray(numbers_pad), spec)
    assert int(overflow) > 0


def test_multiple_padding_rows_excluded(rng):
    """Bucketed padding (many pad rows) must never appear as neighbors —
    regression for the overflow-row aliasing bug found via the CLI MD drive."""
    coord = np.ones((16, 3), np.float32)
    coord[:3] = [[0, 0, 0.119], [0, 0.763, -0.477], [0, -0.763, -0.477]]
    numbers = np.zeros(16, np.int32)
    numbers[:3] = [8, 1, 1]
    spec = plan_cell_list(None, 3, 6.0, extent=3.5)
    nb, _sh, ovf = build_cell_list(jnp.asarray(coord), jnp.asarray(numbers), spec)
    assert int(ovf) == 0
    nbm = np.asarray(nb)
    valid = nbm[:3][nbm[:3] != 15]
    assert set(valid.tolist()) <= {0, 1, 2}
    assert sorted(nbm[0][nbm[0] != 15].tolist()) == [1, 2]
