"""Neighbor-layout substrate properties (ops/nb.py + System) — the analogue
of reference tests/test_nbops.py:1-598 for the single flat padded layout
this framework collapses the reference's three modes into."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.ops.nb import (
    expand_mol,
    gather_nb,
    mask_pad_atoms,
    mol_sum,
    pair_mask,
)


def test_gather_nb_fill_reads_padding_row():
    # fill value N-1 points at the guaranteed padding row — gathers are
    # always in-bounds and padded lanes read the padding atom's features
    x = jnp.asarray([[1.0], [2.0], [0.0]])  # last row = padding
    nbmat = jnp.asarray([[1, 2], [0, 2], [2, 2]])
    g = np.asarray(gather_nb(x, nbmat))
    assert g[0, 0, 0] == 2.0  # real neighbor
    assert g[0, 1, 0] == 0.0  # fill slot reads padding zeros
    assert (g[2] == 0.0).all()


def test_pair_mask_fill_convention():
    nbmat = jnp.asarray([[1, 3, 3], [0, 2, 3], [3, 3, 3], [3, 3, 3]])
    m = np.asarray(pair_mask(nbmat))
    assert m.tolist() == [
        [True, False, False],
        [True, True, False],
        [False] * 3,
        [False] * 3,
    ]


def test_mask_pad_atoms_arbitrary_trailing_dims_and_fill():
    numbers = jnp.asarray([6, 0, 1, 0])
    x = jnp.ones((4, 2, 3))
    y = np.asarray(mask_pad_atoms(x, numbers))
    assert (y[0] == 1).all() and (y[2] == 1).all()
    assert (y[1] == 0).all() and (y[3] == 0).all()
    z = np.asarray(mask_pad_atoms(jnp.ones(4), numbers, fill=-7.0))
    assert z.tolist() == [1.0, -7.0, 1.0, -7.0]


def test_mol_sum_drops_padding_segment_and_handles_interleaving():
    # bin-sorted slot layouts interleave molecules; padding rows carry
    # segment id == num_mol and must vanish
    x = jnp.asarray([1.0, 10.0, 2.0, 20.0, 999.0])
    mol_idx = jnp.asarray([0, 1, 0, 1, 2])  # last row is padding (id=num_mol)
    s = np.asarray(mol_sum(x, mol_idx, 2))
    assert s.tolist() == [3.0, 30.0]


def test_mol_sum_gradient_broadcasts_back():
    x = jnp.asarray([1.0, 2.0, 3.0, 0.0])
    mol_idx = jnp.asarray([0, 0, 1, 2])
    g = np.asarray(jax.grad(lambda v: mol_sum(v, mol_idx, 2).sum())(x))
    # real atoms get d(sum)/dx = 1; the padding row contributes to no output
    assert g.tolist() == [1.0, 1.0, 1.0, 0.0]


def test_expand_mol_padding_reads_zero_row():
    x_mol = jnp.asarray([[1.0], [2.0]])
    mol_idx = jnp.asarray([0, 1, 1, 2])  # 2 == num_mol -> padding
    e = np.asarray(expand_mol(x_mol, mol_idx))
    assert e.squeeze(-1).tolist() == [1.0, 2.0, 2.0, 0.0]


def test_mol_sum_expand_adjoint_pair():
    # expand_mol is the (transpose of the) broadcast whose reduction is
    # mol_sum: <mol_sum(x), y> == <x, expand_mol(y)>
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=7), dtype=jnp.float32)
    mol_idx = jnp.asarray([0, 1, 0, 2, 1, 2, 3])  # last is padding (num_mol=3)
    y = jnp.asarray(rng.normal(size=3), dtype=jnp.float32)
    lhs = float(jnp.vdot(mol_sum(x, mol_idx, 3), y))
    rhs = float(jnp.vdot(x, expand_mol(y, mol_idx)))
    assert abs(lhs - rhs) < 1e-5


# -- System contract ----------------------------------------------------------


def test_system_builder_pads_and_flags():
    sys_ = system_from_molecules(
        [
            {"coord": np.zeros((2, 3), np.float32), "numbers": [1, 1]},
            {"coord": np.zeros((3, 3), np.float32), "numbers": [8, 1, 1]},
        ]
    )
    assert sys_.num_mol == 2
    # guaranteed trailing padding row
    assert int(sys_.numbers[sys_.pad_idx]) == 0
    assert int(sys_.mol_idx[sys_.pad_idx]) == sys_.num_mol
    m = np.asarray(sys_.mask_i())
    assert m[sys_.pad_idx]
    assert m.sum() == sys_.natoms - 5  # all padding rows flagged


def test_resolve_nb_suffix_fallback():
    sys_ = system_from_molecules(
        [{"coord": np.zeros((2, 3), np.float32), "numbers": [1, 1]}]
    )
    nb = jnp.zeros((sys_.natoms, 4), jnp.int32)
    nb_lr = jnp.ones((sys_.natoms, 8), jnp.int32)
    s = sys_.replace(nbmat=nb, nbmat_lr=nb_lr)
    got, _, suffix = s.resolve_nb("_lr", "")
    assert suffix == "_lr" and got.shape == (s.natoms, 8)
    got2, _, suffix2 = s.resolve_nb("_coulomb", "")
    assert suffix2 == "" and got2.shape == (s.natoms, 4)
    import pytest

    with pytest.raises(KeyError):
        s.replace(nbmat=None).resolve_nb("_dftd3")


def test_system_is_a_pytree():
    sys_ = system_from_molecules(
        [{"coord": np.zeros((2, 3), np.float32), "numbers": [1, 1]}]
    )
    leaves, treedef = jax.tree.flatten(sys_)
    rebuilt = jax.tree.unflatten(treedef, leaves)
    assert rebuilt.natoms == sys_.natoms
    # static metadata (bins, species, pme_mesh) must NOT be leaves
    assert all(hasattr(l, "shape") for l in leaves)
