"""Host-side System builders: from raw molecule arrays to the padded flat layout."""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from aimnetcentral_tpu.ops.neighbors import (
    allpairs_nbmat,
    brute_force_nbmat,
    cell_list_nbmat,
)
from aimnetcentral_tpu.system import System

# above this atom count, host neighbor builds use the O(N) cell list
# (brute force is O(N^2) and cost minutes at 10k atoms — the reference's
# builds are O(N) on device, aimnet/calculators/neighbors.py:21-147)
_HOST_CELL_LIST_THRESHOLD = 512


def host_nbmat(
    coord, mol_idx, cutoff, max_neighbors=None, cell=None, n_pad=None, pbc_mol=None
):
    """Dispatch host neighbor builds: O(N) cell list for large systems,
    brute force below the threshold (lower constant cost)."""
    build = (
        cell_list_nbmat
        if coord.shape[0] > _HOST_CELL_LIST_THRESHOLD
        else brute_force_nbmat
    )
    return build(
        coord, mol_idx, cutoff, max_neighbors=max_neighbors, cell=cell,
        n_pad=n_pad, pbc_mol=pbc_mol,
    )


def system_from_molecules(
    molecules: list[dict],
    cutoff: float | None = None,
    lr_cutoff: float | None = None,
    coulomb_cutoff: float | None = None,
    dftd3_cutoff: float | None = None,
    n_pad: int | None = None,
    max_neighbors: int | None = None,
    build_nbmat: bool = True,
) -> System:
    """Pack molecules into one flat padded System.

    Each molecule dict: ``coord`` (n,3), ``numbers`` (n,), optional ``charge``
    (scalar), ``mult`` (scalar), ``cell`` (3,3).  With ``cutoff=None`` the SR
    neighbor matrix is intra-molecular all-pairs (the dense-equivalent mode);
    otherwise a cutoff-bounded brute-force build.  ``lr_cutoff`` adds
    ``nbmat_lr`` (all-pairs when None but any molecule is periodic? no —
    only when explicitly requested).
    """
    coords = [np.asarray(m["coord"], dtype=np.float32) for m in molecules]
    numbers = [np.asarray(m["numbers"], dtype=np.int32) for m in molecules]
    sizes = [len(c) for c in coords]
    n_real = sum(sizes)
    n_pad = n_pad or (n_real + 1)
    assert n_pad > n_real, "need at least one padding row"
    num_mol = len(molecules)

    coord = np.ones((n_pad, 3), dtype=np.float32)
    zs = np.zeros(n_pad, dtype=np.int32)
    mol_idx = np.full(n_pad, num_mol, dtype=np.int32)
    off = 0
    for i, (c, z) in enumerate(zip(coords, numbers)):
        coord[off : off + len(c)] = c
        zs[off : off + len(c)] = z
        mol_idx[off : off + len(c)] = i
        off += len(c)

    charge = np.array([m.get("charge", 0.0) for m in molecules], dtype=np.float32)
    mult = None
    if any("mult" in m for m in molecules):
        mult = np.array([m.get("mult", 1.0) for m in molecules], dtype=np.float32)

    cells = [m.get("cell") for m in molecules]
    has_cell = any(c is not None for c in cells)
    cell = None
    if has_cell:
        cell = np.stack(
            [np.asarray(c if c is not None else np.eye(3), dtype=np.float32) for c in cells]
        )
        # store periodic molecules in the WRAPPED frame: every neighbor shift
        # is then exactly the ghost-image count (no per-pair wrap corrections
        # on bandwidth-bound hosts), and all periodic observables are
        # invariant under per-atom lattice translations.  The calculator
        # records the applied wrap so Verlet-style reuse can re-wrap new
        # coordinates consistently (see AIMNet2Calculator._store_prep).
        off = 0
        for i, c in enumerate(coords):
            if cells[i] is not None:
                cb = np.asarray(cells[i], dtype=np.float64)
                w = np.floor(c.astype(np.float64) @ np.linalg.inv(cb))
                if w.any():
                    coord[off : off + len(c)] = (
                        c.astype(np.float64) - w @ cb
                    ).astype(np.float32)
            off += len(c)

    # per-molecule periodicity for mixed batches (reference accepts (B, 3)
    # pbc flags, aimnet/calculators/neighbors.py:309-321)
    pbc_mol = np.array([c is not None for c in cells]) if has_cell else None

    real_mol_idx = mol_idx[:n_real]
    if not build_nbmat:
        # caller converts to the binned engine (no index matrices needed)
        nbmat = shifts = None
    elif cutoff is None and not has_cell:
        nbmat = allpairs_nbmat(sizes, n_pad)
        shifts = None
    else:
        assert cutoff is not None, "periodic systems need an explicit cutoff"
        nbmat, shifts, _ = host_nbmat(
            coord[:n_real],
            real_mol_idx,
            cutoff,
            max_neighbors=max_neighbors,
            cell=cell if has_cell else None,
            n_pad=n_pad,
            pbc_mol=pbc_mol,
        )

    def _lr_build(rc):
        return host_nbmat(
            coord[:n_real],
            real_mol_idx,
            rc,
            cell=cell if has_cell else None,
            n_pad=n_pad,
            pbc_mol=pbc_mol,
        )[:2]

    # shared LR list, or split per-module lists when Coulomb/D3 cutoffs
    # diverge (reference aimnet/calculators/calculator.py:582-636)
    nbmat_lr = shifts_lr = None
    nbmat_coulomb = shifts_coulomb = None
    nbmat_dftd3 = shifts_dftd3 = None
    if build_nbmat:
        if lr_cutoff is not None:
            nbmat_lr, shifts_lr = _lr_build(lr_cutoff)
        if coulomb_cutoff is not None:
            nbmat_coulomb, shifts_coulomb = _lr_build(coulomb_cutoff)
        if dftd3_cutoff is not None:
            nbmat_dftd3, shifts_dftd3 = _lr_build(dftd3_cutoff)

    return System(
        coord=jnp.asarray(coord),
        numbers=jnp.asarray(zs),
        charge=jnp.asarray(charge),
        mol_idx=jnp.asarray(mol_idx),
        species=tuple(sorted(int(z) for z in np.unique(zs) if z > 0)),
        nbmat=jnp.asarray(nbmat) if nbmat is not None else None,
        mult=jnp.asarray(mult) if mult is not None else None,
        cell=jnp.asarray(cell) if cell is not None else None,
        shifts=jnp.asarray(shifts) if shifts is not None else None,
        nbmat_lr=jnp.asarray(nbmat_lr) if nbmat_lr is not None else None,
        shifts_lr=jnp.asarray(shifts_lr) if shifts_lr is not None else None,
        nbmat_coulomb=jnp.asarray(nbmat_coulomb) if nbmat_coulomb is not None else None,
        shifts_coulomb=jnp.asarray(shifts_coulomb) if shifts_coulomb is not None else None,
        nbmat_dftd3=jnp.asarray(nbmat_dftd3) if nbmat_dftd3 is not None else None,
        shifts_dftd3=jnp.asarray(shifts_dftd3) if shifts_dftd3 is not None else None,
    )


def system_molecule_bins(
    molecules: list[dict],
    capacity: int | None = None,
    pad_mols: int | None = None,
) -> System:
    """Pack gas-phase molecules into the "one molecule per bin" binned layout.

    The grid is (num_mol, 1, 1) bins of capacity C = the largest molecule
    rounded up to a multiple of 8 (TPU sublane granularity); atom rows are
    molecule-major with per-molecule padding.  Every pair interaction is
    within-bin by construction, so all stencil sweeps run at radius 0 —
    dense (C, C) block math with zero per-pair gathers, the TPU expression
    of the reference's dense mode-0 batching (reference aimnet/nbops.py
    mode 0; aimnet/calculators/calculator.py:1475-1511 nb_threshold).
    Unbounded simple Coulomb is exact (whole molecule in one bin).

    ``capacity``/``pad_mols`` fix static shapes across batches (jit reuse).
    """
    from aimnetcentral_tpu.ops.binned import BinGrid

    num_real = len(molecules)
    num_mol = pad_mols or num_real
    assert num_mol >= num_real
    sizes = [len(np.asarray(m["numbers"])) for m in molecules]
    c = capacity or max(8, int(np.ceil(max(sizes) / 8)) * 8)
    assert max(sizes) <= c, f"molecule of {max(sizes)} atoms exceeds capacity {c}"

    n_slots = num_mol * c
    coord = np.ones((n_slots, 3), dtype=np.float32)
    zs = np.zeros(n_slots, dtype=np.int32)
    mol_idx = np.full(n_slots, num_mol, dtype=np.int32)
    for i, m in enumerate(molecules):
        n = sizes[i]
        coord[i * c : i * c + n] = np.asarray(m["coord"], dtype=np.float32)
        zs[i * c : i * c + n] = np.asarray(m["numbers"], dtype=np.int32)
        mol_idx[i * c : i * c + n] = i

    charge = np.zeros(num_mol, dtype=np.float32)
    charge[:num_real] = [float(m.get("charge", 0.0)) for m in molecules]
    mult = None
    if any("mult" in m for m in molecules):
        mult = np.ones(num_mol, dtype=np.float32)
        mult[:num_real] = [float(m.get("mult", 1.0)) for m in molecules]
    assert not any(m.get("cell") is not None for m in molecules), (
        "molecule-bin packing is for gas-phase training batches"
    )

    grid = BinGrid(
        nbins=(num_mol, 1, 1),
        capacity=c,
        edge_hint=1e30,  # informational; radius is pinned to 0 anyway
        periodic=False,
        molecule_bins=True,
    )
    return System(
        coord=jnp.asarray(coord),
        numbers=jnp.asarray(zs),
        charge=jnp.asarray(charge),
        mol_idx=jnp.asarray(mol_idx),
        species=tuple(sorted(int(z) for z in np.unique(zs) if z > 0)),
        mult=jnp.asarray(mult) if mult is not None else None,
        bins=grid,
    )


def stack_systems(systems: list[System]) -> System:
    """Stack same-shape Systems on a leading microbatch axis (for vmapped
    training steps / data-parallel sharding).  Static metadata (species sets)
    is unified to the union so all microbatches share one pytree structure."""
    all_species = sorted({z for s in systems for z in (s.species or ())})
    species = tuple(all_species) if all_species else None
    systems = [s.replace(species=species) for s in systems]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *systems)
