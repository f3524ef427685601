"""The ``System`` pytree — the single canonical tensor layout.

The reference maintains three neighbor layouts (dense batched / packed flat /
batched neighbor matrices, reference aimnet/nbops.py:5-58) selected at runtime.
Here there is exactly ONE layout, chosen to be jit-stable and TPU-friendly:

- Atoms are a flat padded array of static length ``N`` (includes at least one
  trailing padding row; padding atoms have ``numbers == 0``).
- ``mol_idx`` maps each atom to its molecule; padding atoms that pad a
  molecule slot carry that slot's index, the trailing global padding rows
  carry ``num_mol`` (a trash segment dropped by ``mol_sum``).  ``mol_idx``
  is sorted ascending, enabling fast sorted segment reductions.
- All pair interactions flow through fixed-capacity neighbor matrices
  ``nbmat`` of shape ``(N, M)`` int32 with fill value ``N - 1`` (the
  guaranteed-padding last row).  Dense all-pairs small systems are just the
  special case ``M = max_mol_size - 1``.
- PBC enters via per-pair integer lattice shifts ``shifts`` ``(N, M, 3)``
  and per-molecule cells ``cell`` ``(num_mol, 3, 3)`` (row-vector convention:
  cartesian shift = frac @ cell).

Optional long-range neighbor matrices (``nbmat_lr`` / ``nbmat_coulomb`` /
``nbmat_dftd3``) mirror the reference's suffix-resolution scheme
(reference aimnet/nbops.py:222-259) but as explicit optional fields.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TYPE_CHECKING

import jax
import jax.numpy as jnp

if TYPE_CHECKING:
    from aimnetcentral_tpu.ops.binned import BinGrid

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class System:
    coord: Array  # (N, 3) float32
    numbers: Array  # (N,) int32, 0 = padding
    charge: Array  # (num_mol,) float32 total molecular charge
    mol_idx: Array  # (N,) int32 in [0, num_mol]
    nbmat: Array | None = None  # (N, M) int32, fill value N-1 (indexed engine)
    mult: Array | None = None  # (num_mol,) float32 spin multiplicity (NSE models)
    cell: Array | None = None  # (num_mol, 3, 3) float32 or None
    shifts: Array | None = None  # (N, M, 3) lattice image counts (int8 from the
    # host builders, float32 from the device cell list; consumers cast at use)
    nbmat_lr: Array | None = None  # (N, M_lr) int32
    shifts_lr: Array | None = None  # (N, M_lr, 3)
    nbmat_coulomb: Array | None = None
    shifts_coulomb: Array | None = None
    nbmat_dftd3: Array | None = None
    shifts_dftd3: Array | None = None
    # Ewald discretization (host-estimated, see models/ewald.py): k-grid is
    # the static-shape part; eta/cutoffs ride along as traced scalars.
    ewald_kpts: Array | None = None  # (K, 3) integer reciprocal points
    ewald_eta: Array | None = None  # () screening width
    ewald_r_cutoff: Array | None = None  # () real-space cutoff
    ewald_k_cutoff: Array | None = None  # () reciprocal cutoff
    # Stencil-roll dense engine (ops/binned.py): when set, atoms are in the
    # slot-padded bin-sorted layout and pair ops use dense bin blocks
    # instead of nbmat.  Static metadata (hashable) -> part of the jit key.
    bins: "BinGrid | None" = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    # Optional COARSE twin layout for long-range sweeps (DSF/D3/Ewald-real):
    # a second grid with bin edge ~ lr_cutoff/2 (radius-2 stencil) instead of
    # reusing the fine SR grid at radius 3+ with its ~2x slot slack squared.
    # ``lr_slot`` maps each LR slot to its source SR slot (empty LR slots
    # point at an SR padding slot); set by ops/binned.py::to_binned_system.
    lr_bins: "BinGrid | None" = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    lr_slot: Array | None = None  # (lr_bins.num_slots,) int32
    # inverse map SR slot -> LR slot (sentinel = lr num_slots for SR padding
    # slots absent from the LR layout); built once per rebuild so per-eval
    # reassembly is a gather, never a scatter (scatters serialize on TPU)
    lr_inv: Array | None = None  # (num_slots,) int32
    # Static copy of the Ewald real-space cutoff (the binned engine needs a
    # host value to size its stencil radius)
    ewald_r_static: float | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    # Atomic species present (sorted tuple, set by builders): lets species-
    # indexed pair tables (D3 C6 references) compile to small dense bilinear
    # forms instead of per-pair gathers
    species: tuple[int, ...] | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    # PME mesh dims (static; set by attach_ewald when PME is requested)
    pme_mesh: tuple[int, int, int] | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    @property
    def natoms(self) -> int:
        return self.coord.shape[0]

    @property
    def num_mol(self) -> int:
        return self.charge.shape[0]

    @property
    def pad_idx(self) -> int:
        """Index of the guaranteed padding row (= neighbor fill value)."""
        return self.coord.shape[0] - 1

    def mask_i(self) -> Array:
        """(N,) bool, True for padding atoms."""
        return self.numbers == 0

    def resolve_nb(self, *suffixes: str) -> tuple[Array, Array | None, str]:
        """First available (nbmat, shifts) among suffixes, mirroring
        reference aimnet/nbops.py:222-259.  Suffix "" = the base SR matrices."""
        for s in suffixes:
            nb = getattr(self, f"nbmat{s}") if s else self.nbmat
            if nb is not None:
                sh = getattr(self, f"shifts{s}") if s else self.shifts
                return nb, sh, s
        raise KeyError(f"no neighbor matrix found for suffixes {suffixes}")

    def replace(self, **kwargs: Any) -> "System":
        return dataclasses.replace(self, **kwargs)
