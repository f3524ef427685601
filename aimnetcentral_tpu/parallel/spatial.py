"""Spatial domain decomposition: ONE large system sharded across chips.

The TPU-native analogue of sequence parallelism for an ML interatomic
potential (SURVEY.md §5 "long-context"): the binned slot layout is x-major,
so sharding the slot arrays over a 1-D ``sp`` mesh axis gives each device a
contiguous slab of x-planes.  Every pair interaction within the model
cutoffs needs at most ``halo`` neighboring planes, exchanged with
``jax.lax.ppermute`` ring shifts — the ring IS the global x-periodicity
(the wrap shift is applied at the boundary shards).  The reference has no
equivalent (its parallelism is single-node DDP training only,
reference aimnet/train/train.py:86-92).

Design:

- One ``shard_map`` region evaluates the WHOLE model per shard on an
  EXTENDED local grid (core planes + halo planes), built with per-axis
  periodicity (``BinGrid.periodic_axes = (False, True, True)``) so the
  existing XLA stencil engines run unchanged: halo atoms are real pair
  CANDIDATES, while every accumulated quantity (molecular sums, NSE charge
  conservation, energies) is a core-plane sum ``psum``-reduced over the
  ring.  Halo atoms carry ``mol_idx = num_mol`` (the padding segment), so
  ``mol_sum`` drops them structurally.
- Message passing re-exchanges owner-authoritative per-atom state (features
  ``a``, charges) before every conv pass — halo copies are never trusted
  across passes.
- Forces come from ``jax.grad`` THROUGH the shard_map: JAX transposes the
  ``ppermute`` halo exchanges automatically, which performs the reverse
  halo reduction of boundary-pair force contributions.  No hand-written
  adjoint communication.

Scope: single-molecule periodic systems (the large-box use case) with the
energy surface of the flagship head chain (Output/AtomicShift/AtomicSum +
LRCoulomb in SR/DSF mode), 1- or 2-channel (NSE open-shell) charge models.
D3 and Ewald/PME ARE routed spatially (round 3): the D3 CN sweep refreshes
halo coordination numbers from their owner shards, and the Ewald k-space
structure factor is a psum of shard-local contributions (no halo needed in
k-space).  ``observables=True`` additionally assembles charges (global slot
order), spin charges, and dipole/quadrupole observables ON the mesh with the
same psum pattern as the energy sums — rxn-family configs run fully
spatially.  Validated for bitwise-level equality against the single-device
forward on a virtual CPU mesh (tests/test_spatial.py).

Round 4 generalizes the ring to a 2-D (x, y) TORUS (``n_spy > 1``): each
shard owns an (nx_local, ny_local) tile of xy bin columns; halos travel in
two ppermute steps (x ring, then the y ring over the x-extended tile —
which carries the corner halos for free), and every global reduction psums
over both mesh axes.  The shard-count ceiling goes from the ring's
nx/halo to (nx/halo) * (ny/halo) — the scaling headroom the 100k+ boxes
need.  Energy, forces, Ewald+D3, and MD stepping are parity-tested on
(2, 2) tiles (tests/test_spatial.py::test_spatial2d_*).  Round 5 composes
the torus with BOTH the ensemble axis (an (ens, sp, spy) mesh) and
``observables=True`` — the torus has the full capability surface of the
ring (tests/test_spatial.py::test_spatial2d_ens_composition /
test_spatial2d_observables_match_single_device).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from aimnetcentral_tpu.models.aimnet2 import (
    AIMNet2Config,
    mlp_spec_for_pass,
)
from aimnetcentral_tpu.models.engine_binned import (
    conv_pass_binned,
    pair_energy_binned,
    stencil_radius,
)
from aimnetcentral_tpu.models.heads import (
    AtomicShiftHead,
    AtomicSumHead,
    DFTD3Head,
    DipoleHead,
    LRCoulombHead,
    OutputHead,
    QuadrupoleHead,
)
from aimnetcentral_tpu.models.modules import mlp_apply
from aimnetcentral_tpu.ops import binned as B
from aimnetcentral_tpu.ops import math as aops
from aimnetcentral_tpu.system import System

Array = jax.Array


def make_spatial_mesh(
    n_sp: int, n_spy: int = 1, devices: list | None = None
) -> Mesh:
    """1-D ring over x-slabs, or (``n_spy > 1``) a 2-D torus over
    (x, y) column tiles — axis names ``("sp",)`` / ``("sp", "spy")``."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_sp * n_spy, "not enough devices for the sp mesh"
    if n_spy == 1:
        return Mesh(np.array(devices[:n_sp]), axis_names=("sp",))
    return Mesh(
        np.array(devices[: n_sp * n_spy]).reshape(n_sp, n_spy),
        axis_names=("sp", "spy"),
    )


@dataclasses.dataclass(frozen=True)
class SpatialSpec:
    """Static decomposition geometry (hashable; jit-key material).

    ``n_spy == 1``: the original 1-D x-slab ring (bit-exact code path).
    ``n_spy > 1``: 2-D (x, y) torus — each shard owns an
    (nx_local, ny_local) tile of xy bin columns; halos are exchanged in two
    ppermute steps (x ring first, then the y ring OVER the x-extended tile,
    which carries the corner halos for free).  The y global periodicity
    moves from the in-grid stencil wrap onto the y ring, exactly as x."""

    grid: B.BinGrid  # the GLOBAL grid (x-major slot layout)
    n_sp: int
    halo: int  # halo depth in bin planes (covers every model cutoff)
    # species present (static; D3 factorization tables are built from it)
    species: tuple | None = None
    # Ewald parameters frozen at plan time (single molecule => scalars);
    # the static k-point lattice rides separately (array, not hashable)
    ewald_eta: float | None = None
    ewald_k_cutoff: float | None = None
    ewald_r_static: float | None = None
    # static FFT mesh dims when PME is requested (attach_ewald(pme=True))
    pme_mesh: tuple[int, int, int] | None = None
    n_spy: int = 1

    @property
    def nx_local(self) -> int:
        return self.grid.nbins[0] // self.n_sp

    @property
    def ny_local(self) -> int:
        return self.grid.nbins[1] // self.n_spy

    @property
    def hy(self) -> int:
        """y halo depth: 0 on the 1-D ring (y periodicity stays in-grid)."""
        return self.halo if self.n_spy > 1 else 0

    @property
    def col_slots(self) -> int:
        """Slots per (x, y) bin column."""
        return self.grid.nbins[2] * self.grid.capacity

    @property
    def plane_slots(self) -> int:
        _, ny, nz = self.grid.nbins
        return ny * nz * self.grid.capacity

    @property
    def axes(self) -> tuple[str, ...]:
        return ("sp",) if self.n_spy == 1 else ("sp", "spy")

    @property
    def nx_ext(self) -> int:
        return self.nx_local + 2 * self.halo

    @property
    def ny_ext(self) -> int:
        return self.ny_local + 2 * self.hy

    @property
    def ext_grid(self) -> B.BinGrid:
        nx, ny, nz = self.grid.nbins
        return dataclasses.replace(
            self.grid,
            nbins=(self.nx_ext, self.ny_ext, nz),
            periodic_axes=(False, self.n_spy == 1, True),
        )

    @property
    def core_slice(self) -> slice:
        assert self.n_spy == 1, "2-D tiles have no contiguous core slice"
        s = self.halo * self.plane_slots
        return slice(s, s + self.nx_local * self.plane_slots)

    def take_core(self, arr: Array) -> Array:
        """Extract the core slots of an extended-grid flat slot array
        ((ext_slots, ...) -> (core_slots, ...)).  On the 1-D ring this is
        the contiguous ``core_slice``; on a 2-D tile it crops both axes."""
        if self.n_spy == 1:
            return arr[self.core_slice]
        t = arr.reshape(
            (self.nx_ext, self.ny_ext, self.col_slots) + arr.shape[1:]
        )
        t = t[
            self.halo : self.halo + self.nx_local,
            self.hy : self.hy + self.ny_local,
        ]
        return t.reshape((-1,) + arr.shape[1:])

    def core_mask(self) -> Array:
        """Boolean (ext_slots,) mask of core slots."""
        xi = jnp.arange(self.nx_ext)
        yi = jnp.arange(self.ny_ext)
        cx = (xi >= self.halo) & (xi < self.halo + self.nx_local)
        cy = (yi >= self.hy) & (yi < self.hy + self.ny_local)
        m = cx[:, None, None] & cy[None, :, None] & jnp.ones(
            (1, 1, self.col_slots), bool
        )
        return m.reshape(-1)


def plan_spatial(
    system: System, cfg: AIMNet2Config, n_sp: int, n_spy: int = 1
) -> SpatialSpec:
    """Choose the halo depth from the model's largest cutoff.

    ``n_spy > 1`` plans the 2-D (x, y) torus: the shard count scales as
    (nx/halo) * (ny/halo) instead of the 1-D ring's nx/halo cap."""
    from aimnetcentral_tpu.models.heads import auto_switch_simple_to_dsf

    cfg = auto_switch_simple_to_dsf(cfg)
    grid = system.bins
    assert grid is not None, "spatial decomposition runs on the binned layout"
    assert grid.periodic, "spatial decomposition targets periodic boxes"
    assert grid.nbins[0] % n_sp == 0, (
        f"nx={grid.nbins[0]} must divide by n_sp={n_sp} (plan_bins the box "
        "with a compatible grid)"
    )
    assert grid.nbins[1] % n_spy == 0, (
        f"ny={grid.nbins[1]} must divide by n_spy={n_spy}"
    )
    cutoffs = [cfg.aev.rc_s]
    ewald_eta = ewald_k_cutoff = ewald_r_static = None
    pme_mesh = None
    for _name, head in cfg.outputs:
        if isinstance(head, LRCoulombHead):
            if head.method == "pme":
                pme_mesh = system.pme_mesh
            if head.method in ("ewald", "pme"):
                assert system.ewald_r_static is not None, (
                    "spatial Ewald needs attach_ewald() on the System first"
                )
                ewald_eta = float(np.asarray(system.ewald_eta).reshape(-1)[0])
                ewald_k_cutoff = float(
                    np.asarray(system.ewald_k_cutoff).reshape(-1)[0]
                )
                ewald_r_static = float(system.ewald_r_static)
                cutoffs.append(ewald_r_static)
            else:
                cutoffs.append(
                    float(head.dsf_rc if head.method == "dsf" else head.rc)
                )
        elif isinstance(head, DFTD3Head):
            cutoffs.append(float(head.cutoff))
    halo = max(stencil_radius(c, grid) for c in cutoffs)
    assert halo <= grid.nbins[0] // n_sp, (
        f"halo {halo} planes exceeds the local slab; use fewer shards"
    )
    assert n_spy == 1 or halo <= grid.nbins[1] // n_spy, (
        f"halo {halo} planes exceeds the local y tile; use fewer y shards"
    )
    return SpatialSpec(
        grid=grid, n_sp=n_sp, halo=halo, species=system.species,
        ewald_eta=ewald_eta, ewald_k_cutoff=ewald_k_cutoff,
        ewald_r_static=ewald_r_static, pme_mesh=pme_mesh, n_spy=n_spy,
    )


def _ring_perms(n: int):
    fwd = [(i, (i + 1) % n) for i in range(n)]  # data moves to the RIGHT
    bwd = [(i, (i - 1) % n) for i in range(n)]
    return fwd, bwd


def _exchange(spec: SpatialSpec, x: Array) -> Array:
    """(local_slots, ...) -> (ext_slots, ...): prepend/append halo planes
    fetched from the ring neighbors.  On a 2-D torus the y halos are
    exchanged over the x-EXTENDED tile, carrying the corner halos too."""
    nxl, h = spec.nx_local, spec.halo
    t = x.reshape((nxl, spec.ny_local, spec.col_slots) + x.shape[1:])
    fwd, bwd = _ring_perms(spec.n_sp)
    left_halo = jax.lax.ppermute(t[nxl - h :], "sp", fwd)
    right_halo = jax.lax.ppermute(t[:h], "sp", bwd)
    t = jnp.concatenate([left_halo, t, right_halo], axis=0)
    if spec.n_spy > 1:
        hy = spec.hy
        fy, by = _ring_perms(spec.n_spy)
        low_halo = jax.lax.ppermute(t[:, spec.ny_local - hy :], "spy", fy)
        high_halo = jax.lax.ppermute(t[:, :hy], "spy", by)
        t = jnp.concatenate([low_halo, t, high_halo], axis=1)
    return t.reshape((-1,) + x.shape[1:])


def _exchange_coord(spec: SpatialSpec, coord: Array, cell: Array) -> Array:
    """Coordinate halo exchange with the global wraps applied at the
    boundary shards (each ring crossing IS the periodic image along its
    axis; a 2-D corner crossing composes both wraps via the two steps)."""
    nxl, h = spec.nx_local, spec.halo
    t = coord.reshape(nxl, spec.ny_local, spec.col_slots, 3)
    fwd, bwd = _ring_perms(spec.n_sp)
    idx = jax.lax.axis_index("sp")
    left_halo = jax.lax.ppermute(t[nxl - h :], "sp", fwd)
    right_halo = jax.lax.ppermute(t[:h], "sp", bwd)
    ax = cell[0]  # global cell x row
    left_halo = left_halo - jnp.where(idx == 0, 1.0, 0.0) * ax
    right_halo = right_halo + jnp.where(idx == spec.n_sp - 1, 1.0, 0.0) * ax
    t = jnp.concatenate([left_halo, t, right_halo], axis=0)
    if spec.n_spy > 1:
        hy = spec.hy
        fy, by = _ring_perms(spec.n_spy)
        idy = jax.lax.axis_index("spy")
        low_halo = jax.lax.ppermute(t[:, spec.ny_local - hy :], "spy", fy)
        high_halo = jax.lax.ppermute(t[:, :hy], "spy", by)
        ay = cell[1]  # global cell y row
        low_halo = low_halo - jnp.where(idy == 0, 1.0, 0.0) * ay
        high_halo = high_halo + jnp.where(idy == spec.n_spy - 1, 1.0, 0.0) * ay
        t = jnp.concatenate([low_halo, t, high_halo], axis=1)
    return t.reshape(-1, 3)


def _mol_sum_sp(
    x: Array, mol_idx: Array, num_mol: int, axes: tuple[str, ...] | str = "sp"
) -> Array:
    """Global molecular sum: core-local segment sum + mesh psum."""
    from aimnetcentral_tpu.ops import nb as nbops

    return jax.lax.psum(nbops.mol_sum(x, mol_idx, num_mol), axes)


def _nse_sp(Q, q_u, f_u, mol_idx, num_mol, axes=("sp",), epsilon=1e-6):
    """Spatial twin of ops.math.nse: the charge-conservation sums span the
    whole molecule across shards."""
    from aimnetcentral_tpu.ops.math import expand_mol

    F_u = _mol_sum_sp(f_u, mol_idx, num_mol, axes) + epsilon
    Q_u = _mol_sum_sp(q_u, mol_idx, num_mol, axes)
    dQ = Q - Q_u
    f = f_u / expand_mol(F_u, mol_idx).clip(min=epsilon * 0.5)
    q = q_u + f * expand_mol(dQ, mol_idx)
    return q, dQ


def make_spatial_energy_fn(
    cfg: AIMNet2Config,
    spec: SpatialSpec,
    mesh: Mesh,
    ewald_kpts: np.ndarray | None = None,
    ens_axis: str | None = None,
    observables: bool = False,
):
    """Build ``fn(params, coord, numbers, charge, cell) -> total energy``.

    ``coord``/``numbers`` are the GLOBAL slot arrays of the binned system
    (x-major — sharded over ``sp`` by shard_map), ``charge`` (1,) and
    ``cell`` (3, 3) replicated.  Differentiable w.r.t. coord and cell; use
    ``jax.grad`` for forces (the halo-exchange transpose performs the
    boundary force reduction).

    ``ewald_kpts``: the static k-point integer lattice from
    ``attach_ewald`` (``System.ewald_kpts``), required for Ewald/PME heads
    — the reciprocal-space structure factor is a ``psum`` of shard-local
    (n_core, K) contributions, so k-space needs no halo at all.

    ``ens_axis``: composes ENSEMBLE parallelism with the spatial ring —
    pass a 2-axis ``Mesh`` (e.g. ``(ens, sp)``) and params STACKED on a
    leading member axis; the returned fn gives per-member energies
    ``(n_ens,)``, each member's box sharded over its own sp ring (the sp
    collectives stay inside one ens slice of the mesh).  Geometry arrays
    remain replicated across ``ens``.

    ``observables=True`` (single-axis mesh only) returns a DICT instead of
    the scalar energy: ``energy`` plus ``charges`` (global slot order,
    gathered from the shards) and — when the config carries the heads —
    ``dipole``/``quadrupole`` (``spin_charges`` for NSE), each assembled
    with the same psum pattern as the molecular energy sums.  This closes
    the round-3 gap where multipole observables of rxn-family configs came
    only from single-device eval.
    """
    from aimnetcentral_tpu.models.heads import auto_switch_simple_to_dsf

    cfg = auto_switch_simple_to_dsf(cfg)
    npass = len(cfg.hidden)
    c = cfg.num_charge_channels
    assert not (observables and ens_axis is not None), (
        "observables mode returns single-model outputs; run it per member"
    )
    for name, head in cfg.outputs:
        assert isinstance(
            head,
            (
                OutputHead, AtomicShiftHead, AtomicSumHead, LRCoulombHead,
                DFTD3Head, DipoleHead, QuadrupoleHead,
            ),
        ), f"head {name!r} is not routed spatially yet"
        if isinstance(head, LRCoulombHead) and head.method in ("ewald", "pme"):
            assert ewald_kpts is not None and spec.ewald_eta is not None, (
                "Ewald/PME heads need plan_spatial on an attach_ewald'd "
                "System plus its ewald_kpts"
            )
    kpts_const = None if ewald_kpts is None else np.asarray(ewald_kpts)

    def local_energy(params, coord_l, numbers_l, charge, mult, cell):
        nxl = spec.nx_local
        ext_grid = spec.ext_grid
        axes = spec.axes
        # 2-D tiles arrive as (nxl, nyl, col, ...) blocks; flatten to the
        # ext-grid slot order (x-major) the binned engines expect
        coord_l = coord_l.reshape(-1, 3)
        numbers_l = numbers_l.reshape(-1)

        numbers_ext = _exchange(spec, numbers_l)
        coord_ext = _exchange_coord(spec, coord_l, cell)
        # halo atoms: real pair candidates, excluded from every molecular
        # accumulation (mol_idx = num_mol = the trash segment)
        plane_is_core = spec.core_mask()
        mol_idx_ext = jnp.where((numbers_ext > 0) & plane_is_core, 0, 1)
        mol_idx_core = spec.take_core(mol_idx_ext)

        sys_ext = System(
            coord=coord_ext,
            numbers=numbers_ext,
            charge=charge,
            mol_idx=mol_idx_ext,
            cell=cell[None],
            bins=ext_grid,
        )

        n_core = nxl * spec.ny_local * spec.col_slots
        numbers_core = spec.take_core(numbers_ext)
        a_core = params["afv"]["weight"][numbers_core]
        if cfg.d2features:
            a_core = a_core.reshape(n_core, cfg.nfeature, cfg.nshifts)
        if c == 2:
            # NSE spin channels (reference aimnet/models/aimnet2.py:94-106)
            half_spin = 0.5 * (mult - 1.0)
            half_q = 0.5 * charge
            big_q = jnp.stack([half_q + half_spin, half_q - half_spin], axis=-1)
        else:
            big_q = charge[:, None]  # (1, 1) single charge channel

        charges_core = None
        for ipass in range(npass):
            a_ext = (
                _exchange(spec, a_core.reshape((n_core,) + a_core.shape[1:]))
            )
            q_ext = (
                _exchange(spec, charges_core) if charges_core is not None else None
            )
            conv_a, conv_q = conv_pass_binned(
                sys_ext,
                params["aev"],
                a_ext,
                q_ext,
                params["conv_a"]["agh"],
                params["conv_q"]["agh"],
                cfg.d2features,
                rc_static=cfg.aev.rc_s,
            )
            a_flat = a_core.reshape(n_core, -1)
            if ipass == 0:
                x = jnp.concatenate([a_flat, spec.take_core(conv_a)], axis=-1)
            else:
                x = jnp.concatenate(
                    [
                        a_flat,
                        spec.take_core(conv_a),
                        charges_core,
                        spec.take_core(conv_q),
                    ],
                    axis=-1,
                )
            out = mlp_apply(params["mlps"][ipass], x, mlp_spec_for_pass(cfg, ipass))
            out = jnp.where((numbers_core > 0)[:, None], out, 0.0)
            if ipass == npass - 1:
                aim_core = out
            else:
                _q, _f, delta_a = (
                    out[..., :c],
                    out[..., c : 2 * c],
                    out[..., 2 * c :],
                )
                q = _q if ipass == 0 else charges_core + _q
                q, _dq = _nse_sp(big_q, q, _f * _f, mol_idx_core, 1, axes)
                charges_core = q
                a_core = a_core + delta_a.reshape(a_core.shape)

        # --- heads (energy surface)
        obs: dict = {}
        e_atom = jnp.zeros((n_core,), coord_l.dtype)
        e_mol = jnp.zeros((1,), coord_l.dtype)
        # channel collapse: total charge = sum over spin channels (== the
        # single channel for c == 1; reference aimnet/models/aimnet2.py:178-179)
        q_total_core = charges_core.sum(axis=-1)
        q_ext = _exchange(spec, q_total_core)
        data_core = {"aim": aim_core, "charges": q_total_core}
        for name, head in cfg.outputs:
            # .get: observable-only heads may have no param entry when the
            # caller reuses params initialized for the energy-only config
            p = params["outputs"].get(name)
            if isinstance(head, OutputHead):
                val = mlp_apply(p["mlp"], data_core[head.key_in], head.mlp)
                e_atom = e_atom + jnp.where(
                    numbers_core > 0, val[..., 0], 0.0
                )
            elif isinstance(head, AtomicShiftHead):
                # SAE-external semantics (matching the MD/force surface):
                # the exact float64 SAE is a composition constant applied on
                # the host — force-irrelevant and excluded here
                pass
            elif isinstance(head, AtomicSumHead):
                e_mol = e_mol + _mol_sum_sp(e_atom, mol_idx_core, 1, axes)
                e_atom = jnp.zeros_like(e_atom)
            elif isinstance(head, LRCoulombHead) and head.method in (
                "ewald", "pme",
            ):
                e_mol = e_mol + _ewald_spatial(
                    head, spec, sys_ext, q_ext, mol_idx_core,
                    kpts_const, cell,
                )
            elif isinstance(head, LRCoulombHead):
                e_mol = e_mol + _coulomb_spatial(
                    head, spec, sys_ext, q_ext, mol_idx_core,
                )
            elif isinstance(head, (DipoleHead, QuadrupoleHead)):
                # observable-only heads: no energy contribution.  With
                # observables=True they are assembled below from the core
                # charges with the same psum pattern as the energy sums
                # (twin of heads.py:250-269).
                if observables:
                    r = coord_l
                    if head.center_coord:
                        m_at = jnp.where(
                            numbers_core > 0,
                            p["mass"][numbers_core],
                            0.0,
                        )
                        msum = jax.lax.psum(m_at.sum(), axes)
                        mr = jax.lax.psum(
                            (m_at[:, None] * coord_l).sum(0), axes
                        )
                        r = coord_l - mr / jnp.maximum(msum, 1e-9)
                    qc = jnp.where(numbers_core > 0, q_total_core, 0.0)
                    if isinstance(head, DipoleHead):
                        obs["dipole"] = jax.lax.psum(
                            (qc[:, None] * r).sum(0), axes
                        )
                    else:
                        x = jnp.concatenate(
                            [r**2, r * jnp.roll(r, -1, axis=-1)], axis=-1
                        )
                        quad = jax.lax.psum((qc[:, None] * x).sum(0), axes)
                        x1, x2 = quad[:3], quad[3:]
                        x1 = x1 - x1.mean()
                        obs["quadrupole"] = jnp.concatenate([x1, x2])
            elif isinstance(head, DFTD3Head):
                e_mol = e_mol + _dftd3_spatial(
                    head, spec, sys_ext, p, mol_idx_core,
                )
        if observables:
            obs["energy"] = e_mol
            obs["charges"] = q_total_core
            if c == 2:
                obs["spin_charges"] = (
                    charges_core[..., 0] - charges_core[..., 1]
                )
            return obs
        return e_mol

    @functools.partial(
        jax.jit, static_argnames=()
    )
    def efn(params, coord, numbers, charge, cell, mult=None):
        from jax.experimental.shard_map import shard_map

        if mult is None:
            mult = jnp.ones_like(charge)  # closed shell default
        torus = spec.n_spy > 1
        geom_spec = P("sp", "spy") if torus else P("sp")
        if torus:
            # 2-D torus: shard (nx, ny, col, ...) tiles over both mesh axes.
            # The global flat slot arrays are reshaped at the jit boundary —
            # grads w.r.t. the flat coord flow back through the reshape.
            nx, ny, _nz = spec.grid.nbins
            col = spec.col_slots
            coord = coord.reshape(nx, ny, col, 3)
            numbers = numbers.reshape(nx, ny, col)

        if ens_axis is None:
            if observables:
                # per-slot outputs leave the shard_map in tile shape on the
                # torus ((nxl, nyl, col) -> global (nx, ny, col), x-major ==
                # the flat slot order) and flat on the ring
                def local_obs(params, coord_l, numbers_l, charge, mult, cell):
                    out = local_energy(
                        params, coord_l, numbers_l, charge, mult, cell
                    )
                    if torus:
                        for k in ("charges", "spin_charges"):
                            if k in out:
                                out[k] = out[k].reshape(
                                    spec.nx_local, spec.ny_local, spec.col_slots
                                )
                    return out

                slot_spec = geom_spec
                out_specs = {"energy": P(), "charges": slot_spec}
                if c == 2:
                    out_specs["spin_charges"] = slot_spec
                for _n, h in cfg.outputs:
                    if isinstance(h, DipoleHead):
                        out_specs["dipole"] = P()
                    elif isinstance(h, QuadrupoleHead):
                        out_specs["quadrupole"] = P()
                f = shard_map(
                    local_obs,
                    mesh=mesh,
                    in_specs=(P(), geom_spec, geom_spec, P(), P(), P()),
                    out_specs=out_specs,
                    check_rep=False,
                )
                out = f(params, coord, numbers, charge, mult, cell)
                if torus:
                    for k in ("charges", "spin_charges"):
                        if k in out:
                            out[k] = out[k].reshape(-1)
                return out
            f = shard_map(
                local_energy,
                mesh=mesh,
                in_specs=(P(), geom_spec, geom_spec, P(), P(), P()),
                out_specs=P(),
                check_rep=False,
            )
            return f(params, coord, numbers, charge, mult, cell)[0]

        # ens x sp (or ens x sp x spy on the torus): each mesh slice along
        # ens_axis holds ONE stacked member (leading axis sharded to local
        # size 1 — squeezed before the per-shard energy); sp/spy collectives
        # inside local_energy see only their own ens slice of the mesh
        def local_member(params_m, coord_l, numbers_l, charge, mult, cell):
            p1 = jax.tree.map(lambda x: x[0], params_m)
            e = local_energy(p1, coord_l, numbers_l, charge, mult, cell)[0]
            return e[None]

        f = shard_map(
            local_member,
            mesh=mesh,
            in_specs=(P(ens_axis), geom_spec, geom_spec, P(), P(), P()),
            out_specs=P(ens_axis),
            check_rep=False,
        )
        return f(params, coord, numbers, charge, mult, cell)

    return efn


def _coulomb_spatial(head: LRCoulombHead, spec: SpatialSpec, sys_ext: System,
                     q_ext: Array, mol_idx_core: Array) -> Array:
    """SR/DSF Coulomb on the extended grid; core-receiver per-atom sums
    reduced globally.  Mirrors engine_binned.coulomb_sr_binned /
    coulomb_dsf_binned with the molecular sums spatialized."""
    from aimnetcentral_tpu.models.lr import FACTOR

    rc = float(head.rc)
    # DSF (spatial auto-switches simple -> dsf like the binned engine)
    alpha = float(head.dsf_alpha)
    dsf_rc = float(head.dsf_rc)
    erfc_rc = math.erfc(alpha * dsf_rc)
    shift_val = erfc_rc / dsf_rc
    shift_slope = erfc_rc / dsf_rc**2 + (
        2.0 * alpha / math.sqrt(math.pi) * math.exp(-((alpha * dsf_rc) ** 2)) / dsf_rc
    )

    def e_fn(d, valid, self_b, cand_b):
        qq = self_b["q"][..., :, None] * cand_b["q"][..., None, :]
        e_pair = (
            aops.erfc_approx(alpha * d) / d - shift_val + (d - dsf_rc) * shift_slope
        )
        if head.subtract_sr:
            # fused SR subtraction, exactly as coulomb_dsf_binned
            if head.envelope == "exp":
                x = jnp.clip(d / rc, 0.0, 1.0 - 1e-6)
                fc = jnp.exp(-1.0 / (1.0 - x * x)) / 0.36787944117144233
            else:
                fc = jnp.where(
                    d < rc,
                    0.5 * (jnp.cos(jnp.clip(d, 1e-6, rc) * (jnp.pi / rc)) + 1.0),
                    0.0,
                )
            e_pair = e_pair - fc / d
        return qq * e_pair

    e_i = pair_energy_binned(sys_ext, dsf_rc, e_fn, {"q": q_ext})
    e = FACTOR * _mol_sum_sp(spec.take_core(e_i), mol_idx_core, 1, spec.axes)
    self_coeff = -(shift_val / 2.0 + alpha / math.sqrt(math.pi))
    q_core = spec.take_core(q_ext)
    q_real = jnp.where(spec.take_core(sys_ext.numbers) > 0, q_core, 0.0)
    return e + 2.0 * FACTOR * _mol_sum_sp(
        self_coeff * q_real * q_real, mol_idx_core, 1, spec.axes
    )


def _ewald_spatial(
    head: LRCoulombHead,
    spec: SpatialSpec,
    sys_ext: System,
    q_ext: Array,
    mol_idx_core: Array,
    k_pts: np.ndarray,
    cell: Array,
) -> Array:
    """Full Ewald on the spatial decomposition (VERDICT r2 item 5).

    Real space: the erfc pair sweep runs on the extended local grid exactly
    like DSF (the halo depth covers ``ewald_r_static``, see plan_spatial).
    Reciprocal space: S(k) = sum_i q_i exp(ik.r_i) is a ``psum`` of
    shard-local core-atom contributions — k-space needs NO halo; every shard
    then evaluates the same (replicated) reciprocal/self/background energy.
    Mirrors models/ewald.py::coulomb_periodic_binned + _ewald_nonreal.
    PME requests with an attached mesh spread shard-local charges and psum
    the ADDITIVE mesh instead of S(k) (VERDICT r3 next #4); without a mesh
    they fall back to the exact Ewald k-sum."""
    from aimnetcentral_tpu.models.ewald import HI, KE

    eta = spec.ewald_eta
    axes = spec.axes
    q_ext_m = jnp.where(sys_ext.numbers > 0, q_ext, 0.0)

    def e_fn(d, valid, self_b, cand_b):
        qq = self_b["q"][..., :, None] * cand_b["q"][..., None, :]
        return qq * aops.erfc_approx(d / (math.sqrt(2.0) * eta)) / d

    e_i = pair_energy_binned(
        sys_ext, float(spec.ewald_r_static), e_fn, {"q": q_ext_m}
    )
    e_real = 0.5 * _mol_sum_sp(spec.take_core(e_i), mol_idx_core, 1, axes)

    coord_core = spec.take_core(sys_ext.coord)
    q_core = spec.take_core(q_ext_m)
    volume = jnp.abs(jnp.linalg.det(cell))
    if head.method == "pme" and spec.pme_mesh is not None:
        # PME reciprocal space on the ring: the spread mesh is ADDITIVE over
        # shards (each shard spreads its own core atoms), so rho is one
        # psum; the batched-FFT energy is then evaluated replicated — the
        # same collective pattern as the Ewald structure-factor psum below,
        # with the mesh in place of S(k).  Gradients flow through the psum
        # transpose back to each shard's own atoms.
        from aimnetcentral_tpu.models.pme import (
            pme_reciprocal_from_rho,
            pme_spread_charges,
        )

        inv_at = jnp.broadcast_to(
            jnp.linalg.inv(cell)[None], (coord_core.shape[0], 3, 3)
        )
        rho_local = pme_spread_charges(
            coord_core, q_core, inv_at,
            jnp.zeros(coord_core.shape[0], jnp.int32), 1, spec.pme_mesh,
        )
        rho = jax.lax.psum(rho_local, axes)
        e_recip = pme_reciprocal_from_rho(
            rho, cell[None], jnp.asarray([eta], cell.dtype), spec.pme_mesh
        )[0]
    else:
        recip = 2.0 * jnp.pi * jnp.linalg.inv(cell).T  # (3, 3)
        kvec = jnp.einsum("kd,dh->kh", jnp.asarray(k_pts), recip, precision=HI)
        k2 = jnp.sum(kvec * kvec, axis=-1)  # (K,)
        kmask = (k2 > 1e-12) & (k2 < spec.ewald_k_cutoff**2)
        phase = jnp.einsum("kh,nh->nk", kvec, coord_core, precision=HI)
        s_re = jax.lax.psum(
            jnp.sum(q_core[:, None] * jnp.cos(phase), axis=0), axes
        )
        s_im = jax.lax.psum(
            jnp.sum(q_core[:, None] * jnp.sin(phase), axis=0), axes
        )
        w = jnp.where(
            kmask, jnp.exp(-0.5 * eta * eta * k2) / jnp.where(kmask, k2, 1.0), 0.0
        )
        e_recip = (2.0 * jnp.pi / volume) * jnp.sum(
            w * (s_re * s_re + s_im * s_im)
        )
    e_self = -jax.lax.psum(jnp.sum(q_core * q_core), axes) / (
        jnp.sqrt(2.0 * jnp.pi) * eta
    )
    q_tot = jax.lax.psum(jnp.sum(q_core), axes)
    e_bg = -jnp.pi * q_tot * q_tot * (eta * eta) / volume
    e = KE * (e_real + e_recip + e_self + e_bg)

    if head.subtract_sr:
        # embedded-SR subtraction (twin of engine_binned.coulomb_sr_binned)
        rc = float(head.rc)
        envelope = head.envelope

        def sr_fn(d, valid, self_b, cand_b):
            qq = self_b["q"][..., :, None] * cand_b["q"][..., None, :]
            if envelope == "exp":
                x = jnp.clip(d / rc, 0.0, 1.0 - 1e-6)
                fc = jnp.exp(-1.0 / (1.0 - x * x)) / 0.36787944117144233
            else:
                fc = 0.5 * (jnp.cos(jnp.clip(d, 1e-6, rc) * (jnp.pi / rc)) + 1.0)
                fc = jnp.where(d < rc, fc, 0.0)
            return fc * qq / d

        e_sr_i = pair_energy_binned(sys_ext, rc, sr_fn, {"q": q_ext_m})
        from aimnetcentral_tpu.models.lr import FACTOR

        e = e - FACTOR * _mol_sum_sp(spec.take_core(e_sr_i), mol_idx_core, 1, axes)
    return e


def _dftd3_spatial(
    head: DFTD3Head,
    spec: SpatialSpec,
    sys_ext: System,
    tables: dict[str, Array],
    mol_idx_core: Array,
) -> Array:
    """DFT-D3(BJ) on the spatial decomposition (VERDICT r2 item 5).

    Two sweeps over the same halo structure as the DSF Coulomb (the halo
    depth covers the D3 cutoff, see plan_spatial):
    1. coordination numbers on the extended grid — complete for CORE atoms;
       halo rows then refreshed from their OWNER shards (one scalar-per-atom
       ring exchange), mirroring the message-passing discipline.
    2. the factorized-C6 energy sweep (engine_binned.dftd3_binned math,
       core-receiver sums psum-reduced)."""
    from aimnetcentral_tpu import constants
    from aimnetcentral_tpu.models.engine_binned import (
        d3_cn_fn,
        d3_e_fn,
        d3_pair_extras,
    )

    assert spec.species, "spatial D3 needs the species set (plan_spatial)"
    smoothing_off = float(head.cutoff)
    smoothing_on = smoothing_off * (1.0 - float(head.smoothing_fraction))
    rcov_ext = tables["rcov"][sys_ext.numbers]
    cn_raw = pair_energy_binned(
        sys_ext, smoothing_off, d3_cn_fn(), {"rcov": rcov_ext}
    )
    cn_ext = _exchange(spec, spec.take_core(cn_raw))  # owner-authoritative halo CN
    extras = d3_pair_extras(spec.species, sys_ext.numbers, cn_ext, tables)
    e_i = pair_energy_binned(
        sys_ext, smoothing_off,
        d3_e_fn(head.a1, head.a2, head.s8, head.s6, smoothing_on, smoothing_off),
        extras,
    )
    return constants.half_Hartree * _mol_sum_sp(
        spec.take_core(e_i), mol_idx_core, 1, spec.axes
    )


# ---------------------------------------------------------------------------
# spatial MD: velocity-Verlet + Langevin over the sharded force field


class SpatialMDDriver:
    """MD on ONE spatially-sharded periodic box.

    Integration is elementwise (runs on the sharded arrays); forces come
    from ``jax.grad`` through the shard_map energy; re-binning is a GLOBAL
    shape-stable permutation (ops/binned.bin_atoms + to_slots — the same
    machinery as dynamics/md.py) applied between chunks.  v1 keeps the
    chunk loop host-driven with an unconditional end-of-chunk re-bin; the
    grid margin (= skin) covers intra-chunk drift.
    """

    def __init__(
        self, params, cfg: AIMNet2Config, system: System, md, n_sp: int,
        seed: int = 0, n_spy: int = 1,
    ):
        from aimnetcentral_tpu import constants
        from aimnetcentral_tpu.dynamics.md import maxwell_boltzmann_velocities

        assert system.bins is not None and system.cell is not None
        self.params = params
        self.md = md
        self.spec = plan_spatial(system, cfg, n_sp, n_spy)
        self.mesh = make_spatial_mesh(n_sp, n_spy)
        self.efn = make_spatial_energy_fn(
            cfg, self.spec, self.mesh,
            ewald_kpts=None if system.ewald_kpts is None
            else np.asarray(system.ewald_kpts),
        )
        self.grid = system.bins
        self.system = system
        mass_table = np.clip(constants.get_masses(), 1e-6, None).astype(np.float32)
        self.masses = jnp.asarray(mass_table)[system.numbers]
        key = jax.random.key(seed)
        self.key, vkey = jax.random.split(key)
        self.veloc = maxwell_boltzmann_velocities(
            vkey, self.masses, system.numbers, md.temperature_K
        )
        # initial forces are primed through the chunk executable with dt=0
        # on the first run() — a standalone force jit here would compile the
        # full sharded force graph twice (same trick as dynamics/md.MDDriver)
        self.forces = jnp.zeros_like(system.coord)
        self.epot = None
        self._primed = False
        self._chunk_cache: dict[int, Any] = {}

    # -- jitted pieces ------------------------------------------------------

    def _force(self, coord, numbers, charge, cell):
        """Sharded forces under the MDConfig precision tier's AMBIENT
        context (same semantics as dynamics/md.MDDriver; the context wraps
        the whole value_and_grad so lazily-traced backward rules inherit
        it).  The shard-local conv runs its own engine, so the "balanced"
        tier behaves as "exact" here — at least as accurate as asked."""
        from aimnetcentral_tpu.calculators.calculator import (
            ambient_matmul_context,
            precision_tiers,
        )

        mult = self.system.mult
        mm_prec, _conv = precision_tiers(
            getattr(self.md, "precision", None) or "fast"
        )
        # fast = null context (inherits any user-set global precision)
        with ambient_matmul_context(mm_prec):
            e, g = jax.value_and_grad(
                lambda c: self.efn(self.params, c, numbers, charge, cell, mult)
            )(coord)
        return -g, e

    def _make_chunk(self, n_steps: int):
        from aimnetcentral_tpu import constants

        md = self.md
        charge = self.system.charge
        cell = self.system.cell[0]

        def make_step(dt):
            return lambda carry, x: step(carry, x, dt)

        def step(carry, _, dt):
            # numbers/masses ride the carry: the end-of-chunk re-bin
            # permutes them, and the cached executable must see fresh values
            coord, veloc, forces, key, numbers, masses = carry
            real = (numbers > 0)[:, None]
            m = masses[:, None]
            acc = jnp.where(real, forces / m, 0.0)
            v_half = veloc + 0.5 * dt * acc
            coord = coord + dt * v_half
            f2, epot = self._force(coord, numbers, charge, cell)
            acc2 = jnp.where(real, f2 / m, 0.0)
            veloc = v_half + 0.5 * dt * acc2
            if md.thermostat == "langevin":
                key, nkey = jax.random.split(key)
                gamma = md.friction_fs / constants.fs
                c1 = jnp.exp(-gamma * dt)
                kT = constants.kB * md.temperature_K
                sigma = jnp.sqrt((1.0 - c1 * c1) * kT / m)
                noise = jax.random.normal(nkey, veloc.shape, veloc.dtype)
                veloc = jnp.where(real, c1 * veloc + sigma * noise, 0.0)
            return (coord, veloc, f2, key, numbers, masses), epot

        @jax.jit
        def chunk(coord, veloc, forces, key, numbers, masses, dt_fs):
            dt = dt_fs * constants.fs  # traced: dt_fs=0 primes forces
            (coord, veloc, forces, key, _n, _m), epots = jax.lax.scan(
                make_step(dt), (coord, veloc, forces, key, numbers, masses),
                None, length=n_steps,
            )
            return coord, veloc, forces, key, epots

        return chunk

    def _rebin(self, coord, veloc, forces):
        """Global shape-stable re-bin (slot permutation), wrapped coords."""
        sysb = self.system
        cell0 = sysb.cell[0]
        perm, wrap, ovf = B.bin_atoms(coord, sysb.numbers, self.grid, cell0)
        cw = coord - aops.cellmul(wrap, cell0)
        return (
            B.to_slots(cw, perm),
            B.to_slots(veloc, perm),
            B.to_slots(forces, perm),
            B.to_slots(sysb.numbers, perm),
            B.to_slots(sysb.mol_idx, perm),
            B.to_slots(self.masses, perm),
            ovf,
        )

    # -- host API -----------------------------------------------------------

    def run(self, n_steps: int, chunk: int = 10) -> dict:
        sysb = self.system
        epots = []
        done = 0
        while done < n_steps:
            k = min(chunk, n_steps - done)
            if k not in self._chunk_cache:
                self._chunk_cache[k] = self._make_chunk(k)
            if not self._primed:
                # zero-dt chunk: moves nothing, fills F(x) exactly through
                # the SAME executable (no second force-graph compile); the
                # key is restored so trajectories match an eager prime
                _c, _v, self.forces, _key, _ep = self._chunk_cache[k](
                    sysb.coord, self.veloc, self.forces, self.key,
                    sysb.numbers, self.masses, 0.0,
                )
                self._primed = True
            coord, veloc, forces, self.key, ep = self._chunk_cache[k](
                sysb.coord, self.veloc, self.forces, self.key,
                sysb.numbers, self.masses, self.md.dt_fs,
            )
            epots.append(np.asarray(ep))
            coord, veloc, forces, numbers, mol_idx, masses, ovf = self._rebin(
                coord, veloc, forces
            )
            if int(ovf) > 0:
                raise RuntimeError(
                    f"spatial re-bin overflow ({int(ovf)} atoms); re-plan the "
                    "grid with more capacity slack"
                )
            self.system = sysb = sysb.replace(
                coord=coord, numbers=numbers, mol_idx=mol_idx
            )
            self.veloc, self.forces, self.masses = veloc, forces, masses
            done += k
        self.epot = epots[-1][-1]
        return {"epot": np.concatenate(epots)}
