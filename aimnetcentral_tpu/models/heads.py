"""Output-head chain: config dataclasses + functional init/apply per head.

The reference composes output heads from YAML into an nn.Module chain mutating
the data dict (reference aimnet/models/aimnet2.py:184-185 and
aimnet/modules/core.py / lr.py).  Here each head is a frozen (hashable) spec
usable as a static jit argument, plus pure ``init``/``apply`` functions over an
explicit param dict.  ``apply`` takes and returns the immutable data bus.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aimnetcentral_tpu import constants
from aimnetcentral_tpu.models import lr
from aimnetcentral_tpu.models.modules import MLPSpec, mlp_apply, mlp_init
from aimnetcentral_tpu.ops import nb as nbops
from aimnetcentral_tpu.system import System

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class OutputHead:
    """MLP head reading ``key_in`` -> ``key_out`` (reference aimnet/modules/core.py:114-132)."""

    n_in: int
    n_out: int
    key_in: str
    key_out: str
    mlp: MLPSpec = MLPSpec()
    kind: str = dataclasses.field(default="output", init=False)


@dataclasses.dataclass(frozen=True)
class AtomicShiftHead:
    """Per-element additive shift (SAE) (reference aimnet/modules/core.py:71-97).

    The large baked-in self-atomic energies are NOT added inside the jitted
    graph (f32 accumulation of ~1e3 eV terms would cost ~1e-3 eV of rounding);
    instead the graph emits exact per-molecule element-count histograms and the
    calculator adds ``counts @ sae_float64`` on the host — exact, and the whole
    device graph stays float32.  In training mode (``in_graph=True`` via
    model config) the shifts are small residuals and are applied in-graph.
    """

    key_in: str
    key_out: str
    num_types: int = 64
    reduce_sum: bool = False
    kind: str = dataclasses.field(default="atomic_shift", init=False)


@dataclasses.dataclass(frozen=True)
class AtomicSumHead:
    key_in: str
    key_out: str
    kind: str = dataclasses.field(default="atomic_sum", init=False)


@dataclasses.dataclass(frozen=True)
class DipoleHead:
    key_in: str = "charges"
    key_out: str = "dipole"
    center_coord: bool = False
    kind: str = dataclasses.field(default="dipole", init=False)


@dataclasses.dataclass(frozen=True)
class QuadrupoleHead:
    key_in: str = "charges"
    key_out: str = "quadrupole"
    center_coord: bool = False
    kind: str = dataclasses.field(default="quadrupole", init=False)


@dataclasses.dataclass(frozen=True)
class SRRepHead:
    key_out: str = "e_rep"
    cutoff_fn: str = "none"
    rc: float = 5.2
    reduce_sum: bool = True
    kind: str = dataclasses.field(default="srrep", init=False)


@dataclasses.dataclass(frozen=True)
class LRCoulombHead:
    """(reference aimnet/modules/lr.py:212-309)"""

    key_in: str = "charges"
    key_out: str = "energy"
    rc: float = 4.6
    method: str = "simple"  # simple | dsf | ewald | pme
    dsf_alpha: float = 0.2
    dsf_rc: float = 15.0
    ewald_accuracy: float = 1e-6
    subtract_sr: bool = True
    envelope: str = "exp"
    kind: str = dataclasses.field(default="lrcoulomb", init=False)

    def __post_init__(self):
        # constructor-time rejection, like the reference (lr.py:304-311) —
        # an unknown envelope must not silently select the cosine branch
        if self.envelope not in ("exp", "cosine"):
            raise ValueError(
                f"Unknown envelope {self.envelope!r}, must be 'exp' or 'cosine'"
            )
        if self.method not in ("simple", "dsf", "ewald", "pme"):
            raise ValueError(f"Unknown method {self.method!r}")


@dataclasses.dataclass(frozen=True)
class SRCoulombHead:
    """Subtract embedded SR Coulomb when the full Coulomb is computed
    externally (reference aimnet/modules/lr.py:986-1032)."""

    rc: float = 4.6
    key_in: str = "charges"
    key_out: str = "energy"
    envelope: str = "exp"
    kind: str = dataclasses.field(default="srcoulomb", init=False)

    def __post_init__(self):
        if self.envelope not in ("exp", "cosine"):
            raise ValueError(
                f"Unknown envelope {self.envelope!r}, must be 'exp' or 'cosine'"
            )


@dataclasses.dataclass(frozen=True)
class DispParamHead:
    key_in: str = "disp_param"
    key_out: str = "disp_param"
    kind: str = dataclasses.field(default="disp_param", init=False)


@dataclasses.dataclass(frozen=True)
class D3TSHead:
    a1: float
    a2: float
    s8: float
    s6: float = 1.0
    key_in: str = "disp_param"
    key_out: str = "energy"
    kind: str = dataclasses.field(default="d3ts", init=False)


@dataclasses.dataclass(frozen=True)
class DFTD3Head:
    s8: float
    a1: float
    a2: float
    s6: float = 1.0
    cutoff: float = 15.0
    smoothing_fraction: float = 0.2
    key_out: str = "energy"
    kind: str = dataclasses.field(default="dftd3", init=False)


HeadSpec = (
    OutputHead
    | AtomicShiftHead
    | AtomicSumHead
    | DipoleHead
    | QuadrupoleHead
    | SRRepHead
    | LRCoulombHead
    | SRCoulombHead
    | DispParamHead
    | D3TSHead
    | DFTD3Head
)


def auto_switch_simple_to_dsf(cfg) -> "AIMNet2Config":  # noqa: F821
    """Replace simple -> DSF Coulomb for periodic systems: bare-1/r pair sums
    are neighbor-list-truncated and cutoff-sensitive under PBC
    (reference aimnet/calculators/calculator.py:1044-1062)."""
    import dataclasses as _dc

    new_outputs = tuple(
        (name, _dc.replace(h, method="dsf") if isinstance(h, LRCoulombHead) and h.method == "simple" else h)
        for name, h in cfg.outputs
    )
    return _dc.replace(cfg, outputs=new_outputs)


def head_init(rng: Array, head: HeadSpec) -> dict:
    if head.kind == "output":
        return {"mlp": mlp_init(rng, head.n_in, head.n_out, head.mlp)}
    if head.kind == "atomic_shift":
        return {"weight": jnp.zeros((head.num_types,), dtype=jnp.float32)}
    if head.kind == "srrep":
        repa, repb = constants.get_gfn1_rep()
        tab = np.zeros((87, 2), dtype=np.float32)
        tab[:, 0] = repa
        tab[:, 1] = repb
        return {"gfn1_ab": jnp.asarray(tab)}
    if head.kind in ("dipole", "quadrupole"):
        return {"mass": jnp.asarray(constants.get_masses(), dtype=jnp.float32)}
    if head.kind == "disp_param":
        ref = np.zeros((87, 2), dtype=np.float32)
        ref[0, 1] = 1.0
        return {"disp_param0": jnp.asarray(ref)}
    if head.kind == "d3ts":
        return {"r4r2": jnp.asarray(constants.get_r4r2(), dtype=jnp.float32)}
    if head.kind == "dftd3":
        t = constants.get_d3_tables()
        return {k: jnp.asarray(v) for k, v in t.items()}
    return {}


def _center_coordinates(coord: Array, system: System, masses: Array | None) -> Array:
    if masses is not None:
        m = masses[..., None]
        center = nbops.mol_sum(coord * m, system.mol_idx, system.num_mol) / nbops.mol_sum(
            m, system.mol_idx, system.num_mol
        )
    else:
        sizes = nbops.mol_sum(
            (system.numbers > 0).astype(coord.dtype), system.mol_idx, system.num_mol
        )
        center = nbops.mol_sum(coord, system.mol_idx, system.num_mol) / sizes[:, None]
    return coord - nbops.expand_mol(center, system.mol_idx)


def _add_energy(data: dict, key_out: str, e: Array) -> dict:
    if key_out in data:
        return {**data, key_out: data[key_out] + e}
    return {**data, key_out: e}


def head_apply(head: HeadSpec, params: dict, data: dict, system: System) -> dict:
    if head.kind == "output":
        v = mlp_apply(params["mlp"], data[head.key_in], head.mlp)
        if head.n_out == 1:
            v = v.squeeze(-1)
        v = nbops.mask_pad_atoms(v, system.numbers)
        return {**data, head.key_out: v}

    if head.kind == "atomic_shift":
        shifts = params["weight"].astype(jnp.float32)[system.numbers]
        if head.reduce_sum:
            shifts = nbops.mol_sum(shifts, system.mol_idx, system.num_mol)
        # SAE externalization: emit exact element-count histograms; the
        # calculator applies the float64 table on the host.
        if data.get("_sae_external", False):
            counts = jax.ops.segment_sum(
                jax.nn.one_hot(system.numbers, head.num_types, dtype=jnp.int32),
                system.mol_idx,
                num_segments=system.num_mol + 1,
            )[: system.num_mol]
            return {**data, "mol_element_counts": counts}
        return {**data, head.key_out: data[head.key_in] + shifts}

    if head.kind == "atomic_sum":
        return {
            **data,
            head.key_out: nbops.mol_sum(data[head.key_in], system.mol_idx, system.num_mol),
        }

    if head.kind == "dipole":
        q = data[head.key_in]
        r = system.coord
        if head.center_coord:
            r = _center_coordinates(r, system, params["mass"][system.numbers])
        return {
            **data,
            head.key_out: nbops.mol_sum(q[..., None] * r, system.mol_idx, system.num_mol),
        }

    if head.kind == "quadrupole":
        q = data[head.key_in]
        r = system.coord
        if head.center_coord:
            r = _center_coordinates(r, system, params["mass"][system.numbers])
        x = jnp.concatenate([r**2, r * jnp.roll(r, -1, axis=-1)], axis=-1)
        quad = nbops.mol_sum(q[..., None] * x, system.mol_idx, system.num_mol)
        x1, x2 = quad[..., :3], quad[..., 3:]
        x1 = x1 - x1.mean(axis=-1, keepdims=True)
        return {**data, head.key_out: jnp.concatenate([x1, x2], axis=-1)}

    if head.kind == "srrep":
        if system.bins is not None:
            from aimnetcentral_tpu.models import engine_binned as eb

            e = eb.srrep_binned(system, params["gfn1_ab"], head.rc, head.cutoff_fn)
        else:
            e = lr.srrep_energy(data, system, params, head.rc, head.cutoff_fn)
        return _add_energy(data, head.key_out, e)

    if head.kind == "lrcoulomb" and system.bins is not None:
        from aimnetcentral_tpu.models import engine_binned as eb

        if head.method == "dsf":
            e = eb.coulomb_dsf_binned(
                system,
                data[head.key_in],
                head.rc,
                head.dsf_alpha,
                head.dsf_rc,
                head.envelope,
                head.subtract_sr,
            )
        elif head.method in ("ewald", "pme"):
            from aimnetcentral_tpu.models import ewald as ew

            e = ew.coulomb_periodic_binned(
                data, system, accuracy=head.ewald_accuracy, key_in=head.key_in
            )
            if head.subtract_sr:
                e = e - eb.coulomb_sr_binned(
                    system, data[head.key_in], head.rc, head.envelope
                )
        elif head.method == "simple" and system.bins.molecule_bins:
            # one molecule per bin: the radius-0 sweep IS all intra-
            # molecular pairs, so unbounded 1/r is exact (training batches)
            e = eb.coulomb_simple_binned(
                system, data[head.key_in], head.rc, head.envelope, head.subtract_sr
            )
        else:
            raise ValueError(
                f"Coulomb method {head.method!r} is not supported on the binned "
                "engine (simple is auto-switched to dsf for periodic systems)"
            )
        return _add_energy(data, head.key_out, e)

    if head.kind == "srcoulomb" and system.bins is not None:
        from aimnetcentral_tpu.models import engine_binned as eb

        e_sr = eb.coulomb_sr_binned(system, data[head.key_in], head.rc, head.envelope)
        return _add_energy(data, head.key_out, -e_sr)

    if head.kind == "dftd3" and system.bins is not None:
        from aimnetcentral_tpu.models import engine_binned as eb

        e = eb.dftd3_binned(
            system,
            params,
            head.a1,
            head.a2,
            head.s8,
            head.s6,
            smoothing_on=head.cutoff * (1.0 - head.smoothing_fraction),
            smoothing_off=head.cutoff,
        )
        return _add_energy(data, head.key_out, e)

    if head.kind == "d3ts" and system.bins is not None:
        from aimnetcentral_tpu.models import engine_binned as eb

        e = eb.d3ts_binned(
            system, params, data[head.key_in], head.a1, head.a2, head.s8, head.s6
        )
        return _add_energy(data, head.key_out, e)

    if head.kind == "lrcoulomb":
        if head.method == "simple":
            e = lr.coulomb_simple(
                data, system, head.rc, head.envelope, head.subtract_sr, head.key_in
            )
        elif head.method == "dsf":
            e = lr.coulomb_dsf(
                data,
                system,
                head.rc,
                head.dsf_alpha,
                head.dsf_rc,
                head.envelope,
                head.subtract_sr,
                head.key_in,
            )
        elif head.method in ("ewald", "pme"):
            from aimnetcentral_tpu.models import ewald

            e = ewald.coulomb_periodic(
                data,
                system,
                method=head.method,
                accuracy=head.ewald_accuracy,
                key_in=head.key_in,
            )
            if head.subtract_sr:
                data2 = lr.ensure_dij(data, system, "")
                e = e - lr.coulomb_sr(data2, system, head.rc, head.envelope, head.key_in)
        else:
            raise ValueError(f"unknown Coulomb method {head.method}")
        return _add_energy(data, head.key_out, e)

    if head.kind == "srcoulomb":
        e_sr = lr.coulomb_sr(data, system, head.rc, head.envelope, head.key_in)
        return _add_energy(data, head.key_out, -e_sr)

    if head.kind == "disp_param":
        mult = jnp.exp(jnp.clip(data[head.key_in], -4.0, 4.0))
        vals = params["disp_param0"][system.numbers] * mult
        return {**data, head.key_out: vals}

    if head.kind == "d3ts":
        e = lr.d3ts_energy(
            data, system, params, head.a1, head.a2, head.s8, head.s6, head.key_in
        )
        return _add_energy(data, head.key_out, e)

    if head.kind == "dftd3":
        e = lr.dftd3_energy(
            data,
            system,
            params,
            head.a1,
            head.a2,
            head.s8,
            head.s6,
            smoothing_on=head.cutoff * (1.0 - head.smoothing_fraction),
            smoothing_off=head.cutoff,
        )
        return _add_energy(data, head.key_out, e)

    raise ValueError(f"unknown head kind {head.kind}")
