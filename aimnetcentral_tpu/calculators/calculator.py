"""AIMNet2Calculator — the public inference facade.

Mirrors the reference's calculator API (reference aimnet/calculators/
calculator.py:377-1250: ``eval(data, forces=, stress=, hessian=)``,
``__call__``, ``set_lrcoulomb_method``, ``hessian_vector_product``) on a
jit-first design:

- ONE flat padded layout internally; inputs may be single molecules,
  lists of molecules, or dense (B, N, 3) batches.
- Shape bucketing (atoms padded up to multiples of ``atom_bucket``) keeps
  MD/relaxation loops on ONE compiled executable instead of the reference's
  per-call Python orchestration.
- Neighbor matrices are built host-side here (the on-device builders in
  ``dynamics/`` keep full MD loops on-chip); capacity is static with
  overflow-triggered rebuild outside jit.
- Self-atomic energies are applied host-side in exact float64 from
  per-molecule element counts (see AtomicShiftHead) — the device graph is
  pure float32.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.calculators import derivatives
from aimnetcentral_tpu.models.aimnet2 import AIMNet2Config
from aimnetcentral_tpu.models.heads import DFTD3Head, LRCoulombHead
from aimnetcentral_tpu.system import System

# Above this atom count the exact-Ewald (N, K) phase matrix approaches the
# HBM/compiler limit (measured ~30k at accuracy 1e-6 on v5e,
# tools/bench_lr_crossover.py); prepare_system warns and points at PME.
EWALD_ATOM_GUIDANCE_LIMIT = 25_000


def precision_tiers(precision: str) -> tuple[str, str | None]:
    """Map a calculator precision tier to ``(matmul_precision,
    conv_precision)`` — the single source of truth shared by the
    single-model facade and both EnsembleCalculator eval paths, so the
    same tier string can never mean different numerics across facades:

    - ``exact``   -> ("highest", None):  ambient-HIGHEST f32 everywhere
    - ``balanced``-> ("highest", "f32x3"): exact XLA-side ambient, conv
      kernels on hand-split 3x1-pass dots (conv_stencil._mxu_dot)
    - ``fast``    -> ("default", None):  1-pass bf16 dots everywhere
    """
    if precision not in ("exact", "balanced", "fast"):
        raise ValueError(
            f"precision must be 'exact', 'balanced' or 'fast', got {precision!r}"
        )
    return (
        "default" if precision == "fast" else "highest",
        "f32x3" if precision == "balanced" else None,
    )


def ambient_matmul_context(matmul_precision: str):
    """Context manager for a tier's ambient matmuls.

    HIGHEST tiers pin the context; the "default" tier returns a NULL
    context, so fast-mode MD/spatial/training callers keep inheriting any
    user-set global or enclosing precision — the standard
    ``jax.config.update("jax_default_matmul_precision", ...)`` escape
    hatch stays live.  (The facade's fast tier is the one place that
    explicitly pins "default" — it has its own ``AIMNET_MATMUL_PRECISION``
    override, derivatives._resolve_precision.)"""
    import contextlib

    if matmul_precision == "default":
        return contextlib.nullcontext()
    return jax.default_matmul_precision(matmul_precision)


def _warn_ewald_above_limit(n_total: int) -> None:
    """Actionable guidance instead of an opaque compile/HBM failure: the
    exact-Ewald (N, K) phase matrix outgrows device memory near ~30k atoms
    at fixed accuracy (measured, tools/bench_lr_crossover.py); PME matches
    Ewald accuracy at 10k already and scales linearly (docs/long_range)."""
    if n_total > EWALD_ATOM_GUIDANCE_LIMIT:
        import logging

        logging.getLogger(__name__).warning(
            "ewald at %d atoms will likely exhaust device memory (the "
            "(N, K) phase matrix grows with N at fixed accuracy); use "
            "set_lrcoulomb_method('pme') - it matches Ewald accuracy and "
            "scales linearly",
            n_total,
        )


def _as_molecules(data: Mapping[str, Any]) -> list[dict]:
    """Normalize user input into a list of molecule dicts.

    Accepted: single molecule (coord (N,3)), dense batch (coord (B,N,3),
    padding atoms numbers==0), or a list/tuple of per-molecule dicts
    (heterogeneous sizes/cells); charge scalar or (B,), mult, cell (3,3) or
    (B,3,3)."""
    if isinstance(data, (list, tuple)):
        mols = []
        for m in data:
            mol = {
                "coord": np.asarray(m["coord"], dtype=np.float32),
                "numbers": np.asarray(m["numbers"]),
                "charge": float(np.asarray(m.get("charge", 0.0)).reshape(())),
            }
            if m.get("mult") is not None:
                mol["mult"] = float(np.asarray(m["mult"]).reshape(()))
            if m.get("cell") is not None:
                mol["cell"] = np.asarray(m["cell"], dtype=np.float32)
            mols.append(mol)
        return mols
    coord = np.asarray(data["coord"], dtype=np.float32)
    numbers = np.asarray(data["numbers"])
    if coord.ndim == 2:
        coord = coord[None]
        numbers = numbers[None]
    b = coord.shape[0]
    charge = np.broadcast_to(np.asarray(data.get("charge", 0.0), dtype=np.float32).reshape(-1), (b,))
    mult = data.get("mult")
    if mult is not None:
        mult = np.broadcast_to(np.asarray(mult, dtype=np.float32).reshape(-1), (b,))
    cell = data.get("cell")
    if cell is not None:
        cell = np.asarray(cell, dtype=np.float32)
        if cell.ndim == 2:
            cell = np.broadcast_to(cell[None], (b, 3, 3))
    mols = []
    for i in range(b):
        real = numbers[i] > 0
        mol = {
            "coord": coord[i][real],
            "numbers": numbers[i][real],
            "charge": float(charge[i]),
        }
        if mult is not None:
            mol["mult"] = float(mult[i])
        if cell is not None:
            mol["cell"] = cell[i]
        mols.append(mol)
    return mols


def _apply_external_lr_flags(
    params: dict,
    cfg: AIMNet2Config,
    metadata: Mapping[str, Any],
    needs_coulomb: bool,
    needs_dispersion: bool,
) -> tuple[dict, AIMNet2Config]:
    """Strip / attach external LR heads so the model matches the calculator's
    RESOLVED flags (reference aimnet/calculators/calculator.py:195-247 —
    explicit ctor overrides beat artifact metadata; the artifact itself is
    never mutated)."""
    from aimnetcentral_tpu.models.heads import head_init
    from aimnetcentral_tpu.models.loader import attach_external_lr

    outputs = [
        (n, h)
        for n, h in cfg.outputs
        if not (n == "external_coulomb" and not needs_coulomb)
        and not (n == "external_dftd3" and not needs_dispersion)
    ]
    cfg = dataclasses.replace(cfg, outputs=tuple(outputs))
    names = {n for n, _ in outputs}
    attach_c = needs_coulomb and "external_coulomb" not in names
    attach_d = needs_dispersion and "external_dftd3" not in names
    if attach_c or attach_d:
        cfg = attach_external_lr(
            cfg,
            {
                **metadata,
                "needs_coulomb": attach_c,
                "needs_dispersion": attach_d,
            },
        )
    new_names = {n for n, _ in cfg.outputs}
    if new_names != set(params.get("outputs", {})):
        params = dict(params)
        head_params = {
            n: p for n, p in params.get("outputs", {}).items() if n in new_names
        }
        for n, h in cfg.outputs:
            if n not in head_params:
                # external heads carry only constant tables, never learned
                # weights — init is deterministic
                head_params[n] = head_init(jax.random.key(0), h)
        params["outputs"] = head_params
    return params, cfg


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class AIMNet2Calculator:
    """Single-point energy / forces / stress / Hessian calculator.

    Parameters
    ----------
    model :
        ``(params, cfg)`` or ``(params, cfg, aux)`` tuple (from
        ``models.convert`` or ``models.loader``), where ``aux['sae']`` holds
        host-side float64 SAE tables.
    """

    keys_out = (
        "energy",
        "charges",
        "spin_charges",
        "forces",
        "stress",
        "hessian",
        "dipole",
        "quadrupole",
    )

    def __init__(
        self,
        model: tuple | str,
        atom_bucket: int = 16,
        nb_safety: float = 1.25,
        binned_threshold: int = 1024,
        reuse_skin: float = 0.6,
        precision: str = "exact",
        needs_coulomb: bool | None = None,
        needs_dispersion: bool | None = None,
    ):
        """``precision``: ``"exact"`` (default) pins every matmul to exact
        f32 ("highest"), matching the <1e-4 eV/A parity gate — the TPU
        analogue of the reference pinning TF32 OFF for inference
        (reference aimnet/train/utils.py:19-33, same knob with the opposite
        default).  ``"fast"`` runs the MXU's default single-bf16-pass dots
        (~2x matmul throughput, ~4e-3 eV/A force noise — the MD driver's
        default regime; docs/performance.md "Matmul precision").  Use for
        screening workloads where single-point throughput matters more than
        the last digits (VERDICT r3 next #8).  ``"balanced"`` keeps the
        exact ambient for the XLA-side math but runs the Pallas conv
        kernels' dots as hand-split 3x1-pass bf16 contractions
        (conv_stencil._mxu_dot, "f32x3"): measured 6.5e-6 eV/A max force
        delta vs exact on a 10k box — 1000x tighter than "fast" — at
        1.75x the exact throughput (5.23 vs 2.99 calls/s;
        docs/performance.md "Matmul precision").

        ``needs_coulomb`` / ``needs_dispersion``: explicit overrides for the
        external long-range attachment; ``None`` (default) follows the
        artifact metadata (reference aimnet/calculators/calculator.py:151-152,
        195-247 — explicit beats metadata, source metadata is never
        mutated)."""
        precision_tiers(precision)  # validate
        self.precision = precision
        if isinstance(model, str):
            # registry name / alias / artifact path / HF snapshot dir
            # (reference aimnet/calculators/resolve.py:69)
            from aimnetcentral_tpu.calculators.registry import (
                registry_family,
                resolve_model,
            )
            from aimnetcentral_tpu.models.loader import load_model

            loaded = load_model(
                resolve_model(model), registry_family=registry_family(model)
            )
            model = loaded.as_calculator_model()
        if len(model) == 2:
            params, cfg = model
            aux: dict = {"sae": {}}
        else:
            params, cfg, aux = model
        self.params = params
        self.cfg: AIMNet2Config = cfg
        self.aux = aux
        # artifact metadata (implemented_species, family charge policy, ...)
        # rides along in aux so the 3-tuple calculator-model contract is kept
        self.metadata: dict = dict(aux.get("metadata") or {})
        # resolve the EFFECTIVE external-LR flags: explicit ctor override >
        # artifact metadata > heads already present on the config
        # (reference aimnet/calculators/calculator.py:195-205)
        head_names = {n for n, _ in cfg.outputs}
        art_coulomb = bool(
            self.metadata.get("needs_coulomb", "external_coulomb" in head_names)
        )
        art_dispersion = bool(
            self.metadata.get("needs_dispersion", "external_dftd3" in head_names)
        )
        eff_coulomb = art_coulomb if needs_coulomb is None else bool(needs_coulomb)
        eff_dispersion = (
            art_dispersion if needs_dispersion is None else bool(needs_dispersion)
        )
        if self.metadata or needs_coulomb is not None or needs_dispersion is not None:
            # runtime metadata validation against the RESOLVED flags
            # (reference aimnet/models/artifact_validation.py:503) — catches
            # full_embedded + external Coulomb, embedded D3TS + external D3,
            # and enabled-but-incomplete d3_params even when the heads were
            # never attached by the loader
            from aimnetcentral_tpu.models.validation import (
                validate_runtime_model_metadata,
            )

            validate_runtime_model_metadata(
                self.metadata,
                needs_coulomb=eff_coulomb,
                needs_dispersion=eff_dispersion,
            )
        if (eff_coulomb, eff_dispersion) != (
            "external_coulomb" in head_names,
            "external_dftd3" in head_names,
        ):
            params, cfg = _apply_external_lr_flags(
                params, cfg, self.metadata, eff_coulomb, eff_dispersion
            )
            self.params = params
            self.cfg = cfg
        self.atom_bucket = atom_bucket
        self.nb_safety = nb_safety
        # periodic systems larger than this route through the binned stencil
        # engine (index-free pair math; see ops/binned.py)
        self.binned_threshold = binned_threshold
        # LRU-bounded compiled-fn cache: distinct (forces, stress, hessian,
        # cfg) keys accumulate across flag/setter churn — bound it like the
        # reference bounds its static caches at 8 entries
        # (reference aimnet/calculators/neighbors.py:175-191)
        from collections import OrderedDict

        self._fn_cache: "OrderedDict[tuple, Any]" = OrderedDict()
        self._fn_cache_max = 8
        self._last_perm: np.ndarray | None = None
        # runtime LR neighbor-list cutoff overrides
        # (reference aimnet/calculators/calculator.py:729-784)
        self._lr_cutoff_override: float | None = None
        self._dftd3_cutoff_override: float | None = None
        # identity cache so repeated evals of the same numbers array skip the
        # species scan (reference aimnet/calculators/calculator.py:785-838)
        self._species_cache: tuple | None = None
        self._mult_warned = False
        # Verlet-style prepared-system reuse: neighbor structure (binned
        # layout or neighbor matrices, built with +reuse_skin reach) is
        # reused across eval calls while no atom moved more than
        # reuse_skin/2 and the topology is unchanged — the TPU-native twin
        # of the reference's static input caches
        # (reference aimnet/calculators/neighbors.py:95-156)
        self.reuse_skin = reuse_skin
        self._prep_cache: dict | None = None

    # -- configuration ------------------------------------------------------

    @property
    def cutoff(self) -> float:
        return self.cfg.aev.rc_s

    @property
    def is_nse(self) -> bool:
        """True for 2-channel (spin-resolved NSE) models
        (reference aimnet/calculators/calculator.py `is_nse`)."""
        return self.cfg.num_charge_channels == 2

    @classmethod
    def from_legacy_jit(cls, path: str, **calculator_kwargs: Any) -> "AIMNet2Calculator":
        """Construct from a trusted legacy ``.jpt`` TorchScript archive
        (reference aimnet/calculators/calculator.py:352-375).  ``model`` is
        supplied by ``path`` and rejected as a keyword; import-policy
        settings don't apply to ``.jpt`` sources (the architecture comes
        from introspection, not YAML)."""
        if "model" in calculator_kwargs:
            raise TypeError(
                "from_legacy_jit() does not accept a model keyword argument."
            )
        from aimnetcentral_tpu.models.loader import load_model

        loaded = load_model(path)
        return cls(loaded.as_calculator_model(), **calculator_kwargs)

    @property
    def has_external_coulomb(self) -> bool:
        """True when long-range Coulomb is an externalized head (v2
        artifacts with ``needs_coulomb``); False when embedded or absent
        (reference aimnet/calculators/calculator.py:454-462)."""
        return any(n == "external_coulomb" for n, _h in self.cfg.outputs)

    @property
    def has_external_dftd3(self) -> bool:
        """True when D3 dispersion is an externalized head; False for
        embedded D3TS / legacy models (reference calculator.py:464-472)."""
        return any(n == "external_dftd3" for n, _h in self.cfg.outputs)

    @property
    def coulomb_method(self) -> str | None:
        """Current external Coulomb method ("simple"/"dsf"/"ewald"/"pme"),
        or None when Coulomb is embedded or absent (reference
        calculator.py:479-491).  Reports the configured method — the
        periodic simple→DSF auto-switch is per-eval and not reflected."""
        for n, h in self.cfg.outputs:
            if n == "external_coulomb" and isinstance(h, LRCoulombHead):
                return h.method
        return None

    @property
    def coulomb_cutoff(self) -> float | None:
        """Effective external-Coulomb real-space cutoff: ``inf`` for
        "simple", the DSF rc (or ``set_lr_cutoff`` override) for "dsf",
        None for Ewald/PME (estimated per call from ``ewald_accuracy``;
        reference calculator.py:493-505)."""
        method = self.coulomb_method
        if method == "simple":
            return float("inf")
        if method == "dsf":
            h = self._lr_head()
            return self._lr_cutoff_override or (h.dsf_rc if h else None)
        return None

    @property
    def dftd3_cutoff(self) -> float | None:
        """Current D3 dispersion cutoff in Angstrom, or None without a D3
        head (reference calculator.py:507-515)."""
        d3 = self._d3_head()
        if d3 is None:
            return None
        return self._dftd3_cutoff_override or d3.cutoff

    def _lr_head(self) -> LRCoulombHead | None:
        for _name, h in self.cfg.outputs:
            if isinstance(h, LRCoulombHead):
                return h
        return None

    def _d3_head(self) -> DFTD3Head | None:
        for _name, h in self.cfg.outputs:
            if isinstance(h, DFTD3Head):
                return h
        return None

    def set_lrcoulomb_method(self, method: str, **kwargs: Any) -> None:
        """Switch the Coulomb method at runtime
        (reference aimnet/calculators/calculator.py:638-728).  Triggers a jit
        recompile on next eval (config is static)."""
        valid = ("simple", "dsf", "ewald", "pme")
        if method not in valid:
            raise ValueError(
                f"unknown Coulomb method {method!r}; expected one of {valid}"
            )
        new_outputs = []
        for name, h in self.cfg.outputs:
            if isinstance(h, LRCoulombHead):
                h = dataclasses.replace(h, method=method, **kwargs)
            new_outputs.append((name, h))
        self.cfg = dataclasses.replace(self.cfg, outputs=tuple(new_outputs))
        self._fn_cache.clear()
        self._prep_cache = None

    def set_lr_cutoff(self, cutoff: float) -> None:
        """Unified long-range neighbor-list cutoff for Coulomb + D3 sweeps
        (reference aimnet/calculators/calculator.py:729-752).  Ewald/PME keep
        estimating their own real-space cutoff and ignore this."""
        self._lr_cutoff_override = float(cutoff)
        self._dftd3_cutoff_override = float(cutoff)
        self._fn_cache.clear()
        self._prep_cache = None

    def set_dftd3_cutoff(
        self, cutoff: float | None = None, smoothing_fraction: float | None = None
    ) -> None:
        """Set the D3 cutoff + smoothing window (changes the dispersion energy,
        not just the list; reference aimnet/calculators/calculator.py:752-784)."""
        if cutoff is None:
            cutoff = 15.0
        if smoothing_fraction is None:
            smoothing_fraction = 0.2
        new_outputs = []
        for name, h in self.cfg.outputs:
            if isinstance(h, DFTD3Head):
                h = dataclasses.replace(
                    h, cutoff=float(cutoff), smoothing_fraction=float(smoothing_fraction)
                )
            new_outputs.append((name, h))
        self.cfg = dataclasses.replace(self.cfg, outputs=tuple(new_outputs))
        self._dftd3_cutoff_override = float(cutoff)
        self._fn_cache.clear()
        self._prep_cache = None

    # -- input validation -----------------------------------------------------

    def _validate_species_and_charge(self, data: Mapping[str, Any]) -> None:
        """Validate atomic numbers against ``implemented_species`` and net
        charge against the family policy (reference aimnet/calculators/
        calculator.py:785-878).  No-op for models without metadata."""
        if isinstance(data, (list, tuple)):
            for m in data:
                self._validate_species_and_charge(m)
            return
        if (
            data.get("mult") is not None
            and self.cfg.num_charge_channels == 1
            and not self._mult_warned
            and np.any(np.asarray(data["mult"], dtype=np.float64) != 1.0)
        ):
            # warn ONCE per calculator, like the reference
            # (aimnet/calculators/calculator.py mult guard, tests/
            # test_calculator.py:1740 test_mult_ignored_warns_once)
            warnings.warn(
                "mult is ignored by this closed-shell (non-NSE) model",
                stacklevel=3,
            )
            self._mult_warned = True
        impl = self.metadata.get("implemented_species") or []
        if impl and "numbers" in data:
            numbers = data["numbers"]
            key = None
            if isinstance(numbers, np.ndarray):
                # identity alone is NOT enough: numpy arrays mutate in place
                # with the same id/shape (no torch-style _version counter to
                # ride, cf. reference aimnet/calculators/neighbors.py:175-191
                # keying on _version) — a content fingerprint keeps the skip
                # honest at ~50x less cost than the np.unique scan it avoids
                key = (
                    id(numbers), numbers.shape, str(numbers.dtype),
                    hash(numbers.tobytes()),
                )
            if key is None or self._species_cache != key:
                seen = {int(z) for z in np.unique(np.asarray(numbers)) if int(z) > 0}
                unsupported = sorted(seen - set(int(z) for z in impl))
                if unsupported:
                    raise ValueError(
                        f"Atomic numbers {unsupported} are not in this model's "
                        f"implemented_species {sorted(int(z) for z in impl)}. "
                        "Evaluating untrained elements yields undefined output. "
                        "Pass validate_species=False to bypass."
                    )
                self._species_cache = key
        if self.metadata.get("supports_charged_systems") is False:
            charge = np.atleast_1d(np.asarray(data.get("charge", 0.0), dtype=np.float64))
            if charge.size and np.abs(charge).max() > 1e-6:
                bad = charge[np.abs(charge) > 1e-6].tolist()
                raise ValueError(
                    "This model does not support net-charged systems (got "
                    f"non-zero charge(s) {bad}). Net-neutral zwitterions are "
                    "supported. Pass validate_species=False to bypass."
                )

    def _needs_lr_nb(self) -> bool:
        return self._lr_head() is not None or self._d3_head() is not None

    def _effective_cfg(self, has_cell: bool) -> AIMNet2Config:
        """Auto-switch simple -> DSF Coulomb for periodic cells
        (reference aimnet/calculators/calculator.py:1044-1062)."""
        from aimnetcentral_tpu.models.heads import auto_switch_simple_to_dsf

        if not has_cell:
            return self.cfg
        return auto_switch_simple_to_dsf(self.cfg)


    # -- Verlet-style prepared-system reuse ---------------------------------

    @staticmethod
    def _prep_key(mols: list[dict], allow_binned: bool) -> tuple:
        parts = []
        for m in mols:
            parts.append(
                (
                    np.asarray(m["numbers"]).tobytes(),
                    float(m.get("charge", 0.0)),
                    None if m.get("mult") is None else float(m["mult"]),
                    None if m.get("cell") is None else np.asarray(m["cell"]).tobytes(),
                )
            )
        return (allow_binned, tuple(parts))

    def _store_prep(
        self,
        mols: list[dict],
        allow_binned: bool,
        system: System,
        kind: str,
        n_pad: int,
        perm: np.ndarray | None = None,
        wrap: np.ndarray | None = None,
        cell: np.ndarray | None = None,
    ) -> None:
        if self.reuse_skin <= 0:
            return
        self._prep_cache = {
            "key": self._prep_key(mols, allow_binned),
            "kind": kind,
            "system": system,
            "ref": np.concatenate(
                [np.asarray(m["coord"], np.float32) for m in mols]
            ),
            "n_pad": n_pad,
            "perm": perm,
            "wrap": wrap,
            "cell": cell,
        }

    def _reuse_prepared(self, mols: list[dict], allow_binned: bool) -> System | None:
        """Reuse the cached neighbor structure while the topology is
        unchanged and no atom moved more than reuse_skin/2 since the build
        (lists/layouts are built with +reuse_skin reach, so the result is
        EXACT — the engines mask every term at its physical cutoff)."""
        c = self._prep_cache
        if c is None or self.reuse_skin <= 0:
            return None
        if c["key"] != self._prep_key(mols, allow_binned):
            return None
        new = np.concatenate([np.asarray(m["coord"], np.float32) for m in mols])
        if new.shape != c["ref"].shape:
            return None
        if c["kind"] == "packed":
            # molecule-bin layout: bins are molecule identity, not geometry —
            # any displacement keeps the prepared structure exact
            self._last_perm = c["perm"]
            return c["system"].replace(coord=jnp.asarray(new[c["perm"]]))
        if np.abs(new - c["ref"]).max() > 0.5 * self.reuse_skin:
            return None
        compact = np.ones((c["n_pad"], 3), np.float32)
        compact[: len(new)] = new
        if c["kind"] == "binned":
            if c["wrap"] is not None:
                # the wrap CACHED at build time keeps coordinates continuous
                # for atoms that crossed the box boundary since (their bin
                # assignment is stale by < skin, covered by the grid margin)
                compact = compact - c["wrap"] @ c["cell"]
            self._last_perm = c["perm"]
            return c["system"].replace(coord=jnp.asarray(compact[c["perm"]]))
        self._last_perm = None
        if c["wrap"] is not None:
            # indexed periodic systems live in the wrapped frame (see
            # builders.system_from_molecules); re-apply the CACHED Cartesian
            # wrap so the stale-but-exact shift matrices stay consistent
            compact = compact - c["wrap"]
        return c["system"].replace(coord=jnp.asarray(compact))

    # -- evaluation ---------------------------------------------------------

    def prepare_system(
        self, data: Mapping[str, Any], allow_binned: bool = True
    ) -> System:
        from aimnetcentral_tpu.models.ewald import attach_ewald, estimate_ewald_parameters

        mols = _as_molecules(data)
        reused = self._reuse_prepared(mols, allow_binned)
        if reused is not None:
            return reused
        n_real = sum(len(m["numbers"]) for m in mols)
        n_pad = _round_up(n_real + 1, self.atom_bucket)
        has_cell = any("cell" in m for m in mols)
        self._last_perm = None

        # large single-structure systems: the binned stencil engine (no
        # O(N^2) host neighbor build, no index matrices).  Periodic cells
        # always qualify; gas-phase clusters qualify unless the model needs
        # simple (all-pairs) Coulomb, which the binned engine does not
        # implement for open boundaries (round-1 gap: big clusters paid a
        # host-side O(N^2) indexed build).
        cfg_eff0 = self._effective_cfg(has_cell)
        h_eff0 = next(
            (hh for _n, hh in cfg_eff0.outputs if isinstance(hh, LRCoulombHead)), None
        )

        # large batches of gas-phase molecules: the molecule-bin packed
        # layout (one molecule per bin, radius-0 dense block math — see
        # builders.system_molecule_bins).  Zero host-side neighbor builds,
        # zero per-pair gathers, exact for every head incl. unbounded simple
        # Coulomb; the geometry never invalidates the layout, so relaxation/
        # screening loops reuse one prepared system forever.  Guarded by a
        # slot-efficiency check so one giant molecule in a batch of small
        # ones falls back to the indexed path.
        if allow_binned and not has_cell and len(mols) > 1 and n_real >= self.binned_threshold:
            from aimnetcentral_tpu.builders import system_molecule_bins

            cap = max(8, _round_up(max(len(m["numbers"]) for m in mols), 8))
            if cap * len(mols) <= 4 * n_real:
                sysp = system_molecule_bins(mols, capacity=cap)
                perm = np.zeros(sysp.natoms, dtype=np.int64)
                off = 0
                for k, m in enumerate(mols):
                    n = len(m["numbers"])
                    perm[k * cap : k * cap + n] = np.arange(off, off + n)
                    off += n
                self._last_perm = perm
                self._store_prep(
                    mols, allow_binned, sysp, "packed", n_real, perm=perm
                )
                return sysp

        binned_ok = has_cell or h_eff0 is None or h_eff0.method == "dsf"
        if (
            allow_binned
            and binned_ok
            and len(mols) == 1
            and n_real >= self.binned_threshold
        ):
            import jax as _jax

            from aimnetcentral_tpu.ops import binned as B

            h_eff = h_eff0
            system = system_from_molecules(mols, n_pad=n_pad, build_nbmat=False)
            if has_cell:
                cell_np = np.asarray(mols[0]["cell"])
                extent = None
            else:
                cell_np = None
                coord_np = np.asarray(mols[0]["coord"])
                extent = (coord_np.min(axis=0), coord_np.max(axis=0))
            # coarse LR twin layout when any long-range sweep exists: sized
            # by the largest LR cutoff so its stencil stays at radius 2
            lr_cuts = []
            if h_eff is not None and h_eff.method == "dsf":
                lr_cuts.append(self._lr_cutoff_override or h_eff.dsf_rc)
            if h_eff is not None and h_eff.method in ("ewald", "pme") and has_cell:
                if h_eff.method == "ewald":
                    # the binned branch is where large single boxes land —
                    # exactly the scenario the guidance targets
                    _warn_ewald_above_limit(n_real)
                ew = estimate_ewald_parameters(
                    np.asarray(mols[0]["cell"]), n_real, h_eff.ewald_accuracy
                )
                lr_cuts.append(float(ew.r_cutoff))
            d3h = self._d3_head()
            if d3h is not None:
                lr_cuts.append(self._dftd3_cutoff_override or d3h.cutoff)
            lr_cut = max(lr_cuts) if lr_cuts else None

            import dataclasses as _dc

            safety = 1.5
            lr_safety = 1.5
            skin = max(self.reuse_skin, 0.0)
            while True:
                grid = _dc.replace(
                    B.plan_bins(
                        cell_np, n_real, self.cutoff + skin, extent=extent,
                        safety=safety,
                    ),
                    margin=skin,
                )
                lr_grid = (
                    B.plan_lr_bins(
                        cell_np, n_real, lr_cut, extent=extent,
                        safety=lr_safety, margin=skin,
                    )
                    if lr_cut is not None
                    else None
                )
                sysb, perm, ovf = _jax.jit(
                    B.to_binned_system, static_argnums=(1, 2)
                )(system, grid, lr_grid)
                if int(ovf) == 0:
                    break
                safety *= 1.5
                lr_safety *= 1.5
                if safety > 32:
                    raise RuntimeError("bin capacity planning failed")
            self._last_perm = np.asarray(perm)
            if h_eff is not None and h_eff.method in ("ewald", "pme"):
                sysb = attach_ewald(
                    sysb, h_eff.ewald_accuracy, pme=h_eff.method == "pme"
                )
            wrap_np = None
            if cell_np is not None:
                compact0 = np.ones((n_pad, 3), np.float32)
                compact0[:n_real] = np.asarray(mols[0]["coord"], np.float32)
                wrap_np = np.floor(
                    compact0 @ np.linalg.inv(cell_np)
                ).astype(np.float32)
            self._store_prep(
                mols, allow_binned, sysb, "binned", n_pad,
                perm=self._last_perm, wrap=wrap_np, cell=cell_np,
            )
            return sysb

        cutoff = self.cutoff if (has_cell or n_real > 2048) else None

        h = self._lr_head()
        d3 = self._d3_head()
        cfg_eff = self._effective_cfg(has_cell)
        h_eff = next(
            (hh for _n, hh in cfg_eff.outputs if isinstance(hh, LRCoulombHead)), None
        )

        # per-module LR neighbor-list cutoffs; split into separate lists when
        # they diverge >20% so the D3 sweep doesn't pay the Ewald radius (and
        # vice versa) — reference aimnet/calculators/calculator.py:559-636
        d3_cut: float | None = None
        if d3 is not None:
            d3_cut = self._dftd3_cutoff_override or d3.cutoff
        coul_cut: float | None = None
        ewald_acc = None
        if h_eff is not None:
            if h_eff.method == "dsf":
                coul_cut = self._lr_cutoff_override or h_eff.dsf_rc
            elif h_eff.method in ("ewald", "pme"):
                if not has_cell:
                    raise ValueError(f"{h_eff.method} Coulomb requires a periodic cell")
                if h_eff.method == "ewald":
                    _warn_ewald_above_limit(sum(len(m["numbers"]) for m in mols))
                # per-molecule accuracy: the shared list must cover the
                # LARGEST real-space cutoff of the batch (attach_ewald then
                # carries per-molecule eta/k_cutoff arrays)
                coul_cut = max(
                    estimate_ewald_parameters(
                        np.asarray(m["cell"]), len(m["numbers"]), h_eff.ewald_accuracy
                    ).r_cutoff
                    for m in mols
                )
                ewald_acc = h_eff.ewald_accuracy
            elif h_eff.method == "simple" and cutoff is not None:
                # cutoff-bounded base list (large cluster): simple Coulomb
                # still needs all pairs (reference calculator.py:620-626)
                coul_cut = self._lr_cutoff_override or 1e6

        lr_cutoff = coulomb_cutoff = dftd3_cutoff = None
        if cutoff is not None:
            if (
                d3_cut is not None
                and coul_cut is not None
                and max(d3_cut, coul_cut) / min(d3_cut, coul_cut) > 1.2
            ):
                coulomb_cutoff, dftd3_cutoff = coul_cut, d3_cut
            elif d3_cut is not None or coul_cut is not None:
                lr_cutoff = max(c for c in (d3_cut, coul_cut) if c is not None)

        skin = max(self.reuse_skin, 0.0)
        system = system_from_molecules(
            mols,
            cutoff=None if cutoff is None else cutoff + skin,
            lr_cutoff=None if lr_cutoff is None else lr_cutoff + skin,
            coulomb_cutoff=None if coulomb_cutoff is None else coulomb_cutoff + skin,
            dftd3_cutoff=None if dftd3_cutoff is None else dftd3_cutoff + skin,
            n_pad=n_pad,
        )
        if ewald_acc is not None:
            system = attach_ewald(
                system, ewald_acc, pme=(h_eff is not None and h_eff.method == "pme")
            )
        # Cartesian wrap offsets applied by the builder (wrapped frame):
        # needed to re-wrap new coordinates consistently on reuse
        wrap_cart = None
        if has_cell:
            wrap_cart = np.zeros((n_pad, 3), np.float32)
            off = 0
            for m in mols:
                c = np.asarray(m["coord"], np.float64)
                if m.get("cell") is not None:
                    cb = np.asarray(m["cell"], np.float64)
                    w = np.floor(c @ np.linalg.inv(cb))
                    wrap_cart[off : off + len(c)] = (w @ cb).astype(np.float32)
                off += len(c)
        self._store_prep(
            mols, allow_binned, system, "indexed", n_pad, wrap=wrap_cart
        )
        return system

    def _cache_put(self, key: tuple, fn: Any) -> Any:
        self._fn_cache[key] = fn
        if len(self._fn_cache) > self._fn_cache_max:
            self._fn_cache.popitem(last=False)
        return fn

    def _get_fn(self, cfg: AIMNet2Config, forces: bool, stress: bool, hessian: bool):
        key = (forces, stress, hessian, cfg, self.precision)
        if key in self._fn_cache:
            self._fn_cache.move_to_end(key)
            return self._fn_cache[key]
        mm_prec, conv_prec = precision_tiers(self.precision)
        fn = derivatives.make_eval_fn(
            cfg,
            forces=forces,
            stress=stress,
            hessian=hessian,
            sae_external=True,
            matmul_precision=mm_prec,
            conv_precision=conv_prec,
        )
        return self._cache_put(key, jax.jit(fn))

    def eval(
        self,
        data: Mapping[str, Any],
        forces: bool = False,
        stress: bool = False,
        hessian: bool = False,
        *,
        validate_species: bool = True,
    ) -> dict[str, np.ndarray]:
        if validate_species:
            self._validate_species_and_charge(data)
        if hessian:
            mols = _as_molecules(data)
            if len(mols) > 1:
                # batched Hessians: evaluate per structure (reference
                # aimnet/calculators/calculator.py:1247-1414)
                outs = [
                    self.eval(m, forces=forces, stress=stress, hessian=True)
                    for m in mols
                ]
                res: dict[str, Any] = {
                    "energy": np.concatenate([o["energy"] for o in outs])
                }
                for k in outs[0]:
                    if k != "energy":
                        res[k] = [o[k] for o in outs]
                return res
        system = self.prepare_system(data, allow_binned=not hessian)
        cfg_eff = self._effective_cfg(system.cell is not None)
        out = self._get_fn(cfg_eff, forces, stress, hessian)(self.params, system)
        return self._postprocess(out, system)

    __call__ = eval

    def _slots_to_compact(
        self, x: np.ndarray, numbers_np: np.ndarray, n_real: int
    ) -> np.ndarray:
        """Map slot-layout per-atom results back to input atom order."""
        valid = numbers_np > 0
        out = np.zeros((n_real,) + x.shape[1:], dtype=x.dtype)
        out[self._last_perm[valid]] = x[valid]
        return out

    _POSTPROCESS_KEYS = (
        "energy", "mol_element_counts", "charges", "spin_charges", "forces",
        "stress", "dipole", "quadrupole", "hessian",
    )

    def _postprocess(self, out: Mapping[str, Any], system: System) -> dict[str, np.ndarray]:
        # ONE batched device_get for everything this method touches: each
        # per-array np.asarray is a separate device round trip (expensive on
        # remote attachments), and untouched intermediates (e.g. "aim")
        # must never transfer at all
        fetched = jax.device_get(
            {
                **{k: v for k, v in out.items() if k in self._POSTPROCESS_KEYS},
                "_numbers": system.numbers,
            }
        )
        numbers_np = fetched.pop("_numbers")
        out = fetched
        n_real = int((numbers_np > 0).sum())
        binned = self._last_perm is not None
        res: dict[str, np.ndarray] = {}
        energy = np.asarray(out["energy"], dtype=np.float64)
        if "mol_element_counts" in out:
            counts = np.asarray(out["mol_element_counts"], dtype=np.float64)
            for sae64 in self.aux.get("sae", {}).values():
                k = min(counts.shape[1], len(sae64))
                energy = energy + counts[:, :k] @ np.asarray(sae64[:k], dtype=np.float64)
        res["energy"] = energy
        for k in ("charges", "spin_charges", "forces"):
            if k in out:
                x = np.asarray(out[k])
                res[k] = (
                    self._slots_to_compact(x, numbers_np, n_real)
                    if binned
                    else x[:n_real]
                )
        for k in ("stress", "dipole", "quadrupole"):
            if k in out:
                res[k] = np.asarray(out[k])
        if "hessian" in out:
            res["hessian"] = np.asarray(
                derivatives.real_atom_hessian(out["hessian"], n_real)
            )
        return res

    def hessian_vector_product(
        self, data: Mapping[str, Any], v: np.ndarray, *, validate_species: bool = True
    ) -> np.ndarray:
        """Matrix-free H @ v, exact for every LR method
        (reference aimnet/calculators/calculator.py:1755-1987)."""
        if validate_species:
            self._validate_species_and_charge(data)
        # indexed layout: v is ordered by input atoms, which only matches the
        # system's atom order on the non-binned path
        system = self.prepare_system(data, allow_binned=False)
        # same effective config as eval: periodic systems auto-switch
        # simple -> DSF, so HVP and dense Hessian use one Hamiltonian
        cfg_eff = self._effective_cfg(system.cell is not None)
        key = ("hvp", cfg_eff)
        if key in self._fn_cache:
            self._fn_cache.move_to_end(key)
            hvp_fn = self._fn_cache[key]
        else:
            hvp_fn = self._cache_put(key, jax.jit(derivatives.make_hvp_fn(cfg_eff)))
        n_real = int(np.asarray(system.numbers > 0).sum())
        v_pad = np.zeros((system.natoms, 3), dtype=np.float32)
        v_pad[:n_real] = np.asarray(v, dtype=np.float32).reshape(n_real, 3)
        hv = hvp_fn(self.params, system, jnp.asarray(v_pad))
        return np.asarray(hv)[:n_real]
