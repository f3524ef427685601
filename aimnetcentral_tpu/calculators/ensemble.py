"""Ensemble calculator: stacked multi-member evaluation with uncertainty.

The reference ships 4-member ensembles per model family (README.md:140) but
evaluates members one at a time from Python; here the stacked member
parameters evaluate inside ONE compiled ``lax.map`` (each member on the
fused Pallas conv engine — see the note in ``_get_fn``), and shard over the
``ens`` mesh axis on multi-chip systems — the embarrassingly parallel axis
called out in SURVEY.md §2.3.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator
from aimnetcentral_tpu.calculators.derivatives import make_eval_fn


def stack_params(params_list: list[Any]) -> Any:
    """Stack per-member param pytrees on a leading ensemble axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


class EnsembleCalculator(AIMNet2Calculator):
    """Drop-in calculator over stacked ensemble parameters.

    Outputs are ensemble MEANS; per-member spreads are exposed as
    ``energy_std`` / ``forces_std`` (uncertainty quantification).
    Construct via ``from_members([...(params, cfg, aux)...])``.

    ``fused=True`` routes energy/forces evals through the fused ensemble
    forward (models/ensemble_fused.py): geometry, radial basis, and the
    conv pair sweep are computed ONCE and shared across members (~1.9x
    single-model cost for 4 members instead of ~4x — the same engine as
    ensemble MD).  The mean force comes from ONE backward pass of the
    member-mean energy, so the fused path emits ``energy_std`` and
    ``charges_std`` but NOT ``forces_std`` (per-member force jacobians
    inherently cost one backward per member); stress/Hessian requests fall
    back to the exact per-member path automatically.
    """

    def __init__(self, model, *args, fused: bool = False, **kwargs):
        super().__init__(model, *args, **kwargs)
        self._fused = fused
        self._stack_attached_heads()

    def _stack_attached_heads(self) -> None:
        """Ctor LR overrides (needs_coulomb/needs_dispersion) may have
        ATTACHED a head whose constant tables were initialized unstacked —
        broadcast them onto the ensemble axis so the member scan sees one
        uniform leading dim."""
        afv = self.params["afv"]["weight"]
        if afv.ndim != 3:  # not ensemble-stacked params
            return
        n = afv.shape[0]
        from aimnetcentral_tpu.models.heads import head_init

        outs = dict(self.params["outputs"])
        changed = False
        for name, head in self.cfg.outputs:
            template = head_init(jax.random.key(0), head)
            if not template:
                continue
            p = outs[name]
            t_leaves = jax.tree.leaves(template)
            p_leaves = jax.tree.leaves(p)
            # stacking adds exactly one leading dim to every leaf
            if p_leaves and t_leaves and p_leaves[0].ndim == t_leaves[0].ndim:
                outs[name] = jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (n,) + x.shape), p
                )
                changed = True
        if changed:
            self.params = {**self.params, "outputs": outs}

    @classmethod
    def from_members(
        cls, members: list[tuple], fused: bool = False, **calc_kwargs
    ) -> "EnsembleCalculator":
        params = stack_params([m[0] for m in members])
        cfg = members[0][1]
        aux = members[0][2] if len(members[0]) > 2 else {"sae": {}}
        return cls((params, cfg, aux), fused=fused, **calc_kwargs)

    @classmethod
    def from_registry(
        cls, name: str, fused: bool = False, **calc_kwargs
    ) -> "EnsembleCalculator":
        """Load EVERY ensemble member of a registry family in one call
        (e.g. ``EnsembleCalculator.from_registry("aimnet2")`` loads the
        four ``aimnet2-wb97m-d3_{0..3}`` artifacts).

        Members must share one architecture.  Per-member float64 SAE tables
        are averaged for the host-side shift — exact for the ensemble MEAN
        energy (the mean is linear); ``energy_std`` covers the network
        spread (the tiny compositional SAE spread between members of one
        family is not included)."""
        from aimnetcentral_tpu.calculators.registry import (
            ensemble_members,
            registry_family,
            resolve_model,
        )
        from aimnetcentral_tpu.models.loader import load_model

        names = ensemble_members(name)
        loaded = [
            load_model(resolve_model(n), registry_family=registry_family(n))
            for n in names
        ]
        cfg = loaded[0].cfg
        for ld, n in zip(loaded[1:], names[1:]):
            if ld.cfg != cfg:
                raise ValueError(
                    f"ensemble member {n!r} has a different architecture than "
                    f"{names[0]!r}; load members individually instead"
                )
        params = stack_params([ld.params for ld in loaded])
        aux = dict(loaded[0].aux)
        tables = [ld.aux.get("sae", {}) for ld in loaded]
        if any(tables):
            aux["sae"] = {
                k: np.mean([t[k] for t in tables], axis=0)
                for k in tables[0]
            }
        return cls((params, cfg, aux), fused=fused, **calc_kwargs)

    def _get_fn(self, cfg, forces: bool, stress: bool, hessian: bool):
        if self._fused and not (stress or hessian):
            return self._get_fused_fn(cfg, forces)
        key = ("ens", forces, stress, hessian, cfg, self.precision)
        if key not in self._fn_cache:
            from aimnetcentral_tpu.calculators.calculator import precision_tiers

            mm_prec, conv_prec = precision_tiers(self.precision)
            single = make_eval_fn(
                cfg,
                forces=forces,
                stress=stress,
                hessian=hessian,
                sae_external=True,
                matmul_precision=mm_prec,
                conv_precision=conv_prec,
            )

            def ens_fn(params, system):
                # the mean is linear, so the ensemble Hessian is exactly the
                # member-mean Hessian (same for forces/stress).  lax.map —
                # not vmap — over the stacked members: a sequential scan is
                # what lets each member run the fused Pallas conv engine
                # (vmap cannot batch the kernels' scalar-prefetch grid, and
                # would force the ~6x-slower XLA engine on binned systems),
                # keeps ONE compilation of the member body, and bounds peak
                # memory to a single member's graph — the same shape as the
                # on-device ensemble MD driver
                outs = jax.lax.map(lambda p: single(p, system), params)
                res = {k: v.mean(axis=0) for k, v in outs.items()}
                res["energy_std"] = outs["energy"].std(axis=0)
                for k in ("forces", "charges"):  # reference emits *_std for
                    # every keys_out member (calculator.py:1728)
                    if k in outs:
                        res[f"{k}_std"] = outs[k].std(axis=0)
                if "mol_element_counts" in outs:
                    res["mol_element_counts"] = outs["mol_element_counts"][0]
                return res

            self._fn_cache[key] = jax.jit(ens_fn)
        return self._fn_cache[key]

    def _get_fused_fn(self, cfg, forces: bool):
        key = ("ens-fused", forces, cfg, self.precision)
        if key not in self._fn_cache:
            from aimnetcentral_tpu.models.ensemble_fused import (
                aimnet2_apply_ensemble,
            )

            from aimnetcentral_tpu.calculators.calculator import precision_tiers

            prec, conv_prec = precision_tiers(self.precision)
            keep = ("charges", "spin_charges", "dipole", "quadrupole")

            def collect(data):
                out = {
                    "energy": data["energy"].mean(axis=0),
                    "energy_std": data["energy"].std(axis=0),
                }
                for k in keep:
                    if data.get(k) is not None:
                        out[k] = data[k].mean(axis=0)
                out["charges_std"] = data["charges"].std(axis=0)
                if "mol_element_counts" in data:
                    out["mol_element_counts"] = data["mol_element_counts"]
                return out

            def fused_fn(params, system):
                with jax.default_matmul_precision(prec):
                    if not forces:
                        return collect(
                            aimnet2_apply_ensemble(
                                params, cfg, system, sae_external=True,
                                conv_precision=conv_prec,
                            )
                        )

                    def etot(coord):
                        data = aimnet2_apply_ensemble(
                            params, cfg, system.replace(coord=coord),
                            sae_external=True, conv_precision=conv_prec,
                        )
                        return data["energy"].mean(axis=0).sum(), collect(data)

                    (_, out), g = jax.value_and_grad(etot, has_aux=True)(
                        system.coord
                    )
                    out["forces"] = jnp.where(
                        (system.numbers > 0)[:, None], -g, 0.0
                    )
                    return out

            self._fn_cache[key] = jax.jit(fused_fn)
        return self._fn_cache[key]

    def _postprocess(self, out, system):
        res = super()._postprocess(out, system)
        n_real = int(np.asarray(system.numbers > 0).sum())
        if "energy_std" in out:
            res["energy_std"] = np.asarray(out["energy_std"])
        numbers_np = np.asarray(system.numbers)
        for k in ("forces_std", "charges_std"):
            if k in out:
                x = np.asarray(out[k])
                # binned layouts need the slot -> caller-order mapping, same
                # as the mean-valued keys in the parent _postprocess
                res[k] = (
                    self._slots_to_compact(x, numbers_np, n_real)
                    if self._last_perm is not None
                    else x[:n_real]
                )
        return res
