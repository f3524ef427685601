"""Ensemble calculator: vmapped multi-member evaluation with uncertainty.

The reference ships 4-member ensembles per model family (README.md:140) but
evaluates members one at a time; here the stacked member parameters evaluate
in ONE vmapped compilation (and shard over the ``ens`` mesh axis on multi-
chip systems — the embarrassingly parallel axis called out in SURVEY.md §2.3).
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
    """

    @classmethod
    def from_members(cls, members: list[tuple]) -> "EnsembleCalculator":
        params = stack_params([m[0] for m in members])
        cfg = members[0][1]
        aux = members[0][2] if len(members[0]) > 2 else {"sae": {}}
        return cls((params, cfg, aux))

    def _get_fn(self, cfg, forces: bool, stress: bool, hessian: bool):
        key = ("ens", forces, stress, hessian, cfg)
        if key not in self._fn_cache:
            # vmap over member params cannot batch the Pallas conv's scalar-
            # prefetch grid: pin the XLA engine for ensemble evaluation
            single = make_eval_fn(
                cfg,
                forces=forces,
                stress=stress,
                hessian=hessian,
                sae_external=True,
                conv_engine="xla",
            )

            def ens_fn(params, system):
                # the mean is linear, so the ensemble Hessian is exactly the
                # member-mean Hessian (same for forces/stress); vmap keeps it
                # one compilation (lax.map would halve peak memory if a large
                # ensemble-Hessian workload ever needs it)
                outs = jax.vmap(lambda p: single(p, system))(params)
                res = {k: v.mean(axis=0) for k, v in outs.items()}
                res["energy_std"] = outs["energy"].std(axis=0)
                if "forces" in outs:
                    res["forces_std"] = outs["forces"].std(axis=0)
                if "mol_element_counts" in outs:
                    res["mol_element_counts"] = outs["mol_element_counts"][0]
                return res

            self._fn_cache[key] = jax.jit(ens_fn)
        return self._fn_cache[key]

    def _postprocess(self, out, system):
        res = super()._postprocess(out, system)
        n_real = int(np.asarray(system.numbers > 0).sum())
        if "energy_std" in out:
            res["energy_std"] = np.asarray(out["energy_std"])
        if "forces_std" in out:
            res["forces_std"] = np.asarray(out["forces_std"])[:n_real]
        return res
