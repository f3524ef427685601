"""The sharded training step: loss + grad + optimizer update in one jit.

Data parallelism (reference DDP, aimnet/train/train.py:86-92) becomes: stack
per-device microbatches on a leading axis, shard it over the mesh's ``dp``
axis, and jit — XLA partitions the vmapped loss and inserts the gradient
all-reduce over ICI.  No NCCL, no process groups, no wrapper modules.

Forces for force-matching come from ``jax.grad`` of the energy inside the
loss (the reference's ``Forces`` module wrapper, aimnet/modules/core.py:
135-153, is just autograd here).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from aimnetcentral_tpu.models.aimnet2 import AIMNet2Config, aimnet2_apply
from aimnetcentral_tpu.system import System
from aimnetcentral_tpu.train.loss import MTLoss

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: Array


def make_optimizer(
    learning_rate: float | Callable = 1e-3,
    grad_clip: float = 0.4,
    weight_decay: float = 0.0,
    param_group_lr: dict[str, float] | None = None,
) -> optax.GradientTransformation:
    """Adam with global-norm clipping (reference clip 0.4, aimnet/train/
    utils.py:234) and optional regex param-group LR multipliers
    (reference aimnet/train/utils.py:130-162)."""
    base: list[optax.GradientTransformation] = [
        optax.clip_by_global_norm(grad_clip),
    ]
    if weight_decay > 0:
        base.append(optax.add_decayed_weights(weight_decay))
    base.append(optax.scale_by_adam())
    if param_group_lr:
        patterns = list(param_group_lr.items())

        def label_fn(params):
            def label_of(path):
                pathstr = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
                for pat, _mult in patterns:
                    if re.search(pat, pathstr):
                        return pat
                return "__default__"

            return jax.tree_util.tree_map_with_path(lambda p, _: label_of(p), params)

        transforms = {
            pat: optax.scale(mult) for pat, mult in patterns
        }
        transforms["__default__"] = optax.identity()
        base.append(optax.multi_transform(transforms, label_fn))
    base.append(optax.inject_hyperparams(optax.scale_by_learning_rate)(learning_rate))
    return optax.chain(*base)


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Host-side LR override (for ReduceLROnPlateau-style scheduling)."""

    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            s.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
        return s

    return jax.tree_util.tree_map(
        visit, opt_state, is_leaf=lambda s: hasattr(s, "hyperparams")
    )


def get_learning_rate(opt_state: Any) -> float | None:
    lr = []

    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            lr.append(float(s.hyperparams["learning_rate"]))
        return s

    jax.tree_util.tree_map(visit, opt_state, is_leaf=lambda s: hasattr(s, "hyperparams"))
    return lr[0] if lr else None


def ambient_for(precision: str) -> str:
    """Training precision tier -> ambient matmul precision, derived from
    :func:`calculators.calculator.precision_tiers` (the single source of
    the tier mapping).  Only the fast/exact subset exists for training
    (the packed/indexed layouts run the XLA conv engine, where the
    ambient covers every dot; "balanced" has no kernel to split)."""
    if precision not in ("fast", "exact"):
        raise ValueError(
            f"train precision must be 'fast' or 'exact', got {precision!r}"
        )
    from aimnetcentral_tpu.calculators.calculator import precision_tiers

    return precision_tiers(precision)[0]


def _ambient_ctx(ambient: str):
    from aimnetcentral_tpu.calculators.calculator import ambient_matmul_context

    return ambient_matmul_context(ambient)


def make_train_step(
    cfg: AIMNet2Config,
    loss: MTLoss,
    optimizer: optax.GradientTransformation,
    with_forces: bool = True,
    precision: str = "fast",
):
    """Build ``step(state, batch, labels) -> (state, metrics)``.

    ``batch`` is a System with a leading microbatch axis on every field
    (shard it over ``dp`` before calling); ``labels`` a dict of equally
    stacked arrays (``energy`` (D, num_mol), ``forces`` (D, N, 3), ...).

    ``precision``: ``"fast"`` (default — 1-pass bf16 MXU dots, the
    measured-fastest regime; the stochastic-gradient noise floor dwarfs
    the dot truncation) or ``"exact"`` (ambient-HIGHEST f32 — the
    analogue of training with TF32 off; the packed/indexed training
    layouts run the XLA conv engine, where the ambient covers every dot).
    The context wraps the WHOLE grad computation — custom_vjp backwards
    trace lazily (see dynamics.md's measured pitfall)."""
    ambient = ambient_for(precision)

    def per_microbatch(params, system: System, labels: dict):
        if with_forces:

            def e_of(coord):
                # grad-of-grad (force loss) works on the Pallas conv (K3
                # rules), but its tangents fall back to the XLA twin, so
                # the XLA engine is the faster choice for this
                # second-order-dominated graph (indexed batches are inert
                # to the pin anyway)
                out = aimnet2_apply(
                    params,
                    cfg,
                    system.replace(coord=coord),
                    sae_external=False,
                    conv_engine="xla",
                )
                return out["energy"].sum(), out

            (_, out), g = jax.value_and_grad(e_of, has_aux=True)(system.coord)
            pred = {**out, "forces": -g}
        else:
            pred = aimnet2_apply(params, cfg, system, sae_external=False)
        return loss(pred, labels, system)

    def loss_fn(params, batch: System, labels: dict):
        totals, comps = jax.vmap(lambda s, l: per_microbatch(params, s, l))(
            batch, labels
        )
        return totals.mean(), jax.tree.map(lambda x: x.mean(), comps)

    def step(state: TrainState, batch: System, labels: dict):
        with _ambient_ctx(ambient):
            (total, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, labels
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = {"loss": total, **comps, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return step


def init_train_state(
    params: Any, optimizer: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        params=params, opt_state=optimizer.init(params), step=jnp.int32(0)
    )
