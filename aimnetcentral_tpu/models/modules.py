"""Functional building blocks: MLP and embedding init/apply.

JAX counterparts of reference aimnet/modules/core.py:11-68, as pure functions
over explicit param pytrees (no module objects — params convert 1:1 from the
reference's state_dicts).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    """Static MLP description: hidden sizes, activation, last-layer linearity."""

    hidden: tuple[int, ...] = ()
    activation: str = "gelu"
    last_linear: bool = True


def get_activation(name: str) -> Callable[[Array], Array]:
    if name in ("gelu", "torch.nn.GELU"):
        # torch.nn.GELU default is the exact erf formulation
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name in ("gelu_tanh",):
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name in ("silu", "torch.nn.SiLU"):
        return jax.nn.silu
    raise ValueError(f"unknown activation {name!r}")


def mlp_init(rng: Array, n_in: int, n_out: int, spec: MLPSpec) -> list[dict[str, Array]]:
    """Xavier-normal weights, zero biases (reference aimnet/modules/core.py:36-43).

    Weights are stored as (n_in, n_out) — transposed vs torch Linear — so the
    forward is a plain ``x @ w`` feeding the MXU without a transpose.
    """
    sizes = [n_in, *[h for h in spec.hidden if h > 0], n_out]
    layers = []
    for i in range(1, len(sizes)):
        rng, sub = jax.random.split(rng)
        fan_in, fan_out = sizes[i - 1], sizes[i]
        std = np.sqrt(2.0 / (fan_in + fan_out))
        w = jax.random.normal(sub, (fan_in, fan_out), dtype=jnp.float32) * std
        layers.append({"w": w, "b": jnp.zeros((fan_out,), dtype=jnp.float32)})
    return layers


def mlp_apply(layers: list[dict[str, Array]], x: Array, spec: MLPSpec) -> Array:
    act = get_activation(spec.activation)
    n = len(layers)
    for i, layer in enumerate(layers):
        x = x @ layer["w"] + layer["b"]
        if not (spec.last_linear and i == n - 1):
            x = act(x)
    return x


def orthogonal_embedding_init(rng: Array, num: int, dim: int) -> Array:
    """Orthogonal rows 1.. with zero padding row 0 (reference aimnet/modules/core.py:64-68)."""
    w = jax.nn.initializers.orthogonal()(rng, (num, dim), jnp.float32)
    return w.at[0].set(0.0)
