"""Device-mesh parallelism: data-parallel + ensemble-parallel sharding.

TPU-native replacement for the reference's NCCL DDP (reference aimnet/train/
train.py:86-92, SURVEY.md §2.3): a ``jax.sharding.Mesh`` with a ``dp`` axis
(and optional ``ens`` axis for ensemble members); batches are sharded over
``dp``, parameters replicated, and XLA inserts the gradient all-reduce over
ICI automatically when the jitted train step consumes sharded inputs.
For inference, ensembles shard over ``ens`` — the embarrassingly parallel
axis the reference leaves on the table (SURVEY.md §2.3).

Multi-host: initialize via ``jax.distributed.initialize`` before building the
mesh; everything below is host-count agnostic (``jax.devices()`` spans hosts).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aimnetcentral_tpu.system import System


def make_mesh(
    n_dp: int | None = None, n_ens: int = 1, devices: list | None = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_dp = n_dp or (len(devices) // n_ens)
    assert n_dp * n_ens <= len(devices), "not enough devices for requested mesh"
    dev = np.array(devices[: n_dp * n_ens]).reshape(n_dp, n_ens)
    return Mesh(dev, axis_names=("dp", "ens"))


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (parameters) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for stacked batches."""
    return NamedSharding(mesh, P("dp"))


def shard_system(mesh: Mesh, batch: System) -> System:
    """Shard a stacked System batch (leading axis = microbatch per device)
    over the ``dp`` axis.  The System must have a leading batch axis on every
    array field (build with ``builders.stack_systems``)."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
