"""Device-mesh parallelism tests on the virtual 8-device CPU mesh."""

import functools

import numpy as np
import pytest


def test_mesh_construction():
    import jax

    from aimnetcentral_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_dp=4, n_ens=2)
    assert mesh.axis_names == ("dp", "ens")
    assert mesh.devices.shape == (4, 2)


@pytest.mark.slow
def test_full_sharded_training_step():
    """The driver's multichip dryrun as an in-suite guard: one full sharded
    (dp) training step over 8 devices on tiny shapes."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dp_grads_match_single_device(rng):
    """Data-parallel sharded gradients must equal single-device gradients on
    the same total batch (the all-reduce correctness check)."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    from aimnetcentral_tpu.builders import stack_systems, system_from_molecules
    from aimnetcentral_tpu.models.aimnet2 import AEVConfig, AIMNet2Config, aimnet2_init
    from aimnetcentral_tpu.models.heads import AtomicSumHead, OutputHead
    from aimnetcentral_tpu.models.modules import MLPSpec
    from aimnetcentral_tpu.parallel import batch_sharding, make_mesh, replicate
    from aimnetcentral_tpu.train.loss import LossConfig, LossTerm, MTLoss
    from aimnetcentral_tpu.train.step import init_train_state, make_optimizer, make_train_step

    cfg = AIMNet2Config(
        aev=AEVConfig(nshifts_s=8),
        nfeature=4,
        ncomb_v=4,
        hidden=((16,), (16,), (16,)),
        aim_size=16,
        outputs=(
            ("energy_mlp", OutputHead(n_in=16, n_out=1, key_in="aim", key_out="energy",
                                      mlp=MLPSpec(hidden=(8,), last_linear=True))),
            ("atomic_sum", AtomicSumHead(key_in="energy", key_out="energy")),
        ),
    )
    params = aimnet2_init(jax.random.key(0), cfg)

    systems, labels = [], []
    for i in range(4):
        coord = rng.normal(size=(5, 3)).astype(np.float32) * 2
        numbers = rng.choice([1, 6, 8], size=5)
        systems.append(
            system_from_molecules([{"coord": coord, "numbers": numbers}], n_pad=6)
        )
        labels.append({"energy": np.float32(rng.normal(size=1))})
    batch = stack_systems(systems)
    labs = {"energy": jnp.stack([jnp.asarray(l["energy"]) for l in labels])}

    loss = MTLoss(LossConfig(terms=(LossTerm(kind="energy", key_pred="energy", key_true="energy"),)))
    opt = make_optimizer(learning_rate=1e-3)
    step = make_train_step(cfg, loss, opt, with_forces=False)

    # single device
    st1 = init_train_state(params, opt)
    _, m1 = jax.jit(step)(st1, batch, labs)

    # sharded over 4 devices
    mesh = make_mesh(n_dp=4, n_ens=1)
    sh = batch_sharding(mesh)
    batch_s = jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    labs_s = jax.tree.map(lambda x: jax.device_put(x, sh), labs)
    st2 = init_train_state(replicate(mesh, params), opt)
    _, m2 = jax.jit(step)(st2, batch_s, labs_s)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )


def test_metrics_psum_matches_host_accumulation(rng):
    """`batch_stats` psum-reduced over the dp mesh axis inside shard_map must
    reproduce the host-side RegMultiMetric accumulation on the full batch
    (the reference's idist.all_reduce, aimnet/train/metrics.py:146-152)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    from aimnetcentral_tpu.parallel import make_mesh
    from aimnetcentral_tpu.train.metrics import (
        MetricConfig,
        RegMultiMetric,
        batch_stats,
        reduce_stats,
    )

    pred = rng.normal(size=(16, 3)).astype(np.float32)
    true = rng.normal(size=(16, 3)).astype(np.float32)
    mask = (rng.random(size=(16,)) > 0.25)

    mesh = make_mesh(n_dp=4, n_ens=1)

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp")),
        out_specs=P(),
    )
    def sharded_stats(p, t, m):
        return reduce_stats({"f": batch_stats(p, t, m)}, "dp")

    sh = NamedSharding(mesh, P("dp"))
    stats = sharded_stats(
        jax.device_put(jnp.asarray(pred), sh),
        jax.device_put(jnp.asarray(true), sh),
        jax.device_put(jnp.asarray(mask), sh),
    )

    metric = RegMultiMetric([MetricConfig(key_pred="f", key_true="f")])
    metric.update_from_stats(jax.tree.map(np.asarray, stats))
    got = metric.compute()

    ref = RegMultiMetric([MetricConfig(key_pred="f", key_true="f")])
    ref.update({"f": pred}, {"f": true}, weights={"f": mask})
    want = ref.compute()

    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, err_msg=k)
