"""Training stack tests: dataset mechanics, SAE regression, trainer smoke
(loss decreases on a synthetic task), export round-trip."""

import numpy as np
import pytest

from aimnetcentral_tpu.data.sgdataset import SizeGroupedDataset, SizeGroupedSampler
from aimnetcentral_tpu.models.aimnet2 import AEVConfig, AIMNet2Config, aimnet2_init
from aimnetcentral_tpu.models.heads import (
    AtomicShiftHead,
    AtomicSumHead,
    LRCoulombHead,
    OutputHead,
)
from aimnetcentral_tpu.models.modules import MLPSpec
from aimnetcentral_tpu.train.sae import calc_sae
from aimnetcentral_tpu.train.trainer import Trainer, TrainerConfig
from aimnetcentral_tpu.train.loss import LossConfig, LossTerm


def _tiny_cfg():
    return AIMNet2Config(
        aev=AEVConfig(rc_s=5.0, nshifts_s=8),
        nfeature=4,
        d2features=True,
        ncomb_v=4,
        hidden=((32,), (32,), (32,)),
        aim_size=32,
        outputs=(
            (
                "energy_mlp",
                OutputHead(n_in=32, n_out=1, key_in="aim", key_out="energy",
                           mlp=MLPSpec(hidden=(16,), last_linear=True)),
            ),
            ("atomic_shift", AtomicShiftHead(key_in="energy", key_out="energy")),
            ("atomic_sum", AtomicSumHead(key_in="energy", key_out="energy")),
        ),
    )


def _synthetic_ds(rng, sizes=(4, 6), n_per=24):
    """Toy task: energy = sum of pair LJ-ish terms; forces from FD not needed
    (energy-only training)."""
    groups = {}
    for size in sizes:
        coord = rng.uniform(-3, 3, size=(n_per, size, 3)).astype(np.float32)
        numbers = rng.choice([1, 6, 8], size=(n_per, size))
        d = np.linalg.norm(coord[:, :, None] - coord[:, None, :], axis=-1)
        iu = np.triu_indices(size, k=1)
        dd = np.clip(d[:, iu[0], iu[1]], 0.7, None)
        energy = (1.0 / dd**2 - 1.0 / dd).sum(-1).astype(np.float32)
        energy += numbers.sum(-1) * 0.1
        groups[size] = {
            "coord": coord,
            "numbers": numbers,
            "energy": energy,
            "charge": np.zeros(n_per, dtype=np.float32),
        }
    return SizeGroupedDataset(groups)


def test_sampler_shapes(rng):
    ds = _synthetic_ds(rng)
    sampler = SizeGroupedSampler(ds, batch_size=8, shuffle=True, seed=0)
    batches = list(sampler)
    assert len(batches) == len(sampler)
    sizes = {s for s, _ in batches}
    assert sizes == {4, 6}
    # atoms mode
    sampler2 = SizeGroupedSampler(ds, batch_size=24, batch_mode="atoms")
    assert all(len(idx) <= 6 for _s, idx in sampler2)


def test_batch_system_layout(rng):
    ds = _synthetic_ds(rng)
    sample = ds[4].sample(np.arange(5))
    system, labels = ds.make_batch_system(4, sample, pad_mols=8)
    assert system.coord.shape == (8 * 4 + 1, 3)
    assert system.num_mol == 8
    assert labels["energy"].shape == (8,)
    assert int(np.asarray(system.numbers)[-1]) == 0
    # molecule idx of padded molecules goes to trash segment
    assert int(np.asarray(system.mol_idx)[-1]) == 8


def test_sae_regression(rng):
    ds = _synthetic_ds(rng, sizes=(5,), n_per=60)
    # energy dominated by per-element baseline 0.1*Z
    sae = calc_sae(ds)
    for z in (1, 6, 8):
        assert sae[z] == pytest.approx(0.1 * z, abs=0.5)


@pytest.mark.slow
def test_trainer_loss_decreases(rng, tmp_path):
    import jax

    ds = _synthetic_ds(rng)
    cfg = _tiny_cfg()
    params = aimnet2_init(jax.random.key(0), cfg)
    tcfg = TrainerConfig(
        max_epochs=6,
        batch_size=12,
        learning_rate=3e-3,
        with_forces=False,
        checkpoint_dir=str(tmp_path),
        log_file=str(tmp_path / "log.jsonl"),
    )
    loss_cfg = LossConfig(
        terms=(LossTerm(kind="energy", key_pred="energy", key_true="energy"),)
    )
    trainer = Trainer(cfg, params, ds, val_ds=ds, tcfg=tcfg, loss_cfg=loss_cfg)
    out = trainer.fit()
    h = out["history"]
    assert h[-1]["train_loss"] < h[0]["train_loss"]
    assert (tmp_path / "best.npz").exists()
    assert (tmp_path / "log.jsonl").exists()
    assert "energy_mae" in h[-1]


def test_train_step_precision_tier(rng, tmp_path):
    """TrainerConfig(precision="exact") wraps the whole train-step grad in
    the ambient-HIGHEST context (TF32-off analogue).  On CPU the ambient
    tiers coincide, so one exact-step must reproduce the fast-step update;
    invalid values raise up front."""
    import jax

    from aimnetcentral_tpu.train.step import make_train_step

    ds = _synthetic_ds(rng)
    cfg = _tiny_cfg()
    params = aimnet2_init(jax.random.key(0), cfg)
    loss_cfg = LossConfig(
        terms=(LossTerm(kind="energy", key_pred="energy", key_true="energy"),)
    )
    tcfg = TrainerConfig(
        max_epochs=1, batch_size=12, with_forces=False, precision="exact",
    )
    trainer = Trainer(cfg, params, ds, tcfg=tcfg, loss_cfg=loss_cfg)
    out = trainer.fit()
    assert np.isfinite(out["history"][-1]["train_loss"])

    from aimnetcentral_tpu.train.loss import MTLoss
    from aimnetcentral_tpu.train.step import make_optimizer

    with pytest.raises(ValueError, match="precision"):
        make_train_step(
            cfg, MTLoss(loss_cfg), make_optimizer(learning_rate=1e-3),
            precision="balanced",  # only fast/exact exist for training
        )


def test_export_roundtrip(rng, tmp_path):
    import jax

    from aimnetcentral_tpu.models.loader import load_v2_artifact
    from aimnetcentral_tpu.train.export import export_model

    cfg = _tiny_cfg()
    # add an embedded LRCoulomb to exercise externalization
    cfg = AIMNet2Config(
        aev=cfg.aev,
        nfeature=cfg.nfeature,
        d2features=cfg.d2features,
        ncomb_v=cfg.ncomb_v,
        hidden=cfg.hidden,
        aim_size=cfg.aim_size,
        outputs=cfg.outputs
        + (("lrcoulomb", LRCoulombHead(rc=4.6, key_in="charges", key_out="energy")),),
    )
    params = aimnet2_init(jax.random.key(1), cfg)
    sae = {1: -13.6, 6: -1029.5, 8: -2042.6}
    path = str(tmp_path / "exported.pt")
    artifact = export_model(params, cfg, path, sae=sae, implemented_species=[1, 6, 8])
    assert artifact["needs_coulomb"]
    assert artifact["coulomb_mode"] == "sr_embedded"

    loaded = load_v2_artifact(path)
    assert loaded.metadata["needs_coulomb"]
    assert "external_coulomb" in [n for n, _ in loaded.cfg.outputs]
    # baked SAE recovered as float64 host table
    sae_table = next(iter(loaded.aux["sae"].values()))
    assert sae_table[6] == pytest.approx(-1029.5, abs=1e-9)


def test_metrics_streaming(rng):
    from aimnetcentral_tpu.train.metrics import MetricConfig, RegMultiMetric

    m = RegMultiMetric([MetricConfig(key_pred="energy", key_true="energy")])
    t = rng.normal(size=100)
    p = t + rng.normal(size=100) * 0.1
    # two batches must equal one batch
    m.update({"energy": p[:50]}, {"energy": t[:50]})
    m.update({"energy": p[50:]}, {"energy": t[50:]})
    out = m.compute()
    mae = np.abs(p - t).mean()
    rmse = np.sqrt(((p - t) ** 2).mean())
    assert out["energy_mae"] == pytest.approx(mae, rel=1e-9)
    assert out["energy_rmse"] == pytest.approx(rmse, rel=1e-9)
    assert 0.9 < out["energy_r2"] <= 1.0


def test_merge_groups(rng):
    ds = _synthetic_ds(rng, sizes=(4, 5, 6, 7), n_per=10)
    ds.merge_groups(max_groups=2)
    assert len(ds.keys()) == 2
    assert len(ds) == 40
    for size, g in ds.items():
        assert g["coord"].shape[1] == size
        assert g["numbers"].shape[1] == size


def test_param_group_lr_and_checkpoint(rng, tmp_path):
    import jax
    import jax.numpy as jnp

    from aimnetcentral_tpu.train.step import (
        get_learning_rate,
        init_train_state,
        make_optimizer,
        set_learning_rate,
    )
    from aimnetcentral_tpu.train.trainer import load_checkpoint_params, save_checkpoint

    cfg = _tiny_cfg()
    params = aimnet2_init(jax.random.key(0), cfg)
    opt = make_optimizer(learning_rate=1e-3, param_group_lr={r"atomic_shift": 0.1})
    state = init_train_state(params, opt)
    assert get_learning_rate(state.opt_state) == pytest.approx(1e-3)
    new_opt_state = set_learning_rate(state.opt_state, 5e-4)
    assert get_learning_rate(new_opt_state) == pytest.approx(5e-4)

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state)
    params2 = load_checkpoint_params(path, params)
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(params2)
    assert all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


def test_dataset_sharding(rng):
    groups = {5: {"coord": rng.normal(size=(10, 5, 3)).astype(np.float32),
                  "numbers": np.full((10, 5), 6),
                  "energy": np.arange(10, dtype=np.float32)}}
    from aimnetcentral_tpu.data.sgdataset import DataGroup, SizeGroupedDataset

    full = SizeGroupedDataset(groups)
    shard0 = SizeGroupedDataset({5: DataGroup(groups[5], shard=(0, 2))})
    shard1 = SizeGroupedDataset({5: DataGroup(groups[5], shard=(1, 2))})
    assert len(shard0) + len(shard1) == len(full)
    np.testing.assert_array_equal(shard0[5]["energy"], [0, 2, 4, 6, 8])
    np.testing.assert_array_equal(shard1[5]["energy"], [1, 3, 5, 7, 9])


def test_sampler_batches_per_epoch_cap_and_duplication(rng):
    """batches_per_epoch both CAPS an oversized epoch and DUPLICATES to fill
    an undersized one (reference data/sgdataset.py sampler semantics)."""
    ds = _synthetic_ds(rng)
    total = len(list(SizeGroupedSampler(ds, batch_size=8)))
    capped = SizeGroupedSampler(ds, batch_size=8, batches_per_epoch=total - 2, seed=1)
    assert len(list(capped)) == total - 2 == len(capped)
    filled = SizeGroupedSampler(ds, batch_size=8, batches_per_epoch=total + 3, seed=1)
    got = list(filled)
    assert len(got) == total + 3
    assert all(len(idx) > 0 for _s, idx in got)


def test_sampler_shuffle_is_seeded_and_epoch_varying(rng):
    ds = _synthetic_ds(rng)
    def epoch(s):
        return [(sz, tuple(idx)) for sz, idx in s]
    a = SizeGroupedSampler(ds, batch_size=8, shuffle=True, seed=7)
    b = SizeGroupedSampler(ds, batch_size=8, shuffle=True, seed=7)
    e_a1, e_a2 = epoch(a), epoch(a)
    assert epoch(b) == e_a1  # same seed, same first epoch
    assert e_a1 != e_a2  # consecutive epochs reshuffle


def test_sampler_atoms_mode_respects_budget(rng):
    ds = _synthetic_ds(rng)
    sampler = SizeGroupedSampler(ds, batch_size=12, batch_mode="atoms")
    for size, idx in sampler:
        assert len(idx) * size <= 12 or len(idx) == 1
    with pytest.raises(ValueError, match="batch_mode"):
        SizeGroupedSampler(ds, batch_size=8, batch_mode="bogus")


def test_empty_group_skipped(rng):
    ds = _synthetic_ds(rng, sizes=(4,), n_per=3)
    sampler = SizeGroupedSampler(ds, batch_size=8)
    batches = list(sampler)
    assert len(batches) == 1 and len(batches[0][1]) == 3


def test_full_checkpoint_resume_restores_optimizer_and_scheduler(rng, tmp_path):
    """Full-state resume (beyond the reference's weights-only --load): Adam
    moments, step count, LR, plateau counter, and best score all survive —
    a restored optimizer takes the SAME next step as the original."""
    import jax
    import jax.numpy as jnp

    from aimnetcentral_tpu.train.step import (
        get_learning_rate,
        init_train_state,
        make_optimizer,
        set_learning_rate,
    )
    from aimnetcentral_tpu.train.trainer import (
        load_checkpoint_full,
        save_checkpoint,
    )

    cfg = _tiny_cfg()
    params = aimnet2_init(jax.random.key(0), cfg)
    opt = make_optimizer(learning_rate=1e-3)
    state = init_train_state(params, opt)

    # advance the optimizer so moments are non-trivial
    grads = jax.tree.map(lambda x: jnp.ones_like(x) * 0.01, params)
    for _ in range(3):
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        state = state.__class__(
            params=jax.tree.map(lambda p, u: p + u, state.params, updates),
            opt_state=new_opt,
            step=state.step + 1,
        )
    state = state.__class__(
        params=state.params,
        opt_state=set_learning_rate(state.opt_state, 2.5e-4),
        step=state.step,
    )

    path = str(tmp_path / "full.npz")
    save_checkpoint(path, state, scheduler={"lr": 2.5e-4, "plateau": 2, "best_val": 0.125})

    fresh = init_train_state(aimnet2_init(jax.random.key(1), cfg), opt)
    restored, sched = load_checkpoint_full(path, fresh)
    assert int(restored.step) == 3
    assert sched == {"lr": 2.5e-4, "plateau": 2.0, "best_val": 0.125}
    assert get_learning_rate(restored.opt_state) == pytest.approx(2.5e-4)
    # optimizer state bit-equal -> identical next update
    u_a, _ = opt.update(grads, state.opt_state, state.params)
    u_b, _ = opt.update(grads, restored.opt_state, restored.params)
    for x, y in zip(jax.tree.leaves(u_a), jax.tree.leaves(u_b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # weights-only (legacy) checkpoint: params restore, optimizer stays fresh
    legacy = {"__step__": 3}
    leaves, _ = jax.tree.flatten(state.params)
    legacy.update({f"p{i}": np.asarray(x) for i, x in enumerate(leaves)})
    lp = str(tmp_path / "legacy.npz")
    np.savez(lp, **legacy)
    restored2, sched2 = load_checkpoint_full(lp, fresh)
    assert sched2 == {}
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored2.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )


def test_export_atomic_save_preserves_destination_and_permissions(
    rng, tmp_path, monkeypatch
):
    """Reference tests/test_train_utils.py:206-253 behaviors: a failing save
    never replaces an existing artifact; re-export preserves the
    destination's permissions; brand-new artifacts are private (0600)."""
    import os
    import stat

    import jax
    import torch

    from aimnetcentral_tpu.train.export import export_model

    cfg = _tiny_cfg()
    params = aimnet2_init(jax.random.key(1), cfg)
    path = str(tmp_path / "exported.pt")

    # new file: private permissions
    export_model(params, cfg, path, sae=None, implemented_species=[1, 6, 8])
    assert stat.S_IMODE(os.stat(path).st_mode) == 0o600

    # re-export over a chmod'd destination: mode preserved
    os.chmod(path, 0o644)
    export_model(params, cfg, path, sae=None, implemented_species=[1, 6, 8])
    assert stat.S_IMODE(os.stat(path).st_mode) == 0o644

    # failing save: destination untouched, no temp litter
    before = open(path, "rb").read()

    def boom(*a, **k):
        raise RuntimeError("disk on fire")

    monkeypatch.setattr(torch, "save", boom)
    with pytest.raises(RuntimeError, match="disk on fire"):
        export_model(params, cfg, path, sae=None, implemented_species=[1, 6, 8])
    assert open(path, "rb").read() == before
    assert [p for p in os.listdir(tmp_path) if p.endswith(".tmp")] == []


def test_random_split_partitions_and_fractions():
    # (reference tests/test_dataset.py:39-52,175-184)
    rng = np.random.default_rng(0)
    groups = {
        4: {"coord": rng.normal(size=(40, 4, 3)).astype(np.float32),
            "numbers": np.full((40, 4), 6), "energy": rng.normal(size=40)},
        6: {"coord": rng.normal(size=(20, 6, 3)).astype(np.float32),
            "numbers": np.full((20, 6), 6), "energy": rng.normal(size=20)},
    }
    ds = SizeGroupedDataset(groups)
    # reference semantics: exactly len(fractions) datasets come back, so
    # `train, val = ds.random_split(0.9, 0.1)` unpacks (reference
    # aimnet/data/sgdataset.py:265-274); sub-1 sums discard the remainder
    train, val = ds.random_split(0.5, 0.25, seed=1)
    for size, total in ((4, 40), (6, 20)):
        n_train = len(train[size]) if size in train.keys() else 0
        assert n_train == round(total * 0.5)
        assert n_train + len(val[size]) < total  # remainder discarded
    t9, v9 = ds.random_split(0.9, 0.1, seed=2)
    assert len(t9) + len(v9) == len(ds)
    # deterministic under the same seed
    t2, v2 = ds.random_split(0.5, 0.25, seed=1)
    np.testing.assert_array_equal(train[4]["energy"], t2[4]["energy"])
    # invalid fractions rejected
    with pytest.raises(ValueError):
        ds.random_split(0.9, 0.3)
    with pytest.raises(ValueError):
        ds.random_split(-0.1, 0.5)


def test_cv_split_folds_partition_each_group():
    rng = np.random.default_rng(1)
    ds = SizeGroupedDataset(
        {5: {"coord": rng.normal(size=(25, 5, 3)).astype(np.float32),
             "numbers": np.full((25, 5), 1), "energy": rng.normal(size=25)}}
    )
    folds = ds.cv_split(cv=5, seed=2)
    assert len(folds) == 5
    all_val = []
    for train, val in folds:
        assert len(train[5]) + len(val[5]) == 25
        all_val.append(val[5]["energy"])
    # validation folds cover the whole dataset exactly once
    covered = np.sort(np.concatenate(all_val))
    np.testing.assert_allclose(covered, np.sort(ds[5]["energy"]))


def test_save_h5_roundtrip(tmp_path):
    # (reference tests/test_dataset.py:201-208)
    rng = np.random.default_rng(2)
    ds = SizeGroupedDataset(
        {3: {"coord": rng.normal(size=(7, 3, 3)).astype(np.float32),
             "numbers": np.full((7, 3), 8), "energy": rng.normal(size=7)}}
    )
    path = str(tmp_path / "ds.h5")
    ds.save_h5(path)
    back = SizeGroupedDataset(path)
    assert back.keys() == [3]
    np.testing.assert_allclose(back[3]["energy"], ds[3]["energy"])
    np.testing.assert_allclose(back[3]["coord"], ds[3]["coord"])
    # key subsetting on load
    subset = SizeGroupedDataset(path, keys=["energy", "numbers"])
    assert subset.datakeys() == {"energy", "numbers"}
