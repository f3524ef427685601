"""Molecule-bin packed training layout: parity vs the indexed twin.

One molecule per bin, radius-0 stencil (builders.system_molecule_bins) —
the TPU expression of the reference's dense mode-0 batching (reference
aimnet/nbops.py mode 0).  Energies/forces/charges and the full train step
(loss + param grads) must match the indexed all-pairs layout exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aimnetcentral_tpu.builders import system_from_molecules, system_molecule_bins
from aimnetcentral_tpu.models import aimnet2_apply, aimnet2_init
from aimnetcentral_tpu.models.aimnet2 import AEVConfig, AIMNet2Config
from aimnetcentral_tpu.models.heads import (
    AtomicShiftHead,
    AtomicSumHead,
    LRCoulombHead,
    OutputHead,
)
from aimnetcentral_tpu.models.modules import MLPSpec

from conftest import random_molecule


def _cfg_with_coulomb():
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
            ("lrcoulomb", LRCoulombHead(rc=4.6, method="simple", key_in="charges",
                                        key_out="energy")),
        ),
    )


def _mols(rng, sizes=(11, 9, 11, 5)):
    out = []
    for n in sizes:
        coord, numbers = random_molecule(rng, n)
        out.append(
            {"coord": coord, "numbers": numbers,
             "charge": float(rng.integers(-1, 2))}
        )
    return out


@pytest.fixture(scope="module")
def model():
    cfg = _cfg_with_coulomb()
    params = aimnet2_init(jax.random.key(0), cfg)
    return cfg, params


def _unpack(x, mols, capacity):
    return np.concatenate(
        [np.asarray(x)[k * capacity : k * capacity + len(m["numbers"])]
         for k, m in enumerate(mols)]
    )


def _compact(x, mols):
    rows, off = [], 0
    for m in mols:
        n = len(m["numbers"])
        rows.append(np.asarray(x)[off : off + n])
        off += n
    return np.concatenate(rows)


def test_packed_apply_matches_indexed(model, rng):
    cfg, params = model
    mols = _mols(rng)
    s_idx = system_from_molecules(mols)  # all-pairs intra-molecular
    s_pk = system_molecule_bins(mols)
    assert s_pk.bins.molecule_bins and s_pk.bins.capacity == 16

    out_i = aimnet2_apply(params, cfg, s_idx, sae_external=False)
    out_p = aimnet2_apply(params, cfg, s_pk, sae_external=False)
    np.testing.assert_allclose(out_p["energy"], out_i["energy"], atol=2e-6)

    c = s_pk.bins.capacity
    np.testing.assert_allclose(
        _unpack(out_p["charges"], mols, c), _compact(out_i["charges"], mols),
        atol=1e-6,
    )

    def grad_of(s):
        def f(coord):
            return aimnet2_apply(
                params, cfg, s.replace(coord=coord), sae_external=False
            )["energy"].sum()

        return jax.grad(f)(s.coord)

    np.testing.assert_allclose(
        _unpack(grad_of(s_pk), mols, c), _compact(grad_of(s_idx), mols),
        atol=1e-5,
    )


def test_calculator_packed_batch_parity(model, rng):
    """Batched gas-phase eval routes through the molecule-bin packed layout
    (zero host neighbor builds) and matches the indexed path; the prepared
    structure survives arbitrarily large displacements (bins are molecule
    identity, not geometry)."""
    from aimnetcentral_tpu.calculators import AIMNet2Calculator

    cfg, params = model
    mols = _mols(rng, sizes=(11, 9, 11, 5, 7, 12))
    calc_p = AIMNet2Calculator((params, cfg), binned_threshold=32)
    calc_i = AIMNet2Calculator((params, cfg), binned_threshold=10**9)

    out_p = calc_p(mols, forces=True)
    assert calc_p._prep_cache["kind"] == "packed"
    out_i = calc_i(mols, forces=True)
    np.testing.assert_allclose(out_p["energy"], out_i["energy"], atol=1e-5)
    np.testing.assert_allclose(out_p["forces"], out_i["forces"], atol=1e-5)
    np.testing.assert_allclose(out_p["charges"], out_i["charges"], atol=1e-5)

    # large displacement: no rebuild, still exact
    mols2 = [
        {**m, "coord": m["coord"] + rng.normal(size=m["coord"].shape).astype(np.float32) * 2.0}
        for m in mols
    ]
    cached = calc_p._prep_cache["system"]
    out_p2 = calc_p(mols2, forces=True)
    assert calc_p._prep_cache["system"] is cached
    out_i2 = calc_i(mols2, forces=True)
    np.testing.assert_allclose(out_p2["energy"], out_i2["energy"], atol=1e-5)
    np.testing.assert_allclose(out_p2["forces"], out_i2["forces"], atol=1e-5)


def test_packed_train_step_matches_indexed(model, rng):
    """Full train step (force loss -> grad-of-grad -> param grads) agrees
    between layouts: same loss, same parameter gradients."""
    from aimnetcentral_tpu.data.sgdataset import SizeGroupedDataset
    from aimnetcentral_tpu.train.loss import LossConfig, MTLoss
    from aimnetcentral_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg, params = model
    size, b = 6, 5
    coord = rng.uniform(-2.5, 2.5, size=(b, size, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=(b, size))
    sample = {
        "coord": coord,
        "numbers": numbers,
        "energy": rng.normal(size=b).astype(np.float32),
        "forces": rng.normal(size=(b, size, 3)).astype(np.float32) * 0.1,
        "charge": np.zeros(b, dtype=np.float32),
    }
    ds = SizeGroupedDataset({size: sample})

    loss = MTLoss(LossConfig())
    opt = make_optimizer(learning_rate=1e-3)
    step = make_train_step(cfg, loss, opt, with_forces=True)

    results = {}
    for layout in ("indexed", "packed"):
        make = (
            ds.make_batch_system_packed if layout == "packed" else ds.make_batch_system
        )
        system, labels = make(size, sample, pad_mols=b)
        batch = jax.tree.map(lambda x: x[None] if hasattr(x, "ndim") else x, system)
        labs = {k: jnp.asarray(v)[None] for k, v in labels.items()}
        state = init_train_state(params, opt)
        new_state, metrics = jax.jit(step)(state, batch, labs)
        results[layout] = (float(metrics["loss"]), new_state.params)

    l_i, p_i = results["indexed"]
    l_p, p_p = results["packed"]
    assert l_p == pytest.approx(l_i, abs=1e-5)
    flat_i = jax.tree.leaves(p_i)
    flat_p = jax.tree.leaves(p_p)
    for a, bb in zip(flat_i, flat_p):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a), atol=2e-5)
