"""Calculator facade edge cases from round-1 review: large gas-phase
clusters on the binned engine, per-molecule Ewald accuracy for batched
heterogeneous cells."""

import numpy as np
import pytest

import jax

from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator
from aimnetcentral_tpu.models import aimnet2_init
from aimnetcentral_tpu.models.aimnet2 import AEVConfig, AIMNet2Config
from aimnetcentral_tpu.models.heads import (
    AtomicSumHead,
    LRCoulombHead,
    OutputHead,
)
from aimnetcentral_tpu.models.modules import MLPSpec


def _cfg(coulomb: LRCoulombHead | None):
    outputs = [
        (
            "energy_mlp",
            OutputHead(n_in=32, n_out=1, key_in="aim", key_out="energy",
                       mlp=MLPSpec(hidden=(16,), last_linear=True)),
        ),
        ("atomic_sum", AtomicSumHead(key_in="energy", key_out="energy")),
    ]
    if coulomb is not None:
        outputs.append(("lrcoulomb", coulomb))
    return AIMNet2Config(
        aev=AEVConfig(rc_s=5.0, nshifts_s=8),
        nfeature=4,
        d2features=True,
        ncomb_v=4,
        hidden=((32,), (32,), (32,)),
        aim_size=32,
        outputs=tuple(outputs),
    )


def _cluster(n=60, spread=14.0, seed=3):
    rng = np.random.default_rng(seed)
    coord = rng.uniform(0, spread, size=(n, 3)).astype(np.float32)
    # push apart to >1.2 A
    for _ in range(300):
        d = np.linalg.norm(coord[:, None] - coord[None, :], axis=-1)
        np.fill_diagonal(d, 10.0)
        if d.min() > 1.2:
            break
        i, j = np.unravel_index(d.argmin(), d.shape)
        push = coord[i] - coord[j]
        coord[i] += 0.6 * push / (np.linalg.norm(push) + 1e-9)
    numbers = rng.choice([1, 6, 8], size=n)
    return coord, numbers


@pytest.mark.slow
def test_gas_phase_cluster_routes_binned_and_matches_indexed():
    """A big DSF-Coulomb cluster (no cell) must take the binned engine and
    agree with the indexed path (round-1 gap: clusters always paid the
    O(N^2)-ish host indexed build)."""
    cfg = _cfg(LRCoulombHead(rc=4.6, method="dsf", dsf_rc=9.0,
                             key_in="charges", key_out="energy"))
    params = aimnet2_init(jax.random.key(0), cfg)
    coord, numbers = _cluster()
    data = {"coord": coord, "numbers": numbers, "charge": 0.0}

    calc_b = AIMNet2Calculator((params, cfg, {"sae": {}}), binned_threshold=32)
    calc_i = AIMNet2Calculator((params, cfg, {"sae": {}}), binned_threshold=10**9)

    out_b = calc_b(data, forces=True)
    assert calc_b._last_perm is not None, "binned path was not taken"
    out_i = calc_i(data, forces=True)
    assert calc_i._last_perm is None

    np.testing.assert_allclose(out_b["energy"], out_i["energy"], atol=2e-4)
    np.testing.assert_allclose(out_b["forces"], out_i["forces"], atol=5e-4)
    np.testing.assert_allclose(out_b["charges"], out_i["charges"], atol=1e-4)


@pytest.mark.slow
def test_gas_phase_simple_coulomb_stays_indexed():
    """simple (all-pairs) Coulomb has no open-boundary binned implementation:
    the facade must keep the indexed path rather than raise."""
    cfg = _cfg(LRCoulombHead(rc=4.6, method="simple",
                             key_in="charges", key_out="energy"))
    params = aimnet2_init(jax.random.key(0), cfg)
    coord, numbers = _cluster(n=48)
    calc = AIMNet2Calculator((params, cfg, {"sae": {}}), binned_threshold=32)
    out = calc({"coord": coord, "numbers": numbers, "charge": 0.0})
    assert calc._last_perm is None
    assert np.isfinite(out["energy"]).all()


@pytest.mark.slow
def test_batched_ewald_uses_per_molecule_parameters():
    """Two periodic molecules with very different cells: batched eval must
    match the two single evals (round-1 gap: Ewald parameters came from the
    FIRST molecule's cell for the whole batch)."""
    cfg = _cfg(LRCoulombHead(rc=4.6, method="ewald", ewald_accuracy=1e-6,
                             key_in="charges", key_out="energy"))
    params = aimnet2_init(jax.random.key(0), cfg)
    rng = np.random.default_rng(7)

    def periodic_mol(n, a, seed):
        r = np.random.default_rng(seed)
        coord = r.uniform(0, a, size=(n, 3)).astype(np.float32)
        for _ in range(200):
            d = coord[:, None] - coord[None, :]
            d -= np.round(d / a) * a
            dist = np.linalg.norm(d, axis=-1) + np.eye(n) * 10
            if dist.min() > 1.3:
                break
            i, j = np.unravel_index(dist.argmin(), dist.shape)
            coord[i] = (coord[i] + r.uniform(0, a, 3)) % a
        numbers = r.choice([1, 6, 8], size=n)
        return {
            "coord": coord,
            "numbers": numbers,
            "cell": np.eye(3, dtype=np.float32) * a,
            "charge": 0.0,
        }

    m_small = periodic_mol(10, 7.0, 1)
    m_large = periodic_mol(24, 16.0, 2)

    calc = AIMNet2Calculator((params, cfg, {"sae": {}}), binned_threshold=10**9)
    e1 = calc(m_small)["energy"][0]
    e2 = calc(m_large)["energy"][0]
    both = calc([m_small, m_large])["energy"]
    np.testing.assert_allclose(both, [e1, e2], atol=3e-4)


def test_mixed_cell_nocell_batch_matches_separate_evals():
    """A batch mixing a periodic crystal with a gas-phase molecule must give
    the same energies as separate evals (the reference takes per-system pbc
    flags — aimnet/calculators/neighbors.py:309-321)."""
    rng = np.random.default_rng(11)
    cfg = _cfg(LRCoulombHead(method="dsf", dsf_rc=8.0))
    params = aimnet2_init(jax.random.key(0), cfg)
    calc = AIMNet2Calculator((params, cfg, {"sae": {}}))

    a = 6.0
    crystal = {
        "coord": rng.uniform(0, a, (8, 3)).astype(np.float32),
        "numbers": np.array([8, 1, 1, 6, 1, 1, 1, 1]),
        "charge": 0.0,
        "cell": (np.eye(3) * a).astype(np.float32),
    }
    water = {
        "coord": np.array(
            [[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]],
            np.float32,
        ),
        "numbers": np.array([8, 1, 1]),
        "charge": 0.0,
    }
    out = calc([crystal, water], forces=True)
    # separate evals — the gas molecule through the SAME effective config
    # (the whole batch auto-switched simple->DSF; here the head already is
    # DSF so per-member evals are directly comparable)
    e_c = calc(crystal, forces=True)
    e_w = calc(water, forces=True)
    np.testing.assert_allclose(out["energy"][0], e_c["energy"][0], atol=1e-5)
    np.testing.assert_allclose(out["energy"][1], e_w["energy"][0], atol=1e-5)
    np.testing.assert_allclose(out["forces"][:8], e_c["forces"], atol=1e-5)
    np.testing.assert_allclose(out["forces"][8:], e_w["forces"], atol=1e-5)


def test_fn_cache_bounded():
    """Distinct (flags, cfg) keys must not grow the compiled-fn cache without
    bound (reference bounds its static caches at 8 entries,
    aimnet/calculators/neighbors.py:175-191)."""
    cfg = _cfg(None)
    params = aimnet2_init(jax.random.key(0), cfg)
    calc = AIMNet2Calculator((params, cfg, {"sae": {}}))
    import dataclasses

    # churn 16 distinct cfg variants through _get_fn (jit is lazy — no
    # compiles happen; we're testing the bound, not execution)
    for i in range(16):
        aev = dataclasses.replace(calc.cfg.aev, rc_s=5.0 + 0.01 * i)
        cfg_i = dataclasses.replace(calc.cfg, aev=aev)
        calc._get_fn(cfg_i, True, False, False)
    assert len(calc._fn_cache) <= calc._fn_cache_max
    # most recent entry must still be cached (LRU keeps the hot end)
    fn = calc._get_fn(cfg_i, True, False, False)
    assert calc._get_fn(cfg_i, True, False, False) is fn


def test_repeated_evals_do_not_grow_memory():
    """Steady-state eval loops must not accumulate device buffers: after
    warmup, the live-array count is flat across iterations (the reference's
    analogous guarantee is its bounded static input caches,
    aimnet/calculators/neighbors.py:175-191; here the prep/fn caches hold
    ONE prepared system and <= 8 compiled fns)."""
    cfg = _cfg(None)
    params = aimnet2_init(jax.random.key(0), cfg)
    calc = AIMNet2Calculator((params, cfg, {"sae": {}}))
    coord, numbers = _cluster(n=12, spread=6.0)
    rng = np.random.default_rng(0)

    def eval_once(i):
        jig = coord + rng.uniform(-0.01, 0.01, coord.shape).astype(np.float32)
        out = calc({"coord": jig, "numbers": numbers}, forces=True)
        np.asarray(out["energy"])

    for i in range(3):  # warmup: compiles + caches settle
        eval_once(i)
    n0 = len(jax.live_arrays())
    for i in range(10):
        eval_once(i)
    n1 = len(jax.live_arrays())
    assert n1 <= n0 + 2, f"live device arrays grew {n0} -> {n1}"
    assert len(calc._fn_cache) <= calc._fn_cache_max


def test_eval_exception_leaves_state_consistent():
    """A failing eval (unsupported species) must not corrupt calculator
    state for subsequent evals (reference snapshots/restores eval-scoped
    state, aimnet/calculators/calculator.py:939-947)."""
    cfg = _cfg(None)
    params = aimnet2_init(jax.random.key(0), cfg)
    calc = AIMNet2Calculator(
        (params, cfg, {"sae": {}, "metadata": {"implemented_species": [1, 6, 8]}})
    )
    water = {
        "coord": np.array(
            [[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]],
            np.float32,
        ),
        "numbers": np.array([8, 1, 1]),
        "charge": 0.0,
    }
    ref = calc(water, forces=True)
    bad = dict(water, numbers=np.array([79, 1, 1]))  # Au unsupported
    with pytest.raises(ValueError, match="implemented_species"):
        calc(bad, forces=True)
    again = calc(water, forces=True)
    np.testing.assert_allclose(again["energy"], ref["energy"], atol=0)
    np.testing.assert_allclose(again["forces"], ref["forces"], atol=0)


def test_fast_precision_opt_in(rng):
    """AIMNet2Calculator(precision="fast") (VERDICT r3 next #8): default
    single-bf16-pass matmuls for screening workloads.  Same results to the
    documented ~4e-3 eV/A tolerance (bit-identical on CPU, where 'default'
    and 'highest' coincide); separate fn-cache entries; bad value raises.
    Mirrors the reference's TF32 knob with the opposite default
    (reference aimnet/train/utils.py:19-33)."""
    cfg = _cfg(LRCoulombHead(rc=4.6, method="simple"))
    params = aimnet2_init(jax.random.key(0), cfg)
    coord = rng.uniform(-3, 3, size=(12, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=12)
    data = {"coord": coord, "numbers": numbers, "charge": 0.0}

    exact = AIMNet2Calculator((params, cfg, {"sae": {}}))
    fast = AIMNet2Calculator((params, cfg, {"sae": {}}), precision="fast")
    r_e = exact(data, forces=True)
    r_f = fast(data, forces=True)
    np.testing.assert_allclose(r_f["energy"], r_e["energy"], atol=5e-3)
    np.testing.assert_allclose(r_f["forces"], r_e["forces"], atol=5e-3)

    with pytest.raises(ValueError, match="precision"):
        AIMNet2Calculator((params, cfg, {"sae": {}}), precision="bf16")


def test_balanced_precision_opt_in(rng):
    """AIMNet2Calculator(precision="balanced"): exact XLA-side ambient +
    f32x3 split-dot conv kernels (~1e-5 relative on TPU; on CPU the split
    runs in exact f32 so results track 'exact' to the hi/lo representation
    error).  The kernel-level split numerics are covered by
    test_pallas_conv.py::test_f32x3_split_precision_option; this gate
    covers the facade plumbing end to end."""
    cfg = _cfg(LRCoulombHead(rc=4.6, method="simple"))
    params = aimnet2_init(jax.random.key(0), cfg)
    coord = rng.uniform(-3, 3, size=(12, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=12)
    data = {"coord": coord, "numbers": numbers, "charge": 0.0}

    exact = AIMNet2Calculator((params, cfg, {"sae": {}}))
    bal = AIMNet2Calculator((params, cfg, {"sae": {}}), precision="balanced")
    r_e = exact(data, forces=True)
    r_b = bal(data, forces=True)
    np.testing.assert_allclose(r_b["energy"], r_e["energy"], atol=1e-4)
    np.testing.assert_allclose(r_b["forces"], r_e["forces"], atol=1e-4)
