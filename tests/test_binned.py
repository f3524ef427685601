"""Binned (stencil-roll) engine vs indexed (nbmat) engine equivalence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.models.aimnet2 import aimnet2_apply
from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict
from aimnetcentral_tpu.models.heads import auto_switch_simple_to_dsf
from aimnetcentral_tpu.ops.binned import plan_bins, to_binned_system

from conftest import random_molecule


@pytest.fixture(scope="module")
def model(reference_aimnet2):
    torch_model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params, _ = convert_state_dict(sd, cfg)
    return params, cfg


def _periodic_case(rng, n=40, a=12.0):
    coord = rng.uniform(0, a, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 7, 8], size=n)
    cell = np.eye(3, dtype=np.float32) * a
    sys_idx = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}],
        cutoff=5.0,
        lr_cutoff=15.0,
    )
    return sys_idx, coord, numbers, cell


@pytest.mark.slow
def test_binned_energy_matches_indexed(model, rng):
    params, cfg = model
    cfg = auto_switch_simple_to_dsf(cfg)
    sys_idx, coord, numbers, cell = _periodic_case(rng)

    out_idx = aimnet2_apply(params, cfg, sys_idx, sae_external=True)
    e_idx = np.asarray(out_idx["energy"])

    grid = plan_bins(cell, 40, edge=5.0)
    sys_bin, perm, overflow = to_binned_system(sys_idx, grid)
    assert int(overflow) == 0
    out_bin = aimnet2_apply(params, cfg, sys_bin, sae_external=True)
    e_bin = np.asarray(out_bin["energy"])

    np.testing.assert_allclose(e_bin, e_idx, atol=5e-4)

    # charges: map slots back to compact order
    q_bin = np.asarray(out_bin["charges"])
    q_idx = np.asarray(out_idx["charges"])
    perm_np = np.asarray(perm)
    valid = np.asarray(sys_bin.numbers) > 0
    q_back = np.zeros_like(q_idx)
    q_back[perm_np[valid]] = q_bin[valid]
    np.testing.assert_allclose(q_back[:40], q_idx[:40], atol=2e-4)


@pytest.mark.slow
def test_binned_forces_match_indexed(model, rng):
    params, cfg = model
    cfg = auto_switch_simple_to_dsf(cfg)
    sys_idx, coord, numbers, cell = _periodic_case(rng, n=30, a=11.0)

    def forces_of(system):
        g = jax.grad(
            lambda c: aimnet2_apply(
                params, cfg, system.replace(coord=c), sae_external=True
            )["energy"].sum()
        )(system.coord)
        return -np.asarray(g)

    f_idx = forces_of(sys_idx)

    grid = plan_bins(cell, 30, edge=5.0)
    sys_bin, perm, overflow = to_binned_system(sys_idx, grid)
    assert int(overflow) == 0
    f_bin = forces_of(sys_bin)

    perm_np = np.asarray(perm)
    valid = np.asarray(sys_bin.numbers) > 0
    f_back = np.zeros_like(f_idx)
    f_back[perm_np[valid]] = f_bin[valid]
    np.testing.assert_allclose(f_back[:30], f_idx[:30], atol=1e-3)


@pytest.mark.slow
def test_binned_gas_phase(model, rng):
    params, cfg = model
    coord, numbers = random_molecule(rng, 25, spread=6.0)
    sys_idx = system_from_molecules([{"coord": coord, "numbers": numbers}])
    out_idx = aimnet2_apply(params, cfg, sys_idx, sae_external=True)

    from aimnetcentral_tpu.ops.binned import BinGrid

    lo, hi = coord.min(0), coord.max(0)
    grid = plan_bins(None, 25, edge=5.0, extent=(lo, hi), safety=8.0)
    sys_bin, perm, overflow = to_binned_system(sys_idx, grid)
    assert int(overflow) == 0
    # gas phase with 'simple' coulomb is all-pairs: binned needs a stencil
    # covering the whole box -> use dsf with a cutoff beyond the extent
    cfg_dsf = auto_switch_simple_to_dsf(
        dataclasses.replace(cfg)
    )
    # simple isn't supported on binned; compare dsf-vs-dsf instead
    from aimnetcentral_tpu.models.heads import LRCoulombHead

    cfg_dsf = dataclasses.replace(
        cfg,
        outputs=tuple(
            (
                n,
                dataclasses.replace(h, method="dsf", dsf_rc=25.0)
                if isinstance(h, LRCoulombHead)
                else h,
            )
            for n, h in cfg.outputs
        ),
    )
    out_idx2 = aimnet2_apply(params, cfg_dsf, sys_idx, sae_external=True)
    out_bin = aimnet2_apply(params, cfg_dsf, sys_bin, sae_external=True)
    np.testing.assert_allclose(
        np.asarray(out_bin["energy"]), np.asarray(out_idx2["energy"]), atol=5e-4
    )


@pytest.mark.slow
def test_binned_dftd3_matches_indexed(reference_aimnet2, rng):
    """Factorized binned D3 vs indexed per-pair-table D3."""
    torch_model, cfg_yaml = reference_aimnet2("aimnet2_dftd3_wb97m.yaml")
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params, _ = convert_state_dict(sd, cfg)
    cfg = auto_switch_simple_to_dsf(cfg)

    sys_idx, coord, numbers, cell = _periodic_case(rng, n=35, a=11.5)
    out_idx = aimnet2_apply(params, cfg, sys_idx, sae_external=True)

    grid = plan_bins(cell, 35, edge=5.0)
    sys_bin, perm, overflow = to_binned_system(sys_idx, grid)
    assert int(overflow) == 0
    out_bin = aimnet2_apply(params, cfg, sys_bin, sae_external=True)
    np.testing.assert_allclose(
        np.asarray(out_bin["energy"]), np.asarray(out_idx["energy"]), atol=5e-4
    )


@pytest.mark.slow
def test_pallas_engine_capacity_guard(monkeypatch):
    """Bin capacities > 56 must route to the XLA conv engine even when
    pallas is requested: Mosaic fails to lower the banded kernels at C >= 64
    ('Input offsets outside of the first tile'; measured boundary C=56 ok /
    C=64 fail, independent of nz).  Exercised here by making the kernel
    entry point explode if reached."""
    import dataclasses

    import jax
    import numpy as np

    from aimnetcentral_tpu.builders import system_from_molecules
    from aimnetcentral_tpu.kernels import conv_pallas
    from aimnetcentral_tpu.models import aimnet2_apply, aimnet2_init
    from aimnetcentral_tpu.models.aimnet2 import AIMNet2Config
    from aimnetcentral_tpu.ops.binned import plan_bins, to_binned_system

    rng = np.random.default_rng(0)
    n, a = 400, 21.0
    coord = rng.uniform(0, a, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    cell = np.eye(3, dtype=np.float32) * a
    sys_c = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}], build_nbmat=False
    )
    grid = dataclasses.replace(plan_bins(cell, n, 7.0, safety=3.0), capacity=64)
    assert grid.nbins == (3, 3, 3)
    sysb, _perm, ovf = to_binned_system(sys_c, grid)
    assert int(ovf) == 0 and sysb.bins.capacity == 64

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("pallas engine must not be used at C >= 64")

    monkeypatch.setattr(conv_pallas, "conv_pass_pallas", boom)
    cfg = AIMNet2Config()
    params = aimnet2_init(jax.random.key(0), cfg)
    out = aimnet2_apply(params, cfg, sysb, conv_engine="pallas")
    assert np.isfinite(np.asarray(out["charges"])).all()


def test_d3ts_binned_matches_indexed_and_fd(rng):
    """First direct numeric gates on the D3TS twins (VERDICT r3 weak #5):
    the binned sweep == the indexed gather formulation on the same geometry,
    and its gradient passes a central finite difference."""
    import jax
    import jax.numpy as jnp

    from aimnetcentral_tpu import constants
    from aimnetcentral_tpu.models import engine_binned as eb
    from aimnetcentral_tpu.models import lr
    from aimnetcentral_tpu.ops.binned import plan_lr_bins

    n, a = 30, 10.0
    coord = rng.uniform(0, a, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    cell = np.eye(3, dtype=np.float32) * a
    sys_idx = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}],
        cutoff=5.0, lr_cutoff=8.0,
    )
    # physical-ish per-atom NN dispersion params (positive, element-spread)
    dp = np.stack(
        [3.0 + 0.3 * numbers + rng.uniform(0, 1, n), 4.0 + 0.1 * numbers],
        axis=1,
    ).astype(np.float32)
    dp_full = np.zeros((sys_idx.coord.shape[0], 2), np.float32)
    dp_full[:n] = dp
    dp_full[n:, 1] = 1.0  # padding-atom alpha convention
    params = {"r4r2": jnp.asarray(constants.get_r4r2(), jnp.float32)}
    a1, a2, s8 = 0.49, 3.5, 0.78

    e_idx = np.asarray(
        lr.d3ts_energy({"disp_param": jnp.asarray(dp_full)}, sys_idx, params, a1, a2, s8)
    )

    grid = plan_bins(cell, n, edge=5.0)
    lr_grid = plan_lr_bins(cell, n, 8.0)
    sys_bin, perm, ovf = to_binned_system(sys_idx, grid, lr_grid)
    assert int(ovf) == 0
    dp_slots = np.zeros((sys_bin.coord.shape[0], 2), np.float32)
    dp_slots[:, 1] = 1.0
    dp_slots[np.asarray(perm) >= 0] = dp_full[np.asarray(perm)[np.asarray(perm) >= 0]]
    # to_binned_system perm maps slot -> compact row; rebuild by gather
    perm_np = np.asarray(perm)
    real_slots = np.asarray(sys_bin.numbers) > 0
    dp_slots = np.zeros((sys_bin.coord.shape[0], 2), np.float32)
    dp_slots[:, 1] = 1.0
    dp_slots[real_slots] = dp_full[perm_np[real_slots]]
    e_bin = np.asarray(
        eb.d3ts_binned(sys_bin, params, jnp.asarray(dp_slots), a1, a2, s8, cutoff=8.0)
    )
    np.testing.assert_allclose(e_bin, e_idx, rtol=2e-5, atol=1e-6)

    # multi twin: stacked copies reproduce the single-member value
    dp_multi = jnp.stack([jnp.asarray(dp_slots)] * 3, axis=1)
    e_multi = np.asarray(
        eb.d3ts_binned_multi(sys_bin, params, dp_multi, a1, a2, s8, cutoff=8.0)
    )
    np.testing.assert_allclose(e_multi, np.repeat(e_bin[:, None], 3, 1), rtol=1e-6)

    # coordinate gradients: binned twin == indexed twin (same pairs at the
    # same geometry; D3TS is hard-truncated like the reference's LR-nbmat
    # sum, so an FD across the cutoff would be ill-posed — cross-check the
    # two independent formulations instead)
    g_bin = np.asarray(
        jax.grad(
            lambda c: eb.d3ts_binned(
                sys_bin.replace(coord=c), params, jnp.asarray(dp_slots),
                a1, a2, s8, cutoff=8.0,
            ).sum()
        )(sys_bin.coord)
    )
    g_idx = np.asarray(
        jax.grad(
            lambda c: lr.d3ts_energy(
                {"disp_param": jnp.asarray(dp_full)},
                sys_idx.replace(coord=c), params, a1, a2, s8,
            ).sum()
        )(sys_idx.coord)
    )
    np.testing.assert_allclose(
        g_bin[real_slots], g_idx[perm_np[real_slots]], atol=5e-6
    )

    # finite difference on a dispersion parameter (smooth in dp everywhere)
    def e_of_dp(dpv):
        return eb.d3ts_binned(
            sys_bin, params, dpv, a1, a2, s8, cutoff=8.0
        ).sum()

    gdp = np.asarray(jax.grad(e_of_dp)(jnp.asarray(dp_slots)))
    i = int(np.flatnonzero(real_slots)[0])
    h = 1e-3
    for k in range(2):
        dp_p = dp_slots.copy(); dp_p[i, k] += h
        dp_m = dp_slots.copy(); dp_m[i, k] -= h
        fd = (float(e_of_dp(jnp.asarray(dp_p))) - float(e_of_dp(jnp.asarray(dp_m)))) / (2 * h)
        assert gdp[i, k] == pytest.approx(fd, abs=1e-5, rel=5e-3)
