"""MD and relaxation engine tests: NVE energy conservation, Langevin
thermostat temperature, neighbor rebuild correctness, FIRE convergence."""

import numpy as np
import pytest

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.dynamics import MDConfig, MDDriver, fire_relax
from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict

from conftest import random_molecule


@pytest.fixture(scope="module")
def model(reference_aimnet2):
    torch_model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params, _ = convert_state_dict(sd, cfg)
    return params, cfg


def _pbc_system(rng, n=24, a=9.0):
    coord = rng.uniform(0.5, a - 0.5, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    cell = np.eye(3, dtype=np.float32) * a
    return system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}], cutoff=6.0, lr_cutoff=16.0
    )


@pytest.mark.slow
def test_nve_energy_conservation(model, rng):
    params, cfg = model
    sys = _pbc_system(rng)
    drv = MDDriver(
        params, cfg, sys, MDConfig(dt_fs=0.2, thermostat="nve", temperature_K=50.0)
    )
    def etot(state):
        real = (np.asarray(state.system.numbers) > 0)[:, None]
        ke = 0.5 * np.sum(
            np.where(
                real,
                np.asarray(state.masses)[:, None] * np.asarray(state.veloc) ** 2,
                0.0,
            )
        )
        return float(np.asarray(state.epot).sum() + ke)

    obs = drv.run(5, chunk=5)
    e0 = etot(drv.state)
    drv.run(40, chunk=20)
    e1 = etot(drv.state)
    assert e1 == pytest.approx(e0, abs=0.05)  # eV drift over 40 steps


def test_md_precision_tier(model, rng):
    """MDConfig(precision="balanced") threads the facade's tier semantics
    into the MD force evals: ambient HIGHEST + f32x3 conv kernels.  On CPU
    ambient precisions coincide, so the balanced trajectory must MATCH the
    (ambient-exact) default-CPU one while the plumbing exercises the full
    tier path; split-dot hardware numerics are covered by
    test_pallas_conv.py::test_f32x3_split_precision_option."""
    params, cfg = model
    sys = _pbc_system(rng)
    cfg_md = dict(dt_fs=0.2, thermostat="nve", temperature_K=50.0)
    drv = MDDriver(params, cfg, sys, MDConfig(**cfg_md, precision="balanced"))
    obs = drv.run(4, chunk=2)
    assert np.isfinite(obs["epot"]).all()
    import pytest as _pt

    with _pt.raises(ValueError, match="precision"):
        MDDriver(params, cfg, sys, MDConfig(**cfg_md, precision="f32x3"))._force_fn(
            params, sys
        )


@pytest.mark.slow
def test_langevin_holds_temperature(model, rng):
    params, cfg = model
    sys = _pbc_system(rng, n=30)
    drv = MDDriver(
        params,
        cfg,
        sys,
        MDConfig(dt_fs=0.5, thermostat="langevin", temperature_K=300.0, friction_fs=0.05),
    )
    obs = drv.run(150, chunk=50)
    t_mean = obs["temperature"][50:].mean()
    assert 120.0 < t_mean < 600.0  # loose: small system, large fluctuations


@pytest.mark.slow
def test_md_neighbor_rebuild_consistency(model, rng):
    """Forces after many steps (with rebuilds) must match a fresh calculator
    evaluation at the final geometry."""
    params, cfg = model
    sys = _pbc_system(rng)
    drv = MDDriver(params, cfg, sys, MDConfig(dt_fs=0.5, temperature_K=400.0, skin=0.5))
    drv.run(60, chunk=30)
    import jax

    final_coord = np.asarray(drv.state.coord)
    # fresh brute-force build at final geometry
    n = 24
    cell = np.asarray(sys.cell[0])
    fresh = system_from_molecules(
        [
            {
                "coord": final_coord[:n] - np.floor(final_coord[:n] @ np.linalg.inv(cell)) @ cell,
                "numbers": np.asarray(sys.numbers)[:n],
                "cell": cell,
            }
        ],
        cutoff=6.0 + drv.md.skin,
        lr_cutoff=16.0 + drv.md.lr_skin,
    )
    f_fresh, e_fresh, _estd = jax.jit(drv._force_fn)(params, fresh)
    e_md = float(np.asarray(drv.state.epot).sum())
    assert e_md == pytest.approx(float(np.asarray(e_fresh).sum()), abs=2e-3)


@pytest.mark.slow
def test_fire_relax_decreases_energy_and_forces(model, rng):
    params, cfg = model
    coord, numbers = random_molecule(rng, 10)
    sys = system_from_molecules([{"coord": coord, "numbers": numbers}])

    from aimnetcentral_tpu.models.aimnet2 import aimnet2_apply

    e0 = float(aimnet2_apply(params, cfg, sys, sae_external=True)["energy"][0])
    relaxed, info = fire_relax(params, cfg, sys, fmax=0.1, max_steps=300)
    e1 = float(aimnet2_apply(params, cfg, relaxed, sae_external=True)["energy"][0])
    assert e1 < e0
    assert info["fmax"] < 0.1 or info["steps"] == 300


@pytest.mark.slow
def test_ensemble_md_smoke(model, rng):
    """4-member ensemble MD (BASELINE config 4): mean-energy forces via vmap."""
    import jax

    from aimnetcentral_tpu.calculators.ensemble import stack_params
    from aimnetcentral_tpu.models.aimnet2 import aimnet2_init

    params, cfg = model
    stacked = stack_params([params] * 2)  # identical members: must equal single
    sys = _pbc_system(rng, n=16, a=9.0)
    drv_e = MDDriver(
        stacked, cfg, sys, MDConfig(dt_fs=0.3, thermostat="nve", temperature_K=100.0),
        ensemble=True, seed=3,
    )
    drv_s = MDDriver(
        params, cfg, sys, MDConfig(dt_fs=0.3, thermostat="nve", temperature_K=100.0),
        seed=3,
    )
    o_e = drv_e.run(10, chunk=10)
    o_s = drv_s.run(10, chunk=10)
    np.testing.assert_allclose(o_e["epot"], o_s["epot"], atol=1e-3)


@pytest.mark.slow
def test_npt_berendsen_compresses_toward_target_pressure(model, rng):
    """Isotropic Berendsen barostat: a high target pressure must shrink the
    box; volume/pressure observables stream out; energies stay finite."""
    params, cfg = model
    sys = _pbc_system(rng)
    md = MDConfig(
        temperature_K=300.0,
        barostat="berendsen",
        pressure_eV_A3=0.05,
        barostat_tau_fs=50.0,
    )
    drv = MDDriver(params, cfg, sys, md, engine="binned")
    obs = drv.run(16, chunk=8)
    assert "volume" in obs and "pressure" in obs
    assert obs["volume"][-1] < obs["volume"][0]
    assert np.isfinite(obs["epot"]).all()
    assert np.isfinite(obs["pressure"]).all()


def test_indexed_engine_md_and_shared_chunk_fns(model, rng):
    """Gas-phase (no cell) MD routes to the indexed engine (self.grid is
    None there — the round-3 shared-cache key must tolerate it), and two
    drivers with equal static config share ONE compiled chunk executable
    (params ride as jit arguments, not closure constants)."""
    params, cfg = model
    coord, numbers = random_molecule(rng, 8)
    sys = system_from_molecules(
        [{"coord": coord, "numbers": numbers}], cutoff=6.0
    )
    md = MDConfig(dt_fs=0.3, thermostat="nve", temperature_K=50.0)
    drv = MDDriver(params, cfg, sys, md, seed=5)
    assert drv.engine == "indexed" and drv.grid is None
    obs = drv.run(6, chunk=3)
    assert np.isfinite(obs["epot"]).all()

    # a second driver over the same layout must reuse the SAME compiled fn
    drv2 = MDDriver(params, cfg, sys, md, seed=9)
    obs2 = drv2.run(3, chunk=3)
    assert drv2._chunk_fn[3] is drv._chunk_fn[3]
    assert np.isfinite(obs2["epot"]).all()
    # different seeds -> different velocities -> different trajectories
    # (i.e. the shared executable did not leak driver-A state)
    assert not np.allclose(obs["epot"][:3], obs2["epot"])


def test_trajectory_identity_across_rebinning(model, rng, tmp_path):
    """Hot MD over a periodic box triggers in-scan re-binning (slot
    permutations); trajectory frames must still come out in the CALLER's
    atom order — numbers match the input exactly, every frame."""
    from aimnetcentral_tpu.dynamics import TrajectoryWriter, read_frames

    params, cfg = model
    sys = _pbc_system(rng)
    numbers_in = np.asarray(sys.numbers)[:24].copy()
    drv = MDDriver(
        params, cfg, sys,
        MDConfig(dt_fs=0.5, temperature_K=600.0, skin=0.4), seed=2,
    )
    path = str(tmp_path / "traj.extxyz")
    with TrajectoryWriter(path) as w:
        drv.run(40, chunk=10, traj=w)
    frames = read_frames(path)
    assert len(frames) == 4
    cell = np.asarray(sys.cell[0])
    for fr in frames:
        # identity preserved: exact input element order, every frame
        np.testing.assert_array_equal(fr["numbers"][:24], numbers_in)
        assert fr["cell"].shape == (3, 3)
        np.testing.assert_allclose(fr["cell"], cell, atol=1e-6)
        # wrapped coords stay inside the box (small tolerance for drift
        # within the verlet skin before the next rebuild wraps)
        assert fr["coord"][:24].min() > -1.5 and fr["coord"][:24].max() < 10.5
        assert float(fr["epot_eV"]) == float(fr["epot_eV"])  # parses, not NaN
    # frames actually evolve
    assert np.abs(frames[-1]["coord"] - frames[0]["coord"]).max() > 1e-3
    # snapshot agrees with the last frame
    snap = drv.snapshot()
    np.testing.assert_allclose(
        snap["coord"][:24], frames[-1]["coord"][:24], atol=1e-5
    )
    np.testing.assert_array_equal(snap["numbers"][:24], numbers_in)


def test_trajectory_roundtrip_gas_phase(model, rng, tmp_path):
    from aimnetcentral_tpu.dynamics import TrajectoryWriter, read_frames

    params, cfg = model
    coord, numbers = random_molecule(rng, 7)
    sys = system_from_molecules([{"coord": coord, "numbers": numbers}], cutoff=6.0)
    drv = MDDriver(params, cfg, sys, MDConfig(dt_fs=0.3, temperature_K=100.0))
    path = str(tmp_path / "gas.extxyz")
    with TrajectoryWriter(path) as w:
        drv.run(6, chunk=3, traj=w)
    frames = read_frames(path)
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0]["numbers"][:7], numbers)
    assert "cell" not in frames[0]


def test_checkpoint_resume_continues_trajectory(model, rng, tmp_path):
    """save_checkpoint/restore_checkpoint: a run split across a checkpoint
    must reproduce the unsplit run's observables (RNG key restored, layout
    re-binned from the restored coordinates)."""
    params, cfg = model
    sys = _pbc_system(rng)
    md = MDConfig(dt_fs=0.4, thermostat="langevin", temperature_K=250.0,
                  friction_fs=0.02)
    drv_a = MDDriver(params, cfg, sys, md, seed=11)
    drv_a.run(20, chunk=10)
    ckpt = str(tmp_path / "md.ckpt.npz")
    drv_a.save_checkpoint(ckpt)
    obs_a = drv_a.run(20, chunk=10)

    drv_b = MDDriver(params, cfg, sys, md, seed=99)  # different seed: dead
    drv_b.restore_checkpoint(ckpt)
    obs_b = drv_b.run(20, chunk=10)
    np.testing.assert_allclose(obs_b["epot"], obs_a["epot"], atol=2e-4)
    np.testing.assert_allclose(
        obs_b["temperature"], obs_a["temperature"], rtol=2e-4, atol=1e-3
    )
    # numbers mismatch is a clear error
    other = _pbc_system(np.random.default_rng(5), n=20)
    drv_c = MDDriver(params, cfg, other, md)
    with pytest.raises(ValueError, match="numbers mismatch"):
        drv_c.restore_checkpoint(ckpt)


def test_shared_chunk_fn_survives_regrow_and_cache_clear(model, rng):
    """The round-3 bench failure: driver A's chunk executable lands in the
    shared cache, A regrows its grid, jax.clear_caches() wipes the jit
    cache, then driver B (matching A's ORIGINAL key) retraces the shared fn
    — the retrace must see the grids the fn was created under, not A's
    regrown self.grid (shape mismatch in the rebuild lax.cond otherwise)."""
    import jax

    params, cfg = model
    sys = _pbc_system(rng)
    md = MDConfig(dt_fs=0.4, temperature_K=200.0, skin=0.4)
    drv_a = MDDriver(params, cfg, sys, md, seed=1)
    drv_a.run(4, chunk=2)
    key_grid = drv_a.grid
    # force a regrow: A's grid no longer matches the shared key it created
    drv_a.state = drv_a._grow_capacity(drv_a.state)
    assert drv_a.grid != key_grid
    drv_a.run(2, chunk=2)

    jax.clear_caches()  # exactly what bench.py's warm-compile phase does

    drv_b = MDDriver(params, cfg, sys, md, seed=2)
    assert drv_b.grid == key_grid  # hits A's original shared entry
    obs = drv_b.run(4, chunk=2)  # retraces the shared fn
    assert np.isfinite(obs["epot"]).all()


def test_capacity_shrinks_back(model, rng):
    """Shrink-back hysteresis (VERDICT r3 next #2): after a transient
    excursion grows the bin capacity, a settled occupancy shrinks it back to
    the ctor plan — and the shrunk layout reuses the ORIGINAL shared chunk
    executable (bit-exact round trip, zero recompile)."""
    params, cfg = model
    sys = _pbc_system(rng)
    md = MDConfig(
        dt_fs=0.2, temperature_K=100.0, skin=0.4,
        shrink_patience=2, shrink_margin=4,
    )
    drv = MDDriver(params, cfg, sys, md, seed=5)
    cap0 = (drv.grid.capacity, drv.lr_grid.capacity)
    grid0 = (drv.grid, drv.lr_grid)
    drv.run(4, chunk=2)
    fn0 = drv._chunk_fn[2]

    # transient: grow both layouts (exactly what the overflow path does)
    drv.state = drv._grow_capacity(drv.state, grow_sr=True, grow_lr=True)
    assert drv.grid.capacity > cap0[0]
    assert drv.lr_grid.capacity > cap0[1]

    # settled occupancy for >= shrink_patience chunks -> shrink back
    obs = drv.run(8, chunk=2)
    assert (drv.grid, drv.lr_grid) == grid0
    assert (drv.grid.capacity, drv.lr_grid.capacity) == cap0
    assert np.isfinite(obs["epot"]).all()
    # the original executable is reused (shared-cache hit, no retrace)
    drv.run(2, chunk=2)
    assert drv._chunk_fn[2] is fn0

    # never shrinks below the ctor plan even if occupancy would allow it
    drv._occ_window.clear()
    drv.run(8, chunk=2)
    assert drv.grid.capacity == cap0[0]


def test_shrink_disabled_keeps_grown_capacity(model, rng):
    params, cfg = model
    sys = _pbc_system(rng)
    md = MDConfig(dt_fs=0.2, temperature_K=100.0, skin=0.4, shrink_patience=0)
    drv = MDDriver(params, cfg, sys, md, seed=5)
    drv.state = drv._grow_capacity(drv.state)
    grown = drv.grid.capacity
    drv.run(8, chunk=2)
    assert drv.grid.capacity == grown
