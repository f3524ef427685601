"""Headline benchmark: NVT MD steps/sec on a 10k-atom periodic organic box
(BASELINE.json config 4), fully on-device (lax.scan + cell-list rebuilds).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

ALL FIVE BASELINE.json configs are gated here (VERDICT r4 next #2), so every
round regression-checks the full north-star list:
  1. ``sp_calls_per_sec_10k`` (+``_fast``) — single-point facade throughput
  2. ``relax_steps_per_sec_taxol`` — on-device FIRE relaxation journey
  3. (crystal Ewald/PME correctness lives in tests; its perf proxy here is
     the ``ewald_steps_per_sec`` MD number below)
  4. ``value`` — the 10k NVT MD headline + ``ensemble4_steps_per_sec``
  5. ``hvp_per_sec_taxol`` — matrix-free Hessian-vector products (TS search)
plus ``train_atoms_per_sec`` (packed-layout training step) and
``ensemble4_ewald_steps_per_sec`` / ``ewald_ens_cost_ratio`` — the member-fused
Ewald ensemble cost vs single-model Ewald MD (VERDICT r4 next #1).

The headline ``value`` is the MEDIAN of 3 timed windows; ``value_spread``
carries max-min so round-over-round noise is self-describing (VERDICT r4
next #5).  ``BENCH_QUICK=1`` skips everything but the headline.

Baselines (bench_baseline.json, PINNED — never overwritten by this script):
- "pinned": this repo's round-1 XLA-engine numbers per atom count
  (10k: 1.901 steps/s, 2k: 7.392 steps/s).  ``vs_baseline`` is the
  progression ratio against the matching pin.
- "reference_cpu_sp": measured PyTorch-reference energy+forces calls/s on
  the identical box (bench_reference.py; torch CPU — this image has no
  CUDA).  ``vs_reference_cpu`` compares our MD steps/s against it (one
  force call per MD step is the dominant cost; our number additionally
  includes integration + neighbor maintenance, so the ratio is
  conservative).  The reference publishes no GPU numbers (BASELINE.md).

Also reported (VERDICT r2 items 2/3/6):
- ``ensemble4_steps_per_sec``: the ACTUAL BASELINE config-4 north star (4
  independently initialized members vmapped/lax.scanned on one chip).
- ``compile_s_cold`` (the MD executable compiled from scratch into a FRESH
  cache subdir — machine-checkable cold number every round),
  ``compile_s_warm`` (same executable re-loaded through the persistent
  cache after ``jax.clear_caches()``), and ``compile_s_startup`` (what this
  process actually paid at startup).  NOTE: cold numbers include the
  remote compile service's queueing, which varies 1.5-3x window-to-window
  (the same 10k chunk compile measured 24.6 s and ~70 s on different
  runs); ``compile_s_warm`` is the stable number.  See
  docs/performance.md "Cold-start anatomy" for the measured breakdown.
  ``BENCH_SKIP_COLD=1`` skips the cold measurement (quick iteration).
- ``xla_flops_per_step`` + ``mfu``: XLA cost-analysis FLOPs of one compiled
  MD step vs the chip's bf16 peak (Mosaic's default dots run one bf16 MXU
  pass — docs/performance.md); counts executed FLOPs incl. padding slack.
- ``pair_efficiency_sr`` / ``pair_efficiency_lr``: real pairs within the
  physical cutoff / slot-pairs examined by the stencil sweeps
  (bins x C^2 x stencil) — the useful-work fraction of the pair machinery.

Config: BENCH_ATOMS (default 10000 — the BASELINE north-star box; 2000 for
quick iteration), BENCH_STEPS, BENCH_ENSEMBLE (default 4; <=1 skips the
ensemble run), AIMNET_CONV_ENGINE (default auto = fused Pallas stencil conv
on TPU).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_ATOMS = int(os.environ.get("BENCH_ATOMS", "10000"))
N_STEPS = int(os.environ.get("BENCH_STEPS", "100"))
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def build_box(n_atoms: int, density: float = 0.09, seed: int = 0):
    """Random organic-ish periodic box (CHNO, ~0.09 atoms/Angstrom^3) with a
    minimum-distance jitter-relax so initial forces are sane."""
    rng = np.random.default_rng(seed)
    a = (n_atoms / density) ** (1.0 / 3.0)
    # jittered lattice placement -> guaranteed minimum separation
    m = int(np.ceil(n_atoms ** (1.0 / 3.0)))
    spacing = a / m
    grid = np.stack(
        np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3)[:n_atoms]
    coord = (grid + 0.5) * spacing + rng.uniform(-0.15, 0.15, size=(n_atoms, 3)) * spacing
    numbers = rng.choice([1, 6, 7, 8], size=n_atoms, p=[0.5, 0.35, 0.05, 0.1])
    cell = np.eye(3) * a
    return coord.astype(np.float32), numbers.astype(np.int32), cell.astype(np.float32)


def _real_pair_count(coord: np.ndarray, cell: np.ndarray, cutoff: float) -> int:
    """Ordered pairs within cutoff (periodic), via cKDTree count_neighbors
    over wrapped coords + ghost images (no pair list materialized)."""
    from scipy.spatial import cKDTree

    cb = np.asarray(cell, np.float64)
    inv = np.linalg.inv(cb)
    fr = coord.astype(np.float64) @ inv
    xw = (fr - np.floor(fr)) @ cb
    offs = np.stack(
        np.meshgrid(*([np.arange(-1, 2)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    lo, hi = xw.min(0) - cutoff, xw.max(0) + cutoff
    pts = []
    for s in offs:
        g = xw + s @ cb
        keep = ((g >= lo) & (g <= hi)).all(1)
        if keep.any():
            pts.append(g[keep])
    tree_all = cKDTree(np.concatenate(pts))
    n = cKDTree(xw).count_neighbors(tree_all, cutoff)
    return int(n - len(xw))  # drop self pairs


_T0 = time.time()


def _log(msg: str) -> None:
    # the +Ns prefix makes per-section wall time visible in the driver's
    # captured tail, so a slow/stuck section is diagnosable from the artifact
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from aimnetcentral_tpu.xla_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()

    from aimnetcentral_tpu.builders import system_from_molecules
    from aimnetcentral_tpu.dynamics import MDConfig, MDDriver
    from __graft_entry__ import _flagship

    cfg, params = _flagship()
    ensemble = int(os.environ.get("BENCH_ENSEMBLE", "4"))

    coord, numbers, cell = build_box(N_ATOMS)
    # the MD driver builds its own binned layout: skip the host NL entirely
    # (a brute-force 10k-atom host build costs minutes and is never used)
    system = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}],
        build_nbmat=False,
    )

    # skin 0.3: the finer 9-bin grid at 10k lands on capacity 32 — exact
    # (8,128) f32 tiles with ~4.5-sigma occupancy headroom (no mid-run
    # regrow); on-device rebuilds cost ~3 ms, so the short skin is free
    md = MDConfig(dt_fs=0.5, temperature_K=300.0, thermostat="langevin", skin=0.3)
    chunk = max(10, N_STEPS // 4)
    # force the device claim + backend init OUTSIDE the compile timer: the
    # axon tunnel's claim handshake after a previous process exits can take
    # minutes and is unrelated to XLA compile cost
    _log("claiming device...")
    import jax.numpy as jnp

    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8,))))
    t0 = time.time()
    # equilibration pass: the synthetic box's first steps are violent (large
    # initial forces); density spikes there can trigger a capacity regrow
    # that is NOT representative of steady-state throughput.  Run the
    # transient out, then RE-PLAN the grid from equilibrated coordinates
    # (exactly what a production MD user does) and time the steady state.
    _log("equilibration + first compile...")
    drv0 = MDDriver(params, cfg, system, md)
    drv0.run(2 * chunk, chunk=chunk)
    # map the (possibly binned) carried state back to a compact system
    numbers_b = np.asarray(drv0.state.system.numbers)
    coord_b = np.asarray(drv0.state.coord)
    real = numbers_b > 0
    coord_eq = coord_b[real]
    system_eq = system_from_molecules(
        [{"coord": coord_eq, "numbers": numbers_b[real], "cell": cell}],
        build_nbmat=False,
    )
    drv = MDDriver(params, cfg, system_eq, md)
    # warmup with the SAME chunk size as the timed run (one compile)
    drv.run(chunk, chunk=chunk)
    startup_s = time.time() - t0
    _log(f"compile+equilibration {startup_s:.1f}s; timing steady state...")

    regrows = 0
    windows: list[float] = []
    while len(windows) < 3:
        grids_before = (drv.grid, drv.lr_grid)
        t0 = time.time()
        drv.run(N_STEPS, chunk=chunk)
        elapsed = time.time() - t0
        if (drv.grid, drv.lr_grid) == grids_before or regrows >= 3:
            windows.append(N_STEPS / elapsed)
            continue
        # a capacity regrow (occupancy-tail overflow) recompiled INSIDE the
        # timed window — an adaptive one-time event, not steady-state cost.
        # Re-time at the settled capacity; `regrows` reports it happened.
        regrows += 1
        windows.clear()
        _log(f"capacity regrew during timing (x{regrows}); re-timing...")
    # median of 3 windows + spread: the steady-state number wobbles ~1-2%
    # window-to-window (relay jitter); the artifact self-describes it
    windows.sort()
    steps_per_sec = windows[1]
    value_spread = windows[-1] - windows[0]
    # compile_s: startup minus the MD actually executed during it — drv0
    # ran prime + 2*chunk equilibration, drv ran prime + chunk warmup
    # (each prime costs one zero-dt chunk of runtime, not a compile)
    compile_s = startup_s - 5 * chunk / steps_per_sec

    _log(f"{steps_per_sec:.2f} steps/s; cost analysis...")
    # --- FLOPs of one MD step -> MFU ---------------------------------------
    # Counted by XLA's cost model on a COMPILED XLA-ENGINE twin (identical
    # math and pair counts to the production Pallas engine, but with every
    # op visible — Pallas custom calls report no flops; Lowered.cost_analysis
    # returns None on this backend, only Compiled works).  The twin compile
    # costs real time, so the count is cached in bench_flops.json keyed by
    # everything that changes it (size, grid geometry, chunk, jax version);
    # cache hits make this free on repeat runs.
    flops_per_step = mfu = None
    flops_file = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_flops.json")
    try:
        g = drv.grid
        gl = drv.lr_grid
        flops_key = (
            f"atoms={N_ATOMS} chunk={chunk} grid={g.nbins}x{g.capacity} "
            f"lr={None if gl is None else (gl.nbins, gl.capacity)} jax={jax.__version__}"
        )
        flops_cache = {}
        if os.path.exists(flops_file):
            with open(flops_file) as fh:
                flops_cache = json.load(fh)
        if flops_key in flops_cache:
            flops_per_step = float(flops_cache[flops_key])
        else:
            _log("compiling the XLA-engine twin for the FLOP count...")
            prev = os.environ.get("AIMNET_CONV_ENGINE")
            os.environ["AIMNET_CONV_ENGINE"] = "xla"
            try:
                drv_x = MDDriver(params, cfg, system_eq, md)
                import jax as _jax

                def chunk_fn(state):
                    return _jax.lax.scan(drv_x._step, state, None, length=chunk)

                # _state: the unprimed carry (the .state property would
                # compile and RUN a standalone force eval to fill forces,
                # which a flop count does not need)
                ca = _jax.jit(chunk_fn).lower(drv_x._state).compile().cost_analysis()
            finally:
                if prev is None:
                    os.environ.pop("AIMNET_CONV_ENGINE", None)
                else:
                    os.environ["AIMNET_CONV_ENGINE"] = prev
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            if ca and "flops" in ca:
                flops_per_step = float(ca["flops"]) / chunk
                flops_cache[flops_key] = flops_per_step
                with open(flops_file, "w") as fh:
                    json.dump(flops_cache, fh, indent=1)
        if flops_per_step is not None and "v5 lite" in str(jax.devices()[0]):
            # TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 — Mosaic default dots
            # run ONE bf16 MXU pass on f32 operands (docs/performance.md)
            mfu = flops_per_step * steps_per_sec / 197e12
    except Exception as e:  # cost analysis availability differs per backend
        _log(f"flop count unavailable: {e!r}")

    # --- warm-compile: same executables through the persistent cache ------
    _log("warm-compile measurement...")
    compile_s_warm = None
    if cache_dir:
        jax.clear_caches()
        drv_w = MDDriver(params, cfg, system_eq, md)
        t0 = time.time()
        drv_w.run(chunk, chunk=chunk)
        # prime chunk + warmup chunk of real MD ran in there
        compile_s_warm = (time.time() - t0) - 2 * chunk / steps_per_sec

    # --- cold-compile: a FRESH cache subdir, so the number is a genuine
    # from-scratch compile regardless of what previous rounds populated
    # (VERDICT r3 next #6).  The shared cache dir is restored afterwards.
    # NOTE: includes the remote compile service's queueing, which varies
    # 1.5-3x window-to-window (docs/performance.md "Cold-start anatomy").
    compile_s_cold = None
    if cache_dir and os.environ.get("BENCH_SKIP_COLD", "") != "1":
        import tempfile

        _log("cold-compile measurement (fresh cache subdir)...")
        fresh = tempfile.mkdtemp(prefix="xla_cold_", dir=os.path.dirname(cache_dir))
        try:
            jax.config.update("jax_compilation_cache_dir", fresh)
            jax.clear_caches()
            drv_c = MDDriver(params, cfg, system_eq, md)
            t0 = time.time()
            drv_c.run(chunk, chunk=chunk)
            compile_s_cold = (time.time() - t0) - 2 * chunk / steps_per_sec
        finally:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            import shutil

            shutil.rmtree(fresh, ignore_errors=True)

    _log("pair efficiency...")
    # --- pair efficiency: real pairs / slot-pairs examined per sweep ------
    pair_eff_sr = pair_eff_lr = None
    try:
        g = drv.grid
        # conv sweep: FULL 27-offset stencil (xy-banded grid examines the
        # same bins x C x 27C candidate rows)
        examined_sr = (
            g.nbins[0] * g.nbins[1] * g.nbins[2] * g.capacity**2 * 27
        )
        pair_eff_sr = _real_pair_count(coord_eq, cell, cfg.aev.rc_s) / examined_sr
        if drv.lr_grid is not None:
            from aimnetcentral_tpu.models.heads import DFTD3Head, LRCoulombHead

            lr_cuts = [
                h.dsf_rc if isinstance(h, LRCoulombHead) else h.cutoff
                for _n, h in cfg.outputs
                if isinstance(h, (LRCoulombHead, DFTD3Head))
            ]
            gl = drv.lr_grid
            # LR energy sweeps run the HALF stencil (63 of 125 radius-2
            # offsets; each pair computed once, mirrored to both endpoints)
            examined_lr = (
                gl.nbins[0] * gl.nbins[1] * gl.nbins[2] * gl.capacity**2 * 63
            )
            # half-stencil examines each UNORDERED pair once -> /2
            pair_eff_lr = (
                0.5 * _real_pair_count(coord_eq, cell, max(lr_cuts)) / examined_lr
            )
    except Exception:
        pass

    # --- the BASELINE config-4 north star: 4-member ensemble MD -----------
    _log(f"ensemble x{ensemble} run..." if ensemble > 1 else "skipping ensemble")
    ens_steps_per_sec = None
    if ensemble > 1:
        from aimnetcentral_tpu.calculators.ensemble import stack_params
        from aimnetcentral_tpu.models import aimnet2_init

        params_e = stack_params(
            [aimnet2_init(jax.random.key(i), cfg) for i in range(ensemble)]
        )
        drv_e = MDDriver(params_e, cfg, system_eq, md, ensemble=True)
        drv_e.run(chunk, chunk=chunk)  # compile + warmup
        n_e = max(20, N_STEPS // 2)
        t0 = time.time()
        drv_e.run(n_e, chunk=chunk)
        ens_steps_per_sec = n_e / (time.time() - t0)

    quick = os.environ.get("BENCH_QUICK", "") == "1"

    # --- ensemble MD with the EWALD head: fused-member cost vs single ------
    # (VERDICT r4 next #1: the accuracy-best LR method must keep the fused
    # win; target ensemble4/single <= ~2.2x).  Shares the equilibrated box.
    ewald_sps = ewald_ens_sps = None
    if not quick and ensemble > 1:
        try:
            import dataclasses as _dc

            from aimnetcentral_tpu.calculators.ensemble import stack_params
            from aimnetcentral_tpu.models import aimnet2_init
            from aimnetcentral_tpu.models.heads import LRCoulombHead

            cfg_ew = _dc.replace(
                cfg,
                outputs=tuple(
                    (n_, _dc.replace(h, method="ewald")
                     if isinstance(h, LRCoulombHead) else h)
                    for n_, h in cfg.outputs
                ),
            )
            # MUST be a multiple of chunk: run() executes ceil(n/chunk) full
            # chunks, so a non-multiple under-reports steps/s (the round-4/5
            # ewald numbers 4.96/2.50 were true 6.20/3.13 — measured)
            n_ew = 2 * chunk
            _log("ewald MD (single model)...")
            drv_ew = MDDriver(params, cfg_ew, system_eq, md)
            drv_ew.run(chunk, chunk=chunk)
            t0 = time.time()
            drv_ew.run(n_ew, chunk=chunk)
            ewald_sps = n_ew / (time.time() - t0)
            drv_ew = None
            _log(f"{ewald_sps:.2f} steps/s; ewald MD (fused x{ensemble})...")
            params_ew_e = stack_params(
                [aimnet2_init(jax.random.key(i), cfg_ew) for i in range(ensemble)]
            )
            drv_ew_e = MDDriver(params_ew_e, cfg_ew, system_eq, md, ensemble=True)
            drv_ew_e.run(chunk, chunk=chunk)
            t0 = time.time()
            drv_ew_e.run(n_ew, chunk=chunk)
            ewald_ens_sps = n_ew / (time.time() - t0)
            drv_ew_e = params_ew_e = None
        except Exception as e:
            _log(f"ewald ensemble bench failed: {e!r}")

    # --- BASELINE config 1: single-point facade throughput at 10k ----------
    sp_exact = sp_balanced = sp_fast = None
    if not quick:
        try:
            from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator

            rng_sp = np.random.default_rng(1)
            for prec in ("exact", "balanced", "fast"):
                _log(f"single-point throughput ({prec})...")
                calc = AIMNet2Calculator((params, cfg, {"sae": {}}), precision=prec)

                def one():
                    data = {
                        "coord": coord_eq
                        + rng_sp.normal(scale=1e-3, size=coord_eq.shape).astype(
                            np.float32
                        ),
                        "numbers": numbers_b[real],
                        "cell": cell,
                    }
                    out = calc.eval(data, forces=True)
                    return float(np.asarray(out["energy"]).sum())

                one()  # compile
                reps = 8
                t0 = time.perf_counter()
                for _ in range(reps):
                    one()
                rate = reps / (time.perf_counter() - t0)
                if prec == "exact":
                    sp_exact = rate
                elif prec == "balanced":
                    sp_balanced = rate
                else:
                    sp_fast = rate
                calc = None
        except Exception as e:
            _log(f"sp bench failed: {e!r}")

    # --- BASELINE config 2: taxol relaxation journey -----------------------
    relax_sps = None
    taxol_path = "/root/reference/examples/taxol.xyz"
    if not quick and os.path.exists(taxol_path):
        try:
            _log("taxol FIRE relaxation...")
            from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator
            from aimnetcentral_tpu.dynamics import fire_relax
            from aimnetcentral_tpu.io import read_xyz

            coord_t, numbers_t = read_xyz(taxol_path)
            calc_t = AIMNet2Calculator((params, cfg, {"sae": {}}))
            system_t = calc_t.prepare_system(
                {"coord": coord_t, "numbers": numbers_t}
            )
            # warmup/compile: a 2-step run
            fire_relax(params, cfg, system_t, fmax=1e-9, max_steps=2)
            t0 = time.perf_counter()
            _relaxed, info_t = fire_relax(
                params, cfg, system_t, fmax=1e-9, max_steps=100
            )
            relax_sps = info_t["steps"] / (time.perf_counter() - t0)
        except Exception as e:
            _log(f"relax bench failed: {e!r}")

    # --- BASELINE config 5: matrix-free HVPs (TS-search inner loop) --------
    hvp_rate = None
    if not quick and os.path.exists(taxol_path):
        try:
            _log("HVP throughput (taxol)...")
            from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator
            from aimnetcentral_tpu.io import read_xyz

            coord_t, numbers_t = read_xyz(taxol_path)
            calc_h = AIMNet2Calculator((params, cfg, {"sae": {}}))
            data_h = {"coord": coord_t, "numbers": numbers_t}
            v = np.random.default_rng(2).normal(
                size=(len(numbers_t), 3)
            ).astype(np.float32)
            calc_h.hessian_vector_product(data_h, v)  # compile
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                hv = calc_h.hessian_vector_product(data_h, v)
            np.asarray(hv)
            hvp_rate = reps / (time.perf_counter() - t0)
            calc_h = None
        except Exception as e:
            _log(f"hvp bench failed: {e!r}")

    # --- training-step throughput (packed layout) --------------------------
    train_aps = None
    if not quick:
        try:
            _log("training-step throughput (packed 64x48)...")
            import jax.numpy as _jnp

            from aimnetcentral_tpu.builders import system_molecule_bins
            from aimnetcentral_tpu.train.loss import LossConfig, MTLoss
            from aimnetcentral_tpu.train.step import (
                init_train_state,
                make_optimizer,
                make_train_step,
            )

            rng_t = np.random.default_rng(0)
            n_mol, n_atom = 64, 48
            mols = []
            for _ in range(n_mol):
                c = rng_t.uniform(
                    0, (n_atom ** (1 / 3)) * 2.6, size=(n_atom, 3)
                ).astype(np.float32)
                z = rng_t.choice([1, 6, 7, 8], size=n_atom, p=[0.5, 0.35, 0.05, 0.1])
                mols.append({"coord": c, "numbers": z})
            system_tr = system_molecule_bins(mols)
            batch = jax.tree.map(
                lambda x: x[None] if hasattr(x, "ndim") else x, system_tr
            )
            labels = {
                "energy": _jnp.asarray(
                    rng_t.normal(size=(1, system_tr.num_mol)).astype(np.float32)
                ),
                "forces": _jnp.asarray(
                    rng_t.normal(size=(1,) + system_tr.coord.shape).astype(np.float32)
                    * 0.1
                ),
                "charges": _jnp.asarray(
                    rng_t.normal(size=(1,) + system_tr.numbers.shape).astype(
                        np.float32
                    )
                    * 0.1
                ),
            }
            loss = MTLoss(LossConfig())
            opt = make_optimizer(learning_rate=1e-3)
            state_tr = init_train_state(params, opt)
            step = jax.jit(make_train_step(cfg, loss, opt, with_forces=True))
            state_tr, m0 = step(state_tr, batch, labels)
            np.asarray(m0["loss"])
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                state_tr, m0 = step(state_tr, batch, labels)
            np.asarray(m0["loss"])
            train_aps = n_mol * n_atom * reps / (time.perf_counter() - t0)
            state_tr = None
        except Exception as e:
            _log(f"train bench failed: {e!r}")

    pins = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            pins = json.load(f)
    pin = pins.get("pinned", {}).get(str(N_ATOMS))
    ref = pins.get("reference_cpu_sp", {}).get(str(N_ATOMS))

    result = {
        "metric": f"nvt_md_steps_per_sec_{N_ATOMS}atoms",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / pin, 3) if pin else 1.0,
        "value_spread": round(value_spread, 3),
        "atoms": N_ATOMS,
        "steps": N_STEPS,
        "regrows_during_timing": regrows,
        # startup compile in THIS process (cold only when the persistent
        # cache missed); compile_s_cold below is the machine-checkable
        # fresh-cache number, compile_s_warm the restart number
        "compile_s_startup": round(compile_s, 1),
        "conv_engine": os.environ.get("AIMNET_CONV_ENGINE", "auto"),
        "conv_precision": os.environ.get("AIMNET_CONV_PRECISION", "f32"),
        "device": str(jax.devices()[0]),
        "ns_per_day": round(steps_per_sec * 0.5e-6 * 86400, 4),
    }
    if ens_steps_per_sec is not None:
        result[f"ensemble{ensemble}_steps_per_sec"] = round(ens_steps_per_sec, 3)
    if ewald_sps is not None:
        result["ewald_steps_per_sec"] = round(ewald_sps, 3)
    if ewald_ens_sps is not None:
        result[f"ensemble{ensemble}_ewald_steps_per_sec"] = round(ewald_ens_sps, 3)
        if ewald_sps:
            result["ewald_ens_cost_ratio"] = round(ewald_sps / ewald_ens_sps, 2)
    sp_tag = f"sp_calls_per_sec_{N_ATOMS // 1000}k"
    if sp_exact is not None:
        result[sp_tag] = round(sp_exact, 3)
    if sp_balanced is not None:
        result[f"{sp_tag}_balanced"] = round(sp_balanced, 3)
    if sp_fast is not None:
        result[f"{sp_tag}_fast"] = round(sp_fast, 3)
    if relax_sps is not None:
        result["relax_steps_per_sec_taxol"] = round(relax_sps, 2)
    if hvp_rate is not None:
        result["hvp_per_sec_taxol"] = round(hvp_rate, 2)
    if train_aps is not None:
        result["train_atoms_per_sec"] = round(train_aps, 0)
    if compile_s_warm is not None:
        result["compile_s_warm"] = round(compile_s_warm, 1)
    if compile_s_cold is not None:
        result["compile_s_cold"] = round(compile_s_cold, 1)
    if flops_per_step is not None:
        result["xla_flops_per_step"] = float(f"{flops_per_step:.4g}")
    if mfu is not None:
        result["mfu"] = round(mfu, 4)
    if pair_eff_sr is not None:
        result["pair_efficiency_sr"] = round(pair_eff_sr, 4)
    if pair_eff_lr is not None:
        result["pair_efficiency_lr"] = round(pair_eff_lr, 4)
    if pin:
        result["baseline_round1_steps_per_sec"] = pin
    if ref:
        result["vs_reference_cpu"] = round(steps_per_sec / ref, 2)
        result["reference_cpu_calls_per_sec"] = ref
    print(json.dumps(result))


if __name__ == "__main__":
    main()
