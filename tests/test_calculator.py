"""Calculator facade tests (reference tests/test_calculator.py analogues):
API surface, SAE float64 host application, batching, method switching,
periodic stress, HVP == dense Hessian."""

import numpy as np
import pytest

from aimnetcentral_tpu.calculators import AIMNet2Calculator
from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict

from conftest import random_molecule


@pytest.fixture(scope="module")
def calc(reference_aimnet2):
    model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    # give the SAE table big reference-like float64 values to exercise the
    # host-side exact summation path
    sae = np.zeros(64)
    sae[1] = -13.6
    sae[6] = -1029.5
    sae[7] = -1485.3
    sae[8] = -2042.6
    sd["outputs.atomic_shift.shifts.weight"] = sae.reshape(-1, 1)
    params, aux = convert_state_dict(sd, cfg)
    return AIMNet2Calculator((params, cfg, aux))


def test_single_point(calc, rng):
    coord, numbers = random_molecule(rng, 10)
    out = calc({"coord": coord, "numbers": numbers, "charge": 0.0}, forces=True)
    assert out["energy"].shape == (1,)
    assert out["energy"].dtype == np.float64
    assert out["forces"].shape == (10, 3)
    assert out["charges"].shape == (10,)
    # SAE applied exactly in float64
    sae_expected = sum(
        {1: -13.6, 6: -1029.5, 7: -1485.3, 8: -2042.6}[int(z)] for z in numbers
    )
    no_sae = out["energy"][0] - sae_expected
    assert abs(no_sae) < 50.0  # NN + coulomb part is small vs SAE magnitude


@pytest.mark.slow
def test_dense_batch_input(calc, rng):
    c1, z1 = random_molecule(rng, 7)
    c2, z2 = random_molecule(rng, 5)
    # dense (B, N, 3) with zero-padding, reference input convention
    coord = np.zeros((2, 7, 3), dtype=np.float32)
    numbers = np.zeros((2, 7), dtype=np.int64)
    coord[0], numbers[0] = c1, z1
    coord[1, :5], numbers[1, :5] = c2, z2
    out = calc({"coord": coord, "numbers": numbers, "charge": [0.0, 0.0]}, forces=True)
    assert out["energy"].shape == (2,)
    out1 = calc({"coord": c1, "numbers": z1})
    out2 = calc({"coord": c2, "numbers": z2})
    np.testing.assert_allclose(out["energy"][0], out1["energy"][0], atol=1e-4)
    np.testing.assert_allclose(out["energy"][1], out2["energy"][0], atol=1e-4)


def test_method_switching(calc, rng):
    coord, numbers = random_molecule(rng, 8)
    data = {"coord": coord, "numbers": numbers}
    e_simple = calc(data)["energy"][0]
    calc.set_lrcoulomb_method("dsf")
    e_dsf = calc(data)["energy"][0]
    calc.set_lrcoulomb_method("simple")
    e_simple2 = calc(data)["energy"][0]
    assert e_simple == pytest.approx(e_simple2, abs=1e-9)
    # dsf differs from simple but not wildly (small molecule within dsf_rc)
    assert e_dsf != e_simple
    assert abs(e_dsf - e_simple) < 1.0


def test_periodic_stress_and_auto_dsf_switch(calc, rng):
    coord, numbers = random_molecule(rng, 8, spread=2.5)
    cell = np.eye(3, dtype=np.float32) * 8.0
    out = calc(
        {"coord": coord + 4.0, "numbers": numbers, "cell": cell},
        forces=True,
        stress=True,
    )
    assert out["stress"].shape == (1, 3, 3)
    assert np.isfinite(out["stress"]).all()
    np.testing.assert_allclose(out["stress"][0], out["stress"][0].T, atol=1e-3)


def test_ewald_periodic_energy(calc, rng):
    coord, numbers = random_molecule(rng, 8, spread=2.5)
    cell = np.eye(3, dtype=np.float32) * 8.0
    calc.set_lrcoulomb_method("ewald")
    try:
        out = calc(
            {"coord": coord + 4.0, "numbers": numbers, "cell": cell}, forces=True
        )
        assert np.isfinite(out["energy"]).all()
        assert np.isfinite(out["forces"]).all()
    finally:
        calc.set_lrcoulomb_method("simple")


def test_ewald_large_system_guidance_warning(calc, rng, monkeypatch, caplog):
    """Above the measured phase-matrix limit, requesting exact Ewald warns
    with actionable guidance (use PME) instead of failing opaquely at
    compile time (tools/bench_lr_crossover.py: compile fails near ~30k)."""
    import logging

    from aimnetcentral_tpu.calculators import calculator as calc_mod

    monkeypatch.setattr(calc_mod, "EWALD_ATOM_GUIDANCE_LIMIT", 6)
    coord, numbers = random_molecule(rng, 8, spread=2.5)
    cell = np.eye(3, dtype=np.float32) * 8.0
    data = {"coord": coord + 4.0, "numbers": numbers, "cell": cell}
    calc.set_lrcoulomb_method("ewald")
    try:
        with caplog.at_level(logging.WARNING):
            out = calc(data)
        assert any("pme" in r.getMessage() for r in caplog.records)
        assert np.isfinite(out["energy"]).all()  # warning only, still runs
        caplog.clear()
        calc.set_lrcoulomb_method("pme")
        with caplog.at_level(logging.WARNING):
            calc(data)
        assert not any("pme" in r.getMessage() for r in caplog.records)
    finally:
        calc.set_lrcoulomb_method("simple")


def test_ewald_guidance_warning_on_binned_path(calc, rng, monkeypatch, caplog):
    """The guidance must fire on the BINNED prepare branch too — that is
    where a large single periodic box (the measured failure scenario)
    actually lands (prepare_system early-returns there, before the indexed
    path's check)."""
    import logging

    from aimnetcentral_tpu.calculators import calculator as calc_mod

    monkeypatch.setattr(calc_mod, "EWALD_ATOM_GUIDANCE_LIMIT", 6)
    coord, numbers = random_molecule(rng, 12, spread=3.0)
    cell = np.eye(3, dtype=np.float32) * 9.0
    data = {"coord": coord + 4.5, "numbers": numbers, "cell": cell}
    old_thresh = calc.binned_threshold
    calc.set_lrcoulomb_method("ewald")
    try:
        calc.binned_threshold = 10  # 12-atom box takes the binned branch
        with caplog.at_level(logging.WARNING):
            sysb = calc.prepare_system(data)
        assert sysb.bins is not None  # really on the binned branch
        assert any("pme" in r.getMessage() for r in caplog.records)
    finally:
        calc.binned_threshold = old_thresh
        calc.set_lrcoulomb_method("simple")


@pytest.mark.slow
def test_hvp_matches_dense_hessian(calc, rng):
    coord, numbers = random_molecule(rng, 5)
    data = {"coord": coord, "numbers": numbers}
    out = calc(data, hessian=True)
    h = out["hessian"].reshape(15, 15)
    v = rng.normal(size=(5, 3)).astype(np.float32)
    hv = calc.hessian_vector_product(data, v)
    np.testing.assert_allclose(hv.reshape(-1), h @ v.reshape(-1), atol=1e-3)


@pytest.mark.slow
def test_pme_periodic_energy_matches_ewald(calc, rng):
    coord, numbers = random_molecule(rng, 8, spread=2.5)
    cell = np.eye(3, dtype=np.float32) * 8.0
    data = {"coord": coord + 4.0, "numbers": numbers, "cell": cell}
    try:
        calc.set_lrcoulomb_method("ewald")
        e_ewald = calc(data)["energy"][0]
        calc.set_lrcoulomb_method("pme")
        out = calc(data, forces=True)
        assert np.isfinite(out["forces"]).all()
        assert out["energy"][0] == pytest.approx(e_ewald, abs=5e-3)
    finally:
        calc.set_lrcoulomb_method("simple")


@pytest.mark.slow
def test_validation_observables_roundtrip(calc, tmp_path):
    from aimnetcentral_tpu.validation import compare_observables, dump_observables

    p1 = str(tmp_path / "obs1.json")
    dump_observables(calc, p1)
    obs2 = dump_observables(calc)
    ok, report = compare_observables(p1, obs2)
    assert ok, report
    # determinism: identical backend must be bitwise equal
    assert "OK" in report


@pytest.mark.slow
def test_ensemble_calculator(reference_aimnet2, rng):
    from aimnetcentral_tpu.calculators.ensemble import EnsembleCalculator

    import torch

    members = []
    cfgs = None
    for seed in (0, 1):
        torch.manual_seed(seed)
        model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
        cfg = config_from_yaml(cfg_yaml)
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params, aux = convert_state_dict(sd, cfg)
        members.append((params, cfg, aux))
    ens = EnsembleCalculator.from_members(members)
    coord, numbers = random_molecule(rng, 8)
    out = ens({"coord": coord, "numbers": numbers}, forces=True)
    assert out["energy"].shape == (1,)
    assert "energy_std" in out and "forces_std" in out
    # mean must equal average of individual members
    singles = [
        AIMNet2Calculator(m)({"coord": coord, "numbers": numbers})["energy"][0]
        for m in members
    ]
    assert out["energy"][0] == pytest.approx(np.mean(singles), abs=1e-4)
    assert out["energy_std"][0] == pytest.approx(np.std(singles), abs=1e-4)
    # ensemble Hessian == member-mean Hessian (the mean is linear)
    hess = ens({"coord": coord, "numbers": numbers}, hessian=True)["hessian"][0]
    h_members = [
        AIMNet2Calculator(m)({"coord": coord, "numbers": numbers}, hessian=True)[
            "hessian"
        ][0]
        for m in members
    ]
    np.testing.assert_allclose(hess, np.mean(h_members, axis=0), atol=1e-4)


@pytest.mark.slow
def test_batched_hessian_splitting(calc, rng):
    c1, z1 = random_molecule(rng, 4)
    c2, z2 = random_molecule(rng, 5)
    coord = np.zeros((2, 5, 3), dtype=np.float32)
    numbers = np.zeros((2, 5), dtype=np.int64)
    coord[0, :4], numbers[0, :4] = c1, z1
    coord[1], numbers[1] = c2, z2
    out = calc({"coord": coord, "numbers": numbers}, hessian=True)
    assert out["energy"].shape == (2,)
    assert out["hessian"][0].shape == (4, 3, 4, 3)
    assert out["hessian"][1].shape == (5, 3, 5, 3)


@pytest.mark.slow
def test_binned_facade_matches_indexed(calc, rng):
    """Large periodic single points route through the binned engine and must
    match the indexed path (including atom-order mapping of outputs)."""
    n = 60
    a = 12.0
    coord = (rng.uniform(0, a, size=(n, 3))).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    cell = np.eye(3, dtype=np.float32) * a
    data = {"coord": coord, "numbers": numbers, "cell": cell}

    old_thresh = calc.binned_threshold
    try:
        calc.binned_threshold = 10  # force binned
        out_b = calc(data, forces=True)
        assert calc._last_perm is not None
        calc.binned_threshold = 10**9  # force indexed
        out_i = calc(data, forces=True)
    finally:
        calc.binned_threshold = old_thresh

    np.testing.assert_allclose(out_b["energy"], out_i["energy"], atol=1e-3)
    np.testing.assert_allclose(out_b["charges"], out_i["charges"], atol=2e-4)
    np.testing.assert_allclose(out_b["forces"], out_i["forces"], atol=2e-3)


def test_matmul_precision_env_validated(monkeypatch):
    """Unsupported ambient precisions are rejected up front: they would
    otherwise reach the Pallas kernel dots where Mosaic only lowers
    DEFAULT/HIGHEST (opaque in-kernel lowering error)."""
    import pytest as _pytest

    from aimnetcentral_tpu.calculators.derivatives import make_eval_fn, make_hvp_fn
    from aimnetcentral_tpu.models import AIMNet2Config

    monkeypatch.setenv("AIMNET_MATMUL_PRECISION", "high")
    with _pytest.raises(ValueError, match="AIMNET_MATMUL_PRECISION"):
        make_eval_fn(AIMNet2Config(), forces=True)
    with _pytest.raises(ValueError, match="AIMNET_MATMUL_PRECISION"):
        make_hvp_fn(AIMNet2Config())
    monkeypatch.setenv("AIMNET_MATMUL_PRECISION", "default")
    make_eval_fn(AIMNet2Config(), forces=True)  # builds fine


@pytest.mark.slow
@pytest.mark.parametrize("method", ["dsf", "ewald", "pme"])
def test_hvp_matches_dense_hessian_per_lr_method(calc, rng, method):
    """HVP == dense Hessian for EVERY periodic LR method (reference
    tests/test_hvp.py:61-96; its PME needs fixed-charge FD — ours is one
    exact jvp for all three)."""
    coord, numbers = random_molecule(rng, 6, spread=2.5)
    cell = np.eye(3, dtype=np.float32) * 8.0
    data = {"coord": coord + 4.0, "numbers": numbers, "cell": cell}
    try:
        calc.set_lrcoulomb_method(method)
        out = calc(data, hessian=True)
        h = out["hessian"].reshape(18, 18)
        v = rng.normal(size=(6, 3)).astype(np.float32)
        hv = calc.hessian_vector_product(data, v)
        np.testing.assert_allclose(hv.reshape(-1), h @ v.reshape(-1), atol=2e-3)
    finally:
        calc.set_lrcoulomb_method("simple")


@pytest.mark.slow
def test_ensemble_std_caller_order_on_binned_layout(reference_aimnet2, rng):
    """*_std outputs must ride the same slot->caller-order mapping as the
    mean-valued keys when the ensemble eval routes through the binned
    engine (they previously bypassed it)."""
    from aimnetcentral_tpu.calculators.ensemble import EnsembleCalculator

    import torch

    members = []
    for seed in (0, 1):
        torch.manual_seed(seed)
        model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
        cfg = config_from_yaml(cfg_yaml)
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params, aux = convert_state_dict(sd, cfg)
        members.append((params, cfg, aux))
    ens = EnsembleCalculator.from_members(members)
    ens.binned_threshold = 40  # force the binned route at n=60

    a = 10.0
    coord = rng.uniform(0.5, a - 0.5, size=(60, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=60)
    cell = np.eye(3, dtype=np.float32) * a
    data = {"coord": coord, "numbers": numbers, "cell": cell}
    out = ens(data, forces=True)
    assert ens._last_perm is not None  # really went binned
    assert "charges_std" in out and out["charges_std"].shape == (60,)

    f_members = np.stack(
        [AIMNet2Calculator(m)(data, forces=True)["forces"] for m in members]
    )
    np.testing.assert_allclose(
        out["forces_std"], f_members.std(axis=0), atol=2e-4
    )


@pytest.mark.slow
def test_ensemble_calculator_fused_matches_map_path(reference_aimnet2, rng):
    """fused=True (shared geometry/basis, models/ensemble_fused.py) must
    reproduce the per-member lax.map path: mean energy/forces/charges and
    energy_std/charges_std; forces_std is intentionally absent (documented
    — per-member force jacobians cost one backward per member)."""
    from aimnetcentral_tpu.calculators.ensemble import EnsembleCalculator

    import torch

    members = []
    for seed in (0, 1, 2):
        torch.manual_seed(seed)
        model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
        cfg = config_from_yaml(cfg_yaml)
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params, aux = convert_state_dict(sd, cfg)
        members.append((params, cfg, aux))

    coord, numbers = random_molecule(rng, 8)
    data = {"coord": coord, "numbers": numbers}
    ref = EnsembleCalculator.from_members(members)(data, forces=True)
    out = EnsembleCalculator.from_members(members, fused=True)(data, forces=True)

    np.testing.assert_allclose(out["energy"], ref["energy"], atol=1e-4)
    np.testing.assert_allclose(out["energy_std"], ref["energy_std"], atol=1e-4)
    np.testing.assert_allclose(out["forces"], ref["forces"], atol=2e-4)
    np.testing.assert_allclose(out["charges"], ref["charges"], atol=1e-4)
    np.testing.assert_allclose(out["charges_std"], ref["charges_std"], atol=1e-4)
    assert "forces_std" not in out

    # stress requests transparently fall back to the exact per-member path
    a = 10.0
    coord_p = rng.uniform(0.5, a - 0.5, size=(20, 3)).astype(np.float32)
    numbers_p = rng.choice([1, 6, 8], size=20)
    pdata = {"coord": coord_p, "numbers": numbers_p,
             "cell": np.eye(3, dtype=np.float32) * a}
    fused = EnsembleCalculator.from_members(members, fused=True)
    s_out = fused(pdata, stress=True)
    s_ref = EnsembleCalculator.from_members(members)(pdata, stress=True)
    np.testing.assert_allclose(s_out["stress"], s_ref["stress"], atol=2e-4)
    assert "forces_std" in s_out or "energy_std" in s_out


def test_ensemble_precision_tiers(reference_aimnet2, rng):
    """EnsembleCalculator honors the precision tier on BOTH eval paths:
    fused and per-member.  On CPU the ambient precisions coincide, so
    'balanced' must match 'exact' closely on each path (the tier mapping
    itself is calculator.precision_tiers — one source of truth); hardware
    accuracy/throughput live in docs/performance.md.  'bogus' raises."""
    import torch

    from aimnetcentral_tpu.calculators.calculator import precision_tiers
    from aimnetcentral_tpu.calculators.ensemble import EnsembleCalculator

    assert precision_tiers("exact") == ("highest", None)
    assert precision_tiers("balanced") == ("highest", "f32x3")
    assert precision_tiers("fast") == ("default", None)
    with pytest.raises(ValueError, match="precision"):
        precision_tiers("f32x3")  # kernel-mode strings are not tiers

    members = []
    for seed in (0, 1):
        torch.manual_seed(seed)
        model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
        cfg = config_from_yaml(cfg_yaml)
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params, aux = convert_state_dict(sd, cfg)
        members.append((params, cfg, aux))

    coord, numbers = random_molecule(rng, 8)
    data = {"coord": coord, "numbers": numbers}
    for fused in (False, True):
        ref = EnsembleCalculator.from_members(members, fused=fused)(
            data, forces=True
        )
        bal = EnsembleCalculator.from_members(
            members, fused=fused, precision="balanced"
        )(data, forces=True)
        np.testing.assert_allclose(bal["energy"], ref["energy"], atol=1e-4)
        np.testing.assert_allclose(bal["forces"], ref["forces"], atol=2e-4)


def test_ensemble_calculator_fused_ewald_matches_map_path(reference_aimnet2, rng):
    """fused=True with the EWALD LR method (member-fused phase matrix +
    shared erfc sweep through the calculator facade, round 5) must match the
    per-member lax.map path on a periodic box — the accuracy-best method no
    longer silently degrades to a per-member loop."""
    import dataclasses

    import torch

    from aimnetcentral_tpu.calculators.ensemble import EnsembleCalculator
    from aimnetcentral_tpu.models.heads import LRCoulombHead

    members = []
    for seed in (0, 1, 2):
        torch.manual_seed(seed)
        model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
        cfg = config_from_yaml(cfg_yaml)
        cfg = dataclasses.replace(
            cfg,
            outputs=tuple(
                (n, dataclasses.replace(h, method="ewald")
                 if isinstance(h, LRCoulombHead) else h)
                for n, h in cfg.outputs
            ),
        )
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params, aux = convert_state_dict(sd, cfg)
        members.append((params, cfg, aux))

    a = 10.0
    coord = rng.uniform(0.5, a - 0.5, size=(24, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=24)
    data = {"coord": coord, "numbers": numbers,
            "cell": np.eye(3, dtype=np.float32) * a}
    ref = EnsembleCalculator.from_members(members)(data, forces=True)
    out = EnsembleCalculator.from_members(members, fused=True)(data, forces=True)
    np.testing.assert_allclose(out["energy"], ref["energy"], atol=2e-4)
    np.testing.assert_allclose(out["energy_std"], ref["energy_std"], atol=2e-4)
    np.testing.assert_allclose(out["forces"], ref["forces"], atol=2e-4)
    np.testing.assert_allclose(out["charges"], ref["charges"], atol=1e-4)
