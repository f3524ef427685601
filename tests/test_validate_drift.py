"""Version-drift gate: the committed observables baseline must reproduce on
the current jax (reference scripts/gpu_validate.sh:1-60 gates torch bumps the
same way — one deterministic dump diffed against a committed baseline)."""

import os
import subprocess
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def test_committed_baseline_reproduces():
    sys.path.insert(0, TOOLS)
    try:
        import validate
    finally:
        sys.path.pop(0)
    calc = validate.build_calculator()
    from aimnetcentral_tpu.validation import compare_observables, dump_observables

    current = dump_observables(calc)
    ok, report = compare_observables(
        validate.BASELINE, current,
        energy_atol=validate.ENERGY_ATOL, force_atol=validate.FORCE_ATOL,
    )
    assert ok, f"numerics drifted vs committed baseline:\n{report}"


def test_drift_is_detected():
    """The comparer must actually fail on a shifted dump (guards against a
    vacuously-green gate)."""
    import json

    sys.path.insert(0, TOOLS)
    try:
        import validate
    finally:
        sys.path.pop(0)
    with open(validate.BASELINE) as f:
        shifted = json.load(f)
    shifted["water"]["forces"] = (
        np.asarray(shifted["water"]["forces"]) + 5e-4
    ).tolist()
    from aimnetcentral_tpu.validation import compare_observables

    ok, _ = compare_observables(
        validate.BASELINE, shifted,
        energy_atol=validate.ENERGY_ATOL, force_atol=validate.FORCE_ATOL,
    )
    assert not ok


@pytest.mark.slow
def test_cli_check_exit_code():
    """`python tools/validate.py --check` is the gate CI runs."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "validate.py"), "--check"],
        capture_output=True, text=True, env=env, timeout=560,
    )
    assert r.returncode == 0, r.stdout + r.stderr


# -- comparer unit behavior (reference tests/test_compare_observables.py) -----


def _fake_dump(e_shift=0.0, f_shift=0.0, drop=None):
    from aimnetcentral_tpu.validation.observables import reference_systems

    dump = {"backend": "cpu", "jax_version": "x"}
    for i, name in enumerate(reference_systems()):
        if name == drop:
            continue
        dump[name] = {
            "energy": [1.0 + i + e_shift],
            "forces": [[0.1 + f_shift, 0.0, 0.0]] * 3,
        }
    return dump


def test_comparer_passes_within_tolerance():
    from aimnetcentral_tpu.validation import compare_observables

    ok, report = compare_observables(_fake_dump(), _fake_dump(e_shift=5e-5))
    assert ok and "OK" in report and "FAIL" not in report


def test_comparer_flags_energy_drift():
    from aimnetcentral_tpu.validation import compare_observables

    ok, report = compare_observables(_fake_dump(), _fake_dump(e_shift=5e-3))
    assert not ok and "FAIL" in report


def test_comparer_flags_force_drift():
    from aimnetcentral_tpu.validation import compare_observables

    ok, report = compare_observables(_fake_dump(), _fake_dump(f_shift=5e-3))
    assert not ok


def test_comparer_flags_missing_system():
    from aimnetcentral_tpu.validation import compare_observables
    from aimnetcentral_tpu.validation.observables import reference_systems

    victim = next(iter(reference_systems()))
    ok, report = compare_observables(_fake_dump(), _fake_dump(drop=victim))
    assert not ok and f"{victim}: MISSING" in report
