"""Cross-version / cross-backend numerics validation.

TPU analogue of the reference's GPU validation harness (reference aimnet/
validation/gpu_observables.py:33-128 + compare_observables.py:57-131):
deterministic energy/force dumps for a fixed set of systems, and a tolerance
comparer producing a pass/fail report.  Use it to gate jax/libtpu upgrades
the way the reference gates torch versions (scripts/gpu_validate.sh).

XLA reductions are deterministic by default (SURVEY.md §5: the reference's
atomics-vs-deterministic switch collapses here), so two runs on the same
backend are bitwise identical; across backends (CPU vs TPU, matmul precision)
use the documented tolerances: energy 1e-5 eV * natoms, force 1e-4 eV/A.
"""

from __future__ import annotations

import json
from typing import Any, Mapping

import numpy as np


def reference_systems() -> dict[str, dict[str, Any]]:
    """Fixed validation geometries: water, methane, a charged ion pair, and a
    synthetic NaCl periodic lattice (reference uses water/methane/caffeine/
    spiro-crystal; geometry values here are standard textbook structures)."""
    water = {
        "coord": [[0.0, 0.0, 0.1193], [0.0, 0.7632, -0.4770], [0.0, -0.7632, -0.4770]],
        "numbers": [8, 1, 1],
    }
    methane = {
        "coord": [
            [0.0, 0.0, 0.0],
            [0.6293, 0.6293, 0.6293],
            [-0.6293, -0.6293, 0.6293],
            [-0.6293, 0.6293, -0.6293],
            [0.6293, -0.6293, -0.6293],
        ],
        "numbers": [6, 1, 1, 1, 1],
    }
    ion_pair = {
        "coord": [[0.0, 0.0, 0.0], [3.0, 0.0, 0.0], [5.5, 1.0, 0.0]],
        "numbers": [8, 1, 7],
        "charge": -1.0,
    }
    a = 5.64
    frac = np.array(
        [
            [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
            [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5],
        ]
    )
    nacl = {
        "coord": (frac * a).tolist(),
        "numbers": [11, 11, 11, 11, 17, 17, 17, 17],
        "cell": (np.eye(3) * a).tolist(),
    }
    return {"water": water, "methane": methane, "ion_pair": ion_pair, "nacl": nacl}


def dump_observables(calc, path: str | None = None) -> dict[str, Any]:
    """Evaluate energy/forces/charges on every reference system."""
    import jax

    out: dict[str, Any] = {
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
    }
    for name, data in reference_systems().items():
        res = calc(dict(data), forces=True)
        out[name] = {
            "energy": res["energy"].tolist(),
            "forces": np.asarray(res["forces"]).tolist(),
            "charges": np.asarray(res["charges"]).tolist(),
        }
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    return out


def compare_observables(
    a: Mapping[str, Any] | str,
    b: Mapping[str, Any] | str,
    energy_atol: float = 1e-4,
    force_atol: float = 1e-4,
) -> tuple[bool, str]:
    """Tolerance comparison of two dumps; returns (ok, report)."""

    def load(x):
        if isinstance(x, str):
            with open(x) as f:
                return json.load(f)
        return x

    da, db = load(a), load(b)
    lines = [
        f"backends: {da.get('backend')} ({da.get('jax_version')}) vs "
        f"{db.get('backend')} ({db.get('jax_version')})"
    ]
    ok = True
    for name in reference_systems():
        if name not in da or name not in db:
            lines.append(f"{name}: MISSING")
            ok = False
            continue
        de = abs(np.asarray(da[name]["energy"]) - np.asarray(db[name]["energy"])).max()
        df = np.abs(
            np.asarray(da[name]["forces"]) - np.asarray(db[name]["forces"])
        ).max()
        this_ok = de <= energy_atol and df <= force_atol
        ok &= this_ok
        lines.append(
            f"{name}: dE={de:.2e} eV (atol {energy_atol}), "
            f"max|dF|={df:.2e} eV/A (atol {force_atol}) "
            f"{'OK' if this_ok else 'FAIL'}"
        )
    return ok, "\n".join(lines)
