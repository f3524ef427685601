"""Version-drift harness: deterministic observables dump + diff.

TPU analogue of the reference's cross-torch-version matrix driver
(reference scripts/gpu_validate.sh:1-60 builds one venv per torch version,
dumps deterministic energy/force observables, and diffs against a committed
baseline).  Here one committed baseline gates jax/libtpu upgrades: a version
bump that shifts numerics fails the fast-lane test loudly.

Weights are a COMMITTED npz (tools/validate_weights.npz) rather than a seeded
jax.random init, so a PRNG-implementation change can never masquerade as a
numerics drift.  The model is small but structurally complete: embedding +
3 message passes + energy MLP + atomic shift + DSF Coulomb + DFTD3.

Usage:
    python tools/validate.py --check            # diff vs committed baseline
    python tools/validate.py --dump out.json    # write a dump
    python tools/validate.py --pin              # (re)write weights+baseline

Tolerances follow the reference gate (compare_observables.py:57):
energy atol 1e-5 eV, max-abs force diff 1e-4 eV/A.
"""

from __future__ import annotations

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

WEIGHTS = os.path.join(_HERE, "validate_weights.npz")
BASELINE = os.path.join(_HERE, "validate_baseline.json")

ENERGY_ATOL = 1e-5
FORCE_ATOL = 1e-4


def _pin_cpu_numerics() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    # the reference pins TF32 off for its dumps (gpu_observables.py:33-40);
    # the analogue here is exact-f32 matmuls
    jax.config.update("jax_default_matmul_precision", "highest")


def validation_model():
    """Small-but-complete architecture (all LR head kinds on the DSF path)."""
    from aimnetcentral_tpu.models.aimnet2 import AEVConfig, AIMNet2Config
    from aimnetcentral_tpu.models.heads import (
        AtomicShiftHead,
        AtomicSumHead,
        DFTD3Head,
        LRCoulombHead,
        OutputHead,
    )
    from aimnetcentral_tpu.models.modules import MLPSpec

    return AIMNet2Config(
        aev=AEVConfig(rc_s=5.0, nshifts_s=8),
        nfeature=4,
        d2features=True,
        ncomb_v=4,
        hidden=((32,), (32,), (32, 32)),
        aim_size=32,
        outputs=(
            (
                "energy_mlp",
                OutputHead(n_in=32, n_out=1, key_in="aim", key_out="energy",
                           mlp=MLPSpec(hidden=(16,), last_linear=True)),
            ),
            ("atomic_shift", AtomicShiftHead(key_in="energy", key_out="energy")),
            ("atomic_sum", AtomicSumHead(key_in="energy", key_out="energy")),
            ("lrcoulomb", LRCoulombHead(method="dsf", dsf_rc=10.0)),
            ("dftd3", DFTD3Head(s8=1.2, a1=0.4, a2=4.8, cutoff=10.0)),
        ),
    )


def build_calculator():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator
    from aimnetcentral_tpu.models import aimnet2_init

    cfg = validation_model()
    template = aimnet2_init(jax.random.key(0), cfg)
    leaves, treedef = jax.tree.flatten(template)
    if not os.path.exists(WEIGHTS):
        raise FileNotFoundError(
            f"{WEIGHTS} missing — run `python tools/validate.py --pin` once"
        )
    with np.load(WEIGHTS) as z:
        assert int(z["__n__"]) == len(leaves), (
            "committed weights do not match the validation architecture"
        )
        params = jax.tree.unflatten(
            treedef, [jnp.asarray(z[f"p{i}"]) for i in range(len(leaves))]
        )
    return AIMNet2Calculator((params, cfg, {"sae": {}}))


def pin() -> None:
    import jax
    import numpy as np

    from aimnetcentral_tpu.models import aimnet2_init
    from aimnetcentral_tpu.validation import dump_observables

    cfg = validation_model()
    params = aimnet2_init(jax.random.key(0), cfg)
    leaves, _ = jax.tree.flatten(params)
    np.savez(
        WEIGHTS, __n__=len(leaves),
        **{f"p{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )
    dump_observables(build_calculator(), BASELINE)
    print(f"pinned {WEIGHTS} + {BASELINE}")


def check(dump_path: str | None = None) -> bool:
    from aimnetcentral_tpu.validation import compare_observables, dump_observables

    current = dump_observables(build_calculator(), dump_path)
    ok, report = compare_observables(
        BASELINE, current, energy_atol=ENERGY_ATOL, force_atol=FORCE_ATOL
    )
    print(report)
    return ok


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--dump", metavar="PATH")
    ap.add_argument("--pin", action="store_true")
    args = ap.parse_args()
    _pin_cpu_numerics()
    if args.pin:
        pin()
        return
    if args.check or not args.dump:
        sys.exit(0 if check(args.dump) else 1)
    from aimnetcentral_tpu.validation import dump_observables

    dump_observables(build_calculator(), args.dump)
    print(f"wrote {args.dump}")


if __name__ == "__main__":
    main()
