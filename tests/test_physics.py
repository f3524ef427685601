"""Physics-invariant tests for the LR modules (reference tests/test_dftd3.py
and tests/test_lr.py style: trends and invariants instead of golden numbers)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimnetcentral_tpu import constants
from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.models import lr as lrmod
from aimnetcentral_tpu.models.heads import DFTD3Head, SRRepHead, head_apply, head_init


def _pair_system(d, z1=6, z2=6):
    return system_from_molecules(
        [{"coord": [[0, 0, 0], [d, 0, 0]], "numbers": [z1, z2]}], lr_cutoff=20.0
    )


def _d3_energy(sys, s8=0.3908, a1=0.566, a2=3.128):
    head = DFTD3Head(s8=s8, a1=a1, a2=a2)
    params = head_init(jax.random.key(0), head)
    data = head_apply(head, params, {"_sae_external": True}, sys)
    return float(np.asarray(data["energy"])[0])


def test_d3_attractive_and_decays():
    e4 = _d3_energy(_pair_system(4.0))
    e6 = _d3_energy(_pair_system(6.0))
    e10 = _d3_energy(_pair_system(10.0))
    assert e4 < 0 and e6 < 0
    assert e4 < e6 < e10 < 0  # attraction weakens with distance
    # ~1/r^6 scaling in the asymptotic regime
    ratio = e6 / e10
    assert 3.0 < ratio < 30.0


def test_d3_heavier_atoms_stronger():
    e_cc = _d3_energy(_pair_system(5.0, 6, 6))
    e_hh = _d3_energy(_pair_system(5.0, 1, 1))
    assert e_cc < e_hh < 0


def test_d3_zero_beyond_cutoff():
    e = _d3_energy(_pair_system(16.0))  # beyond 15 A cutoff (S5 switch)
    assert e == pytest.approx(0.0, abs=1e-10)


def test_coulomb_signs(rng):
    sys = _pair_system(5.0, 8, 1)
    # like charges repel (positive energy), opposite attract
    q_like = jnp.array([0.5, 0.5, 0.0])
    q_opp = jnp.array([0.5, -0.5, 0.0])
    e_like = float(
        np.asarray(
            lrmod.coulomb_simple({"q": q_like}, sys, 4.6, subtract_sr=False, key_in="q")
        )[0]
    )
    e_opp = float(
        np.asarray(
            lrmod.coulomb_simple({"q": q_opp}, sys, 4.6, subtract_sr=False, key_in="q")
        )[0]
    )
    assert e_like > 0 > e_opp


def test_coulomb_zero_charges():
    sys = _pair_system(5.0)
    e = float(np.asarray(lrmod.coulomb_simple({"q": jnp.zeros(3)}, sys, 4.6, key_in="q"))[0])
    assert e == 0.0


def test_dsf_smooth_at_cutoff():
    """DSF pair energy is C^1 at dsf_rc: force -> 0 continuously."""
    q = jnp.array([0.3, -0.3, 0.0])

    def e_of(d):
        sys = _pair_system(float(d))
        return lrmod.coulomb_dsf({"q": q}, sys, 4.6, 0.2, 15.0, subtract_sr=False, key_in="q")[0]

    e_near = float(e_of(14.99))
    e_at = float(e_of(15.01))
    assert abs(e_near - e_at) < 1e-4  # continuous through the cutoff


def test_srrep_repulsive_shortrange():
    head = SRRepHead()
    params = head_init(jax.random.key(0), head)
    e1 = float(
        np.asarray(
            head_apply(head, params, {"_sae_external": True}, _pair_system(1.0))["e_rep"]
        )[0]
    )
    e2 = float(
        np.asarray(
            head_apply(head, params, {"_sae_external": True}, _pair_system(2.0))["e_rep"]
        )[0]
    )
    assert e1 > e2 > 0  # strong short-range repulsion, decaying


def test_determinism_same_backend(reference_aimnet2, rng):
    """XLA reductions are deterministic: identical runs are bitwise equal
    (the reference needs a special deterministic=True mode for this,
    aimnet/calculators/calculator.py:77-84)."""
    from aimnetcentral_tpu.models.aimnet2 import aimnet2_apply
    from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict
    from conftest import random_molecule

    model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, _ = convert_state_dict(sd, cfg)
    coord, numbers = random_molecule(rng, 15)
    sys = system_from_molecules([{"coord": coord, "numbers": numbers}])
    e1 = np.asarray(aimnet2_apply(params, cfg, sys)["energy"])
    e2 = np.asarray(aimnet2_apply(params, cfg, sys)["energy"])
    assert (e1 == e2).all()  # bitwise
