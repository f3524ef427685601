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


def test_dsf_charge_gradient_matches_fd(rng):
    """dE/dq via jax.grad vs central differences — the relaxed-charge force
    path depends on this gradient (reference tests/test_lr.py:269-310
    gradcheck analogues)."""
    sys = system_from_molecules(
        [{"coord": rng.uniform(0, 6, (6, 3)), "numbers": [6] * 6}],
        lr_cutoff=20.0,
    )
    n_slots = sys.numbers.shape[0]  # includes the trailing padding atom
    q0 = np.zeros(n_slots, np.float32)
    q0[:6] = rng.uniform(-0.4, 0.4, 6)
    q0 = jnp.asarray(q0)

    def e_of_q(q):
        return lrmod.coulomb_dsf(
            {"q": q}, sys, 4.6, 0.2, 15.0, subtract_sr=False, key_in="q"
        ).sum()

    g = np.asarray(jax.grad(e_of_q)(q0))
    eps = 1e-3
    for i in (0, 3, 5):
        dq = np.zeros(n_slots, np.float32)
        dq[i] = eps
        fd = (float(e_of_q(q0 + dq)) - float(e_of_q(q0 - dq))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-3, atol=1e-5)


def test_ewald_charge_gradient_matches_fd(rng):
    """Same gradcheck for the periodic Ewald energy (the reference keeps
    charges in the autograd graph for ewald — lr.py:687-696)."""
    from aimnetcentral_tpu.models.ewald import attach_ewald, ewald_energy

    a = 7.0
    coord = rng.uniform(0.5, a - 0.5, (6, 3)).astype(np.float32)
    sys = system_from_molecules(
        [{"coord": coord, "numbers": [6] * 6, "cell": np.eye(3, dtype=np.float32) * a}],
        cutoff=5.0,
        lr_cutoff=12.0,
    )
    sys = attach_ewald(sys, 1e-6)
    n_slots = sys.numbers.shape[0]
    q0 = np.zeros(n_slots, np.float32)
    q0[:6] = rng.uniform(-0.4, 0.4, 6)
    q0 = jnp.asarray(q0)

    def e_of_q(q):
        nb = sys.nbmat_lr if sys.nbmat_lr is not None else sys.nbmat
        sh = sys.shifts_lr if sys.shifts_lr is not None else sys.shifts
        return ewald_energy(
            sys.coord, q, sys.cell, sys.mol_idx, sys.num_mol, sys.numbers,
            nb, sh, sys.ewald_eta, sys.ewald_r_cutoff, sys.ewald_k_cutoff,
            sys.ewald_kpts,
        ).sum()

    g = np.asarray(jax.grad(e_of_q)(q0))
    eps = 1e-3
    for i in (1, 4):
        dq = np.zeros(n_slots, np.float32)
        dq[i] = eps
        fd = (float(e_of_q(q0 + dq)) - float(e_of_q(q0 - dq))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=3e-3, atol=2e-5)


def test_d3_coordinate_gradient_matches_fd(rng):
    """D3 dispersion forces (through the CN sigmoid + C6 interpolation) vs
    FD (reference tests/test_dftd3.py gradient coverage)."""
    coord = rng.uniform(0, 5, (5, 3)).astype(np.float32)
    numbers = np.array([6, 1, 8, 6, 1])

    head = DFTD3Head(s8=0.3908, a1=0.566, a2=3.128)
    params = head_init(jax.random.key(0), head)
    sys0 = system_from_molecules(
        [{"coord": coord, "numbers": numbers}], lr_cutoff=15.0
    )

    def e_of(c):
        # the host builder can't trace: replace real-atom rows on the
        # prebuilt padded system (the generous lr_cutoff list stays valid
        # for the tiny FD displacements)
        full = jnp.asarray(sys0.coord).at[:5].set(c)
        data = head_apply(head, params, {"_sae_external": True}, sys0.replace(coord=full))
        return data["energy"].sum()

    g = np.asarray(jax.grad(e_of)(jnp.asarray(coord)))
    eps = 1e-3
    for atom, ax in [(0, 0), (2, 1)]:
        cp = coord.copy()
        cp[atom, ax] += eps
        ep = float(e_of(cp))
        cp[atom, ax] -= 2 * eps
        em = float(e_of(cp))
        fd = (ep - em) / (2 * eps)
        np.testing.assert_allclose(g[atom, ax], fd, rtol=5e-3, atol=1e-6)
