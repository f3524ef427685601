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


# --- reference tests/test_lr.py behavioral cases (lr.py:212-311 contract) ---


def _lr_energy(head_kwargs, sys, q, data_extra=None):
    from aimnetcentral_tpu.models.heads import LRCoulombHead

    head = LRCoulombHead(**head_kwargs)
    params = head_init(jax.random.key(0), head)
    data = {"_sae_external": True, "charges": jnp.asarray(q)}
    if data_extra:
        data.update(data_extra)
    return head_apply(head, params, data, sys)


def test_simple_dsf_close_for_small_molecules(rng):
    """For small gas-phase molecules DSF tracks simple in sign and magnitude
    (reference tests/test_lr.py:334 asserts only finiteness — DSF's erfc
    damping at alpha=0.2 genuinely shifts molecular-range pair energies by
    ~10%, so closeness is bounded, not tight)."""
    coord, numbers = __import__("conftest").random_molecule(rng, 6, spread=1.5)
    sys = system_from_molecules([{"coord": coord, "numbers": numbers}], lr_cutoff=20.0)
    q = rng.normal(size=7).astype(np.float32) * 0.3  # 6 atoms + 1 pad row
    q[-1] = 0.0
    e_simple = float(np.asarray(_lr_energy({"method": "simple"}, sys, q)["energy"])[0])
    e_dsf = float(
        np.asarray(
            _lr_energy({"method": "dsf", "dsf_rc": 15.0}, sys, q)["energy"]
        )[0]
    )
    assert np.isfinite(e_simple) and np.isfinite(e_dsf)
    assert e_simple != 0.0
    assert np.sign(e_dsf) == np.sign(e_simple)
    assert e_dsf == pytest.approx(e_simple, rel=0.25)


def test_subtract_sr_changes_energy(rng):
    """subtract_sr removes the short-range part the embedded network already
    accounts for (reference tests/test_lr.py:955)."""
    sys = _pair_system(2.0, 8, 1)
    q = [0.4, -0.4, 0.0]
    e_with = float(np.asarray(_lr_energy({"subtract_sr": True}, sys, q)["energy"])[0])
    e_without = float(
        np.asarray(_lr_energy({"subtract_sr": False}, sys, q)["energy"])[0]
    )
    assert e_with != pytest.approx(e_without, abs=1e-6)


def test_envelopes_differ_and_validate(rng):
    """exp vs cosine SR envelopes give different energies; unknown envelope /
    method are rejected at CONSTRUCTION (reference lr.py:304-311)."""
    from aimnetcentral_tpu.models.heads import LRCoulombHead, SRCoulombHead

    sys = _pair_system(2.0, 8, 1)
    q = [0.4, -0.4, 0.0]
    e_exp = float(np.asarray(_lr_energy({"envelope": "exp"}, sys, q)["energy"])[0])
    e_cos = float(np.asarray(_lr_energy({"envelope": "cosine"}, sys, q)["energy"])[0])
    assert e_exp != pytest.approx(e_cos, abs=1e-6)

    with pytest.raises(ValueError, match="envelope"):
        LRCoulombHead(envelope="gauss")
    with pytest.raises(ValueError, match="method"):
        LRCoulombHead(method="fmm")
    with pytest.raises(ValueError, match="envelope"):
        SRCoulombHead(envelope="gauss")


def test_charge_non_neutral_finite(rng):
    """Net-charged systems stay finite for the gas-phase methods
    (reference tests/test_lr.py:972)."""
    coord, numbers = __import__("conftest").random_molecule(rng, 5, spread=1.5)
    sys = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "charge": 1.0}], lr_cutoff=20.0
    )
    q = np.full(6, 0.2, np.float32)
    q[-1] = 0.0
    for method in ("simple", "dsf"):
        e = np.asarray(_lr_energy({"method": method}, sys, q)["energy"])
        assert np.isfinite(e).all()


def test_last_real_atom_charge_affects_energy_padding_inert(rng):
    """The last REAL atom before the padding boundary still contributes, and
    charges placed on padding rows are inert (reference tests/test_lr.py:936
    — the off-by-one masking guard)."""
    m1 = {"coord": [[0, 0, 0], [1.5, 0, 0], [0, 1.5, 0], [0, 0, 1.5]],
          "numbers": [6, 1, 1, 1]}
    m2 = {"coord": [[0, 0, 0], [1.2, 0, 0]], "numbers": [8, 1]}
    sys = system_from_molecules([m1, m2], lr_cutoff=20.0)
    n_rows = int(sys.numbers.shape[0])
    q = np.zeros(n_rows, np.float32)
    # molecule 2 occupies rows 4..5 (flat packing); its LAST real atom is 5
    q[4], q[5] = 0.3, -0.3
    e0 = np.asarray(_lr_energy({"method": "dsf"}, sys, q)["energy"])
    q2 = q.copy()
    q2[5] = 0.0
    e1 = np.asarray(_lr_energy({"method": "dsf"}, sys, q2)["energy"])
    assert e0[1] != pytest.approx(e1[1], abs=1e-9)
    # padding rows: charge there must not change any molecule's energy
    q3 = q.copy()
    pad_rows = np.where(np.asarray(sys.numbers) == 0)[0]
    assert pad_rows.size > 0
    q3[pad_rows] = 7.7
    e2 = np.asarray(_lr_energy({"method": "dsf"}, sys, q3)["energy"])
    np.testing.assert_allclose(e2, e0, atol=1e-6)


def test_lr_energy_addition(rng):
    """The LR head ACCUMULATES into an existing energy key instead of
    overwriting (reference tests/test_lr.py:392 energy_addition)."""
    sys = _pair_system(2.0, 8, 1)
    q = [0.4, -0.4, 0.0]
    base = jnp.asarray(np.array([1.25], np.float32))
    e_plain = np.asarray(_lr_energy({}, sys, q)["energy"])
    e_accum = np.asarray(_lr_energy({}, sys, q, {"energy": base})["energy"])
    np.testing.assert_allclose(e_accum, e_plain + 1.25, rtol=1e-6)


def test_d3_custom_s6_and_key_out():
    """s6 scales the r^-6 term; key_out routes the energy (reference
    tests/test_dftd3.py:151-160)."""
    sys = _pair_system(8.0)  # far: r^-6 dominates over r^-8
    e1 = _d3_energy(sys)
    head2 = DFTD3Head(s8=0.3908, a1=0.566, a2=3.128, s6=2.0, key_out="e_disp")
    params = head_init(jax.random.key(0), head2)
    d2 = head_apply(head2, params, {"_sae_external": True}, sys)
    assert "e_disp" in d2 and "energy" not in d2
    e2 = float(np.asarray(d2["e_disp"])[0])
    assert e2 == pytest.approx(2.0 * e1, rel=0.05)
