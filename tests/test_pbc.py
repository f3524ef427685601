"""Periodic-boundary tests: Ewald golden checks (reference legacy torch Ewald,
Madelung constant), DSF<->Ewald consistency (reference tests/test_pbc.py:287
analogue), and periodic distance machinery."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from aimnetcentral_tpu import constants
from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.models.ewald import (
    attach_ewald,
    estimate_ewald_parameters,
    ewald_energy,
    _k_grid,
)
from aimnetcentral_tpu.models import lr as lrmod


def _ewald_of_system(sys, charges, accuracy=1e-7):
    sys = attach_ewald(sys, accuracy)
    return np.asarray(
        ewald_energy(
            sys.coord,
            jnp.asarray(charges),
            sys.cell,
            sys.mol_idx,
            sys.num_mol,
            sys.numbers,
            sys.nbmat_lr if sys.nbmat_lr is not None else sys.nbmat,
            sys.shifts_lr if sys.shifts_lr is not None else sys.shifts,
            sys.ewald_eta,
            sys.ewald_r_cutoff,
            sys.ewald_k_cutoff,
            sys.ewald_kpts,
        )
    )


def test_ewald_vs_reference_legacy(reference_aimnet2, rng):
    """Golden check against the reference's pure-torch Ewald matrix
    (reference aimnet/ops.py:196-273)."""
    import torch
    from aimnet.ops import coulomb_matrix_ewald

    n = 12
    a = 7.0
    coord = rng.uniform(0.5, a - 0.5, size=(n, 3)).astype(np.float32)
    q = rng.normal(size=n).astype(np.float32)
    q -= q.mean()  # neutral
    cell = np.eye(3, dtype=np.float32) * a

    # reference helper hard-casts lattice shifts to float32, so run it in f32
    J = coulomb_matrix_ewald(
        torch.tensor(coord, dtype=torch.float32),
        torch.tensor(cell, dtype=torch.float32),
        accuracy=1e-8,
    ).double().numpy()
    e_ref = constants.half_Hartree * constants.Bohr * float(q @ J @ q)

    numbers = np.full(n, 6)
    acc = 1e-7
    p = estimate_ewald_parameters(cell, n, acc)
    sys = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}],
        cutoff=4.5,
        lr_cutoff=float(p.r_cutoff),
    )
    qp = np.zeros(sys.natoms, dtype=np.float32)
    qp[:n] = q
    e = _ewald_of_system(sys, qp, acc)
    assert e[0] == pytest.approx(e_ref, rel=1e-4, abs=1e-4)


def test_madelung_nacl(rng):
    """Rock-salt Madelung constant 1.747565 from the Ewald energy."""
    a = 5.0  # lattice constant, conventional cubic cell, 8 ions
    frac = np.array(
        [
            [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],  # Na (+1)
            [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5],  # Cl (-1)
        ]
    )
    coord = (frac * a).astype(np.float32)
    q = np.array([1, 1, 1, 1, -1, -1, -1, -1], dtype=np.float32)
    numbers = np.array([11] * 4 + [17] * 4)
    cell = np.eye(3, dtype=np.float32) * a

    acc = 1e-8
    p = estimate_ewald_parameters(cell, 8, acc)
    sys = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}],
        cutoff=4.0,
        lr_cutoff=float(p.r_cutoff),
    )
    qp = np.zeros(sys.natoms, dtype=np.float32)
    qp[:8] = q
    e = _ewald_of_system(sys, qp, acc)[0]
    # E_cell = (1/2) * 8 ions * (-M ke / r0) = -4 M ke / r0, r0 = a/2
    ke = constants.Hartree * constants.Bohr
    madelung = -e * (a / 2.0) / (4.0 * ke)
    assert madelung == pytest.approx(1.7475645, abs=2e-4)


def test_charged_cell_finite(rng):
    """Non-neutral cells must give finite energies (background correction)."""
    coord = rng.uniform(0, 6, size=(4, 3)).astype(np.float32)
    q = np.array([1.0, 0.5, 0.25, 0.25], dtype=np.float32)
    cell = np.eye(3, dtype=np.float32) * 6.0
    sys = system_from_molecules(
        [{"coord": coord, "numbers": [6] * 4, "cell": cell}], cutoff=4.0, lr_cutoff=8.0
    )
    qp = np.zeros(sys.natoms, dtype=np.float32)
    qp[:4] = q
    e = _ewald_of_system(sys, qp)
    assert np.isfinite(e).all()


def test_dsf_vs_ewald_consistency(rng):
    """DSF approximates Ewald for a dense neutral system (loose tolerance;
    reference tests/test_pbc.py:287 analogue)."""
    n = 32
    a = 9.0
    coord = rng.uniform(0, a, size=(n, 3)).astype(np.float32)
    q = rng.normal(size=n).astype(np.float32) * 0.3
    q -= q.mean()
    cell = np.eye(3, dtype=np.float32) * a
    numbers = np.full(n, 6)

    dsf_rc = 12.0
    sys = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "cell": cell}],
        cutoff=4.5,
        lr_cutoff=dsf_rc,
    )
    qp = np.zeros(sys.natoms, dtype=np.float32)
    qp[:n] = q

    e_ewald = _ewald_of_system(
        system_from_molecules(
            [{"coord": coord, "numbers": numbers, "cell": cell}],
            cutoff=4.5,
            lr_cutoff=float(estimate_ewald_parameters(cell, n, 1e-7).r_cutoff),
        ),
        qp,
    )[0]

    data = {"charges": jnp.asarray(qp)}
    e_dsf = float(
        np.asarray(
            lrmod.coulomb_dsf(
                data, sys, rc=4.6, dsf_alpha=0.2, dsf_rc=dsf_rc, subtract_sr=False
            )
        )[0]
    )
    assert e_dsf == pytest.approx(e_ewald, abs=0.05 * max(1.0, abs(e_ewald)))


def test_ewald_translation_invariance(rng):
    n = 10
    a = 8.0
    coord = rng.uniform(0, a, size=(n, 3)).astype(np.float32)
    q = rng.normal(size=n).astype(np.float32)
    q -= q.mean()
    cell = np.eye(3, dtype=np.float32) * a
    numbers = np.full(n, 6)
    qp = np.zeros(n + 1, dtype=np.float32)
    qp[:n] = q

    def e_of(c):
        p = estimate_ewald_parameters(cell, n, 1e-7)
        sys = system_from_molecules(
            [{"coord": c, "numbers": numbers, "cell": cell}],
            cutoff=4.0,
            lr_cutoff=float(p.r_cutoff),
        )
        return _ewald_of_system(sys, qp)[0]

    e0 = e_of(coord)
    e1 = e_of(coord + np.array([1.3, -0.7, 2.1], dtype=np.float32))
    assert e1 == pytest.approx(e0, abs=5e-3)


def test_ewald_batched_heterogeneous_cells(rng):
    """Batched molecules with DIFFERENT cells: each molecule's Ewald energy
    must match its own single-molecule evaluation at the same accuracy.

    Exercises the per-molecule eta/k_cutoff machinery (shared integer k-grid
    masked at each molecule's own cutoff) — the reference estimates Ewald
    parameters per call from one cell (reference
    aimnet/calculators/calculator.py:1565-1603), which a batched evaluation
    must reproduce for EVERY cell, not just the first."""
    mols = []
    for n, a in ((8, 5.0), (16, 11.0)):  # dense small cell + sparse large cell
        coord = rng.uniform(0.5, a - 0.5, size=(n, 3)).astype(np.float32)
        q = rng.normal(size=n).astype(np.float32)
        q -= q.mean()
        mols.append(
            {
                "coord": coord,
                "numbers": np.full(n, 6),
                "cell": np.eye(3, dtype=np.float32) * a,
                "q": q,
            }
        )

    acc = 1e-7
    r_max = max(
        estimate_ewald_parameters(m["cell"], len(m["q"]), acc).r_cutoff
        for m in mols
    )

    # batched evaluation (one shared k-grid, per-molecule masks)
    batched = system_from_molecules(
        [{k: m[k] for k in ("coord", "numbers", "cell")} for m in mols],
        cutoff=4.0,
        lr_cutoff=float(r_max),
    )
    qp = np.zeros(batched.natoms, dtype=np.float32)
    off = 0
    for m in mols:
        qp[off : off + len(m["q"])] = m["q"]
        off += len(m["q"])
    e_batched = _ewald_of_system(batched, qp, acc)

    # per-molecule single evaluations, each with its own parameters
    for i, m in enumerate(mols):
        single = system_from_molecules(
            [{k: m[k] for k in ("coord", "numbers", "cell")}],
            cutoff=4.0,
            lr_cutoff=float(
                estimate_ewald_parameters(m["cell"], len(m["q"]), acc).r_cutoff
            ),
        )
        qs = np.zeros(single.natoms, dtype=np.float32)
        qs[: len(m["q"])] = m["q"]
        e_single = _ewald_of_system(single, qs, acc)[0]
        assert e_batched[i] == pytest.approx(e_single, rel=1e-5, abs=1e-5), i


def _calc_from_yaml(reference_aimnet2, yaml_name):
    from aimnetcentral_tpu.calculators import AIMNet2Calculator
    from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict

    model, cfg_yaml = reference_aimnet2(yaml_name)
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, aux = convert_state_dict(sd, cfg)
    return AIMNet2Calculator((params, cfg, aux))


def _crystal(rng, n, a):
    coord = rng.uniform(0.5, a - 0.5, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    return {
        "coord": coord,
        "numbers": numbers,
        "cell": np.eye(3, dtype=np.float32) * a,
        "charge": 0.0,
    }


@pytest.mark.slow
def test_batched_stress_matches_individual(reference_aimnet2, rng):
    """Two crystals with DIFFERENT cells evaluated as one batch: per-system
    stress must equal the individual evals (reference tests/test_pbc.py:586
    test_batched_stress_matches_individual / :692 different-cells case)."""
    calc = _calc_from_yaml(reference_aimnet2, "aimnet2.yaml")
    m1 = _crystal(rng, 10, 7.0)
    m2 = _crystal(rng, 14, 9.0)
    out = calc([m1, m2], forces=True, stress=True)
    assert out["stress"].shape == (2, 3, 3)
    for i, m in enumerate((m1, m2)):
        single = calc(m, forces=True, stress=True)
        np.testing.assert_allclose(
            out["energy"][i], single["energy"][0], atol=1e-4
        )
        np.testing.assert_allclose(
            out["stress"][i], single["stress"][0], atol=1e-5
        )


@pytest.mark.slow
def test_d3_stress_matches_fd(reference_aimnet2, rng):
    """Embedded-DFTD3 model: analytic stress (strain gradient through the
    D3 pair sweep) vs finite difference of the energy w.r.t. strain
    (reference tests/test_pbc.py:846)."""
    calc = _calc_from_yaml(reference_aimnet2, "aimnet2_dftd3_wb97m.yaml")
    mol = _crystal(rng, 10, 7.5)
    out = calc(mol, stress=True)
    stress = out["stress"][0]
    volume = 7.5**3

    def energy_at(de):
        s = np.eye(3) + de
        m2 = dict(mol, coord=mol["coord"] @ s, cell=mol["cell"] @ s)
        return float(calc(m2)["energy"][0])

    eps = 1e-4
    for a, b in [(0, 0), (2, 2), (0, 2)]:
        de = np.zeros((3, 3))
        de[a, b] = eps
        fd = (energy_at(de) - energy_at(-de)) / (2 * eps) / volume
        sym = 0.5 * (stress[a, b] + stress[b, a])
        np.testing.assert_allclose(sym, fd, atol=3e-5)


@pytest.mark.slow
def test_ewald_calculator_forces_match_fd(reference_aimnet2, rng):
    """Full-model forces under EWALD Coulomb vs central differences at the
    calculator surface (reference tests/test_pbc.py:1054 per-method FD)."""
    calc = _calc_from_yaml(reference_aimnet2, "aimnet2.yaml")
    calc.set_lrcoulomb_method("ewald")
    mol = _crystal(rng, 8, 7.0)
    out = calc(mol, forces=True)
    eps = 2e-3
    for atom, axis in [(0, 0), (3, 2)]:
        cp = mol["coord"].copy()
        cp[atom, axis] += eps
        ep = float(calc(dict(mol, coord=cp))["energy"][0])
        cp[atom, axis] -= 2 * eps
        em = float(calc(dict(mol, coord=cp))["energy"][0])
        fd = -(ep - em) / (2 * eps)
        np.testing.assert_allclose(out["forces"][atom, axis], fd, atol=2e-3)
