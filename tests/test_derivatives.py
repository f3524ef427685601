"""Forces / stress / Hessian / HVP tests: parity vs torch autograd and
finite differences (reference test analogues: tests/test_calculator.py force
checks, test_pbc.py virial-vs-FD, test_hvp.py HVP==dense-Hessian)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.calculators.derivatives import (
    make_eval_fn,
    make_hvp_fn,
    real_atom_hessian,
)
from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict

from conftest import random_molecule


@pytest.fixture(scope="module")
def small_model(reference_aimnet2):
    model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, aux = convert_state_dict(sd, cfg)
    return model, cfg, params


@pytest.mark.slow
def test_forces_parity_vs_torch(small_model, rng):
    model, cfg, params = small_model
    coord, numbers = random_molecule(rng, 10)

    import torch

    t_coord = torch.tensor(coord, requires_grad=True).unsqueeze(0)
    data = {
        "coord": t_coord,
        "numbers": torch.tensor(numbers).unsqueeze(0),
        "charge": torch.zeros(1),
    }
    out = model(data)
    (g,) = torch.autograd.grad(out["energy"].sum(), t_coord)
    ref_forces = -g.squeeze(0).numpy()

    sys = system_from_molecules([{"coord": coord, "numbers": numbers}])
    fn = make_eval_fn(cfg, forces=True, sae_external=False)
    res = fn(params, sys)
    np.testing.assert_allclose(
        np.asarray(res["forces"])[:10], ref_forces, atol=5e-4
    )


@pytest.mark.slow
def test_forces_match_fd(small_model, rng):
    _, cfg, params = small_model
    coord, numbers = random_molecule(rng, 6)
    sys = system_from_molecules([{"coord": coord, "numbers": numbers}])
    fn = make_eval_fn(cfg, forces=True, sae_external=False)
    f = np.asarray(fn(params, sys)["forces"])

    e_fn = make_eval_fn(cfg, sae_external=False)
    eps = 1e-3
    for (i, d) in [(0, 0), (3, 1), (5, 2)]:
        cp = np.array(coord)
        cp[i, d] += eps
        ep = float(
            e_fn(params, system_from_molecules([{"coord": cp, "numbers": numbers}]))[
                "energy"
            ][0]
        )
        cp[i, d] -= 2 * eps
        em = float(
            e_fn(params, system_from_molecules([{"coord": cp, "numbers": numbers}]))[
                "energy"
            ][0]
        )
        fd = -(ep - em) / (2 * eps)
        assert f[i, d] == pytest.approx(fd, abs=2e-3)


@pytest.mark.slow
def test_hessian_symmetric_and_matches_hvp(small_model, rng):
    _, cfg, params = small_model
    coord, numbers = random_molecule(rng, 5)
    sys = system_from_molecules([{"coord": coord, "numbers": numbers}])

    fn = make_eval_fn(cfg, forces=True, hessian=True, sae_external=False)
    h = real_atom_hessian(np.asarray(fn(params, sys)["hessian"]), 5)
    hm = h.reshape(15, 15)
    np.testing.assert_allclose(hm, hm.T, atol=1e-4)

    hvp = make_hvp_fn(cfg, sae_external=False)
    v = np.zeros((sys.natoms, 3), dtype=np.float32)
    v[:5] = np.asarray(jax.random.normal(jax.random.key(1), (5, 3)))
    hv = np.asarray(hvp(params, sys, jnp.asarray(v)))[:5]
    np.testing.assert_allclose(
        hv.reshape(-1), hm @ v[:5].reshape(-1), atol=1e-3
    )


@pytest.mark.slow
def test_stress_matches_fd_strain(small_model, rng):
    """Stress from the strain gradient must match FD of energy w.r.t. strain
    (reference tests/test_pbc.py:187 analogue)."""
    _, cfg, params = small_model
    coord, numbers = random_molecule(rng, 8, spread=2.5)
    cell = np.eye(3, dtype=np.float32) * 8.0
    mol = {"coord": coord + 4.0, "numbers": numbers, "cell": cell}
    sys = system_from_molecules([mol], cutoff=5.0, lr_cutoff=9.0)

    fn = make_eval_fn(cfg, forces=True, stress=True, sae_external=False)
    res = fn(params, sys)
    stress = np.asarray(res["stress"])[0]
    volume = float(np.abs(np.linalg.det(cell)))

    e_fn = make_eval_fn(cfg, sae_external=False)

    def energy_at_strain(eps_mat):
        s = np.eye(3, dtype=np.float64) + eps_mat
        c2 = (coord + 4.0).astype(np.float64) @ s
        cell2 = cell.astype(np.float64) @ s
        sys2 = system_from_molecules(
            [{"coord": c2, "numbers": numbers, "cell": cell2}],
            cutoff=5.0,
            lr_cutoff=9.0,
        )
        return float(e_fn(params, sys2)["energy"][0])

    eps = 1e-4
    for a, b in [(0, 0), (1, 1), (0, 1)]:
        de = np.zeros((3, 3))
        de[a, b] = eps
        fd = (energy_at_strain(de) - energy_at_strain(-de)) / (2 * eps)
        assert stress[a, b] * volume == pytest.approx(fd, abs=5e-3), (a, b)
