"""Golden-parity tests: the JAX model vs the PyTorch reference (CPU, random
weights converted through models/convert.py).  This validates every piece of
model math end-to-end — AEV, ConvSV, NSE, MLP passes, output heads, LR Coulomb,
DFT-D3 — without needing the (network-gated) released weights."""

import numpy as np
import pytest
import jax

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.models.aimnet2 import aimnet2_apply
from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict

from conftest import random_molecule

ENERGY_ATOL = 2e-4  # eV; f32 vs f32 cross-framework
CHARGE_ATOL = 1e-4


def _to_numpy_sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _run_reference(model, coord, numbers, charge=0.0, mult=None):
    import torch

    data = {
        "coord": torch.tensor(coord, dtype=torch.float32).unsqueeze(0),
        "numbers": torch.tensor(numbers, dtype=torch.int64).unsqueeze(0),
        "charge": torch.tensor([charge], dtype=torch.float32),
    }
    if mult is not None:
        data["mult"] = torch.tensor([mult], dtype=torch.float32)
    with torch.no_grad():
        out = model(data)
    return {
        "energy": out["energy"].detach().numpy().reshape(-1),
        "charges": out["charges"].detach().numpy().reshape(-1),
        "dipole": out.get("dipole", None),
    }


@pytest.mark.parametrize("yaml_name", ["aimnet2.yaml", "aimnet2_dftd3_wb97m.yaml"])
def test_single_molecule_parity(reference_aimnet2, rng, yaml_name):
    model, cfg_yaml = reference_aimnet2(yaml_name)
    # Route embedded DFTD3 through the reference's differentiable pure-torch
    # path (its default path is the unavailable CUDA kernel); that is the
    # exact formulation our JAX implementation mirrors.
    for m in model.outputs.children():
        if type(m).__name__ == "DFTD3":
            orig = m.forward
            m.forward = lambda data, _orig=orig: _orig(data, hessian=True)
    coord, numbers = random_molecule(rng, 12)

    ref = _run_reference(model, coord, numbers, charge=1.0)

    cfg = config_from_yaml(cfg_yaml)
    params, aux = convert_state_dict(_to_numpy_sd(model), cfg)
    sys = system_from_molecules([{"coord": coord, "numbers": numbers, "charge": 1.0}])
    out = aimnet2_apply(params, cfg, sys)

    np.testing.assert_allclose(
        np.asarray(out["energy"]), ref["energy"], atol=ENERGY_ATOL
    )
    np.testing.assert_allclose(
        np.asarray(out["charges"])[:12], ref["charges"], atol=CHARGE_ATOL
    )
    # charge conservation (NSE invariant; epsilon-regularized, so approximate)
    assert np.asarray(out["charges"])[:12].sum() == pytest.approx(1.0, abs=5e-3)


def test_batched_packing_parity(reference_aimnet2, rng):
    """Two molecules packed into one flat System must match two independent
    reference evaluations."""
    model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    cfg = config_from_yaml(cfg_yaml)
    params, _ = convert_state_dict(_to_numpy_sd(model), cfg)

    mols = []
    refs = []
    for n, q in [(9, 0.0), (14, -1.0)]:
        coord, numbers = random_molecule(rng, n)
        mols.append({"coord": coord, "numbers": numbers, "charge": q})
        refs.append(_run_reference(model, coord, numbers, charge=q))

    sys = system_from_molecules(mols)
    out = aimnet2_apply(params, cfg, sys)
    e = np.asarray(out["energy"])
    np.testing.assert_allclose(e[0], refs[0]["energy"][0], atol=ENERGY_ATOL)
    np.testing.assert_allclose(e[1], refs[1]["energy"][0], atol=ENERGY_ATOL)
    q = np.asarray(out["charges"])
    np.testing.assert_allclose(q[:9], refs[0]["charges"], atol=CHARGE_ATOL)
    np.testing.assert_allclose(q[9:23], refs[1]["charges"], atol=CHARGE_ATOL)


def test_nse_two_channel_parity(reference_aimnet2, rng):
    """NSE (open-shell, num_charge_channels=2) model parity incl. spin charges."""
    model, cfg_yaml = reference_aimnet2("aimnet2.yaml", num_charge_channels=2)
    cfg = config_from_yaml(cfg_yaml)
    assert cfg.num_charge_channels == 2
    params, _ = convert_state_dict(_to_numpy_sd(model), cfg)

    coord, numbers = random_molecule(rng, 11)
    ref = _run_reference(model, coord, numbers, charge=0.0, mult=2.0)

    sys = system_from_molecules(
        [{"coord": coord, "numbers": numbers, "charge": 0.0, "mult": 2.0}]
    )
    out = aimnet2_apply(params, cfg, sys)
    np.testing.assert_allclose(np.asarray(out["energy"]), ref["energy"], atol=ENERGY_ATOL)
    np.testing.assert_allclose(
        np.asarray(out["charges"])[:11], ref["charges"], atol=CHARGE_ATOL
    )
    assert "spin_charges" in out


def test_rxn_model_dipole_quadrupole_parity(reference_aimnet2, rng):
    model, cfg_yaml = reference_aimnet2("aimnet2_rxn.yaml")
    cfg = config_from_yaml(cfg_yaml)
    params, _ = convert_state_dict(_to_numpy_sd(model), cfg)

    coord, numbers = random_molecule(rng, 10)
    import torch

    data = {
        "coord": torch.tensor(coord).unsqueeze(0),
        "numbers": torch.tensor(numbers).unsqueeze(0),
        "charge": torch.zeros(1),
    }
    with torch.no_grad():
        ref = model(data)

    sys = system_from_molecules([{"coord": coord, "numbers": numbers}])
    out = aimnet2_apply(params, cfg, sys)
    np.testing.assert_allclose(
        np.asarray(out["energy"]), ref["energy"].numpy().reshape(-1), atol=ENERGY_ATOL
    )
    np.testing.assert_allclose(
        np.asarray(out["dipole"])[0], ref["dipole"].numpy().reshape(-1), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["quadrupole"])[0],
        ref["quadrupole"].numpy().reshape(-1),
        atol=1e-4,
    )


def test_dual_basis_rc_v_is_inert_parity(reference_aimnet2, rng):
    """A yaml with rc_v SET (dual-basis AEV) must convert and match the
    reference — because the reference's own forward never reads the `_v`
    basis (reference aimnet/modules/aev.py:94-110 builds vector features
    from the scalar basis; the registered rc_v/eta_v/shifts_v tensors are
    inert).  This is the evidence behind accepting rc_v in
    models/convert.py::config_from_yaml (VERDICT r2 item 9)."""
    model, cfg_yaml = reference_aimnet2(
        "aimnet2.yaml", aev={"rc_s": 5.0, "nshifts_s": 16, "rc_v": 4.0, "nshifts_v": 16}
    )
    import torch

    # the reference registered the dual basis (and it differs from _s)...
    aev_mod = model.aev
    assert float(aev_mod.rc_v) == 4.0 and float(aev_mod.rc_s) == 5.0
    assert aev_mod._dual_basis
    # ...but its forward output is identical to the single-basis model
    coord, numbers = random_molecule(rng, 12)
    ref = _run_reference(model, coord, numbers, charge=0.0)
    with torch.no_grad():
        aev_mod.rc_v.fill_(5.0)  # neutralize the dual basis entirely
        aev_mod.shifts_v.copy_(aev_mod.shifts_s)
    ref_single = _run_reference(model, coord, numbers, charge=0.0)
    np.testing.assert_array_equal(ref["energy"], ref_single["energy"])

    cfg = config_from_yaml(cfg_yaml)
    params, _ = convert_state_dict(_to_numpy_sd(model), cfg)
    sys = system_from_molecules([{"coord": coord, "numbers": numbers}])
    out = aimnet2_apply(params, cfg, sys)
    np.testing.assert_allclose(
        np.asarray(out["energy"]), ref["energy"], atol=ENERGY_ATOL
    )
    np.testing.assert_allclose(
        np.asarray(out["charges"])[:12], ref["charges"], atol=CHARGE_ATOL
    )

    # the one dual-basis knob with a real effect is rejected, mirroring the
    # reference's own shape failure (aev.py:188)
    with pytest.raises(ValueError, match="nshifts_v"):
        config_from_yaml(
            {
                "class": "aimnet.models.AIMNet2",
                "kwargs": {
                    **cfg_yaml["kwargs"],
                    "aev": {"rc_s": 5.0, "nshifts_s": 16, "nshifts_v": 8},
                },
            }
        )


def test_jit_matches_eager(reference_aimnet2, rng):
    model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    cfg = config_from_yaml(cfg_yaml)
    params, _ = convert_state_dict(_to_numpy_sd(model), cfg)
    coord, numbers = random_molecule(rng, 8)
    sys = system_from_molecules([{"coord": coord, "numbers": numbers}])

    eager = aimnet2_apply(params, cfg, sys)
    jitted = jax.jit(
        lambda p, s: aimnet2_apply(p, cfg, s)["energy"]
    )(params, sys)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager["energy"]), atol=1e-5)
