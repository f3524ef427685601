"""Cross-framework FORCE/STRESS parity on the BASELINE geometries.

This is the offline version of the BASELINE force gate (<1e-4 eV/A force MAE
vs the PyTorch reference): ONE synthetic v2 artifact at the full flagship
architecture (d2features, hidden ((512,380),(512,380),(512,380,380)),
externalized Coulomb + DFTD3 per metadata) is loaded by BOTH frameworks'
calculators and evaluated on taxol.xyz (gas phase, simple Coulomb) and the
2019828.cif allose crystal (periodic: DSF Coulomb auto-switch, D3, stress).

The reference side runs its own full AIMNet2Calculator
(reference aimnet/calculators/calculator.py:879) with deterministic=True so
DSF and D3 route through its differentiable pure-torch paths
(reference aimnet/calculators/calculator.py:964-1008); the neighbor-list seam
is a contract-faithful pure-torch stub (conftest._torch_neighbor_list_stub).
Gate values match the reference's own cross-version harness
(reference aimnet/validation/compare_observables.py:57 — max force diff
1e-4 Ha/A; we assert the stricter BASELINE.json 1e-4 eV/A as MAE and a
max-abs bound).
"""

import os

import numpy as np
import pytest

from conftest import _install_reference_stubs

REF_EXAMPLES = "/root/reference/examples"

# f32 forward cross-framework: forces/stress are differences of local terms
# and stay ~1e-6; total energy is ~8e4 eV with f32 pair-sum ordering noise
# ~|E|*5e-9, so the energy gate is relative, not the 1e-5 abs convention
# used for small random molecules (observed: 2e-6 gas, 4e-5 periodic).
FORCE_MAE_GATE = 1e-4  # eV/A (BASELINE.json)
FORCE_MAX_GATE = 2e-5  # eV/A (observed 1.6e-6; 10x margin)
STRESS_ATOL = 1e-6  # eV/A^3 (observed 4e-8)
ENERGY_RTOL = 5e-9


@pytest.fixture(scope="module")
def flagship_artifact(tmp_path_factory):
    """Flagship-architecture artifact built from the reference's OWN
    aimnet2_dftd3_wb97m.yaml config tree, exported through train/export.py
    (LR externalization + f64 SAE bake)."""
    import jax
    import yaml

    from aimnetcentral_tpu.models import aimnet2_init
    from aimnetcentral_tpu.models.convert import config_from_yaml
    from aimnetcentral_tpu.train.export import export_model

    with open("/root/reference/aimnet/models/aimnet2_dftd3_wb97m.yaml") as f:
        tree = yaml.safe_load(f)
    cfg = config_from_yaml(tree)
    assert cfg.hidden == ((512, 380), (512, 380), (512, 380, 380))
    assert cfg.d2features
    params = aimnet2_init(jax.random.key(0), cfg)
    sae = {1: -13.6, 6: -1029.5, 7: -1485.3, 8: -2042.6}
    path = str(tmp_path_factory.mktemp("flagship") / "flagship.pt")
    export_model(params, cfg, path, sae=sae, implemented_species=sorted(sae))
    return path


@pytest.fixture(scope="module")
def calcs(flagship_artifact):
    """(our calculator, reference calculator) over the SAME artifact."""
    from aimnetcentral_tpu.calculators import AIMNet2Calculator
    from aimnetcentral_tpu.models.loader import load_model

    loaded = load_model(flagship_artifact)
    ours = AIMNet2Calculator(loaded.as_calculator_model())

    _install_reference_stubs()
    from aimnet.calculators import AIMNet2Calculator as RefCalc

    ref = RefCalc(model=flagship_artifact, device="cpu", deterministic=True)
    assert ref.external_coulomb is not None and ref.external_dftd3 is not None
    return ours, ref


def _ref_eval(ref, data, **kw):
    out = ref(data, **kw)
    return {
        k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        for k, v in out.items()
    }


def test_taxol_gas_phase_force_parity(calcs):
    """BASELINE config 1: taxol single point, simple Coulomb + D3."""
    from aimnetcentral_tpu.io import read_xyz

    path = os.path.join(REF_EXAMPLES, "taxol.xyz")
    if not os.path.exists(path):
        pytest.skip("reference taxol.xyz not available")
    coord, numbers = read_xyz(path)
    ours, ref = calcs
    data = {"coord": coord, "numbers": numbers, "charge": 0.0}

    got = ours(data, forces=True)
    want = _ref_eval(ref, data, forces=True)

    f = np.asarray(got["forces"]).reshape(-1, 3)
    rf = want["forces"].reshape(-1, 3)
    mae = np.abs(f - rf).mean()
    assert mae < FORCE_MAE_GATE, f"force MAE {mae:.2e} eV/A"
    assert np.abs(f - rf).max() < FORCE_MAX_GATE
    e, re_ = float(np.asarray(got["energy"]).reshape(-1)[0]), float(want["energy"].reshape(-1)[0])
    assert abs(e - re_) < ENERGY_RTOL * abs(re_) + 1e-5
    np.testing.assert_allclose(
        np.asarray(got["charges"]).reshape(-1)[: len(numbers)],
        want["charges"].reshape(-1)[: len(numbers)],
        atol=1e-5,
    )


def test_allose_crystal_force_stress_parity(calcs):
    """BASELINE config 3: periodic 2019828.cif crystal — DSF Coulomb
    (per-eval simple->DSF auto-switch in BOTH frameworks), D3, stress."""
    from aimnetcentral_tpu.io import read_cif

    path = os.path.join(REF_EXAMPLES, "2019828.cif")
    if not os.path.exists(path):
        pytest.skip("reference 2019828.cif not available")
    s = read_cif(path)
    ours, ref = calcs
    data = {
        "coord": s["coord"],
        "numbers": s["numbers"],
        "charge": 0.0,
        "cell": s["cell"],
    }

    got = ours(data, forces=True, stress=True)
    want = _ref_eval(ref, data, forces=True, stress=True)

    f = np.asarray(got["forces"]).reshape(-1, 3)
    rf = want["forces"].reshape(-1, 3)
    mae = np.abs(f - rf).mean()
    assert mae < FORCE_MAE_GATE, f"force MAE {mae:.2e} eV/A"
    assert np.abs(f - rf).max() < FORCE_MAX_GATE

    st = np.asarray(got["stress"]).reshape(3, 3)
    rst = want["stress"].reshape(3, 3)
    np.testing.assert_allclose(st, rst, atol=STRESS_ATOL)

    e, re_ = float(np.asarray(got["energy"]).reshape(-1)[0]), float(want["energy"].reshape(-1)[0])
    assert abs(e - re_) < ENERGY_RTOL * abs(re_) + 1e-5
