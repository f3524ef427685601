"""Released-weights validation against the PyTorch reference on the
BASELINE geometries (BASELINE.json: force MAE < 1e-4 eV/A on taxol).

Marked ``weights``: requires downloading a registry artifact (network).
These tests auto-skip in zero-egress environments so the gate runs the
moment egress exists:  ``pytest -m weights``.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.weights

REF_EXAMPLES = "/root/reference/examples"
MODEL = "aimnet2-wb97m-d3_0"  # registry name (data/model_registry.yaml)


@pytest.fixture(scope="module")
def artifact_path():
    from aimnetcentral_tpu.calculators.registry import download_model

    try:
        return download_model(MODEL)
    except Exception as e:  # zero-egress or registry outage
        pytest.skip(f"released weights unavailable: {e}")


@pytest.fixture(scope="module")
def taxol():
    path = os.path.join(REF_EXAMPLES, "taxol.xyz")
    if not os.path.exists(path):
        pytest.skip("reference taxol.xyz not available")
    from aimnetcentral_tpu.io import read_xyz

    return read_xyz(path)


def test_released_force_mae_vs_torch_reference(artifact_path, taxol):
    """Our evaluation of a RELEASED artifact must match the torch reference
    on the same geometry to < 1e-4 eV/A force MAE (BASELINE.json gate)."""
    import torch

    from conftest import _install_reference_stubs

    from aimnetcentral_tpu.calculators import AIMNet2Calculator
    from aimnetcentral_tpu.models.loader import load_model

    coord, numbers = taxol

    loaded = load_model(artifact_path)
    calc = AIMNet2Calculator(loaded.as_calculator_model())
    ours = calc({"coord": coord, "numbers": numbers, "charge": 0.0}, forces=True)

    _install_reference_stubs()
    from aimnet.models.base import load_model as torch_load_model

    model, _meta = torch_load_model(artifact_path)
    model.eval()
    t_coord = torch.tensor(coord, dtype=torch.float32, requires_grad=True)
    data = {
        "coord": t_coord,
        "numbers": torch.tensor(numbers, dtype=torch.int64),
        "charge": torch.zeros(1),
        "mol_idx": torch.zeros(len(numbers), dtype=torch.int64),
    }
    out = model(data)
    (g,) = torch.autograd.grad(out["energy"].sum(), t_coord)
    ref_forces = -g.detach().numpy()

    mae = np.abs(ours["forces"] - ref_forces).mean()
    assert mae < 1e-4, f"force MAE vs torch reference: {mae:.2e} eV/A"
    np.testing.assert_allclose(
        float(ours["energy"][0]),
        float(out["energy"].sum()),
        atol=1e-3,
    )


def test_released_crystal_finite(artifact_path):
    """Periodic CIF crystal single point with the released model: finite
    energy/forces/stress through the Ewald + D3 + stress stack."""
    path = os.path.join(REF_EXAMPLES, "2019828.cif")
    if not os.path.exists(path):
        pytest.skip("reference 2019828.cif not available")
    from aimnetcentral_tpu.calculators import AIMNet2Calculator
    from aimnetcentral_tpu.io import read_cif
    from aimnetcentral_tpu.models.loader import load_model

    s = read_cif(path)
    loaded = load_model(artifact_path)
    calc = AIMNet2Calculator(loaded.as_calculator_model())
    out = calc(
        {"coord": s["coord"], "numbers": s["numbers"], "cell": s["cell"]},
        forces=True,
        stress=True,
    )
    assert np.isfinite(out["energy"]).all()
    assert np.isfinite(out["forces"]).all()
    assert np.isfinite(out["stress"]).all()
