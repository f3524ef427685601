"""TorchSim adapter: fake-SimState integration (the reference tests the same
seam with a fake calculator, reference tests/test_torchsim.py:21)."""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from aimnetcentral_tpu.calculators.calculator import AIMNet2Calculator
from aimnetcentral_tpu.calculators.torchsim_adapter import AIMNet2TorchSim
from aimnetcentral_tpu.models import aimnet2_init
from aimnetcentral_tpu.models.aimnet2 import AEVConfig, AIMNet2Config
from aimnetcentral_tpu.models.heads import AtomicSumHead, OutputHead
from aimnetcentral_tpu.models.modules import MLPSpec


@dataclasses.dataclass
class FakeSimState:
    positions: "torch.Tensor"
    atomic_numbers: "torch.Tensor"
    system_idx: "torch.Tensor | None" = None
    cell: "torch.Tensor | None" = None
    pbc: bool = False
    extras: dict | None = None


@pytest.fixture(scope="module")
def calc():
    cfg = AIMNet2Config(
        aev=AEVConfig(rc_s=5.0, nshifts_s=8),
        nfeature=4,
        d2features=True,
        ncomb_v=4,
        hidden=((32,), (32,), (32,)),
        aim_size=32,
        outputs=(
            (
                "energy_mlp",
                OutputHead(n_in=32, n_out=1, key_in="aim", key_out="energy",
                           mlp=MLPSpec(hidden=(16,), last_linear=True)),
            ),
            ("atomic_sum", AtomicSumHead(key_in="energy", key_out="energy")),
        ),
    )
    params = aimnet2_init(jax.random.key(0), cfg)
    return AIMNet2Calculator((params, cfg, {"sae": {}}))


def test_single_system(calc):
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(5, 3)).astype(np.float32) * 2.0
    state = FakeSimState(
        positions=torch.tensor(pos),
        atomic_numbers=torch.tensor([6, 1, 1, 8, 1]),
    )
    model = AIMNet2TorchSim(calc)
    out = model(state)
    assert out["energy"].shape == (1,)
    assert out["forces"].shape == (5, 3)
    assert torch.isfinite(out["energy"]).all()
    assert torch.isfinite(out["forces"]).all()


@pytest.mark.slow
def test_multi_system_matches_separate_evals(calc):
    rng = np.random.default_rng(1)
    pos1 = rng.normal(size=(4, 3)).astype(np.float32) * 2.0
    pos2 = rng.normal(size=(6, 3)).astype(np.float32) * 2.0
    z1 = np.array([6, 1, 1, 1])
    z2 = np.array([8, 1, 6, 1, 1, 1])
    state = FakeSimState(
        positions=torch.tensor(np.concatenate([pos1, pos2])),
        atomic_numbers=torch.tensor(np.concatenate([z1, z2])),
        system_idx=torch.tensor([0] * 4 + [1] * 6),
    )
    out = AIMNet2TorchSim(calc)(state)
    assert out["energy"].shape == (2,)

    e1 = calc({"coord": pos1, "numbers": z1})["energy"][0]
    e2 = calc({"coord": pos2, "numbers": z2})["energy"][0]
    np.testing.assert_allclose(out["energy"].numpy(), [e1, e2], atol=1e-4)


def test_periodic_stress(calc):
    rng = np.random.default_rng(2)
    a = 8.0
    pos = rng.uniform(0, a, size=(8, 3)).astype(np.float32)
    # torch_sim convention: column-vector cells
    cell_col = torch.tensor((np.eye(3) * a).T.astype(np.float32))
    state = FakeSimState(
        positions=torch.tensor(pos),
        atomic_numbers=torch.tensor([6, 1, 1, 8, 1, 6, 1, 1]),
        cell=cell_col,
        pbc=True,
    )
    out = AIMNet2TorchSim(calc, compute_stress=True)(state)
    assert out["stress"].shape[-2:] == (3, 3)
    assert torch.isfinite(out["stress"]).all()


def test_stress_without_cell_raises(calc):
    state = FakeSimState(
        positions=torch.zeros(2, 3), atomic_numbers=torch.tensor([1, 1])
    )
    with pytest.raises(ValueError, match="cell"):
        AIMNet2TorchSim(calc, compute_stress=True)(state)


class _SpyCalc:
    def __init__(self):
        self.last = None

    def __call__(self, data, **kw):
        self.last = dict(data)
        n_sys = np.asarray(data["coord"]).shape[0]
        n = np.asarray(data["coord"]).shape[1]
        out = {"energy": np.zeros(n_sys), "forces": np.zeros((n_sys * n, 3))}
        if kw.get("stress"):
            out["stress"] = np.zeros((n_sys, 3, 3))
        return out


def test_extras_map_charge_and_mult():
    # (reference tests/test_torchsim.py:77-104)
    spy = _SpyCalc()
    adapter = AIMNet2TorchSim(spy)
    state = FakeSimState(
        positions=torch.zeros((4, 3)),
        atomic_numbers=torch.tensor([8, 1, 1, 1]),
        system_idx=torch.tensor([0, 0, 1, 1]),
        extras={"charge": [1.0, -1.0], "mult": [2.0, 1.0]},
    )
    adapter(state)
    np.testing.assert_array_equal(spy.last["charge"], [1.0, -1.0])
    np.testing.assert_array_equal(spy.last["mult"], [2.0, 1.0])


def test_spin_extra_falls_back_to_multiplicity():
    # MACE-style extras["spin"]; explicit "mult" wins when both are given
    # (reference tests/test_torchsim.py:105-120)
    spy = _SpyCalc()
    adapter = AIMNet2TorchSim(spy)
    state = FakeSimState(
        positions=torch.zeros((2, 3)),
        atomic_numbers=torch.tensor([8, 1]),
        extras={"spin": [3.0]},
    )
    adapter(state)
    np.testing.assert_array_equal(spy.last["mult"], [3.0])
    state2 = FakeSimState(
        positions=torch.zeros((2, 3)),
        atomic_numbers=torch.tensor([8, 1]),
        extras={"spin": [3.0], "mult": [2.0]},
    )
    adapter(state2)
    np.testing.assert_array_equal(spy.last["mult"], [2.0])


def test_extras_shape_validation():
    # per-system extras must match the system count
    # (reference tests/test_torchsim.py:164-173)
    adapter = AIMNet2TorchSim(_SpyCalc())
    state = FakeSimState(
        positions=torch.zeros((4, 3)),
        atomic_numbers=torch.tensor([8, 1, 1, 1]),
        system_idx=torch.tensor([0, 0, 1, 1]),
        extras={"charge": [1.0, 0.0, -1.0]},  # 3 charges, 2 systems
    )
    with pytest.raises(ValueError, match="2 systems"):
        adapter(state)


def test_outputs_are_detached_torch_tensors(calc):
    # the simulation loop must never backprop into our graph
    # (reference tests/test_torchsim.py:60-76)
    adapter = AIMNet2TorchSim(calc)
    state = FakeSimState(
        positions=torch.tensor(
            [[0.0, 0.0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]]
        ),
        atomic_numbers=torch.tensor([8, 1, 1]),
    )
    out = adapter(state)
    assert isinstance(out["energy"], torch.Tensor)
    assert not out["energy"].requires_grad
    assert not out["forces"].requires_grad
    assert torch.isfinite(out["forces"]).all()
