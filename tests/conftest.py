"""Test configuration: CPU backend with a virtual 8-device mesh, reference
import stubs for golden-parity tests against the PyTorch reference."""

import os
import sys
import types

# Force CPU for tests (the session env may preselect the TPU platform) and
# provide a virtual 8-device mesh for sharding tests.
os.environ["JAX_PLATFORMS"] = os.environ.get("AIMNET_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The session sitecustomize pins the axon TPU backend; override via config
# (env alone is not enough once the plugin is registered).
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
# full-f32 matmuls for golden-parity comparisons
jax.config.update("jax_default_matmul_precision", "highest")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"

import numpy as np
import pytest


def _install_reference_stubs():
    """Make the PyTorch reference importable on CPU without warp/nvalchemiops.

    We stub only the GPU-kernel seams; every pure-torch path in the reference
    stays genuine, which is exactly what the parity tests compare against.
    """
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    if "aimnet.kernels" not in sys.modules:
        kern = types.ModuleType("aimnet.kernels")
        kern.WARP_CUDA_AVAILABLE = False

        def conv_sv_2d_sp(*a, **k):
            raise RuntimeError("warp kernel unavailable in tests")

        kern.conv_sv_2d_sp = conv_sv_2d_sp
        kern.load_ops = lambda: None
        sys.modules["aimnet.kernels"] = kern

    if "nvalchemiops" not in sys.modules:
        def _unavailable(*a, **k):
            raise RuntimeError("nvalchemiops unavailable in tests")

        nv = types.ModuleType("nvalchemiops")
        nv_neighbors = types.ModuleType("nvalchemiops.neighbors")
        nv_neighbors.NeighborOverflowError = type(
            "NeighborOverflowError", (Exception,), {}
        )
        nv_torch = types.ModuleType("nvalchemiops.torch")
        nv_torch_nb = types.ModuleType("nvalchemiops.torch.neighbors")
        nv_torch_nb.neighbor_list = _unavailable
        nv_inter = types.ModuleType("nvalchemiops.torch.interactions")
        nv_disp = types.ModuleType("nvalchemiops.torch.interactions.dispersion")
        nv_disp.dftd3 = _unavailable
        nv_elec = types.ModuleType("nvalchemiops.torch.interactions.electrostatics")
        nv_elec.dsf_coulomb = _unavailable
        nv_elec.ewald_summation = _unavailable
        nv_elec.particle_mesh_ewald = _unavailable
        for name, mod in {
            "nvalchemiops": nv,
            "nvalchemiops.neighbors": nv_neighbors,
            "nvalchemiops.torch": nv_torch,
            "nvalchemiops.torch.neighbors": nv_torch_nb,
            "nvalchemiops.torch.interactions": nv_inter,
            "nvalchemiops.torch.interactions.dispersion": nv_disp,
            "nvalchemiops.torch.interactions.electrostatics": nv_elec,
        }.items():
            sys.modules[name] = mod


@pytest.fixture(scope="session")
def reference_aimnet2():
    """Factory building reference PyTorch AIMNet2 models from YAML configs."""
    _install_reference_stubs()
    import torch  # noqa: F401
    from aimnet.config import build_module, load_yaml

    def build(yaml_name="aimnet2.yaml", **overrides):
        cfg = load_yaml(os.path.join(REFERENCE_ROOT, "aimnet", "models", yaml_name))
        cfg = dict(cfg)
        if overrides:
            cfg.setdefault("kwargs", {}).update(overrides)
        torch.manual_seed(0)
        model = build_module(cfg)
        model.double()  # convert then compare in f64-vs-f32 to isolate layout bugs
        model.float()
        return model, cfg

    return build


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


def random_molecule(rng, n_atoms, species=(1, 6, 7, 8), spread=4.0, min_dist=0.75):
    """Random geometry with a minimum-distance pushapart (keeps 1/d terms sane)."""
    coord = rng.uniform(-spread, spread, size=(n_atoms, 3))
    for _ in range(200):
        d = np.linalg.norm(coord[:, None] - coord[None, :], axis=-1)
        np.fill_diagonal(d, 10.0)
        if d.min() > min_dist:
            break
        i, j = np.unravel_index(d.argmin(), d.shape)
        push = coord[i] - coord[j]
        nrm = np.linalg.norm(push) + 1e-9
        coord[i] += 0.5 * push / nrm * (min_dist - d.min() + 0.05)
        coord[j] -= 0.5 * push / nrm * (min_dist - d.min() + 0.05)
    numbers = rng.choice(species, size=n_atoms)
    return coord.astype(np.float32), numbers.astype(np.int64)
