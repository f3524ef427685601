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


def _torch_neighbor_list_stub(NeighborOverflowError):
    """Pure-torch implementation of the nvalchemiops ``neighbor_list`` contract
    (reference aimnet/calculators/neighbors.py:65-147 documents the surface:
    fixed-capacity (N, max_neighbors) matrix, fill_value padding, optional
    per-system cell/pbc/batch_idx, NeighborOverflowError on overflow).

    Having a REAL neighbor list lets the cross-framework parity tests drive
    the reference's full AIMNet2Calculator on CPU (deterministic=True routes
    DSF/D3 through its differentiable pure-torch paths), closing the
    force/stress parity loop offline.
    """
    import math

    import torch

    def neighbor_list(
        positions,
        cutoff,
        cell=None,
        pbc=None,
        batch_idx=None,
        max_neighbors=64,
        half_fill=False,
        fill_value=None,
        **_kwargs,
    ):
        assert not half_fill, "stub implements half_fill=False only"
        N = positions.shape[0]
        if fill_value is None:
            fill_value = N
        device = positions.device
        bidx = (
            torch.zeros(N, dtype=torch.long, device=device)
            if batch_idx is None
            else batch_idx.long()
        )
        nbmat = torch.full((N, max_neighbors), int(fill_value), dtype=torch.int32, device=device)
        counts = torch.zeros(N, dtype=torch.int32, device=device)

        if cell is None:
            d = torch.cdist(positions.double(), positions.double())
            conn = (d < cutoff) & (bidx.unsqueeze(1) == bidx.unsqueeze(0))
            conn &= ~torch.eye(N, dtype=torch.bool, device=device)
            c = conn.sum(1)
            if N and int(c.max()) > max_neighbors:
                raise NeighborOverflowError(
                    f"max_neighbors={max_neighbors} < {int(c.max())}"
                )
            ii, jj = conn.nonzero(as_tuple=True)
            rank = (torch.cumsum(conn.to(torch.int64), dim=1) - 1)[ii, jj]
            nbmat[ii, rank] = jj.to(torch.int32)
            counts = c.to(torch.int32)
            return nbmat, counts

        cell_b = cell if cell.ndim == 3 else cell.unsqueeze(0)
        B = cell_b.shape[0]
        if pbc is None:
            pbc_b = torch.ones((B, 3), dtype=torch.bool, device=device)
        else:
            pbc_b = torch.as_tensor(pbc, dtype=torch.bool, device=device).reshape(-1, 3)
            if pbc_b.shape[0] == 1 and B > 1:
                pbc_b = pbc_b.expand(B, -1)
        shifts_out = torch.zeros((N, max_neighbors, 3), dtype=positions.dtype, device=device)

        for b in range(B):
            sel = (bidx == b).nonzero(as_tuple=True)[0]
            n = sel.numel()
            if n == 0:
                continue
            pos = positions[sel].double()
            c3 = cell_b[b].double()
            inv = torch.linalg.inv(c3)
            # r = f @ cell  =>  f_k = r . inv(cell)[:, k]; plane spacing along
            # axis k is 1/||column k of inv(cell)||
            heights = 1.0 / torch.linalg.norm(inv, dim=0)
            nmax = [
                int(math.ceil(cutoff / float(heights[k]))) + 1 if bool(pbc_b[b, k]) else 0
                for k in range(3)
            ]
            axes = [torch.arange(-m, m + 1, device=device, dtype=torch.float64) for m in nmax]
            S = torch.cartesian_prod(*axes).reshape(-1, 3)  # (nS, 3)
            Scart = S @ c3  # (nS, 3)
            zero_s = int((S.abs().sum(-1) == 0).nonzero()[0, 0])
            # chunk over shifts to bound memory
            conn_rows = [[] for _ in range(n)]  # (j_global, shift_vec) per i
            for s0 in range(0, S.shape[0], 64):
                Sc = Scart[s0 : s0 + 64]
                disp = pos[None, :, None, :] + Sc[None, None, :, :] - pos[:, None, None, :]
                d = torch.linalg.vector_norm(disp, dim=-1)  # (n, n, ns)
                conn = d < cutoff
                if s0 <= zero_s < s0 + 64:
                    idx = zero_s - s0
                    conn[:, :, idx] &= ~torch.eye(n, dtype=torch.bool, device=device)
                ii, jj, ss = conn.nonzero(as_tuple=True)
                for a, j, s in zip(ii.tolist(), jj.tolist(), (ss + s0).tolist()):
                    conn_rows[a].append((int(sel[j]), s))
            cmax = max((len(r) for r in conn_rows), default=0)
            if cmax > max_neighbors:
                raise NeighborOverflowError(
                    f"max_neighbors={max_neighbors} < {cmax}"
                )
            for a, row in enumerate(conn_rows):
                gi = int(sel[a])
                counts[gi] = len(row)
                for k, (j, s) in enumerate(row):
                    nbmat[gi, k] = j
                    shifts_out[gi, k] = S[s].to(positions.dtype)
        return nbmat, counts, shifts_out

    return neighbor_list


def _install_reference_stubs():
    """Make the PyTorch reference importable on CPU without warp/nvalchemiops.

    We stub only the GPU-kernel seams; every pure-torch path in the reference
    stays genuine, which is exactly what the parity tests compare against.
    The neighbor_list stub is a REAL pure-torch implementation of the
    documented contract so the reference calculator runs end-to-end.
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
        nv_torch_nb.neighbor_list = _torch_neighbor_list_stub(
            nv_neighbors.NeighborOverflowError
        )
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
