"""TorchSim model-interface adapter (reference aimnet/calculators/
aimnet2torchsim.py:41-175), import-gated on ``torch_sim``.

Maps a TorchSim ``SimState`` (positions/cell/atomic_numbers/system_idx,
torch tensors) onto this framework's calculator: multi-system states become
one packed flat batch (``system_idx`` -> ``mol_idx``), per-system
charge/mult ride in ``extras``, stress requires a periodic cell.
"""

from __future__ import annotations

import numpy as np

try:
    import torch_sim  # noqa: F401

    TORCHSIM_AVAILABLE = True
except ImportError:  # pragma: no cover
    TORCHSIM_AVAILABLE = False


class AIMNet2TorchSim:
    """Duck-typed on the SimState attribute surface (positions, cell, pbc,
    atomic_numbers, system_idx, extras) — torch_sim itself is only needed by
    the surrounding simulation loop, so construction works without it (the
    reference tests the same seam with a fake state,
    reference tests/test_torchsim.py:21)."""

    def __init__(self, base_calc, compute_stress: bool = False):
        self.base_calc = base_calc
        self.compute_stress = compute_stress

    @staticmethod
    def _state_to_data(state) -> dict:
        import torch

        pos = state.positions.detach().cpu().numpy().astype(np.float32)
        numbers = state.atomic_numbers.detach().cpu().numpy()
        sys_idx = (
            state.system_idx.detach().cpu().numpy()
            if getattr(state, "system_idx", None) is not None
            else np.zeros(len(numbers), dtype=np.int64)
        )
        n_sys = int(sys_idx.max()) + 1 if len(sys_idx) else 1
        coords, zss = [], []
        for b in range(n_sys):
            sel = sys_idx == b
            coords.append(pos[sel])
            zss.append(numbers[sel])
        nmax = max(len(z) for z in zss)
        coord = np.zeros((n_sys, nmax, 3), dtype=np.float32)
        zs = np.zeros((n_sys, nmax), dtype=np.int64)
        for b in range(n_sys):
            coord[b, : len(zss[b])] = coords[b]
            zs[b, : len(zss[b])] = zss[b]
        data = {"coord": coord, "numbers": zs}
        cell = getattr(state, "cell", None)
        if cell is not None and getattr(state, "pbc", None) is not None:
            pbc = state.pbc
            if (hasattr(pbc, "any") and pbc.any()) or pbc is True:
                c = cell.detach().cpu().numpy().astype(np.float32)
                # torch_sim cells are column-vector convention; ours row-vector
                data["cell"] = np.swapaxes(c, -1, -2) if c.ndim == 3 else c.T
        extras = getattr(state, "extras", None) or {}
        if "charge" in extras:
            charge = np.asarray(extras["charge"], dtype=np.float32).reshape(-1)
            if charge.shape[0] != n_sys:
                raise ValueError(
                    f"extras['charge'] has {charge.shape[0]} entries for "
                    f"{n_sys} systems"
                )
            data["charge"] = charge
        # both "mult" (AIMNet2 style) and "spin" (MACE style) name the
        # multiplicity; mult wins when both are present
        # (reference aimnet/calculators/aimnet2torchsim.py:146-160)
        mult = extras.get("mult", extras.get("spin"))
        if mult is not None:
            mult = np.asarray(mult, dtype=np.float32).reshape(-1)
            if mult.shape[0] != n_sys:
                raise ValueError(
                    f"extras['mult'] has {mult.shape[0]} entries for "
                    f"{n_sys} systems"
                )
            data["mult"] = mult
        return data

    def __call__(self, state) -> dict:
        import torch

        data = self._state_to_data(state)
        if self.compute_stress and "cell" not in data:
            raise ValueError("stress requires a periodic cell")
        out = self.base_calc(data, forces=True, stress=self.compute_stress)
        res = {
            "energy": torch.tensor(out["energy"]),
            "forces": torch.tensor(np.asarray(out["forces"], dtype=np.float64)),
        }
        if "stress" in out:
            s = np.asarray(out["stress"], dtype=np.float64)
            res["stress"] = torch.tensor(np.swapaxes(s, -1, -2))
        return res
