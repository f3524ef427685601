"""Structure readers: XYZ + minimal CIF (symmetry expansion, dedup)."""

import os

import numpy as np
import pytest

from aimnetcentral_tpu.io import read_cif, read_xyz, cell_from_parameters, symbol_to_z

REF_EXAMPLES = "/root/reference/examples"


def test_symbols():
    assert symbol_to_z("C") == 6
    assert symbol_to_z("C1") == 6
    assert symbol_to_z("Cl") == 17
    assert symbol_to_z("O2-") == 8


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_EXAMPLES, "taxol.xyz")),
    reason="reference examples not mounted",
)
def test_read_taxol_xyz():
    coord, numbers = read_xyz(os.path.join(REF_EXAMPLES, "taxol.xyz"))
    assert coord.shape == (113, 3)
    assert numbers.shape == (113,)
    # taxol C47H51NO14
    assert (numbers == 6).sum() == 47
    assert (numbers == 1).sum() == 51
    assert (numbers == 7).sum() == 1
    assert (numbers == 8).sum() == 14


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_EXAMPLES, "2019828.cif")),
    reason="reference examples not mounted",
)
def test_read_allose_cif():
    """beta-D,L-allose crystal: P21/c, Z=4, C6H12O6 -> 96 atoms in P1."""
    s = read_cif(os.path.join(REF_EXAMPLES, "2019828.cif"))
    numbers, cell, frac = s["numbers"], s["cell"], s["frac"]
    assert len(numbers) == 96
    assert (numbers == 6).sum() == 24
    assert (numbers == 8).sum() == 24
    assert (numbers == 1).sum() == 48
    # published cell: a=4.98211 b=12.5624 c=11.8156, beta=91.1262, V=739.36
    vol = abs(np.linalg.det(cell))
    assert abs(vol - 739.36) < 0.05
    assert np.all(frac >= 0.0) and np.all(frac < 1.0)
    # no two atoms closer than a bonded H minimum under the periodic metric
    d = frac[:, None] - frac[None, :]
    d -= np.round(d)
    cart = d @ cell
    dist = np.linalg.norm(cart, axis=-1) + np.eye(len(frac)) * 10
    assert dist.min() > 0.8


def test_cell_from_parameters_orthorhombic():
    cell = cell_from_parameters(3.0, 4.0, 5.0, 90.0, 90.0, 90.0)
    np.testing.assert_allclose(cell, np.diag([3.0, 4.0, 5.0]), atol=1e-12)
