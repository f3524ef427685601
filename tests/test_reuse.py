"""Verlet-style prepared-system reuse in the calculator facade: repeated
evals with small displacements must reuse the neighbor structure AND stay
exactly correct (lists are built with +reuse_skin reach; every term masks at
its physical cutoff)."""

import numpy as np
import pytest

from aimnetcentral_tpu.calculators import AIMNet2Calculator
from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict

from conftest import random_molecule


@pytest.fixture(scope="module")
def model(reference_aimnet2):
    torch_model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params, aux = convert_state_dict(sd, cfg)
    return params, cfg, aux


def _periodic(rng, n=40, a=11.0):
    coord = rng.uniform(0.5, a - 0.5, size=(n, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=n)
    cell = np.eye(3, dtype=np.float32) * a
    return coord, numbers, cell


@pytest.mark.slow
def test_indexed_reuse_is_exact(model, rng):
    params, cfg, aux = model
    coord, numbers, cell = _periodic(rng)
    calc = AIMNet2Calculator((params, cfg, aux))
    fresh = AIMNet2Calculator((params, cfg, aux), reuse_skin=0.0)

    e0 = calc({"coord": coord, "numbers": numbers, "cell": cell})["energy"][0]
    assert calc._prep_cache is not None
    cached_sys = calc._prep_cache["system"]

    # small displacement: structure reused, energy matches a fresh build
    coord2 = coord + rng.normal(size=coord.shape).astype(np.float32) * 0.05
    out2 = calc({"coord": coord2, "numbers": numbers, "cell": cell}, forces=True)
    assert calc._prep_cache["system"] is cached_sys  # no rebuild happened
    ref2 = fresh({"coord": coord2, "numbers": numbers, "cell": cell}, forces=True)
    np.testing.assert_allclose(out2["energy"], ref2["energy"], atol=1e-6)
    np.testing.assert_allclose(out2["forces"], ref2["forces"], atol=1e-5)
    assert e0 != out2["energy"][0]

    # large displacement: rebuild, still exact
    coord3 = coord + rng.normal(size=coord.shape).astype(np.float32) * 1.0
    out3 = calc({"coord": coord3, "numbers": numbers, "cell": cell})
    ref3 = fresh({"coord": coord3, "numbers": numbers, "cell": cell})
    np.testing.assert_allclose(out3["energy"], ref3["energy"], atol=1e-6)


@pytest.mark.slow
def test_binned_reuse_is_exact_across_pbc_crossing(model, rng):
    """Binned-route reuse: an atom drifting across the box boundary keeps a
    continuous (cached-wrap) coordinate; results match a fresh build."""
    params, cfg, aux = model
    coord, numbers, cell = _periodic(rng, n=60, a=12.0)
    coord[0] = [0.05, 6.0, 6.0]  # next to the boundary
    calc = AIMNet2Calculator((params, cfg, aux), binned_threshold=30)
    fresh = AIMNet2Calculator((params, cfg, aux), binned_threshold=30, reuse_skin=0.0)

    out0 = calc({"coord": coord, "numbers": numbers, "cell": cell})
    assert calc._prep_cache is not None and calc._prep_cache["kind"] == "binned"
    cached_sys = calc._prep_cache["system"]

    coord2 = coord.copy()
    coord2[0, 0] -= 0.1  # crosses x = 0
    out2 = calc({"coord": coord2, "numbers": numbers, "cell": cell}, forces=True)
    assert calc._prep_cache["system"] is cached_sys
    ref2 = fresh({"coord": coord2, "numbers": numbers, "cell": cell}, forces=True)
    np.testing.assert_allclose(out2["energy"], ref2["energy"], atol=1e-5)
    np.testing.assert_allclose(out2["forces"], ref2["forces"], atol=1e-4)
    assert out0["energy"][0] != out2["energy"][0]


def test_reuse_invalidated_by_topology_change(model, rng):
    params, cfg, aux = model
    calc = AIMNet2Calculator((params, cfg, aux))
    c1, z1 = random_molecule(rng, 8)
    calc({"coord": c1, "numbers": z1})
    cached = calc._prep_cache["system"]
    # different charge -> rebuild
    calc({"coord": c1, "numbers": z1, "charge": 1.0})
    assert calc._prep_cache["system"] is not cached
