"""Ctor-level external-LR overrides on the calculator facade.

``AIMNet2Calculator(needs_coulomb=..., needs_dispersion=...)`` — explicit
overrides beat artifact metadata, source metadata is never mutated, and
structurally invalid metadata cannot be bypassed by disabling the module
(reference aimnet/calculators/calculator.py:151-152,195-247 and the
override-policy cluster in reference tests/test_calculator.py:1959-2155).
"""

from __future__ import annotations

import copy

import jax
import numpy as np
import pytest

from aimnetcentral_tpu.calculators import AIMNet2Calculator
from aimnetcentral_tpu.models import AIMNet2Config, aimnet2_init
from aimnetcentral_tpu.models.heads import (
    AtomicShiftHead,
    AtomicSumHead,
    DFTD3Head,
    LRCoulombHead,
    OutputHead,
)
from aimnetcentral_tpu.models.modules import MLPSpec

from conftest import random_molecule


def _mol(rng, n):
    coord, numbers = random_molecule(rng, n)
    return {"coord": coord, "numbers": numbers}

D3_WB97M = {"s6": 1.0, "s8": 0.3908, "a1": 0.566, "a2": 3.128}


def _model(external_coulomb=False, external_d3=False):
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
    ]
    if external_coulomb:
        outputs.append(
            (
                "external_coulomb",
                LRCoulombHead(rc=4.6, method="simple", key_in="charges", key_out="energy"),
            )
        )
    if external_d3:
        outputs.append(
            ("external_dftd3", DFTD3Head(s8=0.3908, a1=0.566, a2=3.128))
        )
    cfg = AIMNet2Config(outputs=tuple(outputs))
    params = aimnet2_init(jax.random.key(0), cfg)
    return params, cfg


def _calc(metadata=None, external_coulomb=False, external_d3=False, **ctor_kw):
    params, cfg = _model(external_coulomb, external_d3)
    aux = {"sae": {}}
    if metadata is not None:
        aux["metadata"] = metadata
    return AIMNet2Calculator((params, cfg, aux), **ctor_kw)


def _head_names(calc):
    return {n for n, _ in calc.cfg.outputs}


# -- strip ---------------------------------------------------------------


def test_dispersion_false_strips_head_without_mutating_metadata(rng):
    metadata = {
        "needs_coulomb": False,
        "needs_dispersion": True,
        "coulomb_mode": "none",
        "d3_params": dict(D3_WB97M),
    }
    original = copy.deepcopy(metadata)
    calc = _calc(metadata, external_d3=True, needs_dispersion=False)
    assert "external_dftd3" not in _head_names(calc)
    # the artifact's own metadata stays intact on the calculator AND at the
    # source (reference test_calculator.py:1959-1981)
    assert calc.metadata["needs_dispersion"] is True
    assert calc.metadata["d3_params"] == D3_WB97M
    assert metadata == original
    # parity with a model that never had the head
    mol = _mol(rng, 8)
    e_stripped = float(calc.eval(mol)["energy"])
    e_plain = float(_calc(None).eval(mol)["energy"])
    assert abs(e_stripped - e_plain) < 1e-6


def test_sr_embedded_coulomb_can_be_disabled():
    metadata = {
        "format_version": 2,
        "cutoff": 5.0,
        "needs_coulomb": True,
        "needs_dispersion": False,
        "coulomb_mode": "sr_embedded",
        "coulomb_sr_rc": 4.6,
        "coulomb_sr_envelope": "exp",
        "has_embedded_lr": True,
    }
    calc = _calc(metadata, external_coulomb=True, needs_coulomb=False)
    assert "external_coulomb" not in _head_names(calc)
    assert calc.metadata["needs_coulomb"] is True


def test_disabling_dispersion_changes_energy(rng):
    metadata = {
        "needs_dispersion": True,
        "coulomb_mode": "none",
        "d3_params": dict(D3_WB97M),
    }
    mol = _mol(rng, 10)
    e_on = float(_calc(metadata, external_d3=True).eval(mol)["energy"])
    e_off = float(
        _calc(metadata, external_d3=True, needs_dispersion=False).eval(mol)["energy"]
    )
    assert abs(e_on - e_off) > 1e-8  # D3 contributes


# -- attach ---------------------------------------------------------------


def test_dispersion_true_attaches_head_from_metadata(rng):
    # raw model (no external head) + metadata carrying full d3 params
    metadata = {
        "needs_dispersion": False,
        "coulomb_mode": "none",
        "d3_params": dict(D3_WB97M),
    }
    calc = _calc(metadata, needs_dispersion=True)
    assert "external_dftd3" in _head_names(calc)
    # the attached head computes the same dispersion as a built-in one
    mol = _mol(rng, 10)
    e_attached = float(calc.eval(mol)["energy"])
    e_builtin = float(_calc(None, external_d3=True).eval(mol)["energy"])
    assert abs(e_attached - e_builtin) < 1e-6


def test_coulomb_true_attaches_with_defaults_on_null_metadata(rng):
    # reference test_calculator.py:2154 — null metadata + explicit
    # needs_coulomb=True attaches external Coulomb with defaults
    calc = _calc({}, needs_coulomb=True)
    assert "external_coulomb" in _head_names(calc)
    mol = _mol(rng, 8)
    e = calc.eval(mol)["energy"]
    assert np.isfinite(e).all()


# -- policy violations ----------------------------------------------------


def test_full_embedded_rejects_external_coulomb_override():
    metadata = {
        "format_version": 2,
        "cutoff": 5.0,
        "needs_coulomb": False,
        "needs_dispersion": False,
        "coulomb_mode": "full_embedded",
        "has_embedded_lr": True,
    }
    with pytest.raises(ValueError, match="full_embedded"):
        _calc(metadata, needs_coulomb=True)


def test_embedded_d3ts_rejects_external_dispersion_override():
    metadata = {
        "format_version": 2,
        "cutoff": 5.0,
        "needs_coulomb": False,
        "needs_dispersion": False,
        "coulomb_mode": "none",
        "d3_params": dict(D3_WB97M),
        "has_embedded_lr": True,
        "has_embedded_d3ts": True,
    }
    with pytest.raises(ValueError, match="D3TS"):
        _calc(metadata, needs_dispersion=True)


@pytest.mark.parametrize("needs_dispersion", [None, True])
def test_incomplete_d3_params_fail_when_dispersion_enabled(needs_dispersion):
    metadata = {
        "needs_coulomb": False,
        "needs_dispersion": True,
        "coulomb_mode": "none",
        "d3_params": {"s8": 1.0},
    }
    kw = {} if needs_dispersion is None else {"needs_dispersion": needs_dispersion}
    with pytest.raises(ValueError, match="d3_params"):
        _calc(metadata, **kw)


def test_incomplete_d3_params_can_be_disabled_without_mutation():
    metadata = {
        "needs_coulomb": False,
        "needs_dispersion": True,
        "coulomb_mode": "none",
        "d3_params": {"s8": 1.0},
    }
    original = copy.deepcopy(metadata)
    calc = _calc(metadata, needs_dispersion=False)
    assert "external_dftd3" not in _head_names(calc)
    assert calc.metadata["needs_dispersion"] is True
    assert metadata == original


def test_coulomb_override_cannot_bypass_structural_invalidity():
    # sr_embedded with a null SR cutoff is structurally broken — disabling
    # the external module must NOT mask it (reference
    # test_calculator.py:2054-2072)
    metadata = {
        "format_version": 2,
        "cutoff": 5.0,
        "needs_coulomb": True,
        "needs_dispersion": False,
        "coulomb_mode": "sr_embedded",
        "coulomb_sr_rc": None,
        "coulomb_sr_envelope": "exp",
        "has_embedded_lr": True,
    }
    with pytest.raises(ValueError, match="sr_embedded"):
        _calc(metadata, external_coulomb=True, needs_coulomb=False)


def test_partial_metadata_raw_module_still_supported(rng):
    calc = _calc({"needs_coulomb": False, "coulomb_mode": "none"})
    names = _head_names(calc)
    assert "external_coulomb" not in names and "external_dftd3" not in names
    assert np.isfinite(calc.eval(_mol(rng, 6))["energy"]).all()


def test_overrides_are_noops_when_matching_metadata(rng):
    metadata = {
        "needs_dispersion": True,
        "coulomb_mode": "none",
        "d3_params": dict(D3_WB97M),
    }
    mol = _mol(rng, 10)
    e_default = float(_calc(metadata, external_d3=True).eval(mol)["energy"])
    e_explicit = float(
        _calc(metadata, external_d3=True, needs_dispersion=True).eval(mol)["energy"]
    )
    assert e_default == e_explicit


# -- ensemble interaction ---------------------------------------------------


def test_ensemble_override_attaches_stacked_head(rng):
    """Ctor overrides work through EnsembleCalculator: an attached D3 head's
    constant tables are broadcast onto the ensemble axis so the member scan
    sees a uniform leading dim."""
    from aimnetcentral_tpu.calculators.ensemble import EnsembleCalculator

    metadata = {
        "needs_dispersion": False,
        "coulomb_mode": "none",
        "d3_params": dict(D3_WB97M),
    }
    members = []
    for seed in (0, 1):
        params, cfg = _model()
        params = jax.tree.map(lambda x: x, params)  # fresh pytree per member
        members.append((params, cfg, {"sae": {}, "metadata": metadata}))
    ens_on = EnsembleCalculator.from_members(members, needs_dispersion=True)
    assert "external_dftd3" in {n for n, _ in ens_on.cfg.outputs}
    mol = _mol(rng, 8)
    out = ens_on.eval(mol, forces=True)
    assert np.isfinite(out["energy"]).all() and np.isfinite(out["forces"]).all()
    assert "energy_std" in out
    # energy shifts vs the ensemble without dispersion
    ens_off = EnsembleCalculator.from_members(members)
    e_on = float(out["energy"][0])
    e_off = float(ens_off.eval(mol)["energy"][0])
    assert abs(e_on - e_off) > 1e-8


def test_ensemble_override_strips_head(rng):
    from aimnetcentral_tpu.calculators.ensemble import EnsembleCalculator

    metadata = {
        "needs_dispersion": True,
        "coulomb_mode": "none",
        "d3_params": dict(D3_WB97M),
    }
    members = []
    for seed in (0, 1):
        params, cfg = _model(external_d3=True)
        members.append((params, cfg, {"sae": {}, "metadata": metadata}))
    ens = EnsembleCalculator.from_members(members, needs_dispersion=False)
    assert "external_dftd3" not in {n for n, _ in ens.cfg.outputs}
    out = ens.eval(_mol(rng, 6))
    assert np.isfinite(out["energy"]).all()


# -- introspection properties (reference calculator.py:454-515) -----------


def test_introspection_properties_external_heads():
    calc = _calc({}, external_coulomb=True, external_d3=True)
    assert calc.has_external_coulomb and calc.has_external_dftd3
    assert calc.coulomb_method == "simple"
    assert calc.coulomb_cutoff == float("inf")
    assert calc.dftd3_cutoff == 15.0
    calc.set_lrcoulomb_method("dsf", dsf_rc=12.0)
    assert calc.coulomb_method == "dsf"
    assert calc.coulomb_cutoff == 12.0
    calc.set_dftd3_cutoff(12.5)
    assert calc.dftd3_cutoff == 12.5
    calc.set_lr_cutoff(10.0)  # unified LR override wins for both
    assert calc.coulomb_cutoff == 10.0
    assert calc.dftd3_cutoff == 10.0
    calc.set_lrcoulomb_method("ewald")
    assert calc.coulomb_cutoff is None  # estimated per call


def test_introspection_properties_absent_heads():
    calc = _calc({})
    assert not calc.has_external_coulomb
    assert not calc.has_external_dftd3
    assert calc.coulomb_method is None
    assert calc.coulomb_cutoff is None
    assert calc.dftd3_cutoff is None
