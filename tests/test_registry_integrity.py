"""Registry data + resolution integrity (reference tests/
test_model_registry.py:43-659 — alias forms, sha256 hygiene, family
policies, ensemble ordering, cache-dir env).  Pure-Python: no jax, no
network."""

from __future__ import annotations

import os
import re

import pytest
import yaml

from aimnetcentral_tpu.calculators import registry as reg_mod
from aimnetcentral_tpu.calculators.registry import (
    available_models,
    cache_dir,
    ensemble_members,
    get_family_policy,
    resolve_name,
)

REFERENCE_REGISTRY = "/root/reference/aimnet/calculators/model_registry.yaml"


def _registry():
    with open(reg_mod._REGISTRY_FILE) as f:
        return yaml.safe_load(f)


def test_every_model_has_valid_sha256():
    reg = _registry()
    for name, entry in reg["models"].items():
        sha = entry.get("sha256")
        assert isinstance(sha, str) and re.fullmatch(r"[0-9a-f]{64}", sha), name


def test_every_model_has_url_and_file():
    for name, entry in _registry()["models"].items():
        assert entry.get("url", "").startswith("https://"), name
        assert entry.get("file"), name


def test_no_alias_to_alias_chains():
    reg = _registry()
    aliases = reg.get("aliases", {})
    for alias, target in aliases.items():
        assert target not in aliases, f"alias chain: {alias} -> {target}"
        assert target in reg["models"], f"dangling alias: {alias} -> {target}"


def test_every_model_family_is_declared():
    reg = _registry()
    families = set(reg.get("families", {}))
    for name, entry in reg["models"].items():
        assert entry.get("family") in families, name


def test_families_have_four_ensemble_members_in_order():
    reg = _registry()
    bases = {n.rpartition("_")[0] for n in reg["models"] if n.rpartition("_")[2].isdigit()}
    for base in bases:
        members = ensemble_members(f"{base}_0")
        assert members == [f"{base}_{i}" for i in range(len(members))]
        assert len(members) == 4, base


def test_default_alias_resolves_to_wb97m_member0():
    canonical, entry = resolve_name("aimnet2")
    assert canonical == "aimnet2-wb97m-d3_0"
    assert entry["family"] == "wb97m-d3"


@pytest.mark.parametrize(
    ("alias", "canonical"),
    [
        ("aimnet2-nse", "aimnet2-nse_0"),
        ("aimnet2nse", "aimnet2-nse_0"),
        ("aimnet2rxn", "aimnet2-rxn_0"),
        ("aimnet2_wb97m", "aimnet2-wb97m-d3_0"),
        ("aimnet2_b973c_d3_2", "aimnet2-b973c-d3_2"),
    ],
)
def test_short_and_legacy_alias_forms(alias, canonical):
    assert resolve_name(alias)[0] == canonical


def test_family_shorthand_resolves_to_member0():
    # bare family base name (no alias entry needed) -> member 0
    assert resolve_name("aimnet2-wb97m-d3")[0] == "aimnet2-wb97m-d3_0"


def test_resolve_canonical_is_identity():
    for name in _registry()["models"]:
        assert resolve_name(name)[0] == name


def test_unknown_name_raises_with_known_list():
    with pytest.raises(KeyError, match="not in registry"):
        resolve_name("aimnet3-unobtainium")


def test_ensemble_members_resolve_aliases():
    assert ensemble_members("aimnet2") == [f"aimnet2-wb97m-d3_{i}" for i in range(4)]


def test_cache_dir_respects_env(monkeypatch):
    monkeypatch.setenv("AIMNET_CACHE_DIR", "/tmp/aimnet-test-cache")
    assert cache_dir() == "/tmp/aimnet-test-cache"
    monkeypatch.delenv("AIMNET_CACHE_DIR")
    assert cache_dir() == os.path.join(os.path.expanduser("~"), ".cache", "aimnet")


def test_rxn_family_policy_pins_posthoc_wb97m_d3():
    pol = get_family_policy("rxn")
    assert pol.supports_charged_systems is False
    assert pol.posthoc_d3_params == {
        "s6": 1.0,
        "s8": 0.3908,
        "a1": 0.566,
        "a2": 3.128,
    }


def test_non_rxn_family_policies_are_permissive():
    for fam in ("wb97m-d3", "b973c-d3", "b973c-2025-d3", "nse", "pd"):
        pol = get_family_policy(fam)
        assert pol.supports_charged_systems is None
        assert pol.posthoc_d3_params is None


def test_unknown_family_returns_neutral_policy():
    pol = get_family_policy("mystery-family")
    assert pol.supports_charged_systems is None and pol.posthoc_d3_params is None
    assert get_family_policy(None) == pol


def test_available_models_lists_names_and_aliases():
    reg = _registry()
    names = available_models()
    assert "aimnet2" in names and "aimnet2-wb97m-d3_0" in names
    assert len(names) == len(set(names))
    assert set(names) == set(reg["models"]) | set(reg.get("aliases", {}))


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_REGISTRY), reason="reference checkout absent"
)
def test_registry_digests_match_reference():
    """Artifact identity parity: every (url, sha256) pair must equal the
    reference registry's — the data that MUST match
    (reference tests/test_model_registry.py:577-596)."""
    with open(REFERENCE_REGISTRY) as f:
        ref = yaml.safe_load(f)
    ours = _registry()["models"]
    ref_models = ref.get("models", ref)
    matched = 0
    for name, entry in ref_models.items():
        if not isinstance(entry, dict) or "sha256" not in entry:
            continue
        # the reference may use different canonical spellings — match by URL
        mine = [e for e in ours.values() if e["url"] == entry.get("url")]
        if mine:
            assert mine[0]["sha256"] == entry["sha256"], name
            matched += 1
    assert matched >= 20  # 6 families x 4 members
