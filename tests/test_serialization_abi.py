"""Serialization-ABI freeze tests (reference tests/test_serialization_abi.py
:170-219 analogue): the class paths a v2 artifact's model_yaml may name are
a wire contract with every released artifact — renaming a head builder or
changing a constructor default silently breaks artifact loading, so this
file pins them."""

import dataclasses

import pytest

from aimnetcentral_tpu.models.convert import head_from_config, register_head_builder
from aimnetcentral_tpu.models.validation import DEFAULT_CLASS_IMPORT_PATHS

# Every class path the reference ecosystem may serialize, frozen.
FROZEN_HEAD_PATHS = [
    "aimnet.modules.Output",
    "aimnet.modules.AtomicShift",
    "aimnet.modules.AtomicSum",
    "aimnet.modules.LRCoulomb",
    "aimnet.modules.SRCoulomb",
    "aimnet.modules.DFTD3",
    "aimnet.modules.D3TS",
    "aimnet.modules.lr.D3TS",
    "aimnet.modules.lr.DispParam",
    "aimnet.modules.Dipole",
    "aimnet.modules.Quadrupole",
    "aimnet.modules.SRRep",
]

_MINIMAL_KWARGS = {
    "Output": {
        "n_in": 8, "n_out": 1, "key_in": "aim", "key_out": "energy",
        "mlp": {"hidden": [4]},
    },
    "AtomicShift": {"key_in": "energy", "key_out": "energy"},
    "AtomicSum": {"key_in": "energy", "key_out": "energy"},
    "DFTD3": {"s8": 0.4, "a1": 0.5, "a2": 3.1},
    "D3TS": {"s8": 0.4, "a1": 0.5, "a2": 3.1},
}


@pytest.mark.parametrize("path", FROZEN_HEAD_PATHS)
def test_frozen_head_paths_keep_resolving(path):
    kw = _MINIMAL_KWARGS.get(path.rsplit(".", 1)[-1], {})
    head = head_from_config(path, kw)
    assert dataclasses.is_dataclass(head)


def test_unknown_head_path_is_a_clear_error():
    with pytest.raises(ValueError, match="head"):
        head_from_config("aimnet.modules.DoesNotExist", {})


def test_frozen_constructor_defaults():
    """Defaults released artifacts rely on when their yaml omits kwargs."""
    lr = head_from_config("aimnet.modules.LRCoulomb", {})
    assert (lr.method, lr.rc, lr.dsf_alpha, lr.dsf_rc, lr.subtract_sr) == (
        "simple", 4.6, 0.2, 15.0, True,
    )
    d3 = head_from_config("aimnet.modules.DFTD3", {"s8": 1.0, "a1": 0.1, "a2": 3.0})
    assert (d3.s6, d3.cutoff, d3.smoothing_fraction) == (1.0, 15.0, 0.2)
    sr = head_from_config("aimnet.modules.SRCoulomb", {})
    assert (sr.rc, sr.envelope) == (4.6, "exp")


def test_allowlist_and_builders_are_consistent():
    """Every allowlisted HEAD path must construct (an allowlisted class that
    can't build would pass validation then fail conversion)."""
    model_classes = {"aimnet.models.AIMNet2", "aimnet.models.aimnet2.AIMNet2"}
    for path in sorted(DEFAULT_CLASS_IMPORT_PATHS - model_classes):
        kw = _MINIMAL_KWARGS.get(path.rsplit(".", 1)[-1], {})
        head_from_config(path, kw)


def test_register_head_builder_extends_and_rejects_collisions():
    class _Fake:
        pass

    register_head_builder("MyCustomHead", lambda kw: _Fake())
    try:
        assert isinstance(
            head_from_config("thirdparty.heads.MyCustomHead", {}), _Fake
        )
        with pytest.raises(ValueError, match="already registered"):
            register_head_builder("MyCustomHead", lambda kw: _Fake())
    finally:
        from aimnetcentral_tpu.models.convert import _HEAD_BUILDERS

        _HEAD_BUILDERS.pop("MyCustomHead", None)


def test_default_allowlists_are_frozen_and_shared():
    """The default import allowlists are immutable frozensets and the
    registry policy aliases them (no copy that could drift) — reference
    tests/test_serialization_abi.py:195-250."""
    from aimnetcentral_tpu.models import validation as v

    assert isinstance(v.DEFAULT_CLASS_IMPORT_PATHS, frozenset)
    assert isinstance(v.DEFAULT_ACTIVATION_IMPORT_PATHS, frozenset)
    assert isinstance(v.FORBIDDEN_CONSTRUCTOR_KEYS, frozenset)
    assert v.REGISTRY_IMPORT_POLICY.class_paths == v.DEFAULT_CLASS_IMPORT_PATHS
    assert not v.REGISTRY_IMPORT_POLICY.unsafe


def test_frozen_allowlist_covers_shipped_reference_yamls():
    """Every class path in the reference's SHIPPED model yamls must be
    loadable under the frozen default policy (reference
    tests/test_serialization_abi.py:185-193) — otherwise released
    artifacts built from those yamls would fail validation."""
    import glob

    import yaml as _yaml

    from aimnetcentral_tpu.models import validation as v

    yamls = glob.glob("/root/reference/aimnet/models/*.yaml")
    if not yamls:
        import pytest

        pytest.skip("reference checkout absent")
    paths = set()

    def walk(node):
        if isinstance(node, dict):
            for k, val in node.items():
                if k == "class" and isinstance(val, str):
                    paths.add(val)
                walk(val)
        elif isinstance(node, list):
            for x in node:
                walk(x)

    for f in yamls:
        with open(f) as fh:
            walk(_yaml.safe_load(fh))
    assert paths, "expected class paths in the shipped yamls"
    allowed = v.DEFAULT_CLASS_IMPORT_PATHS | v.DEFAULT_ACTIVATION_IMPORT_PATHS
    # embedded-LR heads are stripped at export — allow those too
    allowed = allowed | v.LEGACY_JPT_CLASS_IMPORT_PATHS
    missing = {p for p in paths if p not in allowed}
    assert not missing, f"shipped yaml classes missing from allowlist: {missing}"


def test_registry_policy_rejects_mutation_attempts():
    from aimnetcentral_tpu.models import validation as v

    import dataclasses
    import pytest

    with pytest.raises(dataclasses.FrozenInstanceError):
        v.REGISTRY_IMPORT_POLICY.unsafe = True
