"""Artifact trust boundary: import-policy modes + metadata validators
(parity surface: reference aimnet/models/artifact_validation.py)."""

import pytest

from aimnetcentral_tpu.models.validation import (
    DEFAULT_CLASS_IMPORT_PATHS,
    REGISTRY_IMPORT_POLICY,
    resolve_model_import_policy,
    validate_model_metadata,
    validate_model_yaml_tree,
    validate_runtime_model_metadata,
)


class TestImportPolicy:
    def test_default_allows_registry_classes(self):
        for path in DEFAULT_CLASS_IMPORT_PATHS:
            REGISTRY_IMPORT_POLICY.require_allowed(path, "class")

    def test_default_rejects_unknown(self):
        with pytest.raises(ValueError, match="Untrusted import path"):
            REGISTRY_IMPORT_POLICY.require_allowed("os.system", "class")
        with pytest.raises(ValueError, match="Untrusted import path"):
            REGISTRY_IMPORT_POLICY.require_allowed("torch.nn.SiLU", "activation")

    def test_extend_mode_adds_paths(self):
        p = resolve_model_import_policy(["mypkg.MyHead"], "extend")
        p.require_allowed("mypkg.MyHead", "class")
        p.require_allowed("aimnet.models.AIMNet2", "class")  # defaults kept

    def test_replace_mode_drops_defaults(self):
        p = resolve_model_import_policy(["mypkg.MyHead"], "replace")
        p.require_allowed("mypkg.MyHead", "class")
        with pytest.raises(ValueError):
            p.require_allowed("aimnet.models.AIMNet2", "class")

    def test_replace_requires_paths(self):
        with pytest.raises(ValueError):
            resolve_model_import_policy(None, "replace")
        with pytest.raises(ValueError):
            resolve_model_import_policy([], "replace")

    def test_unsafe_mode(self):
        p = resolve_model_import_policy(None, "unsafe")
        p.require_allowed("anything.at.all", "class")
        with pytest.raises(ValueError):
            resolve_model_import_policy(["x.y"], "unsafe")

    def test_invalid_mode(self):
        with pytest.raises(ValueError, match="model_import_mode"):
            resolve_model_import_policy(None, "yolo")

    @pytest.mark.parametrize(
        "bad",
        ["", " x.y", "x.y ", "x.*z", "x?y.z", "x[0].y", "single", "for.x", "1bad.y"],
    )
    def test_invalid_patterns(self, bad):
        with pytest.raises(ValueError):
            resolve_model_import_policy([bad], "extend")

    def test_namespace_pattern(self):
        p = resolve_model_import_policy(["mypkg.*"], "extend")
        p.require_allowed("mypkg.sub.Head", "class")
        with pytest.raises(ValueError):
            p.require_allowed("mypkg", "class")  # bare namespace never matches

    def test_yaml_walker_forbidden_kwargs(self):
        tree = {
            "class": "aimnet.models.AIMNet2",
            "kwargs": {
                "outputs": {
                    "d": {
                        "class": "aimnet.modules.lr.DispParam",
                        "kwargs": {"ptfile": "/etc/passwd"},
                    }
                }
            },
        }
        with pytest.raises(ValueError, match="ptfile"):
            validate_model_yaml_tree(tree, REGISTRY_IMPORT_POLICY)

    def test_yaml_walker_d3ts_damping(self):
        tree = {"class": "aimnet.modules.D3TS", "kwargs": {"a1": float("nan")}}
        with pytest.raises(ValueError, match="damping"):
            validate_model_yaml_tree(tree, REGISTRY_IMPORT_POLICY)

    def test_yaml_walker_untrusted_class(self):
        tree = {"class": "evil.Backdoor", "kwargs": {}}
        with pytest.raises(ValueError, match="Untrusted"):
            validate_model_yaml_tree(tree, REGISTRY_IMPORT_POLICY)

    def test_yaml_walker_activation(self):
        tree = {
            "class": "aimnet.modules.Output",
            "kwargs": {"mlp": {"activation_fn": "torch.nn.GELU"}},
        }
        validate_model_yaml_tree(tree, REGISTRY_IMPORT_POLICY)
        tree["kwargs"]["mlp"]["activation_fn"] = "pickle.loads"
        with pytest.raises(ValueError, match="Untrusted"):
            validate_model_yaml_tree(tree, REGISTRY_IMPORT_POLICY)


GOOD_META = {
    "format_version": 2,
    "cutoff": 5.0,
    "needs_coulomb": True,
    "needs_dispersion": True,
    "coulomb_mode": "sr_embedded",
    "coulomb_sr_rc": 4.6,
    "coulomb_sr_envelope": "exp",
    "d3_params": {"s8": 0.3908, "a1": 0.566, "a2": 3.128},
    "has_embedded_lr": True,
    "has_embedded_d3ts": False,
    "implemented_species": [1, 6, 7, 8],
    "family": "wb97m-d3",
}


class TestMetadataValidation:
    def test_canonical_accepts_good(self):
        validate_model_metadata(
            GOOD_META,
            require_cutoff=True,
            require_structural_consistency=True,
            require_cross_field_consistency=True,
        )

    @pytest.mark.parametrize(
        "patch,msg",
        [
            ({"cutoff": -1.0}, "cutoff"),
            ({"cutoff": True}, "cutoff"),
            ({"format_version": 3}, "format_version"),
            ({"needs_coulomb": "yes"}, "needs_coulomb"),
            ({"coulomb_mode": "bogus"}, "coulomb_mode"),
            ({"coulomb_sr_envelope": "gauss"}, "coulomb_sr_envelope"),
            ({"coulomb_sr_rc": 0.0}, "coulomb_sr_rc"),
            ({"d3_params": {"s8": float("inf"), "a1": 1, "a2": 1}}, "d3_params"),
            ({"implemented_species": [1, -6]}, "implemented_species"),
            ({"family": 7}, "family"),
        ],
    )
    def test_canonical_rejects_bad_fields(self, patch, msg):
        meta = {**GOOD_META, **patch}
        with pytest.raises(ValueError, match=msg):
            validate_model_metadata(
                meta,
                require_cutoff=True,
                require_structural_consistency=True,
                require_cross_field_consistency=True,
            )

    def test_structural_sr_embedded_needs_fields(self):
        meta = {**GOOD_META, "coulomb_sr_rc": None}
        with pytest.raises(ValueError, match="sr_embedded"):
            validate_model_metadata(meta, require_structural_consistency=True)

    def test_structural_sr_rc_beyond_cutoff(self):
        meta = {**GOOD_META, "coulomb_sr_rc": 6.0}
        with pytest.raises(ValueError, match="cannot exceed"):
            validate_model_metadata(meta, require_structural_consistency=True)

    def test_cross_field_needs_dispersion_requires_d3(self):
        meta = {**GOOD_META, "d3_params": None}
        with pytest.raises(ValueError, match="d3_params"):
            validate_model_metadata(meta, require_cross_field_consistency=True)

    def test_cross_field_full_embedded_no_external(self):
        meta = {
            **GOOD_META,
            "coulomb_mode": "full_embedded",
            "coulomb_sr_rc": None,
            "coulomb_sr_envelope": None,
        }
        with pytest.raises(ValueError, match="full_embedded"):
            validate_model_metadata(meta, require_cross_field_consistency=True)

    def test_runtime_validator(self):
        validate_runtime_model_metadata(
            GOOD_META, needs_coulomb=True, needs_dispersion=True
        )
        with pytest.raises(ValueError, match="full_embedded"):
            validate_runtime_model_metadata(
                {**GOOD_META, "coulomb_mode": "full_embedded"},
                needs_coulomb=True,
                needs_dispersion=False,
            )
        with pytest.raises(ValueError, match="d3_params"):
            validate_runtime_model_metadata(
                {**GOOD_META, "d3_params": None},
                needs_coulomb=True,
                needs_dispersion=True,
            )

    def test_legacy_v1_runtime_relaxed(self):
        # format_version 1 artifacts predate the schema: no cutoff requirement
        validate_runtime_model_metadata(
            {"format_version": 1}, needs_coulomb=False, needs_dispersion=False
        )


def test_loader_rejects_untrusted_artifact(tmp_path):
    """A v2 artifact naming a class outside the allowlist must not load."""
    import torch

    bad = {
        "format_version": 2,
        "cutoff": 5.0,
        "model_yaml": "class: evil.Backdoor\nkwargs: {}\n",
        "state_dict": {},
    }
    p = str(tmp_path / "bad.pt")
    torch.save(bad, p)
    from aimnetcentral_tpu.models.loader import load_v2_artifact

    with pytest.raises(ValueError, match="Untrusted"):
        load_v2_artifact(p)
    # unsafe mode accepts the path but still cannot CONSTRUCT unknown classes
    with pytest.raises(ValueError, match="unsupported model class"):
        load_v2_artifact(p, model_import_mode="unsafe")


def test_cyclic_yaml_alias_rejected():
    """PyYAML's safe loader constructs genuinely recursive containers
    (``a: &x [*x]``); the walker must reject them instead of crashing with
    RecursionError (reference tests/test_model_artifact_security.py:401)."""
    import yaml

    from aimnetcentral_tpu.models.validation import (
        REGISTRY_IMPORT_POLICY,
        validate_model_yaml_tree,
    )

    tree = yaml.safe_load("a: &x [*x]")
    assert tree["a"][0] is tree["a"]  # genuinely recursive
    with pytest.raises(ValueError, match="cyclic"):
        validate_model_yaml_tree(tree, REGISTRY_IMPORT_POLICY)


def test_shared_yaml_alias_is_allowed():
    """Non-cyclic SHARED aliases (a DAG) are legitimate yaml reuse and must
    still validate."""
    import yaml

    from aimnetcentral_tpu.models.validation import (
        REGISTRY_IMPORT_POLICY,
        validate_model_yaml_tree,
    )

    tree = yaml.safe_load("shared: &s {hidden: [16, 16]}\na: *s\nb: *s\n")
    assert tree["a"] is tree["b"]
    validate_model_yaml_tree(tree, REGISTRY_IMPORT_POLICY)


def test_convert_state_dict_missing_parameter_raises(reference_aimnet2):
    from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict

    model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sd.pop("conv_a.agh")
    with pytest.raises(ValueError, match="missing parameter 'conv_a.agh'"):
        convert_state_dict(sd, cfg)


def test_convert_state_dict_unexpected_parameter_warns(reference_aimnet2):
    import numpy as np

    from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict

    model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sd["totally.unknown.weight"] = np.zeros(3, np.float32)
    with pytest.warns(UserWarning, match="does not consume.*totally.unknown"):
        convert_state_dict(sd, cfg)
    # the inert dual-basis buffers stay silent
    sd.pop("totally.unknown.weight")
    sd["aev.rc_v"] = np.float32(5.0)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        convert_state_dict(sd, cfg)


def test_convert_state_dict_ignores_legacy_dipole_mass_buffers(reference_aimnet2):
    """Old artifacts can carry dipole/quadrupole mass buffers without those
    heads (reference aimnet/models/base.py:330-333, tests/test_model.py:27):
    expected leftovers, loaded silently."""
    import warnings as _w

    import numpy as np

    from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict

    model, cfg_yaml = reference_aimnet2("aimnet2.yaml")
    cfg = config_from_yaml(cfg_yaml)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sd["outputs.dipole.mass"] = np.zeros(87, np.float32)
    sd["outputs.quadrupole.mass"] = np.zeros(87, np.float32)
    with _w.catch_warnings():
        _w.simplefilter("error")
        convert_state_dict(sd, cfg)
