"""Config DSL: Jinja2 hyperparameter templating + nested-file expansion
(parity surface: reference aimnet/config.py:83-152, tests/test_config.py)."""

import pytest

from aimnetcentral_tpu.config import load_yaml


def test_templating_from_path(tmp_path):
    (tmp_path / "cfg.yaml").write_text(
        "lr: '{{ lr }}'\nhidden: [{{ width }}, {{ width }}]\nname: run-{{ tag }}\n"
    )
    cfg = load_yaml(str(tmp_path / "cfg.yaml"), {"lr": 1e-3, "width": 128, "tag": "a"})
    assert cfg["lr"] == "0.001"  # quoted template stays a string
    assert cfg["hidden"] == [128, 128]
    assert cfg["name"] == "run-a"


def test_templating_in_tree():
    cfg = load_yaml({"opt": {"lr": "{{ lr }}"}}, {"lr": 0.01})
    assert cfg["opt"]["lr"] == 0.01  # re-parsed to a float


def test_hyperpar_from_file(tmp_path):
    (tmp_path / "hp.yaml").write_text("width: 64\n")
    (tmp_path / "cfg.yaml").write_text("n: {{ width }}\n")
    cfg = load_yaml(str(tmp_path / "cfg.yaml"), str(tmp_path / "hp.yaml"))
    assert cfg["n"] == 64


def test_nested_file_expansion(tmp_path):
    (tmp_path / "model.yaml").write_text("class: aimnet.models.AIMNet2\nkwargs: {}\n")
    (tmp_path / "train.yaml").write_text("model: model.yaml\nepochs: 3\n")
    cfg = load_yaml(str(tmp_path / "train.yaml"))
    assert cfg["model"]["class"] == "aimnet.models.AIMNet2"
    assert cfg["epochs"] == 3


def test_file_references_can_be_disabled(tmp_path):
    (tmp_path / "train.yaml").write_text("model: model.yaml\n")
    cfg = load_yaml(str(tmp_path / "train.yaml"), allow_file_references=False)
    assert cfg["model"] == "model.yaml"  # left as a plain string


def test_missing_nested_file_raises(tmp_path):
    (tmp_path / "train.yaml").write_text("model: nope.yaml\n")
    with pytest.raises(FileNotFoundError):
        load_yaml(str(tmp_path / "train.yaml"))


def test_list_config_tree():
    cfg = load_yaml([{"a": "{{ x }}"}, "literal"], {"x": 7})
    assert cfg == [{"a": 7}, "literal"]


def test_input_tree_is_not_mutated():
    src = {"opt": {"lr": "{{ lr }}"}, "tags": ["{{ tag }}"]}
    out = load_yaml(src, {"lr": 0.01, "tag": "t"})
    assert src == {"opt": {"lr": "{{ lr }}"}, "tags": ["{{ tag }}"]}
    assert out["opt"]["lr"] == 0.01 and out["tags"] == ["t"]


def test_hyperpar_file_must_be_mapping(tmp_path):
    (tmp_path / "hp.yaml").write_text("- 1\n- 2\n")
    (tmp_path / "cfg.yaml").write_text("n: {{ width }}\n")
    with pytest.raises(TypeError, match="mapping"):
        load_yaml(str(tmp_path / "cfg.yaml"), str(tmp_path / "hp.yaml"))


def test_templated_scalars_reparse_to_native_types():
    cfg = load_yaml(
        {"i": "{{ n }}", "f": "{{ lr }}", "b": "{{ flag }}", "l": "[{{ n }}, {{ n }}]"},
        {"n": 3, "lr": 2.5e-4, "flag": True},
    )
    assert cfg["i"] == 3 and isinstance(cfg["i"], int)
    assert cfg["f"] == 2.5e-4 and isinstance(cfg["f"], float)
    assert cfg["b"] is True
    assert cfg["l"] == [3, 3]


def test_nested_include_sees_same_hyperpars(tmp_path):
    (tmp_path / "inner.yaml").write_text("width: {{ width }}\n")
    (tmp_path / "outer.yaml").write_text("model: inner.yaml\n")
    cfg = load_yaml(str(tmp_path / "outer.yaml"), {"width": 64})
    assert cfg["model"]["width"] == 64


def test_nested_include_relative_to_config_dir(tmp_path, monkeypatch):
    # include resolves against the CONFIG's directory, not the CWD
    sub = tmp_path / "configs"
    sub.mkdir()
    (sub / "inner.yaml").write_text("x: 1\n")
    (sub / "outer.yaml").write_text("inner: inner.yaml\n")
    monkeypatch.chdir(tmp_path)
    cfg = load_yaml(str(sub / "outer.yaml"))
    assert cfg["inner"] == {"x": 1}


def test_deep_nested_includes_chain(tmp_path):
    (tmp_path / "c.yaml").write_text("leaf: true\n")
    (tmp_path / "b.yaml").write_text("c: c.yaml\n")
    (tmp_path / "a.yaml").write_text("b: b.yaml\n")
    cfg = load_yaml(str(tmp_path / "a.yaml"))
    assert cfg["b"]["c"]["leaf"] is True


def test_jinja_conditionals_and_loops(tmp_path):
    (tmp_path / "cfg.yaml").write_text(
        "layers: [{% for i in range(n) %}{{ width }}, {% endfor %}]\n"
        "{% if use_d3 %}d3: {s8: 1.0}{% else %}d3: null{% endif %}\n"
    )
    cfg = load_yaml(str(tmp_path / "cfg.yaml"), {"n": 3, "width": 16, "use_d3": True})
    assert cfg["layers"] == [16, 16, 16]
    assert cfg["d3"] == {"s8": 1.0}
    cfg2 = load_yaml(str(tmp_path / "cfg.yaml"), {"n": 1, "width": 8, "use_d3": False})
    assert cfg2["layers"] == [8] and cfg2["d3"] is None
