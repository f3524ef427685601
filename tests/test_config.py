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
