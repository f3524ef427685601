"""Model artifact loading: v2 ``.pt`` files, legacy ``.jpt`` TorchScript,
registry names, HF repos — all converted to (params, cfg, aux, metadata).

Parity surface (reference aimnet/models/base.py:116-211 + aimnet/calculators/
resolve.py):

- v2 ``.pt``: restricted ``torch.load(weights_only=True)``; the embedded
  ``model_yaml`` passes through a strict allowlist (only known head/model
  classes instantiate — the reference's import-policy trust boundary,
  reference aimnet/models/artifact_validation.py:46-107, is structural here:
  our config parser cannot construct anything outside its registry, and
  forbidden constructor kwargs like ``ptfile`` are rejected).
- metadata drives external long-range attachment: ``needs_coulomb`` /
  ``needs_dispersion`` append LRCoulomb / DFTD3 heads AFTER the model's own
  output chain (the reference runs external modules post-model and merges
  derivative terms; with everything differentiable these are just heads).
- SAE float64 tables are extracted for exact host-side application.
"""

from __future__ import annotations

import dataclasses
import io
import os
from typing import Any, Literal, Mapping, NamedTuple

import numpy as np
import yaml

from aimnetcentral_tpu.models.aimnet2 import AIMNet2Config
from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict
from aimnetcentral_tpu.models.heads import DFTD3Head, LRCoulombHead
from aimnetcentral_tpu.models.modules import MLPSpec

FORBIDDEN_KWARGS = ("ptfile",)


class LoadedModel(NamedTuple):
    params: dict
    cfg: AIMNet2Config
    aux: dict
    metadata: dict

    def as_calculator_model(self) -> tuple:
        return (self.params, self.cfg, self.aux)


def _validate_model_yaml(tree: Any) -> None:
    """Reject forbidden constructor kwargs anywhere in the config tree
    (reference aimnet/models/artifact_validation.py:100-107)."""
    if isinstance(tree, Mapping):
        if "class" in tree:
            kw = tree.get("kwargs", {}) or {}
            for bad in FORBIDDEN_KWARGS:
                if bad in kw:
                    raise ValueError(
                        f"forbidden constructor kwarg {bad!r} in model yaml "
                        f"(class {tree['class']!r})"
                    )
        for v in tree.values():
            _validate_model_yaml(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            _validate_model_yaml(v)


def _metadata_from_artifact(data: Mapping[str, Any]) -> dict:
    """(reference aimnet/models/base.py:175-189)"""
    return {
        "format_version": data.get("format_version", 2),
        "cutoff": float(data["cutoff"]),
        "needs_coulomb": bool(data.get("needs_coulomb", False)),
        "needs_dispersion": bool(data.get("needs_dispersion", False)),
        "coulomb_mode": data.get("coulomb_mode", "none"),
        "coulomb_sr_rc": data.get("coulomb_sr_rc"),
        "coulomb_sr_envelope": data.get("coulomb_sr_envelope"),
        "d3_params": data.get("d3_params"),
        "has_embedded_lr": bool(data.get("has_embedded_lr", False)),
        "has_embedded_d3ts": bool(data.get("has_embedded_d3ts", False)),
        "implemented_species": list(data.get("implemented_species", [])),
        "family": data.get("family"),
        "supports_charged_systems": data.get("supports_charged_systems"),
    }


def apply_family_defaults(
    metadata: Mapping[str, Any], registry_family: str | None = None
) -> dict:
    """Reconcile artifact metadata with the registry family policy
    (reference aimnet/calculators/resolve.py:36-66): rxn models must refuse
    net-charged systems; D3-posthoc families get dispersion params attached
    when the artifact doesn't embed D3TS."""
    from aimnetcentral_tpu.calculators.registry import get_family_policy

    metadata = dict(metadata)
    if registry_family is not None:
        fam = metadata.get("family")
        if fam is None:
            metadata["family"] = registry_family
        elif fam != registry_family:
            raise ValueError(
                f"Registry family {registry_family!r} does not match model "
                f"metadata family {fam!r}. Refusing to load ambiguous energy scale."
            )
    policy = get_family_policy(metadata.get("family"))
    if policy.supports_charged_systems is not None:
        declared = metadata.get("supports_charged_systems")
        if declared is None:
            metadata["supports_charged_systems"] = policy.supports_charged_systems
        elif bool(declared) is not policy.supports_charged_systems:
            raise ValueError(
                f"{metadata.get('family')} models must declare "
                f"supports_charged_systems={policy.supports_charged_systems}."
            )
    if policy.posthoc_d3_params is not None and not metadata.get(
        "has_embedded_d3ts", False
    ):
        metadata["needs_dispersion"] = True
        if metadata.get("d3_params") is None:
            metadata["d3_params"] = dict(policy.posthoc_d3_params)
    return metadata


def attach_external_lr(cfg: AIMNet2Config, metadata: Mapping[str, Any]) -> AIMNet2Config:
    """Append external Coulomb / D3 heads per artifact metadata
    (reference aimnet/calculators/calculator.py:214-247)."""
    outputs = list(cfg.outputs)
    if metadata.get("needs_coulomb"):
        rc = metadata.get("coulomb_sr_rc") or 4.6
        envelope = metadata.get("coulomb_sr_envelope") or "exp"
        # model already subtracted its embedded SR part when sr_embedded
        subtract_sr = metadata.get("coulomb_mode") != "sr_embedded"
        outputs.append(
            (
                "external_coulomb",
                LRCoulombHead(
                    rc=float(rc),
                    method="simple",
                    envelope=envelope,
                    subtract_sr=subtract_sr,
                    key_in="charges",
                    key_out="energy",
                ),
            )
        )
    if metadata.get("needs_dispersion") and metadata.get("d3_params"):
        p = metadata["d3_params"]
        outputs.append(
            (
                "external_dftd3",
                DFTD3Head(
                    s8=float(p["s8"]),
                    a1=float(p["a1"]),
                    a2=float(p["a2"]),
                    s6=float(p.get("s6", 1.0)),
                    key_out="energy",
                ),
            )
        )
    return dataclasses.replace(cfg, outputs=tuple(outputs))


def load_v2_artifact(
    path: str, attach_lr: bool = True, registry_family: str | None = None
) -> LoadedModel:
    """Load a reference v2 ``.pt`` artifact into JAX params."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(data, dict) or "model_yaml" not in data or "state_dict" not in data:
        raise ValueError(f"{path}: not a v2 AIMNet2 artifact")
    model_cfg = yaml.safe_load(data["model_yaml"])
    _validate_model_yaml(model_cfg)
    cfg = config_from_yaml(model_cfg)
    sd = {k: v.numpy() for k, v in data["state_dict"].items()}
    params, aux = convert_state_dict(sd, cfg)
    metadata = apply_family_defaults(_metadata_from_artifact(data), registry_family)
    aux["metadata"] = metadata
    # external heads need extra params (D3 tables etc.)
    if attach_lr:
        cfg2 = attach_external_lr(cfg, metadata)
        from aimnetcentral_tpu.models.heads import head_init
        import jax

        rng = jax.random.key(0)
        for name, head in cfg2.outputs:
            if name not in params["outputs"]:
                params["outputs"][name] = head_init(rng, head)
        cfg = cfg2
    return LoadedModel(params=params, cfg=cfg, aux=aux, metadata=metadata)


def load_hf_repo(
    repo_dir: str, member: int | str = 0, registry_family: str | None = None
) -> LoadedModel:
    """Load from an HF-style directory: ``config.json`` +
    ``ensemble_N.safetensors`` (reference aimnet/calculators/hf_hub.py:275-400).
    ``repo_dir`` must be a local snapshot directory (zero-egress environment:
    no live hub fetches; pass a downloaded snapshot)."""
    import json

    from safetensors.numpy import load_file

    with open(os.path.join(repo_dir, "config.json")) as f:
        config = json.load(f)
    model_cfg = yaml.safe_load(config["model_yaml"]) if isinstance(
        config.get("model_yaml"), str
    ) else config.get("model_yaml")
    _validate_model_yaml(model_cfg)
    cfg = config_from_yaml(model_cfg)
    sd = load_file(os.path.join(repo_dir, f"ensemble_{member}.safetensors"))
    params, aux = convert_state_dict(sd, cfg)
    metadata = apply_family_defaults(_metadata_from_artifact(config), registry_family)
    aux["metadata"] = metadata
    cfg = attach_external_lr(cfg, metadata)
    from aimnetcentral_tpu.models.heads import head_init
    import jax

    for name, head in cfg.outputs:
        if name not in params["outputs"]:
            params["outputs"][name] = head_init(jax.random.key(0), head)
    return LoadedModel(params=params, cfg=cfg, aux=aux, metadata=metadata)


def load_model(path: str, registry_family: str | None = None) -> LoadedModel:
    """Dispatch on artifact kind (v2 .pt / HF dir).  Legacy ``.jpt``
    TorchScript requires conversion first (``aimnet-tpu convert``)."""
    if os.path.isdir(path):
        return load_hf_repo(path, registry_family=registry_family)
    if path.lower().endswith(".jpt"):
        raise ValueError(
            "legacy TorchScript .jpt artifacts must be converted to v2 .pt "
            "first (see the reference's `aimnet convert`); direct TorchScript "
            "execution is torch-specific"
        )
    return load_v2_artifact(path, registry_family=registry_family)
