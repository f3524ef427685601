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

from aimnetcentral_tpu.models.validation import (
    REGISTRY_IMPORT_POLICY,
    ModelImportPolicy,
    resolve_model_import_policy,
    validate_model_metadata,
    validate_model_yaml_tree,
)

FORBIDDEN_KWARGS = ("ptfile",)


class LoadedModel(NamedTuple):
    params: dict
    cfg: AIMNet2Config
    aux: dict
    metadata: dict

    def as_calculator_model(self) -> tuple:
        return (self.params, self.cfg, self.aux)


def _validate_model_yaml(tree: Any, policy: ModelImportPolicy | None = None) -> None:
    """Enforce the import policy + forbidden constructor kwargs on the config
    tree (reference aimnet/models/artifact_validation.py:100-330).  ``None``
    uses the frozen registry default policy."""
    validate_model_yaml_tree(tree, policy or REGISTRY_IMPORT_POLICY)


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
    path: str,
    attach_lr: bool = True,
    registry_family: str | None = None,
    model_import_paths: tuple[str, ...] | None = None,
    model_import_mode: Literal["extend", "replace", "unsafe"] = "extend",
) -> LoadedModel:
    """Load a reference v2 ``.pt`` artifact into JAX params.

    ``model_import_paths``/``model_import_mode`` configure the artifact trust
    boundary (reference aimnet/models/artifact_validation.py:129-241): which
    class paths the artifact yaml may name.  Registry artifacts are always
    validated under the frozen default policy regardless of these arguments
    (pass them only for explicit local/third-party paths).

    ``attach_lr=False`` returns the BARE network; note the calculator honors
    the artifact metadata and re-attaches external heads unless constructed
    with explicit ``needs_coulomb=False`` / ``needs_dispersion=False``
    overrides."""
    import torch

    policy = resolve_model_import_policy(model_import_paths, model_import_mode)
    data = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(data, dict) or "model_yaml" not in data or "state_dict" not in data:
        raise ValueError(f"{path}: not a v2 AIMNet2 artifact")
    model_cfg = yaml.safe_load(data["model_yaml"])
    _validate_model_yaml(model_cfg, policy)
    cfg = config_from_yaml(model_cfg)
    sd = {k: v.numpy() for k, v in data["state_dict"].items()}
    params, aux = convert_state_dict(sd, cfg)
    metadata = apply_family_defaults(_metadata_from_artifact(data), registry_family)
    validate_model_metadata(metadata, require_cutoff=True)
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


def _check_member(member: int | str) -> int:
    """Reject invalid ensemble members BEFORE any repo/file access
    (reference aimnet/calculators/hf_hub.py:181-239)."""
    if not isinstance(member, (int, str)) or isinstance(member, bool):
        raise ValueError(
            f"ensemble member must be a non-negative integer, got {member!r}"
        )
    try:
        idx = int(member)
    except ValueError:
        raise ValueError(
            f"ensemble member must be a non-negative integer, got {member!r}"
        ) from None
    if idx < 0:
        raise ValueError(f"ensemble member must be >= 0, got {idx}")
    return idx


def fetch_hf_snapshot(
    repo_id: str,
    member: int | str = 0,
    revision: str | None = None,
    token: str | None = None,
    policy: ModelImportPolicy | None = None,
) -> str:
    """Fetch an AIMNet2 HF repo with metadata-validated-BEFORE-weights
    ordering (reference aimnet/calculators/hf_hub.py:275-401):

    1. download only ``config.json`` (revision-pinned),
    2. validate its metadata schema and the ``model_yaml`` import policy,
    3. only then download the requested ensemble member's safetensors.

    Returns the local snapshot directory (both files land in the same
    revision-pinned HF cache snapshot).  If the config is a family-level
    schema without ``model_yaml``, falls back to the model registry via the
    config's ``member_names`` list (reference hf_hub.py:217-273) — the
    returned path is then the registry ``.pt`` artifact instead.
    """
    import json

    member = _check_member(member)

    from huggingface_hub import hf_hub_download

    policy = policy or REGISTRY_IMPORT_POLICY
    cfg_path = hf_hub_download(
        repo_id, "config.json", revision=revision, token=token
    )
    with open(cfg_path) as f:
        config = json.load(f)
    if not isinstance(config, Mapping):
        raise TypeError("config.json root must be a mapping.")
    validate_model_metadata(config)

    model_yaml = config.get("model_yaml")
    if model_yaml is None:
        # family-level schema: registry fallback by member name
        member_names = config.get("member_names")
        if not isinstance(member_names, list) or not member_names:
            raise ValueError(
                f"config.json in {repo_id!r} has no 'model_yaml' and no "
                "'member_names' list for a registry fallback; re-upload the "
                "repo with a complete config.json."
            )
        idx = int(member)
        if idx >= len(member_names):
            raise ValueError(
                f"ensemble member {idx} out of range for {len(member_names)} members"
            )
        from aimnetcentral_tpu.calculators.registry import download_model

        return download_model(member_names[idx])

    tree = yaml.safe_load(model_yaml) if isinstance(model_yaml, str) else model_yaml
    validate_model_yaml_tree(tree, policy)

    w_path = hf_hub_download(
        repo_id,
        f"ensemble_{member}.safetensors",
        revision=revision,
        token=token,
    )
    return os.path.dirname(w_path)


def load_hf_repo(
    repo_dir: str, member: int | str = 0, registry_family: str | None = None
) -> LoadedModel:
    """Load from an HF-style directory: ``config.json`` +
    ``ensemble_N.safetensors`` (reference aimnet/calculators/hf_hub.py:275-400).
    ``repo_dir`` is a local snapshot directory; for live repo IDs use
    ``fetch_hf_snapshot`` first (``load_model`` dispatches both)."""
    import json

    member = _check_member(member)

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


def load_jpt_model(path: str, registry_family: str | None = None) -> LoadedModel:
    """Directly load a trusted legacy ``.jpt`` TorchScript model.

    TorchScript is format-specific but is not a sandbox — only load ``.jpt``
    files from sources whose code and provenance you trust (same trust
    contract as the reference, aimnet/models/base.py:92-113).  The reference
    executes the archive as TorchScript; this framework re-executes it as
    JAX, reconstructing the architecture by introspecting the scripted
    module (``infer_model_yaml_from_scripted``) and mapping its state_dict
    onto the functional param tree.  The embedded long-range heads stay
    embedded (``coulomb_mode="full_embedded"``), exactly like the
    reference's legacy route; convert to v2 (``aimnet-tpu convert``) to get
    the externalized-LR artifact instead.
    """
    import torch

    from aimnetcentral_tpu.models.convert_v1 import (
        extract_species_from_afv,
        infer_model_yaml_from_scripted,
    )

    jit_model = torch.jit.load(path, map_location="cpu")
    tree = infer_model_yaml_from_scripted(jit_model)
    # defense in depth: the inferred tree names only closed-set v1 classes by
    # construction, but run it through the legacy allowlist anyway (the
    # reference applies NO policy to .jpt — see LEGACY_JPT_IMPORT_POLICY)
    from aimnetcentral_tpu.models.validation import LEGACY_JPT_IMPORT_POLICY

    _validate_model_yaml(tree, LEGACY_JPT_IMPORT_POLICY)
    cfg = config_from_yaml(tree)
    sd = {k: v.detach().cpu().numpy() for k, v in jit_model.state_dict().items()}
    params, aux = convert_state_dict(sd, cfg)

    # reference load_legacy_jit metadata (aimnet/models/base.py:98-108):
    # D3 params are externalizable only from tabulated DFTD3, never D3TS
    d3_params = None
    for name, head in cfg.outputs:
        if head.kind == "dftd3":
            d3_params = {"s8": head.s8, "a1": head.a1, "a2": head.a2, "s6": head.s6}
            break
    has_lr = any(h.kind == "lrcoulomb" for _, h in cfg.outputs)
    metadata = apply_family_defaults(
        {
            "format_version": 1,
            "cutoff": float(jit_model.cutoff),
            "needs_coulomb": False,
            "needs_dispersion": False,
            "coulomb_mode": "full_embedded" if has_lr else "none",
            "coulomb_sr_rc": None,
            "coulomb_sr_envelope": None,
            "d3_params": d3_params,
            "has_embedded_lr": has_lr,
            "has_embedded_d3ts": any(h.kind == "d3ts" for _, h in cfg.outputs),
            "implemented_species": extract_species_from_afv(
                np.asarray(sd["afv.weight"])
            ),
            "family": None,
            "supports_charged_systems": None,
        },
        registry_family,
    )
    aux["metadata"] = metadata
    return LoadedModel(params=params, cfg=cfg, aux=aux, metadata=metadata)


def load_model(
    path: str,
    registry_family: str | None = None,
    model_import_paths: tuple[str, ...] | None = None,
    model_import_mode: Literal["extend", "replace", "unsafe"] = "extend",
) -> LoadedModel:
    """Dispatch on artifact kind (v2 .pt / HF dir / live HF repo id / trusted
    legacy ``.jpt``).  ``.jpt`` files load via TorchScript introspection and
    therefore must come from a trusted source (reference
    aimnet/models/base.py:123-160); import settings don't apply to them."""
    if os.path.isdir(path):
        return load_hf_repo(path, registry_family=registry_family)
    if not os.path.exists(path) and "/" in path and not path.endswith(".pt"):
        # HF repo id, e.g. "isayevlab/aimnet2-wb97m-d3"
        policy = resolve_model_import_policy(model_import_paths, model_import_mode)
        local = fetch_hf_snapshot(path, policy=policy)
        if os.path.isdir(local):
            return load_hf_repo(local, registry_family=registry_family)
        return load_v2_artifact(local, registry_family=registry_family)
    if path.lower().endswith(".jpt"):
        if model_import_paths is not None or model_import_mode != "extend":
            # reference base.py:159-160, verbatim contract
            raise ValueError("Import settings are not supported for .jpt sources.")
        return load_jpt_model(path, registry_family=registry_family)
    return load_v2_artifact(
        path,
        registry_family=registry_family,
        model_import_paths=model_import_paths,
        model_import_mode=model_import_mode,
    )
