"""Export trained JAX params to the reference-compatible v2 ``.pt`` artifact
(reference aimnet/train/export_model.py:133-295).

Pipeline parity: strip embedded LR modules from the config (externalize
Coulomb; keep SRCoulomb), bake SAE into float64 atomic shifts, NaN-mask
unimplemented species in the embedding, canonical-validate, atomic save.
Artifacts written here load in BOTH frameworks (the state_dict key layout is
the reference's), so trained models interoperate.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Mapping

import numpy as np
import yaml

from aimnetcentral_tpu.models.aimnet2 import AIMNet2Config
from aimnetcentral_tpu.models.heads import (
    AtomicShiftHead,
    D3TSHead,
    DFTD3Head,
    LRCoulombHead,
    SRCoulombHead,
)
from aimnetcentral_tpu.models.modules import MLPSpec


def params_to_state_dict(params: Mapping[str, Any], cfg: AIMNet2Config) -> dict:
    """Inverse of models/convert.py::convert_state_dict: JAX params ->
    reference torch state_dict key layout (numpy valued)."""
    sd: dict[str, np.ndarray] = {
        "afv.weight": np.asarray(params["afv"]["weight"]),
        "aev.rc_s": np.asarray(params["aev"]["rc_s"]),
        "aev.eta_s": np.asarray(params["aev"]["eta_s"]),
        "aev.shifts_s": np.asarray(params["aev"]["shifts_s"]),
        # single-basis models mirror _s into the dummy _v slots
        "aev.rc_v": np.asarray(params["aev"]["rc_s"]),
        "aev.eta_v": np.asarray(params["aev"]["eta_s"]),
        "aev.shifts_v": np.asarray(params["aev"]["shifts_s"]),
        "conv_a.agh": np.asarray(params["conv_a"]["agh"]),
        "conv_q.agh": np.asarray(params["conv_q"]["agh"]),
    }

    def put_mlp(prefix: str, layers: list, spec: MLPSpec) -> None:
        for i, layer in enumerate(layers):
            sd[f"{prefix}.{2 * i}.weight"] = np.asarray(layer["w"]).T
            sd[f"{prefix}.{2 * i}.bias"] = np.asarray(layer["b"])

    from aimnetcentral_tpu.models.aimnet2 import mlp_spec_for_pass

    for i, layers in enumerate(params["mlps"]):
        put_mlp(f"mlps.{i}", layers, mlp_spec_for_pass(cfg, i))

    for name, head in cfg.outputs:
        p = params["outputs"].get(name, {})
        if head.kind == "output":
            put_mlp(f"outputs.{name}.mlp", p["mlp"], head.mlp)
        elif head.kind == "atomic_shift":
            sd[f"outputs.{name}.shifts.weight"] = np.asarray(
                p["weight"], dtype=np.float64
            ).reshape(-1, 1)
        elif head.kind == "srrep":
            sd[f"outputs.{name}.params.weight"] = np.asarray(p["gfn1_ab"])
        elif head.kind in ("dipole", "quadrupole"):
            sd[f"outputs.{name}.mass"] = np.asarray(p["mass"])
        elif head.kind == "disp_param":
            sd[f"outputs.{name}.disp_param0"] = np.asarray(p["disp_param0"])
        elif head.kind == "d3ts":
            sd[f"outputs.{name}.r4r2"] = np.asarray(p["r4r2"])
        elif head.kind == "dftd3":
            for k in ("rcov", "r4r2", "c6ab", "cn_ref"):
                sd[f"outputs.{name}.{k}"] = np.asarray(p[k])
        elif head.kind == "srcoulomb":
            sd[f"outputs.{name}.rc"] = np.asarray(head.rc, dtype=np.float32)
        elif head.kind == "lrcoulomb":
            sd[f"outputs.{name}.rc"] = np.asarray(head.rc, dtype=np.float32)
    return sd


def _head_to_yaml(name: str, head) -> dict:
    if head.kind == "output":
        return {
            "class": "aimnet.modules.Output",
            "kwargs": {
                "n_in": head.n_in,
                "n_out": head.n_out,
                "key_in": head.key_in,
                "key_out": head.key_out,
                "mlp": {
                    "hidden": list(head.mlp.hidden),
                    "activation_fn": "torch.nn.GELU",
                    "last_linear": head.mlp.last_linear,
                },
            },
        }
    mapping = {
        "atomic_shift": ("AtomicShift", lambda h: {"key_in": h.key_in, "key_out": h.key_out}),
        "atomic_sum": ("AtomicSum", lambda h: {"key_in": h.key_in, "key_out": h.key_out}),
        "dipole": ("Dipole", lambda h: {"key_in": h.key_in, "key_out": h.key_out}),
        "quadrupole": ("Quadrupole", lambda h: {"key_in": h.key_in, "key_out": h.key_out}),
        "srrep": ("SRRep", lambda h: {"key_out": h.key_out, "rc": h.rc, "cutoff_fn": h.cutoff_fn}),
        "srcoulomb": ("SRCoulomb", lambda h: {"rc": h.rc, "key_in": h.key_in, "key_out": h.key_out, "envelope": h.envelope}),
        "lrcoulomb": ("LRCoulomb", lambda h: {"rc": h.rc, "key_in": h.key_in, "key_out": h.key_out, "method": h.method}),
        # DispParam has NO barrel re-export in the reference: its only
        # allowlisted path is the submodule spelling
        # (reference aimnet/models/artifact_validation.py:66-70)
        "disp_param": ("lr.DispParam", lambda h: {"key_in": h.key_in, "key_out": h.key_out}),
        "d3ts": ("D3TS", lambda h: {"a1": h.a1, "a2": h.a2, "s8": h.s8, "s6": h.s6, "key_in": h.key_in, "key_out": h.key_out}),
        "dftd3": ("DFTD3", lambda h: {"s8": h.s8, "a1": h.a1, "a2": h.a2, "s6": h.s6, "cutoff": h.cutoff, "smoothing_fraction": h.smoothing_fraction, "key_out": h.key_out}),
    }
    cls, kw_fn = mapping[head.kind]
    return {"class": f"aimnet.modules.{cls}", "kwargs": kw_fn(head)}


def config_to_yaml(cfg: AIMNet2Config, skip_heads: tuple[str, ...] = ()) -> dict:
    return {
        "class": "aimnet.models.AIMNet2",
        "kwargs": {
            "nfeature": cfg.nfeature,
            "d2features": cfg.d2features,
            "ncomb_v": cfg.ncomb_v,
            "hidden": [list(h) for h in cfg.hidden],
            "aim_size": cfg.aim_size,
            "num_charge_channels": cfg.num_charge_channels,
            "aev": {"rc_s": cfg.aev.rc_s, "nshifts_s": cfg.aev.nshifts_s},
            "outputs": {
                name: _head_to_yaml(name, head)
                for name, head in cfg.outputs
                if name not in skip_heads
            },
        },
    }


def export_model(
    params: Mapping[str, Any],
    cfg: AIMNet2Config,
    output: str,
    sae: Mapping[int, float] | None = None,
    implemented_species: list[int] | None = None,
    shift_tables: Mapping[str, Any] | None = None,
    extra_metadata: Mapping[str, Any] | None = None,
) -> dict:
    """Write a reference-compatible v2 .pt artifact.

    Externalizes embedded LRCoulomb (replaced by SRCoulomb + needs_coulomb
    metadata, reference aimnet/models/utils.py:379-470) and bakes the SAE
    dict into the float64 atomic-shift weights (reference aimnet/train/
    export_model.py:53-74).
    """
    import dataclasses as dc

    import torch

    # --- externalize LR Coulomb
    lr_heads = [n for n, h in cfg.outputs if isinstance(h, LRCoulombHead)]
    coulomb_mode = "none"
    coulomb_sr_rc = None
    coulomb_sr_envelope = None
    outputs = list(cfg.outputs)
    if lr_heads:
        lr_head = dict(cfg.outputs)[lr_heads[0]]
        coulomb_mode = "sr_embedded"
        coulomb_sr_rc = lr_head.rc
        coulomb_sr_envelope = lr_head.envelope
        outputs = [(n, h) for n, h in outputs if not isinstance(h, LRCoulombHead)]
        outputs.append(
            (
                "srcoulomb",
                SRCoulombHead(rc=lr_head.rc, key_in=lr_head.key_in, key_out="energy",
                              envelope=lr_head.envelope),
            )
        )
    d3_heads = [h for _n, h in cfg.outputs if isinstance(h, DFTD3Head)]
    d3_params = None
    if d3_heads:
        h = d3_heads[0]
        d3_params = {"s6": h.s6, "s8": h.s8, "a1": h.a1, "a2": h.a2}
        outputs = [(n, hh) for n, hh in outputs if not isinstance(hh, DFTD3Head)]
    has_d3ts = any(isinstance(h, D3TSHead) for _n, h in cfg.outputs)
    export_cfg = dc.replace(cfg, outputs=tuple(outputs))

    # --- bake SAE into atomic shifts (float64); shift_tables (e.g. the f64
    # tables recovered from a v1 artifact) override the f32 params directly
    params = dict(params)
    params["outputs"] = dict(params["outputs"])
    shift_heads = [n for n, h in export_cfg.outputs if isinstance(h, AtomicShiftHead)]
    if shift_tables:
        for name, table in shift_tables.items():
            if name in params["outputs"]:
                params["outputs"][name] = {
                    **params["outputs"][name],
                    "weight": np.asarray(table, dtype=np.float64),
                }
    if sae and shift_heads:
        name = shift_heads[0]
        w = np.asarray(params["outputs"][name]["weight"], dtype=np.float64).copy()
        for z, e in sae.items():
            w[z] += e
        params["outputs"][name] = {**params["outputs"][name], "weight": w}

    sd_np = params_to_state_dict(params, export_cfg)
    # NaN-mask unimplemented species rows in the embedding (reference
    # aimnet/train/export_model.py:74-80)
    if implemented_species:
        afv = sd_np["afv.weight"].copy()
        mask = np.ones(afv.shape[0], dtype=bool)
        mask[0] = False
        mask[[z for z in implemented_species if z < afv.shape[0]]] = False
        afv[mask] = np.nan
        sd_np["afv.weight"] = afv
    else:
        implemented_species = sorted(sae.keys()) if sae else []

    state_dict = {
        k: torch.tensor(v, dtype=torch.float64 if v.dtype == np.float64 else torch.float32)
        for k, v in sd_np.items()
    }

    artifact = {
        "format_version": 2,
        "model_yaml": yaml.safe_dump(
            config_to_yaml(export_cfg), sort_keys=False
        ),
        "cutoff": float(cfg.aev.rc_s),
        "needs_coulomb": bool(lr_heads),
        "needs_dispersion": bool(d3_params),
        "coulomb_mode": coulomb_mode,
        "coulomb_sr_rc": coulomb_sr_rc,
        "coulomb_sr_envelope": coulomb_sr_envelope,
        "d3_params": d3_params,
        "has_embedded_lr": coulomb_mode == "sr_embedded" or has_d3ts,
        "has_embedded_d3ts": has_d3ts,
        "implemented_species": list(implemented_species),
        "state_dict": state_dict,
    }
    if extra_metadata:
        artifact.update(dict(extra_metadata))

    # canonical validation before the artifact can exist on disk
    # (reference aimnet/train/export_model.py:77-81 + artifact_validation.py:394)
    from aimnetcentral_tpu.models.validation import validate_model_metadata

    meta_view = {k: v for k, v in artifact.items() if k not in ("state_dict", "model_yaml")}
    validate_model_metadata(
        meta_view,
        require_cutoff=True,
        require_structural_consistency=True,
        require_cross_field_consistency=True,
    )

    # atomic save (reference aimnet/train/export_model.py:83-109): a failure
    # never replaces an existing destination; re-export preserves the
    # destination's permissions; brand-new files stay private (mkstemp 0600)
    import stat as _stat

    d = os.path.dirname(os.path.abspath(output)) or "."
    os.makedirs(d, exist_ok=True)
    dest_mode = (
        _stat.S_IMODE(os.stat(output).st_mode) if os.path.exists(output) else None
    )
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".pt.tmp")
    try:
        if dest_mode is not None:
            os.fchmod(fd, dest_mode)
        with os.fdopen(fd, "wb") as stream:
            fd = None
            torch.save(artifact, stream)
        os.replace(tmp, output)
    except BaseException:
        if fd is not None:
            os.close(fd)
        if os.path.exists(tmp):
            os.remove(tmp)
        raise
    return artifact
