"""Legacy v1 ``.jpt`` (TorchScript) -> v2 ``.pt`` conversion.

Equivalent of the reference's ``aimnet convert`` pipeline (reference
aimnet/models/utils.py:599-829 / aimnet/models/convert.py): load the
TorchScript artifact (trusted source only — TorchScript is not a sandbox),
pull its state_dict and cutoff, combine with the architecture YAML, strip
embedded LR modules into metadata, and write a v2 artifact (which then loads
in this framework AND the reference).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np
import yaml

from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict


def extract_species_from_afv(afv_weight: np.ndarray) -> list[int]:
    """Implemented species = embedding rows that are not NaN and not the
    padding row (reference aimnet/models/utils.py:253-298)."""
    ok = ~np.isnan(afv_weight).any(axis=-1)
    nonzero = np.abs(afv_weight).sum(axis=-1) > 0
    return [int(z) for z in np.nonzero(ok & nonzero)[0] if z > 0]


def _jattr(mod: Any, name: str, default: Any = None) -> Any:
    """Read a python attribute preserved on a (scripted) module, with a
    default (the reference's ``get_jit_attr``, aimnet/models/utils.py:198)."""
    try:
        v = getattr(mod, name)
    except (AttributeError, RuntimeError):
        return default
    if hasattr(v, "item") and getattr(v, "numel", lambda: 2)() == 1:
        return v.item()
    return v


def _original_name(mod: Any) -> str:
    """Class name of a scripted submodule (RecursiveScriptModule keeps the
    original class name; plain modules fall back to ``type().__name__``)."""
    name = getattr(mod, "original_name", "") or type(mod).__name__
    return str(name)


def _mlp_layer_shapes(sd: Mapping[str, np.ndarray], prefix: str) -> list[tuple[int, int]]:
    """(out, in) shapes of the Linear layers ``{prefix}.{i}.weight`` in order."""
    idxs = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.match(re.escape(prefix) + r"\.(\d+)\.weight$", k))
    )
    if not idxs:
        raise ValueError(f"no MLP layers found under {prefix!r}")
    return [tuple(sd[f"{prefix}.{i}.weight"].shape) for i in idxs]


def _head_config_from_scripted(
    name: str, mod: Any, sd: Mapping[str, np.ndarray]
) -> dict[str, Any]:
    """Reconstruct one output head's ``class:/kwargs:`` entry from its scripted
    module.  TorchScript preserves the original class name plus every python
    attribute the forward reads (key_in/key_out/method/damping params/...),
    and buffers like ``rc`` live in the state_dict — together they pin the
    full constructor signature of the closed v1 head set (reference
    aimnet/modules/core.py:71-230, aimnet/modules/lr.py:212-1430)."""
    cls = _original_name(mod)
    p = f"outputs.{name}"
    kw: dict[str, Any] = {}

    def keys(default_in: str, default_out: str) -> None:
        kw["key_in"] = str(_jattr(mod, "key_in", default_in))
        kw["key_out"] = str(_jattr(mod, "key_out", default_out))

    if cls == "Output":
        shapes = _mlp_layer_shapes(sd, f"{p}.mlp")
        keys("aim", "energy")
        kw.update(
            n_in=shapes[0][1],
            n_out=shapes[-1][0],
            mlp={
                "activation_fn": "torch.nn.GELU",
                "last_linear": bool(_jattr(getattr(mod, "mlp", None), "last_linear", True)),
                "hidden": [s[0] for s in shapes[:-1]],
            },
        )
    elif cls == "AtomicShift":
        keys("energy", "energy")
        kw["num_types"] = int(sd[f"{p}.shifts.weight"].shape[0])
        kw["reduce_sum"] = bool(_jattr(mod, "reduce_sum", False))
    elif cls == "AtomicSum":
        keys("energy", "energy")
    elif cls == "LRCoulomb":
        keys("charges", "energy")
        kw.update(
            rc=float(np.asarray(sd[f"{p}.rc"]).reshape(())),
            method=str(_jattr(mod, "method", "simple")),
            dsf_alpha=float(_jattr(mod, "dsf_alpha", 0.2)),
            dsf_rc=float(_jattr(mod, "dsf_rc", 15.0)),
            ewald_accuracy=float(_jattr(mod, "ewald_accuracy", 1e-6)),
            subtract_sr=bool(_jattr(mod, "subtract_sr", True)),
            envelope=str(_jattr(mod, "envelope", "exp")),
        )
    elif cls == "SRCoulomb":
        keys("charges", "energy")
        kw["rc"] = float(np.asarray(sd[f"{p}.rc"]).reshape(()))
        kw["envelope"] = str(_jattr(mod, "envelope", "exp"))
    elif cls in ("Dipole", "Quadrupole"):
        keys("charges", "dipole" if cls == "Dipole" else "quadrupole")
        kw["center_coord"] = bool(_jattr(mod, "center_coord", False))
    elif cls == "SRRep":
        kw["key_out"] = str(_jattr(mod, "key_out", "e_rep"))
        kw["cutoff_fn"] = str(_jattr(mod, "cutoff_fn", "none"))
        kw["rc"] = float(np.asarray(sd[f"{p}.rc"]).reshape(()))
        kw["reduce_sum"] = bool(_jattr(mod, "reduce_sum", True))
    elif cls == "DispParam":
        keys("disp_param", "disp_param")
    elif cls in ("D3TS", "DFTD3", "D3BJ"):
        for attr in ("s8", "a1", "a2"):
            v = _jattr(mod, attr)
            if v is None:
                raise ValueError(
                    f"head {name!r} ({cls}): damping parameter {attr!r} is not "
                    "recoverable from this TorchScript archive; convert with an "
                    "explicit architecture YAML instead"
                )
            kw[attr] = float(v)
        kw["s6"] = float(_jattr(mod, "s6", 1.0))
        if cls == "D3TS":
            keys("disp_param", "energy")
        else:
            cls = "DFTD3"
            kw["key_out"] = str(_jattr(mod, "key_out", "energy"))
            cutoff = _jattr(mod, "cutoff")
            if cutoff is not None:
                kw["cutoff"] = float(cutoff)
    else:
        raise ValueError(
            f"output head {name!r} has unrecognized class {cls!r}; this "
            ".jpt cannot be loaded by introspection — convert it with an "
            "explicit architecture YAML (`aimnet-tpu convert`)"
        )
    return {"class": f"aimnet.modules.{cls}", "kwargs": kw}


def infer_model_yaml_from_scripted(jit_model: Any) -> dict[str, Any]:
    """Reconstruct the model-config tree (the architecture YAML's
    ``class:/kwargs:`` dict) from a legacy TorchScript model.

    The reference loads ``.jpt`` as an *executable* TorchScript module
    (reference aimnet/models/base.py:93-113), so it never needs the YAML;
    this framework re-executes the model as JAX, so the graph definition is
    rebuilt instead: core dimensions come from parameter shapes
    (``conv_*.agh`` is (nchannel, nshifts_v, ncomb_v), ``afv.weight`` width
    distinguishes d2features, MLP Linear shapes give ``hidden``/``aim_size``)
    and head constructors from the scripted output modules' preserved class
    names and attributes.  Raises ValueError when an archive falls outside
    the closed v1 module set — convert with an explicit YAML then.
    """
    sd = {k: v.detach().cpu().numpy() for k, v in jit_model.state_dict().items()}

    nfeature, nshifts_v, ncomb_v = sd["conv_a.agh"].shape
    nshifts_s = int(sd["aev.shifts_s"].shape[-1])
    num_charge_channels = int(
        _jattr(jit_model, "num_charge_channels", sd["conv_q.agh"].shape[0])
    )
    afv_width = int(sd["afv.weight"].shape[-1])
    d2features = bool(
        _jattr(jit_model, "d2features", afv_width == nfeature * nshifts_s and nshifts_s > 1)
    )

    n_mlps = len(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"mlps\.(\d+)\.", k))
        }
    )
    hidden = []
    for i in range(n_mlps):
        shapes = _mlp_layer_shapes(sd, f"mlps.{i}")
        hidden.append([s[0] for s in shapes[:-1]])
    aim_size = int(_mlp_layer_shapes(sd, f"mlps.{n_mlps - 1}")[-1][0])

    # output heads, in ModuleDict/ModuleList registration order
    outputs_mod = getattr(jit_model, "outputs")
    outputs: dict[str, Any] = {}
    for name, mod in outputs_mod.named_children():
        outputs[str(name)] = _head_config_from_scripted(str(name), mod, sd)

    return {
        "class": "aimnet.models.AIMNet2",
        "kwargs": {
            "nfeature": int(nfeature),
            "d2features": d2features,
            "ncomb_v": int(ncomb_v),
            "hidden": hidden,
            "aim_size": aim_size,
            "num_charge_channels": num_charge_channels,
            "aev": {
                "rc_s": float(np.asarray(sd["aev.rc_s"]).reshape(())),
                "nshifts_s": nshifts_s,
            },
            "outputs": outputs,
        },
    }


def convert_v1_model(
    jpt_path: str,
    yaml_config_path: str | None = None,
    output_path: str | None = None,
    implemented_species: list[int] | None = None,
    family: str | None = None,
    supports_charged_systems: bool | None = None,
):
    """Convert a legacy TorchScript model; returns (LoadedModel, artifact).

    ``yaml_config_path=None`` reconstructs the architecture by introspecting
    the TorchScript archive (:func:`infer_model_yaml_from_scripted`)."""
    import torch

    from aimnetcentral_tpu.train.export import export_model

    jit_model = torch.jit.load(jpt_path, map_location="cpu")
    cutoff = float(jit_model.cutoff)
    sd = {k: v.detach().numpy() for k, v in jit_model.state_dict().items()}

    if yaml_config_path is None:
        model_yaml = infer_model_yaml_from_scripted(jit_model)
    else:
        with open(yaml_config_path, encoding="utf-8") as f:
            model_yaml = yaml.safe_load(f)
    cfg = config_from_yaml(model_yaml)
    params, aux = convert_state_dict(sd, cfg)

    if implemented_species is None:
        implemented_species = extract_species_from_afv(np.asarray(sd["afv.weight"]))
    else:
        implemented_species = sorted(set(implemented_species))
        afv = np.asarray(sd["afv.weight"]).copy()
        mask = np.ones(afv.shape[0], dtype=bool)
        mask[0] = False
        mask[[z for z in implemented_species if z < afv.shape[0]]] = False
        afv[mask] = np.nan
        import jax.numpy as jnp

        params["afv"]["weight"] = jnp.asarray(afv.astype(np.float32))

    extra_md: dict[str, Any] = {"cutoff": cutoff}
    if family is not None:
        extra_md["family"] = family
    if supports_charged_systems is not None:
        extra_md["supports_charged_systems"] = supports_charged_systems

    artifact = None
    if output_path:
        artifact = export_model(
            params,
            cfg,
            output_path,
            sae=None,
            implemented_species=implemented_species,
            shift_tables=aux.get("sae"),
            extra_metadata=extra_md,
        )

    from aimnetcentral_tpu.models.loader import LoadedModel, attach_external_lr

    metadata = {
        "format_version": 2,
        "cutoff": cutoff,
        "implemented_species": implemented_species,
        "family": family,
        "supports_charged_systems": supports_charged_systems,
    }
    return LoadedModel(params=params, cfg=cfg, aux=aux, metadata=metadata), artifact
