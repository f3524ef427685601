"""Legacy v1 ``.jpt`` (TorchScript) -> v2 ``.pt`` conversion.

Equivalent of the reference's ``aimnet convert`` pipeline (reference
aimnet/models/utils.py:599-829 / aimnet/models/convert.py): load the
TorchScript artifact (trusted source only — TorchScript is not a sandbox),
pull its state_dict and cutoff, combine with the architecture YAML, strip
embedded LR modules into metadata, and write a v2 artifact (which then loads
in this framework AND the reference).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import yaml

from aimnetcentral_tpu.models.convert import config_from_yaml, convert_state_dict


def extract_species_from_afv(afv_weight: np.ndarray) -> list[int]:
    """Implemented species = embedding rows that are not NaN and not the
    padding row (reference aimnet/models/utils.py:253-298)."""
    ok = ~np.isnan(afv_weight).any(axis=-1)
    nonzero = np.abs(afv_weight).sum(axis=-1) > 0
    return [int(z) for z in np.nonzero(ok & nonzero)[0] if z > 0]


def convert_v1_model(
    jpt_path: str,
    yaml_config_path: str,
    output_path: str | None = None,
    implemented_species: list[int] | None = None,
    family: str | None = None,
    supports_charged_systems: bool | None = None,
):
    """Convert a legacy TorchScript model; returns (LoadedModel, artifact)."""
    import torch

    from aimnetcentral_tpu.train.export import export_model

    jit_model = torch.jit.load(jpt_path, map_location="cpu")
    cutoff = float(jit_model.cutoff)
    sd = {k: v.detach().numpy() for k, v in jit_model.state_dict().items()}

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
