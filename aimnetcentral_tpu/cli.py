"""Command-line interface (reference aimnet/cli.py:8-145 parity + extras).

Commands: train, export, calc-sae, download, clear-model-cache, info,
plus TPU-native extras: sp (single point), md (on-device dynamics),
relax (FIRE), bench.
"""

from __future__ import annotations

import json
import os
import sys

import click
import numpy as np


@click.group()
def cli() -> None:
    """aimnetcentral_tpu — TPU-native AIMNet2 machine-learned potentials."""
    from aimnetcentral_tpu.xla_cache import enable_persistent_cache

    enable_persistent_cache()


def _load_calc(model: str, precision: str = "exact"):
    from aimnetcentral_tpu.calculators import AIMNet2Calculator
    from aimnetcentral_tpu.calculators.registry import registry_family, resolve_model
    from aimnetcentral_tpu.models.loader import load_model

    path = resolve_model(model)
    loaded = load_model(path, registry_family=registry_family(model))
    return AIMNet2Calculator(loaded.as_calculator_model(), precision=precision), loaded


def _load_ens_calc(model: str, fused: bool = True, precision: str = "exact"):
    """Ensemble calculator from a registry family name (all members) or a
    comma-separated list of artifact paths."""
    from aimnetcentral_tpu.calculators.ensemble import EnsembleCalculator
    from aimnetcentral_tpu.models.loader import load_model

    if "," in model:
        loaded = [load_model(p.strip()) for p in model.split(",")]
        return EnsembleCalculator.from_members(
            [ld.as_calculator_model() for ld in loaded],
            fused=fused,
            precision=precision,
        )
    return EnsembleCalculator.from_registry(model, fused=fused, precision=precision)


def _read_structure(path: str):
    """Read XYZ or CIF: returns (coord, numbers, cell-or-None)."""
    from aimnetcentral_tpu.io import read_cif, read_xyz

    if path.lower().endswith(".cif"):
        s = read_cif(path)
        return s["coord"], s["numbers"], s["cell"]
    coord, numbers = read_xyz(path)
    return coord, numbers, None


def _read_xyz(path: str):
    from aimnetcentral_tpu.io import read_xyz

    return read_xyz(path)


@cli.command()
@click.argument("model")
@click.argument("xyz")
@click.option("--charge", default=0.0)
@click.option("--forces/--no-forces", default=True)
@click.option(
    "--ensemble/--no-ensemble",
    default=False,
    help="load every member of a registry family (or MODEL as a "
    "comma-separated member list) and report mean +/- member spread",
)
@click.option(
    "--precision",
    default="exact",
    type=click.Choice(["exact", "balanced", "fast"]),
    help="'fast' runs default single-bf16-pass matmuls (~2x single-point "
    "throughput, ~4e-3 eV/A force noise) for screening workloads; "
    "'balanced' keeps exact XLA math but runs the conv kernels at 3x1-pass "
    "split dots (measured 6.5e-6 eV/A off exact, 1.75x throughput)",
)
def sp(
    model: str, xyz: str, charge: float, forces: bool, ensemble: bool,
    precision: str,
) -> None:
    """Single-point energy (and forces) for an XYZ or CIF file."""
    if ensemble:
        calc = _load_ens_calc(model, precision=precision)
    else:
        calc, _ = _load_calc(model, precision=precision)
    coord, numbers, cell = _read_structure(xyz)
    data = {"coord": coord, "numbers": numbers, "charge": charge}
    if cell is not None:
        data["cell"] = cell
    out = calc(data, forces=forces, stress=cell is not None)
    if "energy_std" in out:
        click.echo(
            f"energy (eV): {out['energy'][0]:.6f} "
            f"+/- {out['energy_std'][0]:.6f} (ensemble spread)"
        )
    else:
        click.echo(f"energy (eV): {out['energy'][0]:.6f}")
    click.echo(f"charges: {np.round(out['charges'], 4).tolist()}")
    if forces:
        click.echo(f"max |force| (eV/A): {np.abs(out['forces']).max():.6f}")
    if "stress" in out:
        click.echo(f"stress (eV/A^3): {np.round(out['stress'], 6).tolist()}")


@cli.command()
@click.argument("model")
@click.argument("xyz")
@click.option("--fmax", default=0.05)
@click.option("--max-steps", default=500)
def relax(model: str, xyz: str, fmax: float, max_steps: int) -> None:
    """On-device FIRE geometry relaxation."""
    from aimnetcentral_tpu.builders import system_from_molecules
    from aimnetcentral_tpu.dynamics import fire_relax

    calc, loaded = _load_calc(model)
    coord, numbers = _read_xyz(xyz)
    system = calc.prepare_system({"coord": coord, "numbers": numbers})
    relaxed, info = fire_relax(
        loaded.params, calc.cfg, system, fmax=fmax, max_steps=max_steps
    )
    click.echo(json.dumps(info))


@cli.command()
@click.argument("model")
@click.argument("xyz")
@click.option("--steps", default=1000)
@click.option("--temperature", default=300.0)
@click.option("--dt-fs", default=0.5)
@click.option("--cell", default=None, help="cubic cell length (Angstrom)")
@click.option("--traj", default=None, help="extxyz trajectory output path")
@click.option("--chunk", default=50, help="steps per compiled chunk (= trajectory stride)")
@click.option("--save-ckpt", default=None, help="write a resume checkpoint here at the end")
@click.option("--restore-ckpt", default=None, help="resume from a checkpoint written by --save-ckpt")
@click.option(
    "--ensemble/--no-ensemble",
    default=False,
    help="run mean-force MD over every member of a registry family (or a "
    "comma-separated member list); logs the on-device epot spread",
)
@click.option(
    "--thermostat",
    default="langevin",
    type=click.Choice(["langevin", "nve", "berendsen"]),
    help="integrator/thermostat (nve = plain velocity Verlet)",
)
@click.option(
    "--pressure-gpa",
    default=None,
    type=float,
    help="enable the isotropic Berendsen barostat (NPT) at this target "
    "pressure; requires a periodic cell",
)
@click.option(
    "--precision",
    default=None,
    type=click.Choice(["balanced", "exact"]),
    help="force-eval precision tier for NVE / drift-sensitive runs "
    "(same tiers as sp): 'balanced' = exact ambient + split-dot conv "
    "kernels (~1e-5-relative forces), 'exact' = ambient-HIGHEST "
    "everywhere; default is the fast 1-pass regime (~7.6e-3 eV/A noise, "
    "fine under a thermostat)",
)
def md(
    model: str, xyz: str, steps: int, temperature: float, dt_fs: float, cell,
    traj, chunk, save_ckpt, restore_ckpt, ensemble, thermostat, pressure_gpa,
    precision,
) -> None:
    """On-device MD: Langevin NVT by default; --thermostat nve/berendsen,
    --pressure-gpa for Berendsen NPT."""
    from aimnetcentral_tpu.dynamics import MDConfig, MDDriver, TrajectoryWriter

    if ensemble:
        calc = _load_ens_calc(model)
        params = calc.params
    else:
        calc, loaded = _load_calc(model)
        params = loaded.params
    coord, numbers = _read_xyz(xyz)
    data = {"coord": coord, "numbers": numbers}
    if cell is not None:
        data["cell"] = np.eye(3, dtype=np.float32) * float(cell)
    if pressure_gpa is not None and cell is None:
        raise click.UsageError("--pressure-gpa (NPT) requires --cell")
    system = calc.prepare_system(data)
    md_cfg = MDConfig(
        dt_fs=dt_fs,
        temperature_K=temperature,
        thermostat=thermostat,
        barostat="berendsen" if pressure_gpa is not None else None,
        # 1 GPa = 6.2415e-3 eV/A^3
        pressure_eV_A3=(pressure_gpa or 0.0) * 6.2415e-3,
        precision=precision,
    )
    drv = MDDriver(
        params,
        calc.cfg,
        system,
        md_cfg,
        ensemble=ensemble,
    )
    if restore_ckpt:
        drv.restore_checkpoint(restore_ckpt)
    writer = TrajectoryWriter(traj) if traj else None
    try:
        obs = drv.run(steps, chunk=chunk, traj=writer)
    finally:
        if writer is not None:
            writer.close()
    if save_ckpt:
        drv.save_checkpoint(save_ckpt)
    result = {
        "steps": steps,
        "final_epot_eV": float(obs["epot"][-1]),
        "mean_T_K": float(obs["temperature"][steps // 2 :].mean()),
    }
    if pressure_gpa is not None and "volume" in obs:
        result["final_volume_A3"] = float(obs["volume"][-1])
    if "epot_std" in obs:
        result["final_epot_std_eV"] = float(obs["epot_std"][-1])
    if writer is not None:
        result["traj_frames"] = writer.frames_written
    if save_ckpt:
        result["checkpoint"] = save_ckpt
    click.echo(json.dumps(result))


@cli.command()
@click.argument("model")
@click.argument("reactant_xyz")
@click.argument("product_xyz")
@click.option("--n-images", default=11, help="band resolution incl. endpoints")
@click.option("--charge", default=0.0)
@click.option("--mult", default=None, type=float, help="spin multiplicity (NSE models)")
@click.option("--fmax", default=0.05, help="NEB-force convergence (eV/A)")
@click.option("--max-steps", default=500)
@click.option(
    "--climb/--no-climb",
    default=True,
    help="climbing-image NEB: drive the highest image uphill along the band",
)
@click.option("--k-spring", default=0.1, help="band spring constant (eV/A^2)")
@click.option("--band", default=None, help="write the optimized band as extxyz here")
def neb(
    model: str,
    reactant_xyz: str,
    product_xyz: str,
    n_images: int,
    charge: float,
    mult,
    fmax: float,
    max_steps: int,
    climb: bool,
    k_spring: float,
    band,
) -> None:
    """Climbing-image NEB between two gas-phase endpoints.

    All images evaluate in ONE batched on-device force call per iteration
    (dynamics/neb.py); the reference reaches reaction paths through external
    drivers (pysisyphus/Sella, reference aimnet/calculators/aimnet2pysis.py)
    — here the band optimizer is in-framework.  Prints a JSON summary with
    the barrier (relative to the reactant image, SAE-free — barriers are
    differences, the constant SAE shift cancels) and the climbing-image
    index to hand to ``ts_search`` refinement."""
    from aimnetcentral_tpu.dynamics.neb import neb as run_neb

    calc, loaded = _load_calc(model)
    coord_r, numbers_r = _read_xyz(reactant_xyz)
    coord_p, numbers_p = _read_xyz(product_xyz)
    r = {"coord": coord_r, "numbers": numbers_r, "charge": charge}
    p = {"coord": coord_p, "numbers": numbers_p, "charge": charge}
    if mult is not None:
        r["mult"] = p["mult"] = mult
    band_arr, energies, info = run_neb(
        loaded.params,
        calc.cfg,
        r,
        p,
        n_images=n_images,
        fmax=fmax,
        max_steps=max_steps,
        climb=climb,
        k_spring=k_spring,
    )
    energies = np.asarray(energies, dtype=np.float64)
    result = {
        "n_images": int(n_images),
        "steps": info["steps"],
        "fmax": round(float(info["fmax"]), 6),
        "converged": bool(info["converged"]),
        "i_ts": int(info["i_ts"]),
        "barrier_eV": round(float(energies.max() - energies[0]), 6),
        "reaction_energy_eV": round(float(energies[-1] - energies[0]), 6),
        "energies_rel_eV": [round(float(e - energies[0]), 6) for e in energies],
    }
    if band:
        from aimnetcentral_tpu.dynamics import TrajectoryWriter

        w = TrajectoryWriter(band)
        try:
            for i, img in enumerate(np.asarray(band_arr)):
                w.write(
                    numbers_r, img,
                    comment={"image": i, "energy_rel_eV": f"{energies[i] - energies[0]:.6f}"},
                )
        finally:
            w.close()
        result["band"] = band
    click.echo(json.dumps(result))


@cli.command()
@click.argument("model")
@click.argument("xyz")
@click.option("--charge", default=0.0)
@click.option("--n-modes", default=12, help="print the N lowest frequencies")
@click.option("--ir", is_flag=True, help="double-harmonic IR intensities (km/mol)")
@click.option(
    "--thermo",
    is_flag=True,
    help="ideal-gas RRHO thermochemistry (ZPE/H/S/G) at --temperature",
)
@click.option("--temperature", default=298.15)
@click.option("--pressure", default=101325.0)
@click.option("--symmetry-number", default=1)
@click.option(
    "--mult",
    default=1.0,
    help="spin multiplicity: sets the electronic entropy kB*ln(mult) in "
    "--thermo (and is forwarded to NSE models as input)",
)
def freq(
    model: str,
    xyz: str,
    charge: float,
    n_modes: int,
    ir: bool,
    thermo: bool,
    temperature: float,
    pressure: float,
    symmetry_number: int,
    mult: float,
) -> None:
    """Harmonic vibrational frequencies (cm^-1) from the dense Hessian.

    Imaginary modes print as negative numbers — one significant imaginary
    frequency at a saddle point is the transition-state signature the
    reference's Sella workflow checks via get_hessian
    (reference aimnet/calculators/aimnet2ase.py:163).  ``--ir`` adds
    double-harmonic intensities; ``--thermo`` adds ideal-gas RRHO
    thermochemistry (the workflow the reference delegates to
    ase.thermochemistry)."""
    from aimnetcentral_tpu.dynamics import frequencies_from_calculator

    calc, _loaded = _load_calc(model)
    coord, numbers = _read_xyz(xyz)
    data = {"coord": coord, "numbers": numbers, "charge": charge}
    if mult != 1.0:
        data["mult"] = mult
    # --thermo implies a stationary point: project the rotational null
    # vectors so they cannot leak into the vibrational partition function
    freqs, modes = frequencies_from_calculator(
        calc, data, project_rotations=thermo
    )
    n_imag = int((freqs < -10.0).sum())  # ignore numerical near-zeros
    result = {
        "n_imaginary": n_imag,
        "lowest_cm1": [round(float(f), 2) for f in freqs[:n_modes]],
        "highest_cm1": round(float(freqs[-1]), 2),
    }
    if ir:
        from aimnetcentral_tpu.dynamics.vibrations import ir_intensities

        intens = ir_intensities(calc, data, modes)
        result["ir_km_mol"] = [round(float(x), 3) for x in intens[:n_modes]]
    if thermo:
        from aimnetcentral_tpu.dynamics.vibrations import rrho_thermochemistry

        result["thermo"] = {
            k: (round(v, 6) if isinstance(v, float) else v)
            for k, v in rrho_thermochemistry(
                freqs,
                numbers,
                coord,
                temperature=temperature,
                pressure=pressure,
                symmetry_number=symmetry_number,
                mult=mult,
            ).items()
        }
    click.echo(json.dumps(result))


def _deep_merge(base: dict, extra: dict) -> dict:
    """Recursive dict merge, ``extra`` winning (the reference's
    OmegaConf.merge of multiple --config files, train/train.py:57-59)."""
    out = dict(base)
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _apply_dotted_overrides(cfg: dict, args: tuple[str, ...]) -> dict:
    """Apply ``a.b.c=value`` positional overrides (values YAML-parsed),
    matching the reference train CLI's ARGS (train/train.py:33-38,61-64)."""
    import yaml as _yaml

    for arg in args:
        if "=" not in arg:
            raise click.UsageError(
                f"override {arg!r} must be KEY.PATH=VALUE (e.g. data.train=x.h5)"
            )
        key, _, raw = arg.partition("=")
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                node[p] = nxt
            node = nxt
        node[parts[-1]] = _yaml.safe_load(raw)
    return cfg


@cli.command()
@click.option(
    "--config",
    "config_paths",
    required=True,
    multiple=True,
    help="training yaml (repeatable; later files override earlier ones)",
)
@click.option("--load", "load_path", default=None, help="checkpoint to resume from")
@click.option(
    "--hyperpar",
    default=None,
    help="YAML file of Jinja2 hyperparameters rendered into the config",
)
@click.argument("overrides", nargs=-1)
def train(
    config_paths: tuple[str, ...],
    load_path: str | None,
    hyperpar: str | None,
    overrides: tuple[str, ...],
) -> None:
    """Train a model from YAML config(s) (see docs/training.md).

    Configs support Jinja2 ``{{ name }}`` hyperparameter templating and
    nested .yaml file references (reference aimnet/config.py:83-152).
    Multiple ``--config`` files merge in order, and trailing OVERRIDES are
    dot-separated assignments applied last — e.g.
    ``aimnet-tpu train --config base.yaml trainer.epochs=5 data.train=x.h5``
    (reference aimnet/train/train.py:33-64)."""
    import jax

    from aimnetcentral_tpu.data.sgdataset import SizeGroupedDataset
    from aimnetcentral_tpu.models.convert import config_from_yaml
    from aimnetcentral_tpu.models.aimnet2 import aimnet2_init
    from aimnetcentral_tpu.train.loss import LossConfig, LossTerm
    from aimnetcentral_tpu.train.trainer import Trainer, TrainerConfig

    from aimnetcentral_tpu.config import load_yaml

    cfg_dict: dict = {}
    for cp in config_paths:
        cfg_dict = _deep_merge(cfg_dict, load_yaml(cp, hyperpar))
    cfg_dict = _apply_dotted_overrides(cfg_dict, overrides)

    model_cfg = config_from_yaml(cfg_dict["model"])
    params = aimnet2_init(jax.random.key(cfg_dict.get("seed", 0)), model_cfg)

    ds = SizeGroupedDataset(cfg_dict["data"]["train"])
    val = (
        SizeGroupedDataset(cfg_dict["data"]["val"])
        if cfg_dict["data"].get("val")
        else None
    )
    sae = None
    if cfg_dict["data"].get("sae", True):
        sae = ds.apply_peratom_shift()
        if val is not None:
            val.apply_peratom_shift(sap_dict=sae)

    tkw = cfg_dict.get("trainer", {})
    terms = tuple(
        LossTerm(**t) for t in cfg_dict.get("loss", {}).get(
            "terms",
            [
                {"kind": "energy", "key_pred": "energy", "key_true": "energy", "weight": 1.0},
                {"kind": "peratom", "key_pred": "forces", "key_true": "forces", "weight": 0.1},
            ],
        )
    )
    trainer = Trainer(
        model_cfg,
        params,
        ds,
        val_ds=val,
        tcfg=TrainerConfig(**tkw),
        loss_cfg=LossConfig(terms=terms),
    )
    if load_path:
        # full resume (optimizer + scheduler) when the checkpoint carries
        # it; weights-only files restore params with a fresh optimizer
        trainer.resume(load_path)
    result = trainer.fit()
    click.echo(json.dumps({"best_val": result["best_val"], "epochs": len(result["history"])}))
    if cfg_dict.get("export"):
        from aimnetcentral_tpu.train.export import export_model

        export_model(
            trainer.state.params, model_cfg, cfg_dict["export"], sae=sae
        )
        click.echo(f"exported to {cfg_dict['export']}")


@cli.command()
@click.argument("checkpoint")
@click.option("--model-yaml", required=True, help="architecture yaml")
@click.option("--output", required=True)
@click.option("--sae", "sae_path", default=None, help="SAE yaml from calc-sae")
@click.option("--species", default=None, help="comma-separated implemented species")
def export(checkpoint: str, model_yaml: str, output: str, sae_path, species) -> None:
    """Export a trained checkpoint to a reference-compatible v2 .pt artifact."""
    import jax
    import yaml

    from aimnetcentral_tpu.models.aimnet2 import aimnet2_init
    from aimnetcentral_tpu.models.convert import config_from_yaml
    from aimnetcentral_tpu.train.export import export_model
    from aimnetcentral_tpu.train.trainer import load_checkpoint_params

    with open(model_yaml) as f:
        cfg = config_from_yaml(yaml.safe_load(f))
    template = aimnet2_init(jax.random.key(0), cfg)
    params = load_checkpoint_params(checkpoint, template)
    sae = None
    if sae_path:
        with open(sae_path) as f:
            sae = {int(k): float(v) for k, v in yaml.safe_load(f).items()}
    spec = [int(s) for s in species.split(",")] if species else None
    export_model(params, cfg, output, sae=sae, implemented_species=spec)
    click.echo(f"exported {output}")


@cli.command()
@click.argument("jpt")
@click.option(
    "--model-yaml",
    default=None,
    help="Architecture YAML; omit to infer it by TorchScript introspection.",
)
@click.option("--output", required=True)
@click.option("--species", default=None)
@click.option("--family", default=None)
def convert(jpt: str, model_yaml: str | None, output: str, species, family) -> None:
    """Convert a legacy TorchScript .jpt artifact to the v2 .pt format."""
    from aimnetcentral_tpu.models.convert_v1 import convert_v1_model

    spec = [int(s) for s in species.split(",")] if species else None
    convert_v1_model(
        jpt, model_yaml, output_path=output, implemented_species=spec, family=family
    )
    click.echo(f"converted {jpt} -> {output}")


@cli.command("calc-sae")
@click.argument("dataset")
@click.argument("output")
def calc_sae_cmd(dataset: str, output: str) -> None:
    """Per-element SAE regression for a dataset -> yaml."""
    import yaml

    from aimnetcentral_tpu.data.sgdataset import SizeGroupedDataset
    from aimnetcentral_tpu.train.sae import calc_sae

    ds = SizeGroupedDataset(dataset)
    sae = calc_sae(ds)
    with open(output, "w") as f:
        yaml.safe_dump(sae, f)
    click.echo(f"wrote SAE for {len(sae)} elements to {output}")


@cli.command()
@click.argument("name")
def download(name: str) -> None:
    """Download a registry model into the cache."""
    from aimnetcentral_tpu.calculators.registry import download_model

    path = download_model(name)
    click.echo(path)


@cli.command("clear-model-cache")
def clear_model_cache_cmd() -> None:
    from aimnetcentral_tpu.calculators.registry import clear_model_cache

    clear_model_cache()
    click.echo("model cache cleared")


@cli.command()
def info() -> None:
    """Environment / device diagnostics (reference aimnet/cli.py:121-138)."""
    import jax

    import aimnetcentral_tpu

    click.echo(f"aimnetcentral_tpu {aimnetcentral_tpu.__version__}")
    click.echo(f"jax {jax.__version__}")
    click.echo(f"devices: {jax.devices()}")
    click.echo(f"default backend: {jax.default_backend()}")
    from aimnetcentral_tpu.calculators.registry import available_models, cache_dir

    click.echo(f"model cache: {cache_dir()}")
    click.echo(f"registry models: {len(available_models())}")


if __name__ == "__main__":
    cli()
