"""CLI user journeys (reference: the `aimnet` console scripts + this repo's
sp/md/relax/freq extras), driven through click's test runner with tiny
artifacts — the full path from an exported .pt on disk to printed numbers.
"""

import json
import os

import numpy as np
import pytest

from click.testing import CliRunner

from aimnetcentral_tpu.models import AEVConfig, AIMNet2Config, aimnet2_init
from aimnetcentral_tpu.models.heads import (
    AtomicShiftHead,
    AtomicSumHead,
    OutputHead,
)
from aimnetcentral_tpu.models.modules import MLPSpec


def _tiny_cfg():
    return AIMNet2Config(
        aev=AEVConfig(rc_s=5.0, nshifts_s=8),
        nfeature=4,
        d2features=True,
        ncomb_v=4,
        hidden=((16,), (16,), (16,)),
        aim_size=16,
        outputs=(
            (
                "energy_mlp",
                OutputHead(n_in=16, n_out=1, key_in="aim", key_out="energy",
                           mlp=MLPSpec(hidden=(8,), last_linear=True)),
            ),
            ("atomic_shift", AtomicShiftHead(key_in="energy", key_out="energy")),
            ("atomic_sum", AtomicSumHead(key_in="energy", key_out="energy")),
        ),
    )


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Two tiny exported artifacts + a water xyz, shared across CLI tests."""
    import jax

    from aimnetcentral_tpu.train.export import export_model

    d = tmp_path_factory.mktemp("cli")
    cfg = _tiny_cfg()
    paths = []
    for i in range(2):
        p = str(d / f"m{i}.pt")
        export_model(
            aimnet2_init(jax.random.key(i), cfg), cfg, p,
            sae={1: -13.6, 8: -2042.6}, implemented_species=[1, 8],
        )
        paths.append(p)
    xyz = str(d / "water.xyz")
    with open(xyz, "w") as f:
        f.write("3\n\nO 0 0 0.119\nH 0 0.763 -0.477\nH 0 -0.763 -0.477\n")
    return d, paths, xyz


def _run(args):
    from aimnetcentral_tpu.cli import cli

    r = CliRunner().invoke(cli, args)
    assert r.exit_code == 0, (args, r.output, r.exception)
    return r.output


def test_cli_sp(workspace):
    _d, paths, xyz = workspace
    out = _run(["sp", paths[0], xyz])
    assert "energy (eV):" in out and "charges:" in out and "force" in out
    e = float(out.split("energy (eV):")[1].split()[0])
    assert np.isfinite(e)


def test_cli_sp_ensemble_member_list(workspace):
    _d, paths, xyz = workspace
    out = _run(["sp", ",".join(paths), xyz, "--ensemble"])
    assert "ensemble spread" in out
    e, std = out.split("energy (eV):")[1].split("+/-")
    assert np.isfinite(float(e))
    assert float(std.split()[0]) > 0  # independently-initialized members

    # the ensemble mean equals the mean of the two single-model energies
    singles = [
        float(_run(["sp", p, xyz]).split("energy (eV):")[1].split()[0])
        for p in paths
    ]
    assert float(e) == pytest.approx(np.mean(singles), abs=1e-4)


def test_cli_md_ensemble_and_checkpoint(workspace, tmp_path):
    _d, paths, xyz = workspace
    ck = str(tmp_path / "md.ckpt")
    out = _run([
        "md", ",".join(paths), xyz, "--steps", "10", "--chunk", "5",
        "--ensemble", "--save-ckpt", ck,
    ])
    res = json.loads(out.strip().splitlines()[-1])
    assert res["steps"] == 10
    assert np.isfinite(res["final_epot_eV"])
    assert res["final_epot_std_eV"] > 0  # on-device UQ observable
    assert os.path.exists(ck)

    out2 = _run([
        "md", ",".join(paths), xyz, "--steps", "5", "--chunk", "5",
        "--ensemble", "--restore-ckpt", ck,
    ])
    res2 = json.loads(out2.strip().splitlines()[-1])
    assert np.isfinite(res2["final_epot_eV"])


def test_cli_relax(workspace):
    _d, paths, xyz = workspace
    out = _run(["relax", paths[0], xyz, "--max-steps", "20", "--fmax", "0.5"])
    info = json.loads(out.strip().splitlines()[-1])
    assert "fmax" in info or "converged" in info or info  # structured output


def test_cli_neb(workspace, tmp_path):
    """NEB journey (VERDICT r4 next #7): reactant + product xyz in, JSON
    barrier summary + extxyz band out — the same end-to-end standard as
    md/relax/freq."""
    _d, paths, _xyz = workspace
    # bent vs straight water-like triatomic as the two endpoints
    r_xyz = str(tmp_path / "r.xyz")
    p_xyz = str(tmp_path / "p.xyz")
    with open(r_xyz, "w") as f:
        f.write("3\n\nO 0 0 0.119\nH 0 0.763 -0.477\nH 0 -0.763 -0.477\n")
    with open(p_xyz, "w") as f:
        f.write("3\n\nO 0 0 0.119\nH 0 0.963 0.1\nH 0 -0.963 0.1\n")
    band_path = str(tmp_path / "band.extxyz")
    out = _run([
        "neb", paths[0], r_xyz, p_xyz, "--n-images", "5",
        "--max-steps", "10", "--fmax", "0.5", "--band", band_path,
    ])
    info = json.loads(out.strip().splitlines()[-1])
    assert info["n_images"] == 5 and info["steps"] > 0
    assert 1 <= info["i_ts"] <= 3
    assert np.isfinite(info["barrier_eV"])
    assert len(info["energies_rel_eV"]) == 5
    assert info["energies_rel_eV"][0] == 0.0
    # band written: 5 extxyz frames of 3 atoms
    text = open(band_path).read()
    assert text.count("image=") == 5 and info["band"] == band_path


def test_cli_info(workspace):
    out = _run(["info"])
    assert "aimnetcentral_tpu" in out and "devices:" in out
    assert "model cache:" in out


def test_cli_freq(workspace):
    _d, paths, xyz = workspace
    out = _run(["freq", paths[0], xyz, "--n-modes", "6"])
    # six frequencies printed, finite (random weights: values arbitrary,
    # imaginary modes print negative)
    nums = [float(t) for t in out.replace(",", " ").split() if _is_float(t)]
    assert len(nums) >= 3  # water: 3 vibrational modes after null projection
    assert all(np.isfinite(v) for v in nums)


def _is_float(t):
    try:
        float(t)
        return True
    except ValueError:
        return False


def test_cli_train_multi_config_and_dotted_overrides(tmp_path):
    """Reference train-CLI ergonomics (aimnet/train/train.py:33-64): multiple
    --config files merge in order; trailing dotted KEY.PATH=VALUE overrides
    apply last.  Runs a real 2-epoch training on a tiny npz-dir dataset."""
    import yaml as _yaml

    rng = np.random.default_rng(0)
    size, n = 6, 16
    coord = rng.uniform(-2.5, 2.5, size=(n, size, 3)).astype(np.float32)
    numbers = rng.choice([1, 8], size=(n, size))
    energy = coord.sum((1, 2)).astype(np.float32) * 0.01
    ddir = tmp_path / "data"
    ddir.mkdir()
    np.savez(ddir / f"{size:03d}.npz", coord=coord, numbers=numbers,
             energy=energy, charge=np.zeros(n, np.float32))

    model_tree = {
        "class": "aimnet.models.AIMNet2",
        "kwargs": {
            "nfeature": 4, "d2features": True, "ncomb_v": 4,
            "hidden": [[16], [16], [16]], "aim_size": 16,
            "aev": {"rc_s": 5.0, "nshifts_s": 8},
            "outputs": {
                "energy_mlp": {"class": "aimnet.modules.Output",
                               "kwargs": {"n_in": 16, "n_out": 1,
                                          "key_in": "aim", "key_out": "energy",
                                          "mlp": {"hidden": [8],
                                                  "last_linear": True}}},
                "atomic_shift": {"class": "aimnet.modules.AtomicShift",
                                 "kwargs": {"key_in": "energy",
                                            "key_out": "energy"}},
                "atomic_sum": {"class": "aimnet.modules.AtomicSum",
                               "kwargs": {"key_in": "energy",
                                          "key_out": "energy"}},
            },
        },
    }
    base = {
        "model": model_tree,
        "data": {"train": "WRONG-overridden-below", "sae": False},
        "trainer": {"max_epochs": 99, "batch_size": 8, "with_forces": False},
        "loss": {"terms": [{"kind": "energy", "key_pred": "energy",
                            "key_true": "energy", "weight": 1.0}]},
    }
    extra = {"trainer": {"max_epochs": 2}}  # merged OVER base
    p_base, p_extra = tmp_path / "base.yaml", tmp_path / "extra.yaml"
    p_base.write_text(_yaml.safe_dump(base, sort_keys=False))
    p_extra.write_text(_yaml.safe_dump(extra, sort_keys=False))

    exported = str(tmp_path / "trained.pt")
    out = _run([
        "train", "--config", str(p_base), "--config", str(p_extra),
        f"data.train={ddir}", f"export={exported}",
    ])
    res = json.loads(out.strip().splitlines()[-2])
    assert res["epochs"] == 2  # extra.yaml's max_epochs won
    assert np.isfinite(res["best_val"])

    # full journey: the trained-and-exported artifact serves single points
    assert os.path.exists(exported)
    xyz = tmp_path / "mol.xyz"
    xyz.write_text("2\n\nO 0 0 0\nH 0 0 0.97\n")
    sp_out = _run(["sp", exported, str(xyz)])
    assert np.isfinite(float(sp_out.split("energy (eV):")[1].split()[0]))


def test_cli_calc_sae_journey(tmp_path):
    rng = np.random.default_rng(1)
    size, n = 4, 32
    ddir = tmp_path / "data"
    ddir.mkdir()
    numbers = rng.choice([1, 8], size=(n, size))
    # energies built from known per-element SAEs + noise: the regression
    # must recover them
    true_sae = {1: -13.6, 8: -2042.6}
    energy = np.array(
        [sum(true_sae[int(z)] for z in row) for row in numbers],
        dtype=np.float32,
    ) + rng.normal(scale=1e-3, size=n).astype(np.float32)
    np.savez(ddir / f"{size:03d}.npz",
             coord=rng.uniform(-2, 2, size=(n, size, 3)).astype(np.float32),
             numbers=numbers, energy=energy,
             charge=np.zeros(n, np.float32))
    out_yaml = str(tmp_path / "sae.yaml")
    _run(["calc-sae", str(ddir), out_yaml])
    import yaml as _yaml

    sae = _yaml.safe_load(open(out_yaml))
    assert abs(sae[1] - true_sae[1]) < 0.1
    assert abs(sae[8] - true_sae[8]) < 0.1


def test_cli_freq_ir_thermo(workspace):
    _d, paths, xyz = workspace
    out = _run(
        ["freq", paths[0], xyz, "--ir", "--thermo", "--symmetry-number", "2"]
    )
    res = json.loads(out.strip().splitlines()[-1])
    assert "ir_km_mol" in res and len(res["ir_km_mol"]) >= 3
    assert all(np.isfinite(v) and v >= 0 for v in res["ir_km_mol"])
    th = res["thermo"]
    # water ZPE from a random-weights model is arbitrary but positive and
    # finite; the bookkeeping identity g = h - T*s holds up to the CLI's
    # 1e-6 per-field rounding (amplified ~300x through T*s)
    assert th["zpe"] >= 0.0
    assert abs(th["g"] - (th["h"] - th["temperature"] * th["s"])) < 1e-3


def test_cli_md_nve_and_npt_guard(workspace):
    _d, paths, xyz = workspace
    out = _run(["md", paths[0], xyz, "--steps", "20", "--chunk", "10",
                "--thermostat", "nve", "--precision", "balanced"])
    res = json.loads(out.strip().splitlines()[-1])
    assert np.isfinite(res["final_epot_eV"])
    # NPT without a cell is a clear usage error, not a crash
    from aimnetcentral_tpu.cli import cli as _cli

    r = CliRunner().invoke(_cli, ["md", paths[0], xyz, "--pressure-gpa", "1.0"])
    assert r.exit_code != 0
    assert "requires --cell" in (r.output or "")


def test_cli_sp_fast_precision(workspace):
    _d, paths, xyz = workspace
    out = _run(["sp", paths[0], xyz, "--precision", "fast"])
    e_fast = float(out.split("energy (eV):")[1].split()[0])
    e_exact = float(_run(["sp", paths[0], xyz]).split("energy (eV):")[1].split()[0])
    # on CPU both run f32; the knob must not change the contract beyond
    # documented matmul noise
    assert abs(e_fast - e_exact) < 1e-2
