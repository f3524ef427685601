"""The AIMNet2 network — TPU-native functional implementation.

Architecture parity with reference aimnet/models/aimnet2.py:141-187:
element embedding -> shifted-Gaussian scalar+vector AEV -> iterative message
passes (pass 0 predicts charges, middle passes update charges and features by
deltas, final pass emits the ``aim`` vector) -> config-driven output heads.
NSE charge equilibration enforces exact total charge per molecule every pass.

All compute is float32, static-shaped, and jit-compatible; one flat padded
layout (see aimnetcentral_tpu/system.py).  The hot contraction (ConvSV) is a
neighbor gather + einsum that XLA maps onto the MXU; a Pallas fused
gather-contraction kernel can replace it transparently for large systems
(reference's Warp kernel K1, aimnet/kernels/conv_sv_2d_sp_wp.py:90-113).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from aimnetcentral_tpu.models.heads import HeadSpec, head_apply, head_init
from aimnetcentral_tpu.models.modules import MLPSpec, mlp_apply, mlp_init, orthogonal_embedding_init
from aimnetcentral_tpu.ops import math as aops
from aimnetcentral_tpu.ops import nb as nbops
from aimnetcentral_tpu.system import System

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AEVConfig:
    """(reference aimnet/modules/aev.py:37-64)"""

    rmin: float = 0.8
    rc_s: float = 5.0
    nshifts_s: int = 16
    eta_s: float | None = None

    @property
    def eta(self) -> float:
        if self.eta_s is not None:
            return self.eta_s
        return (1.0 / ((self.rc_s - self.rmin) / self.nshifts_s)) ** 2

    def shifts(self) -> np.ndarray:
        return np.linspace(self.rmin, self.rc_s, self.nshifts_s + 1, dtype=np.float32)[
            : self.nshifts_s
        ]


@dataclasses.dataclass(frozen=True)
class AIMNet2Config:
    aev: AEVConfig = AEVConfig()
    nfeature: int = 16
    d2features: bool = True
    ncomb_v: int = 12
    hidden: tuple[tuple[int, ...], ...] = ((512, 380), (512, 380), (512, 380, 380))
    aim_size: int = 256
    num_charge_channels: int = 1
    outputs: tuple[tuple[str, HeadSpec], ...] = ()

    @property
    def nshifts(self) -> int:
        return self.aev.nshifts_s

    @property
    def nfeature_tot(self) -> int:
        return self.nfeature * self.nshifts if self.d2features else self.nfeature

    def conv_a_size(self) -> int:
        return self.nfeature * self.nshifts + self.nfeature * self.ncomb_v

    def conv_q_size(self) -> int:
        c = self.num_charge_channels
        return c * self.nshifts + c * self.ncomb_v


# ---------------------------------------------------------------------------
# init


def _init_agh(rng: np.random.Generator, nchannel: int, m: int, n: int) -> np.ndarray:
    """Maxmin-orthogonal init of the vector-combination tensor
    (reference aimnet/modules/aev.py:192-221), numpy port."""
    out = np.zeros((nchannel, m, n), dtype=np.float32)
    x = np.arange(m)[None, :]
    for c in range(nchannel):
        coeff = rng.standard_normal((8 * n, 4))[:, None, :]
        a1, a2, a3, a4 = coeff[..., 0], coeff[..., 1], coeff[..., 2], coeff[..., 3]
        y = a1 * np.sin(a2 * 2 * x * math.pi / m) + a3 * np.cos(a4 * 2 * x * math.pi / m)
        y = y - y.mean(-1, keepdims=True)
        y = y / y.std(-1, keepdims=True)
        dmat = np.linalg.norm(y[:, None, :] - y[None, :, :], axis=-1)
        ret = np.zeros((n, m))
        mask = np.ones(y.shape[0], dtype=bool)
        i = int(dmat.sum(-1).argmax())
        ret[0] = y[i]
        mask[i] = False
        for j in range(1, n):
            d = np.linalg.norm(ret[:j, None, :] - y[None, :, :], axis=-1).min(axis=0)
            order = np.argsort(d)
            maxidx = int(order[mask[order]][-1])
            ret[j] = y[maxidx]
            mask[maxidx] = False
        out[c] = ret.T
    return out


def aimnet2_init(rng: Array, cfg: AIMNet2Config, seed: int = 0) -> dict:
    """Build a randomly initialized parameter pytree matching the reference's
    init scheme (reference aimnet/models/aimnet2.py:43-84)."""
    nprng = np.random.default_rng(seed)
    rngs = jax.random.split(rng, 8 + len(cfg.hidden) + len(cfg.outputs))
    it = iter(rngs)

    afv = orthogonal_embedding_init(next(it), 64, cfg.nfeature)
    if cfg.d2features:
        afv = jnp.repeat(afv[:, :, None], cfg.nshifts, axis=2).reshape(64, cfg.nfeature_tot)

    params: dict = {
        "afv": {"weight": afv},
        "aev": {
            "rc_s": jnp.float32(cfg.aev.rc_s),
            "eta_s": jnp.float32(cfg.aev.eta),
            "shifts_s": jnp.asarray(cfg.aev.shifts()),
        },
        "conv_a": {"agh": jnp.asarray(_init_agh(nprng, cfg.nfeature, cfg.nshifts, cfg.ncomb_v))},
        "conv_q": {
            "agh": jnp.asarray(_init_agh(nprng, cfg.num_charge_channels, cfg.nshifts, cfg.ncomb_v))
        },
    }

    c = cfg.num_charge_channels
    mlps = []
    n_in0 = cfg.conv_a_size() + cfg.nfeature_tot
    mlps.append(
        mlp_init(
            next(it),
            n_in0,
            cfg.nfeature_tot + 2 * c,
            MLPSpec(hidden=cfg.hidden[0], last_linear=True),
        )
    )
    n_in = cfg.conv_a_size() + cfg.conv_q_size() + cfg.nfeature_tot + c
    for h in cfg.hidden[1:-1]:
        mlps.append(
            mlp_init(
                next(it), n_in, cfg.nfeature_tot + 2 * c, MLPSpec(hidden=h, last_linear=False)
            )
        )
    mlps.append(
        mlp_init(
            next(it), n_in, cfg.aim_size, MLPSpec(hidden=cfg.hidden[-1], last_linear=False)
        )
    )
    params["mlps"] = mlps
    params["outputs"] = {name: head_init(next(it), head) for name, head in cfg.outputs}
    return params


def mlp_spec_for_pass(cfg: AIMNet2Config, ipass: int) -> MLPSpec:
    last_linear = ipass == 0
    return MLPSpec(hidden=cfg.hidden[ipass], last_linear=last_linear)


# ---------------------------------------------------------------------------
# forward


def _calc_aev(params: dict, cfg: AIMNet2Config, d_ij: Array, r_ij: Array, valid: Array) -> Array:
    """Scalar+vector atomic environment vectors, (N, M, G, 4)
    (reference aimnet/modules/aev.py:94-110)."""
    p = params["aev"]
    fc = aops.cosine_cutoff(d_ij, p["rc_s"])
    fc = jnp.where(valid, fc, 0.0)
    gs = aops.exp_expand(d_ij, p["shifts_s"], p["eta_s"]) * fc[..., None]  # (N, M, G)
    u = r_ij / d_ij[..., None]
    gv = gs[..., None] * u[..., None, :]  # (N, M, G, 3)
    return jnp.concatenate([gs[..., None], gv], axis=-1)


def _conv_sv(agh: Array, a: Array, g_sv: Array, nbmat: Array, d2features: bool) -> Array:
    """AIMNet2 convolution: gather neighbor features and contract with the
    environment basis (reference aimnet/modules/aev.py:156-189).

    a: (N, C, G) if d2features else (N, C); g_sv: (N, M, G, 4); agh: (C, G, H).
    Returns (N, C*G + C*H).
    """
    a_j = nbops.gather_nb(a, nbmat)
    if d2features:
        avf = jnp.einsum("nmcg,nmgd->ncgd", a_j, g_sv)
    else:
        avf = jnp.einsum("nmc,nmgd->ncgd", a_j, g_sv)
    avf_s = avf[..., 0]  # (N, C, G)
    avf_v = jnp.einsum("cgh,ncgd->nchd", agh, avf[..., 1:])
    avf_v = (avf_v * avf_v).sum(-1)  # (N, C, H)
    n = a.shape[0]
    return jnp.concatenate([avf_s.reshape(n, -1), avf_v.reshape(n, -1)], axis=-1)


def _resolve_conv_engine(cfg: AIMNet2Config, conv_engine: str | None) -> str:
    """Pick the binned ConvSV implementation.

    ``auto`` routes d2features models to the fused Pallas kernel on TPU
    backends (forward + dedicated adjoint sweeps, kernels/conv_stencil.py)
    and keeps the XLA stencil-roll engine elsewhere.  Override per-call or
    with ``AIMNET_CONV_ENGINE={auto,pallas,xla}``.
    """
    import os

    engine = conv_engine or os.environ.get("AIMNET_CONV_ENGINE", "auto")
    if engine == "auto":
        from aimnetcentral_tpu.kernels.conv_stencil import conv_stencil_available

        use_pallas = (
            cfg.d2features
            and conv_stencil_available()
            and jax.default_backend() == "tpu"
        )
        return "pallas" if use_pallas else "xla"
    if engine == "pallas" and not cfg.d2features:
        return "xla"  # the fused kernel assumes (L, F, G) features
    return engine


def check_conv_precision(engine: str, conv_precision: str | None) -> None:
    """Validate a requested conv-kernel precision mode and refuse to drop it
    SILENTLY: the knob only exists inside the Pallas kernels, and a user who
    asked for "f32x3" (drift-sensitive MD, the "balanced" facade tier) must
    hear when the conv runs on the XLA engine instead (non-binned system,
    molecule-bin layout, capacity > 56, non-TPU backend) — there the conv
    follows the AMBIENT matmul precision (exact under the facade's
    "balanced"/"exact" ambient; 1-pass bf16 under MD's default).
    Trace-time; the warning dedupes per process."""
    if conv_precision is None:
        return
    if conv_precision not in ("f32", "f32x3", "bf16"):
        raise ValueError(
            f"conv_precision must be 'f32', 'f32x3' or 'bf16', got "
            f"{conv_precision!r}"
        )
    if engine != "pallas":
        import warnings

        warnings.warn(
            f"conv_precision={conv_precision!r} requested but the conv runs "
            f"on the {engine!r} engine - it follows the ambient matmul "
            "precision instead",
            stacklevel=3,
        )


def aimnet2_apply(
    params: dict,
    cfg: AIMNet2Config,
    system: System,
    sae_external: bool = False,
    conv_engine: str | None = None,
    conv_precision: str | None = None,
) -> dict:
    """Full forward pass.  Returns the output data bus with at least:
    ``energy`` (num_mol,) eV [without SAE when ``sae_external``],
    ``charges`` (N,), ``aim`` (N, aim_size), ``_delta_Q`` (num_mol, C),
    and ``mol_element_counts`` when SAE is externalized.

    ``conv_precision``: MXU precision mode for the Pallas conv kernels
    ("f32"/"f32x3"/"bf16"; None reads AIMNET_CONV_PRECISION) — the
    calculator's ``precision="balanced"`` passes "f32x3" here.
    """
    n = system.natoms
    c = cfg.num_charge_channels

    a = params["afv"]["weight"][system.numbers]
    if cfg.d2features:
        a = a.reshape(n, cfg.nfeature, cfg.nshifts)

    # total-charge channels (reference aimnet/models/aimnet2.py:94-106,151-155)
    if c == 2:
        if system.mult is None:
            raise ValueError("mult is required for NSE (two charge channel) models")
        half_spin = 0.5 * (system.mult - 1.0)
        half_q = 0.5 * system.charge
        big_q = jnp.stack([half_q + half_spin, half_q - half_spin], axis=-1)
    else:
        big_q = system.charge[:, None]

    binned = system.bins is not None
    if binned:
        data: dict = {"_sae_external": sae_external}
    else:
        d_ij, r_ij = aops.calc_distances(
            system.coord, system.nbmat, system.shifts, system.cell, system.mol_idx
        )
        valid = nbops.pair_mask(system.nbmat)
        g_sv = _calc_aev(params, cfg, d_ij, r_ij, valid)
        data = {"d_ij": d_ij, "g_sv": g_sv, "_sae_external": sae_external}

    charges = None
    delta_q_log = []
    npass = len(cfg.hidden)
    a_flat = a.reshape(n, -1) if cfg.d2features else a

    engine = _resolve_conv_engine(cfg, conv_engine) if binned else "xla"
    if engine == "pallas" and system.bins is not None and system.bins.molecule_bins:
        # molecule-bin packed layout (radius-0 training batches): the fused
        # stencil kernels assume spatial grids; the XLA engine's single
        # within-bin block pass is already the right formulation here
        engine = "xla"
    if (
        engine == "pallas"
        and system.bins is not None
        and system.bins.capacity > 56
    ):
        # Mosaic fails to lower the banded conv kernels at bin capacities
        # >= 64 ("Input offsets outside of the first tile" — measured
        # boundary: C=56 compiles, C=64 does not, independent of nz).
        # Large capacities arise from small boxes (few bins at the
        # radius-1 edge) where the XLA engine is close anyway.
        engine = "xla"
    check_conv_precision(engine, conv_precision)

    for ipass in range(npass):
        if binned:
            if engine == "pallas":
                from aimnetcentral_tpu.kernels.conv_pallas import conv_pass_pallas

                conv_a, conv_q = conv_pass_pallas(
                    system,
                    params["aev"],
                    a,
                    charges if ipass > 0 else None,
                    params["conv_a"]["agh"],
                    params["conv_q"]["agh"],
                    rc_static=cfg.aev.rc_s,
                    precision=conv_precision,
                )
            else:
                from aimnetcentral_tpu.models.engine_binned import conv_pass_binned

                conv_a, conv_q = conv_pass_binned(
                    system,
                    params["aev"],
                    a,
                    charges if ipass > 0 else None,
                    params["conv_a"]["agh"],
                    params["conv_q"]["agh"],
                    cfg.d2features,
                    rc_static=cfg.aev.rc_s,
                )
        else:
            conv_a = _conv_sv(
                params["conv_a"]["agh"], a, g_sv, system.nbmat, cfg.d2features
            )
            conv_q = (
                _conv_sv(params["conv_q"]["agh"], charges, g_sv, system.nbmat, False)
                if ipass > 0
                else None
            )
        if ipass == 0:
            x = jnp.concatenate([a_flat, conv_a], axis=-1)
        else:
            x = jnp.concatenate([a_flat, conv_a, charges, conv_q], axis=-1)

        out = mlp_apply(params["mlps"][ipass], x, mlp_spec_for_pass(cfg, ipass))
        out = nbops.mask_pad_atoms(out, system.numbers)

        if ipass == npass - 1:
            data["aim"] = out
        else:
            # charge + feature update (reference aimnet/models/aimnet2.py:122-139)
            _q, _f, delta_a = (
                out[..., :c],
                out[..., c : 2 * c],
                out[..., 2 * c :],
            )
            delta_q_log.append(big_q - nbops.mol_sum(_q, system.mol_idx, system.num_mol))
            q = _q if ipass == 0 else charges + _q
            f = _f * _f
            q, _dq = aops.nse(big_q, q, f, system.mol_idx, system.num_mol)
            charges = q
            a = a + delta_a.reshape(a.shape)
            a_flat = a.reshape(n, -1) if cfg.d2features else a

    if c == 2:
        data["spin_charges"] = charges[..., 0] - charges[..., 1]
        data["charges"] = charges.sum(axis=-1)
    else:
        data["charges"] = charges.squeeze(-1)
    data["_delta_Q"] = jnp.stack(delta_q_log, axis=0) if delta_q_log else None

    for name, head in cfg.outputs:
        data = head_apply(head, params["outputs"][name], data, system)

    return data
