"""Integration of the Pallas stencil-conv kernel with the binned model path.

``conv_pass_pallas`` is a drop-in twin of
``models/engine_binned.py::conv_pass_binned``: same inputs, same outputs,
but the sweep runs in the fused xy-banded Pallas kernel
(kernels/conv_stencil.py — only the (2r+1)^2 xy offsets are grid steps; the
z dimension is a static in-program band).  The gradient is
``jax.custom_vjp`` with ONE fused Pallas mirror-sweep adjoint: grad-a +
receiver-side grad-coord accumulate resident, and the self-side grad-coord
+ lattice-shift adjoint (cell/strain gradients, stress) are reassembled
from the sweep's partner-contribution side output by a static XLA gather
(see ``_conv_acc_bwd``).  Set ``AIMNET_CONV_BWD=xla`` to fall back to
autodiff of the mathematically identical XLA formulation
(``_conv_acc_xla``).

This replaces the reference's Warp K1-K3 family
(aimnet/kernels/conv_sv_2d_sp_wp.py:90-244) INCLUDING double-backward (K3):
``conv_fwd_acc``/``conv_bwd_acc`` carry custom JVP rules whose second-order
tangents route through the XLA twin, so jvp-of-grad (HVPs), jacfwd-of-grad
(dense Hessians) and grad-of-grad (force-training losses) traverse the
production kernels instead of erroring — first order stays fully fused,
second order pays the twin only inside second-order graphs.  Because those
tangents run the twin regardless, second-order-DOMINATED graphs are faster
on the pure XLA engine (measured 2x at 2k-atom HVPs), and the HVP/Hessian/
force-loss builders pin it; K3 exists so arbitrary user transforms of the
default engine are correct, not fast.

Measured (TPU v5e, 10k atoms / 729 bins / C=32): see docs/performance.md —
per-pass fwd+bwd went 51 ms (per-offset grid, round-2 wave 2) -> 30 ms
(full-lane abig tiles) -> banded grid (this file); end-to-end NVT MD and
compile-time numbers are tracked in the docs table.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from aimnetcentral_tpu.ops import binned as B
from aimnetcentral_tpu.system import System

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ConvStatic:
    b_tot: int
    c: int
    g: int
    f: int  # feature columns per g block (padded: model F [+ q channels])
    gamma: int
    s_tot: int  # xy offsets in the program grid ((2r+1)^2)
    t_row: int = 1  # bins per z-row (= nz; row-tiled kernel grid is B/t_row)
    w_band: int = 3  # z band width (2r+1): in-program candidate slots per bin
    # "f32" (default): dots run at the ambient matmul precision (1 bf16 MXU
    # pass under the JAX default; 6 passes under the exact calculator
    # surface's ambient HIGHEST).  "f32x3": hand-split 3x1-pass dots (~1e-5
    # relative, ambient-immune — the calculator's precision="balanced";
    # conv_stencil._mxu_dot).  "bf16": downcast MXU inputs (a measured
    # no-op on this toolchain — Mosaic's default dots already truncate;
    # kept for toolchains whose default differs).
    # Opt-in via AIMNET_CONV_PRECISION or conv_pass_pallas(precision=...).
    precision: str = "f32"

    @property
    def r_tot(self) -> int:
        return self.b_tot // self.t_row


def _conv_acc_xla(
    st: ConvStatic,
    a_gmajor: Array,  # (B, C, G*F)
    coord_t: Array,  # (B, 4, C)
    shift_cart: Array,  # (S, B, 4)
    mask: Array,  # (B, 1, C) f32
    nbr: Array,  # (S, B) int32 (clamped >= 0)
    shifts_g: Array,  # (1, G)
    scal: Array,  # (1, 4) [eta, rc, ...]
) -> Array:
    """XLA twin of the Pallas kernel: identical math, used for the backward
    pass and as the CPU/interpret reference.

    The twin's dots follow the ambient matmul precision — EXCEPT when the
    kernels run the "f32x3" split-dot mode (the "balanced" tier / MD
    conv_precision knob): there the twin pins HIGHEST so the fallback
    backward (AIMNET_CONV_BWD=xla) and the K3 second-order tangents are at
    least as accurate as the ~1e-5 split the user asked for, instead of
    silently reverting to the ambient (possibly 1-pass) dots."""
    if st.precision == "f32x3":
        with jax.default_matmul_precision("highest"):
            return _conv_acc_xla(
                dataclasses.replace(st, precision="f32"),
                a_gmajor, coord_t, shift_cart, mask, nbr, shifts_g, scal,
            )
    c, g, f, gamma = st.c, st.g, st.f, st.gamma
    eta, rc = scal[0, 0], scal[0, 1]
    eyeg = jnp.eye(gamma, dtype=a_gmajor.dtype)
    n_groups = g // gamma

    def body(acc, step):
        nbr_s, shift_s, is_zero = step
        cj = coord_t[nbr_s] + shift_s[:, :, None]  # (B, 4, C)
        ci = coord_t
        d2 = sum(
            (cj[:, k, None, :] - ci[:, k, :, None]) ** 2 for k in range(3)
        )
        real_i = (mask[:, 0] > 0.5)[:, :, None]
        real_j = (mask[nbr_s, 0] > 0.5)[:, None, :]
        diag = jnp.eye(c, dtype=bool)[None]
        vp = real_i & real_j & ~(is_zero & diag)
        d2s = jnp.where(vp, d2, 1.0)
        d = jnp.sqrt(d2s)
        within = vp & (d < rc)
        fc = jnp.where(
            within, 0.5 * (jnp.cos(jnp.minimum(d, rc) * (jnp.pi / rc)) + 1.0), 0.0
        )
        a_cand = a_gmajor[nbr_s]  # (B, C, G*F)

        outs = []
        for gi in range(n_groups):
            # w columns (g2*C + c); rows j = k*C + i
            w_blocks = []
            dd_all = []
            for g2 in range(gamma):
                g_abs = gi * gamma + g2
                dd = d - shifts_g[0, g_abs]
                gs = jnp.exp(-eta * dd * dd) * fc
                dd_all.append(gs)
            gs_g = jnp.stack(dd_all, axis=1)  # (B, gamma, C, C)
            parts = [gs_g]
            for k in range(3):
                uk = (cj[:, k, None, :] - ci[:, k, :, None]) / d
                parts.append(gs_g * uk[:, None])
            # (B, 4, gamma, Ci, Cc) -> (B, 4*C, gamma*C)
            w = jnp.stack(parts, axis=1)
            w = jnp.transpose(w, (0, 1, 3, 2, 4)).reshape(
                -1, 4 * c, gamma * c
            )
            # abig: block-diagonal (gamma*C, gamma*F), block g2 = A_{g_abs}
            a_blocks = jnp.stack(
                [
                    a_gmajor[nbr_s][:, :, (gi * gamma + g2) * f : (gi * gamma + g2 + 1) * f]
                    for g2 in range(gamma)
                ],
                axis=1,
            )  # (B, gamma, C, F)
            abig = (
                a_blocks[:, :, None, :, :] * eyeg[None, :, :, None, None]
            )
            # index order: rows (g2', c), cols (g2, f) with delta(g2, g2')
            abig = jnp.transpose(abig, (0, 2, 3, 1, 4)).reshape(
                -1, gamma * c, gamma * f
            )
            outs.append(jnp.einsum("bjx,bxy->bjy", w, abig))
        out = jnp.concatenate(outs, axis=-1)  # (B, 4C, G*F) g-major
        return acc + out, None

    s_off = shift_cart.shape[0]  # per-offset table length ((2r+1)^3)
    acc0 = jnp.zeros((st.b_tot, 4 * c, g * f), a_gmajor.dtype)
    is_zero = jnp.concatenate(
        [jnp.ones(1, bool), jnp.zeros(s_off - 1, bool)]
    )
    acc, _ = jax.lax.scan(
        lambda a_, s_: body(a_, s_), acc0, (nbr, shift_cart, is_zero)
    )
    return acc


def _pallas_forward(
    st, a_gmajor, coord_t, shift_band, mask, row_flat, shifts_g, scal
):
    from aimnetcentral_tpu.kernels.conv_stencil import conv_stencil_forward

    return conv_stencil_forward(
        row_flat,
        coord_t,
        mask,
        a_gmajor,
        shift_band,
        shifts_g,
        scal,
        r_tot=st.r_tot,
        t_row=st.t_row,
        c=st.c,
        g=st.g,
        f=st.f,
        gamma=st.gamma,
        w_band=st.w_band,
        precision=st.precision,
    )


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def conv_fwd_acc(
    st, a_gmajor, coord_t, shift_band, shift_cart, mask, row_flat, nbr,
    shifts_g, scal,
):
    """The Pallas forward, differentiable in FORWARD mode: its custom JVP
    routes tangents through the XLA twin, so the primal call that lives
    inside gradient graphs (residual recomputation) survives jvp-of-grad
    (HVPs), jacfwd-of-grad (Hessians) and grad-of-grad (force losses) —
    the other half of the reference's K3 story (conv_sv_2d_sp_wp.py:167-244)."""
    return _pallas_forward(
        st, a_gmajor, coord_t, shift_band, mask, row_flat, shifts_g, scal
    )


@conv_fwd_acc.defjvp
def _conv_fwd_acc_jvp(st, primals, tangents):
    (
        a_gmajor, coord_t, shift_band, shift_cart, mask, row_flat, nbr,
        shifts_g, scal,
    ) = primals
    ta, tc, _tsb, tsc = tangents[:4]
    primal_out = conv_fwd_acc(st, *primals)
    # the twin's shift dependence rides shift_cart (the same cell function
    # as shift_band), so tangents through it are complete
    _, tangent_out = jax.jvp(
        lambda a_, c_, s_: _conv_acc_xla(
            st, a_, c_, s_, mask, nbr, shifts_g, scal
        ),
        (a_gmajor, coord_t, shift_cart),
        (ta, tc, tsc),
    )
    return primal_out, tangent_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def conv_acc(
    st: ConvStatic,
    a_gmajor,
    coord_t,
    shift_band,
    mask,
    row_flat,
    mrow_flat,
    pinv,
    pvalid,
    band2off,
    nbr,
    shift_cart,
    mshift_band,
    shifts_g,
    scal,
):
    """Pallas xy-banded stencil conv with ONE fused Pallas adjoint sweep.

    ``row_flat`` is the flattened xy-offset row table
    (ops/binned.py::xy_band_tables); ``mrow_flat`` its receiver-centric
    mirror, used only by the backward sweep so every write stays resident
    in its own row's output block instead of scattering (the TPU-native
    answer to the reference's atomic-add scatter backward,
    kernels/conv_sv_2d_sp_wp.py:115-164).  ``shift_band``/``mshift_band``
    ((S, R, T, W, 4)) carry the banded lattice shifts and are the
    differentiable path to cell/strain gradients.  ``pinv``/``pvalid`` are
    the STATIC inverse tables ((S*W*B,) int32 / (S, W, B) f32) that turn
    the sweep's partner-contribution side output into the self-side
    coordinate and lattice-shift adjoints with one GATHER — scatters lower
    to serial loops on TPU and are avoided everywhere on the hot path.
    ``nbr``/``shift_cart`` are the per-OFFSET tables: they feed the XLA-twin
    fallback backward (AIMNET_CONV_BWD=xla) and the SECOND-ORDER tangents
    of the Pallas backward (see ``conv_bwd_acc``); ``band2off`` is the
    static (S, W) -> per-offset index map between the two shift frames.
    """
    return conv_fwd_acc(
        st, a_gmajor, coord_t, shift_band, shift_cart, mask, row_flat, nbr,
        shifts_g, scal,
    )


def _conv_acc_fwd(
    st, a_gmajor, coord_t, shift_band, mask, row_flat, mrow_flat,
    pinv, pvalid, band2off, nbr, shift_cart, mshift_band, shifts_g, scal,
):
    out = conv_fwd_acc(
        st, a_gmajor, coord_t, shift_band, shift_cart, mask, row_flat, nbr,
        shifts_g, scal,
    )
    return out, (
        a_gmajor, coord_t, shift_band, mask, row_flat, mrow_flat,
        pinv, pvalid, band2off, nbr, shift_cart, mshift_band, shifts_g, scal,
    )


def _conv_acc_bwd(st, res, g_out):
    import os

    (
        a_gmajor, coord_t, shift_band, mask, row_flat, mrow_flat,
        pinv, pvalid, band2off, nbr, shift_cart, mshift_band, shifts_g, scal,
    ) = res
    ds_band = jnp.zeros_like(shift_band)
    ds_cart = jnp.zeros_like(shift_cart)
    if os.environ.get("AIMNET_CONV_BWD", "pallas") == "xla":
        _, vjp = jax.vjp(
            lambda a_, c_, s_: _conv_acc_xla(st, a_, c_, s_, mask, nbr, shifts_g, scal),
            a_gmajor,
            coord_t,
            shift_cart,
        )
        da, dc, ds_cart = vjp(g_out)
    else:
        da, dc, ds_band = conv_bwd_acc(
            st, a_gmajor, coord_t, g_out, mshift_band, shift_cart,
            mask, mrow_flat, pinv, pvalid, band2off, nbr, shifts_g, scal,
        )
    return (
        da,
        dc,
        ds_band,
        jnp.zeros_like(mask),
        jnp.zeros_like(row_flat),
        jnp.zeros_like(mrow_flat),
        jnp.zeros_like(pinv),
        jnp.zeros_like(pvalid),
        jnp.zeros_like(band2off),
        jnp.zeros_like(nbr),
        ds_cart,
        jnp.zeros_like(mshift_band),
        jnp.zeros_like(shifts_g),
        jnp.zeros_like(scal),
    )


conv_acc.defvjp(_conv_acc_fwd, _conv_acc_bwd)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def conv_bwd_acc(
    st, a_gmajor, coord_t, g_out, mshift_band, shift_cart,
    mask, mrow_flat, pinv, pvalid, band2off, nbr, shifts_g, scal,
):
    """First-order conv adjoint on the fused Pallas kernels, differentiable
    ONE more time: the custom JVP below routes second-order tangents
    through the XLA twin's vjp.  This is the TPU answer to the reference's
    double-backward kernel family K3 (conv_sv_2d_sp_wp.py:167-244) — it is
    what lets jvp-of-grad (HVPs), jacfwd-of-grad (Hessians), and
    grad-of-grad (force-training losses) traverse the production conv
    instead of pinning the XLA engine."""
    from aimnetcentral_tpu.kernels.conv_stencil import conv_stencil_bwd_banded

    da, dc_cand, pgrad = conv_stencil_bwd_banded(
        mrow_flat,
        coord_t,
        mask,
        a_gmajor,
        g_out,
        mshift_band,
        shifts_g,
        scal,
        r_tot=st.r_tot, t_row=st.t_row, c=st.c, g=st.g, f=st.f,
        gamma=st.gamma, w_band=st.w_band, precision=st.precision,
    )
    # reassemble the partner(self)-side adjoints with one static GATHER:
    # pinv[s, w, b] flat-indexes the (S*R*T*W, 4, C) side output at the
    # receiver slot whose forward-(s, w) partner bin is b (pvalid masks
    # entries with no receiver — gas-phase grid boundaries).
    pg = pgrad.reshape(-1, 4, st.c)  # (S*R*T*W, 4, C)
    taken = jnp.take(pg, pinv, axis=0).reshape(
        st.s_tot, st.w_band, st.b_tot, 4, st.c
    ) * pvalid[:, :, :, None, None]
    dc = dc_cand + taken.sum((0, 1))  # self-side coordinate adjoint
    # lattice-shift adjoint (forward frame, index (s, self bin, w)): the
    # total pair sum = -(lane sum of the partner contribution).
    ds_swb = -taken.sum(-1)  # (S, W, B, 4)
    ds_band = ds_swb.reshape(
        st.s_tot, st.w_band, st.r_tot, st.t_row, 4
    ).transpose(0, 2, 3, 1, 4)  # (S, R, T, W, 4)
    return da, dc, ds_band


@conv_bwd_acc.defjvp
def _conv_bwd_acc_jvp(st, primals, tangents):
    """Second-order rule (K3): tangents of the adjoint via the XLA twin.

    The primal stays on the fused Pallas kernels; the tangent is the jvp of
    the mathematically identical XLA formulation's vjp — exact, and only
    materialized inside second-order graphs (HVP/Hessian/force-loss).  The
    twin's per-offset lattice-shift frame is mapped back to the banded
    frame by the static ``band2off`` index table."""
    (
        a_gmajor, coord_t, g_out, mshift_band, shift_cart,
        mask, mrow_flat, pinv, pvalid, band2off, nbr, shifts_g, scal,
    ) = primals
    ta, tc, tg, _tms, tsc = tangents[:5]
    primal_out = conv_bwd_acc(
        st, a_gmajor, coord_t, g_out, mshift_band, shift_cart,
        mask, mrow_flat, pinv, pvalid, band2off, nbr, shifts_g, scal,
    )

    def twin_vjp(a_, c_, s_, g_):
        _, vjp = jax.vjp(
            lambda a2, c2, s2: _conv_acc_xla(
                st, a2, c2, s2, mask, nbr, shifts_g, scal
            ),
            a_, c_, s_,
        )
        return vjp(g_)

    _, (tda, tdc, tds_cart) = jax.jvp(
        twin_vjp,
        (a_gmajor, coord_t, shift_cart, g_out),
        (ta, tc, tsc, tg),
    )
    # per-offset (S_off, B, 4) -> banded (S, R, T, W, 4): offset index
    # band2off[s, w] carries (dx[s], dy[s], dz = w - r_mid)
    tds_band = (
        jnp.take(tds_cart, band2off.reshape(-1), axis=0)
        .reshape(st.s_tot, st.w_band, st.r_tot, st.t_row, 4)
        .transpose(0, 2, 3, 1, 4)
    )
    return primal_out, (tda, tdc, tds_band)


def build_conv_tables(grid, radius: int, cell0: Array | None) -> dict:
    """Device operand tables for ``conv_acc`` (shared with tests).

    Per-OFFSET tables (``nbr``/``shift_cart``) feed the XLA-twin fallback
    backward; the xy-banded tables (ops/binned.py::xy_band_tables) feed the
    Pallas kernels.  All lattice shifts are built from host wrap tables via
    an exact-precision einsum with the cell — the differentiable path for
    cell/strain gradients — with invalid gas-phase probes pushed out of
    range by +1e6.
    """
    b_tot = grid.total_bins
    t_row = grid.nbins[2]
    dtype = jnp.float32

    nbr_np, wrap_np, _zero = B.stencil_tables(grid, radius)
    s_off = nbr_np.shape[0]
    invalid = nbr_np < 0
    nbr = jnp.asarray(np.where(invalid, 0, nbr_np))
    if cell0 is not None:
        shift3 = jnp.einsum(
            "sbk,kh->sbh", jnp.asarray(wrap_np), cell0,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        shift3 = jnp.zeros((s_off, b_tot, 3), dtype)
    if invalid.any():
        shift3 = shift3 + jnp.asarray(invalid[..., None].astype(np.float32)) * 1e6
    shift_cart = jnp.concatenate(
        [shift3, jnp.zeros((s_off, b_tot, 1), dtype)], axis=-1
    )

    bt = B.xy_band_tables(grid, radius)
    s_tot, w_band = int(bt["s_tot"]), int(bt["w_tot"])
    r_tot_ = bt["xyrow"].shape[1]

    # static (S, W) -> per-offset index map between the banded and
    # per-offset lattice-shift frames (feeds the K3 second-order rule)
    offs3 = B.stencil_offsets(radius)
    off_idx = {tuple(o): i for i, o in enumerate(offs3)}
    band2off_np = np.zeros((s_tot, w_band), np.int32)
    for s_i, (dx, dy) in enumerate(bt["offs2"]):
        for w_i in range(w_band):
            band2off_np[s_i, w_i] = off_idx[(int(dx), int(dy), w_i - radius)]

    def _band_shift(wrap_np5, valid_np4):
        if cell0 is not None:
            sh = jnp.einsum(
                "srtwk,kh->srtwh", jnp.asarray(wrap_np5), cell0,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            sh = jnp.zeros((s_tot, r_tot_, t_row, w_band, 3), dtype)
        push = ~valid_np4
        if push.any():
            sh = sh + jnp.asarray(push[..., None].astype(np.float32)) * 1e6
        return jnp.concatenate(
            [sh, jnp.zeros((s_tot, r_tot_, t_row, w_band, 1), dtype)], axis=-1
        )

    return {
        "nbr": nbr,
        "shift_cart": shift_cart,
        "row_flat": jnp.asarray(
            np.where(bt["xyrow"] < 0, 0, bt["xyrow"]).reshape(-1)
        ),
        "mrow_flat": jnp.asarray(
            np.where(bt["mxyrow"] < 0, 0, bt["mxyrow"]).reshape(-1)
        ),
        "shift_band": _band_shift(bt["wrap"], bt["valid"]),
        "mshift_band": _band_shift(bt["mwrap"], bt["mvalid"]),
        "pinv": jnp.asarray(bt["pinv"].reshape(-1)),
        "pvalid": jnp.asarray(bt["pvalid"]),
        "band2off": jnp.asarray(band2off_np),
        "s_tot": s_tot,
        "w_band": w_band,
    }


def conv_pass_pallas(
    system: System,
    aev: dict[str, Array],
    a: Array,  # (L, F, G)
    q: Array | None,
    agh_a: Array,
    agh_q: Array | None,
    rc_static: float,
    interpret_xla: bool = False,
    precision: str | None = None,
) -> tuple[Array, Array | None]:
    """Pallas-accelerated twin of conv_pass_binned (d2features models).

    ``precision``: kernel MXU precision mode — "f32" (default; dots run at
    the ambient matmul precision), "f32x3" (hand-split 3x1-pass dots,
    ~1e-5 relative, the calculator's ``precision="balanced"`` tier —
    conv_stencil._mxu_dot), or "bf16".  ``None`` reads
    ``AIMNET_CONV_PRECISION``."""
    grid = system.bins
    assert grid is not None
    from aimnetcentral_tpu.models.engine_binned import stencil_radius

    cell0 = system.cell[0] if system.cell is not None else None
    radius = stencil_radius(rc_static, grid, cell0)

    b_tot, c = grid.total_bins, grid.capacity
    lshape = a.shape[0]
    f_dim = a.shape[1]
    g_dim = a.shape[2]
    cq = q.shape[1] if q is not None else 0
    # Joint (gamma, f_pad) choice.  Constraints: gamma divides G; the
    # per-group column width gamma*f_pad must be a 128-lane multiple (keeps
    # every group slice tile-aligned).  The block-diagonal matmul computes
    # gamma*f_pad-proportional FLOPs, so minimize that work — but ONLY among
    # gammas with gamma*C >= 128 when possible: the backward's adjoint dots
    # have gamma*C-sized dims, and starving them costs more than the saved
    # zero-fill (measured on the member-stacked ensemble conv at f=128:
    # fwd+bwd 95 ms at gamma=1 vs 66 ms at gamma=4 — docs/performance.md).
    # Single-model behavior is unchanged (f_pad 16->gamma 8, 32->gamma 4);
    # the 4-member ensemble gets gamma=4 with f_pad=96 instead of 128 (the
    # q channels no longer pad all the way to f_dim).  Overridable for
    # experiments via AIMNET_CONV_GAMMA.
    import os as _os

    f_min = f_dim + cq

    def _f_for(cand_g: int) -> int:
        step = 128 // math.gcd(cand_g, 128)  # smallest f with g*f % 128 == 0
        return max(step, ((f_min + step - 1) // step) * step)

    _gamma_env = _os.environ.get("AIMNET_CONV_GAMMA")
    if _gamma_env:
        gamma = int(_gamma_env)
        f_pad = _f_for(gamma)
    else:
        cands = [cg for cg in (1, 2, 4, 8, 16) if g_dim % cg == 0]
        gamma = min(
            cands,
            key=lambda cg: (cg * c < 128, cg * _f_for(cg), -cg),
        )
        f_pad = _f_for(gamma)

    ops = build_conv_tables(grid, radius, cell0)
    nbr, shift_cart = ops["nbr"], ops["shift_cart"]
    row_flat, mrow_flat = ops["row_flat"], ops["mrow_flat"]
    shift_band, mshift_band = ops["shift_band"], ops["mshift_band"]
    pinv, pvalid, band2off = ops["pinv"], ops["pvalid"], ops["band2off"]
    s_tot, w_band, t_row = ops["s_tot"], ops["w_band"], grid.nbins[2]

    coord_t = jnp.concatenate(
        [
            system.coord.reshape(b_tot, c, 3).transpose(0, 2, 1),
            jnp.zeros((b_tot, 1, c), a.dtype),
        ],
        axis=1,
    )  # (B, 4, C)
    mask = (system.numbers > 0).astype(a.dtype).reshape(b_tot, 1, c)

    # g-major features, q channels appended into each g block
    a_gm = a.transpose(0, 2, 1)  # (L, G, F)
    if q is not None:
        qb = jnp.broadcast_to(q[:, None, :], (lshape, g_dim, cq))
        pad = jnp.zeros((lshape, g_dim, f_pad - f_dim - cq), a.dtype)
        a_gm = jnp.concatenate([a_gm, qb, pad], axis=-1)
    a_gmajor = a_gm.reshape(b_tot, c, g_dim * f_pad)

    shifts_g = aev["shifts_s"].reshape(1, g_dim)
    scal = jnp.stack(
        [aev["eta_s"], aev["rc_s"], jnp.float32(0.0), jnp.float32(0.0)]
    ).reshape(1, 4)

    import os

    st = ConvStatic(
        b_tot=b_tot, c=c, g=g_dim, f=f_pad, gamma=gamma, s_tot=s_tot,
        t_row=t_row, w_band=w_band,
        precision=precision or os.environ.get("AIMNET_CONV_PRECISION", "f32"),
    )
    if interpret_xla:
        acc = _conv_acc_xla(
            st, a_gmajor, coord_t, shift_cart, mask, nbr, shifts_g, scal
        )
    else:
        acc = conv_acc(
            st, a_gmajor, coord_t, shift_band, mask, row_flat, mrow_flat,
            pinv, pvalid, band2off, nbr, shift_cart, mshift_band, shifts_g,
            scal,
        )

    # --- post-process: split (g-major) acc into scalar + vector parts
    acc = acc.reshape(b_tot, 4, c, g_dim, f_pad)

    def combine(sl, agh, nch):
        avf = acc[..., sl]  # (B, 4, C, G, nch)
        avf_s = avf[:, 0].reshape(lshape, g_dim, nch).transpose(0, 2, 1)  # (L, nch, G)
        avf_v = jnp.moveaxis(avf[:, 1:4], 1, -1).reshape(
            lshape, g_dim, nch, 3
        ).transpose(0, 2, 1, 3)  # (L, nch, G, 3)
        comb = jnp.einsum("fgh,lfgd->lfhd", agh, avf_v)
        vv = (comb * comb).sum(-1)
        return jnp.concatenate(
            [avf_s.reshape(lshape, -1), vv.reshape(lshape, -1)], axis=-1
        )

    out_a = combine(slice(0, f_dim), agh_a, f_dim)
    out_q = (
        combine(slice(f_dim, f_dim + cq), agh_q, cq) if q is not None else None
    )
    return out_a, out_q
