"""Integration of the Pallas stencil-conv kernel with the binned model path.

``conv_pass_pallas`` is a drop-in twin of
``models/engine_binned.py::conv_pass_binned``: same inputs, same outputs,
but the offset sweep runs in the fused Pallas kernel (kernels/conv_stencil.py).
The gradient is ``jax.custom_vjp`` with ONE fused Pallas mirror-sweep adjoint:
grad-a + candidate-side grad-coord accumulate resident, and the self-side
grad-coord + lattice-shift adjoint (cell/strain gradients, stress) are
reassembled from the sweep's partner-contribution side output by a static
XLA scatter-add (see ``_conv_acc_bwd``).  Set ``AIMNET_CONV_BWD=xla`` to
fall back to autodiff of the mathematically identical XLA formulation
(``_conv_acc_xla``).

This replaces the reference's Warp K1-K3 family
(aimnet/kernels/conv_sv_2d_sp_wp.py:90-244); double-backward (K3) is not
needed here because Hessian/HVP paths run on the indexed layout.

Measured (TPU v5e, 10k atoms / 512 bins / C=40): fwd 24 ms, fwd+bwd 88 ms
per pass vs 166 ms for the XLA stencil-roll formulation; end-to-end NVT MD
10k: 7.19 steps/s vs 1.90 (round-1 XLA), compile 84 s vs minutes.
"""

from __future__ import annotations

import dataclasses
import functools

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
    s_tot: int
    t_row: int = 1  # bins per z-row (= nz; row-tiled kernel grid is B/t_row)
    # "bf16": pair weights + candidate features downcast to bfloat16 at the
    # MXU inputs (f32 VPU pair math, f32 accumulation) — ~2x MXU throughput
    # and half the VMEM matmul traffic, at ~1e-3 relative force error.
    # Opt-in via AIMNET_CONV_PRECISION=bf16 (default f32).
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
    pass and as the CPU/interpret reference."""
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

    acc0 = jnp.zeros((st.b_tot, 4 * c, g * f), a_gmajor.dtype)
    is_zero = jnp.concatenate(
        [jnp.ones(1, bool), jnp.zeros(st.s_tot - 1, bool)]
    )
    acc, _ = jax.lax.scan(
        lambda a_, s_: body(a_, s_), acc0, (nbr, shift_cart, is_zero)
    )
    return acc


def _pallas_forward(
    st, a_gmajor, coord_t, shift_cart, mask, row_nbr, dz, shifts_g, scal
):
    from aimnetcentral_tpu.kernels.conv_stencil import conv_stencil_forward

    return conv_stencil_forward(
        row_nbr.reshape(-1),
        dz,
        coord_t,
        mask,
        a_gmajor,
        shift_cart.reshape(st.s_tot, st.r_tot, st.t_row, 4),
        shifts_g,
        scal,
        r_tot=st.r_tot,
        t_row=st.t_row,
        c=st.c,
        g=st.g,
        f=st.f,
        gamma=st.gamma,
        precision=st.precision,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def conv_acc(
    st: ConvStatic,
    a_gmajor,
    coord_t,
    shift_cart,
    mask,
    row_nbr,
    dz,
    mrow_nbr,
    mdz,
    pinv,
    pvalid,
    nbr,
    mshift_cart,
    shifts_g,
    scal,
):
    """Pallas stencil conv with ONE fused Pallas adjoint sweep.

    ``row_nbr``/``dz`` are the row-granular stencil tables
    (ops/binned.py::row_stencil_tables); ``mrow_nbr``/``mdz`` their
    receiver-centric mirrors, used only by the backward sweep so every
    write stays resident in its own row's output block instead of scattering
    (the TPU-native answer to the reference's atomic-add scatter backward,
    kernels/conv_sv_2d_sp_wp.py:115-164).  ``pinv``/``pvalid`` are the
    STATIC inverse tables ((S*B,) int32 / (S, B) f32) that turn the sweep's
    partner-contribution side output into the self-side coordinate and
    lattice-shift adjoints with one GATHER — scatters lower to serial loops
    on TPU and are avoided everywhere on the hot path.  ``nbr`` is the
    per-BIN table, kept for the XLA-twin fallback backward
    (AIMNET_CONV_BWD=xla).
    """
    return _pallas_forward(
        st, a_gmajor, coord_t, shift_cart, mask, row_nbr, dz, shifts_g, scal
    )


def _conv_acc_fwd(
    st, a_gmajor, coord_t, shift_cart, mask, row_nbr, dz, mrow_nbr, mdz,
    pinv, pvalid, nbr, mshift_cart, shifts_g, scal,
):
    out = _pallas_forward(
        st, a_gmajor, coord_t, shift_cart, mask, row_nbr, dz, shifts_g, scal
    )
    return out, (
        a_gmajor, coord_t, shift_cart, mask, row_nbr, dz, mrow_nbr, mdz,
        pinv, pvalid, nbr, mshift_cart, shifts_g, scal,
    )


def _conv_acc_bwd(st, res, g_out):
    import os

    (
        a_gmajor, coord_t, shift_cart, mask, row_nbr, dz, mrow_nbr, mdz,
        pinv, pvalid, nbr, mshift_cart, shifts_g, scal,
    ) = res
    if os.environ.get("AIMNET_CONV_BWD", "pallas") == "xla":
        _, vjp = jax.vjp(
            lambda a_, c_, s_: _conv_acc_xla(st, a_, c_, s_, mask, nbr, shifts_g, scal),
            a_gmajor,
            coord_t,
            shift_cart,
        )
        da, dc, ds = vjp(g_out)
    else:
        from aimnetcentral_tpu.kernels.conv_stencil import conv_stencil_bwd_cand

        kw = dict(
            r_tot=st.r_tot, t_row=st.t_row, c=st.c, g=st.g, f=st.f,
            gamma=st.gamma, precision=st.precision,
        )
        da, dc_cand, pgrad = conv_stencil_bwd_cand(
            mrow_nbr.reshape(-1),
            mdz,
            coord_t,
            mask,
            a_gmajor,
            g_out,
            mshift_cart.reshape(st.s_tot, st.r_tot, st.t_row, 4),
            shifts_g,
            scal,
            **kw,
        )
        # reassemble the partner(self)-side adjoints with one static GATHER:
        # pinv[s, b] flat-indexes the (S*R*T, 4, C) side output at the
        # receiver slot whose forward-step-s partner bin is b (pvalid masks
        # (s, b) pairs with no receiver — gas-phase grid boundaries).
        pg = pgrad.reshape(-1, 4, st.c)  # (S*R*T, 4, C)
        taken = jnp.take(pg, pinv, axis=0).reshape(
            st.s_tot, st.b_tot, 4, st.c
        ) * pvalid[:, :, None, None]
        dc = dc_cand + taken.sum(0)  # self-side coordinate adjoint
        # lattice-shift adjoint (forward frame, index (s, self bin)): the
        # total pair sum = -(lane sum of the partner contribution).
        ds = -taken.sum(-1)  # (S, B, 4)
    return (
        da,
        dc,
        ds,
        jnp.zeros_like(mask),
        jnp.zeros_like(row_nbr),
        jnp.zeros_like(dz),
        jnp.zeros_like(mrow_nbr),
        jnp.zeros_like(mdz),
        jnp.zeros_like(pinv),
        jnp.zeros_like(pvalid),
        jnp.zeros_like(nbr),
        jnp.zeros_like(mshift_cart),
        jnp.zeros_like(shifts_g),
        jnp.zeros_like(scal),
    )


conv_acc.defvjp(_conv_acc_fwd, _conv_acc_bwd)


def conv_pass_pallas(
    system: System,
    aev: dict[str, Array],
    a: Array,  # (L, F, G)
    q: Array | None,
    agh_a: Array,
    agh_q: Array | None,
    rc_static: float,
    interpret_xla: bool = False,
) -> tuple[Array, Array | None]:
    """Pallas-accelerated twin of conv_pass_binned (d2features models)."""
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
    # pad feature columns so gamma * f_pad is lane-aligned
    f_pad = f_dim if q is None else 2 * f_dim
    # g-group size: the block-diagonal matmul computes gamma x the useful
    # FLOPs, so pick the SMALLEST gamma whose output width gamma*f_pad still
    # fills the 128 lanes (q-passes, f_pad=32: gamma=4 halves the MXU work
    # vs gamma=8 at identical results; f_pad=16: gamma=8).  Overridable for
    # experiments via AIMNET_CONV_GAMMA.
    import os as _os

    _gamma_env = _os.environ.get("AIMNET_CONV_GAMMA")
    if _gamma_env:
        gamma = int(_gamma_env)
    else:
        gamma = g_dim if g_dim % 8 else 8
        for cand_g in (8, 4, 2, 1):
            if g_dim % cand_g == 0 and cand_g * f_pad >= 128:
                gamma = cand_g

    # --- static stencil tables (host) + cartesian shifts (device, cell-diff'able)
    nbr_np, wrap_np, _zero = B.stencil_tables(grid, radius)
    s_tot = nbr_np.shape[0]
    invalid = nbr_np < 0
    nbr = jnp.asarray(np.where(invalid, 0, nbr_np))
    wraps = jnp.asarray(wrap_np)  # (S, B, 3)
    if cell0 is not None:
        shift3 = jnp.einsum("sbk,kh->sbh", wraps, cell0, precision=jax.lax.Precision.HIGHEST)
    else:
        shift3 = jnp.zeros((s_tot, b_tot, 3), a.dtype)
    # invalid gas-phase probes: push candidates out of range
    if invalid.any():
        shift3 = shift3 + jnp.asarray(invalid[..., None].astype(np.float32)) * 1e6
    shift_cart = jnp.concatenate(
        [shift3, jnp.zeros((s_tot, b_tot, 1), a.dtype)], axis=-1
    )

    # receiver-centric mirror tables for the backward sweeps (same push for
    # invalid gas-phase probes so out-of-grid partners never contribute)
    mnbr_np, mwrap_np = B.mirror_stencil_tables(grid, radius)
    minvalid = mnbr_np < 0
    if cell0 is not None:
        mshift3 = jnp.einsum("sbk,kh->sbh", jnp.asarray(mwrap_np), cell0, precision=jax.lax.Precision.HIGHEST)
    else:
        mshift3 = jnp.zeros((s_tot, b_tot, 3), a.dtype)
    if minvalid.any():
        mshift3 = mshift3 + jnp.asarray(minvalid[..., None].astype(np.float32)) * 1e6
    mshift_cart = jnp.concatenate(
        [mshift3, jnp.zeros((s_tot, b_tot, 1), a.dtype)], axis=-1
    )

    # row-granular tables for the row-tiled kernels (invalid rows clamp to
    # self; their pairs are neutralized by the per-bin shift push above)
    row_np, dz_np = B.row_stencil_tables(grid, radius)
    mrow_np, mdz_np = B.mirror_row_stencil_tables(grid, radius)
    row_nbr = jnp.asarray(np.where(row_np < 0, 0, row_np))
    mrow_nbr = jnp.asarray(np.where(mrow_np < 0, 0, mrow_np))
    dz = jnp.asarray(dz_np)
    mdz = jnp.asarray(mdz_np)
    t_row = grid.nbins[2]

    # static inverse tables for the backward reassembly GATHER: for forward
    # step s and self bin b, pinv[s, b] flat-indexes the (S*R*T) side-output
    # slot of the receiver that claims b as its partner; pvalid masks (s, b)
    # with no receiver (gas-phase boundaries).  Gathers, never scatters.
    r_tot_ = row_np.shape[1]
    pinv_np = np.zeros((s_tot, b_tot), np.int32)
    pvalid_np = np.zeros((s_tot, b_tot), np.float32)
    t_idx = np.arange(t_row)
    for s_i in range(s_tot):
        tp = (t_idx + mdz_np[s_i]) % t_row  # partner slot per receiver slot
        for r_i in range(r_tot_):
            pr = mrow_np[s_i, r_i]
            if pr < 0:
                continue
            b_ids = pr * t_row + tp  # partner bins of this receiver row
            pinv_np[s_i, b_ids] = (s_i * r_tot_ + r_i) * t_row + t_idx
            pvalid_np[s_i, b_ids] = 1.0
    pinv = jnp.asarray(pinv_np.reshape(-1))
    pvalid = jnp.asarray(pvalid_np)

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
        b_tot=b_tot, c=c, g=g_dim, f=f_pad, gamma=gamma, s_tot=s_tot, t_row=t_row,
        precision=os.environ.get("AIMNET_CONV_PRECISION", "f32"),
    )
    if interpret_xla:
        acc = _conv_acc_xla(
            st, a_gmajor, coord_t, shift_cart, mask, nbr, shifts_g, scal
        )
    else:
        acc = conv_acc(
            st, a_gmajor, coord_t, shift_cart, mask, row_nbr, dz, mrow_nbr, mdz,
            pinv, pvalid, nbr, mshift_cart, shifts_g, scal,
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
