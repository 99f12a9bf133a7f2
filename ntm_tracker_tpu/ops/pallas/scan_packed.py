"""Lane-PACKED whole-sequence NTM forward: memory math on [B, D*N].

Why: the row-loop kernels (scan_cell.py, scan_bptt.py) and XLA's scan are
all VPU INSTRUCTION-ISSUE bound at training shapes — the D=20 per-row
Python loops emit ~2k small [B,N] vector ops per step, and the measured
per-step cost (13 + 0.77*B us, scan_bptt.py docstring) is dominated by
issue overhead, not data movement. This kernel keeps the memory packed as
ONE [B, D*N] array (lane l = d*N + n), so each memory-side math step is a
single wide vector op (D times fewer instructions), and realizes the per-d
broadcasts/reductions that motivated the row loops as tiny MXU matmuls
against constant 0/1 block-selector matrices:

    E_dn [D, D*N]   E_dn[d, d*N+n] = 1   scalar-per-d -> every lane of
                                         block d       (broadcast: x @ E_dn)
    A_d  [D*N, D]   A_d[d*N+n, d]  = 1   sum over n per d     (x @ A_d)
    A_n  [D*N, N]   A_n[d*N+n, n]  = 1   sum over d per n     (x @ A_n)

plus pltpu.repeat(w, D, axis=1) to tile a [B,N] slot weighting across the
D blocks. Per-head addressing (softmax / gate / shift / sharpen) stays on
[B,N] exactly as in scan_cell.py — it has no D loop to kill.

Semantics match ntm_cell_step + lax.scan at f32 (asserted against the jnp
scan in tests/test_pallas_packed.py, interpret mode), including the
across-slot cosine quirk (ops.py:147-156), Py2 shift offsets and the
+1e-3 sharpen normalizer (ntm_cell.py:169-176).

MEASURED VERDICT (v5e, T=1300, flagship config — kept as a tested
alternate, NOT the chosen training path):
  * forward B=256: 39.4 ms kernel + ~9 ms stream transpose (~64 ms
    end-to-end in jit) vs 48 ms for the XLA scan forward — no win; the
    packing trades instruction issue for MXU-latency-bound selector
    matmuls and roughly breaks even.
  * grad B=32: 239 ms vs 50.5 ms for the row-loop fused pair
    (scan_bptt.py) and 57 ms for the XLA remat scan — the backward's
    ~25 skinny [B,DN]x[DN,*] selector matmuls per step are each
    MXU-latency-bound at small batch, far worse than the row kernels'
    wide VPU ops.
  * grad B>=64: Mosaic compile-helper crash — the SAME batch ceiling as
    the row-loop backward, so the packing does not unlock large-batch
    fused BPTT either.
Decision: training stays on scan_bptt (B<=32) / the XLA remat scan
(large batch). This module remains as the measured answer to "would a
lane-packed layout beat the row loops?" — no, on both sides of the
roofline; see also the layout decision record in ntm_scan_packed.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntm_tracker_tpu.config import NTMConfig

# the static-config tuple's FIELD ORDER is load-bearing (destructured
# positionally in the kernels) — one definition, shared with scan_bptt
from ntm_tracker_tpu.ops.pallas.scan_bptt import _static  # noqa: F401

f32 = jnp.float32

# The packed kernels' wide [B, D*N] intermediates live on the Mosaic
# value stack; at some shapes (e.g. B=8/T=65 flagship) the default
# 16 MiB scoped-vmem limit overflows by <1 MiB while larger shapes fit
# -- raise the scratch limit and declare the sequential grid explicitly.
# vmem_limit_bytes feeds the scoped_memory_configs entry the limit is
# checked against. (The flags={"xla_tpu_scoped_vmem_limit_kib": ...}
# route is rejected by this machine's remote compile helper --
# serializer/libtpu version skew; internal_scratch_in_bytes is a
# different pool and does not lift this limit.)
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary",),
    vmem_limit_bytes=100 * 1024 * 1024,
)

# Largest batch the Mosaic compiler handles for the packed backward on real
# hardware — the same scoped-VMEM stack OOM scan_bptt.py hit at B=64
# (probe_bptt_b64.py). scan_bptt fixed it by tiling its grid over batch;
# this kernel is a measured-slower alternate kept for record, so it keeps
# the plain guard instead of growing a tiled variant.
MAX_HW_BATCH = 32


def _selectors(D: int, N: int):
    """The constant 0/1 block-selector matrices (built host-side once)."""
    DN = D * N
    E_dn = np.zeros((D, DN), np.float32)
    A_d = np.zeros((DN, D), np.float32)
    A_n = np.zeros((DN, N), np.float32)
    for d in range(D):
        E_dn[d, d * N : (d + 1) * N] = 1.0
        A_d[d * N : (d + 1) * N, d] = 1.0
        A_n[d * N : (d + 1) * N, :] = np.eye(N, dtype=np.float32)
    return jnp.asarray(E_dn), jnp.asarray(A_d), jnp.asarray(A_n)


def _packed_forward_math(x, Mp, w_prev, read_prev, c_prev, h_prev, lstm_w,
                         lstm_b, heads_w, heads_b, out_w, out_b,
                         E_dn, A_d, A_n, cs, want_inter=False):
    """One cell step with the memory packed as [B, D*N]. Returns logit,
    the new state pieces (Mp_new [B,DN], w list of [B,N], read [B,R*D],
    c/h lists) and, when want_inter, every intermediate the hand-derived
    backward consumes. Mirrors scan_bptt._forward_math, which is pinned to
    ntm_cell_step."""
    (H, R, W, D, N, S, Hc, L, shifts, write_first, sizes, slotwise) = cs
    B = x.shape[0]

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    # ---- stacked LSTM controller (identical to the row-loop kernels) ----
    inp = jnp.concatenate([x, read_prev], axis=1)
    KIN = lstm_w.shape[1]
    gates_l, li_l, c_new, h_new = [], [], [], []
    for l in range(L):
        li = jnp.concatenate([inp, h_prev[l]], axis=1)
        if li.shape[1] < KIN:
            li = jnp.pad(li, ((0, 0), (0, KIN - li.shape[1])))
        gates = mm(li, lstm_w[l]) + lstm_b[l][None, :]
        i_g = gates[:, 0 * Hc : 1 * Hc]
        j_g = gates[:, 1 * Hc : 2 * Hc]
        f_g = gates[:, 2 * Hc : 3 * Hc]
        o_g = gates[:, 3 * Hc : 4 * Hc]
        nc = c_prev[l] * jax.nn.sigmoid(f_g) + jax.nn.sigmoid(i_g) * jnp.tanh(j_g)
        nh = jnp.tanh(nc) * jax.nn.sigmoid(o_g)
        gates_l.append(gates)
        li_l.append(li)
        c_new.append(nc)
        h_new.append(nh)
        inp = nh
    ctrl_out = inp

    controls = mm(ctrl_out, heads_w) + heads_b[0][None, :]
    o = 0
    part = {}
    for name in ("k", "beta", "g", "sw", "gamma", "erase", "add"):
        part[name] = controls[:, o : o + sizes[name]]
        o += sizes[name]
    logit = mm(ctrl_out, out_w) + out_b[0][None, :]

    # ---- memory normalization, packed --------------------------------
    if slotwise:
        # proper per-slot cosine: norm over d for each (b, n)
        m_ss = mm(Mp * Mp, A_n)                        # [B,N]
        m_inv = jax.lax.rsqrt(jnp.maximum(m_ss, 1e-12))
        m_inv_exp = pltpu.repeat(m_inv, D, axis=1)     # [B,DN]
    else:
        # the reference's across-slot quirk: norm over n for each (b, d)
        m_ss = mm(Mp * Mp, A_d)                        # [B,D]
        m_inv = jax.lax.rsqrt(jnp.maximum(m_ss, 1e-12))
        m_inv_exp = mm(m_inv, E_dn)                    # [B,DN]
    Mtn = Mp * m_inv_exp

    beta = jax.nn.softplus(part["beta"])
    g = jax.nn.sigmoid(part["g"])
    gamma = jax.nn.softplus(part["gamma"]) + 1.0

    per_head = []
    w_heads = []
    for h in range(H):
        k_h = jnp.tanh(part["k"][:, h * D : (h + 1) * D])   # [B,D]
        k_ss = jnp.sum(k_h * k_h, axis=1, keepdims=True)
        k_inv = jax.lax.rsqrt(jnp.maximum(k_ss, 1e-12))
        k_exp = mm(k_h, E_dn)                               # [B,DN]
        u = mm(k_exp * Mtn, A_n)                            # [B,N]
        sim = u * k_inv

        s_pre = sim * beta[:, h][:, None]
        w_c = jax.nn.softmax(s_pre, axis=-1)
        g_h = g[:, h][:, None]
        w_g = w_c * g_h + w_prev[h] * (1.0 - g_h)

        sw_h = jax.nn.softmax(part["sw"][:, h * S : (h + 1) * S], axis=-1)
        w_conv = jnp.zeros_like(w_g)
        for j, s in enumerate(shifts):
            w_conv = w_conv + sw_h[:, j][:, None] * pltpu.roll(
                w_g, (-s) % N, axis=1
            )
        powed = jnp.power(w_conv, gamma[:, h][:, None])
        denom = jnp.sum(powed, axis=1, keepdims=True) + 1e-3
        w_heads.append(powed / denom)
        per_head.append(dict(k_h=k_h, k_ss=k_ss, k_inv=k_inv, k_exp=k_exp,
                             u=u, sim=sim, w_c=w_c, w_g=w_g, sw_h=sw_h,
                             w_conv=w_conv, powed=powed, denom=denom))

    erase = jax.nn.sigmoid(part["erase"])                   # [B, W*D]
    add = jnp.tanh(part["add"])
    er = jnp.ones_like(Mp)
    ad = jnp.zeros_like(Mp)
    ww_tiles, e_exps, a_exps = [], [], []
    for wh in range(W):
        ww_t = pltpu.repeat(w_heads[R + wh], D, axis=1)     # [B,DN]
        e_exp = mm(erase[:, wh * D : (wh + 1) * D], E_dn)   # [B,DN]
        a_exp = mm(add[:, wh * D : (wh + 1) * D], E_dn)
        er = er * (1.0 - ww_t * e_exp)
        ad = ad + ww_t * a_exp
        ww_tiles.append(ww_t)
        e_exps.append(e_exp)
        a_exps.append(a_exp)
    Mp_new = Mp * er + ad

    src = Mp_new if write_first else Mp
    read_cols = []
    for r in range(R):
        rv = mm(pltpu.repeat(w_heads[r], D, axis=1) * src, A_d)   # [B,D]
        read_cols.append(rv)
    read = jnp.concatenate(read_cols, axis=1)               # [B, R*D]

    inter = None
    if want_inter:
        inter = dict(
            gates_l=gates_l, li_l=li_l, c_l_new=c_new, ctrl_out=ctrl_out,
            part=part, m_ss=m_ss, m_inv=m_inv, m_inv_exp=m_inv_exp, Mtn=Mtn,
            beta=beta, g=g, gamma=gamma, per_head=per_head, w_heads=w_heads,
            erase=erase, add=add, er=er, ww_tiles=ww_tiles, e_exps=e_exps,
            a_exps=a_exps, Mp_new=Mp_new, src=src,
        )
    return logit, Mp_new, w_heads, read, c_new, h_new, inter


def _packed_fwd_kernel(
    x_ref, lstm_w_ref, lstm_b_ref, heads_w_ref, heads_b_ref, out_w_ref,
    out_b_ref, Mp0_ref, w0_ref, read0_ref, c0_ref, h0_ref,
    E_dn_ref, A_d_ref, A_n_ref,
    # outputs
    logits_ref, Mp_ref, w_ref, read_ref, c_ref, h_ref,
    *, cs,
):
    (H, R, W, D, N, S, Hc, L, shifts, write_first, sizes, slotwise) = cs
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        Mp_ref[:] = Mp0_ref[:]
        w_ref[:] = w0_ref[:]
        read_ref[:] = read0_ref[:]
        c_ref[:] = c0_ref[:]
        h_ref[:] = h0_ref[:]

    logit, Mp_new, w_heads, read, c_new, h_new, _ = _packed_forward_math(
        x_ref[0], Mp_ref[:], [w_ref[:, h, :] for h in range(H)],
        read_ref[:], [c_ref[l] for l in range(L)],
        [h_ref[l] for l in range(L)],
        lstm_w_ref[:], lstm_b_ref[:], heads_w_ref[:], heads_b_ref[:],
        out_w_ref[:], out_b_ref[:],
        E_dn_ref[:], A_d_ref[:], A_n_ref[:], cs,
    )
    Mp_ref[:] = Mp_new
    for h in range(H):
        w_ref[:, h, :] = w_heads[h]
    read_ref[:] = read
    for l in range(L):
        c_ref[l] = c_new[l]
        h_ref[l] = h_new[l]
    logits_ref[0] = logit


def _ctrl_offsets(sizes):
    off = {}
    o = 0
    for name in ("k", "beta", "g", "sw", "gamma", "erase", "add"):
        off[name] = o
        o += sizes[name]
    return off, o


def _block_selectors(cs):
    """Stacked [D, P] selectors that place a [B, D] gradient block into its
    control columns via one matmul (dcontrols += piece @ SELS[i]); order is
    k per head, then erase per write head, then add per write head."""
    (H, R, W, D, N, S, Hc, L, shifts, write_first, sizes, slotwise) = cs
    off, P = _ctrl_offsets(sizes)
    mats = []
    for h in range(H):
        m = np.zeros((D, P), np.float32)
        m[np.arange(D), off["k"] + h * D + np.arange(D)] = 1.0
        mats.append(m)
    for name in ("erase", "add"):
        for wh in range(W):
            m = np.zeros((D, P), np.float32)
            m[np.arange(D), off[name] + wh * D + np.arange(D)] = 1.0
            mats.append(m)
    return jnp.asarray(np.stack(mats))


def _packed_fwd_res_kernel(
    x_ref, lstm_w_ref, lstm_b_ref, heads_w_ref, heads_b_ref, out_w_ref,
    out_b_ref, Mp0_ref, w0_ref, read0_ref, c0_ref, h0_ref,
    E_dn_ref, A_d_ref, A_n_ref,
    # outputs
    logits_ref, Mp_ref, w_ref, read_ref, c_ref, h_ref,
    Mph_ref, wh_ref, readh_ref, ch_ref, hh_ref,
    *, cs,
):
    """Packed forward plus t-indexed residual streams of each step's INPUT
    state — the packed twin of scan_bptt._fwd_res_kernel."""
    (H, R, W, D, N, S, Hc, L, shifts, write_first, sizes, slotwise) = cs
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        Mp_ref[:] = Mp0_ref[:]
        w_ref[:] = w0_ref[:]
        read_ref[:] = read0_ref[:]
        c_ref[:] = c0_ref[:]
        h_ref[:] = h0_ref[:]

    Mph_ref[0] = Mp_ref[:]
    wh_ref[0] = w_ref[:]
    readh_ref[0] = read_ref[:]
    ch_ref[0] = c_ref[:]
    hh_ref[0] = h_ref[:]

    logit, Mp_new, w_heads, read, c_new, h_new, _ = _packed_forward_math(
        x_ref[0], Mp_ref[:], [w_ref[:, h, :] for h in range(H)],
        read_ref[:], [c_ref[l] for l in range(L)],
        [h_ref[l] for l in range(L)],
        lstm_w_ref[:], lstm_b_ref[:], heads_w_ref[:], heads_b_ref[:],
        out_w_ref[:], out_b_ref[:],
        E_dn_ref[:], A_d_ref[:], A_n_ref[:], cs,
    )
    Mp_ref[:] = Mp_new
    for h in range(H):
        w_ref[:, h, :] = w_heads[h]
    read_ref[:] = read
    for l in range(L):
        c_ref[l] = c_new[l]
        h_ref[l] = h_new[l]
    logits_ref[0] = logit


def _packed_bwd_kernel(
    # t-indexed (REVERSED maps)
    x_ref, Mph_ref, wh_ref, readh_ref, ch_ref, hh_ref, dlogit_ref,
    # constants
    lstm_w_ref, lstm_b_ref, heads_w_ref, heads_b_ref, out_w_ref, out_b_ref,
    lstm_wT_ref, heads_wT_ref, out_wT_ref,
    E_dn_ref, A_d_ref, A_n_ref, SELS_ref,
    # final-state cotangents (consumed at i==0)
    dMf_ref, dwf_ref, dreadf_ref, dcf_ref, dhf_ref,
    # outputs
    dMp_ref, dw_ref, dread_ref, dc_ref, dh_ref,
    dlstm_w_ref, dlstm_b_ref, dheads_w_ref, dheads_b_ref, dout_w_ref,
    dout_b_ref, dx_ref,
    *, cs,
):
    """Hand-derived backward of the packed forward: the same VJP chain as
    scan_bptt._bwd_kernel, with every per-mem_dim row loop collapsed into a
    wide [B, D*N] op plus E_dn/A_d/A_n selector matmuls, and the [B,D]
    gradient blocks of dcontrols placed via SELS matmuls (the [B,1] scalar
    pieces keep the hardware-proven iota masked-place)."""
    (H, R, W, D, N, S, Hc, L, shifts, write_first, sizes, slotwise) = cs
    i = pl.program_id(0)
    B = x_ref.shape[1]  # x_ref is the t-major [1, B, IN] block

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    @pl.when(i == 0)
    def _init():
        dMp_ref[:] = dMf_ref[:]
        dw_ref[:] = dwf_ref[:]
        dread_ref[:] = dreadf_ref[:]
        dc_ref[:] = dcf_ref[:]
        dh_ref[:] = dhf_ref[:]
        dlstm_w_ref[:] = jnp.zeros_like(dlstm_w_ref)
        dlstm_b_ref[:] = jnp.zeros_like(dlstm_b_ref)
        dheads_w_ref[:] = jnp.zeros_like(dheads_w_ref)
        dheads_b_ref[:] = jnp.zeros_like(dheads_b_ref)
        dout_w_ref[:] = jnp.zeros_like(dout_w_ref)
        dout_b_ref[:] = jnp.zeros_like(dout_b_ref)

    x = x_ref[0]
    Mp_prev = Mph_ref[0]
    w_prev = [wh_ref[0, :, h, :] for h in range(H)]
    read_prev = readh_ref[0]
    c_prev = [ch_ref[0, l] for l in range(L)]
    h_prev = [hh_ref[0, l] for l in range(L)]
    E_dn = E_dn_ref[:]
    A_d = A_d_ref[:]
    A_n = A_n_ref[:]

    off, P = _ctrl_offsets(sizes)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)

    def place(buf, col, piece):
        # [B,1] scalar piece -> control column col (iota masked-place,
        # hardware-proven in scan_bptt._bwd_kernel)
        return buf + jnp.where(col_iota == col, piece, 0.0)

    # ---- recompute the forward step (VMEM-local) ------------------------
    _logit, Mp_new, w_heads, _read, _c_new, _h_new, it = _packed_forward_math(
        x, Mp_prev, w_prev, read_prev, c_prev, h_prev,
        lstm_w_ref[:], lstm_b_ref[:], heads_w_ref[:], heads_b_ref[:],
        out_w_ref[:], out_b_ref[:], E_dn, A_d, A_n, cs, want_inter=True,
    )

    dlogit = dlogit_ref[0]
    dMp_in = dMp_ref[:]
    dw_in = dw_ref[:]
    dread_in = dread_ref[:]

    dcontrols = jnp.zeros((B, P), f32)

    # ---- read backward --------------------------------------------------
    dw_head = [dw_in[:, h, :] for h in range(H)]
    dsrc = jnp.zeros_like(Mp_prev)
    for r in range(R):
        dr_exp = mm(dread_in[:, r * D : (r + 1) * D], E_dn)     # [B,DN]
        dw_head[r] = dw_head[r] + mm(dr_exp * it["src"], A_n)
        dsrc = dsrc + dr_exp * pltpu.repeat(w_heads[r], D, axis=1)

    # ---- erase/add backward ---------------------------------------------
    dMp_rows = dMp_in
    dMp_prev = jnp.zeros_like(Mp_prev)
    if write_first:
        dMp_rows = dMp_rows + dsrc
    else:
        dMp_prev = dMp_prev + dsrc
    dMp_prev = dMp_prev + dMp_rows * it["er"]
    der = dMp_rows * Mp_prev
    dad = dMp_rows
    for wh in range(W):
        others = jnp.ones_like(Mp_prev)
        for wo in range(W):
            if wo != wh:
                others = others * (1.0 - it["ww_tiles"][wo] * it["e_exps"][wo])
        dfac = der * others
        dw_head[R + wh] = dw_head[R + wh] + mm(
            -dfac * it["e_exps"][wh] + dad * it["a_exps"][wh], A_n
        )
        de_d = mm(-dfac * it["ww_tiles"][wh], A_d)              # [B,D]
        da_d = mm(dad * it["ww_tiles"][wh], A_d)
        e_vals = it["erase"][:, wh * D : (wh + 1) * D]
        a_vals = it["add"][:, wh * D : (wh + 1) * D]
        dcontrols = dcontrols + mm(
            de_d * e_vals * (1.0 - e_vals), SELS_ref[H + wh]
        )
        dcontrols = dcontrols + mm(
            da_d * (1.0 - a_vals * a_vals), SELS_ref[H + W + wh]
        )

    # ---- per-head addressing backward -----------------------------------
    dw_prev_heads = []
    dMtn = jnp.zeros_like(Mp_prev)
    for h in range(H):
        ph = it["per_head"][h]
        dwh = dw_head[h]
        inv_den = 1.0 / ph["denom"]
        dp = dwh * inv_den - jnp.sum(
            dwh * ph["powed"], axis=1, keepdims=True
        ) * inv_den * inv_den
        gam = it["gamma"][:, h][:, None]
        dw_conv = dp * gam * jnp.power(ph["w_conv"], gam - 1.0)
        log_wc = jnp.where(ph["w_conv"] > 0.0, jnp.log(ph["w_conv"]), 0.0)
        dgamma_h = jnp.sum(dp * ph["powed"] * log_wc, axis=1, keepdims=True)
        dw_g = jnp.zeros_like(dwh)
        dsw_h = []
        for j, s in enumerate(shifts):
            rolled = pltpu.roll(ph["w_g"], (-s) % N, axis=1)
            dsw_h.append(jnp.sum(dw_conv * rolled, axis=1, keepdims=True))
            dw_g = dw_g + ph["sw_h"][:, j][:, None] * pltpu.roll(
                dw_conv, s % N, axis=1
            )
        dot_sw = dsw_h[0] * ph["sw_h"][:, 0][:, None]
        for j in range(1, S):
            dot_sw = dot_sw + dsw_h[j] * ph["sw_h"][:, j][:, None]
        for j in range(S):
            dcontrols = place(
                dcontrols, off["sw"] + h * S + j,
                (dsw_h[j] - dot_sw) * ph["sw_h"][:, j][:, None],
            )
        g_h = it["g"][:, h][:, None]
        dw_c = dw_g * g_h
        dw_prev_heads.append(dw_g * (1.0 - g_h))
        dg_h = jnp.sum(dw_g * (ph["w_c"] - w_prev[h]), axis=1, keepdims=True)
        ds_pre = (dw_c - jnp.sum(dw_c * ph["w_c"], axis=1, keepdims=True)) * ph["w_c"]
        b_h = it["beta"][:, h][:, None]
        dsim = ds_pre * b_h
        dbeta_h = jnp.sum(ds_pre * ph["sim"], axis=1, keepdims=True)
        du = dsim * ph["k_inv"]
        dk_inv = jnp.sum(dsim * ph["u"], axis=1, keepdims=True)
        live_k = (ph["k_ss"] > 1e-12).astype(f32)
        dk_ss = dk_inv * (-0.5) * ph["k_inv"] * ph["k_inv"] * ph["k_inv"] * live_k
        du_t = pltpu.repeat(du, D, axis=1)                      # [B,DN]
        dMtn = dMtn + ph["k_exp"] * du_t
        dk_h = mm(du_t * it["Mtn"], A_d) + 2.0 * ph["k_h"] * dk_ss
        dcontrols = dcontrols + mm(
            dk_h * (1.0 - ph["k_h"] * ph["k_h"]), SELS_ref[h]
        )
        braw = it["part"]["beta"][:, h][:, None]
        dcontrols = place(
            dcontrols, off["beta"] + h, dbeta_h * jax.nn.sigmoid(braw)
        )
        dcontrols = place(
            dcontrols, off["g"] + h, dg_h * g_h * (1.0 - g_h)
        )
        graw = it["part"]["gamma"][:, h][:, None]
        dcontrols = place(
            dcontrols, off["gamma"] + h, dgamma_h * jax.nn.sigmoid(graw)
        )

    # ---- memory-normalization backward ----------------------------------
    dMp_prev = dMp_prev + dMtn * it["m_inv_exp"]
    if slotwise:
        dm_inv = mm(dMtn * Mp_prev, A_n)                        # [B,N]
        live = (it["m_ss"] > 1e-12).astype(f32)
        dss = dm_inv * (-0.5) * it["m_inv"] ** 3 * live
        dMp_prev = dMp_prev + 2.0 * Mp_prev * pltpu.repeat(dss, D, axis=1)
    else:
        dm_inv = mm(dMtn * Mp_prev, A_d)                        # [B,D]
        live = (it["m_ss"] > 1e-12).astype(f32)
        dss = dm_inv * (-0.5) * it["m_inv"] ** 3 * live
        dMp_prev = dMp_prev + 2.0 * Mp_prev * mm(dss, E_dn)

    # ---- head/output linear backward ------------------------------------
    ctrl_out = it["ctrl_out"]
    dheads_w_ref[:] += jax.lax.dot_general(
        ctrl_out, dcontrols, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dheads_b_ref[0] += jnp.sum(dcontrols, axis=0)
    dout_w_ref[:] += jax.lax.dot_general(
        ctrl_out, dlogit, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dout_b_ref[0] += jnp.sum(dlogit, axis=0)

    dctrl = (
        mm(dcontrols, heads_wT_ref[:]) + mm(dlogit, out_wT_ref[:])
    )

    # ---- stacked LSTM backward (top layer first) ------------------------
    d_inp_above = dctrl
    dx_out = None
    dread_prev = None
    for l in range(L - 1, -1, -1):
        gates = it["gates_l"][l]
        i_g = gates[:, 0 * Hc : 1 * Hc]
        j_g = gates[:, 1 * Hc : 2 * Hc]
        f_g = gates[:, 2 * Hc : 3 * Hc]
        o_g = gates[:, 3 * Hc : 4 * Hc]
        si, tj = jax.nn.sigmoid(i_g), jnp.tanh(j_g)
        sf, so = jax.nn.sigmoid(f_g), jax.nn.sigmoid(o_g)
        new_c = it["c_l_new"][l]
        tc = jnp.tanh(new_c)

        dnew_h = d_inp_above + dh_ref[l]
        dnew_c = dc_ref[l] + dnew_h * so * (1.0 - tc * tc)
        do = dnew_h * tc * so * (1.0 - so)
        df = dnew_c * c_prev[l] * sf * (1.0 - sf)
        di = dnew_c * tj * si * (1.0 - si)
        dj = dnew_c * si * (1.0 - tj * tj)
        dgates = jnp.concatenate([di, dj, df, do], axis=1)
        dc_ref[l] = dnew_c * sf
        dlstm_w_ref[l] += jax.lax.dot_general(
            it["li_l"][l], dgates, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dlstm_b_ref[l] += jnp.sum(dgates, axis=0)
        dli = mm(dgates, lstm_wT_ref[l])
        in_l = (x.shape[1] + read_prev.shape[1]) if l == 0 else Hc
        dh_ref[l] = dli[:, in_l : in_l + Hc]
        if l == 0:
            dx_out = dli[:, : x.shape[1]]
            dread_prev = dli[:, x.shape[1] : in_l]
        else:
            d_inp_above = dli[:, :in_l]

    # ---- write carries ---------------------------------------------------
    dMp_ref[:] = dMp_prev
    for h in range(H):
        dw_ref[:, h, :] = dw_prev_heads[h]
    dread_ref[:] = dread_prev
    dx_ref[0] = dx_out




def ntm_scan_packed(
    params: Dict[str, Any],
    cfg: NTMConfig,
    tokens: jax.Array,
    state: Dict[str, Any],
    interpret: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """T NTM steps with the lane-packed forward kernel (f32).

    Same contract as scan_cell.ntm_scan_fused: returns (logits [B,T,O],
    final state). Forward-only — use inside jax.grad via the scan_bptt
    pair or the jnp path."""
    from ntm_tracker_tpu.ops.pallas.scan_bptt import _pack_weights

    B, T, IN = tokens.shape
    cs = _static(cfg)
    (H, R, W, D, N, S, Hc, L, _sh, _wf, sizes, _sl) = cs
    DN = D * N
    P = sum(sizes.values())
    O = cfg.output_dim
    lstm_w, lstm_b, _kins, KIN = _pack_weights(params, cfg, IN)
    c0 = jnp.stack([c for c, _ in state["controller_state"]]).astype(f32)
    h0 = jnp.stack([h for _, h in state["controller_state"]]).astype(f32)
    E_dn, A_d, A_n = _selectors(D, N)

    # memory arrives as [B, N, D] (the cell-state layout); pack to [B, D*N]
    Mp0 = jnp.swapaxes(state["M"].astype(f32), 1, 2).reshape(B, DN)

    const3 = lambda a, b, c: pl.BlockSpec((a, b, c), lambda t: (0, 0, 0),
                                          memory_space=pltpu.VMEM)
    const2 = lambda a, b: pl.BlockSpec((a, b), lambda t: (0, 0),
                                       memory_space=pltpu.VMEM)
    # t-MAJOR streams with explicit [B,T,*]<->[T,B,*] transposes, measured
    # faster than batch-major blocks on v5e at B=256/T=1300: the bmaj
    # (B,1,1,IN)-block variant cost 137.6 ms/seq (strided DMA gathers B
    # discontiguous rows per grid step; the O=12 logit scatter writes 256
    # 48-byte rows) vs 39.4 ms for this layout plus a one-time 9.0 ms
    # HBM transpose of the 684 MB token stream.
    tidx3 = lambda a, b: pl.BlockSpec((1, a, b), lambda t: (t, 0, 0),
                                      memory_space=pltpu.VMEM)

    kern = functools.partial(_packed_fwd_kernel, cs=cs)
    logits, Mp, w, read, c, h = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            tidx3(B, IN),
            const3(L, KIN, 4 * Hc), const2(L, 4 * Hc),
            const2(Hc, P), const2(1, P), const2(Hc, O), const2(1, O),
            const2(B, DN), const3(B, H, N), const2(B, R * D),
            const3(L, B, Hc), const3(L, B, Hc),
            const2(D, DN), const2(DN, D), const2(DN, N),
        ],
        out_specs=(
            tidx3(B, O),
            const2(B, DN), const3(B, H, N), const2(B, R * D),
            const3(L, B, Hc), const3(L, B, Hc),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, O), f32),
            jax.ShapeDtypeStruct((B, DN), f32),
            jax.ShapeDtypeStruct((B, H, N), f32),
            jax.ShapeDtypeStruct((B, R * D), f32),
            jax.ShapeDtypeStruct((L, B, Hc), f32),
            jax.ShapeDtypeStruct((L, B, Hc), f32),
        ),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(
        jnp.swapaxes(tokens.astype(f32), 0, 1),
        lstm_w, lstm_b,
        params["heads_w"].astype(f32), params["heads_b"].astype(f32)[None, :],
        params["out_w"].astype(f32), params["out_b"].astype(f32)[None, :],
        Mp0,
        state["w"].astype(f32),
        state["read"].astype(f32).reshape(B, R * D),
        c0, h0,
        E_dn, A_d, A_n,
    )
    final_state = {
        "M": jnp.swapaxes(Mp.reshape(B, D, N), 1, 2),
        "w": w,
        "read": read.reshape(B, R, D),
        "controller_state": [(c[l], h[l]) for l in range(L)],
    }
    return jnp.swapaxes(logits, 0, 1), final_state


# ---------------------------------------------------------------------------
# packed whole-sequence BPTT (residual forward + hand-derived backward)
# ---------------------------------------------------------------------------

def _packed_fwd_call(params, cfg: NTMConfig, tokens, state, interpret):
    from ntm_tracker_tpu.ops.pallas.scan_bptt import _pack_weights

    B, T, IN = tokens.shape
    cs = _static(cfg)
    (H, R, W, D, N, S, Hc, L, _sh, _wf, sizes, _sl) = cs
    DN = D * N
    P = sum(sizes.values())
    O = cfg.output_dim
    lstm_w, lstm_b, _kins, KIN = _pack_weights(params, cfg, IN)
    c0 = jnp.stack([c for c, _ in state["controller_state"]]).astype(f32)
    h0 = jnp.stack([h for _, h in state["controller_state"]]).astype(f32)
    E_dn, A_d, A_n = _selectors(D, N)
    Mp0 = jnp.swapaxes(state["M"].astype(f32), 1, 2).reshape(B, DN)

    const3 = lambda a, b, c: pl.BlockSpec((a, b, c), lambda t: (0, 0, 0),
                                          memory_space=pltpu.VMEM)
    const2 = lambda a, b: pl.BlockSpec((a, b), lambda t: (0, 0),
                                       memory_space=pltpu.VMEM)
    # t-major streams (see the layout decision record in ntm_scan_packed)
    tidx3 = lambda a, b: pl.BlockSpec((1, a, b), lambda t: (t, 0, 0),
                                      memory_space=pltpu.VMEM)
    tidx4 = lambda a, b, c: pl.BlockSpec((1, a, b, c), lambda t: (t, 0, 0, 0),
                                         memory_space=pltpu.VMEM)

    kern = functools.partial(_packed_fwd_res_kernel, cs=cs)
    out = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            tidx3(B, IN),
            const3(L, KIN, 4 * Hc), const2(L, 4 * Hc),
            const2(Hc, P), const2(1, P), const2(Hc, O), const2(1, O),
            const2(B, DN), const3(B, H, N), const2(B, R * D),
            const3(L, B, Hc), const3(L, B, Hc),
            const2(D, DN), const2(DN, D), const2(DN, N),
        ],
        out_specs=(
            tidx3(B, O),
            const2(B, DN), const3(B, H, N), const2(B, R * D),
            const3(L, B, Hc), const3(L, B, Hc),
            tidx3(B, DN), tidx4(B, H, N), tidx3(B, R * D),
            tidx4(L, B, Hc), tidx4(L, B, Hc),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, O), f32),
            jax.ShapeDtypeStruct((B, DN), f32),
            jax.ShapeDtypeStruct((B, H, N), f32),
            jax.ShapeDtypeStruct((B, R * D), f32),
            jax.ShapeDtypeStruct((L, B, Hc), f32),
            jax.ShapeDtypeStruct((L, B, Hc), f32),
            jax.ShapeDtypeStruct((T, B, DN), f32),
            jax.ShapeDtypeStruct((T, B, H, N), f32),
            jax.ShapeDtypeStruct((T, B, R * D), f32),
            jax.ShapeDtypeStruct((T, L, B, Hc), f32),
            jax.ShapeDtypeStruct((T, L, B, Hc), f32),
        ),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(
        jnp.swapaxes(tokens.astype(f32), 0, 1),
        lstm_w, lstm_b,
        params["heads_w"].astype(f32), params["heads_b"].astype(f32)[None, :],
        params["out_w"].astype(f32), params["out_b"].astype(f32)[None, :],
        Mp0,
        state["w"].astype(f32),
        state["read"].astype(f32).reshape(B, R * D),
        c0, h0,
        E_dn, A_d, A_n,
    )
    (logits, Mp, w, read, c, h, Mph, wh, readh, ch, hh) = out
    final_state = {
        "M": jnp.swapaxes(Mp.reshape(B, D, N), 1, 2),
        "w": w,
        "read": read.reshape(B, R, D),
        "controller_state": [(c[l], h[l]) for l in range(L)],
    }
    residuals = (Mph, wh, readh, ch, hh)
    return jnp.swapaxes(logits, 0, 1), final_state, residuals


def _packed_bwd_call(params, cfg: NTMConfig, tokens, residuals, dlogits,
                     dfinal, interpret):
    from ntm_tracker_tpu.ops.pallas.scan_bptt import _pack_weights

    B, T, IN = tokens.shape
    cs = _static(cfg)
    (H, R, W, D, N, S, Hc, L, _sh, _wf, sizes, _sl) = cs
    DN = D * N
    P = sum(sizes.values())
    O = cfg.output_dim
    lstm_w, lstm_b, kins, KIN = _pack_weights(params, cfg, IN)
    lstm_wT = jnp.stack([jnp.swapaxes(lstm_w[l], 0, 1) for l in range(L)])
    heads_wT = jnp.swapaxes(params["heads_w"].astype(f32), 0, 1)
    out_wT = jnp.swapaxes(params["out_w"].astype(f32), 0, 1)
    E_dn, A_d, A_n = _selectors(D, N)
    SELS = _block_selectors(cs)
    Mph, wh, readh, ch, hh = residuals

    dMf = jnp.swapaxes(dfinal["M"].astype(f32), 1, 2).reshape(B, DN)
    dwf = dfinal["w"].astype(f32)
    dreadf = dfinal["read"].astype(f32).reshape(B, R * D)
    dcf = jnp.stack([c for c, _ in dfinal["controller_state"]]).astype(f32)
    dhf = jnp.stack([h for _, h in dfinal["controller_state"]]).astype(f32)

    rev3 = lambda a, b: pl.BlockSpec((1, a, b), lambda i: (T - 1 - i, 0, 0),
                                     memory_space=pltpu.VMEM)
    rev4 = lambda a, b, c: pl.BlockSpec(
        (1, a, b, c), lambda i: (T - 1 - i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    const3 = lambda a, b, c: pl.BlockSpec((a, b, c), lambda i: (0, 0, 0),
                                          memory_space=pltpu.VMEM)
    const2 = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)

    kern = functools.partial(_packed_bwd_kernel, cs=cs)
    out = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            rev3(B, IN),
            rev3(B, DN), rev4(B, H, N), rev3(B, R * D),
            rev4(L, B, Hc), rev4(L, B, Hc),
            rev3(B, O),
            const3(L, KIN, 4 * Hc), const2(L, 4 * Hc),
            const2(Hc, P), const2(1, P), const2(Hc, O), const2(1, O),
            const3(L, 4 * Hc, KIN), const2(P, Hc), const2(O, Hc),
            const2(D, DN), const2(DN, D), const2(DN, N),
            const3(H + 2 * W, D, P),
            const2(B, DN), const3(B, H, N), const2(B, R * D),
            const3(L, B, Hc), const3(L, B, Hc),
        ],
        out_specs=(
            const2(B, DN), const3(B, H, N), const2(B, R * D),
            const3(L, B, Hc), const3(L, B, Hc),
            const3(L, KIN, 4 * Hc), const2(L, 4 * Hc),
            const2(Hc, P), const2(1, P), const2(Hc, O), const2(1, O),
            rev3(B, IN),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, DN), f32),
            jax.ShapeDtypeStruct((B, H, N), f32),
            jax.ShapeDtypeStruct((B, R * D), f32),
            jax.ShapeDtypeStruct((L, B, Hc), f32),
            jax.ShapeDtypeStruct((L, B, Hc), f32),
            jax.ShapeDtypeStruct((L, KIN, 4 * Hc), f32),
            jax.ShapeDtypeStruct((L, 4 * Hc), f32),
            jax.ShapeDtypeStruct((Hc, P), f32),
            jax.ShapeDtypeStruct((1, P), f32),
            jax.ShapeDtypeStruct((Hc, O), f32),
            jax.ShapeDtypeStruct((1, O), f32),
            jax.ShapeDtypeStruct((T, B, IN), f32),
        ),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(
        jnp.swapaxes(tokens.astype(f32), 0, 1),
        Mph, wh, readh, ch, hh,
        jnp.swapaxes(dlogits.astype(f32), 0, 1),
        lstm_w, lstm_b,
        params["heads_w"].astype(f32), params["heads_b"].astype(f32)[None, :],
        params["out_w"].astype(f32), params["out_b"].astype(f32)[None, :],
        lstm_wT, heads_wT, out_wT,
        E_dn, A_d, A_n, SELS,
        dMf, dwf, dreadf, dcf, dhf,
    )
    (dMp0, dw0, dread0, dc0, dh0, dlstm_w, dlstm_b, dheads_w, dheads_b,
     dout_w, dout_b, dx) = out

    dparams = {
        "controller": [
            {"kernel": dlstm_w[l][: kins[l], :], "bias": dlstm_b[l]}
            for l in range(L)
        ],
        "heads_w": dheads_w,
        "heads_b": dheads_b[0],
        "out_w": dout_w,
        "out_b": dout_b[0],
        "init_M": jnp.zeros_like(params["init_M"]),
        "init_w": jnp.zeros_like(params["init_w"]),
        "init_read": jnp.zeros_like(params["init_read"]),
    }
    dstate0 = {
        "M": jnp.swapaxes(dMp0.reshape(B, D, N), 1, 2),
        "w": dw0,
        "read": dread0.reshape(B, R, D),
        "controller_state": [(dc0[l], dh0[l]) for l in range(L)],
    }
    return dparams, jnp.swapaxes(dx, 0, 1), dstate0


@functools.lru_cache(maxsize=None)
def _packed_bptt_wrapped(cfg: NTMConfig, interpret: bool):
    def forward(params, tokens, state):
        logits, final_state, _res = _packed_fwd_call(
            params, cfg, tokens, state, interpret
        )
        return logits, final_state

    fn = jax.custom_vjp(forward)

    def fwd(params, tokens, state):
        logits, final_state, res = _packed_fwd_call(
            params, cfg, tokens, state, interpret
        )
        return (logits, final_state), (params, tokens, res)

    def bwd(saved, cot):
        params, tokens, res = saved
        dlogits, dfinal = cot
        return _packed_bwd_call(
            params, cfg, tokens, res, dlogits, dfinal, interpret
        )

    fn.defvjp(fwd, bwd)
    return fn


def ntm_scan_packed_bptt(
    params: Dict[str, Any],
    cfg: NTMConfig,
    tokens: jax.Array,
    state: Dict[str, Any],
    interpret: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """T NTM steps with the lane-packed Pallas forward+backward (f32).

    Same contract and gradient semantics as scan_bptt.ntm_scan_fused_bptt
    (differentiable wrt params, tokens, initial state; d/dgamma of pow at
    w_conv == 0 exactly yields 0 where jax.grad yields NaN*0).

    Measured SLOWER than that pair at every hardware-compilable batch
    (module docstring) — use for measurement/regression, not training."""
    B = tokens.shape[0]
    if not interpret and B > MAX_HW_BATCH:
        raise ValueError(
            f"packed bptt: batch {B} exceeds the Mosaic hardware compile "
            f"ceiling ({MAX_HW_BATCH}, same as the row-loop backward); "
            "use the XLA remat scan for large-batch training."
        )
    if cfg.use_pallas:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, use_pallas=False)  # static key hygiene
    return _packed_bptt_wrapped(cfg, interpret)(params, tokens, state)
