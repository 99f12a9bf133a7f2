"""Whole-sequence fused NTM BPTT: T forward steps AND the full backward
pass as two pallas_calls — the round-3 answer to the training-path gap.

Why (measured on v5e, B=256 knee, tools/profile_train.py): the XLA grad
step is 288 ms of which the FORWARD scan is only 48 ms and the
controller-only BPTT 27.7 ms — ~260 ms is the reverse pass of the
addressing/memory chain, insensitive to matmul dtype / remat policy /
scan unroll / memory layout (every probe measured flat). XLA's transposed
program re-materializes the [B,N,D]-shaped cotangent chain through HBM at
every one of the 1300 reverse steps; there is no XLA-level knob left.
This kernel keeps the recurrent state, its cotangents AND the parameter
gradient accumulators resident in VMEM for the whole sequence:

  forward (grid=(T,)):  the ntm_scan_fused math (scan_cell.py) plus
      t-indexed RESIDUAL streams of each step's INPUT state
      (M_prev, w_prev, read_prev, c_prev, h_prev) — ~4 MB/step to HBM,
      exactly what the backward needs to run recompute-free.
  backward (grid=(T,) reversed): per step, recompute the forward's
      intermediates from the residuals (VMEM-local), then hand-derived
      VJPs of the full chain — output/head linears, stacked
      BasicLSTMCell, tanh(k), the across-slot cosine quirk
      (ops.py:147-156), beta-softmax, interpolation gate, Py2-offset
      circular conv, pow-sharpen with the +1e-3 normalizer
      (ntm_cell.py:169-176), erase/add memory update and the read —
      accumulating parameter grads in VMEM and carrying the state
      cotangents (dM, dw, dread, dc, dh) to the previous step.

Semantics match jax.grad of the jnp lax.scan over ntm_cell_step at f32
(asserted in tests/test_pallas_bptt.py, CPU interpret mode; the single
intentional deviation is d/dgamma of pow at w_conv == 0 exactly, where
jax.grad yields NaN*0 and this kernel yields 0).

MEASURED VERDICT (v5e, T=1300, flagship config; r3 measured the original
single-tile kernel, r4 re-measured after (a) the batch-tiled grid +
scoped-VMEM raise removed the old B>32 compile ceiling and (b) the
dcontrols assembly switched from masked-iota accumulation — O(B*P) VPU
work per column — to single-column scratch stores, worth another 16-38%;
tools/bench_bptt_knee.py, tile 64):

    batch   fused grad step     XLA grad step (remat scan, same day)
      8        23.3 ms  (r3)       29.6 ms    (fused 1.27x faster)
     16        35.4 ms  (r3)       38.1 ms    (fused 1.08x)
     32        38.7 ms             57.4 ms    (fused 1.48x)
     64        56.2 ms             90.7 ms    (fused 1.61x)
    128       107.5 ms            155.7 ms    (fused 1.45x)
    256       207.8 ms            289.8 ms    (fused 1.39x —
                                   24,636 trained frames/s at the knee)
    512       compile failed*     651.8 ms    (15.7k f/s — past the knee)

  * the B=512 failure (r4: remote compile helper exit 1, "HTTP 500, no
    diagnostic") was ROOT-CAUSED in r5 by re-probing: at T=12 the 8-tile
    program compiles and runs fine (`probe_bptt_b64 --b512`), and at the
    real T=1300 it fails with a clean HBM RESOURCE_EXHAUSTED during
    buffer assignment — the recompute-free backward's residual streams
    cost ~14.7 KB/row/step (M_prev 2560 + w_prev 640 + read_prev 80 +
    c/h 400 floats), i.e. ~9.8 GB at B=512/T=1300 vs ~4.9 GB at the
    B=256 knee, plus tokens/grads — past the v5e's 16 GB. A capacity
    wall, not a Mosaic bug; irrelevant in practice — per-row cost is
    flat in B (~40 us/tile-step at tile 64), so B=512 could at best
    match B=256's 24.6k f/s while XLA's own B=512 is 11% WORSE than its
    B=256, i.e. 256 is the knee for both paths.
    Since r5 this failure class also cannot break a training run: the
    entry points compile through train_step_with_bptt_fallback
    (train/experiments.py), which degrades any fused-BPTT compile
    failure to the XLA scan (whose remat trades the residuals for
    recompute) and logs it.

ROOT CAUSE of the old ceiling (r4, tools/probe_bptt_b64.py): a
scoped-VMEM stack OOM, reported only when run under a child that captures
the real error: "Ran out of memory in memory space vmem ... Scoped
allocation with size 19.09M and limit 16.00M exceeded scoped vmem limit
by 3.09M" on the backward pallas_call — ~0.3 MB of scoped VMEM per batch
row (T-independent) vs the 16 MB default limit. FIXED TWICE OVER: the
(B/BATCH_TILE, T) grid bounds scoped VMEM by the tile size, and
_COMPILER_PARAMS raises the per-kernel limit to 100 MB
(pltpu.CompilerParams(vmem_limit_bytes=...) — the per-kernel knob works
on this backend; the LIBTPU_INIT_ARGS env route does not, because the
tunnel's AOT compile server snapshots the terminal's env).

Per-step cost fits t = 13 + 0.5*Bt microseconds per tile (down from
13 + 0.77*Bt before the scratch-store swap): the kernel is VPU
INSTRUCTION-ISSUE bound (the D=20/H=5 unrolled row loops emit ~2k small
vector ops per step), not HBM bound. DECISION (r4): the fused path beats
the XLA scan at EVERY measured batch including the B=256 cached-training
knee (1.39x), so TrainConfig.fused_bptt defaults to "auto" — fused on a
single TPU chip at f32 with B >= 64; XLA scan on CPU, under pjit meshes
(Pallas has no GSPMD partitioning rules), and below B=64 (narrow-tile
Mosaic compiles measured ~5 min; see the BATCH_TILE note).

Training entry: ntm_tracker_unroll(..., fused_bptt=True|"auto") /
TrainConfig.fused_bptt.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntm_tracker_tpu.config import NTMConfig
from ntm_tracker_tpu.ops.memory import circular_convolution_shifts

f32 = jnp.float32

# Batch rows processed per grid tile. Round 4 root-caused the old B=64
# "compile crash" as a scoped-VMEM stack OOM — the kernels need ~0.3 MB of
# scoped VMEM per batch row vs the 16 MB default limit ("Scoped allocation
# with size 19.09M and limit 16.00M" at B=64, tools/probe_bptt_b64.py) —
# and then FIXED IT BY DESIGN: the grid is now (B/tile, T), so each tile's
# scratch is bounded by the tile size regardless of B (batch rows are
# independent everywhere except the parameter-gradient accumulators, which
# live in a grid-constant block and accumulate across tiles; TPU grids run
# sequentially, so the revisited block stays VMEM-resident). Batches that
# don't divide are zero-padded to the tile boundary; padded rows carry
# zero cotangents, so every gradient contribution from them is exactly
# zero.
#
# Tile choice (swept at B=256/T=1300, v5e, with the _COMPILER_PARAMS
# scoped-VMEM raise below, pre-scratch-store kernel — relative ordering
# holds): bigger tiles amortize the ~13 us/grid-step fixed cost but
# inflate Mosaic compile time steeply —
#     tile    grad step     first compile
#      32      345 ms          14 s
#      64      247 ms          46 s     <- default (207.8 ms post-
#     128      227 ms         5.4 min      scratch-store — the shipped
#     256      (compile >15 min; rejected) kernel; see module docstring)
# NTM_FUSED_BPTT_BATCH_TILE=128 bought +9% in that sweep, but the
# advantage did NOT survive the scratch-store swap: re-measured r5
# (post-scratch-store, same B=256/T=1300 shape) tile 128 is 212.0 ms vs
# tile 64's 207.8 ms, with its compile down to 71 s — the per-column
# work the bigger tile used to amortize is what the swap eliminated.
# The env override remains for tile experiments only; 64 wins outright.
#
# Post-scratch-store the compile-time balance FLIPPED: tile-64 kernels
# now compile in 17-46 s but the NARROW tile (Bt=32, taken automatically
# when B<64) was measured at ~5 min — which is why fused_bptt="auto"
# only engages at B>=64 (ntm_tracker.py); explicit True accepts the
# one-off compile at any batch.
BATCH_TILE = int(os.environ.get("NTM_FUSED_BPTT_BATCH_TILE", "64"))

# Per-kernel scoped-VMEM limit override. The original B=64 OOM was against
# the 16 MB DEFAULT scoped limit; pltpu.CompilerParams(vmem_limit_bytes=...)
# raises it for THIS kernel only (no libtpu process flag needed — the
# env-var route is unusable on the tunneled axon backend, whose AOT compile
# server snapshots the terminal's env; probe_bptt_b64.py). 100 MB of the
# chip's 128 MB physical VMEM, same setting scan_packed.py ships.
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _forward_math(x, M_prev, w_prev, read_prev, c_prev, h_prev, lstm_w,
                  lstm_b, heads_w, heads_b, out_w, out_b, cs):
    """One cell step on VMEM values; returns (logit, new state pieces) and
    every intermediate the backward needs. Shared by the residual forward
    kernel and the backward's recompute. Mirrors scan_cell._step_kernel
    (itself pinned to ntm_cell_step by tests/test_pallas_scan.py)."""
    (H, R, W, D, N, S, Hc, L, shifts, write_first, sizes, slotwise) = cs
    B = x.shape[0]

    inp = jnp.concatenate([x, read_prev], axis=1)
    KIN = lstm_w.shape[1]
    gates_l, li_l, c_l_new, h_l_new = [], [], [], []
    for l in range(L):
        li = jnp.concatenate([inp, h_prev[l]], axis=1)
        if li.shape[1] < KIN:
            li = jnp.pad(li, ((0, 0), (0, KIN - li.shape[1])))
        gates = jnp.dot(li, lstm_w[l], preferred_element_type=f32) + lstm_b[l][None, :]
        i_g = gates[:, 0 * Hc : 1 * Hc]
        j_g = gates[:, 1 * Hc : 2 * Hc]
        f_g = gates[:, 2 * Hc : 3 * Hc]
        o_g = gates[:, 3 * Hc : 4 * Hc]
        new_c = c_prev[l] * jax.nn.sigmoid(f_g) + jax.nn.sigmoid(i_g) * jnp.tanh(j_g)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o_g)
        gates_l.append(gates)
        li_l.append(li)
        c_l_new.append(new_c)
        h_l_new.append(new_h)
        inp = new_h
    ctrl_out = inp

    controls = jnp.dot(ctrl_out, heads_w, preferred_element_type=f32) + heads_b[0][None, :]
    o = 0
    part = {}
    for name in ("k", "beta", "g", "sw", "gamma", "erase", "add"):
        part[name] = controls[:, o : o + sizes[name]]
        o += sizes[name]

    logit = jnp.dot(ctrl_out, out_w, preferred_element_type=f32) + out_b[0][None, :]

    # memory normalization (the across-slot quirk unless slotwise)
    if slotwise:
        m_ss = jnp.sum(M_prev * M_prev, axis=1)            # [B,N]
        m_inv = jax.lax.rsqrt(jnp.maximum(m_ss, 1e-12))
        Mtn = M_prev * m_inv[:, None, :]
    else:
        m_ss = jnp.sum(M_prev * M_prev, axis=2)            # [B,D]
        m_inv = jax.lax.rsqrt(jnp.maximum(m_ss, 1e-12))
        Mtn = M_prev * m_inv[:, :, None]

    beta = jax.nn.softplus(part["beta"])
    g = jax.nn.sigmoid(part["g"])
    gamma = jax.nn.softplus(part["gamma"]) + 1.0

    per_head = []
    w_heads = []
    for h in range(H):
        k_h = jnp.tanh(part["k"][:, h * D : (h + 1) * D])   # [B,D]
        k_ss = jnp.sum(k_h * k_h, axis=1, keepdims=True)    # [B,1]
        k_inv = jax.lax.rsqrt(jnp.maximum(k_ss, 1e-12))
        u = jnp.zeros((B, N), f32)
        for d in range(D):
            u = u + k_h[:, d][:, None] * Mtn[:, d, :]
        sim = u * k_inv

        s_pre = sim * beta[:, h][:, None]
        w_c = jax.nn.softmax(s_pre, axis=-1)
        g_h = g[:, h][:, None]
        w_g = w_c * g_h + w_prev[:, h, :] * (1.0 - g_h)

        sw_h = jax.nn.softmax(part["sw"][:, h * S : (h + 1) * S], axis=-1)
        w_conv = jnp.zeros_like(w_g)
        for j, s in enumerate(shifts):
            w_conv = w_conv + sw_h[:, j][:, None] * pltpu.roll(w_g, (-s) % N, axis=1)
        powed = jnp.power(w_conv, gamma[:, h][:, None])
        denom = jnp.sum(powed, axis=1, keepdims=True) + 1e-3
        w_h = powed / denom
        w_heads.append(w_h)
        per_head.append(dict(k_h=k_h, k_ss=k_ss, k_inv=k_inv, u=u, sim=sim,
                             w_c=w_c, w_g=w_g, sw_h=sw_h, w_conv=w_conv,
                             powed=powed, denom=denom))

    erase = jax.nn.sigmoid(part["erase"])                   # [B, W*D]
    add = jnp.tanh(part["add"])                             # [B, W*D]
    M_rows, er_rows, ad_rows = [], [], []
    for d in range(D):
        er = jnp.ones((B, N), f32)
        ad = jnp.zeros((B, N), f32)
        for wh in range(W):
            ww = w_heads[R + wh]
            er = er * (1.0 - ww * erase[:, wh * D + d][:, None])
            ad = ad + ww * add[:, wh * D + d][:, None]
        er_rows.append(er)
        ad_rows.append(ad)
        M_rows.append(M_prev[:, d, :] * er + ad)

    src_rows = M_rows if write_first else [M_prev[:, d, :] for d in range(D)]
    read_cols = []
    for r in range(R):
        for d in range(D):
            read_cols.append(jnp.sum(w_heads[r] * src_rows[d], axis=1, keepdims=True))
    read = jnp.concatenate(read_cols, axis=1)               # [B, R*D]

    inter = dict(
        gates_l=gates_l, li_l=li_l, c_l_new=c_l_new, h_l_new=h_l_new,
        ctrl_out=ctrl_out, part=part, m_ss=m_ss, m_inv=m_inv, Mtn=Mtn,
        beta=beta, g=g, gamma=gamma, per_head=per_head, w_heads=w_heads,
        erase=erase, add=add, er_rows=er_rows, ad_rows=ad_rows,
        M_rows=M_rows, src_rows=src_rows,
    )
    return logit, M_rows, w_heads, read, c_l_new, h_l_new, inter


def _fwd_res_kernel(
    x_ref, lstm_w_ref, lstm_b_ref, heads_w_ref, heads_b_ref, out_w_ref,
    out_b_ref, M0_ref, w0_ref, read0_ref, c0_ref, h0_ref,
    # outputs
    logits_ref, M_ref, w_ref, read_ref, c_ref, h_ref,
    Mh_ref, wh_ref, readh_ref, ch_ref, hh_ref,
    *, cs,
):
    (H, R, W, D, N, S, Hc, L, shifts, write_first, sizes, slotwise) = cs
    t = pl.program_id(1)  # grid = (batch tiles, T); T is the inner dim

    @pl.when(t == 0)
    def _init():
        M_ref[:] = M0_ref[:]
        w_ref[:] = w0_ref[:]
        read_ref[:] = read0_ref[:]
        c_ref[:] = c0_ref[:]
        h_ref[:] = h0_ref[:]

    # residual streams: the step's INPUT state
    Mh_ref[0] = M_ref[:]
    wh_ref[0] = w_ref[:]
    readh_ref[0] = read_ref[:]
    ch_ref[0] = c_ref[:]
    hh_ref[0] = h_ref[:]

    logit, M_rows, w_heads, read, c_new, h_new, _ = _forward_math(
        x_ref[0], M_ref[:], w_ref[:], read_ref[:],
        [c_ref[l] for l in range(L)], [h_ref[l] for l in range(L)],
        lstm_w_ref[:], lstm_b_ref[:], heads_w_ref[:], heads_b_ref[:],
        out_w_ref[:], out_b_ref[:], cs,
    )
    for d in range(D):
        M_ref[:, d, :] = M_rows[d]
    for h in range(H):
        w_ref[:, h, :] = w_heads[h]
    read_ref[:] = read
    for l in range(L):
        c_ref[l] = c_new[l]
        h_ref[l] = h_new[l]
    logits_ref[0] = logit


def _bwd_kernel(
    # t-indexed (REVERSED maps): token, residuals, logit cotangent
    x_ref, Mh_ref, wh_ref, readh_ref, ch_ref, hh_ref, dlogit_ref,
    # constants
    lstm_w_ref, lstm_b_ref, heads_w_ref, heads_b_ref, out_w_ref, out_b_ref,
    lstm_wT_ref, heads_wT_ref, out_wT_ref,
    # final-state cotangents (constants, consumed at i==0)
    dMf_ref, dwf_ref, dreadf_ref, dcf_ref, dhf_ref,
    # outputs: state-cotangent carries, param grads, token grads
    dM_ref, dw_ref, dread_ref, dc_ref, dh_ref,
    dlstm_w_ref, dlstm_b_ref, dheads_w_ref, dheads_b_ref, dout_w_ref,
    dout_b_ref, dx_ref,
    # scratch
    dctrl_ref,
    *, cs,
):
    (H, R, W, D, N, S, Hc, L, shifts, write_first, sizes, slotwise) = cs
    i = pl.program_id(1)  # grid = (batch tiles, T reversed); T inner
    B = x_ref.shape[1]

    @pl.when(i == 0)
    def _init_carries():
        # every batch tile starts its reverse sweep from ITS final-state
        # cotangent block
        dM_ref[:] = dMf_ref[:]
        dw_ref[:] = dwf_ref[:]
        dread_ref[:] = dreadf_ref[:]
        dc_ref[:] = dcf_ref[:]
        dh_ref[:] = dhf_ref[:]

    @pl.when((pl.program_id(0) == 0) & (i == 0))
    def _init_param_grads():
        # the param-grad blocks are grid-constant: zeroed once on the very
        # first grid step, then accumulated across ALL tiles and timesteps
        dlstm_w_ref[:] = jnp.zeros_like(dlstm_w_ref)
        dlstm_b_ref[:] = jnp.zeros_like(dlstm_b_ref)
        dheads_w_ref[:] = jnp.zeros_like(dheads_w_ref)
        dheads_b_ref[:] = jnp.zeros_like(dheads_b_ref)
        dout_w_ref[:] = jnp.zeros_like(dout_w_ref)
        dout_b_ref[:] = jnp.zeros_like(dout_b_ref)

    x = x_ref[0]
    M_prev = Mh_ref[0]
    w_prev = wh_ref[0]
    read_prev = readh_ref[0]
    c_prev = [ch_ref[0, l] for l in range(L)]
    h_prev = [hh_ref[0, l] for l in range(L)]

    P = heads_w_ref.shape[1]
    # dcontrols is assembled by SINGLE-COLUMN STORES into a [B,P] VMEM
    # scratch (every one of the P columns is written exactly once per
    # step, so no zeroing is needed). Mosaic rejects tpu.concatenate of
    # ~200 width-1 slices ('result/input offset mismatch on non-concat
    # dimension'), and the r3 masked-iota accumulation did O(B*P) work
    # PER COLUMN; a static column store is O(B).
    def place(_buf, col, piece):
        dctrl_ref[:, col : col + 1] = piece
        return _buf

    # ---- recompute the forward step (VMEM-local) -------------------------
    _logit, M_rows, w_heads, _read, _c_new, _h_new, it = _forward_math(
        x, M_prev, w_prev, read_prev, c_prev, h_prev,
        lstm_w_ref[:], lstm_b_ref[:], heads_w_ref[:], heads_b_ref[:],
        out_w_ref[:], out_b_ref[:], cs,
    )

    dlogit = dlogit_ref[0]                        # [B,O]
    dM_in = dM_ref[:]                             # cotangent of M_t
    dw_in = dw_ref[:]                             # cotangent of w_t
    dread_in = dread_ref[:]                       # cotangent of read_t

    # ---- read backward ---------------------------------------------------
    # read[r,d] = sum_n w_r * src_d ; src = M_rows (write_first) or M_prev
    dw_head = [dw_in[:, h, :] for h in range(H)]  # incoming via state carry
    dsrc_rows = [jnp.zeros((B, N), f32) for _ in range(D)]
    for r in range(R):
        for d in range(D):
            dr = dread_in[:, r * D + d][:, None]  # [B,1]
            dw_head[r] = dw_head[r] + dr * it["src_rows"][d]
            dsrc_rows[d] = dsrc_rows[d] + dr * w_heads[r]

    # ---- erase/add backward ---------------------------------------------
    # M_new_d = M_prev_d * er_d + ad_d
    dM_rows = [dM_in[:, d, :] for d in range(D)]
    dM_prev_rows = [jnp.zeros((B, N), f32) for _ in range(D)]
    if write_first:
        # read consumed M_new
        dM_rows = [dM_rows[d] + dsrc_rows[d] for d in range(D)]
    else:
        # read consumed M_prev
        dM_prev_rows = [dM_prev_rows[d] + dsrc_rows[d] for d in range(D)]

    # column offsets of the fused head-parameter layout
    off = {}
    o = 0
    for name in ("k", "beta", "g", "sw", "gamma", "erase", "add"):
        off[name] = o
        o += sizes[name]
    dcontrols = jnp.zeros((B, P), f32)

    for d in range(D):
        dM_prev_rows[d] = dM_prev_rows[d] + dM_rows[d] * it["er_rows"][d]
        der = dM_rows[d] * M_prev[:, d, :]        # d/d er_d
        dad = dM_rows[d]                          # d/d ad_d
        for wh in range(W):
            ww = w_heads[R + wh]
            e_whd = it["erase"][:, wh * D + d][:, None]
            a_whd = it["add"][:, wh * D + d][:, None]
            # er_d = prod_w (1 - ww*e): gradient through THIS factor is
            # der * prod_{others}
            others = jnp.ones((B, N), f32)
            for wo in range(W):
                if wo != wh:
                    others = others * (
                        1.0 - w_heads[R + wo]
                        * it["erase"][:, wo * D + d][:, None]
                    )
            dfac = der * others                   # d/d(1 - ww*e)
            dw_head[R + wh] = dw_head[R + wh] - dfac * e_whd + dad * a_whd
            de = jnp.sum(-dfac * ww, axis=1, keepdims=True)
            da = jnp.sum(dad * ww, axis=1, keepdims=True)
            # through the activations (erase = sigmoid, add = tanh)
            dcontrols = place(
                dcontrols, off["erase"] + wh * D + d,
                de * e_whd * (1.0 - e_whd),
            )
            dcontrols = place(
                dcontrols, off["add"] + wh * D + d,
                da * (1.0 - a_whd * a_whd),
            )

    # ---- per-head addressing backward ------------------------------------
    dw_prev_heads = []
    dMtn_rows = [jnp.zeros((B, N), f32) for _ in range(D)]
    for h in range(H):
        ph = it["per_head"][h]
        dwh = dw_head[h]                          # cotangent of w_h
        # sharpen: w = p / (sum p + 1e-3)
        inv_den = 1.0 / ph["denom"]
        dp = dwh * inv_den - jnp.sum(dwh * ph["powed"], axis=1, keepdims=True) * inv_den * inv_den
        gam = it["gamma"][:, h][:, None]
        # p = w_conv ** gamma
        dw_conv = dp * gam * jnp.power(ph["w_conv"], gam - 1.0)
        log_wc = jnp.where(ph["w_conv"] > 0.0, jnp.log(ph["w_conv"]), 0.0)
        dgamma_h = jnp.sum(dp * ph["powed"] * log_wc, axis=1, keepdims=True)
        # circular conv: w_conv = sum_j sw_j * roll(w_g, -s_j)
        dw_g = jnp.zeros((B, N), f32)
        dsw_h = []
        for j, s in enumerate(shifts):
            rolled = pltpu.roll(ph["w_g"], (-s) % N, axis=1)
            dsw_h.append(jnp.sum(dw_conv * rolled, axis=1, keepdims=True))
            dw_g = dw_g + ph["sw_h"][:, j][:, None] * pltpu.roll(
                dw_conv, s % N, axis=1
            )
        # sw softmax backward: ds_j = (dsw_j - sum_j' dsw_j' sw_j') * sw_j
        dot_sw = dsw_h[0] * ph["sw_h"][:, 0][:, None]
        for j in range(1, S):
            dot_sw = dot_sw + dsw_h[j] * ph["sw_h"][:, j][:, None]
        for j in range(S):
            dcontrols = place(
                dcontrols, off["sw"] + h * S + j,
                (dsw_h[j] - dot_sw) * ph["sw_h"][:, j][:, None],
            )
        # gate: w_g = w_c*g + w_prev*(1-g)
        g_h = it["g"][:, h][:, None]
        dw_c = dw_g * g_h
        dw_prev_heads.append(dw_g * (1.0 - g_h))
        dg_h = jnp.sum(dw_g * (ph["w_c"] - w_prev[:, h, :]), axis=1, keepdims=True)
        # content softmax: w_c = softmax(sim * beta)
        ds_pre = (dw_c - jnp.sum(dw_c * ph["w_c"], axis=1, keepdims=True)) * ph["w_c"]
        b_h = it["beta"][:, h][:, None]
        dsim = ds_pre * b_h
        dbeta_h = jnp.sum(ds_pre * ph["sim"], axis=1, keepdims=True)
        # sim = u * k_inv
        du = dsim * ph["k_inv"]
        dk_inv = jnp.sum(dsim * ph["u"], axis=1, keepdims=True)
        # k_inv = rsqrt(max(k_ss, eps))
        live_k = (ph["k_ss"] > 1e-12).astype(f32)
        dk_ss = dk_inv * (-0.5) * ph["k_inv"] * ph["k_inv"] * ph["k_inv"] * live_k
        # u = sum_d k_d * Mtn_d ; k = tanh(k_raw)
        for d in range(D):
            dMtn_rows[d] = dMtn_rows[d] + du * ph["k_h"][:, d][:, None]
            k_hd = ph["k_h"][:, d][:, None]
            dk_hd = (
                jnp.sum(du * it["Mtn"][:, d, :], axis=1, keepdims=True)
                + 2.0 * k_hd * dk_ss
            )
            dcontrols = place(
                dcontrols, off["k"] + h * D + d,
                dk_hd * (1.0 - k_hd * k_hd),
            )
        # scalar heads through their activations
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
    if slotwise:
        # m_inv per [B,N] (over D)
        dm_inv = jnp.zeros((B, N), f32)
        for d in range(D):
            dM_prev_rows[d] = dM_prev_rows[d] + dMtn_rows[d] * it["m_inv"]
            dm_inv = dm_inv + dMtn_rows[d] * M_prev[:, d, :]
        live = (it["m_ss"] > 1e-12).astype(f32)
        dss = dm_inv * (-0.5) * it["m_inv"] ** 3 * live    # [B,N]
        for d in range(D):
            dM_prev_rows[d] = dM_prev_rows[d] + 2.0 * M_prev[:, d, :] * dss
    else:
        for d in range(D):
            m_inv_d = it["m_inv"][:, d][:, None]
            dMtn_d = dMtn_rows[d]
            dM_prev_rows[d] = dM_prev_rows[d] + dMtn_d * m_inv_d
            dm_inv_d = jnp.sum(dMtn_d * M_prev[:, d, :], axis=1, keepdims=True)
            live = (it["m_ss"][:, d] > 1e-12).astype(f32)[:, None]
            dss_d = dm_inv_d * (-0.5) * m_inv_d * m_inv_d * m_inv_d * live
            dM_prev_rows[d] = dM_prev_rows[d] + 2.0 * M_prev[:, d, :] * dss_d

    # ---- head/output linear backward ------------------------------------
    # the column stores above have populated every column of the scratch;
    # read it back as the assembled [B,P] cotangent of the head controls
    dcontrols = dctrl_ref[:]
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
        jnp.dot(dcontrols, heads_wT_ref[:], preferred_element_type=f32)
        + jnp.dot(dlogit, out_wT_ref[:], preferred_element_type=f32)
    )                                             # [B,Hc]

    # ---- stacked LSTM backward (top layer first) ------------------------
    KIN = lstm_w_ref.shape[1]
    d_inp_above = dctrl                           # d of the layer's OUTPUT
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
        dgates = jnp.concatenate([di, dj, df, do], axis=1)  # [B,4Hc]
        dc_ref[l] = dnew_c * sf
        # param grads
        dlstm_w_ref[l] += jax.lax.dot_general(
            it["li_l"][l], dgates, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dlstm_b_ref[l] += jnp.sum(dgates, axis=0)
        dli = jnp.dot(dgates, lstm_wT_ref[l], preferred_element_type=f32)  # [B,KIN]
        in_l = (x.shape[1] + read_prev.shape[1]) if l == 0 else Hc
        dh_ref[l] = dli[:, in_l : in_l + Hc]
        if l == 0:
            dx_out = dli[:, : x.shape[1]]
            dread_prev = dli[:, x.shape[1] : in_l]
        else:
            d_inp_above = dli[:, :in_l]

    # ---- write carries ---------------------------------------------------
    for d in range(D):
        dM_ref[:, d, :] = dM_prev_rows[d]
    for h in range(H):
        dw_ref[:, h, :] = dw_prev_heads[h]
    dread_ref[:] = dread_prev
    dx_ref[0] = dx_out


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _static(cfg: NTMConfig):
    from ntm_tracker_tpu.models.ntm_cell import head_param_sizes

    sizes = head_param_sizes(cfg)
    return (
        cfg.num_heads, cfg.read_head_size, cfg.write_head_size, cfg.mem_dim,
        cfg.mem_size, cfg.shift_space, cfg.controller_hidden_size,
        cfg.controller_num_layers, tuple(circular_convolution_shifts(cfg.shift_space)),
        cfg.write_first, sizes, cfg.slotwise_cosine,
    )


def _pack_weights(params, cfg: NTMConfig, IN: int):
    Hc, L, R, D = (cfg.controller_hidden_size, cfg.controller_num_layers,
                   cfg.read_head_size, cfg.mem_dim)
    kins = [IN + R * D + Hc] + [2 * Hc] * (L - 1)
    KIN = max(kins)
    lstm_w = jnp.stack([
        jnp.pad(p["kernel"].astype(f32),
                ((0, KIN - p["kernel"].shape[0]), (0, 0)))
        for p in params["controller"]
    ])
    lstm_b = jnp.stack([p["bias"].astype(f32) for p in params["controller"]])
    return lstm_w, lstm_b, kins, KIN


def _tiles_of(B: int) -> Tuple[int, int, int]:
    """(tile, padded batch, num tiles) for the (B/tile, T) kernel grid."""
    Bt = min(B, BATCH_TILE)
    Bp = -(-B // Bt) * Bt
    return Bt, Bp, Bp // Bt


def _pad_rows(x, Bp: int, axis: int = 0):
    if x.shape[axis] == Bp:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, Bp - x.shape[axis])
    return jnp.pad(x, pads)


def _fwd_call(params, cfg: NTMConfig, tokens, state, interpret):
    B, T, IN = tokens.shape
    Bt, Bp, nb = _tiles_of(B)
    cs = _static(cfg)
    (H, R, W, D, N, S, Hc, L, _sh, _wf, sizes, _sl) = cs
    P = sum(sizes.values())
    O = cfg.output_dim
    lstm_w, lstm_b, _kins, KIN = _pack_weights(params, cfg, IN)
    c0 = jnp.stack([c for c, _ in state["controller_state"]]).astype(f32)
    h0 = jnp.stack([h for _, h in state["controller_state"]]).astype(f32)

    const3 = lambda a, b, c: pl.BlockSpec((a, b, c), lambda bi, t: (0, 0, 0),
                                          memory_space=pltpu.VMEM)
    const2 = lambda a, b: pl.BlockSpec((a, b), lambda bi, t: (0, 0),
                                       memory_space=pltpu.VMEM)
    # per-batch-tile state/carry blocks
    btile3 = lambda b, c: pl.BlockSpec((Bt, b, c), lambda bi, t: (bi, 0, 0),
                                       memory_space=pltpu.VMEM)
    btile2 = lambda b: pl.BlockSpec((Bt, b), lambda bi, t: (bi, 0),
                                    memory_space=pltpu.VMEM)
    ltile3 = lambda b: pl.BlockSpec((L, Bt, b), lambda bi, t: (0, bi, 0),
                                    memory_space=pltpu.VMEM)
    # t-indexed streams, tiled over batch
    tidx3 = lambda b: pl.BlockSpec((1, Bt, b), lambda bi, t: (t, bi, 0),
                                   memory_space=pltpu.VMEM)
    tidx4 = lambda b, c: pl.BlockSpec(
        (1, Bt, b, c), lambda bi, t: (t, bi, 0, 0), memory_space=pltpu.VMEM
    )
    tidxL = lambda b: pl.BlockSpec(
        (1, L, Bt, b), lambda bi, t: (t, 0, bi, 0), memory_space=pltpu.VMEM
    )

    kern = functools.partial(_fwd_res_kernel, cs=cs)
    out = pl.pallas_call(
        kern,
        grid=(nb, T),
        in_specs=[
            tidx3(IN),
            const3(L, KIN, 4 * Hc), const2(L, 4 * Hc),
            const2(Hc, P), const2(1, P), const2(Hc, O), const2(1, O),
            btile3(D, N), btile3(H, N), btile2(R * D),
            ltile3(Hc), ltile3(Hc),
        ],
        out_specs=(
            tidx3(O),
            btile3(D, N), btile3(H, N), btile2(R * D),
            ltile3(Hc), ltile3(Hc),
            tidx4(D, N), tidx4(H, N), tidx3(R * D),
            tidxL(Hc), tidxL(Hc),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, O), f32),
            jax.ShapeDtypeStruct((Bp, D, N), f32),
            jax.ShapeDtypeStruct((Bp, H, N), f32),
            jax.ShapeDtypeStruct((Bp, R * D), f32),
            jax.ShapeDtypeStruct((L, Bp, Hc), f32),
            jax.ShapeDtypeStruct((L, Bp, Hc), f32),
            jax.ShapeDtypeStruct((T, Bp, D, N), f32),
            jax.ShapeDtypeStruct((T, Bp, H, N), f32),
            jax.ShapeDtypeStruct((T, Bp, R * D), f32),
            jax.ShapeDtypeStruct((T, L, Bp, Hc), f32),
            jax.ShapeDtypeStruct((T, L, Bp, Hc), f32),
        ),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(
        _pad_rows(jnp.swapaxes(tokens.astype(f32), 0, 1), Bp, axis=1),
        lstm_w, lstm_b,
        params["heads_w"].astype(f32), params["heads_b"].astype(f32)[None, :],
        params["out_w"].astype(f32), params["out_b"].astype(f32)[None, :],
        _pad_rows(jnp.swapaxes(state["M"].astype(f32), 1, 2), Bp),
        _pad_rows(state["w"].astype(f32), Bp),
        _pad_rows(state["read"].astype(f32).reshape(B, R * D), Bp),
        _pad_rows(c0, Bp, axis=1), _pad_rows(h0, Bp, axis=1),
    )
    (logits, M, w, read, c, h, Mh, wh, readh, ch, hh) = out
    final_state = {
        "M": jnp.swapaxes(M[:B], 1, 2),
        "w": w[:B],
        "read": read[:B].reshape(B, R, D),
        "controller_state": [(c[l, :B], h[l, :B]) for l in range(L)],
    }
    residuals = (Mh, wh, readh, ch, hh)  # padded to Bp; bwd re-pads to match
    return jnp.swapaxes(logits[:, :B], 0, 1), final_state, residuals


def _bwd_call(params, cfg: NTMConfig, tokens, residuals, dlogits, dfinal,
              interpret):
    B, T, IN = tokens.shape
    Bt, Bp, nb = _tiles_of(B)
    cs = _static(cfg)
    (H, R, W, D, N, S, Hc, L, _sh, _wf, sizes, _sl) = cs
    P = sum(sizes.values())
    O = cfg.output_dim
    lstm_w, lstm_b, kins, KIN = _pack_weights(params, cfg, IN)
    lstm_wT = jnp.stack([
        jnp.swapaxes(lstm_w[l], 0, 1) for l in range(L)
    ])  # [L, 4Hc, KIN]
    heads_wT = jnp.swapaxes(params["heads_w"].astype(f32), 0, 1)
    out_wT = jnp.swapaxes(params["out_w"].astype(f32), 0, 1)
    Mh, wh, readh, ch, hh = residuals  # already padded to Bp by _fwd_call

    # padded rows carry ZERO cotangents, so although the residual streams
    # hold garbage-but-finite values for them, every padded-row gradient
    # contribution (param accumulators included) is exactly zero
    dMf = _pad_rows(jnp.swapaxes(dfinal["M"].astype(f32), 1, 2), Bp)
    dwf = _pad_rows(dfinal["w"].astype(f32), Bp)
    dreadf = _pad_rows(dfinal["read"].astype(f32).reshape(B, R * D), Bp)
    dcf = _pad_rows(
        jnp.stack([c for c, _ in dfinal["controller_state"]]).astype(f32),
        Bp, axis=1)
    dhf = _pad_rows(
        jnp.stack([h for _, h in dfinal["controller_state"]]).astype(f32),
        Bp, axis=1)

    rev3 = lambda b: pl.BlockSpec(
        (1, Bt, b), lambda bi, i: (T - 1 - i, bi, 0), memory_space=pltpu.VMEM
    )
    rev4 = lambda b, c: pl.BlockSpec(
        (1, Bt, b, c), lambda bi, i: (T - 1 - i, bi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    revL = lambda b: pl.BlockSpec(
        (1, L, Bt, b), lambda bi, i: (T - 1 - i, 0, bi, 0),
        memory_space=pltpu.VMEM,
    )
    const3 = lambda a, b, c: pl.BlockSpec((a, b, c), lambda bi, i: (0, 0, 0),
                                          memory_space=pltpu.VMEM)
    const2 = lambda a, b: pl.BlockSpec((a, b), lambda bi, i: (0, 0),
                                       memory_space=pltpu.VMEM)
    btile3 = lambda b, c: pl.BlockSpec((Bt, b, c), lambda bi, i: (bi, 0, 0),
                                       memory_space=pltpu.VMEM)
    btile2 = lambda b: pl.BlockSpec((Bt, b), lambda bi, i: (bi, 0),
                                    memory_space=pltpu.VMEM)
    ltile3 = lambda b: pl.BlockSpec((L, Bt, b), lambda bi, i: (0, bi, 0),
                                    memory_space=pltpu.VMEM)

    kern = functools.partial(_bwd_kernel, cs=cs)
    out = pl.pallas_call(
        kern,
        grid=(nb, T),
        in_specs=[
            rev3(IN),
            rev4(D, N), rev4(H, N), rev3(R * D),
            revL(Hc), revL(Hc),
            rev3(O),
            const3(L, KIN, 4 * Hc), const2(L, 4 * Hc),
            const2(Hc, P), const2(1, P), const2(Hc, O), const2(1, O),
            const3(L, 4 * Hc, KIN), const2(P, Hc), const2(O, Hc),
            btile3(D, N), btile3(H, N), btile2(R * D),
            ltile3(Hc), ltile3(Hc),
        ],
        out_specs=(
            btile3(D, N), btile3(H, N), btile2(R * D),
            ltile3(Hc), ltile3(Hc),
            const3(L, KIN, 4 * Hc), const2(L, 4 * Hc),
            const2(Hc, P), const2(1, P), const2(Hc, O), const2(1, O),
            rev3(IN),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, D, N), f32),
            jax.ShapeDtypeStruct((Bp, H, N), f32),
            jax.ShapeDtypeStruct((Bp, R * D), f32),
            jax.ShapeDtypeStruct((L, Bp, Hc), f32),
            jax.ShapeDtypeStruct((L, Bp, Hc), f32),
            jax.ShapeDtypeStruct((L, KIN, 4 * Hc), f32),
            jax.ShapeDtypeStruct((L, 4 * Hc), f32),
            jax.ShapeDtypeStruct((Hc, P), f32),
            jax.ShapeDtypeStruct((1, P), f32),
            jax.ShapeDtypeStruct((Hc, O), f32),
            jax.ShapeDtypeStruct((1, O), f32),
            jax.ShapeDtypeStruct((T, Bp, IN), f32),
        ),
        scratch_shapes=[pltpu.VMEM((Bt, P), f32)],  # dcontrols assembly
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(
        _pad_rows(jnp.swapaxes(tokens.astype(f32), 0, 1), Bp, axis=1),
        Mh, wh, readh, ch, hh,
        _pad_rows(jnp.swapaxes(dlogits.astype(f32), 0, 1), Bp, axis=1),
        lstm_w, lstm_b,
        params["heads_w"].astype(f32), params["heads_b"].astype(f32)[None, :],
        params["out_w"].astype(f32), params["out_b"].astype(f32)[None, :],
        lstm_wT, heads_wT, out_wT,
        dMf, dwf, dreadf, dcf, dhf,
    )
    (dM0, dw0, dread0, dc0, dh0, dlstm_w, dlstm_b, dheads_w, dheads_b,
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
        # init_* enter through the state argument (init_ntm_state runs
        # outside the kernel), so their direct cotangent here is zero
        "init_M": jnp.zeros_like(params["init_M"]),
        "init_w": jnp.zeros_like(params["init_w"]),
        "init_read": jnp.zeros_like(params["init_read"]),
    }
    dstate0 = {
        "M": jnp.swapaxes(dM0[:B], 1, 2),
        "w": dw0[:B],
        "read": dread0[:B].reshape(B, R, D),
        "controller_state": [(dc0[l, :B], dh0[l, :B]) for l in range(L)],
    }
    return dparams, jnp.swapaxes(dx[:, :B], 0, 1), dstate0


@functools.lru_cache(maxsize=None)
def _bptt_wrapped(cfg: NTMConfig, interpret: bool):
    def forward(params, tokens, state):
        # UNDIFFERENTIATED calls (eval/validation) take this primal: use
        # the residual-FREE whole-sequence kernel — the residual-streaming
        # forward writes five T-indexed streams (~426 MB for M alone at
        # B=32/T=1300) that XLA cannot DCE out of a pallas_call. Same math
        # at f32 (both kernels are parity-pinned against the jnp scan);
        # the fwd rule below still runs the residual kernel under jax.grad.
        from ntm_tracker_tpu.ops.pallas.scan_cell import ntm_scan_fused

        return ntm_scan_fused(params, cfg, tokens, state, interpret=interpret)

    fn = jax.custom_vjp(forward)

    def fwd(params, tokens, state):
        # no batch ceiling since the (B/tile, T) grid: scoped VMEM is
        # bounded by BATCH_TILE regardless of B (the r4 scoped-VMEM OOM
        # fix; see BATCH_TILE above)
        logits, final_state, res = _fwd_call(params, cfg, tokens, state,
                                             interpret)
        return (logits, final_state), (params, tokens, res)

    def bwd(saved, cot):
        params, tokens, res = saved
        dlogits, dfinal = cot
        return _bwd_call(params, cfg, tokens, res, dlogits, dfinal, interpret)

    fn.defvjp(fwd, bwd)
    return fn


def ntm_scan_fused_bptt(
    params: Dict[str, Any],
    cfg: NTMConfig,
    tokens: jax.Array,
    state: Dict[str, Any],
    interpret: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """T NTM steps with a FULLY fused Pallas forward+backward (f32).

    Differentiable wrt params, tokens and the initial state; init_M/w/read
    gradients flow through the state argument (build the state with
    init_ntm_state under the same jax.grad). Returns (logits [B,T,O],
    final state).

    Any batch size compiles: the fwd/bwd kernels grid over BATCH_TILE-row
    tiles, so scoped VMEM is bounded regardless of B (the r4 fix for the
    old B>32 scoped-VMEM compile ceiling). Undifferentiated calls dispatch
    the residual-free forward kernel."""
    if cfg.use_pallas:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, use_pallas=False)  # static key hygiene
    return _bptt_wrapped(cfg, interpret)(params, tokens, state)
