"""Train-step profiling sweep: attribute the cached-token BPTT's time.

The feature-cache training step (train-offsets --feature_cache) is the
memory-core 1300-step BPTT alone — the perf frontier after the VGG left
the hot path. This sweep measures the full jitted step (loss + grads +
clip + RMSProp) across the knobs that matter on TPU:

  * remat policy: full recompute vs dots_saveable (save each step's matmul
    outputs, recompute only elementwise addressing) vs none
  * compute dtype: f32 (reference parity) vs bf16 (MXU native)
  * scan unroll factor
  * the Pallas fused addressing forward (NTMConfig.use_pallas)
  * forward-only (loss, no grads) and an LSTM-only BPTT as bounds

Prints one JSON line per variant: {"variant", "step_ms", "frames_per_sec",
"train_mfu"}. train_mfu counts the CANONICAL 3x-forward matmul FLOPs
(fwd + 2x bwd, remat recompute NOT credited) against the chip's bf16 peak.

Usage: python -m ntm_tracker_tpu.tools.profile_train --batch 256
Optionally --trace DIR captures a jax.profiler trace of the baseline step.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def cell_step_flops(cfg) -> float:
    """Matmul FLOPs of ONE forward cell step at batch 1 (the >99% terms)."""
    from ntm_tracker_tpu.models.ntm_cell import head_param_sizes

    n = cfg.ntm
    ctrl_in = cfg.input_depth + n.read_head_size * n.mem_dim
    hidden = n.controller_hidden_size
    per_step = 0.0
    ins = [ctrl_in] + [hidden] * (n.controller_num_layers - 1)
    for d in ins:
        per_step += 2.0 * (d + hidden) * 4 * hidden  # LSTM gates
    P = sum(head_param_sizes(n).values())
    per_step += 2.0 * hidden * P                      # fused head unpack
    per_step += 2.0 * hidden * n.output_dim           # output head
    per_step += 2.0 * n.num_heads * n.mem_size * n.mem_dim * 4  # addressing
    return per_step


def train_step_flops(cfg) -> float:
    """Canonical training FLOPs of one optimizer step: 3x the forward
    matmul math (fwd + dL/dx + dL/dW) over every token of every sample."""
    return 3.0 * cell_step_flops(cfg) * cfg.total_steps * cfg.train.batch_size


def _mfu(cfg, step_ms: float, peak_tflops: float | None) -> float | None:
    if not peak_tflops or step_ms != step_ms:
        return None
    achieved = train_step_flops(cfg) / (step_ms / 1e3) / 1e12
    return round(achieved / peak_tflops, 4)


def measure_step(cfg, iters: int = 8, forward_only: bool = False,
                 trace_dir: str | None = None) -> float:
    """Compile + time the cached-token train step for a config. Returns ms."""
    import jax

    from ntm_tracker_tpu.models.vgg import init_vgg_params
    from ntm_tracker_tpu.train.experiments import (
        OffsetExperiment,
        synthetic_cached_batch,
    )

    exp = OffsetExperiment(
        cfg, init_vgg_params(jax.random.PRNGKey(0)), image_mode="cropped"
    )
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    batch = synthetic_cached_batch(cfg, np.random.RandomState(0))
    if forward_only:
        loss_fn = jax.jit(lambda p, b: exp.loss_fn(p, b)[0])
        loss = loss_fn(params, batch)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            loss = loss_fn(params, batch)
        float(loss)
        return (time.perf_counter() - t0) / iters * 1e3

    step = jax.jit(exp.make_train_step(), donate_argnums=(0, 1))
    p, o, m = step(params, opt_state, batch)
    float(m["loss"])
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            p, o, m = step(p, o, batch)
            float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, m = step(p, o, batch)
    float(m["loss"])  # value fetch = hard sync (tunneled-backend rule)
    return (time.perf_counter() - t0) / iters * 1e3


def measure_lstm_only(cfg, iters: int = 8) -> float:
    """Grad step of a PURE LSTM scan at the same shapes — the controller-
    only lower bound (everything above it is addressing/memory cost)."""
    import jax
    import jax.numpy as jnp

    from ntm_tracker_tpu.ops.lstm import (
        init_lstm_params,
        multi_lstm_step,
        zero_lstm_state,
    )

    n = cfg.ntm
    B, T = cfg.train.batch_size, cfg.total_steps
    ctrl_in = cfg.input_depth + n.read_head_size * n.mem_dim
    params = init_lstm_params(
        jax.random.PRNGKey(0), ctrl_in, n.controller_hidden_size,
        n.controller_num_layers,
    )
    xs = jnp.asarray(
        np.random.RandomState(0).rand(T, B, ctrl_in).astype(np.float32)
    )
    dt = cfg.compute_dtype

    def loss(p, xs):
        def body(carry, x):
            out, new = multi_lstm_step(p, x.astype(dt), carry)
            return new, out

        s0 = zero_lstm_state(B, n.controller_hidden_size, n.controller_num_layers)
        _, outs = jax.lax.scan(jax.checkpoint(body), s0, xs)
        return jnp.mean(outs.astype(jnp.float32) ** 2)

    # xs is an ARGUMENT, not a closure constant: closing over the [T,B,IN]
    # tokens bakes a ~700 MB literal into the HLO, which the tunneled
    # remote-compile service rejects (HTTP 413)
    g = jax.jit(jax.grad(loss))
    r = g(params, xs)
    jax.tree.map(lambda a: np.asarray(a), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g(params, xs)
    np.asarray(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def _mm_bf16():
    """Matmul whose BACKWARD also runs in bf16 (custom VJP). Plain
    `a.astype(bf16) @ w.astype(bf16)` only puts the FORWARD pass on the
    bf16 MXU path: autodiff's cotangent matmuls mix an f32 cotangent with
    the bf16 operand and XLA promotes them to f32 — which is why
    compute_dtype=bf16 measured ZERO grad-step speedup."""
    import jax
    import jax.numpy as jnp

    @jax.custom_vjp
    def mm(a, w):
        return jax.lax.dot(
            a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    def fwd(a, w):
        return mm(a, w), (a.astype(jnp.bfloat16), w.astype(jnp.bfloat16))

    def bwd(res, g):
        a16, w16 = res
        g16 = g.astype(jnp.bfloat16)
        da = jax.lax.dot(g16, w16.T, preferred_element_type=jnp.float32)
        dw = jax.lax.dot(a16.T, g16, preferred_element_type=jnp.float32)
        return da, dw

    mm.defvjp(fwd, bwd)
    return mm


def measure_ablation(cfg, skips: frozenset, iters: int = 8,
                     bf16_vjp: bool = False) -> float:
    """Grad-step time of the BPTT scan with selected cell components
    REPLACED by cheap pass-throughs — a surgical probe that attributes the
    backward's cost (the numbers are meaningless as a model; the deltas vs
    the 'none' ablation are the attribution). Components:

      'cos'     similarity = mean of M rows (skips l2_normalize+einsum)
      'shift'   w_conv = w_gated (skips the roll-stack conv)
      'sharpen' w = w_conv (skips pow/normalize)
      'write'   M = M_prev (skips erase/add outer products)
      'read'    read = prev read (skips the read einsum)
      'gate'    w_gated = w_content (skips the interpolation)
    """
    import jax
    import jax.numpy as jnp

    from ntm_tracker_tpu.models.ntm_cell import (
        head_param_sizes,
        init_ntm_params,
        init_ntm_state,
    )
    from ntm_tracker_tpu.ops.memory import (
        batched_circular_convolution,
        batched_smooth_cosine_similarity,
        sharpen,
    )

    n = cfg.ntm
    B, T = cfg.train.batch_size, cfg.total_steps
    R, W, H, D = n.read_head_size, n.write_head_size, n.num_heads, n.mem_dim
    params = init_ntm_params(jax.random.PRNGKey(0), n, cfg.input_depth)
    xs = jnp.asarray(
        np.random.RandomState(0).rand(T, B, cfg.input_depth).astype(np.float32)
    )
    sizes = head_param_sizes(n)

    if bf16_vjp:
        mm = _mm_bf16()
    else:
        mm = lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32)

    def lstm(p_list, x, st):
        out, new = x, []
        for lp, (c, h) in zip(p_list, st):
            gates = mm(jnp.concatenate([out, h], axis=1), lp["kernel"]) + lp["bias"]
            i, j, f, o = jnp.split(gates, 4, axis=1)
            nc = c * jax.nn.sigmoid(f) + jax.nn.sigmoid(i) * jnp.tanh(j)
            nh = jnp.tanh(nc) * jax.nn.sigmoid(o)
            out = nh
            new.append((nc, nh))
        return out, new

    def cell(params, x, state):
        M_prev, w_prev, read_prev = state["M"], state["w"], state["read"]
        ctrl_in = jnp.concatenate([x, read_prev.reshape(B, R * D)], axis=1)
        ctrl_out, ctrl_state = lstm(
            params["controller"], ctrl_in, state["controller_state"]
        )
        mc = mm(ctrl_out, params["heads_w"]) + params["heads_b"]
        off, parts = 0, {}
        for name in ("k", "beta", "g", "sw", "gamma", "erase", "add"):
            parts[name] = mc[:, off : off + sizes[name]]
            off += sizes[name]
        logit = mm(ctrl_out, params["out_w"]) + params["out_b"]

        k = jnp.tanh(parts["k"].reshape(B, H, D))
        if "cos" in skips:
            similarity = jnp.mean(M_prev, axis=2)[:, None, :] + jnp.mean(
                k, axis=2
            )[..., None]
        else:
            similarity = batched_smooth_cosine_similarity(M_prev, k)
        beta = jax.nn.softplus(parts["beta"])[..., None]
        w_content = jax.nn.softmax(similarity * beta, axis=-1)
        if "gate" in skips:
            w_gated = w_content
        else:
            g = jax.nn.sigmoid(parts["g"])[..., None]
            w_gated = w_content * g + w_prev * (1.0 - g)
        if "shift" in skips:
            w_conv = w_gated
        else:
            sw = jax.nn.softmax(parts["sw"].reshape(B, H, n.shift_space), axis=-1)
            w_conv = batched_circular_convolution(w_gated, sw)
        if "sharpen" in skips:
            w = w_conv
        else:
            gamma = (jax.nn.softplus(parts["gamma"]) + 1.0)[..., None]
            w = sharpen(w_conv, gamma)
        w_read, w_write = w[:, :R, :], w[:, R:, :]
        if "write" in skips:
            M = M_prev
        else:
            erase = jax.nn.sigmoid(parts["erase"].reshape(B, W, D))
            add = jnp.tanh(parts["add"].reshape(B, W, D))
            w_write_e = w_write[..., :, None]
            M_erase = jnp.prod(1.0 - w_write_e * erase[:, :, None, :], axis=1)
            M_write = jnp.sum(w_write_e * add[:, :, None, :], axis=1)
            M = M_prev * M_erase + M_write
        if "read" in skips:
            read = read_prev
        else:
            read = jnp.einsum(
                "brn,bnd->brd", w_read, M_prev,
                preferred_element_type=jnp.float32,
            )
        return logit, {"M": M, "w": w, "read": read,
                       "controller_state": ctrl_state}

    def loss(p, xs):
        def body(carry, x):
            logit, new_state = cell(p, x, carry)
            return new_state, logit

        s0 = init_ntm_state(p, n, B)
        _, logits = jax.lax.scan(jax.checkpoint(body), s0, xs)
        return jnp.mean(logits ** 2)

    # xs as an argument (closure constant -> ~700 MB HLO literal -> the
    # tunneled remote compiler rejects it with HTTP 413)
    g = jax.jit(jax.grad(loss))
    r = g(params, xs)
    np.asarray(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g(params, xs)
    np.asarray(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def measure_fused_fwd(cfg, iters: int = 8, dtype=None) -> float:
    """Whole-sequence fused Pallas forward (ops/pallas/scan_cell.py) at the
    training shape — the go/no-go probe for a residual-saving Pallas BPTT:
    if the fused forward cannot beat the XLA scan forward at B=256, a
    fused backward built on the same structure will not either."""
    import jax
    import jax.numpy as jnp

    from ntm_tracker_tpu.models.ntm_cell import init_ntm_params, init_ntm_state
    from ntm_tracker_tpu.ops.pallas.scan_cell import ntm_scan_fused

    n = cfg.ntm
    B, T = cfg.train.batch_size, cfg.total_steps
    params = init_ntm_params(jax.random.PRNGKey(0), n, cfg.input_depth)
    state = init_ntm_state(params, n, B)
    xs = jnp.asarray(
        np.random.RandomState(0).rand(B, T, cfg.input_depth).astype(np.float32)
    )

    @jax.jit
    def run(params, xs, state):
        logits, final = ntm_scan_fused(
            params, n, xs, state, compute_dtype=dtype or jnp.float32
        )
        return jnp.mean(logits ** 2), final

    loss, final = run(params, xs, state)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, final = run(params, xs, state)
    float(loss)
    return (time.perf_counter() - t0) / iters * 1e3


ABLATIONS = {
    "abl_none": frozenset(),
    "abl_no_cos": frozenset({"cos"}),
    "abl_no_shift": frozenset({"shift"}),
    "abl_no_sharpen": frozenset({"sharpen"}),
    "abl_no_write": frozenset({"write"}),
    "abl_no_read": frozenset({"read"}),
    "abl_no_gate": frozenset({"gate"}),
    "abl_ctrl_only": frozenset({"cos", "shift", "sharpen", "write", "read",
                                "gate"}),
    "abl_no_memory_side": frozenset({"cos", "write", "read"}),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seq_len", type=int, default=20)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--variants", default="all",
                    help="comma list or 'all'")
    ap.add_argument("--trace", default="",
                    help="capture a jax.profiler trace of the baseline")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from ntm_tracker_tpu.benchmarks import _chip_peak_tflops
    from ntm_tracker_tpu.config import NTMConfig, TrackerConfig, TrainConfig

    peak = _chip_peak_tflops(jax.devices()[0])

    def make_cfg(dtype=jnp.float32, remat="full", unroll=1, pallas=False,
                 layout="nd", bptt=False):
        return TrackerConfig(
            compute_dtype=dtype,
            ntm=NTMConfig(use_pallas=pallas),
            train=TrainConfig(
                batch_size=args.batch, sequence_length=args.seq_len,
                remat_policy=remat, scan_unroll=unroll, scan_layout=layout,
                fused_bptt=bptt,
            ),
        )

    variants = {
        "fused_bptt_f32": dict(bptt=True),
        "dn_layout_f32": dict(layout="dn"),
        "dn_layout_bf16": dict(layout="dn", dtype=jnp.bfloat16),
        "dn_layout_f32_dots": dict(layout="dn", remat="dots"),
        "baseline_f32_full": dict(),
        "f32_dots": dict(remat="dots"),
        "f32_none": dict(remat="none"),
        "f32_unroll13": dict(unroll=13),
        "f32_dots_unroll13": dict(remat="dots", unroll=13),
        "bf16_full": dict(dtype=jnp.bfloat16),
        "bf16_dots": dict(dtype=jnp.bfloat16, remat="dots"),
        "bf16_dots_unroll13": dict(dtype=jnp.bfloat16, remat="dots", unroll=13),
        "f32_pallas_fwd": dict(pallas=True),
        "bf16_pallas_fwd": dict(dtype=jnp.bfloat16, pallas=True),
    }
    selected = (
        list(variants) if args.variants == "all" else args.variants.split(",")
    )

    for name in selected:
        if name == "forward_only_f32":
            cfg = make_cfg()
            ms = measure_step(cfg, args.iters, forward_only=True)
        elif name == "forward_only_bf16":
            cfg = make_cfg(dtype=jnp.bfloat16)
            ms = measure_step(cfg, args.iters, forward_only=True)
        elif name == "abl_bf16_vjp":
            cfg = make_cfg()
            try:
                ms = measure_ablation(cfg, frozenset(), args.iters,
                                      bf16_vjp=True)
            except Exception as e:
                print(json.dumps({"variant": name, "error": str(e)[:200]}))
                continue
            print(json.dumps({"variant": name, "step_ms": round(ms, 2)}))
            sys.stdout.flush()
            continue
        elif name == "lstm_only_f32":
            cfg = make_cfg()
            ms = measure_lstm_only(cfg, args.iters)
        elif name in ("fused_fwd_f32", "fused_fwd_bf16"):
            import jax.numpy as jnp

            cfg = make_cfg()
            try:
                ms = measure_fused_fwd(
                    cfg, args.iters,
                    dtype=jnp.bfloat16 if name.endswith("bf16") else jnp.float32,
                )
            except Exception as e:
                print(json.dumps({"variant": name, "error": str(e)[:200]}))
                continue
            print(json.dumps({"variant": name, "step_ms": round(ms, 2)}))
            sys.stdout.flush()
            continue
        elif name in ABLATIONS:
            cfg = make_cfg()
            try:
                ms = measure_ablation(cfg, ABLATIONS[name], args.iters)
            except Exception as e:
                print(json.dumps({"variant": name, "error": str(e)[:200]}))
                continue
            print(json.dumps({"variant": name, "step_ms": round(ms, 2)}))
            sys.stdout.flush()
            continue
        elif name in variants:
            cfg = make_cfg(**variants[name])
            trace = args.trace if name == "baseline_f32_full" else None
            try:
                ms = measure_step(cfg, args.iters, trace_dir=trace or None)
            except Exception as e:
                print(json.dumps({"variant": name, "error": str(e)[:200]}))
                continue
        else:
            print(json.dumps({"variant": name, "error": "unknown variant"}))
            continue
        out = {
            "variant": name,
            "step_ms": round(ms, 2),
            "frames_per_sec": round(args.batch * args.seq_len / (ms / 1e3), 1),
            "train_mfu": _mfu(cfg, ms, peak),
        }
        print(json.dumps(out))
        sys.stdout.flush()
    # the two bounds, always useful
    for name in ("forward_only_f32", "lstm_only_f32"):
        if args.variants == "all":
            cfg = make_cfg()
            ms = (
                measure_step(cfg, args.iters, forward_only=True)
                if name == "forward_only_f32"
                else measure_lstm_only(cfg, args.iters)
            )
            print(json.dumps({"variant": name, "step_ms": round(ms, 2)}))
            sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
