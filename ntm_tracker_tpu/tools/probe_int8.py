"""Root-cause probe for the int8 serving regression (VERDICT r3 weak #2).

BENCH_r03 measured the opt-in int8 VGG token path at 0.749x the bf16/f32
headline — a 25% REGRESSION against the "~2x int8 MXU peak" premise in
models/vgg_int8.py. This probe answers, by data, WHY:

  1. HLO: does XLA actually keep the s8xs8->s32 convolutions in int8, or
     does it upcast them (conv dtypes printed from the compiled module)?
  2. Quantization overhead: dynamic per-sample activation scales vs a
     static (calibrated) scale vs no quantization at all — isolates the
     quantize/dequant + fusion-break cost from the conv cost.
  3. MXU floor: a single large 3x3 conv timed in s8, bf16 and f32 — if the
     lone int8 conv is not ~2x bf16, the chip/XLA combination has no int8
     conv fast path and the premise itself is wrong.

Usage: python -m ntm_tracker_tpu.tools.probe_int8 [--batch 256]
(TPU; all output to stdout, takes ~2-4 min of remote compiles.)
"""

from __future__ import annotations

import argparse
import re
import time

import numpy as np


def _time_fn(fn, *args, iters: int = 20, passes: int = 3) -> float:
    """Best-of-passes mean ms per call, value-fetch synced (CLAUDE.md: no
    block_until_ready on the tunneled backend)."""
    out = fn(*args)
    np.asarray(jax_leaf(out))  # compile + sync
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax_leaf(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def jax_leaf(x):
    import jax

    return jax.tree_util.tree_leaves(x)[0]


def conv_lines(compiled_text: str) -> list:
    """The dtype signatures of every convolution op in a compiled module."""
    out = []
    for line in compiled_text.splitlines():
        if re.search(r"=\s+\S+\s+convolution\(", line):
            out.append(line.strip()[:160])
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ntm_tracker_tpu.models.vgg import init_vgg_params, vgg16_conv43_tokens
    from ntm_tracker_tpu.models.vgg_int8 import (
        _quantize_weights,
        vgg16_conv43_tokens_int8,
    )

    B = args.batch
    params = init_vgg_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    nb = min(B, 32)
    block = rng.rand(nb, 224, 224, 3).astype(np.float32) * 150 - 75
    x = jnp.asarray(np.tile(block, (-(-B // nb), 1, 1, 1))[:B])

    # -- 1. HLO inspection ---------------------------------------------------
    # (at B=32 — the conv lowering decision is batch-independent and the
    # compiled-module text at B=256 is huge over the tunnel)
    f_int8 = jax.jit(lambda p, im: vgg16_conv43_tokens_int8(p, im))
    print("lowering int8 path for HLO inspection...", flush=True)
    text = f_int8.lower(params, x[:32]).compile().as_text()
    convs = conv_lines(text)
    print(f"== compiled int8 path at B=32: {len(convs)} convolution ops ==")
    for c in convs:
        print("  ", c)
    n_s8 = sum(1 for c in convs if "s8[" in c)
    print(f"s8-operand convs: {n_s8}/{len(convs)}")
    # also scan fusions for conversion ops around the convs
    n_convert = text.count(" convert(")
    print(f"convert ops in module: {n_convert}")

    # -- 2. end-to-end timings ----------------------------------------------
    f_bf16 = jax.jit(
        lambda p, im: vgg16_conv43_tokens(p, im, compute_dtype=jnp.bfloat16))
    ms_bf16 = _time_fn(f_bf16, params, x)
    print(f"tokens bf16 (headline serve): {ms_bf16:.2f} ms  "
          f"({B / ms_bf16 * 1e3:.0f} f/s)", flush=True)
    f_f32 = jax.jit(lambda p, im: vgg16_conv43_tokens(p, im))
    ms_f32 = _time_fn(f_f32, params, x)
    ms_int8 = _time_fn(f_int8, params, x)
    print(f"tokens f32 (exact path):      {ms_f32:.2f} ms  "
          f"({B / ms_f32 * 1e3:.0f} f/s)")
    print(f"tokens int8 dynamic path:     {ms_int8:.2f} ms  "
          f"({B / ms_int8 * 1e3:.0f} f/s)  vs bf16 {ms_bf16 / ms_int8:.3f}x"
          f"  vs f32 {ms_f32 / ms_int8:.3f}x", flush=True)

    # static-scale variant: weights pre-quantized OUTSIDE jit, one fixed
    # activation scale per layer (calibration stand-in) — no per-sample
    # amax reduce, no per-sample rescale
    wq = {name: _quantize_weights(p["weights"]) for name, p in params.items()}

    from ntm_tracker_tpu.models.vgg import VGG16_PREFIX, _max_pool_2x2

    def tokens_static(params, images, act_scale=1.0):
        x = images[:, 6:210, 6:210, :].astype(jnp.float32)
        for name, _, has_pool in VGG16_PREFIX:
            w_q, sw = wq[name]
            b = params[name]["biases"]
            x_q = jnp.clip(jnp.round(x / act_scale), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                x_q, w_q, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            x = jax.nn.relu(y.astype(jnp.float32) * (act_scale * sw) + b)
            if name == "conv4/conv4_3":
                break
            if has_pool:
                x = _max_pool_2x2(x)
        x = x[:, ::2, ::2, :]
        Bq, h, w, C = x.shape
        return x.reshape(Bq, h * w, C)

    f_static = jax.jit(lambda p, im: tokens_static(p, im))
    ms_static = _time_fn(f_static, params, x)
    print(f"tokens int8 static-scale:     {ms_static:.2f} ms  "
          f"({B / ms_static * 1e3:.0f} f/s)  vs bf16 "
          f"{ms_bf16 / ms_static:.3f}x", flush=True)

    # -- 3. lone-conv MXU floor ----------------------------------------------
    print("== lone 3x3 conv floor (96x96x128 -> 128, VALID) ==")
    xi = jnp.asarray(rng.rand(B, 96, 96, 128).astype(np.float32))
    wi = jnp.asarray(rng.rand(3, 3, 128, 128).astype(np.float32) - 0.5)

    def conv(xc, wc, pet):
        return jax.lax.conv_general_dilated(
            xc, wc, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet,
        )

    x8 = jnp.clip(jnp.round(xi * 64), -127, 127).astype(jnp.int8)
    w8 = jnp.clip(jnp.round(wi * 127), -127, 127).astype(jnp.int8)
    xb, wb = xi.astype(jnp.bfloat16), wi.astype(jnp.bfloat16)
    for tag, fn, fargs in (
        ("s8xs8->s32 ", jax.jit(lambda a, b: conv(a, b, jnp.int32)), (x8, w8)),
        ("bf16->f32  ", jax.jit(lambda a, b: conv(a, b, jnp.float32)), (xb, wb)),
        ("f32 default", jax.jit(lambda a, b: conv(a, b, jnp.float32)), (xi, wi)),
    ):
        ms = _time_fn(fn, *fargs)
        flops = 2.0 * B * 94 * 94 * 9 * 128 * 128
        print(f"  {tag}: {ms:7.2f} ms   {flops / ms / 1e9:8.1f} GFLOP/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
