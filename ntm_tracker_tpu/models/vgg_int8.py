"""Opt-in int8 quantized VGG token path — MEASURED NEGATIVE; numerics
experiment only, NOT a serving-speed lever.

MEASURED VERDICT (v5e via XLA, round 4, tools/probe_int8.py): the chip's
"~2x int8 MXU peak" is NOT reachable from XLA-lowered s8 convolutions on
this toolchain:

  * the compiled token path keeps s8xs8->s32 convolutions (10/10 convs
    emit s32 with fused quantized operands — the lowering is honest), but
    runs 93.6 ms at B=256 vs ~32 ms for the bf16 headline path (~3x
    SLOWER) and 81 ms for exact f32 (0.87x);
  * a STATIC-scale variant (pre-quantized weights, fixed activation
    scale — no per-sample amax/rescale) is slower still (152 ms), so the
    dynamic-quantization overhead is NOT the cause: the s8 conv itself
    has no fast path and XLA emulates it;
  * a LONE s8xs8->s32 96x96x128 conv never finished COMPILING inside
    10+ minutes (probe rc=124), and an s8 dot_general (the im2col escape
    hatch, tools/probe_int8_dot.py) compiled only after minutes and ran
    0.58x bf16 (19.4 vs 33.5 TFLOP/s) — no int8 MXU path is reachable
    from XLA on this toolchain, for convs or dots.

BENCH_r03's int8_speedup 0.749 is thereby explained (and was flattering:
it amortized the cell steps). The per-round bench sweep is retired; this
module stays as the measured-negative record and for quantization-numerics
experiments (per-token cosine ~0.99 vs the exact path, tested).

This module mirrors the
exact receptive-field-sliced fast path of `vgg.vgg16_conv43_tokens` with

  * per-output-channel symmetric int8 weights (scale = max|W[..,o]| / 127),
  * per-SAMPLE dynamic symmetric int8 activations (scale = max|x| / 127
    over each batch element, computed on device each call — no offline
    calibration pass, and no cross-batch coupling), and
  * int32 accumulation, dequantized to float32 before bias + ReLU + pool.

Quantization happens inside the jitted function: under jit the weights are
either constants (XLA folds the rounding at compile time) or step arguments
(the per-step rounding cost is ~7M elements — noise next to the convs).

This changes numerics, so it is OPT-IN (`TrackerConfig.vgg_int8`) and only
for experimental use; training and all parity paths stay on the exact f32
pipeline. The measured accuracy/speed verdicts live in PARITY.md and the
verdict block above.

Reference note: the reference has no quantized path (its VGG is an imported
frozen f32 graph, direct_offset_output.py:417-422); this is a beyond-
reference TPU optimization.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

# pooling is shared with the f32 fast path: the int8 twin must mirror its
# geometry exactly, so a future pooling change follows automatically
from ntm_tracker_tpu.models.vgg import VGG16_PREFIX, _max_pool_2x2


def _quantize_weights(w: jax.Array):
    """Per-output-channel symmetric int8: returns (w_q int8, scale f32[O])."""
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))          # [O]
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def _quantize_activations(x: jax.Array):
    """Per-SAMPLE dynamic symmetric int8: returns (x_q int8, scale f32[B]).

    Per-sample (not per-tensor) so a sample's tokens never depend on its
    batchmates — batched fleet serving / validate replay produce the same
    values as the B=1 streaming tracker."""
    amax = jnp.max(jnp.abs(x), axis=(1, 2, 3))                # [B]
    scale = jnp.maximum(amax, 1e-12) / 127.0
    x_q = jnp.clip(
        jnp.round(x / scale[:, None, None, None]), -127, 127
    ).astype(jnp.int8)
    return x_q, scale


def _conv_relu_int8(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """VALID 3x3 conv with both operands quantized to int8 on the fly,
    int32 accumulate, dequantize -> f32 bias + ReLU."""
    x_q, sx = _quantize_activations(x)
    w_q, sw = _quantize_weights(w)
    y = jax.lax.conv_general_dilated(
        x_q, w_q,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx[:, None, None, None] * sw)
    return jax.nn.relu(y + b)


def vgg16_conv43_tokens_int8(
    params: Dict[str, Dict[str, jax.Array]],
    images: jax.Array,
    freeze: bool = True,
) -> jax.Array:
    """Int8 twin of `vgg.vgg16_conv43_tokens`: same 204x204 interior slice,
    same VALID conv geometry and canonical 8x8 stride-2 token grid, but
    every conv runs s8xs8->s32. Takes the ordinary float32 VGG params.

    NOT bit-identical to the f32 path — expect per-token cosine similarity
    ~0.99 (tested); use only where that tolerance is acceptable (serving
    throughput mode)."""
    if images.shape[1] != 224 or images.shape[2] != 224:
        raise ValueError(
            f"int8 conv4_3 token path expects 224x224 crops, got {images.shape}"
        )
    x = images[:, 6:210, 6:210, :].astype(jnp.float32)
    for name, _, has_pool in VGG16_PREFIX:
        p = params[name]
        x = _conv_relu_int8(x, p["weights"], p["biases"])
        if name == "conv4/conv4_3":
            break
        if has_pool:
            x = _max_pool_2x2(x)
    assert x.shape[1] == x.shape[2] == 15, x.shape
    x = x[:, ::2, ::2, :]
    if freeze:
        x = jax.lax.stop_gradient(x)
    B, h, w, C = x.shape
    return x.reshape(B, h * w, C)
