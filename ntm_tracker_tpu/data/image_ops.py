"""Device-side (jitted) image pipeline ops with TF-1.x sampling semantics.

The reference does its cropping IN-GRAPH with tf.image.crop_and_resize and
its resizing with tf.image.resize_images (direct_offset_output.py:195-201);
we reproduce both samplers exactly so the 1e-4 parity target is reachable,
but run them inside the jitted train/infer step on device (SURVEY.md §5.8):
the host only decodes JPEGs.

Sampling contracts:
  * tf.image.crop_and_resize (bilinear): for output size S and normalized
    box [y1,x1,y2,x2], sample points are
        in_y = y1*(H-1) + i * (y2-y1)*(H-1)/(S-1)
    (corner-aligned within the box), with extrapolation_value 0 outside.
  * tf.image.resize_images bilinear, align_corners=False (TF1 legacy):
        in_y = i * (H_in / H_out)
    (NOT half-pixel centered), clamped at the bottom/right edge.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.models.vgg import VGG_MEAN


def tf1_resize_bilinear(image: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """TF-1.x resize_images(..., BILINEAR, align_corners=False) semantics.

    image: [H, W, C] (or [B, H, W, C]); source index = i * (in/out), the
    legacy non-centered grid.
    """
    if image.ndim == 4:
        return jax.vmap(lambda im: tf1_resize_bilinear(im, out_hw))(image)
    H, W, C = image.shape
    out_h, out_w = out_hw
    ys = jnp.arange(out_h, dtype=jnp.float32) * (H / out_h)
    xs = jnp.arange(out_w, dtype=jnp.float32) * (W / out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    fy = (ys - jnp.floor(ys))[:, None, None]
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    fx = (xs - jnp.floor(xs))[None, :, None]

    img = image.astype(jnp.float32)
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def crop_and_resize(
    images: jax.Array,
    boxes: jax.Array,
    crop_size: Tuple[int, int],
    extrapolation_value: float = 0.0,
) -> jax.Array:
    """tf.image.crop_and_resize with bilinear sampling, one box per image.

    Args:
      images: [B, H, W, C] float
      boxes:  [B, 4] normalized [y1, x1, y2, x2] (may exceed [0,1])
      crop_size: (out_h, out_w)
    Returns: [B, out_h, out_w, C]

    Out-of-image samples get `extrapolation_value` (TF default 0) — the
    reference relies on this when cropboxes spill past the frame.
    """
    B, H, W, C = images.shape
    out_h, out_w = crop_size

    def one(img, box):
        y1, x1, y2, x2 = box[0], box[1], box[2], box[3]
        if out_h > 1:
            in_y = y1 * (H - 1) + jnp.arange(out_h, dtype=jnp.float32) * (
                (y2 - y1) * (H - 1) / (out_h - 1)
            )
        else:
            in_y = 0.5 * (y1 + y2) * (H - 1) * jnp.ones((1,), jnp.float32)
        if out_w > 1:
            in_x = x1 * (W - 1) + jnp.arange(out_w, dtype=jnp.float32) * (
                (x2 - x1) * (W - 1) / (out_w - 1)
            )
        else:
            in_x = 0.5 * (x1 + x2) * (W - 1) * jnp.ones((1,), jnp.float32)

        valid_y = (in_y >= 0) & (in_y <= H - 1)
        valid_x = (in_x >= 0) & (in_x <= W - 1)

        y0 = jnp.clip(jnp.floor(in_y).astype(jnp.int32), 0, H - 1)
        yh = jnp.clip(y0 + 1, 0, H - 1)
        fy = (in_y - jnp.floor(in_y))[:, None, None]
        x0 = jnp.clip(jnp.floor(in_x).astype(jnp.int32), 0, W - 1)
        xh = jnp.clip(x0 + 1, 0, W - 1)
        fx = (in_x - jnp.floor(in_x))[None, :, None]

        img = img.astype(jnp.float32)
        top = img[y0][:, x0] * (1 - fx) + img[y0][:, xh] * fx
        bot = img[yh][:, x0] * (1 - fx) + img[yh][:, xh] * fx
        out = top * (1 - fy) + bot * fy
        mask = (valid_y[:, None] & valid_x[None, :])[..., None]
        return jnp.where(mask, out, extrapolation_value)

    return jax.vmap(one)(images, boxes)


def crop_and_resize_mm(
    images: jax.Array,
    boxes: jax.Array,
    crop_size: Tuple[int, int],
    extrapolation_value: float = 0.0,
    precision=None,
) -> jax.Array:
    """`crop_and_resize` restructured as two batched matmuls (TPU fast
    path for LARGE source frames).

    For axis-aligned boxes the bilinear crop is separable:
        out = Wy @ img @ Wx^T
    with per-sample interpolation matrices Wy [out_h, H], Wx [out_w, W]
    holding each output row/column's two bilinear weights
    (max(0, 1 - |in_y - y|) reproduces the gather path's (1-fy, fy) pair
    bit-for-bit in exact arithmetic). Out-of-image rows/columns are zeroed
    in W and the output gets `extrapolation_value` through the same
    validity mask as the gather path.

    Why: the gather formulation reads the full [B, H, W, C] frame through
    HBM with 4 dependent gathers per output pixel — measured 5x slower
    than the frame's VGG pass in the device-resident tracking loop at
    [256, 360, 640, 3] (BENCH r3's device_loop gap). The matmul form is
    ~0.5 GFLOP/frame of MXU work (~3% of the frame's VGG FLOPs).

    `precision` is the einsum precision (None = backend default — bf16 on
    TPU, which matches serving numerics where the crop feeds bf16 convs
    anyway; use jax.lax.Precision.HIGHEST for near-f32). Numerics differ
    from `crop_and_resize` only by matmul rounding/accumulation order, so
    parity paths (TF-golden tests, preprocessing) keep the gather form.
    """
    B, H, W, C = images.shape
    out_h, out_w = crop_size

    def interp(lo, hi, out_n, size):
        # sample coordinates: EXACTLY the gather path's formula
        if out_n > 1:
            coords = lo[:, None] * (size - 1) + jnp.arange(
                out_n, dtype=jnp.float32
            )[None, :] * ((hi - lo) * (size - 1) / (out_n - 1))[:, None]
        else:
            coords = 0.5 * (lo + hi)[:, None] * (size - 1) * jnp.ones(
                (1, 1), jnp.float32
            )
        grid = jnp.arange(size, dtype=jnp.float32)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - grid))
        valid = (coords >= 0) & (coords <= size - 1)
        return w * valid[..., None], valid

    y1, x1, y2, x2 = (boxes[:, i] for i in range(4))
    Wy, vy = interp(y1, y2, out_h, H)   # [B, out_h, H]
    Wx, vx = interp(x1, x2, out_w, W)   # [B, out_w, W]
    img = images.astype(jnp.float32)
    tmp = jnp.einsum("biy,byxc->bixc", Wy, img, precision=precision)
    out = jnp.einsum("bjx,bixc->bijc", Wx, tmp, precision=precision)
    mask = (vy[:, :, None] & vx[:, None, :])[..., None]
    if extrapolation_value == 0.0:
        return out * mask
    return jnp.where(mask, out, extrapolation_value)


def preprocess_frame(
    image: jax.Array,
    cropbox: jax.Array,
    resize_hw: Tuple[int, int] = (720, 1280),
    crop_size: int = 224,
    do_resize: bool = True,
) -> jax.Array:
    """The reference's in-graph frame pipeline, jitted on device:
    resize to 720x1280 -> subtract VGG mean -> crop_and_resize to 224
    (direct_offset_output.py:194-201).

    image: [H, W, 3] decoded RGB (uint8 or float); cropbox: [4] normalized.
    Returns [224, 224, 3] float32 mean-subtracted crop.
    """
    img = image.astype(jnp.float32)
    if do_resize:
        img = tf1_resize_bilinear(img, resize_hw)
    img = img - jnp.asarray(VGG_MEAN)
    out = crop_and_resize(img[None], cropbox[None], (crop_size, crop_size))
    return out[0]
