"""Batched in-graph (jnp) twins of the host geometry in data/geometry.py.

Used wherever the crop/decode math must run INSIDE a jitted program — the
closed-loop active-resize trainer (train/active_resize.py) and the
device-resident tracking step (tracking/tracker.make_device_track_step).
Each function is pinned to its numpy twin by tests/test_active_resize.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cropbox_of(bbox: jax.Array, cropbox_grid: int, bbox_grid: int) -> jax.Array:
    """[B,4] (y1,x1,y2,x2) bbox -> enlarged cropbox (calculate_cropbox,
    preprocess.py:81-103, ratio cropbox_grid/bbox_grid around the center)."""
    ratio = cropbox_grid / float(bbox_grid)
    y1, x1, y2, x2 = jnp.moveaxis(bbox, -1, 0)
    yc, xc = (y1 + y2) / 2.0, (x1 + x2) / 2.0
    hh, hw = ratio * (y2 - y1) / 2.0, ratio * (x2 - x1) / 2.0
    return jnp.stack([yc - hh, xc - hw, yc + hh, xc + hw], axis=-1)


def to_crop_space(bbox: jax.Array, cropbox: jax.Array) -> jax.Array:
    """Image-space [B,4] box -> cropbox-relative coords (the affine of
    calculate_transformation/apply_transformation, preprocess.py:121-149)."""
    cy1, cx1, cy2, cx2 = jnp.moveaxis(cropbox, -1, 0)
    h, w = cy2 - cy1, cx2 - cx1
    y1, x1, y2, x2 = jnp.moveaxis(bbox, -1, 0)
    return jnp.stack(
        [(y1 - cy1) / h, (x1 - cx1) / w, (y2 - cy1) / h, (x2 - cx1) / w],
        axis=-1,
    )


def to_image_space(bbox: jax.Array, cropbox: jax.Array) -> jax.Array:
    """Inverse of to_crop_space (test_tracker.py:257-272)."""
    cy1, cx1, cy2, cx2 = jnp.moveaxis(cropbox, -1, 0)
    h, w = cy2 - cy1, cx2 - cx1
    y1, x1, y2, x2 = jnp.moveaxis(bbox, -1, 0)
    return jnp.stack(
        [cy1 + y1 * h, cx1 + x1 * w, cy1 + y2 * h, cx1 + x2 * w], axis=-1
    )


def canonical_box(cropbox_grid: int, bbox_grid: int) -> jnp.ndarray:
    """The centered init box every offset is relative to
    (preprocess.py:283-291)."""
    half = bbox_grid / float(cropbox_grid) / 2.0
    return jnp.asarray(
        [0.5 - half, 0.5 - half, 0.5 + half, 0.5 + half], jnp.float32
    )


def center_offsets(bbox_crop: jax.Array, canon: jax.Array) -> jax.Array:
    """[B,4] crop-space box -> (dy,dx) center delta from the canonical box
    (calculate_offsets, preprocess.py:105-110)."""
    y = (bbox_crop[:, 0] + bbox_crop[:, 2]) / 2.0 - (canon[0] + canon[2]) / 2.0
    x = (bbox_crop[:, 1] + bbox_crop[:, 3]) / 2.0 - (canon[1] + canon[3]) / 2.0
    return jnp.stack([y, x], axis=-1)


def center_log_scale(bbox_crop: jax.Array, canon: jax.Array) -> jax.Array:
    """[B,4] crop-space box -> [B] isotropic log-scale vs the canonical box
    (jnp twin of geometry.calculate_scale — the scale-head target)."""
    area = (bbox_crop[:, 2] - bbox_crop[:, 0]) * (
        bbox_crop[:, 3] - bbox_crop[:, 1]
    )
    canon_area = (canon[2] - canon[0]) * (canon[3] - canon[1])
    return 0.5 * jnp.log(area / canon_area)


def scale_box(bbox: jax.Array, factor: jax.Array) -> jax.Array:
    """Scale [...,4] boxes about their own centers by per-box factors
    [...] (jnp twin of geometry.scale_bbox — the scale-head decode)."""
    y1, x1, y2, x2 = jnp.moveaxis(bbox, -1, 0)
    yc, xc = (y1 + y2) / 2.0, (x1 + x2) / 2.0
    hh, hw = factor * (y2 - y1) / 2.0, factor * (x2 - x1) / 2.0
    return jnp.stack([yc - hh, xc - hw, yc + hh, xc + hw], axis=-1)
