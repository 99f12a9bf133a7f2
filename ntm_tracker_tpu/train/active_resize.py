"""Active-resize (closed-loop recrop) training — the COMPLETED version of
the reference's unfinished `ntm_active_resize` (main.py:1294-1422).

The reference's idea: instead of cropping every frame around the FIXED
first-frame cropbox (the offsets pipeline), recrop each frame around the
box the model itself predicted on the previous frame — i.e. train in the
same closed loop the online tracker runs at inference. The reference
function builds the input pipeline, the crop-grid constants, the cell and
the per-step `resize_imgs` recrop (main.py:1294-1321,1376-1398) but stops
before ever calling the cell; the tail is dead duplicated pipeline code.
This module finishes the design TPU-first:

  lax.scan over frames, carry = (cell state, current normalized bbox):
    cropbox   = calculate_cropbox(bbox)           (8/6 enlarge, in-graph)
    crop      = crop_and_resize(frame_t, cropbox) (differentiable device op)
    tokens    = frozen VGG conv4_3 gather (+ optional 1x1 compressor,
                main.py:1391-1398)
    stream    = [64 tokens, delimiter] (+ frame-0 gt indicator)
    offsets   = tanh(last logit) of the 65-step inner scan
    loss_t    = 0.5*sum((offsets - gt offsets w.r.t. CURRENT crop)^2)
    next bbox = canonical box shifted by the PREDICTED offsets, decoded
                back to image coordinates (the tracker's geometry,
                test_tracker.py:252-329, here as jnp ops inside the scan)

Design choices (the reference left no contract to match):
  * the next-frame bbox is stop_gradient'ed: BPTT flows through the NTM
    memory across frames, but not through the crop geometry (20 chained
    crop_and_resize gradients are ill-conditioned and the reference's
    inference-time recrop is likewise non-differentiated);
  * supervision is per-frame against the gt box expressed in the
    CURRENT (predicted) crop's coordinates, so the model learns to correct
    its own drift — the property the fixed-crop pipeline cannot teach.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.config import TrackerConfig
from ntm_tracker_tpu.data.image_ops import crop_and_resize
from ntm_tracker_tpu.models.core import MemoryCore, make_core
from ntm_tracker_tpu.train.serialize import serialize_streaming_batch


# in-graph geometry lives in data/geometry_jnp.py (shared with the
# device-resident tracking step); re-exported here for convenience
from ntm_tracker_tpu.data.geometry_jnp import (  # noqa: F401
    canonical_box,
    center_offsets as _center_offsets,
    cropbox_of,
    to_crop_space,
    to_image_space,
)


# -- the experiment ----------------------------------------------------------

@dataclasses.dataclass
class ActiveResizeExperiment:
    """Closed-loop recrop training over whole frames + per-frame gt boxes."""

    cfg: TrackerConfig
    vgg_params: Any
    compress_dim: int = 0
    core: MemoryCore = None  # type: ignore[assignment]

    def __post_init__(self):
        from ntm_tracker_tpu.config import validate_head

        validate_head(self.cfg)
        if self.core is None:
            self.core = make_core(self.cfg)

    @property
    def input_size(self) -> int:
        return (self.compress_dim or self.cfg.feature_depth) + 2

    def init(self, rng: jax.Array):
        from ntm_tracker_tpu.train.optim import reference_optimizer
        from ntm_tracker_tpu.train.zoo import init_compressor

        k1, k2 = jax.random.split(rng)
        params = {"core": self.core.init_params(k1, self.input_size)}
        if self.compress_dim:
            params["compressor"] = init_compressor(
                k2, self.cfg.feature_depth, self.compress_dim
            )
        t = self.cfg.train
        opt = reference_optimizer(
            t.learning_rate, t.decay, t.momentum, 1e-10, t.max_gradient_norm
        )
        return params, opt.init(params)

    def _frame_tokens(self, params, crops: jax.Array) -> jax.Array:
        from ntm_tracker_tpu.train.experiments import frame_tokens
        from ntm_tracker_tpu.train.zoo import compress_features

        toks = frame_tokens(self.cfg, self.vgg_params, crops)  # [B,F,C]
        if self.compress_dim:
            toks = compress_features(toks, params["compressor"])
        return toks

    def _frame_offsets(self, params, crops, gt_heat, state):
        """One frame through the cell: crops [B,S,S,3] (mean-subtracted),
        gt_heat [B,F] or None -> ((dy,dx) [B,2], new state)."""
        toks = self._frame_tokens(params, crops)
        stream = serialize_streaming_batch(toks, gt_heat, delimiter_first=False)

        def body(carry, x_t):
            logit, s = self.core.step(params["core"], x_t, carry)
            return s, logit

        state, logits = jax.lax.scan(body, state, jnp.swapaxes(stream, 0, 1))
        return jnp.tanh(logits[-1]), state

    def loss_fn(self, params, batch: Dict[str, jax.Array]):
        """batch: frames [B,L,S,S,3] raw RGB whole frames (read_imgs
        semantics, resized to crop_size), bboxes [B,L,4] normalized
        (y1,x1,y2,x2) gt boxes per frame."""
        from ntm_tracker_tpu.models.vgg import VGG_MEAN
        from ntm_tracker_tpu.tracking.tracker import canonical_first_frame_gt

        cfg = self.cfg
        d = cfg.data
        frames = batch["frames"].astype(jnp.float32) - jnp.asarray(VGG_MEAN)
        gt_boxes = batch["bboxes"].astype(jnp.float32)
        B, L = frames.shape[:2]
        canon = canonical_box(d.cropbox_grid, d.bbox_grid)

        def crop(frame, cropbox):
            return crop_and_resize(frame, cropbox, (d.crop_size, d.crop_size))

        # frame 0: crop around the GT box, present the target indicator
        # (the canonical centered heatmap — same value for every sample)
        bbox0 = gt_boxes[:, 0]
        crop0 = crop(frames[:, 0], cropbox_of(bbox0, d.cropbox_grid, d.bbox_grid))
        heat0 = jnp.tile(
            jnp.asarray(canonical_first_frame_gt(cfg))[None], (B, 1)
        )
        state = self.core.init_state(params["core"], B)
        _, state = self._frame_offsets(params, crop0, heat0, state)

        def step(carry, frame_and_gt):
            state, bbox = carry
            frame, gt_box = frame_and_gt
            cb = cropbox_of(bbox, d.cropbox_grid, d.bbox_grid)
            outs, state = self._frame_offsets(
                params, crop(frame, cb), None, state
            )
            gt_crop = to_crop_space(gt_box, cb)
            target = _center_offsets(gt_crop, canon)
            if cfg.predict_scale:
                from ntm_tracker_tpu.data.geometry_jnp import (
                    center_log_scale,
                    scale_box,
                )

                target = jnp.concatenate(
                    [target,
                     (center_log_scale(gt_crop, canon)
                      / cfg.scale_range)[:, None]], axis=-1,
                )
                base = scale_box(
                    jnp.broadcast_to(canon, (outs.shape[0], 4)),
                    jnp.exp(outs[:, 2] * cfg.scale_range),
                )
                dyx = outs[:, :2]
            else:
                base = canon[None]
                dyx = outs
            loss_t = 0.5 * jnp.sum(jnp.square(outs - target))
            # decode the PREDICTION into the next frame's recrop center;
            # cross-frame gradients flow through the memory, not the crop
            # geometry (see module docstring)
            pred_crop = base + jnp.concatenate(
                [dyx, dyx], axis=-1
            )  # canonical box (optionally rescaled) shifted by (dy,dx)
            next_bbox = jax.lax.stop_gradient(to_image_space(pred_crop, cb))
            return (state, next_bbox), loss_t

        xs = (
            jnp.swapaxes(frames[:, 1:], 0, 1),
            jnp.swapaxes(gt_boxes[:, 1:], 0, 1),
        )
        body = jax.checkpoint(step)
        (_state, final_bbox), losses = jax.lax.scan(body, (state, bbox0), xs)
        loss = jnp.sum(losses)
        return loss, {"loss": loss, "final_bbox": final_bbox}

    def make_train_step(self):
        import optax

        from ntm_tracker_tpu.train.optim import reference_optimizer

        t = self.cfg.train
        opt = reference_optimizer(
            t.learning_rate, t.decay, t.momentum, 1e-10, t.max_gradient_norm
        )

        def train_step(params, opt_state, batch):
            (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss}

        return train_step


def synthetic_active_batch(
    cfg: TrackerConfig, rng: np.random.RandomState, frame_hw: Optional[Tuple[int, int]] = None
) -> Dict[str, np.ndarray]:
    """A moving bright square on noise — a learnable closed-loop toy
    (the shared clip generator, data/synthetic.py)."""
    from ntm_tracker_tpu.data.synthetic import make_video

    B, L = cfg.train.batch_size, cfg.train.sequence_length
    H, W = frame_hw or (cfg.data.crop_size, cfg.data.crop_size)
    frames = np.zeros((B, L, H, W, 3), np.float32)
    boxes = np.zeros((B, L, 4), np.float32)
    for b in range(B):
        frames[b], boxes[b] = make_video(
            rng, L, (H, W), velocity=False, scale_walk=cfg.predict_scale
        )
    return {"frames": frames, "bboxes": boxes}
