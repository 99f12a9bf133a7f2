"""Streaming online tracker: one device call per frame.

Re-architecture of the reference's test_tracker.py NTMTracker (:104-405).
The reference steps the cell ONE TOKEN PER sess.run — 65 host round-trips
per frame (:284-299). Here the whole frame is a single jitted call:

    frame_step: (crop [B,224,224,3], state) ->
        VGG conv4_3 -> 64 tokens -> [delimiter; tokens] stream
        -> lax.scan 65 cell steps -> tanh(last logit) = (dy, dx), new state

so the state never leaves HBM and the VGG + 65 cell steps fuse into one XLA
program. The bbox decode / re-crop geometry stays on host (cheap scalar
math, data-dependent on the image size): _get_bbox/_decode_bbox/_update_bbox
(test_tracker.py:252-329).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.config import TrackerConfig
from ntm_tracker_tpu.data import geometry
from ntm_tracker_tpu.data.image_ops import crop_and_resize
from ntm_tracker_tpu.models.core import MemoryCore, make_core
from ntm_tracker_tpu.models.vgg import VGG_MEAN


def build_frame_step(
    cfg: TrackerConfig,
    core: MemoryCore,
    vgg_params: Any,
    params: Any,
    donate_state: bool = True,
    delimiter_first: bool = False,
    bake_weights: bool = False,
):
    """Create the jitted whole-frame step.

    Returns step(crops [B,H,W,3] raw RGB, cropbox-relative gt or None, state)
      -> (offsets [B,2], new state).
    The `first` variant carries the frame-0 gt indicator channel
    (test_tracker.py:384-394).

    delimiter_first=False (default) matches the TRAINING serialization:
    [64 feature tokens, delimiter], prediction read at the delimiter step —
    the same step type the loss gathers (direct_offset_output.py:581-593).
    delimiter_first=True reproduces the reference's streaming protocol
    (test_tracker.py:400-404), which prepends the delimiter and reads the
    prediction at the last FEATURE token — a train/inference mismatch in
    the reference that measurably hurts tracking; kept for parity.
    """
    from ntm_tracker_tpu.config import validate_head

    validate_head(cfg)
    F = cfg.num_features
    C = cfg.feature_depth

    def tokens_of(vgg_p, crops: jax.Array) -> jax.Array:
        # shared with training (train/experiments.frame_tokens) so the
        # serving and training tokens are computed by the same code path
        from ntm_tracker_tpu.train.experiments import frame_tokens

        return frame_tokens(cfg, vgg_p, crops)

    # Weights are jit ARGUMENTS, not closure constants: a compiled frame
    # step contains no weight data, so (a) trackers with different weights
    # (untrained vs trained, per-seed sweeps) share ONE compile and ONE
    # persistent-cache entry — the TRACK artifact's compile bill halves —
    # (b) executables shrink from ~65 MB (59 MB of embedded VGG) to MBs,
    # and (c) HBM holds one copy of the VGG across all serving programs
    # instead of one per executable.
    def frame_fn_p(vgg_p, p, crops: jax.Array, gt: Optional[jax.Array],
                   state):
        # crops are already mean-subtracted (the reference subtracts the VGG
        # mean BEFORE crop_and_resize so out-of-image extrapolation is 0 in
        # network space, test_tracker.py:350-354)
        B = crops.shape[0]
        toks = tokens_of(vgg_p, crops.astype(jnp.float32))
        # single-stream tracking routes through the whole-sequence fused
        # Pallas kernel (measured 1.54x lower latency at B=1 on v5e); the
        # batched path keeps the jnp scan, which XLA fuses better at B>=8.
        # cfg.fused_inference=False forces the reference-semantics jnp path
        # (e.g. for checkpoint-parity debugging); True forces the kernel.
        if cfg.fused_inference is None:
            use_fused = (
                B == 1
                and cfg.core == "ntm"
                and jax.default_backend() == "tpu"
                # the precision knob only exists on the jnp path; auto
                # must not silently route around it
                and cfg.cell_matmul_precision is None
            )
        else:
            use_fused = cfg.fused_inference and cfg.core == "ntm"
        from ntm_tracker_tpu.train.serialize import serialize_streaming_batch

        stream = serialize_streaming_batch(
            toks, None if gt is None else gt.reshape(B, F),
            delimiter_first=delimiter_first,
        )

        if use_fused:
            from ntm_tracker_tpu.ops.pallas.scan_cell import ntm_scan_fused

            logits_bt, final_state = ntm_scan_fused(
                p, cfg.ntm, stream, state, compute_dtype=cfg.compute_dtype
            )
            # outputs[-1] = last token's logit (test_tracker.py:274-282)
            return jnp.tanh(logits_bt[:, -1]), final_state

        def body(carry, x_t):
            logit, new_state = core.step(p, x_t, carry)
            return new_state, logit

        def scan_cells():
            return jax.lax.scan(body, state, jnp.swapaxes(stream, 0, 1))

        # cfg.cell_matmul_precision scopes a matmul-precision override to
        # the cell steps ONLY (VGG above keeps the backend default) — the
        # serving-drift diagnostic knob (tools/probe_drift_asym.py)
        if cfg.cell_matmul_precision is not None:
            with jax.default_matmul_precision(cfg.cell_matmul_precision):
                final_state, logits = scan_cells()
        else:
            final_state, logits = scan_cells()
        offsets = jnp.tanh(logits[-1])
        return offsets, final_state

    def frame_fn(crops, gt, state):
        # unjitted weight-bound core: traced INTO the device loop and the
        # AOT export (which bakes weights by design)
        return frame_fn_p(vgg_params, params, crops, gt, state)

    if bake_weights:
        # opt-in CONSTANT-baked programs: XLA const-folds the frozen VGG
        # into the conv schedule, measured 14% faster at the B=256
        # headline (32.06 vs 36.61 ms/step, r5 A/B — neither pre-casting
        # the weights to bf16 nor device_put into the executable's
        # preferred input layouts recovers it, so the win is genuinely
        # constant-aware compilation). The price is a several-minute
        # compile PER WEIGHT VALUE and a ~65 MB executable — use for
        # fixed-weight throughput serving/benchmarks; the default arg
        # mode is right for everything that varies weights (training
        # evals, multi-core artifacts). AOT export (tools/export_serving)
        # bakes weights by design, so this mode measures what a deployed
        # artifact gets.
        step_first = jax.jit(
            frame_fn, donate_argnums=(2,) if donate_state else ()
        )
        step_rest = jax.jit(
            lambda crops, state: frame_fn_p(
                vgg_params, params, crops, None, state
            ),
            donate_argnums=(1,) if donate_state else (),
        )
    else:
        jit_first = jax.jit(
            frame_fn_p, donate_argnums=(4,) if donate_state else ()
        )
        jit_rest = jax.jit(
            lambda vgg_p, p, crops, state: frame_fn_p(
                vgg_p, p, crops, None, state
            ),
            donate_argnums=(3,) if donate_state else (),
        )

        def step_first(crops, gt, state):
            return jit_first(vgg_params, params, crops, gt, state)

        def step_rest(crops, state):
            return jit_rest(vgg_params, params, crops, state)

    step_first.frame_fn = frame_fn
    step_first.frame_fn_p = frame_fn_p  # parametric twin (device loop)
    return step_first, step_rest


def make_device_track_step(
    cfg: TrackerConfig,
    core: MemoryCore,
    vgg_params: Any,
    params: Any,
    delimiter_first: bool = False,
    crop_precision=jax.lax.Precision.HIGHEST,
):
    """Fully device-resident per-frame tracking: the crop geometry, the
    recrop, the VGG and the 65 cell steps all inside ONE jitted call — for
    serving pipelines whose frames are already on device (video decode on
    accelerator, fleet batches), where StreamingTracker's host-side numpy
    geometry would force a device->host->device round trip per frame.

    The geometry is bit-faithful to StreamingTracker, INCLUDING the
    reference's (dim-1)/dim decode quirk (test_tracker.py:257-329: regions
    are decoded with *dim but re-normalized with /(dim-1), so each recrop
    scales the box by dim/(dim-1)); tests assert trajectory parity.

    Trajectory-parity caveat (measured, v5e): under TPU's DEFAULT matmul
    precision the two paths are separately-compiled programs whose bf16
    rounding differs (~1e-3 relative per conv); an UNTRAINED cell amplifies
    this chaotically across recrops (frame-1 regions agree to 0.001 px at
    jax_default_matmul_precision=highest but drift px-scale per frame at
    default precision with random weights). A trained tracker is
    contractive, and each path is internally deterministic.

    Returns (init_fn, step_fn):
      init_fn(frames [B,H,W,3] raw RGB, bbox0 [B,4] y1x1y2x2 in the
              tracker's /(dim-1) normalization, state) -> state
      step_fn(frames, bbox, state) ->
              (region [B,4] x,y,w,h pixels, next_bbox [B,4], state)
    """
    from ntm_tracker_tpu.data.geometry_jnp import (
        canonical_box,
        cropbox_of,
        scale_box,
        to_image_space,
    )
    from ntm_tracker_tpu.data.image_ops import crop_and_resize_mm

    d = cfg.data
    canon = canonical_box(d.cropbox_grid, d.bbox_grid)
    heat0 = jnp.asarray(canonical_first_frame_gt(cfg))

    step_first, _ = build_frame_step(
        cfg, core, vgg_params, params,
        donate_state=False, delimiter_first=delimiter_first,
    )
    # parametric frame fn: weights stay jit ARGUMENTS through the device
    # loop too (see build_frame_step — shared compiles across weight
    # values, no 59 MB VGG constant per executable)
    frame_fn_p = step_first.frame_fn_p

    def _crop(frames, cropbox):
        # separable-matmul bilinear crop: the gather formulation on full
        # [B,360,640,3] frames cost ~20 ms/step of the r3 loop's 52.7 ms
        # at B=256; the matmul form is ~3 ms of MXU work, putting the
        # whole closed loop within 8.4% of the crop-free headline step
        # (35.24 vs 32.27 ms — tools/probe_devloop.py). crop_precision
        # controls how closely the crop matches the host loop's f32
        # gather form: HIGH leaves 4.2e-5-of-full-scale error, which the
        # NTM recrop feedback amplified to a 12.83 px / 0.166 drift_frac
        # TRIPWIRE BREACH in the r4 rehearsal TRACK artifact; HIGHEST is
        # 1.2e-7 of full scale (f32-exact) and restores r3-level drift
        # (measured 2.59 px / 0.034 with the same trained weights) at
        # +0.9% closed-loop step cost — correctness is free here.
        imgs = frames.astype(jnp.float32) - jnp.asarray(VGG_MEAN)
        return crop_and_resize_mm(imgs, cropbox, (d.crop_size, d.crop_size),
                                  precision=crop_precision)

    def init_fn_p(vgg_p, p, frames, bbox0, state):
        crops = _crop(frames, cropbox_of(bbox0, d.cropbox_grid, d.bbox_grid))
        B = crops.shape[0]
        _, state = frame_fn_p(vgg_p, p, crops,
                              jnp.tile(heat0[None], (B, 1)), state)
        return state

    def step_fn_p(vgg_p, p, frames, bbox, state):
        H, W = frames.shape[1:3]
        cb = cropbox_of(bbox, d.cropbox_grid, d.bbox_grid)
        offsets, state = frame_fn_p(vgg_p, p, _crop(frames, cb), None, state)
        # in-graph twin of decode_head: optional scale about the canonical
        # center, then the (dy, dx) shift
        if cfg.predict_scale:
            base = scale_box(
                jnp.broadcast_to(canon, (offsets.shape[0], 4)),
                jnp.exp(offsets[:, 2] * cfg.scale_range),
            )
            offsets = offsets[:, :2]
        else:
            base = canon[None]
        pred_crop = base + jnp.concatenate([offsets, offsets], axis=-1)
        img_box = to_image_space(pred_crop, cb)  # [B,4] y1x1y2x2, *1/dim units
        y1, x1, y2, x2 = jnp.moveaxis(img_box, -1, 0)
        region = jnp.stack(
            [x1 * W, y1 * H, (x2 - x1) * W, (y2 - y1) * H], axis=-1
        )
        # the reference's decode/renormalize round trip: pixels = box*dim,
        # next normalization divides by (dim-1)
        quirk = jnp.asarray(
            [H / (H - 1.0), W / (W - 1.0), H / (H - 1.0), W / (W - 1.0)],
            jnp.float32,
        )
        return region, img_box * quirk, state

    jit_init = jax.jit(init_fn_p)
    jit_step = jax.jit(step_fn_p)

    def init_fn(frames, bbox0, state):
        return jit_init(vgg_params, params, frames, bbox0, state)

    def step_fn(frames, bbox, state):
        return jit_step(vgg_params, params, frames, bbox, state)

    return init_fn, step_fn


# -- host-side crop/decode geometry, shared by StreamingTracker and the
# fleet tracker (tracking/fleet.py) so the two can never diverge ----------

def decode_head(cfg, init_bbox, outputs: np.ndarray):
    """Head outputs -> crop-space box. (dy, dx): shift the canonical box
    (offset_bbox, preprocess.py:116-119); with cfg.predict_scale a third
    output ds first scales it about its center by exp(ds * scale_range)
    (the beyond-reference scale head — see TrackerConfig.predict_scale).
    Shared by StreamingTracker and FleetTracker."""
    if cfg.predict_scale:
        dy, dx, ds = (float(v) for v in outputs)
        init_bbox = geometry.scale_bbox(
            init_bbox, float(np.exp(ds * cfg.scale_range))
        )
    else:
        dy, dx = (float(v) for v in outputs)
    return geometry.offset_bbox(init_bbox, (dy, dx))

def region_geometry(cfg_data, image_size, region_xywh):
    """(normalized_bbox, cropbox, transformation) for a tracked region
    (test_tracker.py:301-329). region is (x, y, w, h); values all < 1 are
    treated as already-normalized (the VOT file protocol passes pixels)."""
    x1, y1, w, h = region_xywh
    normalized = x1 < 1 and y1 < 1 and w < 1 and h < 1
    bbox = (y1, x1, y1 + h, x1 + w)
    width, height = image_size
    nb = bbox if normalized else geometry.normalize_bbox((width, height), bbox)
    cropbox = geometry.calculate_cropbox(
        nb, cfg_data.cropbox_grid, cfg_data.bbox_grid
    )
    return nb, cropbox, geometry.calculate_transformation(cropbox)


def decode_region(transformation, image_size, normalized_bbox):
    """Cropbox-space bbox -> (x, y, w, h) pixel region via the inverse crop
    transform (test_tracker.py:257-272)."""
    y1, x1, y2, x2 = geometry.apply_transformation(
        normalized_bbox, np.linalg.inv(transformation)
    )
    w, h = image_size
    return (x1 * w, y1 * h, (x2 - x1) * w, (y2 - y1) * h)


def canonical_first_frame_gt(cfg) -> np.ndarray:
    """The frame-0 indicator when the gt box IS the box the crop was built
    around: its crop-space image is exactly the canonical centered box, so
    the heatmap is a per-config CONSTANT ([num_features] float32). Shared
    by the device-resident track step and the active-resize trainer."""
    d = cfg.data
    gt_side = int(round(cfg.num_features ** 0.5))
    half = d.bbox_grid / float(d.cropbox_grid) / 2.0
    return geometry.generate_gt(
        (0.5 - half, 0.5 - half, 0.5 + half, 0.5 + half),
        gt_side, gt_side * d.bbox_grid / d.cropbox_grid,
    ).astype(np.float32).reshape(-1)


def first_frame_gt(cfg, normalized_bbox, transformation) -> np.ndarray:
    """The frame-0 Gaussian target indicator (test_tracker.py:384-394).

    gt grid side = sqrt(num_features): equals cropbox_grid (8) in the full
    config (test_tracker.py:390-393); kept general for tests. Float bbox
    grid: same sigma as the reference for the canonical 8/6 config
    (6.0/3 == 6//3 == 2) but avoids the int-division zero for tiny grids."""
    d = cfg.data
    gt_side = int(round(cfg.num_features ** 0.5))
    return geometry.generate_gt(
        geometry.apply_transformation(normalized_bbox, transformation),
        gt_side, gt_side * d.bbox_grid / d.cropbox_grid,
    ).astype(np.float32)


@dataclasses.dataclass
class StreamingTracker:
    """Host-side tracking loop: crop geometry + device frame steps.

    Mirrors test_tracker.NTMTracker's protocol: init with the first frame +
    region, then track(image) per frame, recropping around the previous
    prediction each time (:301-329)."""

    cfg: TrackerConfig
    vgg_params: Any
    params: Any
    core: MemoryCore = None  # type: ignore[assignment]
    delimiter_first: bool = False  # True = reference streaming protocol
    # AOT serving: a tools/export_serving.ServingModel replaces the jitted
    # steps (weights + program live in the artifact; vgg_params/params/core
    # are unused). Build via StreamingTracker.from_serving(model).
    serving_model: Any = None

    @classmethod
    def from_serving(cls, model):
        """Drive the host-geometry loop from an exported serving artifact —
        no model code, no weights, no compile."""
        from ntm_tracker_tpu.tools.export_serving import config_from_meta

        meta = model.meta
        if meta["batch"] != 1:
            raise ValueError(
                f"StreamingTracker needs a batch-1 artifact, got "
                f"{meta['batch']} (fleet-sized artifacts serve via "
                "FleetTracker.from_serving)")
        return cls(config_from_meta(meta), None, None,
                   delimiter_first=meta["delimiter_first"],
                   serving_model=model)

    def __post_init__(self):
        if self.serving_model is not None:
            m = self.serving_model
            self._init_state = m.init_state
            # pass arrays through untouched — ServingModel keeps device
            # arrays on device and converts numpy itself
            self._step_first = m.first
            self._step_rest = m.step
        else:
            if self.core is None:
                self.core = make_core(self.cfg)
            self._init_state = lambda: self.core.init_state(self.params, 1)
            self._step_first, self._step_rest = build_frame_step(
                self.cfg, self.core, self.vgg_params, self.params,
                donate_state=True, delimiter_first=self.delimiter_first,
            )
        d = self.cfg.data
        # mean-subtract BEFORE cropping (test_tracker.py:350-354)
        self._crop_jit = jax.jit(
            lambda img, box: crop_and_resize(
                (img.astype(jnp.float32) - jnp.asarray(VGG_MEAN))[None],
                box[None], (d.crop_size, d.crop_size),
            )[0]
        )

    # -- geometry (host) ---------------------------------------------------
    def _update_bbox(self, image_size, region_xywh):
        self.normalized_bbox, self.cropbox, self.transformation = (
            region_geometry(self.cfg.data, image_size, region_xywh)
        )

    def _decode_bbox(self, normalized_bbox):
        return decode_region(self.transformation, self.image_size, normalized_bbox)

    # -- protocol ------------------------------------------------------------
    def init(self, image: np.ndarray, region_xywh) -> None:
        """First frame: build state, present the target-indicated frame."""
        h, w, _ = image.shape
        self.image_size = (w, h)
        self._update_bbox(self.image_size, region_xywh)
        crop = self._crop_jit(
            jnp.asarray(image), jnp.asarray(self.cropbox, jnp.float32)
        )
        gt = first_frame_gt(self.cfg, self.normalized_bbox, self.transformation)
        state = self._init_state()
        _, self.state = self._step_first(
            crop[None], jnp.asarray(gt.reshape(1, -1)), state
        )

    def track(self, image: np.ndarray):
        """One frame: crop around the previous box, step, decode, re-crop."""
        crop = self._crop_jit(
            jnp.asarray(image), jnp.asarray(self.cropbox, jnp.float32)
        )
        offsets, self.state = self._step_rest(crop[None], self.state)
        d = self.cfg.data
        init_bbox = geometry.initial_transformed_bbox(d.cropbox_grid, d.bbox_grid)
        new_bbox = decode_head(self.cfg, init_bbox, np.asarray(offsets[0]))
        # kept as an attribute like the reference's tracker (test_tracker.py:171)
        self.output_bbox = new_bbox
        region = self._decode_bbox(new_bbox)
        self._update_bbox(self.image_size, region)
        return region
