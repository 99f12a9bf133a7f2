"""Self-contained tracking demo on synthetic video: train briefly, then
track a held-out clip and report IoU.

No dataset required — generates moving-bright-square clips, builds
reference-contract training batches from them (centered first-frame crop,
fixed transformation, per-frame Gaussian gt + center offsets, exactly the
offline preprocessor's geometry), trains the primary offset pipeline, and
drives the STREAMING tracker (the per-frame recrop loop the VOT adapter
uses) on a fresh clip.

    python -m ntm_tracker_tpu.tracking.demo                 # quick (TPU ~1min)
    python -m ntm_tracker_tpu.tracking.demo --train_steps 0 # untrained baseline
    python -m ntm_tracker_tpu.tracking.demo --platform cpu --train_steps 30

Measured on TPU v5e at the defaults (lr 1e-4): mean IoU 0.386 untrained ->
**0.812 after 400 steps** (~7 min) -> **0.834 after 1200** (the full-size
pipeline measured 0.288 -> 0.826 over 360 steps).
"""

from __future__ import annotations

import argparse
import functools

import numpy as np


@functools.lru_cache(maxsize=4)
def _crop_jit(size: int):
    # mean-subtract BEFORE cropping, exactly like the streaming tracker's
    # preprocessor (train/inference inputs must match); jitted once per
    # crop size — eager per-op dispatch is slow over tunneled TPU backends
    import jax
    import jax.numpy as jnp

    from ntm_tracker_tpu.data.image_ops import crop_and_resize
    from ntm_tracker_tpu.models.vgg import VGG_MEAN

    return jax.jit(
        lambda imgs, boxes: crop_and_resize(
            imgs - jnp.asarray(VGG_MEAN), boxes, (size, size)
        )
    )


def _crop_on_host(size: int, images: np.ndarray, boxes: np.ndarray):
    """Run the exact crop sampler on the HOST CPU backend and return numpy.

    Synthetic-training batches are generated per step; cropping on the
    accelerator means shipping the full [B*L, H, W, 3] frames over the
    (tunneled) link every step — ~22 MB/step at the demo scale, which
    dominated the TRACK artifact's 0.76 s/step in r3. Cropping on the CPU
    backend ships only the [B*L, size, size, 3] crops (~1.5 MB). Same
    jitted sampling code, so train and eval crops stay the same math."""
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        crops = _crop_jit(size)(
            jax.device_put(images, cpu), jax.device_put(boxes, cpu)
        )
    return np.asarray(crops)


# re-exported for callers/tests; the generator is shared with the
# active-resize toy batches (data/synthetic.py)
from ntm_tracker_tpu.data.synthetic import make_video  # noqa: E402,F401


def demo_config(crop_size: int = 64, core: str = "ntm",
                predict_scale: bool = False, scale_range: float = 0.15):
    """A small flagship-shaped config: crop 64 -> conv4_3 is exactly the
    8x8 token grid (all 64 points), gt 8x8, NTM 64x12 (or the DNC twin).
    Shared with tools/track_artifact.py so the committed TRACK_r0N
    accuracy numbers measure exactly the demo's setup. predict_scale
    widens the head to (dy, dx, ds) — TrackerConfig.predict_scale."""
    import jax.numpy as jnp

    from ntm_tracker_tpu.config import (
        DataConfig,
        DNCConfig,
        NTMConfig,
        TrackerConfig,
        TrainConfig,
    )

    g = crop_size // 8  # conv4_3 stride is 8
    out = 3 if predict_scale else 2
    return TrackerConfig(
        core=core,
        compute_dtype=jnp.float32,
        ntm=NTMConfig(output_dim=out, mem_size=64, mem_dim=12,
                      controller_hidden_size=100, read_head_size=4),
        dnc=DNCConfig(output_dim=out, memory_size=64, word_size=12,
                      num_reads=4, num_writes=1, hidden_size=100),
        data=DataConfig(crop_size=crop_size, gt_width=g),
        train=TrainConfig(batch_size=4, sequence_length=8,
                          learning_rate=1e-4),
        num_features=g * g,
        feature_points=tuple((y, x) for y in range(g) for x in range(g)),
        predict_scale=predict_scale,
        scale_range=scale_range,
    )


def eval_streaming_iou(cfg, vgg, params, seed: int, frames_n: int,
                       core=None, print_every: int = 0,
                       scene: str = "smooth"):
    """Held-out synthetic clip through the REAL streaming tracker
    (per-frame recrop); returns the list of per-frame IoUs. The single
    evaluation protocol behind both `demo` and the TRACK_r0N artifact.
    `scene` selects a synthetic-clip variant (data/synthetic.SCENES) —
    "smooth" is the demo's original clip."""
    from ntm_tracker_tpu.data.geometry import bb_iou
    from ntm_tracker_tpu.data.synthetic import make_scene
    from ntm_tracker_tpu.tracking.tracker import StreamingTracker

    frames, boxes = make_scene(np.random.RandomState(seed + 1000), frames_n,
                               scene=scene)
    H, W = frames.shape[1:3]
    tracker = StreamingTracker(cfg, vgg, params, *(
        (core,) if core is not None else ()
    ))
    b0 = boxes[0]
    tracker.init(
        frames[0],
        (b0[1] * W, b0[0] * H, (b0[3] - b0[1]) * W, (b0[2] - b0[0]) * H),
    )
    ious = []
    for t in range(1, frames_n):
        x, y, w, h = tracker.track(frames[t])
        gt = boxes[t]
        # per-frame values stay RAW: bb_iou keeps the reference's unclamped
        # +1-area formula (test_tracker.py:59-83), which goes arbitrarily
        # NEGATIVE for far-apart boxes — meaningful per frame for parity.
        # Aggregation clamps at 0 (mean_clamped_iou), same contract as
        # tracking/validate.py.
        ious.append(bb_iou(
            (x, y, x + w, y + h),
            (gt[1] * W, gt[0] * H, gt[3] * W, gt[2] * H),
        ))
        if print_every and t % print_every == 0:
            print(f"frame {t}: IoU {ious[-1]:.3f}")
    return ious


def eval_device_iou(cfg, vgg, params, seed: int, frames_n: int,
                    core=None, scene: str = "smooth", loop=None):
    """eval_streaming_iou's DEVICE-RESIDENT twin: the same held-out clip
    (same seed -> identical frames/gt) through make_device_track_step —
    crop geometry, VGG, cell steps and recrop all in one program. Returns
    the per-frame raw bb_iou list, so
    |mean_clamped_iou(device) - mean_clamped_iou(host)| is the serving
    ACCURACY gap the TRACK artifact tripwires (geometry drift alone can't
    say whether bf16 device serving tracks WORSE — VERDICT r4 weak #4).

    `loop` is an optional prebuilt (init_fn, step_fn) from
    make_device_track_step so multi-scene sweeps share one compile."""
    import jax.numpy as jnp

    from ntm_tracker_tpu.data.geometry import bb_iou
    from ntm_tracker_tpu.data.synthetic import make_scene
    from ntm_tracker_tpu.models.core import make_core
    from ntm_tracker_tpu.tracking.tracker import make_device_track_step

    frames, boxes = make_scene(np.random.RandomState(seed + 1000), frames_n,
                               scene=scene)
    H, W = frames.shape[1:3]
    if loop is None:
        if core is None:
            core = make_core(cfg)
        loop = make_device_track_step(cfg, core, vgg, params)
    init_fn, step_fn = loop
    if core is None:
        core = make_core(cfg)
    b0 = boxes[0]
    # same init region as the host loop, in the tracker's /(dim-1) space
    x, y = b0[1] * W, b0[0] * H
    w, h = (b0[3] - b0[1]) * W, (b0[2] - b0[0]) * H
    bbox = jnp.asarray(
        [[y / (H - 1), x / (W - 1), (y + h) / (H - 1), (x + w) / (W - 1)]],
        jnp.float32,
    )
    fdev = frames.astype(np.float32)
    state = init_fn(fdev[0:1], bbox, core.init_state(params, 1))
    ious = []
    for t in range(1, frames_n):
        region, bbox, state = step_fn(fdev[t : t + 1], bbox, state)
        rx, ry, rw, rh = np.asarray(region[0])
        gt = boxes[t]
        ious.append(bb_iou(
            (rx, ry, rx + rw, ry + rh),
            (gt[1] * W, gt[0] * H, gt[3] * W, gt[2] * H),
        ))
    return ious


def mean_clamped_iou(ious) -> float:
    """THE aggregate-IoU contract (demo / TRACK_r0N / validate / int8
    artifacts): per-frame values are clamped to [0, 1] before averaging —
    disjoint frames count 0 (not bb_iou's negative +1-area artifact, e.g.
    -31.8) and degenerate predicted boxes count at most 1 (bb_iou's +1-area
    formula exceeds 1 when a wandering tracker emits a negative-extent box;
    the r3 artifact recorded an untrained "IoU" of 5.44 that way). Per-frame
    lists everywhere keep the raw reference quirk."""
    if not len(ious):
        return float("nan")
    return float(np.mean([min(1.0, max(0.0, i)) for i in ious]))


def training_batch(cfg, rng: np.random.RandomState):
    """Reference-contract batch from synthetic clips: centered first-frame
    cropbox, SAME transformation for the whole sequence, per-frame Gaussian
    gt + center offsets (preprocess.py geometry). Arrays come back as
    numpy (crops computed on the host CPU backend) — the jitted train step
    transfers them; only crop-sized tensors cross the device link."""
    from ntm_tracker_tpu.data import geometry

    d = cfg.data
    B, L = cfg.train.batch_size, cfg.train.sequence_length
    gt_side = d.gt_width
    images, crops, gts, yos, xos, dss = [], [], [], [], [], []
    for b in range(B):
        # predict_scale training needs clips whose box SIZE moves too —
        # otherwise the ds head only ever sees target 0. Half the batch
        # keeps CONSTANT size, so the head also learns the stationary
        # case (ds=0) instead of hallucinating scale changes everywhere.
        frames, boxes = make_video(
            rng, L, scale_walk=cfg.predict_scale and b % 2 == 0)
        cb = geometry.calculate_cropbox(boxes[0], d.cropbox_grid, d.bbox_grid)
        tf = geometry.calculate_transformation(cb)
        init_tb = geometry.initial_transformed_bbox(d.cropbox_grid, d.bbox_grid)
        for t in range(L):
            tb = geometry.apply_transformation(boxes[t], tf)
            heat = geometry.generate_gt(
                tb, gt_side, gt_side * d.bbox_grid / d.cropbox_grid
            )
            dy, dx = geometry.calculate_offsets(tb, init_tb)
            images.append(frames[t])
            crops.append(cb)
            gts.append(np.asarray(heat, np.float32))
            yos.append(dy)
            xos.append(dx)
            if cfg.predict_scale:
                # clip into tanh's reachable range: an 8-frame scale walk
                # can exceed scale_range cumulatively, and an L2 target
                # beyond +-1 would push tanh into saturation
                dss.append(float(np.clip(
                    geometry.calculate_scale(tb, init_tb) / cfg.scale_range,
                    -0.95, 0.95,
                )))
    boxes_a = np.stack(crops).astype(np.float32)
    # crop on the host CPU backend: only the crops cross the device link
    # (the full frames are ~14x bigger and the link is the bottleneck)
    cropped = _crop_on_host(d.crop_size, np.stack(images), boxes_a)
    batch = {
        "images": cropped,
        "cropboxes": boxes_a,
        "gts": np.stack(gts),
        "y_offsets": np.asarray(yos, np.float32),
        "x_offsets": np.asarray(xos, np.float32),
    }
    if cfg.predict_scale:
        batch["scales"] = np.asarray(dss, np.float32)
    return batch


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train_steps", type=int, default=400)
    ap.add_argument("--eval_frames", type=int, default=40)
    ap.add_argument("--crop_size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--core", default="ntm", choices=("ntm", "dnc"))
    ap.add_argument("--predict_scale", action="store_true",
                    help="beyond-reference (dy,dx,ds) head: track box "
                    "SIZE too (trains on size-varying clips)")
    ap.add_argument("--eval_scene", default="smooth",
                    help="synthetic eval clip variant "
                    "(smooth|scale|fast|texture)")
    ap.add_argument("--vgg_weights", default="",
                    help="converted vgg16 .npz (convert-vgg output); the "
                    "default is RANDOM frozen VGG — fine for the synthetic "
                    "demo, required for real-video accuracy")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ntm_tracker_tpu.models.vgg import init_vgg_params
    from ntm_tracker_tpu.train.experiments import OffsetExperiment

    cfg = demo_config(args.crop_size, core=args.core,
                      predict_scale=args.predict_scale)
    rng = np.random.RandomState(args.seed)
    if args.vgg_weights:
        from ntm_tracker_tpu.models.vgg import load_params_npz

        vgg = load_params_npz(args.vgg_weights)
    else:
        vgg = init_vgg_params(jax.random.PRNGKey(0))
    exp = OffsetExperiment(cfg, vgg, image_mode="cropped")
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    step = jax.jit(exp.make_train_step(), donate_argnums=(0, 1))

    for i in range(args.train_steps):
        batch = training_batch(cfg, rng)
        params, opt_state, m = step(params, opt_state, batch)
        if i % 20 == 0 or i == args.train_steps - 1:
            print(f"train step {i}: loss {float(m['loss']):.4f}")

    # held-out clip through the real streaming tracker (per-frame recrop)
    ious = eval_streaming_iou(cfg, vgg, params, args.seed, args.eval_frames,
                              print_every=10, scene=args.eval_scene)
    print(f"mean IoU over {len(ious)} tracked frames: "
          f"{mean_clamped_iou(ious):.3f}"
          f" ({'trained ' + str(args.train_steps) + ' steps' if args.train_steps else 'untrained'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
