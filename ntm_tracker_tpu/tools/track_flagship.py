"""One-off flagship-scale accuracy artifact: TRACK_FLAGSHIP.json.

The per-round TRACK artifact trains the DEMO config (crop 64, memory
64x12, hidden 100, L=8 — tracking/demo.py:demo_config); the config the
reference actually trains is crop 224, the 64-token conv4_3 grid,
514-channel tokens, L=20 -> 1300 sequential cell steps, memory 128x20,
hidden 200 (direct_offset_output.py:21-49,460). Until round 4 that
flagship config was compile-checked (__graft_entry__.entry) and
speed-measured (bench cached training at B=256) but never shown to
TRAIN to a good IoU end-to-end. This tool closes that gap (VERDICT r4
missing #2): it trains the flagship config on synthetic video until the
held-out streaming IoU plateaus and commits the evidence.

Method (feature-cache style, device-resident):
  * generate a fixed synthetic dataset of N sequences x L=20 frames
    (data/synthetic.make_video, the TRACK protocol's generator) with the
    exact preprocess geometry (centered first-frame cropbox, per-frame
    Gaussian gt + center offsets);
  * run the frozen VGG ONCE over all N*L crops and keep the [N*L,64,512]
    tokens RESIDENT on device — the feature-cache insight (VGG is frozen
    => its tokens are a pure function of the data), which makes flagship
    training a ~200 ms/step fused-BPTT problem instead of a
    VGG-every-step one, and keeps the tunnel out of the step path;
  * train at the measured B=256 knee (full-batch over the dataset by
    default), evaluating the REAL streaming tracker (per-frame recrop,
    crop 224) on held-out clips every eval_every steps;
  * stop when the eval IoU plateaus (< min_gain over a patience window)
    or at max_steps; record the loss/IoU curves, wall-clock, final
    scene sweep, and the config fingerprint.

Like every accuracy number in this repo, the VGG is RANDOM-init (no
public vgg_16.ckpt on this machine) and the video synthetic — the
artifact demonstrates the flagship OPTIMIZATION PATH trains end-to-end,
not ILSVRC accuracy (see MIGRATION.md's real-data runbook).

Usage: python -m ntm_tracker_tpu.tools.track_flagship [--out PATH]
Progress to stderr; writes the JSON artifact (default repo-root
TRACK_FLAGSHIP.json). One-off: refresh only when the model changes.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _log(m):
    print(f"track_flagship: {m}", file=sys.stderr, flush=True)


def flagship_config(batch_size: int = 256):
    """THE reference training config (direct_offset_output.py:21-49):
    crop 224 / conv4_3 64-token grid / 514-ch tokens / L=20 (1300 steps)
    / mem 128x20 / hidden 200 / 4 read heads / lr 1e-4 / clip 5 — i.e.
    this package's TrackerConfig defaults, at the measured B=256 knee."""
    from ntm_tracker_tpu.config import TrackerConfig, TrainConfig

    return TrackerConfig(
        core="ntm",
        compute_dtype=jnp.float32,
        train=TrainConfig(batch_size=batch_size, sequence_length=20),
    )


def build_dataset(cfg, vgg, n_seqs: int, seed: int, chunk: int = 128):
    """Fixed synthetic dataset -> device-resident token tensors.

    Returns {"features" [N*L,64,512] f32 (device), "gts" [N*L,64] f32,
    "y_offsets"/"x_offsets" [N*L] f32} — exactly the feature-cache batch
    contract (OffsetExperiment.batch_features)."""
    from ntm_tracker_tpu.data import geometry
    from ntm_tracker_tpu.data.synthetic import make_video
    from ntm_tracker_tpu.tracking.demo import _crop_on_host
    from ntm_tracker_tpu.train.experiments import frame_tokens

    d = cfg.data
    L = cfg.train.sequence_length
    rng = np.random.RandomState(seed)
    # VGG as a jit ARGUMENT (CLAUDE.md round-5 invariant): no 59 MB
    # closure constant, no per-weight-value compile/cache entry
    tok_jit = jax.jit(lambda v, crops: frame_tokens(cfg, v, crops))

    def tok_fn(crops):
        return tok_jit(vgg, crops)

    feats, gts, yos, xos = [], [], [], []
    frames_buf, crops_buf = [], []

    def flush_chunk():
        if not frames_buf:
            return
        crops = _crop_on_host(d.crop_size, np.stack(frames_buf),
                              np.stack(crops_buf).astype(np.float32))
        feats.append(tok_fn(jnp.asarray(crops)))
        frames_buf.clear()
        crops_buf.clear()

    t0 = time.time()
    for s in range(n_seqs):
        frames, boxes = make_video(rng, L)
        cb = geometry.calculate_cropbox(boxes[0], d.cropbox_grid, d.bbox_grid)
        tf = geometry.calculate_transformation(cb)
        init_tb = geometry.initial_transformed_bbox(d.cropbox_grid,
                                                    d.bbox_grid)
        for t in range(L):
            tb = geometry.apply_transformation(boxes[t], tf)
            heat = geometry.generate_gt(
                tb, d.gt_width, d.gt_width * d.bbox_grid / d.cropbox_grid)
            dy, dx = geometry.calculate_offsets(tb, init_tb)
            frames_buf.append(frames[t])
            crops_buf.append(cb)
            gts.append(np.asarray(heat, np.float32).reshape(-1))
            yos.append(dy)
            xos.append(dx)
            if len(frames_buf) >= chunk:
                flush_chunk()
        if (s + 1) % 64 == 0:
            _log(f"dataset: {s + 1}/{n_seqs} sequences "
                 f"({time.time() - t0:.0f}s)")
    flush_chunk()
    features = jnp.concatenate(feats, axis=0)  # stays on device
    _log(f"dataset ready: features {features.shape} "
         f"({features.nbytes / 1e6:.0f} MB on device, "
         f"{time.time() - t0:.0f}s)")
    return {
        "features": features,
        "gts": jnp.asarray(np.stack(gts)),
        "y_offsets": jnp.asarray(np.asarray(yos, np.float32)),
        "x_offsets": jnp.asarray(np.asarray(xos, np.float32)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="default: <repo root>/TRACK_FLAGSHIP.json")
    ap.add_argument("--batch_size", type=int, default=256,
                    help="training batch (the measured fused-BPTT knee); "
                    "also the dataset size (full-batch training — eval "
                    "clips are held out by construction)")
    ap.add_argument("--max_steps", type=int, default=1200)
    ap.add_argument("--eval_every", type=int, default=100)
    ap.add_argument("--eval_frames", type=int, default=40)
    ap.add_argument("--min_gain", type=float, default=0.01,
                    help="stop when the best eval IoU improves less than "
                    "this over the last two eval windows")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # after the platform choice: compcache no-ops on CPU (its AOT loader
    # rejects this machine's own entries — see utils/compcache.py)
    from ntm_tracker_tpu.utils.compcache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    import os

    from ntm_tracker_tpu.data.synthetic import SCENES
    from ntm_tracker_tpu.models.vgg import init_vgg_params
    from ntm_tracker_tpu.tracking.demo import (
        eval_streaming_iou,
        mean_clamped_iou,
    )
    from ntm_tracker_tpu.train.experiments import (
        OffsetExperiment,
        train_step_with_bptt_fallback,
    )

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "TRACK_FLAGSHIP.json",
    )

    cfg = flagship_config(args.batch_size)
    n = cfg.ntm
    _log(f"flagship config: crop {cfg.data.crop_size}, "
         f"{cfg.num_features} tokens x {cfg.input_depth} ch, "
         f"L={cfg.train.sequence_length} -> {cfg.total_steps} cell steps, "
         f"mem {n.mem_size}x{n.mem_dim}, hidden "
         f"{n.controller_hidden_size}, B={cfg.train.batch_size}")

    vgg = init_vgg_params(jax.random.PRNGKey(0))
    exp = OffsetExperiment(cfg, vgg, image_mode="cropped")
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    step = train_step_with_bptt_fallback(exp)

    batch = build_dataset(cfg, vgg, args.batch_size, args.seed)

    def eval_iou(p, frames_n=None):
        return mean_clamped_iou(eval_streaming_iou(
            cfg, vgg, p, args.seed, frames_n or args.eval_frames))

    t_eval0 = time.time()
    untrained = eval_iou(params)
    _log(f"untrained IoU {untrained:.3f} "
         f"(eval path compiled in {time.time() - t_eval0:.0f}s)")

    loss_curve, iou_curve = [], [(0, round(untrained, 4))]
    t0 = time.time()
    steps_done = 0
    m = None
    stop_reason = "max_steps"
    for i in range(args.max_steps):
        params, opt_state, m = step(params, opt_state, batch)
        steps_done = i + 1
        if i % 20 == 0:
            loss_curve.append((i, round(float(m["loss"]), 5)))
            _log(f"step {i} loss {loss_curve[-1][1]:.4f}")
        if steps_done % args.eval_every == 0:
            iou = eval_iou(params)
            iou_curve.append((steps_done, round(iou, 4)))
            _log(f"step {steps_done}: held-out streaming IoU {iou:.3f}")
            # plateau check only past the demo-measured 400-step ramp —
            # the IoU curve is flat-then-jump early, not monotone
            if len(iou_curve) >= 3 and steps_done >= 400:
                prev_best = max(v for _s, v in iou_curve[:-2])
                if max(iou_curve[-1][1], iou_curve[-2][1]) < (
                        prev_best + args.min_gain):
                    stop_reason = "plateau"
                    _log(f"plateau: last two evals "
                         f"{iou_curve[-2][1]:.3f}/{iou_curve[-1][1]:.3f} "
                         f"vs best {prev_best:.3f} (+<{args.min_gain})")
                    break
    if m is not None:
        float(m["loss"])  # hard sync (CLAUDE.md: value fetch, not block_until_ready)
    train_s = time.time() - t0

    # trained_iou must describe the FINAL params: when max_steps is not a
    # multiple of eval_every (or eval_every > max_steps), training ran
    # past the last recorded eval — evaluate once more at steps_done
    if iou_curve[-1][0] != steps_done:
        iou = eval_iou(params)
        iou_curve.append((steps_done, round(iou, 4)))
        _log(f"final eval at step {steps_done}: IoU {iou:.3f}")
    trained = iou_curve[-1][1]
    scenes = []
    for scene in SCENES:
        iou = mean_clamped_iou(eval_streaming_iou(
            cfg, vgg, params, args.seed, 24, scene=scene))
        scenes.append({"scene": scene, "trained_iou": round(iou, 4)})
        _log(f"scene {scene}: trained IoU {iou:.3f}")

    artifact = {
        "platform": jax.devices()[0].platform,
        "device_kind": getattr(jax.devices()[0], "device_kind", ""),
        "config": {
            "crop_size": cfg.data.crop_size,
            "tokens_per_frame": cfg.tokens_per_frame,
            "input_depth": cfg.input_depth,
            "sequence_length": cfg.train.sequence_length,
            "total_cell_steps": cfg.total_steps,
            "mem_size": n.mem_size,
            "mem_dim": n.mem_dim,
            "hidden": n.controller_hidden_size,
            "read_heads": n.read_head_size,
            "batch_size": cfg.train.batch_size,
            "learning_rate": cfg.train.learning_rate,
        },
        "steps": steps_done,
        "stop_reason": stop_reason,
        "train_seconds": round(train_s, 1),
        "untrained_iou": round(untrained, 4),
        "trained_iou": trained,
        "best_iou": round(max(v for _s, v in iou_curve), 4),
        "iou_curve": iou_curve,
        "loss_curve": loss_curve,
        "scenes": scenes,
        "vgg": "random-init frozen (no public ckpt on this machine)",
        "data": "synthetic video (data/synthetic.make_video), "
                f"{args.batch_size} fixed training sequences, "
                "held-out eval clips",
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    _log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
