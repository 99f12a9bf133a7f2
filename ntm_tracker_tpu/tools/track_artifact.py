"""Per-round committed accuracy artifact: TRACK_r0N.json.

Runs the synthetic-video demo pipeline (fixed seed, fixed steps) for BOTH
memory cores on the live backend and records untrained/trained streaming
IoU — the machine-readable counterpart of PARITY.md's prose accuracy
numbers, emitted every round the way bench.py emits BENCH_r0N.json, so
accuracy regressions are driver-visible.

Also records the serving-precision probe (VERDICT r2 weak #6), per core:
with the TRAINED tracker at the backend's DEFAULT matmul precision
(bf16 on TPU — the configuration users actually serve), the host-geometry
streaming loop and the fully device-resident loop must stay on the same
trajectory; `serve_precision_max_px_drift` is the worst per-frame region
deviation in pixels.

All progress goes to stderr (bench.py's stdout contract is one JSON line).

Usage: python -m ntm_tracker_tpu.tools.track_artifact [--out TRACK.json]
       (or via bench.py, which derives the round number automatically)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _log(msg: str) -> None:
    print(f"track_artifact: {msg}", file=sys.stderr, flush=True)


def eval_iou(cfg, vgg, params, seed: int, frames_n: int):
    """Mean streaming-tracker IoU over a held-out synthetic clip — the
    demo's exact evaluation protocol (tracking/demo.py:eval_streaming_iou,
    shared so the artifact cannot diverge from the demo numbers)."""
    from ntm_tracker_tpu.tracking.demo import eval_streaming_iou, mean_clamped_iou

    return mean_clamped_iou(eval_streaming_iou(cfg, vgg, params, seed, frames_n))


def serve_precision_drift(cfg, core, vgg, params, seed: int,
                          frames_n: int = 12) -> float:
    """Max per-frame |region| deviation (px) between the host-geometry
    streaming loop and the device-resident loop at the backend's DEFAULT
    matmul precision, with the given (trained) weights."""
    import jax.numpy as jnp
    import numpy as np

    from ntm_tracker_tpu.data.synthetic import make_video
    from ntm_tracker_tpu.tracking.tracker import (
        StreamingTracker,
        make_device_track_step,
    )

    frames, boxes = make_video(np.random.RandomState(seed + 2000), frames_n)
    H, W = frames.shape[1:3]
    b0 = boxes[0]
    region0 = (b0[1] * W, b0[0] * H, (b0[3] - b0[1]) * W, (b0[2] - b0[0]) * H)

    host = StreamingTracker(cfg, vgg, params, core)
    host.init(frames[0], region0)
    host_regions = [host.track(frames[t]) for t in range(1, frames_n)]

    init_fn, step_fn = make_device_track_step(cfg, core, vgg, params)
    x, y, w, h = region0
    bbox = jnp.asarray(
        [[y / (H - 1), x / (W - 1), (y + h) / (H - 1), (x + w) / (W - 1)]],
        jnp.float32,
    )
    fdev = frames.astype(np.float32)
    state = init_fn(fdev[0:1], bbox, core.init_state(params, 1))
    drift = 0.0
    for t in range(1, frames_n):
        region, bbox, state = step_fn(fdev[t : t + 1], bbox, state)
        d = np.abs(np.asarray(region[0]) - np.asarray(host_regions[t - 1])).max()
        drift = max(drift, float(d))
    return drift


def run_core(core: str, train_steps: int, seed: int = 0,
             eval_frames: int = 40, drift_frames: int = 12) -> dict:
    import jax
    import numpy as np

    from ntm_tracker_tpu.models.core import make_core
    from ntm_tracker_tpu.models.vgg import init_vgg_params
    from ntm_tracker_tpu.tracking.demo import demo_config, training_batch
    from ntm_tracker_tpu.train.experiments import OffsetExperiment

    cfg = demo_config(core=core)
    rng = np.random.RandomState(seed)
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    mcore = make_core(cfg)
    exp = OffsetExperiment(cfg, vgg, core=mcore, image_mode="cropped")
    params, opt_state = exp.init(jax.random.PRNGKey(1))

    untrained = eval_iou(cfg, vgg, params, seed, eval_frames)
    _log(f"{core}: untrained IoU {untrained:.3f}")

    step = jax.jit(exp.make_train_step(), donate_argnums=(0, 1))
    t0 = time.perf_counter()
    m = None
    for i in range(train_steps):
        batch = training_batch(cfg, rng)
        params, opt_state, m = step(params, opt_state, batch)
        if i % 100 == 0:
            _log(f"{core}: step {i} loss {float(m['loss']):.4f}")
    if m is not None:
        float(m["loss"])  # value fetch = hard sync before timing (CLAUDE.md)
    train_s = time.perf_counter() - t0

    trained = eval_iou(cfg, vgg, params, seed, eval_frames)
    _log(f"{core}: trained IoU {trained:.3f} ({train_steps} steps, "
         f"{train_s:.0f}s)")
    out = {
        "core": core,
        "steps": train_steps,
        "untrained_iou": round(untrained, 4),
        "trained_iou": round(trained, 4),
        "train_seconds": round(train_s, 1),
    }
    drift = serve_precision_drift(cfg, mcore, vgg, params, seed,
                                  frames_n=drift_frames)
    out["serve_precision_max_px_drift"] = round(drift, 4)
    _log(f"{core}: serving-precision drift {drift:.4f} px "
         f"(host-loop vs device-loop, default matmul precision)")
    return out


def write_artifact(out_path: str, train_steps: int = 400,
                   eval_frames: int = 40, drift_frames: int = 12) -> dict:
    import jax

    artifact = {
        "platform": jax.devices()[0].platform,
        "device_kind": getattr(jax.devices()[0], "device_kind", ""),
        "train_steps": train_steps,
        "cores": [],
    }

    def dump():
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
            f.write("\n")

    for core in ("ntm", "dnc"):
        # dump incrementally so a driver-side timeout still leaves the
        # finished cores on disk
        artifact["cores"].append(
            run_core(core, train_steps,
                     eval_frames=eval_frames, drift_frames=drift_frames)
        )
        dump()
    _log(f"wrote {out_path}")
    return artifact


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TRACK.json")
    ap.add_argument("--train_steps", type=int, default=400)
    ap.add_argument("--eval_frames", type=int, default=40)
    ap.add_argument("--drift_frames", type=int, default=12)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    write_artifact(args.out, args.train_steps,
                   eval_frames=args.eval_frames,
                   drift_frames=args.drift_frames)
    return 0


if __name__ == "__main__":
    sys.exit(main())
