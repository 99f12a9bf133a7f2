"""Int8 serving accuracy on a TRAINED canonical-config tracker.

Trains a small NTM tracker at the CANONICAL serving config (224 crop,
64-token conv4_3 grid, feature_points=None — the only config where the
fast/int8 paths engage) on synthetic video, then evaluates the trained
weights through the real StreamingTracker with the exact f32 path vs the
opt-in int8 path (models/vgg_int8.py). Prints one JSON line; progress
goes to stderr.

Usage: python -m ntm_tracker_tpu.tools.int8_accuracy [steps] [eval_frames]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time


def main(steps: int = 300, eval_frames: int = 40) -> dict:
    import jax
    import numpy as np

    from ntm_tracker_tpu.config import NTMConfig, TrackerConfig, TrainConfig
    from ntm_tracker_tpu.models.core import make_core
    from ntm_tracker_tpu.models.vgg import init_vgg_params
    from ntm_tracker_tpu.tracking.demo import (
        eval_streaming_iou,
        mean_clamped_iou,
        training_batch,
    )
    from ntm_tracker_tpu.train.experiments import OffsetExperiment

    cfg = TrackerConfig(
        ntm=NTMConfig(output_dim=2, mem_size=64, mem_dim=12,
                      controller_hidden_size=100, read_head_size=4),
        train=TrainConfig(batch_size=4, sequence_length=8, learning_rate=1e-4),
    )
    assert cfg.data.crop_size == 224 and cfg.feature_points is None

    rng = np.random.RandomState(0)
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    core = make_core(cfg)
    exp = OffsetExperiment(cfg, vgg, core=core, image_mode="cropped")
    params, opt_state = exp.init(jax.random.PRNGKey(1))

    step = jax.jit(exp.make_train_step(), donate_argnums=(0, 1))
    t0 = time.perf_counter()
    m = None
    for i in range(steps):
        batch = training_batch(cfg, rng)
        params, opt_state, m = step(params, opt_state, batch)
        if i % 50 == 0:
            print(f"step {i} loss {float(m['loss']):.4f}", file=sys.stderr,
                  flush=True)
    if m is not None:
        float(m["loss"])  # value fetch = hard sync before timing (CLAUDE.md)
    train_s = time.perf_counter() - t0

    iou_f32 = mean_clamped_iou(
        eval_streaming_iou(cfg, vgg, params, 0, eval_frames))
    cfg8 = dataclasses.replace(cfg, vgg_int8=True)
    iou_int8 = mean_clamped_iou(
        eval_streaming_iou(cfg8, vgg, params, 0, eval_frames))

    result = {
        "platform": jax.devices()[0].platform,
        "steps": steps,
        "train_seconds": round(train_s, 1),
        "eval_frames": eval_frames,
        "trained_iou_f32": round(iou_f32, 4),
        "trained_iou_int8": round(iou_int8, 4),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 300,
        int(sys.argv[2]) if len(sys.argv) > 2 else 40,
    )
