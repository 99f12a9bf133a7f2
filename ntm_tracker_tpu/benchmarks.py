"""Headline benchmark body — see repo-root bench.py for the driver
entry point and metric definition."""


import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ntm_tracker_tpu.config import TrackerConfig, TrainConfig
    from ntm_tracker_tpu.models.core import make_core
    from ntm_tracker_tpu.models.vgg import init_vgg_params
    from ntm_tracker_tpu.tracking.tracker import build_frame_step

    dev = jax.devices()[0]
    platform = dev.platform

    cfg = TrackerConfig(core="ntm", compute_dtype=jnp.bfloat16,
                        train=TrainConfig(batch_size=1, sequence_length=20))
    core = make_core(cfg)
    vgg_params = init_vgg_params(jax.random.PRNGKey(0))
    params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)

    rng = np.random.RandomState(0)

    def bench_batch(B, iters, warmup=3):
        _, step_rest = build_frame_step(
            cfg, core, vgg_params, params, donate_state=True
        )
        crops = jnp.asarray(
            rng.rand(B, 224, 224, 3).astype(np.float32) * 150 - 75
        )
        state = core.init_state(params, B)
        # warmup (compile)
        for _ in range(warmup):
            _, state = step_rest(crops, state)
        jax.block_until_ready(state["M"] if isinstance(state, dict) else state)
        t0 = time.perf_counter()
        for _ in range(iters):
            offsets, state = step_rest(crops, state)
        jax.block_until_ready(offsets)
        dt = time.perf_counter() - t0
        return B * iters / dt, dt / iters

    # throughput at large batch (many concurrent tracks per chip)
    if platform == "cpu":  # CI smoke: tiny sizes
        throughput, _ = bench_batch(B=4, iters=3, warmup=1)
        lat_ms = float("nan")
        device_ms = float("nan")
    else:
        best = 0.0
        for B in (128, 256, 512):
            fps, _ = bench_batch(B, iters=20)
            best = max(best, fps)
        throughput = best
        # p50 per-frame latency at B=1 (single-stream tracking)
        _, step_rest = build_frame_step(
            cfg, core, vgg_params, params, donate_state=True
        )
        crop1 = jnp.asarray(rng.rand(1, 224, 224, 3).astype(np.float32))
        state = core.init_state(params, 1)
        _, state = step_rest(crop1, state)  # compile
        lats = []
        for _ in range(50):
            t0 = time.perf_counter()
            offsets, state = step_rest(crop1, state)
            jax.block_until_ready(offsets)
            lats.append(time.perf_counter() - t0)
        # round-trip latency includes the host<->device link (on a tunneled
        # dev chip that dominates); also report pipelined per-frame device
        # time, the steady-state streaming number
        lat_ms = float(np.percentile(lats, 50) * 1e3)
        t0 = time.perf_counter()
        for _ in range(50):
            offsets, state = step_rest(crop1, state)
        jax.block_until_ready(offsets)
        device_ms = (time.perf_counter() - t0) / 50 * 1e3

    result = {
        "metric": "tracked_frames_per_sec_per_chip",
        "value": round(float(throughput), 1),
        "unit": "frames/s",
        "vs_baseline": round(float(throughput) / 1000.0, 3),
        "p50_frame_latency_ms": round(lat_ms, 3) if lat_ms == lat_ms else None,
        "pipelined_frame_ms_b1": round(device_ms, 3) if device_ms == device_ms else None,
        "platform": platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
