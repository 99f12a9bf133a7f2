"""Training-step throughput: image path vs feature-cache path.

Measures the full jitted train step (loss + BPTT through the
L*(F+1)-step scan + RMSProp update) at the flagship config
(direct_offset_output.py:21-49 scaled to a production batch), with the
batch either as decoded crops (the reference's every-step-VGG structure)
or as precomputed tokens (train-offsets --feature_cache).

Usage: python -m ntm_tracker_tpu.tools.bench_train [--batch 32] [--bf16]
       [--core dnc]   (measure the DNC-core twin of the same pipeline)
Prints one JSON line per mode.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq_len", type=int, default=20)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--modes", default="images,tokens")
    ap.add_argument("--core", default="ntm", choices=("ntm", "dnc"))
    ap.add_argument("--dnc_remat_chunk", type=int, default=None,
                    help="override dnc_unroll's carry-saving chunk "
                    "(default: auto; 0 = plain per-step saving)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from ntm_tracker_tpu.config import TrackerConfig, TrainConfig
    from ntm_tracker_tpu.models.vgg import init_vgg_params
    from ntm_tracker_tpu.train.experiments import (
        OffsetExperiment,
        synthetic_cached_batch,
        synthetic_offset_batch,
    )

    cfg = TrackerConfig(
        core=args.core,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        train=TrainConfig(batch_size=args.batch, sequence_length=args.seq_len),
    )
    if args.dnc_remat_chunk is not None:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, dnc=dataclasses.replace(cfg.dnc,
                                         remat_chunk=args.dnc_remat_chunk))
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    exp = OffsetExperiment(cfg, vgg, image_mode="cropped")
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    step = jax.jit(exp.make_train_step(), donate_argnums=(0, 1))

    rng = np.random.RandomState(0)
    n = args.batch * args.seq_len
    modes = {m for m in args.modes.split(",") if m}
    unknown = modes - {"images", "tokens"}
    if unknown or not modes:
        raise SystemExit(f"--modes must name 'images' and/or 'tokens', got "
                         f"{args.modes!r}")
    batches = {}
    if "images" in modes:
        # only generate the multi-GB [B*L,224,224,3] crop batch when the
        # images mode actually runs (synthetic_cached_batch builds its own)
        raw = synthetic_offset_batch(cfg, rng)
        batches["images"] = {k: jnp.asarray(v) for k, v in raw.items()}
    if "tokens" in modes:
        batches["tokens"] = synthetic_cached_batch(cfg, rng)

    for mode, batch in batches.items():
        # fresh copies per mode: the step donates its params/opt_state
        p = jax.tree.map(jnp.array, params)
        o = jax.tree.map(jnp.array, opt_state)
        p, o, m = step(p, o, batch)  # compile
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            p, o, m = step(p, o, batch)
        # fetch the value rather than block_until_ready: on the tunneled
        # dev backend the latter has been observed to return before the
        # enqueued chain finishes, reporting impossible times
        float(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "mode": mode,
            "step_ms": round(dt * 1e3, 2),
            "frames_per_sec": round(n / dt, 1),
            "batch": args.batch,
            "seq_len": args.seq_len,
            "compute_dtype": "bfloat16" if args.bf16 else "float32",
            "core": args.core,
            "platform": jax.devices()[0].platform,
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
