"""Re-measure the fused-BPTT vs XLA training knee now that the batch-tiled
grid removed the B>32 compile ceiling (scan_bptt.py, r4).

For each batch size, times ONE full gradient step of an MSE-style loss
through the whole T=1300 BPTT (the train-offsets shape: 20 sequences x 65
serialized steps) for both paths:

  fused: ntm_tracker_unroll(..., fused_bptt=True) — residual-streaming
         Pallas forward + hand-derived Pallas backward on a
         (B/BATCH_TILE, T) grid
  xla:   the default remat lax.scan, jax.grad (the r3 knee winner at 256)

Sync is by value fetch (float(loss)), never block_until_ready — see
CLAUDE.md's axon-tunnel rule. Prints one JSON line per (path, B).

Usage: python -m ntm_tracker_tpu.tools.bench_bptt_knee
         [--batches 32,64,128,256] [--seq 1300] [--iters 5]
         [--tile 32]   (override scan_bptt.BATCH_TILE for tile sweeps)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128,256")
    ap.add_argument("--seq", type=int, default=1300)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tile", type=int, default=None)
    ap.add_argument("--paths", default="fused,xla")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ntm_tracker_tpu.config import NTMConfig
    from ntm_tracker_tpu.models.ntm_cell import (
        init_ntm_params,
        init_ntm_state,
    )
    from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll
    from ntm_tracker_tpu.ops.pallas import scan_bptt

    if args.tile is not None:
        scan_bptt.BATCH_TILE = args.tile

    cfg = NTMConfig()  # flagship (the config of scan_bptt.py's r3 table)
    IN = 514
    T = args.seq
    params = init_ntm_params(jax.random.PRNGKey(0), cfg, IN)

    def make_loss(fused: bool):
        def loss(p, tokens, state):
            _, logits, final = ntm_tracker_unroll(
                p, cfg, tokens, state=state, remat=not fused,
                fused_bptt=fused,
            )
            return jnp.mean(logits**2) + jnp.mean(final["M"] ** 2)

        return jax.jit(jax.grad(loss))

    for B in [int(b) for b in args.batches.split(",")]:
        rs = np.random.RandomState(B)
        tokens = jnp.asarray(
            0.3 * rs.standard_normal((B, T, IN)).astype(np.float32))
        state = init_ntm_state(params, cfg, B)
        for path in args.paths.split(","):
            fn = make_loss(fused=(path == "fused"))
            try:
                sync = lambda g: float(
                    jnp.ravel(jax.tree_util.tree_leaves(g)[0])[0])
                t0 = time.perf_counter()
                sync(fn(params, tokens, state))
                compile_s = time.perf_counter() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        g = fn(params, tokens, state)
                    sync(g)
                    best = min(best, (time.perf_counter() - t0) / args.iters)
                print(json.dumps({
                    "path": path, "B": B, "T": T,
                    "tile": scan_bptt.BATCH_TILE if path == "fused" else None,
                    "grad_step_ms": round(best * 1e3, 2),
                    "frames_per_sec": round(B * T / 65 / best, 1),
                    "compile_s": round(compile_s, 1),
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "path": path, "B": B, "T": T,
                    "error": f"{type(e).__name__}: {e}"[:300],
                }), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
