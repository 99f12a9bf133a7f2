"""Decompose the device-resident-loop gap (VERDICT r3 weak #3).

BENCH_r03: device_loop_frames_per_sec 4,857 vs 7,961.9 for the host-loop
headline — 39% slower, despite the device loop being "the true end-to-end
number". The headline feeds PRE-CROPPED 224x224 crops; the device loop adds
(a) the full-frame [B,360,640,3] crop_and_resize gather, (b) the recrop
geometry, per frame. This probe times each piece at the headline's best
batch, and prototypes a separable MATMUL bilinear crop (axis-aligned boxes
factor into out = Wy @ img @ Wx^T with 2-nonzero-per-row interp matrices —
MXU work instead of HBM-bound gathers) at several precisions.

MEASURED (v5e, B=256, round 4) — gap CLOSED by the matmul crop
(crop_and_resize_mm, now make_device_track_step's crop):

    frame_step (headline work)   32.27 ms   7,934 f/s
    device loop, matmul crop     35.24 ms   7,264 f/s   (r3 gather loop:
                                            52.7 ms / 4,857 f/s — +50%)

i.e. the full closed loop now runs within 8.4% of the crop-free headline
step; the gather crop was ~20 ms/step of HBM-bound gathers, the matmul
crop ~3 ms of MXU work. Precision sweep of the crop (max|err| vs the
gather form, fraction of the 255 scale): default/bf16 6.7e-3,
HIGH 4.2e-5 (production choice), HIGHEST 1.2e-7. NOTE: the standalone
crop timings this probe prints are TUNNEL-SYNC bound (the sync fetches
the full [256,224,224,3] crop, ~154 MB, over the tunneled link) — use
the loop-level numbers for compute comparisons.

Usage: python -m ntm_tracker_tpu.tools.probe_devloop [--batch 256]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _time_fn(fn, *args, iters: int = 20, passes: int = 3,
             donate_idx=None) -> float:
    import jax

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    B, H, W = args.batch, 360, 640

    import jax
    import jax.numpy as jnp

    from ntm_tracker_tpu.config import TrackerConfig, TrainConfig
    from ntm_tracker_tpu.data.image_ops import crop_and_resize
    from ntm_tracker_tpu.models.core import make_core
    from ntm_tracker_tpu.models.vgg import init_vgg_params
    from ntm_tracker_tpu.tracking.tracker import (
        build_frame_step,
        make_device_track_step,
    )

    cfg = TrackerConfig(core="ntm", compute_dtype=jnp.bfloat16,
                        train=TrainConfig(batch_size=1, sequence_length=20))
    core = make_core(cfg)
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)

    rng = np.random.RandomState(1)
    nb = min(B, 16)
    block = (rng.rand(nb, H, W, 3) * 255).astype(np.float32)
    frames = jnp.asarray(
        np.tile(block, (-(-B // nb), 1, 1, 1))[:B] if B > nb else block)
    bbox = jnp.tile(jnp.asarray([[0.3, 0.3, 0.6, 0.6]], jnp.float32), (B, 1))
    crops224 = jnp.asarray(
        rng.rand(B, 224, 224, 3).astype(np.float32) * 150 - 75)

    # -- components ----------------------------------------------------------
    _, step_rest = build_frame_step(cfg, core, vgg, params, donate_state=False)
    state = core.init_state(params, B)
    ms_frame = _time_fn(lambda c, s: step_rest(c, s), crops224, state)
    print(f"frame_step (headline work) : {ms_frame:7.2f} ms  "
          f"{B / ms_frame * 1e3:8.0f} f/s")

    init_fn, step_fn = make_device_track_step(cfg, core, vgg, params)
    st = init_fn(frames, bbox, core.init_state(params, B))
    ms_loop = _time_fn(lambda f, b, s: step_fn(f, b, s), frames, bbox, st)
    print(f"device loop (full step)    : {ms_loop:7.2f} ms  "
          f"{B / ms_loop * 1e3:8.0f} f/s")

    crop_g = jax.jit(
        lambda f, b: crop_and_resize(f, b, (224, 224)))
    ms_crop = _time_fn(crop_g, frames, bbox)
    print(f"crop_and_resize gather     : {ms_crop:7.2f} ms")

    # -- separable matmul crop prototype --------------------------------------
    def interp_matrix(lo, hi, out_n, size):
        # [out_n, size] bilinear weights for samples lo*(size-1)..hi*(size-1)
        coords = lo * (size - 1) + jnp.arange(out_n, dtype=jnp.float32)[
            :, None] * ((hi - lo) * (size - 1) / (out_n - 1))[None]
        # coords: [out_n, B] -> [B, out_n]
        coords = coords.T
        grid = jnp.arange(size, dtype=jnp.float32)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - grid))
        valid = (coords >= 0) & (coords <= size - 1)
        return w * valid[..., None], valid

    def crop_mm(frames, boxes, out_hw=(224, 224), precision="default"):
        y1, x1, y2, x2 = (boxes[:, i] for i in range(4))
        Wy, vy = interp_matrix(y1, y2, out_hw[0], H)   # [B,224,H]
        Wx, vx = interp_matrix(x1, x2, out_hw[1], W)   # [B,224,W]
        f = frames.astype(jnp.float32)
        tmp = jnp.einsum("biy,byxc->bixc", Wy, f, precision=precision)
        out = jnp.einsum("bjx,bixc->bijc", Wx, tmp, precision=precision)
        return out * (vy[:, :, None, None] & vx[:, None, :, None])

    for prec in ("default", "high", "highest"):
        f_mm = jax.jit(lambda f, b, p=prec: crop_mm(f, b, precision=p))
        ms_mm = _time_fn(f_mm, frames, bbox)
        ref = np.asarray(crop_g(frames[:8], bbox[:8]))
        got = np.asarray(f_mm(frames[:8], bbox[:8]))
        err = np.abs(got - ref).max() / 255.0
        print(f"crop matmul [{prec:7s}]    : {ms_mm:7.2f} ms   "
              f"max|err| {err:.2e} of full scale")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
