"""Measure the scale head (TrackerConfig.predict_scale) per-scene IoU payoff.

Trains the demo config twice (offsets-only vs predict_scale, same seed,
same budget) and evaluates all synthetic scenes with the streaming
tracker — the apples-to-apples comparison behind the predict_scale
verdict in PARITY.md. Also checks the fused Pallas inference kernel at
output_dim=3 against the jnp scan before relying on it (the B=1
streaming eval auto-selects the fused kernel on TPU).

Usage: python -m ntm_tracker_tpu.tools.bench_scale_head [steps]
Prints one JSON line: {"steps", "offsets_only": {scene: iou},
"predict_scale": {scene: iou}}; progress goes to stderr.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ntm_tracker_tpu.utils.compcache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from ntm_tracker_tpu.data.synthetic import SCENES
from ntm_tracker_tpu.models.vgg import init_vgg_params
from ntm_tracker_tpu.tracking.demo import (
    demo_config,
    eval_streaming_iou,
    mean_clamped_iou,
    training_batch,
)
from ntm_tracker_tpu.train.experiments import OffsetExperiment

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 400
SCALE_RANGE = float(sys.argv[2]) if len(sys.argv) > 2 else 0.15
# closed-loop fine-tune steps (ActiveResizeExperiment) after the open-loop
# training; 0 disables. The closed loop trains on the model's OWN drift —
# the residual-scale distribution inference actually sees.
FINETUNE = int(sys.argv[3]) if len(sys.argv) > 3 else 0


def log(m):
    print(m, file=sys.stderr, flush=True)


# --- fused kernel parity at O=3 (B=1 TPU streaming auto-selects it) -----
cfg3 = demo_config(predict_scale=True)
vgg = init_vgg_params(jax.random.PRNGKey(0))
from ntm_tracker_tpu.models.core import make_core
from ntm_tracker_tpu.train.serialize import serialize_streaming_batch
from ntm_tracker_tpu.ops.pallas.scan_cell import ntm_scan_fused

core3 = make_core(cfg3)
params3 = core3.init_params(jax.random.PRNGKey(1), cfg3.input_depth)
toks = jax.random.normal(jax.random.PRNGKey(2), (1, cfg3.num_features, cfg3.feature_depth))
stream = serialize_streaming_batch(toks, None, delimiter_first=False)
state0 = core3.init_state(params3, 1)


def jnp_path(stream, state):
    def body(c, x):
        logit, s = core3.step(params3, x, c)
        return s, logit
    fs, logits = jax.lax.scan(body, state, jnp.swapaxes(stream, 0, 1))
    return logits[-1], fs


ref_logit, _ = jax.jit(jnp_path)(stream, state0)
fused_bt, _ = jax.jit(
    lambda s, st: ntm_scan_fused(params3, cfg3.ntm, s, st,
                                 compute_dtype=cfg3.compute_dtype)
)(stream, state0)
err = float(jnp.max(jnp.abs(fused_bt[:, -1] - ref_logit)))
log(f"fused-kernel O=3 parity: max|diff|={err:.3e}")
assert err < 1e-4, err


def train_and_eval(predict_scale: bool):
    cfg = demo_config(predict_scale=predict_scale, scale_range=SCALE_RANGE)
    exp = OffsetExperiment(cfg, vgg, image_mode="cropped")
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    step = jax.jit(exp.make_train_step(), donate_argnums=(0, 1))
    rng = np.random.RandomState(0)
    t0 = time.time()
    for i in range(STEPS):
        params, opt_state, m = step(params, opt_state, training_batch(cfg, rng))
        if i % 100 == 0:
            log(f"  [{'scale' if predict_scale else 'ref'}] step {i} "
                f"loss {float(m['loss']):.4f}")
    log(f"  trained {STEPS} steps in {time.time()-t0:.0f}s")
    out = {}
    for scene in SCENES:
        iou = mean_clamped_iou(
            eval_streaming_iou(cfg, vgg, params, 0, 40, scene=scene))
        out[scene] = round(iou, 4)
        log(f"  [{'scale' if predict_scale else 'ref'}] scene {scene}: "
            f"IoU {iou:.4f}")
    if predict_scale:
        out["diag"] = diagnose(cfg, exp, params)
        # damped decode: serve with a smaller effective log-scale range
        # than trained (gain = serve_range/train_range) — the control-
        # theory fix for a weak, lagged ds response whose phase inverts
        # on an oscillating target (diag area_corr < 0)
        import dataclasses
        for serve_range in (0.05, 0.02):
            dcfg = dataclasses.replace(cfg, scale_range=serve_range)
            damped = {}
            for scene in ("smooth", "scale"):
                iou = mean_clamped_iou(
                    eval_streaming_iou(dcfg, vgg, params, 0, 40, scene=scene))
                damped[scene] = round(iou, 4)
                log(f"  [scale,damped {serve_range}] scene {scene}: "
                    f"IoU {iou:.4f}")
            out[f"damped_{serve_range}"] = damped
    return out, params, cfg


def diagnose(cfg, exp, params):
    """Is the ds output signal or noise? (1) pred-vs-target correlation of
    EVERY head channel on held-out training-style batches; (2) on the
    scale-scene eval, correlation of the TRACKED box area with the gt
    area over frames (does the closed loop actually follow size?)."""
    from ntm_tracker_tpu.data.synthetic import make_scene
    from ntm_tracker_tpu.tracking.tracker import StreamingTracker

    rng = np.random.RandomState(123)
    preds, tgts = [], []
    eval_fn = jax.jit(lambda p, b: exp.loss_fn(p, b)[1]["pred_offsets"])
    for _ in range(8):
        b = training_batch(cfg, rng)
        p = np.asarray(eval_fn(params, b))  # [B, L-1, 3]
        B, Lm1 = p.shape[:2]
        L = Lm1 + 1
        t = np.stack([b["y_offsets"], b["x_offsets"], b["scales"]],
                     axis=1).reshape(B, L, 3)[:, 1:]
        preds.append(p.reshape(-1, 3))
        tgts.append(t.reshape(-1, 3))
    preds = np.concatenate(preds)
    tgts = np.concatenate(tgts)
    corr = [float(np.corrcoef(preds[:, i], tgts[:, i])[0, 1])
            for i in range(3)]
    log(f"  [scale] pred-target correlation dy={corr[0]:.3f} "
        f"dx={corr[1]:.3f} ds={corr[2]:.3f}")

    frames, boxes = make_scene(np.random.RandomState(1000), 40, scene="scale")
    H, W = frames.shape[1:3]
    tr = StreamingTracker(cfg, vgg, params)
    b0 = boxes[0]
    tr.init(frames[0], (b0[1] * W, b0[0] * H,
                        (b0[3] - b0[1]) * W, (b0[2] - b0[0]) * H))
    pred_area, gt_area = [], []
    for t in range(1, 40):
        x, y, w, h = tr.track(frames[t])
        pred_area.append(w * h)
        gt = boxes[t]
        gt_area.append((gt[3] - gt[1]) * W * (gt[2] - gt[0]) * H)
    area_corr = float(np.corrcoef(pred_area, gt_area)[0, 1])
    log(f"  [scale] tracked-area vs gt-area corr on scale scene: "
        f"{area_corr:.3f}")
    return {"corr_dy": round(corr[0], 3), "corr_dx": round(corr[1], 3),
            "corr_ds": round(corr[2], 3), "area_corr": round(area_corr, 3)}


def closed_loop_finetune(cfg, params, steps: int):
    """Fine-tune the trained cell in the CLOSED loop (active-resize
    trainer): each frame is recropped around the model's own previous
    prediction, so the ds supervision is the residual scale error — the
    distribution inference actually sees (the open-loop offsets pipeline
    trains on cumulative drift vs a fixed frame-0 crop instead)."""
    from ntm_tracker_tpu.data.synthetic import make_video
    from ntm_tracker_tpu.train.active_resize import ActiveResizeExperiment

    exp = ActiveResizeExperiment(cfg, vgg)
    ft_params = {"core": params}
    _, opt_state = exp.init(jax.random.PRNGKey(9))
    opt_state = jax.tree.map(jnp.zeros_like, opt_state)  # fresh optimizer
    step = jax.jit(exp.make_train_step(), donate_argnums=(0, 1))
    rng = np.random.RandomState(7)
    B, L = cfg.train.batch_size, cfg.train.sequence_length
    H, W = 96, 160
    t0 = time.time()
    for i in range(steps):
        frames = np.zeros((B, L, H, W, 3), np.float32)
        boxes = np.zeros((B, L, 4), np.float32)
        for b in range(B):
            frames[b], boxes[b] = make_video(
                rng, L, (H, W), velocity=True, scale_walk=True)
        batch = {"frames": frames, "bboxes": boxes}
        ft_params, opt_state, m = step(ft_params, opt_state, batch)
        if i % 50 == 0:
            log(f"  [closed-loop] step {i} loss {float(m['loss']):.4f}")
    log(f"  closed-loop fine-tuned {steps} steps in {time.time()-t0:.0f}s")
    out = {}
    for scene in SCENES:
        iou = mean_clamped_iou(
            eval_streaming_iou(cfg, vgg, ft_params["core"], 0, 40,
                               scene=scene))
        out[scene] = round(iou, 4)
        log(f"  [closed-loop] scene {scene}: IoU {iou:.4f}")
    return out


log("=== offsets-only head (reference contract) ===")
ref, _, _ = train_and_eval(False)
log("=== predict_scale head ===")
scale, params_s, cfg_s = train_and_eval(True)
result = {"steps": STEPS, "scale_range": SCALE_RANGE,
          "offsets_only": ref, "predict_scale": scale}
if FINETUNE:
    log("=== closed-loop fine-tune (predict_scale) ===")
    result["closed_loop"] = closed_loop_finetune(cfg_s, params_s, FINETUNE)
import json
print(json.dumps(result))
