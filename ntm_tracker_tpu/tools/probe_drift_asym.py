"""Explain the NTM-vs-DNC serving trajectory-drift asymmetry by measurement.

TRACK_r04 measured the host-loop vs device-loop TRAJECTORY drift at
0.12-0.21 of the gt-box diagonal for the trained NTM but only ~0.004 for
the trained DNC — a 30-50x asymmetry with no recorded explanation
(VERDICT r4 weak #4). Both loops share the same frame_fn
(tracking/tracker.py), so the only numeric seams are (a) the crop
(host gather f32 vs device matmul at HIGHEST — 1.2e-7 apart), (b) the
two separately compiled programs' bf16 matmul rounding, and (c) for the
NTM at B=1 on TPU only, the fused Pallas inference kernel
(cfg.fused_inference auto).

This probe trains the demo config once per core (the TRACK protocol),
then measures serve_precision_drift under controlled numeric variants:

  dnc  baseline       — the reference point (~0.004 in r4)
  ntm  baseline       — auto kernel selection (fused at B=1), default
                        matmul precision: what TRACK records
  ntm  jnp-scan       — fused_inference=False: both loops on the jnp
                        scan; isolates the fused kernel's contribution
  ntm  cell-f32       — jnp scan + cfg.cell_matmul_precision="highest":
                        cell matmuls f32-exact, VGG still bf16; if drift
                        collapses to DNC levels, the amplifier is bf16
                        rounding inside the 65 cell steps; if not, it is
                        VGG program divergence amplified by the recrop
                        feedback
  ntm  all-f32        — jax.default_matmul_precision("highest") around
                        everything: the floor (crop seam only)

Each variant reports (trajectory px, trajectory frac, step1 px, step1
frac) over two seeds (the r4 lesson: single-seed trajectory drift is
seed luck). One JSON line to stdout; progress to stderr.

Usage: python -m ntm_tracker_tpu.tools.probe_drift_asym [train_steps]
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

from ntm_tracker_tpu.utils.compcache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

import jax  # noqa: E402

from ntm_tracker_tpu.models.core import make_core  # noqa: E402
from ntm_tracker_tpu.models.vgg import init_vgg_params  # noqa: E402
from ntm_tracker_tpu.tools.track_artifact import (  # noqa: E402
    serve_precision_drift,
)
from ntm_tracker_tpu.tracking.demo import (  # noqa: E402
    demo_config,
    training_batch,
)
from ntm_tracker_tpu.train.experiments import (  # noqa: E402
    OffsetExperiment,
    train_step_with_bptt_fallback,
)

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 400
SEEDS = (0, 1)


def log(m):
    print(f"probe_drift_asym: {m}", file=sys.stderr, flush=True)


def train(core: str):
    cfg = demo_config(core=core)
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    exp = OffsetExperiment(cfg, vgg, image_mode="cropped")
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    step = train_step_with_bptt_fallback(exp)
    rng = np.random.RandomState(0)
    t0 = time.time()
    for i in range(STEPS):
        params, opt_state, m = step(params, opt_state, training_batch(cfg, rng))
        if i % 100 == 0:
            log(f"[{core}] step {i} loss {float(m['loss']):.4f}")
    log(f"[{core}] trained {STEPS} steps in {time.time() - t0:.0f}s")
    return cfg, vgg, params


def measure(name: str, cfg, vgg, params, highest_everywhere=False):
    core = make_core(cfg)
    rows = []
    for seed in SEEDS:
        if highest_everywhere:
            with jax.default_matmul_precision("highest"):
                d = serve_precision_drift(cfg, core, vgg, params, seed)
        else:
            d = serve_precision_drift(cfg, core, vgg, params, seed)
        rows.append(d)
        log(f"{name} seed {seed}: trajectory {d[0]:.4f} px ({d[1]:.4f}), "
            f"step1 {d[2]:.4f} px ({d[3]:.4f})")
    return {
        "trajectory_px": [round(r[0], 4) for r in rows],
        "trajectory_frac": [round(r[1], 4) for r in rows],
        "step1_px": [round(r[2], 4) for r in rows],
        "step1_frac": [round(r[3], 4) for r in rows],
    }


def main() -> int:
    out = {"train_steps": STEPS, "seeds": list(SEEDS),
           "platform": jax.devices()[0].platform}

    cfg_d, vgg_d, params_d = train("dnc")
    out["dnc_baseline"] = measure("dnc baseline", cfg_d, vgg_d, params_d)

    cfg, vgg, params = train("ntm")
    out["ntm_baseline"] = measure("ntm baseline", cfg, vgg, params)

    cfg_jnp = dataclasses.replace(cfg, fused_inference=False)
    out["ntm_jnp_scan"] = measure("ntm jnp-scan", cfg_jnp, vgg, params)

    cfg_cell = dataclasses.replace(cfg, fused_inference=False,
                                   cell_matmul_precision="highest")
    out["ntm_cell_f32"] = measure("ntm cell-f32", cfg_cell, vgg, params)

    out["ntm_all_f32"] = measure("ntm all-f32", cfg_jnp, vgg, params,
                                 highest_everywhere=True)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
