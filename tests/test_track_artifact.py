"""Smoke the per-round accuracy artifact (tools/track_artifact.py).

TRACK_r0N.json is a per-round driver deliverable produced by bench.py on
TPU; this CPU smoke executes the full write path at miniature sizes so a
break in the artifact tool cannot silently cost a round its accuracy
record. Both cores run, including the scene sweep and the
serving-precision drift probe (host-geometry loop vs device-resident
loop) with its one-step drift_step1_frac tripwire.
"""

import json

import numpy as np
import pytest

from ntm_tracker_tpu.tools.track_artifact import (
    STEP1_FRAC_MAX,
    serve_precision_drift,
    write_artifact,
)


def test_write_artifact_smoke(tmp_path):
    out = tmp_path / "TRACK_smoke.json"
    artifact = write_artifact(
        str(out), train_steps=1, eval_frames=3, drift_frames=3,
        scene_frames=3,
    )
    on_disk = json.loads(out.read_text())
    assert on_disk == artifact
    assert [c["core"] for c in artifact["cores"]] == ["ntm", "dnc"]
    for c in artifact["cores"]:
        assert c["steps"] == 1
        # aggregate IoU is clamped per frame (disjoint boxes score 0,
        # degenerate boxes at most 1), so means live in [0, 1]
        assert 0.0 <= c["untrained_iou"] <= 1.0
        assert 0.0 <= c["trained_iou"] <= 1.0
        # the scene sweep covers every synthetic variant, both phases
        assert [s["scene"] for s in c["scenes"]] == [
            "smooth", "scale", "fast", "texture"]
        for s in c["scenes"]:
            assert 0.0 <= s["untrained_iou"] <= 1.0
            assert 0.0 <= s["trained_iou"] <= 1.0
        # the drift probe runs for BOTH cores; on CPU at f32 the two loops
        # agree closely, so the one-step tripwire must be far from firing
        # (the full-trajectory pair is recorded but advisory)
        assert 0.0 <= c["drift_px"] < 1e3
        assert 0.0 <= c["drift_frac"] < 1e3
        assert 0.0 <= c["drift_step1_frac"] < STEP1_FRAC_MAX
        assert 0.0 <= c["drift_step1_px"] <= c["drift_px"] + 1e-9
        assert c["drift_breach"] is False
        assert c["train_seconds"] >= 0.0
    # the beyond-reference scale-head stage runs when no deadline squeezes
    # it (this smoke passes none): same record shape, ntm core, flagged
    sh = artifact["scale_head"]
    assert sh["core"] == "ntm" and sh["predict_scale"] is True
    assert [s["scene"] for s in sh["scenes"]] == [
        "smooth", "scale", "fast", "texture"]
    assert sh["drift_breach"] is False
    assert 0.0 <= sh["drift_step1_frac"] < STEP1_FRAC_MAX


@pytest.mark.slow
def test_trained_host_vs_device_trajectory_bound(tmp_path):
    """VERDICT r3 weak #5: with TRAINED weights at the backend's default
    matmul precision, the host-geometry loop and the device-resident loop
    must stay on the same trajectory, with a pinned bound. On CPU both
    paths compile to f32 programs, so the bound is tight; on TPU the
    artifact's one-step tripwire (STEP1_FRAC_MAX) carries the bf16
    version."""
    import jax

    from ntm_tracker_tpu.models.core import make_core
    from ntm_tracker_tpu.models.vgg import init_vgg_params
    from ntm_tracker_tpu.tracking.demo import demo_config, training_batch
    from ntm_tracker_tpu.train.experiments import OffsetExperiment

    cfg = demo_config()
    rng = np.random.RandomState(0)
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    core = make_core(cfg)
    exp = OffsetExperiment(cfg, vgg, core=core, image_mode="cropped")
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    step = jax.jit(exp.make_train_step(), donate_argnums=(0, 1))
    for _ in range(25):
        params, opt_state, _ = step(params, opt_state, training_batch(cfg, rng))

    drift_px, drift_frac, step1_px, step1_frac = serve_precision_drift(
        cfg, core, vgg, params, seed=0, frames_n=6
    )
    # trained (contractive) weights, identical f32 numerics: the two loops
    # are the same trajectory to rounding noise
    assert drift_px < 0.1, (drift_px, drift_frac)
    assert drift_frac < 1e-3, (drift_px, drift_frac)
    assert step1_px <= drift_px + 1e-9, (step1_px, drift_px)
    assert step1_frac < STEP1_FRAC_MAX, (step1_px, step1_frac)
