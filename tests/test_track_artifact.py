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
    DEVICE_IOU_GAP_MAX,
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
        # device-loop serving ACCURACY: per-scene device_iou + the
        # host-vs-device gap tripwire (on CPU both loops are f32 — the
        # gap must be far from the bound)
        assert 0.0 <= c["device_iou"] <= 1.0
        assert all(0.0 <= s["device_iou"] <= 1.0 for s in c["scenes"])
        assert c["device_iou_gap"] < DEVICE_IOU_GAP_MAX
        assert c["device_iou_breach"] is False
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


def test_budget_floor_truncates_honestly():
    """A deadline-starved training below the _MIN_TRAIN_STEPS floor must
    record budget_truncated and NO trained-accuracy fields (the r4 driver
    run committed a 10-step "trained IoU 0.096 < untrained 0.106" entry)."""
    import time

    from ntm_tracker_tpu.tools.track_artifact import run_core

    rec = run_core("ntm", train_steps=400, eval_frames=3, drift_frames=3,
                   scene_frames=3, deadline=time.time())  # already expired
    assert rec["budget_truncated"] is True
    assert 0 < rec["steps"] < 200
    assert "trained_iou" not in rec
    assert all("trained_iou" not in s for s in rec["scenes"])
    # untrained numbers and the implementation tripwire stay recorded
    assert 0.0 <= rec["untrained_iou"] <= 1.0
    assert "drift_step1_frac" in rec


class TestOverwriteGuard:
    """write_artifact must not replace a committed artifact with a
    lower-fidelity (fewer-steps) record unless forced (r4: a 10-step
    driver record overwrote the committed 400-step one)."""

    def _stub_run_core(self, steps):
        def run(core, train_steps, flush=None, predict_scale=False,
                label=None, **kw):
            rec = {"core": core, "steps": steps, "untrained_iou": 0.1,
                   "trained_iou": 0.5, "train_seconds": 0.0, "scenes": [],
                   "drift_px": 0.0, "drift_frac": 0.0,
                   "drift_step1_px": 0.0, "drift_step1_frac": 0.0,
                   "drift_breach": False}
            if predict_scale:
                rec["predict_scale"] = True
            if flush is not None:
                flush(rec)
            return rec
        return run

    def _existing(self, path, steps=400):
        path.write_text(json.dumps(
            {"cores": [{"core": "ntm", "steps": steps},
                       {"core": "dnc", "steps": steps}]}))

    def test_refuses_lower_fidelity(self, tmp_path, monkeypatch):
        import ntm_tracker_tpu.tools.track_artifact as ta

        out = tmp_path / "TRACK.json"
        self._existing(out, steps=400)
        before = out.read_text()
        monkeypatch.setattr(ta, "run_core", self._stub_run_core(10))
        ta.write_artifact(str(out), train_steps=10)
        assert out.read_text() == before  # the good artifact survives
        partial = json.loads((tmp_path / "TRACK.json.partial").read_text())
        assert partial["cores"][0]["steps"] == 10

    def test_promotes_equal_or_better(self, tmp_path, monkeypatch):
        import os

        import ntm_tracker_tpu.tools.track_artifact as ta

        out = tmp_path / "TRACK.json"
        self._existing(out, steps=100)
        monkeypatch.setattr(ta, "run_core", self._stub_run_core(400))
        ta.write_artifact(str(out), train_steps=400)
        assert json.loads(out.read_text())["cores"][0]["steps"] == 400
        assert not os.path.exists(str(out) + ".partial")  # promoted

    def test_force_overrides(self, tmp_path, monkeypatch):
        import ntm_tracker_tpu.tools.track_artifact as ta

        out = tmp_path / "TRACK.json"
        self._existing(out, steps=400)
        monkeypatch.setattr(ta, "run_core", self._stub_run_core(10))
        ta.write_artifact(str(out), train_steps=10, force=True)
        assert json.loads(out.read_text())["cores"][0]["steps"] == 10

    def test_malformed_or_partial_existing_is_overwritable(self, tmp_path,
                                                           monkeypatch):
        import ntm_tracker_tpu.tools.track_artifact as ta

        out = tmp_path / "TRACK.json"
        out.write_text("{not json")
        monkeypatch.setattr(ta, "run_core", self._stub_run_core(10))
        ta.write_artifact(str(out), train_steps=10)
        assert json.loads(out.read_text())["cores"][0]["steps"] == 10
        # a one-core partial (driver kill mid-run) is also fidelity 0
        out.write_text(json.dumps({"cores": [{"core": "ntm", "steps": 400}]}))
        ta.write_artifact(str(out), train_steps=10)
        assert len(json.loads(out.read_text())["cores"]) == 2
