"""Smoke the per-round accuracy artifact (tools/track_artifact.py).

TRACK_r0N.json is a per-round driver deliverable produced by bench.py on
TPU; this CPU smoke executes the full write path at miniature sizes so a
break in the artifact tool cannot silently cost a round its accuracy
record. Both cores run, including the serving-precision drift probe
(host-geometry loop vs device-resident loop).
"""

import json

from ntm_tracker_tpu.tools.track_artifact import write_artifact


def test_write_artifact_smoke(tmp_path):
    out = tmp_path / "TRACK_smoke.json"
    artifact = write_artifact(
        str(out), train_steps=1, eval_frames=3, drift_frames=3
    )
    on_disk = json.loads(out.read_text())
    assert on_disk == artifact
    assert [c["core"] for c in artifact["cores"]] == ["ntm", "dnc"]
    for c in artifact["cores"]:
        assert c["steps"] == 1
        # aggregate IoU is clamped per frame (disjoint boxes score 0, not
        # bb_iou's negative +1-area artifact), so means live in [0, 1]
        assert 0.0 <= c["untrained_iou"] <= 1.0
        assert 0.0 <= c["trained_iou"] <= 1.0
        # the drift probe runs for BOTH cores and yields a finite pixel
        # deviation (identically-compiled CPU paths should agree closely)
        assert c["serve_precision_max_px_drift"] >= 0.0
        assert c["serve_precision_max_px_drift"] < 1e3
        assert c["train_seconds"] >= 0.0
