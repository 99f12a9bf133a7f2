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
