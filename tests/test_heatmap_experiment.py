"""HeatmapExperiment (sevenbyseven/8by8/sequential) end-to-end tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntm_tracker_tpu.config import DataConfig, DNCConfig, NTMConfig, TrackerConfig, TrainConfig
from ntm_tracker_tpu.models.vgg import init_vgg_params
from ntm_tracker_tpu.train.experiments import HeatmapExperiment, synthetic_offset_batch


def cfg_for(serialization, F=4):
    out_dim = 1 if serialization == "sequential" else F
    return TrackerConfig(
        core="ntm",
        ntm=NTMConfig(output_dim=out_dim, mem_size=16, mem_dim=8,
                      controller_hidden_size=32, read_head_size=2),
        data=DataConfig(crop_size=32, resize_hw=(48, 64), gt_width=2),
        train=TrainConfig(batch_size=2, sequence_length=3),
        num_features=F,
        feature_points=((1, 1), (1, 2), (2, 1), (2, 2)),
    )


@pytest.mark.parametrize("serialization", ["frame", "sequential"])
def test_heatmap_experiment_trains(serialization):
    cfg = cfg_for(serialization)
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    exp = HeatmapExperiment(cfg, vgg, image_mode="cropped",
                            serialization=serialization)
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    step = jax.jit(exp.make_train_step())
    batch = {
        k: jnp.array(v)
        for k, v in synthetic_offset_batch(cfg, np.random.RandomState(0)).items()
    }
    losses = []
    for _ in range(3):
        params, opt_state, m = step(params, opt_state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_compressor_trains_jointly():
    cfg = cfg_for("frame")
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    exp = HeatmapExperiment(cfg, vgg, image_mode="cropped",
                            serialization="frame", compress_dim=16)
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    assert params["compressor"].shape == (512, 16)
    batch = {
        k: jnp.array(v)
        for k, v in synthetic_offset_batch(cfg, np.random.RandomState(1)).items()
    }
    step = jax.jit(exp.make_train_step())
    w0 = np.asarray(params["compressor"]).copy()
    params, opt_state, m = step(params, opt_state, batch)
    assert np.isfinite(float(m["loss"]))
    assert not np.allclose(np.asarray(params["compressor"]), w0)


@pytest.mark.parametrize("serialization", ["frame", "sequential"])
def test_heatmap_eval_with_views(serialization):
    """eval_with_views (the --save_imgs single-pass path) must use the
    HEATMAP loss, not inherit the offset loss (whose gather crashes or
    mis-slices on the heatmap token layouts)."""
    cfg = cfg_for(serialization)
    exp = HeatmapExperiment(
        cfg, init_vgg_params(jax.random.PRNGKey(0)), serialization=serialization
    )
    params, _ = exp.init(jax.random.PRNGKey(1))
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_offset_batch(cfg, np.random.RandomState(0)).items()
    }
    aux, views = jax.jit(lambda p, b: exp.eval_with_views(p, b, max_snapshots=4))(
        params, batch
    )
    ref = jax.jit(exp.make_eval_step())(params, batch)
    np.testing.assert_allclose(
        np.asarray(aux["loss"]), np.asarray(ref["loss"]), atol=1e-6
    )
    assert views["M"].shape[1] <= 4
