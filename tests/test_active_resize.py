"""Closed-loop active-resize training (train/active_resize.py — the
completed form of the reference's unfinished ntm_active_resize,
main.py:1294-1422)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntm_tracker_tpu.config import DataConfig, NTMConfig, TrackerConfig, TrainConfig
from ntm_tracker_tpu.data import geometry
from ntm_tracker_tpu.models.vgg import init_vgg_params
from ntm_tracker_tpu.train.active_resize import (
    ActiveResizeExperiment,
    canonical_box,
    cropbox_of,
    synthetic_active_batch,
    to_crop_space,
    to_image_space,
)


def tiny_cfg(batch=2, seq_len=4):
    return TrackerConfig(
        core="ntm",
        ntm=NTMConfig(mem_size=16, mem_dim=8, controller_hidden_size=24,
                      read_head_size=2),
        data=DataConfig(crop_size=32, gt_width=2),
        train=TrainConfig(batch_size=batch, sequence_length=seq_len,
                          learning_rate=1e-3),
        num_features=4,
        feature_points=((1, 1), (1, 2), (2, 1), (2, 2)),
    )


class TestGeometryTwins:
    """The in-graph jnp geometry must equal the host numpy geometry the
    offline pipeline and the streaming tracker use."""

    def test_cropbox(self):
        b = [0.3, 0.4, 0.5, 0.7]
        got = cropbox_of(jnp.asarray([b]), 8, 6)[0]
        np.testing.assert_allclose(
            np.asarray(got), geometry.calculate_cropbox(b, 8, 6), atol=1e-6
        )

    def test_crop_space_round_trip(self):
        b = jnp.asarray([[0.3, 0.4, 0.5, 0.7], [0.1, 0.2, 0.6, 0.9]])
        cb = cropbox_of(b, 8, 6)
        tb = to_crop_space(b, cb)
        # matches apply_transformation(calculate_transformation(cropbox))
        ref_cb = geometry.calculate_cropbox([0.3, 0.4, 0.5, 0.7], 8, 6)
        ref_tb = geometry.apply_transformation(
            [0.3, 0.4, 0.5, 0.7], geometry.calculate_transformation(ref_cb)
        )
        np.testing.assert_allclose(
            np.asarray(tb[0]), np.asarray(ref_tb, np.float32), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(to_image_space(tb, cb)), np.asarray(b), atol=1e-6
        )

    def test_canonical_box_is_centered_gate(self):
        c = np.asarray(canonical_box(8, 6))
        np.testing.assert_allclose(
            c, geometry.initial_transformed_bbox(8, 6), atol=1e-7
        )


class TestTraining:
    def test_loss_decreases_and_bbox_tracks(self):
        cfg = tiny_cfg()
        exp = ActiveResizeExperiment(
            cfg, init_vgg_params(jax.random.PRNGKey(0)), compress_dim=8
        )
        params, opt_state = exp.init(jax.random.PRNGKey(1))
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_active_batch(
                cfg, np.random.RandomState(0), (48, 64)
            ).items()
        }
        step = jax.jit(exp.make_train_step())
        losses = []
        for _ in range(10):
            params, opt_state, m = step(params, opt_state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.75, losses
        assert np.isfinite(losses).all()

    def test_closed_loop_recrop_actually_moves(self):
        """The defining property vs the fixed-crop pipeline: the crop for
        frame t>0 depends on the PREDICTION, so two different parameter
        settings produce different final bboxes on identical data."""
        cfg = tiny_cfg()
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        exp = ActiveResizeExperiment(cfg, vgg, compress_dim=8)
        p1, _ = exp.init(jax.random.PRNGKey(1))
        p2, _ = exp.init(jax.random.PRNGKey(7))
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_active_batch(
                cfg, np.random.RandomState(3), (48, 64)
            ).items()
        }
        _, aux1 = exp.loss_fn(p1, batch)
        _, aux2 = exp.loss_fn(p2, batch)
        assert not np.allclose(
            np.asarray(aux1["final_bbox"]), np.asarray(aux2["final_bbox"])
        )

    def test_gradients_flow_through_memory_not_geometry(self):
        """Finite gradients for every param; the stop_gradient on the bbox
        path keeps the loss differentiable without NaNs from chained crop
        gradients."""
        cfg = tiny_cfg(batch=1, seq_len=3)
        exp = ActiveResizeExperiment(
            cfg, init_vgg_params(jax.random.PRNGKey(0)), compress_dim=8
        )
        params, _ = exp.init(jax.random.PRNGKey(1))
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_active_batch(
                cfg, np.random.RandomState(0), (48, 64)
            ).items()
        }
        grads = jax.grad(lambda p: exp.loss_fn(p, batch)[0])(params)
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_pickle_batch_builder():
    from ntm_tracker_tpu.data.pickle_dataset import active_resize_get_batch

    seqs = [
        (
            "seqA", "obj", 0, 3,
            [
                (f"f{i}.JPEG", (640.0, 360.0),
                 [(100 + 5 * i, 50 + 2 * i), (200 + 5 * i, 150 + 2 * i)],
                 [np.zeros((2, 2), bool)])
                for i in range(3)
            ],
        )
    ]
    names, boxes, idx = active_resize_get_batch(0, 1, 3, seqs)
    assert names == ["f0.JPEG", "f1.JPEG", "f2.JPEG"]
    assert boxes.shape == (1, 3, 4)
    np.testing.assert_allclose(
        boxes[0, 0],
        geometry.normalize_bbox((640.0, 360.0), [50, 100, 150, 200]),
        atol=1e-6,
    )
    assert idx == 1


def test_cli_parses():
    from ntm_tracker_tpu.cli import build_parser

    a = build_parser().parse_args(
        ["train-active-resize", "--pickle_path", "x.pkl", "--compress_dim", "16"]
    )
    assert a.fn.__name__ == "cmd_train_active_resize"
