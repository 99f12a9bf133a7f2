"""Synthetic-video tracking demo (tracking/demo.py) — cheap CI pieces.

The full demo (train 400 steps + track on TPU, mean IoU 0.386 -> 0.685)
runs out-of-band; here we pin the data contracts it is built on.
"""

import numpy as np

from ntm_tracker_tpu.tracking.demo import (
    demo_config,
    make_video,
    mean_clamped_iou,
    training_batch,
)


def test_mean_clamped_iou_contract():
    """THE aggregate contract shared by demo / TRACK_r0N / validate / int8
    artifacts: per-frame values clamp to [0, 1] in means — disjoint frames
    count 0, degenerate boxes (bb_iou's +1-area quirk exceeds 1 for
    negative-extent predictions) count at most 1; inputs stay raw
    (reference test_tracker.py:59-83)."""
    assert mean_clamped_iou([0.5, -31.8, 1.0]) == 0.5
    assert mean_clamped_iou([-5.0, -5.0]) == 0.0
    assert mean_clamped_iou([5.44, 0.5]) == 0.75  # r3's untrained-DNC case
    assert np.isnan(mean_clamped_iou([]))


def test_make_video_boxes_contain_square():
    frames, boxes = make_video(np.random.RandomState(0), 10, (90, 160))
    assert frames.shape == (10, 90, 160, 3)
    assert boxes.shape == (10, 4)
    H, W = 90, 160
    for t in range(10):
        y1, x1, y2, x2 = boxes[t]
        assert 0 < y1 < y2 < 1 and 0 < x1 < x2 < 1
        cy, cx = int((y1 + y2) / 2 * H), int((x1 + x2) / 2 * W)
        assert frames[t, cy, cx].min() > 200  # box center is the bright square


def test_make_scene_variants_contract():
    """Scene variants (TRACK_r0N cores[].scenes[]) share make_video's
    return contract; 'smooth' IS make_video; 'scale' really changes the
    box size; targets stay visible at the box center in every variant."""
    from ntm_tracker_tpu.data.synthetic import SCENES, make_scene

    H, W = 90, 160
    for scene in SCENES:
        frames, boxes = make_scene(np.random.RandomState(1), 8, scene, (H, W))
        assert frames.shape == (8, H, W, 3) and boxes.shape == (8, 4)
        for t in range(8):
            y1, x1, y2, x2 = boxes[t]
            assert 0 < y1 < y2 < 1 and 0 < x1 < x2 < 1
            cy, cx = int((y1 + y2) / 2 * H), int((x1 + x2) / 2 * W)
            assert frames[t, cy, cx].min() > 140  # target at box center

    f1, b1 = make_scene(np.random.RandomState(3), 5, "smooth", (H, W))
    f2, b2 = make_video(np.random.RandomState(3), 5, (H, W))
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(b1, b2)

    _, bs = make_scene(np.random.RandomState(4), 9, "scale", (H, W))
    sizes = bs[:, 2] - bs[:, 0]
    assert sizes.max() / sizes.min() > 1.3

    import pytest

    with pytest.raises(ValueError):
        make_scene(np.random.RandomState(0), 3, "nope")


def test_training_batch_contract():
    """The demo batch has the loader's layout and reference geometry: the
    first frame of every sequence is centered (offset 0) and its gt heatmap
    peaks at the grid center."""
    cfg = demo_config(crop_size=32)
    batch = training_batch(cfg, np.random.RandomState(0))
    B, L = cfg.train.batch_size, cfg.train.sequence_length
    d = cfg.data
    assert batch["images"].shape == (B * L, d.crop_size, d.crop_size, 3)
    assert batch["gts"].shape == (B * L, d.gt_width, d.gt_width)
    yo = np.asarray(batch["y_offsets"]).reshape(B, L)
    xo = np.asarray(batch["x_offsets"]).reshape(B, L)
    np.testing.assert_allclose(yo[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(xo[:, 0], 0.0, atol=1e-6)
    g0 = np.asarray(batch["gts"]).reshape(B, L, d.gt_width, d.gt_width)[0, 0]
    peak = np.unravel_index(g0.argmax(), g0.shape)
    c = (d.gt_width - 1) / 2
    assert abs(peak[0] - c) <= 0.5 and abs(peak[1] - c) <= 0.5
    # images are mean-subtracted like the streaming tracker's preprocessor
    assert float(np.asarray(batch["images"]).mean()) < 50.0
