"""Deterministic parameter generators shared by the TF golden generator
(gen_tf_goldens.py, needs TensorFlow) and the TF-free parity tests
(test_tf_parity.py). Keeping the weight synthesis in one importable place
guarantees the generator and the test materialize bit-identical arrays, so
the committed fixtures only need to store inputs and outputs — not the
~28 MB of VGG weights."""

from __future__ import annotations

import numpy as np

VGG_WEIGHT_SEED = 3
VGG_IMAGE_SEED = 4
VGG_IMAGE_HW = 64


def seeded_vgg_params(prefix):
    """He-scaled float32 conv weights/biases for the conv1..conv4_3 slice of
    a (name, out_ch, has_pool) prefix table, keyed by layer name."""
    rs = np.random.RandomState(VGG_WEIGHT_SEED)
    params = {}
    in_ch = 3
    for name, out_ch, _ in prefix:
        fan_in = 3 * 3 * in_ch
        w = rs.normal(0.0, np.sqrt(2.0 / fan_in), (3, 3, in_ch, out_ch))
        b = rs.uniform(-0.1, 0.1, (out_ch,))
        params[name] = {
            "weights": w.astype(np.float32),
            "biases": b.astype(np.float32),
        }
        in_ch = out_ch
        if name == "conv4/conv4_3":
            break
    return params


def seeded_vgg_image():
    rs = np.random.RandomState(VGG_IMAGE_SEED)
    return rs.uniform(
        -120.0, 130.0, (1, VGG_IMAGE_HW, VGG_IMAGE_HW, 3)
    ).astype(np.float32)


MINING_SEED = 13


def seeded_mining_stats():
    """Synthetic obj_frame_statistics for the gen_sequences comparison:
    the (seq_dir, frame_name, obj_name, frame_size, bbox, ious) tuples of
    sequence_generator.py:24-74, with frame gaps, sub-threshold frames, and
    a trailing viable run (which the reference's gen_sequences DROPS —
    sequence_generator.py:76-154 never flushes the final buffer)."""
    rs = np.random.RandomState(MINING_SEED)
    stats = []
    for obj_idx, (obj, frames) in enumerate(
        [("s0_0", [0, 1, 2, 3, 5, 6, 7]), ("s0_1", [0, 1, 2, 4, 5, 6, 8, 9])]
    ):
        for f in frames:
            # iou map gated on/off deterministically: every 4th frame of the
            # object fails the threshold
            peak = 0.2 if (f + obj_idx) % 4 == 3 else 0.9
            iou = rs.rand(4, 4).astype(np.float64) * 0.3
            iou[1 + obj_idx % 2, 2] = peak
            stats.append(
                (
                    "data/s0",
                    f"{f:06d}",
                    obj,
                    (640.0, 360.0),
                    [(10.0 * f, 5.0 * f), (10.0 * f + 120.0, 5.0 * f + 90.0)],
                    [iou],
                )
            )
    return stats
