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


# ---------------------------------------------------------------------------
# Full streaming-tracker-loop golden (gen_tracker_loop_golden.py /
# test_tf_parity.py): the reference test_tracker.NTMTracker executed
# end-to-end over a synthetic video with these seeded weights.
# ---------------------------------------------------------------------------

TRACKER_LOOP_SEED = 21
TRACKER_LOOP_FRAMES = 6
TRACKER_LOOP_HW = (180, 240)           # image height, width
TRACKER_LOOP_REGION0 = (88.0, 60.0, 64.0, 48.0)  # x, y, w, h pixels
# the reference test_tracker.py flag defaults (:34-56), except a lighter
# controller so the committed parity test stays fast
TRACKER_LOOP_CONFIG = dict(
    input_depth=514, mem_size=128, mem_dim=20, hidden=200, num_layers=1,
    read_heads=4, write_heads=1, shift_range=1,
)


def seeded_loop_cell_params():
    """NTM cell parameters (JAX pytree key layout) for the tracker-loop
    golden. Scales are kept moderate so the UNTRAINED closed loop stays
    numerically tame (tanh offsets ~0.1, not saturated) — the recrop
    feedback of a chaotic random cell would amplify float-reassociation
    noise between TF and XLA beyond any useful tolerance."""
    c = TRACKER_LOOP_CONFIG
    rs = np.random.RandomState(TRACKER_LOOP_SEED)
    num_heads = c["read_heads"] + c["write_heads"]
    shift_space = 2 * c["shift_range"] + 1
    total_head = (
        c["mem_dim"] * num_heads + 3 * num_heads + shift_space * num_heads
        + 2 * c["mem_dim"] * c["write_heads"]
    )

    def u(shape, scale):
        return rs.uniform(-scale, scale, shape).astype(np.float32)

    params = {
        # out head deliberately small: the region->crop->VGG->cell->offset
        # loop's per-frame error amplification is linear in this scale, and
        # the golden must stay comparable at f32 across TF and XLA (the
        # measured gain at scale 0.05 on textured video was ~40x/frame —
        # chaotic beyond any tolerance)
        "out_w": u((c["hidden"], 2), 0.008),
        "out_b": u((2,), 0.004),
        "heads_w": u((c["hidden"], total_head), 0.1),
        "heads_b": u((total_head,), 0.05),
        "init_M": u((c["mem_size"], c["mem_dim"]), 0.5),
        "init_w": u((num_heads, c["mem_size"]), 0.5),
        "init_read": u((c["read_heads"], c["mem_dim"]), 0.5),
    }
    in_dim = c["input_depth"] + c["read_heads"] * c["mem_dim"]
    for layer in range(c["num_layers"]):
        d = in_dim if layer == 0 else c["hidden"]
        params[f"ctrl_kernel_{layer}"] = u((d + c["hidden"], 4 * c["hidden"]), 0.08)
        params[f"ctrl_bias_{layer}"] = u((4 * c["hidden"],), 0.02)
    return params


def seeded_loop_video():
    """Deterministic synthetic video: a smooth colored blob moving
    diagonally over a smooth sinusoid background.

    SMOOTHNESS IS LOAD-BEARING: the closed tracking loop re-crops around
    its own prediction every frame, so tiny cross-framework float noise in
    the predicted region is amplified by d(VGG tokens)/d(crop shift) each
    frame. High-frequency random textures give ~40x/frame gain (measured) —
    pure chaos at f32; the low-frequency scene keeps the golden trajectory
    comparable at 1e-4 over the full loop."""
    h, w = TRACKER_LOOP_HW
    x0, y0, bw, bh = [int(v) for v in TRACKER_LOOP_REGION0]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    base = np.stack(
        [
            128 + 50 * np.sin(2 * np.pi * (xs / w + 0.3 * np.sin(2 * np.pi * ys / h))),
            128 + 50 * np.cos(2 * np.pi * (1.3 * ys / h + 0.2 * xs / w)),
            128 + 40 * np.sin(2 * np.pi * (0.7 * xs / w + 0.9 * ys / h)),
        ],
        axis=-1,
    )
    tint = np.array([90.0, -60.0, 40.0])
    frames = []
    for t in range(TRACKER_LOOP_FRAMES):
        cy, cx = y0 + bh / 2 + 4 * t, x0 + bw / 2 + 5 * t
        blob = np.exp(-(((ys - cy) / (bh / 2)) ** 2 + ((xs - cx) / (bw / 2)) ** 2))
        img = base + blob[..., None] * tint
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return np.stack(frames)


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
