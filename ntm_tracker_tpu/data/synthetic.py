"""Synthetic moving-bright-square video clips.

The shared toy task behind the tracking demo (tracking/demo.py) and the
active-resize trainer's tests/batches (train/active_resize.py): a bright
square over noise whose normalized (y1,x1,y2,x2) gt box is known exactly.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def make_video(
    rng: np.random.RandomState,
    n_frames: int,
    hw: Tuple[int, int] = (180, 320),
    velocity: bool = True,
):
    """(frames [L,H,W,3] float32 RGB, boxes [L,4] normalized y1,x1,y2,x2).

    velocity=True: smooth random-velocity motion (the demo's clip);
    velocity=False: per-frame positional jitter (the active-resize toy)."""
    H, W = hw
    frames = (rng.rand(n_frames, H, W, 3) * 40).astype(np.float32)
    boxes = np.zeros((n_frames, 4), np.float32)
    if velocity:
        cy, cx = rng.uniform(0.4, 0.6, 2)
    else:
        cy, cx = rng.uniform(0.35, 0.65, 2)
    half = rng.uniform(0.08, 0.12)
    vy = vx = 0.0
    for t in range(n_frames):
        if velocity:
            vy = np.clip(vy + rng.uniform(-0.01, 0.01), -0.02, 0.02)
            vx = np.clip(vx + rng.uniform(-0.01, 0.01), -0.02, 0.02)
            cy = float(np.clip(cy + vy, 0.25, 0.75))
            cx = float(np.clip(cx + vx, 0.25, 0.75))
        else:
            cy = float(np.clip(cy + rng.uniform(-0.02, 0.02), 0.2, 0.8))
            cx = float(np.clip(cx + rng.uniform(-0.02, 0.02), 0.2, 0.8))
        boxes[t] = (cy - half, cx - half, cy + half, cx + half)
        y0, y1 = int((cy - half) * H), int((cy + half) * H)
        x0, x1 = int((cx - half) * W), int((cx + half) * W)
        frames[t, y0:y1, x0:x1] = 220.0
    return frames, boxes
