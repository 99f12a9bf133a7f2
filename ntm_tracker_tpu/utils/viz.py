"""Visualizers (SURVEY.md §2 row 26).

  save_imgs       <- direct_offset_output.py:61-92 (matplotlib grid of
                     per-step inputs / gt offsets / predictions)
  label_vot_sequence <- vot_visualizer.py:8-69 (draw gt polygons on a VOT
                     sequence directory)
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np


def save_imgs(imgs: Sequence[np.ndarray], filename: str, savedir: str) -> str:
    """Write a PNG grid: rows = batch x image-sets, cols = sequence steps.

    Each element of `imgs` is [batch, length, H, W, C] (drawn as an image)
    or [batch, length, 2] (drawn as an offset point in the unit box, y
    flipped — matching the reference's plot of (dx, -dy))."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    batch, length = imgs[0].shape[0], imgs[0].shape[1]
    rows = len(imgs) * batch
    fig, axs = plt.subplots(rows, length, figsize=(length, rows), dpi=160,
                            squeeze=False)
    for batch_idx in range(batch):
        for set_idx, img in enumerate(imgs):
            for t in range(length):
                ax = axs[batch_idx * len(imgs) + set_idx, t]
                if img.ndim > 3:
                    ax.imshow(np.squeeze(img[batch_idx, t]).astype(np.uint8)
                              if img.dtype != np.uint8 else np.squeeze(img[batch_idx, t]))
                    ax.axis("off")
                else:
                    ax.set_xlim(-0.5, 0.5)
                    ax.set_ylim(-0.5, 0.5)
                    ax.plot([img[batch_idx, t, 1]], [-img[batch_idx, t, 0]],
                            marker="o", markersize=3, color="red")
    os.makedirs(savedir, exist_ok=True)
    path = os.path.join(savedir, filename + ".png")
    fig.savefig(path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return path


def label_vot_sequence(data_path: str) -> str:
    """Draw groundtruth.txt polygons onto every frame of a VOT sequence dir;
    writes to <data_path>/labeled/ (vot_visualizer.py)."""
    from PIL import Image, ImageDraw

    gt_name = os.path.join(data_path, "groundtruth.txt")
    images = sorted(x for x in os.listdir(data_path) if x.endswith(".jpg"))
    if not images:
        raise ValueError("the given dir does not contain any images")
    gt_frames = []
    with open(gt_name) as f:
        for line in f:
            coords = [float(v) for v in line.strip().split(",")]
            gt_frames.append([(coords[2 * i], coords[2 * i + 1]) for i in range(len(coords) // 2)])
    assert len(gt_frames) == len(images)
    output_dir = os.path.join(data_path, "labeled")
    os.makedirs(output_dir, exist_ok=True)
    for img_name, bbox in zip(images, gt_frames):
        img = Image.open(os.path.join(data_path, img_name))
        d = ImageDraw.Draw(img)
        d.polygon(bbox)
        img.save(os.path.join(output_dir, img_name))
    return output_dir
