"""Visualizers (SURVEY.md §2 row 26).

  save_imgs       <- direct_offset_output.py:61-92 (matplotlib grid of
                     per-step inputs / gt offsets / predictions)
  label_vot_sequence <- vot_visualizer.py:8-69 (draw gt polygons on a VOT
                     sequence directory)
"""

from __future__ import annotations

import os
from typing import Sequence

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


def memory_panels(
    M: np.ndarray, w: np.ndarray, read: np.ndarray, read_heads: int
) -> dict:
    """Build the reference's memory-over-time summary images
    (main.py:1186-1214) for ONE batch element.

    Args:
      M:    [T, N, D] memory snapshots
      w:    [T, H, N] head weights (read heads first)
      read: [T, R, D] read vectors
    Returns dict of 2D arrays:
      'M'        [N, T*D]   memory timeline (main.py:1188-1190)
      'w_reads'  [R*N, T]   read-weight trajectories (:1196-1197)
      'w_writes' [(H-R)*N, T] write-weight trajectories (:1198-1199)
      'reads'    [R*D, T]   read-vector timeline (:1209-1210)
    """
    T, N, D = M.shape
    H = w.shape[1]
    R = read_heads
    return {
        "M": np.transpose(M, (1, 0, 2)).reshape(N, T * D),
        "w_reads": np.transpose(w[:, :R, :], (1, 2, 0)).reshape(R * N, T),
        "w_writes": np.transpose(w[:, R:, :], (1, 2, 0)).reshape((H - R) * N, T),
        "reads": np.transpose(read, (1, 2, 0)).reshape(R * D, T),
    }


def save_memory_panels(
    views: dict, read_heads: int, filename: str, savedir: str,
    batch_index: int = 0,
) -> str:
    """Write a PNG of the four memory dashboards for one batch element.

    Args:
      views: {"M": [B,T,N,D], "w": [B,T,H,N], "read": [B,T,R,D]} as
        returned by models.core.unroll_states.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    b = batch_index
    panels = memory_panels(
        np.asarray(views["M"][b]), np.asarray(views["w"][b]),
        np.asarray(views["read"][b]), read_heads,
    )
    fig, axs = plt.subplots(len(panels), 1, figsize=(10, 12), dpi=140)
    for ax, (name, img) in zip(axs, panels.items()):
        ax.imshow(img, aspect="auto", cmap="viridis", interpolation="nearest")
        ax.set_title(name, fontsize=8)
        ax.set_xticks([])
        ax.set_yticks([])
    os.makedirs(savedir, exist_ok=True)
    path = os.path.join(savedir, filename + ".png")
    fig.savefig(path, bbox_inches="tight", pad_inches=0.1)
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
