"""Validation replay: run the streaming tracker over pickled validation
sequences, reconstructing ground-truth regions by inverting each frame's
stored crop transformation (reference validate_tracker.py:1-40).

Reports the per-frame IoU between tracked and annotated regions — the
reference defines bb_iou (test_tracker.py:59-83) but never aggregates it;
we do, since it is the natural accuracy metric for the replay."""

from __future__ import annotations

import os
import pickle
from typing import List, Tuple

import numpy as np

from ntm_tracker_tpu.data import geometry


def get_image(frame_path: str) -> Tuple[str, Tuple[float, float, float, float]]:
    """Read a frame record and decode the annotated region back to image
    coordinates (validate_tracker.py:12-24). Returns (image_path, (x,y,w,h))
    in normalized image coordinates."""
    with open(frame_path + ".txt") as f:
        parts = f.readline().strip().split(",")
    cy1, cx1, cy2, cx2 = (float(v) for v in parts[0:4])
    y1, x1, y2, x2 = (float(v) for v in parts[4:8])
    img_filename = parts[8]
    inv = np.linalg.inv(geometry.calculate_transformation([cy1, cx1, cy2, cx2]))
    y1, x1, y2, x2 = geometry.apply_transformation([y1, x1, y2, x2], inv)
    return img_filename, (x1, y1, x2 - x1, y2 - y1)


def replay_sequences(
    seqs, cfg, vgg_params, params, core=None, log=print,
    delimiter_first: bool = False, tracker=None,
) -> List[List[float]]:
    """Replay each (seq_path, frame_names) pair; returns per-sequence IoUs.
    Pass `tracker` (e.g. StreamingTracker.from_serving) to replay through a
    prebuilt tracker instead of cfg/vgg_params/params."""
    from PIL import Image

    from ntm_tracker_tpu.models.core import make_core
    from ntm_tracker_tpu.tracking.demo import mean_clamped_iou
    from ntm_tracker_tpu.tracking.tracker import StreamingTracker

    if tracker is None:
        core = core or make_core(cfg)
        # ONE tracker for all sequences: init() fully resets the recurrent
        # state, so the jitted frame program compiles once instead of per
        # sequence (a fresh StreamingTracker would rebuild the jit closures)
        tracker = StreamingTracker(cfg, vgg_params, params, core,
                                   delimiter_first=delimiter_first)
    all_ious: List[List[float]] = []
    for idx, (seq_path, frame_names) in enumerate(seqs):
        imagepath, region = get_image(os.path.join(seq_path, frame_names[0]))
        img = np.asarray(Image.open(imagepath).convert("RGB"))
        tracker.init(img, region)
        ious: List[float] = []
        for frame_name in frame_names[1:]:
            img, gt_corners = _frame_and_gt(seq_path, frame_name)
            x, y, w, h = tracker.track(img)
            ious.append(geometry.bb_iou([x, y, x + w, y + h], gt_corners))
        # aggregate clamps disjoint frames at 0 (mean_clamped_iou — bb_iou
        # keeps the reference's unclamped +1-area formula, meaningful per
        # frame but nonsense in a wandering-tracker mean); the returned
        # per-frame list stays raw
        log(f"seq {idx}: mean IoU {mean_clamped_iou(ious):.3f}")
        all_ious.append(ious)
    return all_ious


def _frame_and_gt(seq_path: str, frame_name: str):
    """Decode one frame record: (image array, gt region in ABSOLUTE pixel
    corners) — the gt may be stored normalized (legal values <= 2) or in
    pixels already (reference validate_tracker.py keeps both in the wild)."""
    from PIL import Image

    imagepath, (gx, gy, gw, gh) = get_image(os.path.join(seq_path, frame_name))
    img = np.asarray(Image.open(imagepath).convert("RGB"))
    H, W = img.shape[:2]
    if max(abs(gx), abs(gy), gw, gh) <= 2.0:
        corners = [gx * W, gy * H, (gx + gw) * W, (gy + gh) * H]
    else:
        corners = [gx, gy, gx + gw, gy + gh]
    return img, corners


def replay_sequences_fleet(
    seqs, cfg, vgg_params, params, core=None, capacity: int = 8, log=print,
    delimiter_first: bool = False, fleet=None,
) -> List[List[float]]:
    """replay_sequences over a FleetTracker: up to `capacity` sequences
    advance per batched device step (tracking/fleet.py), so the chip
    amortizes the VGG + cell work across the wave — the reference's replay
    (validate_tracker.py:1-40) is strictly one-sequence-at-a-time. Finished
    slots are refilled from the remaining sequences immediately (no wave
    barrier). Same outputs as replay_sequences: raw per-frame IoUs per
    sequence, clamped-mean logging. Pass `fleet` (e.g.
    FleetTracker.from_serving) to replay through a prebuilt fleet instead
    of cfg/vgg_params/params."""
    from PIL import Image

    from ntm_tracker_tpu.models.core import make_core
    from ntm_tracker_tpu.tracking.demo import mean_clamped_iou
    from ntm_tracker_tpu.tracking.fleet import FleetTracker

    if fleet is None:
        core = core or make_core(cfg)
        fleet = FleetTracker(cfg, vgg_params, params, capacity=capacity,
                             core=core, delimiter_first=delimiter_first)
    all_ious: List[List[float]] = [[] for _ in seqs]
    active: dict = {}  # slot -> [seq_idx, next_frame_pos]
    next_seq = 0

    def finish(slot, seq_idx):
        fleet.remove(slot)
        log(f"seq {seq_idx}: mean IoU {mean_clamped_iou(all_ious[seq_idx]):.3f}")

    def admit():
        nonlocal next_seq
        while next_seq < len(seqs) and len(active) < fleet.capacity:
            idx = next_seq
            next_seq += 1
            seq_path, frame_names = seqs[idx]
            imagepath, region = get_image(
                os.path.join(seq_path, frame_names[0]))
            img = np.asarray(Image.open(imagepath).convert("RGB"))
            slot = fleet.add(img, region)
            if len(frame_names) < 2:  # nothing to track
                finish(slot, idx)
                continue
            active[slot] = [idx, 1]

    admit()
    while active:
        images, gt_corners = {}, {}
        for slot, (seq_idx, fi) in active.items():
            seq_path, frame_names = seqs[seq_idx]
            images[slot], gt_corners[slot] = _frame_and_gt(
                seq_path, frame_names[fi]
            )
        regions = fleet.step(images)
        for slot in list(active):
            seq_idx, fi = active[slot]
            x, y, w, h = regions[slot]
            all_ious[seq_idx].append(
                geometry.bb_iou([x, y, x + w, y + h], gt_corners[slot])
            )
            active[slot][1] = fi + 1
            if fi + 1 >= len(seqs[seq_idx][1]):
                del active[slot]
                finish(slot, seq_idx)
        admit()
    return all_ious


def validate_tracker(args) -> int:
    """CLI glue: load the pickle, build the model, replay."""
    fleet_n = int(getattr(args, "fleet", 0) or 0)
    if fleet_n < 0:
        raise SystemExit(f"--fleet wants a positive capacity, got {fleet_n}")
    with open(args.pickle_path, "rb") as f:
        seqs = pickle.load(f)
    limit = int(getattr(args, "limit", 0) or 0)
    if limit > 0:
        # dress rehearsal (MIGRATION.md real-data runbook)
        seqs = seqs[:limit]
        print(f"--limit {limit}: replaying {len(seqs)} sequences")

    if getattr(args, "serving_npz", ""):
        # AOT artifact: weights/geometry/token order all come from the
        # file; --vgg_int8 is cross-checked against the baked token path
        from ntm_tracker_tpu.cli import _load_serving_model, _serving_tracker

        if fleet_n:
            from ntm_tracker_tpu.tracking.fleet import FleetTracker

            model = _load_serving_model(args.serving_npz, args)
            if model.meta["batch"] != fleet_n:
                raise SystemExit(
                    f"--fleet {fleet_n} but {args.serving_npz} bakes batch "
                    f"{model.meta['batch']} programs; pass --fleet "
                    f"{model.meta['batch']} or re-export with "
                    f"export-serving --batch {fleet_n}")
            fleet = FleetTracker.from_serving(model)
            ious = replay_sequences_fleet(seqs, None, None, None,
                                          fleet=fleet)
        else:
            tracker = _serving_tracker(args.serving_npz, args)
            ious = replay_sequences(seqs, None, None, None, tracker=tracker)
    else:
        from ntm_tracker_tpu.cli import (
            _load_vgg,
            _resolve_tracker_weights,
            _tracker_config,
        )
        from ntm_tracker_tpu.models.core import make_core

        cfg = _tracker_config(args, args.core)
        vgg_params = _load_vgg(args)
        core = make_core(cfg)
        params = _resolve_tracker_weights(args, cfg, core)
        if fleet_n:
            ious = replay_sequences_fleet(
                seqs, cfg, vgg_params, params, core, capacity=fleet_n,
                delimiter_first=getattr(args, "delimiter_first", False))
        else:
            ious = replay_sequences(
                seqs, cfg, vgg_params, params, core,
                delimiter_first=getattr(args, "delimiter_first", False))
    from ntm_tracker_tpu.tracking.demo import mean_clamped_iou

    flat = [i for s in ious for i in s]
    print(f"overall mean IoU over {len(flat)} frames: "
          f"{mean_clamped_iou(flat):.4f}")
    return 0
