"""The repaired augmentation path (reference preprocess.py:356-474 intent,
defects fixed — see data/augment.py docstring). Checks: selection algebra,
deform/zoom gating, on-disk contract, determinism, and that short runs
terminate (the reference's version contains an infinite loop)."""

import os

import numpy as np
import pytest

from ntm_tracker_tpu.config import DataConfig
from ntm_tracker_tpu.data import geometry
from ntm_tracker_tpu.data.augment import (
    augment_object_sequence,
    dilation_slices,
    process_sequence_augmented,
)
from ntm_tracker_tpu.data.preprocess import PreprocessJob, read_frame_record

from test_preprocess import write_synthetic_dataset


def _records(n, w=640, h=360, drift=1.0, grow=0.0):
    recs = []
    for i in range(n):
        x1, y1 = 200 + drift * i, 100 + drift * i
        bw, bh = 120 * (1 + grow * i), 90 * (1 + grow * i)
        recs.append(
            {
                "filename": f"{i:06d}",
                "image_full_path": f"/img/{i:06d}.JPEG",
                "normalbbox": geometry.normalize_bbox(
                    (w, h), [y1, x1, y1 + bh, x1 + bw]
                ),
            }
        )
    return recs


class TestDilationSlices:
    @pytest.mark.parametrize("raw,L", [(20, 20), (23, 20), (47, 20), (130, 20), (12, 5)])
    def test_selection_algebra(self, raw, L):
        rng = np.random.default_rng(0)
        sels = dilation_slices(raw, L, rng)
        times = raw // L
        # every dilation 1..times is represented times//step times
        for step in range(1, times + 1):
            assert sum(1 for _s, st in sels if st == step) == times // step
        # every selection yields exactly L in-bounds frames
        for start, step in sels:
            assert start >= 0
            assert start + step * L <= raw
            assert len(range(start, start + step * L, step)) == L

    def test_too_short_returns_empty_and_terminates(self):
        # the reference's data_augmentation would loop forever here
        # (preprocess.py:426-428)
        assert dilation_slices(7, 20, np.random.default_rng(0)) == []

    def test_deterministic_under_seed(self):
        a = dilation_slices(47, 10, np.random.default_rng(123))
        b = dilation_slices(47, 10, np.random.default_rng(123))
        assert a == b


class TestAugmentObjectSequence:
    def test_gentle_motion_accepted_and_contracted(self):
        cfg = DataConfig()
        recs = _records(24, drift=1.0)
        subseqs = augment_object_sequence(recs, cfg, 6, np.random.default_rng(0))
        assert len(subseqs) >= 3  # dilation 1 (x4) and 2 (x2) survive the gate
        for frames in subseqs:
            assert len(frames) == 6
            crop = frames[0]["cropbox"]
            assert frames[0]["offsets"] == (0.0, 0.0)
            for i, fr in enumerate(frames):
                assert fr["cropbox"] == crop  # one cropbox per selection
                # criterion 1: bbox inside the cropbox
                y1, x1, y2, x2 = fr["normalbbox"]
                assert y1 >= crop[0] and x1 >= crop[1]
                assert y2 <= crop[2] and x2 <= crop[3]
                # gate: the live path's legality thresholds hold
                assert geometry.bbox_legal(
                    fr["normalbbox"], crop, cfg.cropbox_grid, cfg.bbox_grid,
                    cfg.deform_threshold, cfg.zoom_threshold,
                )
                tb = fr["transformed_bbox"]
                assert all(0.0 <= v <= 1.0 for v in tb)
                np.testing.assert_allclose(fr["gt"].sum(), 1.0, rtol=1e-5)
                if i > 0:
                    dy, dx = geometry.calculate_offsets(
                        tb, frames[0]["transformed_bbox"]
                    )
                    np.testing.assert_allclose(fr["offsets"], (dy, dx), atol=1e-12)

    def test_zooming_object_gated_out(self):
        cfg = DataConfig()
        recs = _records(24, drift=0.0, grow=0.08)  # ~3x area growth
        subseqs = augment_object_sequence(recs, cfg, 6, np.random.default_rng(0))
        assert subseqs == []

    def test_fast_motion_gated_out(self):
        cfg = DataConfig()
        recs = _records(24, drift=12.0)  # union far wider than any frame bbox
        subseqs = augment_object_sequence(recs, cfg, 6, np.random.default_rng(0))
        assert subseqs == []


class TestOnDisk:
    def test_process_sequence_augmented(self, tmp_path):
        anno_dir, img_dir = write_synthetic_dataset(
            str(tmp_path), n_frames=24, drift=1
        )
        out_dir = str(tmp_path / "aug")
        job = PreprocessJob(
            annotation_dir=anno_dir, image_dir=img_dir, output_dir=out_dir,
            data=DataConfig(),
        )
        root = os.path.join(anno_dir, "train_seq00")
        n = process_sequence_augmented(job, root, seq_length=6, seed=0)
        assert n > 0 and n % 6 == 0
        dirs = sorted(os.listdir(out_dir))
        assert all(d.startswith("train_seq00_0_aug") for d in dirs)
        assert len(dirs) == n // 6
        # the live .txt/.bin contract round-trips through the loader reader
        d0 = os.path.join(out_dir, dirs[0])
        stems = sorted(f[:-4] for f in os.listdir(d0) if f.endswith(".txt"))
        assert len(stems) == 6
        rec = read_frame_record(os.path.join(d0, stems[0]))
        assert rec["y_offset"] == 0.0 and rec["x_offset"] == 0.0
        assert rec["gt"].shape == (8, 8)

        # deterministic: same seed -> identical tree
        out2 = str(tmp_path / "aug2")
        job2 = PreprocessJob(
            annotation_dir=anno_dir, image_dir=img_dir, output_dir=out2,
            data=DataConfig(),
        )
        n2 = process_sequence_augmented(job2, root, seq_length=6, seed=0)
        assert n2 == n
        assert sorted(os.listdir(out2)) == dirs
        for d in dirs:
            for f in os.listdir(os.path.join(out_dir, d)):
                a = open(os.path.join(out_dir, d, f), "rb").read()
                b = open(os.path.join(out2, d, f), "rb").read()
                assert a == b, (d, f)
