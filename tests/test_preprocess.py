"""Offline preprocessor round-trip: synthetic XML annotations -> sequence
dirs -> frame records, matching the reference's on-disk contract."""

import os

import numpy as np
import pytest

from ntm_tracker_tpu.config import DataConfig
from ntm_tracker_tpu.data import geometry
from ntm_tracker_tpu.data.preprocess import (
    PreprocessJob,
    find_sequence_dirs,
    parse_frame,
    process_sequence,
    read_frame_record,
    run_preprocess,
)
from ntm_tracker_tpu.data.sequences import get_valid_sequences, sevenbyseven_get_batch

XML_TMPL = """<annotation>
  <folder>VID/train/{seq}</folder>
  <filename>{frame}</filename>
  <size><width>{w}</width><height>{h}</height></size>
  {objects}
</annotation>"""

OBJ_TMPL = """<object>
    <trackid>{tid}</trackid>
    <bndbox><xmax>{x2}</xmax><xmin>{x1}</xmin><ymax>{y2}</ymax><ymin>{y1}</ymin></bndbox>
  </object>"""


def write_synthetic_dataset(root, n_frames=6, w=640, h=360, drift=2):
    anno_dir = os.path.join(root, "anno", "train_seq00")
    os.makedirs(anno_dir, exist_ok=True)
    img_dir = os.path.join(root, "imgs")
    for i in range(n_frames):
        x1, y1 = 200 + drift * i, 100 + drift * i
        objs = OBJ_TMPL.format(tid=0, x1=x1, y1=y1, x2=x1 + 120, y2=y1 + 90)
        with open(os.path.join(anno_dir, f"{i:06d}.xml"), "w") as f:
            f.write(
                XML_TMPL.format(seq="train_seq00", frame=f"{i:06d}", w=w, h=h, objects=objs)
            )
    return os.path.join(root, "anno"), img_dir


class TestPreprocess:
    def test_round_trip(self, tmp_path):
        anno_dir, img_dir = write_synthetic_dataset(str(tmp_path))
        out_dir = str(tmp_path / "cropped")
        job = PreprocessJob(annotation_dir=anno_dir, image_dir=img_dir,
                            output_dir=out_dir, data=DataConfig())
        n = run_preprocess(job, num_workers=1)
        assert n == 6
        seq_dirs = os.listdir(out_dir)
        assert seq_dirs == ["train_seq00_0"]
        sd = os.path.join(out_dir, "train_seq00_0")
        files = sorted(os.listdir(sd))
        assert "000000.txt" in files and "000000.bin" in files

        rec0 = read_frame_record(os.path.join(sd, "000000"))
        # first frame: offsets are zero; bbox is the canonical centered box
        assert rec0["y_offset"] == 0.0 and rec0["x_offset"] == 0.0
        np.testing.assert_allclose(
            rec0["bbox"], geometry.initial_transformed_bbox(8, 6), atol=1e-12
        )
        np.testing.assert_allclose(rec0["gt"].sum(), 1.0, rtol=1e-5)
        assert rec0["image_path"].endswith("train_seq00/000000.JPEG")

        # later frame: positive drift in both axes -> positive offsets
        rec3 = read_frame_record(os.path.join(sd, "000003"))
        assert rec3["y_offset"] > 0 and rec3["x_offset"] > 0
        # offsets equal the center delta of the transformed bbox
        dy, dx = geometry.calculate_offsets(
            rec3["bbox"], geometry.initial_transformed_bbox(8, 6)
        )
        np.testing.assert_allclose([rec3["y_offset"], rec3["x_offset"]], [dy, dx], atol=1e-6)

    def test_bin_is_float64_contract(self, tmp_path):
        # the on-disk heatmap is float64 (preprocess.py:322), read back as
        # float32 (direct_offset_output.py:215)
        anno_dir, img_dir = write_synthetic_dataset(str(tmp_path))
        out_dir = str(tmp_path / "cropped")
        run_preprocess(
            PreprocessJob(anno_dir, img_dir, out_dir), num_workers=1
        )
        binpath = os.path.join(out_dir, "train_seq00_0", "000000.bin")
        raw = np.fromfile(binpath, np.float64)
        assert raw.size == 64
        rec = read_frame_record(binpath[:-4])
        assert rec["gt"].dtype == np.float32

    def test_illegal_frames_skipped(self, tmp_path):
        # a frame where the object teleports out of the cropbox is dropped
        anno_dir, img_dir = write_synthetic_dataset(str(tmp_path), n_frames=3, drift=0)
        # overwrite frame 1 with a far-away bbox
        with open(os.path.join(anno_dir, "train_seq00", "000001.xml"), "w") as f:
            objs = OBJ_TMPL.format(tid=0, x1=10, y1=10, x2=130, y2=100)
            f.write(XML_TMPL.format(seq="train_seq00", frame="000001", w=640, h=360, objects=objs))
        out_dir = str(tmp_path / "cropped")
        n = run_preprocess(PreprocessJob(anno_dir, img_dir, out_dir), num_workers=1)
        assert n == 2
        files = sorted(os.listdir(os.path.join(out_dir, "train_seq00_0")))
        assert "000001.txt" not in files


class TestSequences:
    def _mk(self, tmp_path, name, n):
        d = tmp_path / name
        d.mkdir()
        for i in range(n):
            (d / f"{i:06d}.txt").write_text("x")
        return str(d)

    def test_length_filter_and_dilation(self, tmp_path):
        self._mk(tmp_path, "train_a", 45)  # skip=2 -> 20 of 45
        self._mk(tmp_path, "val_b", 20)    # skip=1 -> all 20
        self._mk(tmp_path, "train_c", 7)   # too short -> dropped
        result, train, val = get_valid_sequences(str(tmp_path), min_length=20)
        assert len(result) == 2 and len(train) == 1 and len(val) == 1
        _, frames = train[0]
        assert len(frames) == 20
        assert frames[0] == "000000" and frames[1] == "000002"  # dilated by 2

    def test_unlabeled_dir_raises(self, tmp_path):
        self._mk(tmp_path, "other_x", 25)
        with pytest.raises(ValueError):
            get_valid_sequences(str(tmp_path), min_length=20)

    def test_get_batch_concatenates(self, tmp_path):
        a = self._mk(tmp_path, "train_a", 20)
        b = self._mk(tmp_path, "train_b", 20)
        _, train, _ = get_valid_sequences(str(tmp_path), min_length=20)
        names, idx = sevenbyseven_get_batch(0, 2, train)
        assert len(names) == 40 and idx == 2
        assert names[0] == os.path.join(a, "000000")
