"""Native C++ record loader vs the pure-Python reader."""

import numpy as np
import pytest

from ntm_tracker_tpu.config import DataConfig
from ntm_tracker_tpu.data.native_loader import load_records_native, native_available
from ntm_tracker_tpu.data.preprocess import PreprocessJob, read_frame_record, run_preprocess

from tests.test_preprocess import write_synthetic_dataset

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable; native loader not built"
)


def test_native_matches_python(tmp_path):
    anno_dir, img_dir = write_synthetic_dataset(str(tmp_path), n_frames=6)
    out_dir = str(tmp_path / "cropped")
    run_preprocess(PreprocessJob(anno_dir, img_dir, out_dir), num_workers=1)
    import os

    sd = os.path.join(out_dir, "train_seq00_0")
    paths = [os.path.join(sd, f"{i:06d}") for i in range(6)]

    crop, bbox, off, gts, img_paths = load_records_native(paths, gt_width=8)
    for i, p in enumerate(paths):
        rec = read_frame_record(p)
        np.testing.assert_allclose(crop[i], rec["cropbox"], rtol=1e-6)
        np.testing.assert_allclose(bbox[i], rec["bbox"], rtol=1e-6)
        np.testing.assert_allclose(
            off[i], [rec["y_offset"], rec["x_offset"]], rtol=1e-6
        )
        np.testing.assert_allclose(gts[i], rec["gt"], rtol=1e-6)
        assert img_paths[i] == rec["image_path"]


def test_native_missing_file_reports_index(tmp_path):
    anno_dir, img_dir = write_synthetic_dataset(str(tmp_path), n_frames=3)
    out_dir = str(tmp_path / "cropped")
    run_preprocess(PreprocessJob(anno_dir, img_dir, out_dir), num_workers=1)
    import os

    sd = os.path.join(out_dir, "train_seq00_0")
    paths = [os.path.join(sd, "000000"), os.path.join(sd, "does_not_exist")]
    with pytest.raises(IOError, match="does_not_exist"):
        load_records_native(paths, gt_width=8)
