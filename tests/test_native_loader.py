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


class TestNativeJpegPipeline:
    """native/jpeg_pipeline.cpp: libjpeg decode + TF1 bilinear resize in a
    C++ thread pool, vs the PIL+numpy path."""

    def _write_jpegs(self, tmp_path, sizes, quality=95):
        from PIL import Image

        rng = np.random.RandomState(0)
        paths = []
        for i, (w, h) in enumerate(sizes):
            arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            p = str(tmp_path / f"img{i}.jpg")
            Image.fromarray(arr).save(p, quality=quality)
            paths.append(p)
        return paths

    def test_matches_pil_numpy_path(self, tmp_path):
        pytest.importorskip("PIL")
        from ntm_tracker_tpu.data.loader import _decode_image
        from ntm_tracker_tpu.data.native_jpeg import decode_resize_batch_native

        try:
            paths = self._write_jpegs(
                tmp_path, [(64, 48), (100, 70), (48, 64), (33, 57)]
            )
            got = decode_resize_batch_native(paths, (40, 56))
        except RuntimeError as e:
            pytest.skip(f"native jpeg pipeline unavailable: {e}")
        assert got.shape == (4, 40, 56, 3) and got.dtype == np.float32
        for i, p in enumerate(paths):
            ref = _decode_image(p, (40, 56))
            # PIL and libjpeg use the same IDCT family; decoded pixels agree
            # and the resize arithmetic is term-identical float32
            np.testing.assert_allclose(got[i], ref, atol=1.0)
            assert float(np.abs(got[i] - ref).mean()) < 0.05

    def test_identity_size_passthrough(self, tmp_path):
        pytest.importorskip("PIL")
        from ntm_tracker_tpu.data.loader import _decode_image
        from ntm_tracker_tpu.data.native_jpeg import decode_resize_batch_native

        try:
            paths = self._write_jpegs(tmp_path, [(32, 24), (32, 24)])
            got = decode_resize_batch_native(paths, (24, 32))
        except RuntimeError as e:
            pytest.skip(f"native jpeg pipeline unavailable: {e}")
        for i, p in enumerate(paths):
            np.testing.assert_allclose(got[i], _decode_image(p, (24, 32)), atol=1.0)

    def test_bad_file_raises_and_loader_falls_back(self, tmp_path):
        pytest.importorskip("PIL")
        from ntm_tracker_tpu.data.native_jpeg import decode_resize_batch_native

        bad = tmp_path / "broken.jpg"
        bad.write_bytes(b"not a jpeg at all")
        good = self._write_jpegs(tmp_path, [(32, 24)])
        try:
            with pytest.raises(RuntimeError):
                decode_resize_batch_native([good[0], str(bad)], (24, 32))
        except pytest.fail.Exception:
            raise
        except RuntimeError as e:
            pytest.skip(f"native jpeg pipeline unavailable: {e}")


def test_native_rejects_truncated_oversize_record(tmp_path):
    """A .txt record longer than the reader's buffer must FAIL (the
    truncation could clip the trailing dx field's digits into a silently
    wrong offset), not parse."""
    import os

    d = tmp_path / "seq"
    d.mkdir()
    long_path = "/img/" + "x" * 4200 + ".JPEG"  # pushes the line past 4095
    (d / "000000.txt").write_text(
        "0.1,0.2,0.8,0.9,0.125,0.125,0.875,0.875," + long_path + ",0.05,-0.0625"
    )
    (np.ones((8, 8)) / 64).astype(np.float64).tofile(str(d / "000000.bin"))
    with pytest.raises(IOError, match="record"):
        load_records_native([str(d / "000000")], gt_width=8)


def test_native_accepts_record_exactly_filling_buffer(tmp_path):
    """A valid record of EXACTLY 4095 bytes (the reader's capacity) must
    load — only records larger than the buffer are rejected."""
    import os

    d = tmp_path / "seq"
    d.mkdir()
    path = "/img/" + "x" * 500 + ".JPEG"
    rest = ",0.2,0.8,0.9,0.125,0.125,0.875,0.875," + path + ",0.05,-0.0625"
    # pad the first numeric field with leading zeros to land on 4095 exactly
    record = "0" * (4095 - len(rest) - len("0.1")) + "0.1" + rest
    assert len(record) == 4095
    (d / "000000.txt").write_text(record)
    (np.ones((8, 8)) / 64).astype(np.float64).tofile(str(d / "000000.bin"))
    crop, _bbox, off, _gts, img_paths = load_records_native(
        [str(d / "000000")], gt_width=8
    )
    np.testing.assert_allclose(crop[0][0], 0.1, rtol=1e-6)
    np.testing.assert_allclose(off[0], [0.05, -0.0625], rtol=1e-6)
    assert img_paths[0] == path
