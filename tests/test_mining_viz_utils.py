"""Tests for dataset mining, visualizers, and legacy utils."""

import os

import numpy as np
import pytest

from ntm_tracker_tpu.data import mining
from ntm_tracker_tpu.utils import viz
from ntm_tracker_tpu.utils.misc import (
    circular_convolution_1d,
    decaying_softmax,
    pairwise_add,
    progress,
)


class TestPriorBoxIoU:
    def test_full_image_bbox_high_iou_everywhere_sums(self):
        dims = {"conv4_3": (None, 4, 4, 512)}
        heat, ious = mining.prior_box_iou_maps(
            dims, ["conv4_3"], (100, 100), [(0, 0), (100, 100)]
        )
        # each prior is 1/16 of the image -> IoU = 1/16 with the full box
        np.testing.assert_allclose(ious[0], 1 / 16, rtol=1e-12)
        assert heat[0].sum() == 0  # all below 0.5

    def test_matching_prior(self):
        dims = {"conv4_3": (None, 4, 4, 512)}
        # bbox exactly equal to prior (1,2)
        heat, ious = mining.prior_box_iou_maps(
            dims, ["conv4_3"], (100, 100), [(50, 25), (75, 50)]
        )
        assert ious[0][1, 2] == 1.0
        assert heat[0][1, 2] == 1.0
        assert heat[0].sum() == 1.0

    def test_vgg_layer_sizes(self):
        sizes = mining.vgg_layer_sizes(224)
        assert sizes["conv4_3"] == (None, 28, 28, 512)
        assert sizes["conv1_1"] == (None, 224, 224, 64)


class TestGenSequences:
    def _stat(self, seq, frame, obj, iou_peak):
        iou = np.zeros((4, 4))
        iou[1, 1] = iou_peak
        return (seq, frame, obj, (100, 100), [(0, 0), (10, 10)], [iou])

    def test_splits_on_gap_and_low_iou(self):
        stats = [
            self._stat("s", "000000", "s_0", 0.9),
            self._stat("s", "000001", "s_0", 0.9),
            self._stat("s", "000002", "s_0", 0.1),  # fails threshold -> split
            self._stat("s", "000003", "s_0", 0.9),
            self._stat("s", "000005", "s_0", 0.9),  # gap -> split
        ]
        seqs = mining.gen_sequences(stats, iou_threshold=0.5)
        lengths = sorted(s[3] for s in seqs)
        assert lengths == [1, 1, 2]
        # all single-object
        assert all(s[1] == "s_0" for s in seqs)

    def test_multiple_objects_separated(self):
        stats = [
            self._stat("s", "000000", "s_0", 0.9),
            self._stat("s", "000001", "s_0", 0.9),
            self._stat("s", "000000", "s_1", 0.9),
        ]
        seqs = mining.gen_sequences(stats)
        objs = sorted(s[1] for s in seqs)
        assert objs == ["s_0", "s_1"]


class TestStatisticsWalk:
    def test_get_statistics(self, tmp_path):
        anno = tmp_path / "anno" / "seq"
        anno.mkdir(parents=True)
        (anno / "000000.xml").write_text(
            "<annotation><folder>seq</folder><filename>000000</filename>"
            "<size><width>64</width><height>48</height></size>"
            "<object><trackid>0</trackid><bndbox>"
            "<xmax>20</xmax><xmin>10</xmin><ymax>30</ymax><ymin>15</ymin>"
            "</bndbox></object></annotation>"
        )
        stats = mining.get_statistics([str(tmp_path / "img")], [str(tmp_path / "anno")])
        assert len(stats) == 1
        rec = stats[0]
        assert rec.size == (64.0, 48.0)
        assert rec.image_path.endswith("seq/000000.JPEG")
        assert rec.objects[0].trackid == "0"
        assert rec.objects[0].bbox == mining.Corners(
            xmin=10.0, ymin=15.0, xmax=20.0, ymax=30.0
        )


class TestViz:
    def test_save_imgs_grid(self, tmp_path):
        imgs = [
            (np.random.rand(2, 3, 8, 8, 3) * 255).astype(np.uint8),
            np.random.rand(2, 3, 2).astype(np.float32) - 0.5,
        ]
        path = viz.save_imgs(imgs, "step_0_train", str(tmp_path))
        assert os.path.exists(path) and os.path.getsize(path) > 0

    def test_label_vot_sequence(self, tmp_path):
        from PIL import Image

        for i in range(2):
            Image.new("RGB", (32, 24)).save(tmp_path / f"{i:08d}.jpg")
        (tmp_path / "groundtruth.txt").write_text(
            "1,1,10,1,10,10,1,10\n2,2,12,2,12,12,2,12\n"
        )
        out = viz.label_vot_sequence(str(tmp_path))
        assert sorted(os.listdir(out)) == ["00000000.jpg", "00000001.jpg"]


class TestLegacyUtils:
    def test_pairwise_add(self):
        import jax.numpy as jnp

        u = jnp.array([1.0, 2.0])
        v = jnp.array([10.0, 20.0, 30.0])
        np.testing.assert_array_equal(
            np.asarray(pairwise_add(u, v)), [[11, 21, 31], [12, 22, 32]]
        )

    def test_decaying_softmax_rows_sum_to_one(self):
        out = decaying_softmax((3, 5), axis=1)
        np.testing.assert_allclose(out.sum(1), np.ones(3), rtol=1e-6)
        assert (np.diff(out[0]) < 0).all()  # decaying

    def test_legacy_circular_conv_symmetric(self):
        import jax.numpy as jnp

        v = jnp.arange(5.0)
        k = jnp.array([0.0, 1.0, 0.0])  # identity kernel, centered
        out = circular_convolution_1d(v, k)
        np.testing.assert_allclose(np.asarray(out), np.arange(5.0))

    def test_progress_writes(self, capsys):
        import io

        buf = io.StringIO()
        progress(5, 10, out=buf)
        assert "50.0%" in buf.getvalue()
