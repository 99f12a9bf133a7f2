"""Geometry + Gaussian gt tests, porting the reference's inline self-tests
(preprocess.py:152-157, :223-226) plus round-trip invariants."""

import numpy as np
import pytest

from ntm_tracker_tpu.data import geometry


class TestTransform:
    def test_calculate_transformation(self):
        # preprocess.py:152-157: the cropbox maps to the unit square
        cropbox = [0.3, 0.4, 0.5, 0.6]
        t = geometry.calculate_transformation(cropbox)
        out = geometry.apply_transformation(cropbox, t)
        np.testing.assert_almost_equal(out, [0, 0, 1, 1])

    def test_inverse_round_trip(self):
        # test_tracker.py:257-272 decodes via the matrix inverse
        cropbox = [0.1, 0.25, 0.7, 0.95]
        t = geometry.calculate_transformation(cropbox)
        bbox = [0.3, 0.4, 0.55, 0.8]
        fwd = geometry.apply_transformation(bbox, t)
        back = geometry.apply_transformation(fwd, np.linalg.inv(t))
        np.testing.assert_allclose(back, bbox, atol=1e-12)

    def test_cropbox_enlarge_ratio(self):
        bbox = [0.4, 0.4, 0.6, 0.6]
        crop = geometry.calculate_cropbox(bbox, 8, 6)
        # centered, enlarged by 8/6
        np.testing.assert_allclose(
            crop, [0.5 - 0.1 * 8 / 6, 0.5 - 0.1 * 8 / 6, 0.5 + 0.1 * 8 / 6, 0.5 + 0.1 * 8 / 6]
        )

    def test_initial_transformed_bbox_centered(self):
        b = geometry.initial_transformed_bbox(8, 6)
        np.testing.assert_allclose(b, [0.5 - 3 / 8, 0.5 - 3 / 8, 0.5 + 3 / 8, 0.5 + 3 / 8])
        # and the affine of the cropbox around any bbox maps the bbox there
        bbox = [0.2, 0.3, 0.4, 0.5]
        crop = geometry.calculate_cropbox(bbox, 8, 6)
        t = geometry.calculate_transformation(crop)
        np.testing.assert_allclose(geometry.apply_transformation(bbox, t), b, atol=1e-12)

    def test_offsets_roundtrip(self):
        init = geometry.initial_transformed_bbox(8, 6)
        moved = [v + d for v, d in zip(init, [0.1, -0.05, 0.1, -0.05])]
        dy, dx = geometry.calculate_offsets(moved, init)
        np.testing.assert_allclose([dy, dx], [0.1, -0.05], atol=1e-12)
        np.testing.assert_allclose(geometry.offset_bbox(init, (dy, dx)), moved, atol=1e-12)

    def test_normalize_bbox_uses_dim_minus_one(self):
        # preprocess.py:73-79 divides by (dim-1)
        out = geometry.normalize_bbox((101, 51), [0, 0, 50, 100])
        np.testing.assert_allclose(out, [0, 0, 1.0, 1.0])


class TestBBoxLegal:
    CROP = [0.2, 0.2, 0.8, 0.8]

    def test_centered_ok(self):
        bbox = geometry.apply_transformation(
            [0.5 - 3 / 8 * 0.6, 0.5 - 3 / 8 * 0.6, 0.5 + 3 / 8 * 0.6, 0.5 + 3 / 8 * 0.6],
            np.eye(3),
        )
        assert geometry.bbox_legal(bbox, self.CROP, 8, 6, 0.5, 0.5)

    def test_out_of_bounds_rejected(self):
        bbox = [0.1, 0.4, 0.6, 0.6]
        assert not geometry.bbox_legal(bbox, self.CROP, 8, 6, 0.5, 0.5)

    def test_overzoomed_rejected(self):
        tiny = [0.48, 0.48, 0.52, 0.52]
        assert not geometry.bbox_legal(tiny, self.CROP, 8, 6, 0.5, 0.5)

    def test_deformed_rejected(self):
        squished = [0.45, 0.25, 0.55, 0.75]  # 5:1 aspect vs square crop
        assert not geometry.bbox_legal(squished, self.CROP, 8, 6, 0.5, 0.5)


class TestGaussian:
    def test_discrete_gauss_matches_matlab_fspecial(self):
        # preprocess.py:223-226
        np.testing.assert_almost_equal(
            geometry.discrete_gauss(), geometry.matlab_style_gauss2D((7, 7), 0.75)
        )

    def test_generate_gt_peak_at_center(self):
        gt = geometry.generate_gt([0.25, 0.25, 0.75, 0.75], 8, 6, focus=3)
        assert gt.shape == (8, 8)
        assert gt.dtype == np.float64
        np.testing.assert_allclose(gt.sum(), 1.0, rtol=1e-12)
        # peak at the center 2x2 of the 8x8 grid
        peak = np.unravel_index(np.argmax(gt), gt.shape)
        assert peak in [(3, 3), (3, 4), (4, 3), (4, 4)]

    def test_off_center_peak_moves(self):
        gt = geometry.generate_gt([0.0, 0.5, 0.25, 1.0], 8, 6, focus=6)
        peak = np.unravel_index(np.argmax(gt), gt.shape)
        assert peak[0] <= 1 and peak[1] >= 5


class TestIoU:
    def test_identical(self):
        assert geometry.bb_iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0

    def test_disjoint_convention(self):
        # reference uses the +1 area convention; just check ordering
        a = geometry.bb_iou([0, 0, 10, 10], [0, 0, 5, 5])
        b = geometry.bb_iou([0, 0, 10, 10], [0, 0, 2, 2])
        assert a > b > 0
