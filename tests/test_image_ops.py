"""TF-semantics sampler tests: crop_and_resize and TF1 bilinear resize."""

import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.data.image_ops import (
    crop_and_resize,
    preprocess_frame,
    tf1_resize_bilinear,
)


def _cr_oracle(image, box, out_h, out_w, extrapolation=0.0):
    """Independent numpy oracle of tf.image.crop_and_resize bilinear
    semantics (corner-aligned in-box grid, extrapolate 0)."""
    H, W, C = image.shape
    y1, x1, y2, x2 = box
    out = np.full((out_h, out_w, C), extrapolation, np.float64)
    for i in range(out_h):
        in_y = y1 * (H - 1) + i * (y2 - y1) * (H - 1) / (out_h - 1) if out_h > 1 else 0.5 * (y1 + y2) * (H - 1)
        if in_y < 0 or in_y > H - 1:
            continue
        for j in range(out_w):
            in_x = x1 * (W - 1) + j * (x2 - x1) * (W - 1) / (out_w - 1) if out_w > 1 else 0.5 * (x1 + x2) * (W - 1)
            if in_x < 0 or in_x > W - 1:
                continue
            ty = int(np.floor(in_y)); by = min(ty + 1, H - 1); fy = in_y - ty
            lx = int(np.floor(in_x)); rx = min(lx + 1, W - 1); fx = in_x - lx
            top = image[ty, lx] * (1 - fx) + image[ty, rx] * fx
            bot = image[by, lx] * (1 - fx) + image[by, rx] * fx
            out[i, j] = top * (1 - fy) + bot * fy
    return out


class TestCropAndResize:
    def test_identity_crop(self):
        rng = np.random.RandomState(0)
        img = rng.rand(8, 8, 3).astype(np.float32)
        out = crop_and_resize(jnp.array(img[None]), jnp.array([[0, 0, 1, 1]], jnp.float32), (8, 8))
        np.testing.assert_allclose(np.asarray(out[0]), img, atol=1e-6)

    def test_matches_oracle_random_boxes(self):
        rng = np.random.RandomState(1)
        img = rng.rand(12, 10, 2).astype(np.float32)
        boxes = np.array(
            [[0.1, 0.2, 0.8, 0.9], [-0.2, 0.3, 0.5, 1.3], [0.0, 0.0, 1.0, 1.0]],
            np.float32,
        )
        out = np.asarray(
            crop_and_resize(jnp.array(np.stack([img] * 3)), jnp.array(boxes), (7, 5))
        )
        for b in range(3):
            want = _cr_oracle(img, boxes[b], 7, 5)
            np.testing.assert_allclose(out[b], want, atol=1e-5)

    def test_extrapolation_zero(self):
        img = np.ones((6, 6, 1), np.float32)
        out = np.asarray(
            crop_and_resize(jnp.array(img[None]), jnp.array([[-1.0, -1.0, 0.0, 0.0]], jnp.float32), (4, 4))
        )
        # most samples fall outside; only the last row/col corner is inside
        assert out[0, 0, 0, 0] == 0.0
        assert out[0, -1, -1, 0] == 1.0

    def test_zoom_in_interpolates(self):
        img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
        # crop the center 2x2 region exactly: normalized by (dim-1)
        box = np.array([[1 / 3, 1 / 3, 2 / 3, 2 / 3]], np.float32)
        out = np.asarray(crop_and_resize(jnp.array(img[None]), jnp.array(box), (2, 2)))
        np.testing.assert_allclose(out[0, :, :, 0], [[5, 6], [9, 10]], atol=1e-5)


class TestTF1Resize:
    def test_integer_upscale_replicates_tf1_grid(self):
        # TF1 align_corners=False: src = i * in/out; 2x upscale of [a,b] ->
        # [a, (a+b)/2, b, b]
        img = np.array([[[1.0], [3.0]]], np.float32)  # [1,2,1]
        out = np.asarray(tf1_resize_bilinear(jnp.array(img), (1, 4)))
        np.testing.assert_allclose(out[0, :, 0], [1.0, 2.0, 3.0, 3.0], atol=1e-6)

    def test_identity(self):
        rng = np.random.RandomState(2)
        img = rng.rand(5, 7, 3).astype(np.float32)
        out = np.asarray(tf1_resize_bilinear(jnp.array(img), (5, 7)))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_downscale_average_free(self):
        # TF1 bilinear downscale is point sampling on the i*scale grid
        img = np.arange(8, dtype=np.float32).reshape(1, 8, 1)
        out = np.asarray(tf1_resize_bilinear(jnp.array(img), (1, 4)))
        np.testing.assert_allclose(out[0, :, 0], [0, 2, 4, 6], atol=1e-6)

    def test_batched(self):
        rng = np.random.RandomState(3)
        imgs = rng.rand(2, 6, 6, 3).astype(np.float32)
        out = np.asarray(tf1_resize_bilinear(jnp.array(imgs), (3, 3)))
        assert out.shape == (2, 3, 3, 3)


class TestPreprocessFrame:
    def test_shapes_and_mean_subtraction(self):
        rng = np.random.RandomState(4)
        img = (rng.rand(90, 160, 3) * 255).astype(np.uint8)
        out = np.asarray(
            preprocess_frame(
                jnp.array(img), jnp.array([0.2, 0.2, 0.8, 0.8], jnp.float32),
                resize_hw=(45, 80), crop_size=32,
            )
        )
        assert out.shape == (32, 32, 3)
        # mean-subtracted: values are roughly centered
        assert out.mean() < 60 and out.mean() > -60


class TestCropAndResizeMM:
    """The separable-matmul crop (TPU device-loop fast path) must match the
    gather formulation — same sample grid, same extrapolation mask; on CPU
    f32 einsums the difference is accumulation-order rounding only."""

    def test_matches_gather_formulation(self):
        from ntm_tracker_tpu.data.image_ops import crop_and_resize_mm

        rng = np.random.RandomState(7)
        imgs = jnp.asarray(rng.rand(4, 37, 53, 3).astype(np.float32) * 255)
        boxes = jnp.asarray(
            np.stack([
                [0.1, 0.2, 0.7, 0.9],
                [-0.2, -0.1, 0.5, 0.6],   # spills past the top-left
                [0.4, 0.5, 1.3, 1.2],     # spills past the bottom-right
                [0.0, 0.0, 1.0, 1.0],     # identity-ish full box
            ]).astype(np.float32)
        )
        ref = np.asarray(crop_and_resize(imgs, boxes, (24, 16)))
        got = np.asarray(crop_and_resize_mm(imgs, boxes, (24, 16)))
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_extrapolation_value(self):
        from ntm_tracker_tpu.data.image_ops import crop_and_resize_mm

        rng = np.random.RandomState(8)
        imgs = jnp.asarray(rng.rand(1, 10, 10, 1).astype(np.float32))
        boxes = jnp.asarray([[-1.0, -1.0, -0.2, -0.2]], jnp.float32)  # fully outside
        out = np.asarray(crop_and_resize_mm(imgs, boxes, (4, 4),
                                            extrapolation_value=7.5))
        np.testing.assert_allclose(out, 7.5)

    def test_single_pixel_output(self):
        from ntm_tracker_tpu.data.image_ops import crop_and_resize_mm

        rng = np.random.RandomState(9)
        imgs = jnp.asarray(rng.rand(2, 9, 9, 2).astype(np.float32))
        boxes = jnp.asarray([[0.2, 0.2, 0.6, 0.6], [0.0, 0.0, 1.0, 1.0]],
                            jnp.float32)
        ref = np.asarray(crop_and_resize(imgs, boxes, (1, 1)))
        got = np.asarray(crop_and_resize_mm(imgs, boxes, (1, 1)))
        np.testing.assert_allclose(got, ref, atol=1e-5)
