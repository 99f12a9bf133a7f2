"""Host TF1 resize (loader) and device TF1 resize (image_ops) must agree —
this is what makes --device_resize a pure transfer optimization."""

import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.data.image_ops import preprocess_frame, tf1_resize_bilinear
from ntm_tracker_tpu.data.loader import tf1_resize_bilinear_np


def test_numpy_twin_matches_device_resize():
    rng = np.random.RandomState(0)
    img = (rng.rand(36, 64, 3) * 255).astype(np.uint8)
    host = tf1_resize_bilinear_np(img, (72, 128))
    dev = np.asarray(tf1_resize_bilinear(jnp.asarray(img), (72, 128)))
    np.testing.assert_allclose(host, dev, atol=1e-3)


def test_full_pipeline_raw_equals_resized():
    rng = np.random.RandomState(1)
    img = (rng.rand(45, 80, 3) * 255).astype(np.uint8)
    box = jnp.asarray([0.15, 0.2, 0.85, 0.9], jnp.float32)
    # raw path: device resizes then crops
    raw = np.asarray(
        preprocess_frame(jnp.asarray(img), box, resize_hw=(90, 160),
                         crop_size=32, do_resize=True)
    )
    # resized path: host resizes, device only crops
    host_resized = tf1_resize_bilinear_np(img, (90, 160))
    res = np.asarray(
        preprocess_frame(jnp.asarray(host_resized), box, resize_hw=(90, 160),
                         crop_size=32, do_resize=False)
    )
    np.testing.assert_allclose(raw, res, atol=1e-2)
