"""VGG-16 prefix tests: shapes, endpoint, token gather, weight-loading maps."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.models.vgg import (
    CONV43_POINTS,
    VGG16_PREFIX,
    extract_features,
    init_vgg_params,
    load_params_npz,
    load_params_torch,
    receptive_field,
    vgg16_features,
)


class TestVGG:
    def test_conv43_points_match_reference_grid(self):
        # receptive_field_sizes.py:135-143: 8x8, stride 2, (6,6)..(20,20)
        assert len(CONV43_POINTS) == 64
        assert CONV43_POINTS[0] == (6, 6)
        assert CONV43_POINTS[7] == (6, 20)
        assert CONV43_POINTS[-1] == (20, 20)

    def test_feature_shapes_at_224(self):
        params = init_vgg_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 224, 224, 3))
        f = vgg16_features(params, x)
        assert f.shape == (1, 28, 28, 512)

    def test_endpoint_selection(self):
        params = init_vgg_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 64, 64, 3))
        f = vgg16_features(params, x, endpoint="conv3/conv3_3")
        assert f.shape == (1, 16, 16, 256)

    def test_frozen_blocks_gradient(self):
        params = init_vgg_params(jax.random.PRNGKey(1))
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))

        def loss(xi):
            return jnp.sum(vgg16_features(params, xi, endpoint="conv1/conv1_2"))

        g = jax.grad(loss)(x)
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_extract_features_slice_equals_gather(self):
        fm = jax.random.normal(jax.random.PRNGKey(3), (2, 28, 28, 5))
        fast = extract_features(fm)
        ys = jnp.array([p[0] for p in CONV43_POINTS])
        xs = jnp.array([p[1] for p in CONV43_POINTS])
        slow = fm[:, ys, xs, :]
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=0)
        assert fast.shape == (2, 64, 5)

    def test_torch_state_dict_mapping(self):
        # fabricate a torchvision-shaped state_dict and check layout mapping
        rng = np.random.RandomState(4)
        sd = {}
        torch_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]
        in_ch = 3
        for (name, out_ch, _), ti in zip(VGG16_PREFIX, torch_idx):
            sd[f"features.{ti}.weight"] = rng.randn(out_ch, in_ch, 3, 3).astype(np.float32)
            sd[f"features.{ti}.bias"] = rng.randn(out_ch).astype(np.float32)
            in_ch = out_ch
        params = load_params_torch(sd)
        w = np.asarray(params["conv1/conv1_1"]["weights"])
        assert w.shape == (3, 3, 3, 64)  # HWIO
        np.testing.assert_allclose(
            w[1, 2, 0, 5], sd["features.0.weight"][5, 0, 1, 2]
        )

    def test_npz_round_trip(self, tmp_path):
        params = init_vgg_params(jax.random.PRNGKey(5))
        flat = {}
        for name, p in params.items():
            flat[f"vgg_16/{name}/weights"] = np.asarray(p["weights"])
            flat[f"vgg_16/{name}/biases"] = np.asarray(p["biases"])
        path = str(tmp_path / "vgg.npz")
        np.savez(path, **flat)
        loaded = load_params_npz(path)
        np.testing.assert_array_equal(
            np.asarray(loaded["conv4/conv4_3"]["weights"]),
            np.asarray(params["conv4/conv4_3"]["weights"]),
        )

    def test_receptive_field_conv43(self):
        rows = receptive_field(input_size=224)
        last = rows[-1]
        # conv4_3: blob 28, absolute stride 8 (receptive_field_sizes math)
        assert last[3] == "conv4_3"
        assert last[2] == 28
        assert last[1] == 8


class TestProjectRF:
    def test_conv43_receptive_field_span(self):
        from ntm_tracker_tpu.models.vgg import project_receptive_field, receptive_field

        # conv4_3 has RF 92 and absolute stride 8 (calcRF math)
        rows = receptive_field(input_size=224)
        rf, stride = rows[-1][0], rows[-1][1]
        assert rf == 92 and stride == 8
        (y0, x0), (y1, x1) = project_receptive_field(14, 14, "conv4_3", clamp=False)
        assert y1 - y0 + 1 == rf and x1 - x0 + 1 == rf
        # stride: one feature step moves the box by 8 input pixels
        (y0b, _), _ = project_receptive_field(15, 14, "conv4_3", clamp=False)
        assert y0b - y0 == stride

    def test_clamped_at_border(self):
        from ntm_tracker_tpu.models.vgg import project_receptive_field

        (y0, x0), (y1, x1) = project_receptive_field(0, 0, "conv4_3")
        assert y0 == 0 and x0 == 0 and y1 < 92


class TestFastConv43Tokens:
    def test_exactly_matches_full_path(self):
        """vgg16_conv43_tokens == extract_features(vgg16_features(...)):
        SAME-conv interior equals VALID conv on the receptive-field slice,
        so the fast path is exact (f32)."""
        import jax

        from ntm_tracker_tpu.models.vgg import (
            extract_features,
            init_vgg_params,
            vgg16_conv43_tokens,
            vgg16_features,
        )

        params = init_vgg_params(jax.random.PRNGKey(0))
        img = jax.random.uniform(
            jax.random.PRNGKey(1), (2, 224, 224, 3), minval=-120.0, maxval=130.0
        )
        full = extract_features(vgg16_features(params, img))
        fast = vgg16_conv43_tokens(params, img)
        assert fast.shape == full.shape == (2, 64, 512)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(full))
        # the opt-in space-to-depth conv1_1 (rejected as default; see
        # _conv1_relu_s2d): same dot products, f32 sums reassociated ->
        # float-noise-close, not bitwise
        s2d = np.asarray(vgg16_conv43_tokens(params, img, conv1_s2d=True))
        scale = np.abs(np.asarray(full)).max()
        np.testing.assert_allclose(
            s2d, np.asarray(full), rtol=1e-4, atol=1e-5 * scale
        )

    def test_conv1_s2d_matches_plain_conv(self):
        """_conv1_relu_s2d == _conv_relu(VALID) on the first layer alone."""
        import jax

        from ntm_tracker_tpu.models.vgg import (
            _conv1_relu_s2d,
            _conv_relu,
            init_vgg_params,
        )

        params = init_vgg_params(jax.random.PRNGKey(5))
        p = params["conv1/conv1_1"]
        x = jax.random.uniform(
            jax.random.PRNGKey(6), (2, 20, 26, 3), minval=-100.0, maxval=100.0
        )
        plain = np.asarray(_conv_relu(x, p["weights"], p["biases"], padding="VALID"))
        s2d = np.asarray(_conv1_relu_s2d(x, p["weights"], p["biases"]))
        assert s2d.shape == plain.shape == (2, 18, 24, 64)
        np.testing.assert_allclose(s2d, plain, rtol=1e-5, atol=1e-3)

    def test_rejects_noncanonical_input(self):
        import jax
        import pytest

        from ntm_tracker_tpu.models.vgg import init_vgg_params, vgg16_conv43_tokens

        params = init_vgg_params(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="224x224"):
            vgg16_conv43_tokens(params, jnp.zeros((1, 64, 64, 3)))


@pytest.mark.slow  # int8 is a measured-negative experiment; ~4 min on CPU
class TestInt8Tokens:
    """Opt-in int8 serving path (models/vgg_int8.py): NOT exact — pinned
    here to tight-but-quantized tolerances against the exact f32 path."""

    def test_close_to_f32_path(self):
        import jax

        from ntm_tracker_tpu.models.vgg import init_vgg_params, vgg16_conv43_tokens
        from ntm_tracker_tpu.models.vgg_int8 import vgg16_conv43_tokens_int8

        params = init_vgg_params(jax.random.PRNGKey(0))
        img = jax.random.uniform(
            jax.random.PRNGKey(1), (2, 224, 224, 3), minval=-120.0, maxval=130.0
        )
        t32 = np.asarray(vgg16_conv43_tokens(params, img))
        t8 = np.asarray(vgg16_conv43_tokens_int8(params, img))
        assert t8.shape == t32.shape == (2, 64, 512)
        num = (t32 * t8).sum(-1)
        den = (
            np.linalg.norm(t32, axis=-1) * np.linalg.norm(t8, axis=-1) + 1e-12
        )
        cos = num / den
        rel = np.linalg.norm(t8 - t32) / np.linalg.norm(t32)
        # measured 0.9995 min cosine / 0.029 rel-l2 at random init; gate at
        # 3x headroom so trained weights and platform rounding stay green
        assert cos.min() > 0.995, cos.min()
        assert rel < 0.09, rel

    def test_batch_independent(self):
        """Per-sample activation scales: a crop's tokens must not change
        with its batchmates (fleet serving vs B=1 streaming parity)."""
        import jax

        from ntm_tracker_tpu.models.vgg import init_vgg_params
        from ntm_tracker_tpu.models.vgg_int8 import vgg16_conv43_tokens_int8

        params = init_vgg_params(jax.random.PRNGKey(0))
        a = jax.random.uniform(
            jax.random.PRNGKey(3), (1, 224, 224, 3), minval=-120.0, maxval=130.0
        )
        # batchmate with a 10x larger dynamic range
        b = a * 0 + jax.random.uniform(
            jax.random.PRNGKey(4), (1, 224, 224, 3), minval=-1200.0, maxval=1300.0
        )
        solo = np.asarray(vgg16_conv43_tokens_int8(params, a))
        paired = np.asarray(
            vgg16_conv43_tokens_int8(params, jnp.concatenate([a, b], axis=0))
        )[0:1]
        np.testing.assert_array_equal(solo, paired)

    def test_weight_quantization_roundtrip(self):
        import jax

        from ntm_tracker_tpu.models.vgg_int8 import _quantize_weights

        w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 16)) * 0.3
        w_q, scale = _quantize_weights(w)
        assert w_q.dtype == jnp.int8 and scale.shape == (16,)
        err = np.abs(np.asarray(w_q, np.float32) * np.asarray(scale) - np.asarray(w))
        # symmetric rounding: worst error half a quantization step per channel
        assert (err <= np.asarray(scale) / 2 + 1e-7).all()

    def test_rejects_noncanonical_input(self):
        import jax
        import pytest

        from ntm_tracker_tpu.models.vgg import init_vgg_params
        from ntm_tracker_tpu.models.vgg_int8 import vgg16_conv43_tokens_int8

        params = init_vgg_params(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="224x224"):
            vgg16_conv43_tokens_int8(params, jnp.zeros((1, 64, 64, 3)))

    def test_frame_tokens_rejects_int8_off_canonical_config(self):
        """vgg_int8=True must never silently serve the exact path: a config
        where the fast-conv43 route can't engage (custom feature grid,
        non-224 crop) raises instead of quietly dequantizing nothing."""
        import dataclasses

        import jax
        import pytest

        from ntm_tracker_tpu.models.vgg import init_vgg_params
        from ntm_tracker_tpu.tracking.demo import demo_config
        from ntm_tracker_tpu.train.experiments import frame_tokens

        cfg = dataclasses.replace(demo_config(), vgg_int8=True)
        params = init_vgg_params(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="vgg_int8"):
            frame_tokens(cfg, params, jnp.zeros((1, 64, 64, 3)))
