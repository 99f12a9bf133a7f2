"""Token serialization + loss head tests against the reference's layout
(direct_offset_output.py:439-500, 577-606)."""

import jax
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.train.serialize import (
    gather_delimiter_outputs,
    heatmap_loss,
    offsets_loss,
    serialize_streaming_frame,
    serialize_tokens,
)

B, L, F, C = 2, 3, 4, 5  # small analogue of 1x20x64x512


def make_features():
    rng = np.random.RandomState(0)
    return jnp.array(rng.rand(B, L, F, C), jnp.float32)


class TestSerializeTokens:
    def test_shape(self):
        toks = serialize_tokens(make_features(), jnp.zeros((B, F)))
        assert toks.shape == (B, L * (F + 1), C + 2)

    def test_channel_layout(self):
        feats = make_features()
        gt = jnp.array(np.random.RandomState(1).rand(B, F), jnp.float32)
        toks = np.asarray(serialize_tokens(feats, gt))
        # token order per frame: F features then 1 delimiter
        for t in range(L):
            base = t * (F + 1)
            # feature tokens carry features, delimiter bit 0
            np.testing.assert_allclose(
                toks[:, base : base + F, :C], np.asarray(feats)[:, t], atol=0
            )
            np.testing.assert_array_equal(toks[:, base : base + F, C], 0)
            # delimiter token: zeros except delimiter bit
            np.testing.assert_array_equal(toks[:, base + F, :C], 0)
            np.testing.assert_array_equal(toks[:, base + F, C], 1)
        # target channel: frame-0 features carry gt, all else zero
        np.testing.assert_allclose(toks[:, :F, C + 1], np.asarray(gt), atol=0)
        np.testing.assert_array_equal(toks[:, F:, C + 1], 0)

    def test_total_steps_matches_reference(self):
        # 20 frames x (64+1) = 1300 (direct_offset_output.py:460)
        f = jnp.zeros((1, 20, 64, 512))
        toks = serialize_tokens(f, jnp.zeros((1, 64)))
        assert toks.shape == (1, 1300, 514)


class TestStreamingFrame:
    def test_delimiter_first(self):
        # test_tracker.py:400-404: delimiter token PREPENDED at inference
        feats = jnp.ones((F, C))
        toks = np.asarray(serialize_streaming_frame(feats, None))
        assert toks.shape == (F + 1, C + 2)
        np.testing.assert_array_equal(toks[0, :C], 0)
        assert toks[0, C] == 1 and toks[0, C + 1] == 0
        np.testing.assert_array_equal(toks[1:, C], 0)

    def test_first_frame_carries_gt(self):
        gt = jnp.arange(F, dtype=jnp.float32)
        toks = np.asarray(serialize_streaming_frame(jnp.ones((F, C)), gt))
        np.testing.assert_allclose(toks[1:, C + 1], np.arange(F))


class TestOutputGather:
    def test_picks_delimiter_steps_of_frames_1_plus(self):
        T = L * (F + 1)
        logits = jnp.arange(B * T * 2, dtype=jnp.float32).reshape(B, T, 2)
        out = np.asarray(gather_delimiter_outputs(logits, F))
        assert out.shape == (B, L - 1, 2)
        # delimiter of frame t (t>=1) is global step t*(F+1) + F
        for t in range(1, L):
            np.testing.assert_array_equal(
                out[:, t - 1], np.asarray(logits)[:, t * (F + 1) + F]
            )

    def test_offsets_loss_is_half_sum_of_squares(self):
        rng = np.random.RandomState(2)
        T = L * (F + 1)
        logits = jnp.array(rng.randn(B, T, 2), jnp.float32)
        offsets = jnp.array(rng.rand(B, L, 2), jnp.float32)
        got = float(offsets_loss(logits, offsets, F))
        pred = np.tanh(np.asarray(gather_delimiter_outputs(logits, F)))
        want = 0.5 * np.sum((pred - np.asarray(offsets)[:, 1:]) ** 2)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_heatmap_loss_normalized_by_frames(self):
        rng = np.random.RandomState(3)
        T = L * (F + 1)
        logits = jnp.array(rng.randn(B, T, F), jnp.float32)
        gts = jnp.array(rng.rand(B, L, F), jnp.float32)
        gts = gts / gts.sum(-1, keepdims=True)
        got = float(heatmap_loss(logits, gts, F))
        out = np.asarray(gather_delimiter_outputs(logits, F))
        lp = out - np.log(np.exp(out).sum(-1, keepdims=True))
        want = -np.sum(np.asarray(gts)[:, 1:] * lp) / (L - 1)
        np.testing.assert_allclose(got, want, rtol=1e-5)
