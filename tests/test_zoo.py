"""Experiment-zoo tests: sequential stream layout, whole-frame/two-step,
LSTM baseline, compressor, sanity checks, find_validation_batch."""

import jax
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.config import NTMConfig
from ntm_tracker_tpu.models.ntm_cell import init_ntm_params
from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll
from ntm_tracker_tpu.train import zoo

B, L, F, C = 2, 3, 4, 6


def feats(seed=0):
    return jnp.array(np.random.RandomState(seed).rand(B, L, F, C), jnp.float32)


def gts(seed=1):
    g = np.random.RandomState(seed).rand(B, L, F).astype(np.float32)
    return jnp.array(g / g.sum(-1, keepdims=True))


class TestSequentialStream:
    def test_shape_and_layout(self):
        toks = np.asarray(zoo.serialize_sequential_tokens(feats(), gts()[:, 0, :]))
        T = zoo.sequential_total_steps(F, L)
        assert toks.shape == (B, T, C + 3)
        # frame 0: F plain feature tokens with target channel
        np.testing.assert_allclose(toks[:, :F, :C], np.asarray(feats())[:, 0], atol=0)
        np.testing.assert_array_equal(toks[:, :F, C], 0)      # no feature delim
        np.testing.assert_array_equal(toks[:, :F, C + 1], 0)  # no frame delim
        assert toks[:, :F, C + 2].sum() > 0                    # target present
        # frame 1 starts with a frame delimiter
        fd = toks[:, F]
        np.testing.assert_array_equal(fd[:, C + 1], 1)
        np.testing.assert_array_equal(fd[:, :C + 1], 0)
        # then alternating feature / feature-delimiter
        ft, fdl = toks[:, F + 1], toks[:, F + 2]
        np.testing.assert_allclose(ft[:, :C], np.asarray(feats())[:, 1, 0], atol=0)
        np.testing.assert_array_equal(fdl[:, C], 1)
        # target zero after frame 0
        np.testing.assert_array_equal(toks[:, F:, C + 2], 0)

    def test_gather_picks_feature_delimiter_slots(self):
        T = zoo.sequential_total_steps(F, L)
        logits = jnp.arange(B * T, dtype=jnp.float32).reshape(B, T, 1)
        out = np.asarray(zoo.sequential_gather(logits, F))
        assert out.shape == (B, L - 1, F)
        # feature-delimiter steps of frame 1: F + 2, F + 4, ...
        want_steps = [F + 2 * (k + 1) for k in range(F)]
        np.testing.assert_array_equal(out[0, 0], want_steps)

    def test_ce_loss_runs_through_ntm(self):
        ncfg = NTMConfig(output_dim=1, mem_size=8, mem_dim=4,
                         controller_hidden_size=16, read_head_size=1)
        params = init_ntm_params(jax.random.PRNGKey(0), ncfg, C + 3)
        loss = zoo.heatmap_loss_fn(params, ncfg, feats(), gts(), sequential=True)
        assert np.isfinite(float(loss))


class TestWholeFrame:
    def test_tokens_plain(self):
        toks = np.asarray(zoo.whole_frame_tokens(feats(), gts()[:, 0, :], False))
        assert toks.shape == (B, L, F * C + F)
        # indicator present only on frame 0
        np.testing.assert_allclose(toks[:, 0, F * C:], np.asarray(gts())[:, 0], atol=0)
        np.testing.assert_array_equal(toks[:, 1:, F * C:], 0)

    def test_tokens_two_step(self):
        toks = zoo.whole_frame_tokens(feats(), gts()[:, 0, :], True)
        assert toks.shape == (B, 2 * L - 1, 1 + F * C + F)

    def test_two_step_loss(self):
        # two_step outputs have the +1 background dim (main.py:891)
        logits = jnp.array(
            np.random.RandomState(2).randn(B, 2 * L - 1, F + 1), jnp.float32
        )
        loss = zoo.whole_frame_ce_loss(logits, gts(), two_step=True)
        assert np.isfinite(float(loss))


class TestLSTMBaseline:
    def test_learns_shape_and_grads(self):
        D = 3
        params = zoo.init_lstm_baseline(jax.random.PRNGKey(0), F, D, 16, 2)
        cf = jnp.array(np.random.RandomState(3).rand(B, L, F, D), jnp.float32)
        logits = zoo.lstm_baseline_forward(params, cf, gts()[:, 0, :])
        assert logits.shape == (B, L, F)
        g = jax.grad(zoo.lstm_baseline_loss)(params, cf, gts()[:, 0, :], gts())
        assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(g))


class TestCompressor:
    def test_one_by_one_conv_equiv(self):
        w = zoo.init_compressor(jax.random.PRNGKey(0), C, 3)
        out = zoo.compress_features(feats(), w)
        assert out.shape == (B, L, F, 3)
        want = np.asarray(feats()) @ np.asarray(w)
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


class TestSanityChecks:
    def test_similarity_peaks_where_target_feature_repeats(self):
        # craft features where location 2 of every frame equals frame-0's
        # target feature; the similarity heatmap must peak there
        f = np.random.RandomState(4).rand(B, L, F, C).astype(np.float32)
        target = np.zeros((B, F), np.float32)
        target[:, 2] = 1.0
        for t in range(L):
            f[:, t, 2] = f[:, 0, 2]
        sim = np.asarray(
            zoo.sanity_check_similarity(jnp.array(f), jnp.array(
                np.concatenate([target[:, None], np.zeros((B, L - 1, F), np.float32)], 1)
            ))
        )
        assert sim.shape == (B, L, F)
        assert (sim.argmax(-1) == 2).all()

    def test_pca_variant_runs(self):
        f = np.random.RandomState(5).rand(B, L, F, C).astype(np.float32)
        g = gts()
        sim = zoo.sanity_check_pca(f, g, compress_dim=2)
        assert np.asarray(sim).shape == (B, L, F)


class TestFindValidationBatch:
    def test_deterministic(self, tmp_path):
        for name, n in [("train_a", 20), ("val_b", 20), ("val_c", 20)]:
            d = tmp_path / name
            d.mkdir()
            for i in range(n):
                (d / f"{i:06d}.txt").write_text("x")
        a = zoo.find_validation_batch(str(tmp_path), target_step=200,
                                      min_length=20, seed=7)
        b = zoo.find_validation_batch(str(tmp_path), target_step=200,
                                      min_length=20, seed=7)
        assert a == b
        c = zoo.find_validation_batch(str(tmp_path), target_step=300,
                                      min_length=20, seed=7)
        assert [s for s, _ in c] != [] # well-formed


class TestTwoStepLoss:
    def test_reference_label_layout(self):
        """two_step labels: frame-0 & present steps get the background bit,
        ask steps get the gt (main.py:916-939); denom (2L-1)*B."""
        import jax

        B, L, F = 2, 3, 4
        rng = np.random.RandomState(0)
        g = jnp.array(rng.rand(B, L, F), jnp.float32)
        logits = jnp.array(rng.randn(B, 2 * L - 1, F + 1), jnp.float32)
        got = float(zoo.whole_frame_ce_loss(logits, g, two_step=True))
        # manual oracle
        labels = np.zeros((B, 2 * L - 1, F + 1), np.float32)
        labels[:, 0, F] = 1.0  # frame 0 -> background
        for t in range(1, L):
            labels[:, 2 * t - 1, F] = 1.0          # present step
            labels[:, 2 * t, :F] = np.asarray(g)[:, t]  # ask step
        sm = np.exp(labels) / np.exp(labels).sum(-1, keepdims=True)
        lp = np.asarray(jax.nn.log_softmax(logits, -1))
        want = -np.sum(sm * lp) / ((2 * L - 1) * B)
        np.testing.assert_allclose(got, want, rtol=1e-5)
