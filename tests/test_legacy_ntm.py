"""models/legacy_ntm.py standalone behavior (executed-TF parity lives in
test_tf_parity.py::TestExecutedLegacyNTM): init-state contracts, the
epsilon-free sharpen, batching, and trainability."""

import jax
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.models.legacy_ntm import (
    LegacyNTMConfig,
    init_legacy_params,
    init_legacy_state,
    legacy_ntm_step,
    legacy_ntm_unroll,
    legacy_ntm_unroll_batched,
)

CFG = LegacyNTMConfig(
    num_features=4, mem_size=16, mem_dim=8, controller_dim=12,
    controller_layer_size=2, read_head_size=2, write_head_size=1,
)
IN = 10


def _setup(seed=0):
    params = init_legacy_params(jax.random.PRNGKey(seed), CFG, IN)
    return params


class TestInitState:
    def test_range_init_peaks_at_slot_zero(self):
        """Fresh read/write weights are softmax of the reversed range
        [N..1] (ops.py Linear is_range bias init): strictly decreasing,
        peaked at slot 0."""
        params = _setup()
        state = init_legacy_state(params, CFG)
        for key in ("read_w", "write_w"):
            w = np.asarray(state[key])
            np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-6)
            assert (np.diff(w, axis=-1) < 0).all()
            assert (w.argmax(-1) == 0).all()

    def test_squashes(self):
        params = _setup()
        state = init_legacy_state(params, CFG)
        assert np.abs(np.asarray(state["M"])).max() <= 1.0
        assert state["M"].shape == (16, 8)
        assert state["output"].shape == (2, 12)


class TestStep:
    def test_shapes_and_simplex_weights(self):
        params = _setup()
        state = init_legacy_state(params, CFG)
        x = jax.random.normal(jax.random.PRNGKey(1), (IN,))
        tgt = jnp.ones((4,))
        out, logit, new_state = legacy_ntm_step(params, CFG, x, tgt, state)
        assert out.shape == logit.shape == (4,)
        np.testing.assert_allclose(float(out.sum()), 1.0, rtol=1e-6)
        # sharpened weights normalize WITHOUT the +1e-3 of the newer cell
        # (ntm.py:260): sums are exactly 1 up to float error
        np.testing.assert_allclose(
            np.asarray(new_state["read_w"]).sum(-1), 1.0, rtol=1e-6
        )
        assert new_state["M"].shape == (16, 8)
        assert new_state["read"].shape == (2, 8)

    def test_target_only_on_first_step(self):
        """The unroll presents the indicator on step 0 and zeros after:
        changing the target must change step-0 logits but a zero-target
        manual rollout must agree from step 1 given the same state."""
        params = _setup()
        inputs = jax.random.normal(jax.random.PRNGKey(2), (3, IN))
        t1 = jnp.ones((4,))
        t2 = -jnp.ones((4,))
        _, l1, _ = legacy_ntm_unroll(params, CFG, inputs, t1)
        _, l2, _ = legacy_ntm_unroll(params, CFG, inputs, t2)
        assert float(jnp.abs(l1[0] - l2[0]).max()) > 1e-6


class TestUnroll:
    def test_batched_matches_unbatched(self):
        params = _setup()
        B, T = 3, 4
        inputs = jax.random.normal(jax.random.PRNGKey(3), (B, T, IN))
        targets = jax.random.normal(jax.random.PRNGKey(4), (B, 4))
        outs_b, logits_b, _ = legacy_ntm_unroll_batched(params, CFG, inputs, targets)
        for b in range(B):
            _, logits_1, _ = legacy_ntm_unroll(params, CFG, inputs[b], targets[b])
            np.testing.assert_allclose(
                np.asarray(logits_b[b]), np.asarray(logits_1), atol=1e-6
            )

    def test_trainable(self):
        """Gradients flow end-to-end (incl. through the learnable initial
        state) and an SGD step reduces a simple imitation loss."""
        params = _setup()
        inputs = jax.random.normal(jax.random.PRNGKey(5), (4, IN))
        target = jnp.ones((4,))
        label = jax.nn.one_hot(1, 4)

        def loss_fn(p):
            outs, _logits, _ = legacy_ntm_unroll(p, CFG, inputs, target)
            return -jnp.mean(jnp.sum(label * jnp.log(outs + 1e-8), -1))

        @jax.jit
        def sgd(p):
            l, g = jax.value_and_grad(loss_fn)(p)
            return l, jax.tree.map(lambda a, b: a - 0.5 * b, p, g)

        l0, params = sgd(params)
        for _ in range(5):
            l1, params = sgd(params)
        assert float(l1) < float(l0)
        # the raw initial-state params receive gradient too (ntm.py:273-332
        # backs them with variables)
        g = jax.grad(loss_fn)(_setup())
        assert float(jnp.abs(g["init"]["M"]).sum()) > 0
        assert float(jnp.abs(g["init"]["read_w"]).sum()) > 0
