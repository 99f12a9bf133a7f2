"""DNC addressing probes, ported from dnc/addressing_test.py."""

import jax
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.models.dnc.addressing import (
    TemporalLinkageState,
    _allocation,
    cosine_weights,
    directional_read_weights,
    temporal_linkage_update,
    usage_update,
    write_allocation_weights,
)


def one_hot(length, index):
    r = np.zeros(length)
    r[index] = 1
    return r


class TestCosineWeights:
    def test_shape_and_distribution(self):
        # dnc/addressing_test.py:56-100
        b, n, w, h = 5, 10, 6, 2
        rng = np.random.RandomState(0)
        mem = jnp.array(rng.randn(b, n, w), jnp.float32)
        keys = jnp.array(rng.randn(b, h, w), jnp.float32)
        strengths = jnp.array(rng.rand(b, h), jnp.float32)
        out = np.asarray(cosine_weights(mem, keys, strengths))
        assert out.shape == (b, h, n)
        np.testing.assert_allclose(out.sum(-1), np.ones((b, h)), rtol=1e-5)
        assert out.min() >= 0

    def test_exact_key_high_strength_targets_slot(self):
        # dnc/addressing_test.py:102-127 spirit: a key equal to one memory row
        # with high strength concentrates the softmax there
        rng = np.random.RandomState(1)
        mem = jnp.array(10 * (rng.rand(2, 8, 5) - 0.5), jnp.float32)
        keys = jnp.array(rng.rand(2, 1, 5), jnp.float32)
        keys = keys.at[0, 0].set(mem[0, 3])
        strengths = jnp.full((2, 1), 100.0)
        out = np.asarray(cosine_weights(mem, keys, strengths, strength_op=lambda x: x))
        np.testing.assert_allclose(out[0, 0], one_hot(8, 3), atol=1e-3)

    def test_zero_memory_no_nan(self):
        # dnc/addressing_test.py:129-145: divide-by-zero guarded by eps
        mem = jnp.zeros((2, 4, 3))
        keys = jnp.zeros((2, 2, 3))
        strengths = jnp.ones((2, 2))
        out, grad = jax.value_and_grad(
            lambda m: jnp.sum(cosine_weights(m, keys, strengths))
        )(mem), None
        assert not np.any(np.isnan(np.asarray(out[0])))
        g = jax.grad(lambda m: jnp.sum(cosine_weights(m, keys, strengths)))(mem)
        assert not np.any(np.isnan(np.asarray(g)))


class TestTemporalLinkage:
    def test_multi_step_state_machine(self):
        # dnc/addressing_test.py:148-236
        b, n, r, wh = 7, 4, 11, 5
        rng = np.random.RandomState(2)
        state = TemporalLinkageState(
            link=jnp.zeros((b, wh, n, n)), precedence_weights=jnp.zeros((b, wh, n))
        )
        num_steps = 5
        for i in range(num_steps):
            ww = rng.rand(b, wh, n)
            ww /= ww.sum(2, keepdims=True) + 1
            if i == num_steps - 2:
                ww[0, 0, :] = one_hot(n, 0)
                ww[0, 1, :] = one_hot(n, 3)
            elif i == num_steps - 1:
                ww[0, 0, :] = one_hot(n, 1)
                ww[0, 1, :] = one_hot(n, 2)
            state = temporal_linkage_update(jnp.array(ww, jnp.float32), state)

        link = np.asarray(state.link)
        assert link.min() >= 0 and link.max() <= 1
        np.testing.assert_array_equal(
            link[:, :, range(n), range(n)], np.zeros((b, wh, n))
        )
        assert link.sum(2).max() <= 1 + 1e-6
        assert link.sum(3).max() <= 1 + 1e-6
        # transitions 0->1 (head 0) and 3->2 (head 1) recorded in batch 0
        np.testing.assert_allclose(link[0, 0, :, 0], one_hot(n, 1), atol=1e-6)
        np.testing.assert_allclose(link[0, 1, :, 3], one_hot(n, 2), atol=1e-6)

        # directional read weights
        prw = rng.rand(b, r, n)
        prw[0, 5, :] = one_hot(n, 0)
        prw[0, 6, :] = one_hot(n, 2)
        fwd = np.asarray(
            directional_read_weights(state.link, jnp.array(prw, jnp.float32), True)
        )
        bwd = np.asarray(
            directional_read_weights(state.link, jnp.array(prw, jnp.float32), False)
        )
        np.testing.assert_allclose(fwd[0, 5, 0, :], one_hot(n, 1), atol=1e-6)
        np.testing.assert_allclose(bwd[0, 6, 1, :], one_hot(n, 3), atol=1e-6)

    def test_precedence_weights(self):
        # dnc/addressing_test.py:238-272
        b, n, wh = 7, 3, 5
        rng = np.random.RandomState(3)
        prev_p = rng.rand(b, wh, n)
        ww = rng.rand(b, wh, n)
        ww /= ww.sum(2, keepdims=True) + 1
        prev_p /= prev_p.sum(2, keepdims=True) + 1
        ww[0, 1, :] = 0
        ww[1, 2, :] /= ww[1, 2, :].sum()

        state = TemporalLinkageState(
            link=jnp.zeros((b, wh, n, n)),
            precedence_weights=jnp.array(prev_p, jnp.float32),
        )
        new = temporal_linkage_update(jnp.array(ww, jnp.float32), state)
        p = np.asarray(new.precedence_weights)
        assert p.min() >= 0 and p.max() <= 1 + 1e-6
        np.testing.assert_allclose(p[0, 1, :], prev_p[0, 1, :], rtol=1e-5)
        np.testing.assert_allclose(p[1, 2, :], ww[1, 2, :], atol=1e-6)


class TestFreeness:
    def test_usage_update(self):
        # dnc/addressing_test.py:275-315
        b, n, r, wh = 5, 11, 3, 7
        rng = np.random.RandomState(4)
        free_gate = rng.rand(b, r)
        prw = rng.rand(b, r, n)
        prw[1, :, 3] = 0
        prw /= prw.sum(2, keepdims=True)
        pww = rng.rand(b, wh, n)
        pww /= pww.sum(2, keepdims=True)
        prev_usage = rng.rand(b, n)

        pww[1, 2, 3] = 1
        prw[2, 0, 4] = 1
        free_gate[2, 0] = 1

        usage = np.asarray(
            usage_update(
                jnp.array(pww, jnp.float32),
                jnp.array(free_gate, jnp.float32),
                jnp.array(prw, jnp.float32),
                jnp.array(prev_usage, jnp.float32),
            )
        )
        assert usage.min() >= 0 and usage.max() <= 1
        np.testing.assert_allclose(usage[1][3], 1, atol=1e-6)
        np.testing.assert_allclose(usage[2][4], 0, atol=1e-6)

    def test_write_allocation_weights(self):
        # dnc/addressing_test.py:317-366
        b, n, wh = 7, 23, 5
        rng = np.random.RandomState(5)
        usage = rng.rand(b, n)
        gates = rng.rand(b, wh)
        gates[0, 1] = 0
        gates[0, 3] = 0
        gates[0, 0] = 1
        gates[0, 2] = 1
        usage[1] = usage[1] * 0.9 + 0.1
        usage[1][4] = 0
        usage[1][3] = 1e-4
        gates[1, 0] = 1
        gates[1, 1] = 1

        weights = np.asarray(
            write_allocation_weights(
                jnp.array(usage, jnp.float32), jnp.array(gates, jnp.float32), wh
            )
        )
        assert weights.min() >= 0 and weights.max() <= 1
        np.testing.assert_allclose(weights.sum(2), np.ones((b, wh)), atol=1e-3)
        assert np.abs(weights[0, 0, :] - weights[0, 1, :]).max() > 0.1
        np.testing.assert_array_equal(weights[0, 1, :], weights[0, 2, :])
        assert np.abs(weights[0, 2, :] - weights[0, 3, :]).max() > 0.1
        np.testing.assert_array_equal(weights[0, 3, :], weights[0, 4, :])
        np.testing.assert_allclose(weights[1][0], one_hot(n, 4), atol=1e-3)
        np.testing.assert_allclose(weights[1][1], one_hot(n, 3), atol=1e-3)

    def test_allocation_order(self):
        # dnc/addressing_test.py:389-404
        b, n = 7, 13
        rng = np.random.RandomState(6)
        usage = rng.rand(b, n)
        allocation = np.asarray(_allocation(jnp.array(usage, jnp.float32)))
        np.testing.assert_array_equal(
            np.argmin(usage, axis=1), np.argmax(allocation, axis=1)
        )
        np.testing.assert_array_equal(
            np.argmax(usage, axis=1), np.argmin(allocation, axis=1)
        )
        np.testing.assert_allclose(allocation.sum(1), np.ones(b), atol=0.01)

    def test_allocation_gradient_finite_difference(self):
        # dnc/addressing_test.py:406-419 (compute_gradient_error < 0.01)
        rng = np.random.RandomState(7)
        usage = rng.rand(1, 5).astype(np.float32)

        def f(u):
            return jnp.sum(_allocation(u) * jnp.arange(5.0))

        g = np.asarray(jax.grad(f)(jnp.array(usage)))
        eps = 1e-3
        for i in range(5):
            up = usage.copy(); up[0, i] += eps
            dn = usage.copy(); dn[0, i] -= eps
            fd = (float(f(jnp.array(up))) - float(f(jnp.array(dn)))) / (2 * eps)
            np.testing.assert_allclose(g[0, i], fd, atol=1e-2)
