"""DNC MemoryAccess + core probes, ported from dnc/access_test.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntm_tracker_tpu.config import DNCConfig
from ntm_tracker_tpu.models.dnc.access import (
    _read_inputs,
    _read_weights,
    _write_weights,
    init_access_params,
    init_access_state,
    memory_access_step,
)
from ntm_tracker_tpu.models.dnc.dnc import (
    dnc_unroll,
    init_dnc_params,
    init_dnc_state,
)

BATCH, N, W, R, WH, INPUT = 2, 20, 6, 2, 3, 10
CFG = DNCConfig(
    output_dim=5, memory_size=N, word_size=W, num_reads=R, num_writes=WH,
    hidden_size=16, clip_value=20.0,
)


def one_hot(length, index):
    r = np.zeros(length)
    r[index] = 1
    return r


class TestMemoryAccess:
    def test_build_and_train(self):
        # dnc/access_test.py:44-60: unroll + one GD step runs and is finite
        params = init_access_params(jax.random.PRNGKey(0), CFG, INPUT)
        state = init_access_state(CFG, BATCH)
        T = 4
        xs = jax.random.normal(jax.random.PRNGKey(1), (T, BATCH, INPUT))
        targets = jax.random.uniform(jax.random.PRNGKey(2), (T, BATCH, R, W))

        def loss_fn(p):
            def body(carry, x):
                rw, ns = memory_access_step(p, CFG, x, carry)
                return ns, rw
            _, outs = jax.lax.scan(body, state, xs)
            return jnp.mean(jnp.square(outs - targets))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        for g in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(g)))

    def test_valid_read_mode(self):
        # dnc/access_test.py:62-75
        params = init_access_params(jax.random.PRNGKey(3), CFG, INPUT)
        ctl = _read_inputs(params, CFG, jax.random.normal(jax.random.PRNGKey(4), (BATCH, INPUT)))
        rm = np.asarray(ctl["read_mode"])
        np.testing.assert_allclose(rm.sum(2), np.ones((BATCH, R)), rtol=1e-5)
        assert rm.min() >= 0
        assert rm.shape == (BATCH, R, 1 + 2 * WH)

    def test_write_weights_allocation_targeting(self):
        # dnc/access_test.py:77-109
        rng = np.random.RandomState(5)
        memory = jnp.array(10 * (rng.rand(BATCH, N, W) - 0.5), jnp.float32)
        usage = rng.rand(BATCH, N)
        allocation_gate = rng.rand(BATCH, WH)
        write_gate = rng.rand(BATCH, WH)
        usage[:, 3] = 0
        allocation_gate[:, 0] = 1
        write_gate[:, 0] = 1
        inputs = {
            "allocation_gate": jnp.array(allocation_gate, jnp.float32),
            "write_gate": jnp.array(write_gate, jnp.float32),
            "write_content_keys": jnp.array(rng.rand(BATCH, WH, W), jnp.float32),
            "write_content_strengths": jnp.array(rng.rand(BATCH, WH), jnp.float32),
        }
        weights = np.asarray(
            _write_weights(CFG, inputs, memory, jnp.array(usage, jnp.float32))
        )
        np.testing.assert_allclose(weights.sum(2), write_gate, atol=5e-2)
        np.testing.assert_allclose(weights[0, 0], one_hot(N, 3), atol=1e-3)

    def test_read_weights_content_mode(self):
        # dnc/access_test.py:111-143
        rng = np.random.RandomState(6)
        memory = 10 * (rng.rand(BATCH, N, W) - 0.5)
        prw = rng.rand(BATCH, R, N)
        prw /= prw.sum(2, keepdims=True) + 1
        link = rng.rand(BATCH, WH, N, N)
        link /= np.maximum(link.sum(2, keepdims=True), 1)
        link /= np.maximum(link.sum(3, keepdims=True), 1)

        keys = rng.rand(BATCH, R, W)
        keys[0, 0] = memory[0, 3]
        read_mode = rng.rand(BATCH, R, 1 + 2 * WH)
        read_mode[0, 0, :] = one_hot(1 + 2 * WH, 2 * WH)
        inputs = {
            "read_content_keys": jnp.array(keys, jnp.float32),
            "read_content_strengths": jnp.full((BATCH, R), 100.0),
            "read_mode": jnp.array(read_mode, jnp.float32),
        }
        rw = np.asarray(
            _read_weights(
                CFG, inputs, jnp.array(memory, jnp.float32),
                jnp.array(prw, jnp.float32), jnp.array(link, jnp.float32),
            )
        )
        np.testing.assert_allclose(rw[0, 0, :], one_hot(N, 3), atol=1e-3)

    def test_gradients_finite_difference(self):
        # dnc/access_test.py:145-159 (gradient error < 0.1)
        params = init_access_params(jax.random.PRNGKey(7), CFG, INPUT)
        state = init_access_state(CFG, 1)
        x = jax.random.normal(jax.random.PRNGKey(8), (1, INPUT))
        mem0 = jax.random.normal(jax.random.PRNGKey(9), (1, N, W)) * 0.1
        state = state._replace(memory=mem0)

        def f(xi):
            rw, _ = memory_access_step(params, CFG, xi, state)
            return jnp.sum(rw)

        g = np.asarray(jax.grad(f)(x))
        eps = 1e-3
        rng = np.random.RandomState(10)
        for i in rng.choice(INPUT, 4, replace=False):
            up = np.asarray(x).copy(); up[0, i] += eps
            dn = np.asarray(x).copy(); dn[0, i] -= eps
            fd = (float(f(jnp.array(up))) - float(f(jnp.array(dn)))) / (2 * eps)
            np.testing.assert_allclose(g[0, i], fd, atol=5e-2, rtol=5e-2)


class TestDNCCore:
    def test_unroll_shapes_and_finiteness(self):
        params = init_dnc_params(jax.random.PRNGKey(11), CFG, INPUT)
        x = jax.random.normal(jax.random.PRNGKey(12), (BATCH, 6, INPUT))
        outs, final = dnc_unroll(params, CFG, x)
        assert outs.shape == (BATCH, 6, CFG.output_dim)
        assert np.all(np.isfinite(np.asarray(outs)))
        assert final.access_state.memory.shape == (BATCH, N, W)

    def test_clip_value_bounds_output(self):
        cfg = DNCConfig(**{**CFG.__dict__, "clip_value": 0.5})
        params = init_dnc_params(jax.random.PRNGKey(13), cfg, INPUT)
        x = 100.0 * jax.random.normal(jax.random.PRNGKey(14), (BATCH, 3, INPUT))
        outs, _ = dnc_unroll(params, cfg, x)
        assert np.abs(np.asarray(outs)).max() <= 0.5 + 1e-6

    def test_time_major_matches_batch_major(self):
        params = init_dnc_params(jax.random.PRNGKey(15), CFG, INPUT)
        x = jax.random.normal(jax.random.PRNGKey(16), (BATCH, 5, INPUT))
        o1, _ = dnc_unroll(params, CFG, x)
        o2, _ = dnc_unroll(params, CFG, jnp.swapaxes(x, 0, 1), time_major=True)
        np.testing.assert_allclose(
            np.asarray(o1), np.asarray(jnp.swapaxes(o2, 0, 1)), rtol=1e-5
        )

    @pytest.mark.slow  # ~1 min: full per-chunk replay grad sweep
    def test_chunked_remat_grads_match_per_step(self):
        """remat_chunk only changes the carry SAVE schedule (boundary saves
        + per-chunk replay) — values and every gradient leaf must match the
        per-step path, including a chunk-tail remainder (T=11, C=4)."""
        params = init_dnc_params(jax.random.PRNGKey(17), CFG, INPUT)
        x = jax.random.normal(jax.random.PRNGKey(18), (BATCH, 11, INPUT))

        def loss(p, chunk):
            outs, final = dnc_unroll(p, CFG, x, remat_chunk=chunk)
            return (
                jnp.mean(outs ** 2)
                + jnp.mean(final.access_state.memory ** 2)
                + jnp.mean(final.access_state.linkage.link ** 2)
            )

        v0, g0 = jax.value_and_grad(lambda p: loss(p, 0))(params)
        v4, g4 = jax.value_and_grad(lambda p: loss(p, 4))(params)
        np.testing.assert_allclose(float(v0), float(v4), rtol=1e-6)
        for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(g0)[0],
            jax.tree_util.tree_leaves(g4),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
            )
