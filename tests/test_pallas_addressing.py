"""Fused Pallas addressing kernel vs the jnp reference path (interpret mode
on CPU; the TPU compiled path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntm_tracker_tpu.config import NTMConfig
from ntm_tracker_tpu.models.ntm_cell import (
    head_param_sizes,
    init_ntm_params,
    init_ntm_state,
    ntm_cell_step,
)
from ntm_tracker_tpu.ops.pallas.addressing import fused_ntm_addressing


def _raw_params(rng, B, H, D, W, S):
    r = np.random.RandomState(rng)
    return dict(
        k=jnp.array(r.randn(B, H, D), jnp.float32),
        beta=jnp.array(r.randn(B, H), jnp.float32),
        g=jnp.array(r.randn(B, H), jnp.float32),
        sw=jnp.array(r.randn(B, H, S), jnp.float32),
        gamma=jnp.array(r.randn(B, H), jnp.float32),
        erase=jnp.array(r.randn(B, W, D), jnp.float32),
        add=jnp.array(r.randn(B, W, D), jnp.float32),
        M_prev=jnp.array(r.randn(B, 16, D) * 0.5, jnp.float32),
        w_prev=jnp.array(
            jax.nn.softmax(jnp.array(r.randn(B, H, 16)), -1), jnp.float32
        ),
    )


def _jnp_reference(p, R, write_first, slotwise=False):
    """Direct transcription of the ntm_cell_step jnp math."""
    from ntm_tracker_tpu.ops.memory import (
        batched_circular_convolution,
        batched_slotwise_cosine_similarity,
        batched_smooth_cosine_similarity,
        sharpen,
    )

    k = jnp.tanh(p["k"])
    cos = (batched_slotwise_cosine_similarity if slotwise
           else batched_smooth_cosine_similarity)
    sim = cos(p["M_prev"], k)
    beta = jax.nn.softplus(p["beta"])[..., None]
    w_c = jax.nn.softmax(sim * beta, -1)
    g = jax.nn.sigmoid(p["g"])[..., None]
    w_g = w_c * g + p["w_prev"] * (1 - g)
    sw = jax.nn.softmax(p["sw"], -1)
    w = sharpen(
        batched_circular_convolution(w_g, sw),
        (jax.nn.softplus(p["gamma"]) + 1.0)[..., None],
    )
    erase = jax.nn.sigmoid(p["erase"])
    add = jnp.tanh(p["add"])
    w_write = w[:, R:, :]
    M_erase = jnp.prod(1 - w_write[..., None] * erase[:, :, None, :], axis=1)
    M_write = jnp.sum(w_write[..., None] * add[:, :, None, :], axis=1)
    M = p["M_prev"] * M_erase + M_write
    src = M if write_first else p["M_prev"]
    read = jnp.einsum("brn,bnd->brd", w[:, :R, :], src)
    return M, w, read


@pytest.mark.parametrize("slotwise", [False, True])
@pytest.mark.parametrize("write_first", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_fused_matches_reference(seed, write_first, slotwise):
    B, H, D, W, S = 3, 5, 8, 1, 3
    R = H - W
    p = _raw_params(seed, B, H, D, W, S)
    M1, w1, r1 = _jnp_reference(p, R, write_first, slotwise)
    M2, w2, r2 = fused_ntm_addressing(
        p["k"], p["beta"], p["g"], p["sw"], p["gamma"], p["erase"], p["add"],
        p["M_prev"], p["w_prev"],
        read_heads=R, write_first=write_first, slotwise=slotwise,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(M1), np.asarray(M2), atol=2e-6)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=2e-6)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-6)


def test_multi_write_heads():
    B, H, D, W, S = 2, 4, 6, 2, 5
    R = H - W
    p = _raw_params(3, B, H, D, W, S)
    M1, w1, r1 = _jnp_reference(p, R, False)
    M2, w2, r2 = fused_ntm_addressing(
        p["k"], p["beta"], p["g"], p["sw"], p["gamma"], p["erase"], p["add"],
        p["M_prev"], p["w_prev"],
        read_heads=R, write_first=False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(M1), np.asarray(M2), atol=2e-6)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-6)


def test_cell_step_pallas_flag_matches_jnp():
    cfg = NTMConfig(output_dim=3, mem_size=16, mem_dim=8,
                    controller_hidden_size=16, read_head_size=2)
    cfg_p = NTMConfig(**{**cfg.__dict__, "use_pallas": True})
    params = init_ntm_params(jax.random.PRNGKey(0), cfg, 6)
    state = init_ntm_state(params, cfg, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6))
    import ntm_tracker_tpu.ops.pallas.addressing as fa

    # route the flag path through interpret mode on CPU
    orig = fa.fused_ntm_addressing

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    fa.fused_ntm_addressing = interp
    try:
        o1, l1, s1 = ntm_cell_step(params, cfg, x, state)
        o2, l2, s2 = ntm_cell_step(params, cfg_p, x, state)
    finally:
        fa.fused_ntm_addressing = orig
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1["M"]), np.asarray(s2["M"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1["read"]), np.asarray(s2["read"]), atol=1e-6)


def test_use_pallas_differentiable_via_custom_vjp():
    """NTMConfig.use_pallas must work under jax.grad: the fused kernel's
    custom VJP backpropagates through the reference jnp math."""
    import ntm_tracker_tpu.ops.pallas.addressing as fa
    from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll

    cfg = NTMConfig(output_dim=2, mem_size=16, mem_dim=8,
                    controller_hidden_size=16, read_head_size=2)
    cfg_p = NTMConfig(**{**cfg.__dict__, "use_pallas": True})
    params = init_ntm_params(jax.random.PRNGKey(0), cfg, 6)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 6))

    orig = fa.fused_ntm_addressing

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    fa.fused_ntm_addressing = interp
    try:
        def loss(p, c):
            _, logits, _ = ntm_tracker_unroll(p, c, x, remat=False)
            return jnp.sum(jnp.tanh(logits) ** 2)

        g_ref = jax.grad(lambda p: loss(p, cfg))(params)
        g_pal = jax.grad(lambda p: loss(p, cfg_p))(params)
    finally:
        fa.fused_ntm_addressing = orig

    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
