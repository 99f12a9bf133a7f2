"""Shared harness for the whole-sequence Pallas kernel parity tests
(test_pallas_bptt.py and test_pallas_packed.py): the config set, the jnp
reference unroll, the symmetry-broken setup, and the every-output-path
cotangent loss. One definition so a tolerance/config fix cannot silently
leave one kernel pair tested against a stale harness."""

import jax
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.config import NTMConfig
from ntm_tracker_tpu.models.ntm_cell import (
    init_ntm_params,
    init_ntm_state,
    ntm_cell_step,
)

B, T, IN = 3, 7, 10

CONFIGS = {
    "flagship_shape": NTMConfig(
        output_dim=2, mem_size=16, mem_dim=8, controller_hidden_size=24,
        controller_num_layers=1, read_head_size=2, write_head_size=1,
    ),
    "two_layer_two_write_s2_wf": NTMConfig(
        output_dim=3, mem_size=16, mem_dim=8, controller_hidden_size=16,
        controller_num_layers=2, read_head_size=2, write_head_size=2,
        shift_range=2, write_first=True,
    ),
    "slotwise": NTMConfig(
        output_dim=2, mem_size=16, mem_dim=8, controller_hidden_size=24,
        controller_num_layers=1, read_head_size=3, write_head_size=1,
        slotwise_cosine=True,
    ),
}


def jnp_unroll(params, cfg, tokens, state):
    def body(carry, x_t):
        _out, logit, new_state = ntm_cell_step(params, cfg, x_t, carry)
        return new_state, logit

    final, logits = jax.lax.scan(body, state, jnp.swapaxes(tokens, 0, 1))
    return jnp.swapaxes(logits, 0, 1), final


def setup_case(cfg, seed):
    rs = np.random.RandomState(seed)
    params = init_ntm_params(jax.random.PRNGKey(seed), cfg, IN)
    # break symmetry of the zero biases so their grads are non-trivial
    params = jax.tree.map(
        lambda a: jnp.asarray(
            np.asarray(a) + rs.uniform(-0.05, 0.05, np.shape(a)).astype(np.float32)
        ),
        params,
    )
    state = init_ntm_state(params, cfg, B)
    tokens = jnp.asarray(rs.uniform(-1, 1, (B, T, IN)).astype(np.float32))
    # fixed cotangent weights exercising EVERY output path
    A = jnp.asarray(rs.uniform(-1, 1, (B, T, cfg.output_dim)).astype(np.float32))
    BM = jnp.asarray(rs.uniform(-1, 1, (B, cfg.mem_size, cfg.mem_dim)).astype(np.float32))
    Bw = jnp.asarray(rs.uniform(-1, 1, (B, cfg.num_heads, cfg.mem_size)).astype(np.float32))
    Br = jnp.asarray(rs.uniform(-1, 1, (B, cfg.read_head_size, cfg.mem_dim)).astype(np.float32))
    Bc = jnp.asarray(rs.uniform(-1, 1, (B, cfg.controller_hidden_size)).astype(np.float32))
    return params, state, tokens, (A, BM, Bw, Br, Bc)


def make_loss(unroll, cot):
    A, BM, Bw, Br, Bc = cot

    def loss(params, tokens, state):
        logits, final = unroll(params, tokens, state)
        out = jnp.sum(logits * A)
        out = out + jnp.sum(final["M"] * BM)
        out = out + jnp.sum(final["w"] * Bw)
        out = out + jnp.sum(final["read"] * Br)
        for c, h in final["controller_state"]:
            out = out + jnp.sum(c * Bc) + 0.5 * jnp.sum(h * Bc)
        return out

    return loss
