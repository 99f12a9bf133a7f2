"""Whole-sequence fused kernel vs the jnp scan (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntm_tracker_tpu.config import NTMConfig
from ntm_tracker_tpu.models.ntm_cell import init_ntm_params, init_ntm_state
from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll
from ntm_tracker_tpu.ops.pallas.scan_cell import ntm_scan_fused


@pytest.mark.parametrize(
    "cfg",
    [
        NTMConfig(output_dim=2, mem_size=16, mem_dim=8,
                  controller_hidden_size=16, controller_num_layers=1,
                  read_head_size=2, write_head_size=1),
        NTMConfig(output_dim=3, mem_size=8, mem_dim=4,
                  controller_hidden_size=8, controller_num_layers=2,
                  read_head_size=1, write_head_size=2, shift_range=2,
                  write_first=True),
    ],
    ids=["default-ish", "multilayer-writefirst-s5"],
)
def test_fused_scan_matches_jnp_scan(cfg):
    B, T, IN = 2, 7, 10
    params = init_ntm_params(jax.random.PRNGKey(0), cfg, IN)
    state = init_ntm_state(params, cfg, B)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))

    _, logits_ref, final_ref = ntm_tracker_unroll(
        params, cfg, tokens, state=jax.tree.map(lambda x: x, state), remat=False
    )
    logits_fused, final_fused = ntm_scan_fused(
        params, cfg, tokens, state, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(logits_fused), np.asarray(logits_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(final_fused["M"]), np.asarray(final_ref["M"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(final_fused["w"]), np.asarray(final_ref["w"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(final_fused["read"]), np.asarray(final_ref["read"]), atol=2e-5
    )
    for (c1, h1), (c2, h2) in zip(
        final_fused["controller_state"], final_ref["controller_state"]
    ):
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=2e-5)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=2e-5)
