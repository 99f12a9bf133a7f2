"""Fused Pallas BPTT (ops/pallas/scan_bptt.py) vs jax.grad of the jnp
scan — values AND all gradient paths (params, tokens, initial state,
final-state cotangents), interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import zlib
import pytest

from ntm_tracker_tpu.models.ntm_cell import init_ntm_state
from ntm_tracker_tpu.ops.pallas.scan_bptt import ntm_scan_fused_bptt

from tests.pallas_harness import (  # shared with test_pallas_packed.py
    CONFIGS,
    jnp_unroll as _jnp_unroll,
    make_loss as _loss,
    setup_case as _setup,
)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_fused_bptt_matches_jax_grad(name):
    cfg = CONFIGS[name]
    params, state, tokens, cot = _setup(cfg, seed=zlib.crc32(name.encode()) % 1000)

    loss_ref = _loss(lambda p, t, s: _jnp_unroll(p, cfg, t, s), cot)
    loss_fused = _loss(
        lambda p, t, s: ntm_scan_fused_bptt(p, cfg, t, s, interpret=True), cot
    )

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        params, tokens, state
    )
    v_fused, g_fused = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(
        params, tokens, state
    )
    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-5)

    flat_ref, tree_ref = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_fused = jax.tree_util.tree_flatten(g_fused)[0]
    assert len(flat_ref) == len(flat_fused)
    for (path, r), f in zip(flat_ref, flat_fused):
        scale = max(1e-3, float(jnp.abs(r).max()))
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), atol=3e-5 * scale, rtol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_fused_bptt_hw_batch_ceiling():
    """DIFFERENTIATED non-interpret calls beyond the measured Mosaic compile
    ceiling fail fast with the measured guidance instead of crashing the TPU
    compiler. The ceiling is on the residual-streaming fwd/bwd pair only, so
    the guard lives in the VJP fwd rule — undifferentiated calls dispatch
    the residual-free forward kernel, which runs at B=256 on hardware."""
    from ntm_tracker_tpu.ops.pallas.scan_bptt import MAX_HW_BATCH

    cfg = CONFIGS["flagship_shape"]
    params, state, tokens, _ = _setup(cfg, seed=1)
    big = jnp.tile(tokens, (MAX_HW_BATCH, 1, 1))[: MAX_HW_BATCH + 1]
    big_state = init_ntm_state(params, cfg, MAX_HW_BATCH + 1)

    def loss(p):
        logits, _ = ntm_scan_fused_bptt(p, cfg, big, big_state,
                                        interpret=False)
        return logits.sum()

    with pytest.raises(ValueError, match="compile ceiling"):
        jax.grad(loss)(params)


def test_fused_bptt_forward_matches_jnp():
    cfg = CONFIGS["flagship_shape"]
    params, state, tokens, _ = _setup(cfg, seed=0)
    lo_ref, fin_ref = _jnp_unroll(params, cfg, tokens, state)
    lo_f, fin_f = ntm_scan_fused_bptt(params, cfg, tokens, state, interpret=True)
    np.testing.assert_allclose(np.asarray(lo_f), np.asarray(lo_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(fin_f["M"]), np.asarray(fin_ref["M"]), atol=1e-5
    )
