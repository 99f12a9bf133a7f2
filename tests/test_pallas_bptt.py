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


@pytest.mark.parametrize("big_b", [8, 11])
def test_fused_bptt_batch_tiled_matches_jax_grad(big_b, monkeypatch):
    """Batches beyond BATCH_TILE run on a (B/tile, T) grid — the r4 fix for
    the scoped-VMEM compile ceiling. Exercise multiple tiles (B=8, tile 4)
    AND a non-dividing batch (B=11 -> padded to 12): values, every gradient
    path, and the cross-tile param-grad accumulation must still match
    jax.grad of the jnp scan exactly. Padded rows carry zero cotangents, so
    they must contribute nothing."""
    import ntm_tracker_tpu.ops.pallas.scan_bptt as sb

    monkeypatch.setattr(sb, "BATCH_TILE", 4)
    cfg = CONFIGS["two_layer_two_write_s2_wf"]
    params, _state, tokens, cot = _setup(cfg, seed=7)
    rs = np.random.RandomState(8)
    T, IN = tokens.shape[1:]
    big = jnp.asarray(rs.uniform(-1, 1, (big_b, T, IN)).astype(np.float32))
    big_state = init_ntm_state(params, cfg, big_b)
    A, BM, Bw, Br, Bc = cot
    tile_to = lambda a: jnp.tile(a, (-(-big_b // a.shape[0]),) + (1,) * (a.ndim - 1))[:big_b]
    big_cot = (tile_to(A), tile_to(BM), tile_to(Bw), tile_to(Br), tile_to(Bc))

    loss_ref = _loss(lambda p, t, s: _jnp_unroll(p, cfg, t, s), big_cot)
    loss_fused = _loss(
        lambda p, t, s: ntm_scan_fused_bptt(p, cfg, t, s, interpret=True),
        big_cot,
    )
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        params, big, big_state
    )
    v_fused, g_fused = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(
        params, big, big_state
    )
    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-5)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_fused = jax.tree_util.tree_flatten(g_fused)[0]
    for (path, r), f in zip(flat_ref, flat_fused):
        scale = max(1e-3, float(jnp.abs(r).max()))
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), atol=3e-5 * scale, rtol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_fused_bptt_auto_resolves_to_xla_on_cpu():
    """TrainConfig.fused_bptt defaults to "auto": fused only on a single
    TPU chip at f32 with training-scale batches. Under the test suite's
    CPU backend "auto" must resolve to the XLA scan and be bit-identical
    to an explicit fused_bptt=False call."""
    from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll

    cfg = CONFIGS["flagship_shape"]
    params, state, tokens, _ = _setup(cfg, seed=3)
    _, lo_auto, fin_auto = ntm_tracker_unroll(
        params, cfg, tokens, state=state, fused_bptt="auto"
    )
    _, lo_xla, fin_xla = ntm_tracker_unroll(
        params, cfg, tokens, state=state, fused_bptt=False
    )
    np.testing.assert_array_equal(np.asarray(lo_auto), np.asarray(lo_xla))
    np.testing.assert_array_equal(
        np.asarray(fin_auto["M"]), np.asarray(fin_xla["M"])
    )


def test_fused_bptt_forward_matches_jnp():
    cfg = CONFIGS["flagship_shape"]
    params, state, tokens, _ = _setup(cfg, seed=0)
    lo_ref, fin_ref = _jnp_unroll(params, cfg, tokens, state)
    lo_f, fin_f = ntm_scan_fused_bptt(params, cfg, tokens, state, interpret=True)
    np.testing.assert_allclose(np.asarray(lo_f), np.asarray(lo_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(fin_f["M"]), np.asarray(fin_ref["M"]), atol=1e-5
    )
