"""Lane-packed whole-sequence kernels (ops/pallas/scan_packed.py) vs the
jnp lax.scan over ntm_cell_step — forward values AND all gradient paths of
the packed BPTT pair, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import zlib
import pytest

from ntm_tracker_tpu.ops.pallas.scan_packed import (
    ntm_scan_packed,
    ntm_scan_packed_bptt,
)

from tests.pallas_harness import (  # shared with test_pallas_bptt.py
    CONFIGS,
    jnp_unroll as _jnp_unroll,
    make_loss as _loss,
    setup_case as _setup,
)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_packed_forward_matches_jnp(name):
    cfg = CONFIGS[name]
    params, state, tokens, _cot = _setup(
        cfg, seed=zlib.crc32(name.encode()) % 1000)

    lo_ref, fin_ref = _jnp_unroll(params, cfg, tokens, state)
    lo_p, fin_p = ntm_scan_packed(params, cfg, tokens, state, interpret=True)

    np.testing.assert_allclose(np.asarray(lo_p), np.asarray(lo_ref), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(fin_p["M"]), np.asarray(fin_ref["M"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(fin_p["w"]), np.asarray(fin_ref["w"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(fin_p["read"]), np.asarray(fin_ref["read"]), atol=2e-5
    )
    for (c_p, h_p), (c_r, h_r) in zip(
        fin_p["controller_state"], fin_ref["controller_state"]
    ):
        np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_r), atol=2e-5)
        np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_r), atol=2e-5)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_packed_bptt_matches_jax_grad(name):
    cfg = CONFIGS[name]
    params, state, tokens, cot = _setup(cfg, seed=zlib.crc32(name.encode()) % 1000)

    loss_ref = _loss(lambda p, t, s: _jnp_unroll(p, cfg, t, s), cot)
    loss_packed = _loss(
        lambda p, t, s: ntm_scan_packed_bptt(p, cfg, t, s, interpret=True), cot
    )

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        params, tokens, state
    )
    v_p, g_p = jax.value_and_grad(loss_packed, argnums=(0, 1, 2))(
        params, tokens, state
    )
    np.testing.assert_allclose(float(v_p), float(v_ref), rtol=1e-5)

    flat_ref, _tree = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_p = jax.tree_util.tree_flatten(g_p)[0]
    assert len(flat_ref) == len(flat_p)
    for (path, r), f in zip(flat_ref, flat_p):
        scale = max(1e-3, float(jnp.abs(r).max()))
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), atol=3e-5 * scale, rtol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
