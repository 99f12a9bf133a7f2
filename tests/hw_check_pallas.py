"""Hardware-mode Pallas coverage: Mosaic-compile the fused kernels in every
user-reachable configuration and assert parity against the jnp path ON THE
REAL TPU (CI runs interpret-mode only; conftest forces CPU there).

Run per round:  python tests/hw_check_pallas.py
Exit code 0 = all configurations compile and match.

Covers (VERDICT r1 'weak #4'): the padded multi-layer controller path,
write_head_size=2, shift_range=2, and bf16-configured matmuls, for both the
whole-sequence kernel (scan_cell.ntm_scan_fused) and the single-step
addressing kernel (addressing.fused_ntm_addressing).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

# TPU f32 matmuls default to bf16 passes; pin true f32 so the f32 parity
# bound is meaningful (the bf16 configurations test the fast path)
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntm_tracker_tpu.config import NTMConfig
from ntm_tracker_tpu.models.ntm_cell import (
    init_ntm_params,
    init_ntm_state,
)
from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll
from ntm_tracker_tpu.ops.pallas.scan_cell import ntm_scan_fused

CONFIGS = {
    # the flagship serving config (exercised by bench, kept as a baseline)
    "flagship": NTMConfig(),
    # padded stacked-controller path (scan_cell.py pads layer-0 kernel rows)
    "two-layer": NTMConfig(controller_num_layers=2, controller_hidden_size=64),
    # multi-write-head erase/add reduce + wide shift offsets {-3..1}
    "write2-shift2": NTMConfig(
        read_head_size=2, write_head_size=2, shift_range=2,
        controller_hidden_size=64,
    ),
    "write-first": NTMConfig(write_first=True, controller_hidden_size=64),
    # the opt-in PROPER cosine (each memory slot normalized over mem_dim)
    "slotwise": NTMConfig(slotwise_cosine=True, controller_hidden_size=64),
}


def check_scan(name, cfg, compute_dtype=None, B=1, T=65, IN=514):
    params = init_ntm_params(jax.random.PRNGKey(0), cfg, IN)
    state = init_ntm_state(params, cfg, B)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN), jnp.float32)

    logits_f, final_f = jax.jit(
        lambda p, t, s: ntm_scan_fused(p, cfg, t, s, compute_dtype=compute_dtype)
    )(params, tokens, state)
    _, logits_j, final_j = jax.jit(
        lambda p, t, s: ntm_tracker_unroll(
            p, cfg, t, state=s, remat=False, compute_dtype=compute_dtype
        )
    )(params, tokens, state)

    # bf16 matmuls diverge between MXU programs by a few bf16 ULPs/step
    tol = 1e-4 if compute_dtype is None else 5e-2
    worst = float(jnp.max(jnp.abs(logits_f - logits_j)))
    assert worst <= tol, f"{name}: logits diff {worst:.2e} > {tol}"
    m_diff = float(jnp.max(jnp.abs(final_f["M"] - final_j["M"])))
    assert m_diff <= tol, f"{name}: M diff {m_diff:.2e} > {tol}"
    dt = "bf16" if compute_dtype is not None else "f32"
    print(f"  PASS scan  {name:16s} [{dt}] worst logit diff {worst:.2e}")


def check_addressing(name, cfg, B=1):
    from ntm_tracker_tpu.ops.pallas.addressing import fused_ntm_addressing

    rng = jax.random.PRNGKey(2)
    H, R, W = cfg.num_heads, cfg.read_head_size, cfg.write_head_size
    D, N, S = cfg.mem_dim, cfg.mem_size, cfg.shift_space
    ks = jax.random.split(rng, 9)
    k = jax.random.normal(ks[0], (B, H, D))
    beta = jax.random.normal(ks[1], (B, H))
    g = jax.random.normal(ks[2], (B, H))
    sw = jax.random.normal(ks[3], (B, H, S))
    gamma = jax.random.normal(ks[4], (B, H))
    erase = jax.random.normal(ks[5], (B, W, D))
    add = jax.random.normal(ks[6], (B, W, D))
    M_prev = jax.random.normal(ks[7], (B, N, D))
    w_prev = jax.nn.softmax(jax.random.normal(ks[8], (B, H, N)), -1)

    M, w, read = fused_ntm_addressing(
        k, beta, g, sw, gamma, erase, add, M_prev, w_prev,
        read_heads=R, write_first=cfg.write_first,
        slotwise=cfg.slotwise_cosine,
    )
    # jnp reference via the cell's addressing block (addressing._jnp_addressing)
    from ntm_tracker_tpu.ops.pallas.addressing import _jnp_addressing

    Mr, wr, readr = _jnp_addressing(
        k, beta, g, sw, gamma, erase, add, M_prev, w_prev,
        read_heads=R, write_first=cfg.write_first, slotwise=cfg.slotwise_cosine,
    )
    for a, b, lbl in ((M, Mr, "M"), (w, wr, "w"), (read, readr, "read")):
        diff = float(jnp.max(jnp.abs(a - b)))
        assert diff <= 1e-4, f"{name}: {lbl} diff {diff:.2e}"
    print(f"  PASS addr  {name}")


def check_bptt(name, cfg, B=8, T=65, IN=514, label="", batch_tile=None):
    """Mosaic-compile the whole-sequence BPTT pair (residual forward +
    hand-derived backward, ops/pallas/scan_bptt.py) on the real chip and
    assert gradient parity against jax.grad of the jnp scan. Run once
    inside a single batch tile (B=8) and once across tiles with padding
    (B=40 at batch_tile=32: two grid tiles, the second 24-row padded) —
    the r4 batch-tiled grid must accumulate param grads across tiles and
    keep padded rows at exactly zero contribution ON HARDWARE, not just
    in interpret mode. batch_tile overrides scan_bptt.BATCH_TILE for this
    check (restored after): with the default tile of 64, B=40 would be a
    SINGLE unpadded 40-row tile and the multi-tile claim would be hollow
    (r4 advisor finding)."""
    from ntm_tracker_tpu.ops.pallas import scan_bptt
    from ntm_tracker_tpu.ops.pallas.scan_bptt import ntm_scan_fused_bptt

    saved_tile = scan_bptt.BATCH_TILE
    if batch_tile is not None:
        scan_bptt.BATCH_TILE = batch_tile
    try:
        if label:  # the multi-tile label must actually mean multi-tile
            _Bt, Bp, nb = scan_bptt._tiles_of(B)
            assert nb > 1 and Bp > B, (
                f"{name}{label}: expected >1 grid tiles with padding, got "
                f"nb={nb} Bp={Bp} for B={B} (tile {scan_bptt.BATCH_TILE})"
            )
        _check_bptt_body(name, cfg, B, T, IN, label, ntm_scan_fused_bptt)
    finally:
        scan_bptt.BATCH_TILE = saved_tile


def _check_bptt_body(name, cfg, B, T, IN, label, ntm_scan_fused_bptt):
    params = init_ntm_params(jax.random.PRNGKey(0), cfg, IN)
    state = init_ntm_state(params, cfg, B)
    tokens = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, T, IN),
                                     jnp.float32)

    def loss(unroll):
        def f(p, t, s):
            logits, final = unroll(p, t, s)
            return jnp.mean(logits ** 2) + jnp.mean(final["M"] ** 2)
        return f

    def jnp_unroll(p, t, s):
        _, logits, final = ntm_tracker_unroll(p, cfg, t, state=s, remat=False)
        return logits, final

    g_f = jax.jit(jax.grad(loss(
        lambda p, t, s: ntm_scan_fused_bptt(p, cfg, t, s)
    )))(params, tokens, state)
    g_j = jax.jit(jax.grad(loss(jnp_unroll)))(params, tokens, state)
    worst = 0.0
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g_f)[0],
        jax.tree_util.tree_leaves(g_j),
    ):
        scale = max(1e-3, float(jnp.abs(b).max()))
        d = float(jnp.max(jnp.abs(a - b))) / scale
        assert d <= 2e-4, (
            f"{name}: grad rel diff {d:.2e} at {jax.tree_util.keystr(path)}"
        )
        worst = max(worst, d)
    tag = f"{name}{label}"
    print(f"  PASS bptt  {tag:16s} [f32] worst grad rel diff {worst:.2e}")


def check_packed(name, cfg, B=8, T=65, IN=514):
    """Mosaic-compile the lane-packed pair (ops/pallas/scan_packed.py) on
    the real chip: forward parity vs the jnp scan, gradient parity vs
    jax.grad. Kept as a measured alternate (see its docstring verdict) —
    this guards that it stays hardware-compilable."""
    from ntm_tracker_tpu.ops.pallas.scan_packed import (
        ntm_scan_packed,
        ntm_scan_packed_bptt,
    )

    params = init_ntm_params(jax.random.PRNGKey(0), cfg, IN)
    state = init_ntm_state(params, cfg, B)
    tokens = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, T, IN),
                                     jnp.float32)

    logits_p, final_p = jax.jit(
        lambda p, t, s: ntm_scan_packed(p, cfg, t, s)
    )(params, tokens, state)
    _, logits_j, final_j = jax.jit(
        lambda p, t, s: ntm_tracker_unroll(p, cfg, t, state=s, remat=False)
    )(params, tokens, state)
    worst_f = float(jnp.max(jnp.abs(logits_p - logits_j)))
    assert worst_f <= 1e-4, f"{name}: packed fwd logits diff {worst_f:.2e}"

    def loss(unroll):
        def f(p, t, s):
            logits, final = unroll(p, t, s)
            return jnp.mean(logits ** 2) + jnp.mean(final["M"] ** 2)
        return f

    def jnp_unroll(p, t, s):
        _, logits, final = ntm_tracker_unroll(p, cfg, t, state=s, remat=False)
        return logits, final

    g_p = jax.jit(jax.grad(loss(
        lambda p, t, s: ntm_scan_packed_bptt(p, cfg, t, s)
    )))(params, tokens, state)
    g_j = jax.jit(jax.grad(loss(jnp_unroll)))(params, tokens, state)
    worst = 0.0
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g_p)[0],
        jax.tree_util.tree_leaves(g_j),
    ):
        scale = max(1e-3, float(jnp.abs(b).max()))
        d = float(jnp.max(jnp.abs(a - b))) / scale
        assert d <= 2e-4, (
            f"{name}: packed grad rel diff {d:.2e} at "
            f"{jax.tree_util.keystr(path)}"
        )
        worst = max(worst, d)
    print(f"  PASS packd {name:16s} [f32] fwd {worst_f:.2e} "
          f"grad rel {worst:.2e}")


def check_int8(B=2):
    """XLA-compile the opt-in int8 VGG token path (models/vgg_int8.py) on
    the real chip and pin its cosine agreement with the exact f32 path —
    guards that s8xs8->s32 convs lower on this backend and that hardware
    rounding stays inside the tested envelope."""
    from ntm_tracker_tpu.models.vgg import init_vgg_params, vgg16_conv43_tokens
    from ntm_tracker_tpu.models.vgg_int8 import vgg16_conv43_tokens_int8

    params = init_vgg_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(
        jax.random.PRNGKey(1), (B, 224, 224, 3), minval=-120.0, maxval=130.0
    )
    t32 = np.asarray(jax.jit(vgg16_conv43_tokens)(params, img), np.float64)
    t8 = np.asarray(jax.jit(vgg16_conv43_tokens_int8)(params, img), np.float64)
    num = (t32 * t8).sum(-1)
    den = np.linalg.norm(t32, axis=-1) * np.linalg.norm(t8, axis=-1) + 1e-12
    cos = float((num / den).min())
    assert cos > 0.99, f"int8 tokens diverged on hardware: min cosine {cos}"
    print(f"  PASS int8  vgg-tokens       [s8] min token cosine {cos:.5f}")


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}")
    if backend not in ("tpu", "axon"):
        print("NOT a TPU backend — this script checks Mosaic compilation; "
              "run it on the TPU host.")
        return 1
    for name, cfg in CONFIGS.items():
        check_scan(name, cfg)
    check_scan("flagship", CONFIGS["flagship"], compute_dtype=jnp.bfloat16)
    check_scan("write2-shift2", CONFIGS["write2-shift2"],
               compute_dtype=jnp.bfloat16)
    check_addressing("flagship", CONFIGS["flagship"])
    check_addressing("write2-shift2", CONFIGS["write2-shift2"])
    check_addressing("write-first", CONFIGS["write-first"])
    check_addressing("slotwise", CONFIGS["slotwise"])
    check_bptt("flagship", CONFIGS["flagship"])
    check_bptt("flagship", CONFIGS["flagship"], B=40, label=" B40/2tile",
               batch_tile=32)
    # fused BPTT is the default single-chip training path since r4
    # (TrainConfig.fused_bptt="auto"), so hardware-compile the backward's
    # config-dependent loops too: multi-write-head erase/add + wide shifts
    # (write2-shift2) and the slotwise-cosine VJP (slotwise) — interpret
    # mode already asserts their semantics, this guards Mosaic lowering.
    check_bptt("write2-shift2", CONFIGS["write2-shift2"])
    check_bptt("slotwise", CONFIGS["slotwise"])
    check_packed("flagship", CONFIGS["flagship"])
    try:
        check_int8()
    except AssertionError:
        raise  # a numerically-wrong int8 path IS fatal
    except Exception as e:
        # opt-in path: ONLY a backend lowering/compile gap may downgrade to
        # SKIP — a Python-level failure inside the int8 path (shape/pytree/
        # dtype bug) must fail the gate, not print ALL PASSED
        is_lowering_gap = (
            isinstance(e, NotImplementedError)
            or type(e).__name__ in ("XlaRuntimeError", "JaxRuntimeError")
            or "UNIMPLEMENTED" in str(e)
            or "Unsupported" in str(e)
        )
        if not is_lowering_gap:
            raise
        print(f"  SKIP int8  vgg-tokens       (did not lower: {e})")
    print("ALL HARDWARE PALLAS CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
