"""The NTM cell as a pure function: (params, state, x) -> (y, logit, state).

Faithful re-expression of the reference `ntm_cell.py` (NTMCell.__call__
:53-253, zero_state :284-315) with the exact math contracts:

  * one fused linear emits every head parameter
    (k, beta, g, sw, gamma, erase, add) — ntm_cell.py:113-130
  * content addressing: cosine(M, tanh(k)) * softplus(beta) -> softmax
    — ntm_cell.py:133-143
  * interpolation gate g (sigmoid) against the previous weights
    — ntm_cell.py:151-156
  * circular shift with softmaxed kernel and the reference's asymmetric
    Py2 shift offsets — ntm_cell.py:159-166, ops.py:201-214
  * sharpening pow(softplus(gamma)+1) with the `+1e-3` normalizer
    — ntm_cell.py:169-176
  * erase/add memory update: M = M_prev * prod(1 - w^T e) + sum(w^T a)
    — ntm_cell.py:193-210
  * read before (default) or after the write (`write_first`)
    — ntm_cell.py:212-215
  * softmaxed output head on the controller output — ntm_cell.py:220-221
  * learnable initial state: tanh/sigmoid-squashed parameters broadcast
    over batch — ntm_cell.py:284-315

State is a pytree dict {'M','w','read','controller_state'} mirroring the
reference's state dict (ntm_cell.py:223-228), so the streaming
`state_placeholder` contract (:255-282) becomes "pass the pytree back in".
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ntm_tracker_tpu.config import NTMConfig
from ntm_tracker_tpu.ops.lstm import init_lstm_params, multi_lstm_step, zero_lstm_state
from ntm_tracker_tpu.ops.memory import (
    batched_circular_convolution,
    batched_slotwise_cosine_similarity,
    batched_slotwise_cosine_similarity_dn,
    batched_smooth_cosine_similarity,
    batched_smooth_cosine_similarity_dn,
    sharpen,
)

NTMState = Dict[str, Any]


def _uniform(rng, shape, scale, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, minval=-scale, maxval=scale, dtype=dtype)


def head_param_sizes(cfg: NTMConfig) -> Dict[str, int]:
    """Sizes of the fused head-parameter unpack (ntm_cell.py:113-126)."""
    h = cfg.num_heads
    return {
        "k": cfg.mem_dim * h,
        "beta": h,
        "g": h,
        "sw": cfg.shift_space * h,
        "gamma": h,
        "erase": cfg.mem_dim * cfg.write_head_size,
        "add": cfg.mem_dim * cfg.write_head_size,
    }


def init_ntm_params(rng: jax.Array, cfg: NTMConfig, input_size: int) -> Dict[str, Any]:
    """Create the parameter pytree.

    input_size is the per-token feature depth BEFORE the read vectors are
    concatenated (the cell appends read_head_size*mem_dim internally,
    ntm_cell.py:101-105).
    """
    sizes = head_param_sizes(cfg)
    total_head = sum(sizes.values())
    controller_in = input_size + cfg.read_head_size * cfg.mem_dim
    ks = jax.random.split(rng, 8)
    return {
        "controller": init_lstm_params(
            ks[0], controller_in, cfg.controller_hidden_size,
            cfg.controller_num_layers, cfg.init_scale,
        ),
        # fused head-param linear (ntm_cell.py:124-126); bias zeros.
        "heads_w": _uniform(ks[1], (cfg.controller_hidden_size, total_head), cfg.init_scale),
        "heads_b": jnp.zeros((total_head,), jnp.float32),
        # output head (ntm_cell.py:220)
        "out_w": _uniform(ks[2], (cfg.controller_hidden_size, cfg.output_dim), cfg.init_scale),
        "out_b": jnp.zeros((cfg.output_dim,), jnp.float32),
        # learnable initial state, stored raw and squashed in init_ntm_state
        # (ntm_cell.py:292-308).
        "init_M": _uniform(ks[3], (cfg.mem_size, cfg.mem_dim), cfg.init_scale),
        "init_w": _uniform(ks[4], (cfg.num_heads, cfg.mem_size), cfg.init_scale),
        "init_read": _uniform(ks[5], (cfg.read_head_size, cfg.mem_dim), cfg.init_scale),
    }


def init_ntm_state(params: Dict[str, Any], cfg: NTMConfig, batch: int) -> NTMState:
    """Learnable initial state broadcast over batch (ntm_cell.py:284-315)."""
    bcast = lambda x: jnp.broadcast_to(x, (batch,) + x.shape)
    return {
        "M": bcast(jnp.tanh(params["init_M"])),
        "w": bcast(jax.nn.sigmoid(params["init_w"])),
        "read": bcast(jnp.tanh(params["init_read"])),
        "controller_state": zero_lstm_state(
            batch, cfg.controller_hidden_size, cfg.controller_num_layers
        ),
    }


def ntm_cell_step(
    params: Dict[str, Any],
    cfg: NTMConfig,
    inputs: jax.Array,
    state: NTMState,
    compute_dtype=None,
    with_debug: bool = False,
) -> Tuple[jax.Array, jax.Array, NTMState]:
    """One NTM step.

    Args:
      inputs: [batch, input_size] serialized token.
      state: {'M' [B,N,D], 'w' [B,H,N], 'read' [B,R,D], 'controller_state'}.
      with_debug: also return the dict of every addressing intermediate
        (the reference's `debug` output, ntm_cell.py:230-250) — jnp path only.
    Returns:
      (output [B,out] softmaxed, logit [B,out], new_state[, debug]).
    """
    M_prev, w_prev, read_prev = state["M"], state["w"], state["read"]
    B = inputs.shape[0]
    R, W, H, D = (
        cfg.read_head_size,
        cfg.write_head_size,
        cfg.num_heads,
        cfg.mem_dim,
    )

    # controller (ntm_cell.py:101-105)
    ctrl_in = jnp.concatenate([inputs, read_prev.reshape(B, R * D)], axis=1)
    ctrl_out, ctrl_state = multi_lstm_step(
        params["controller"], ctrl_in, state["controller_state"],
        forget_bias=0.0, compute_dtype=compute_dtype,
    )

    # fused head-parameter unpack (ntm_cell.py:124-130)
    mm_dtype = compute_dtype or ctrl_out.dtype
    memory_controls = (
        ctrl_out.astype(mm_dtype) @ params["heads_w"].astype(mm_dtype)
    ).astype(jnp.float32) + params["heads_b"]
    sizes = head_param_sizes(cfg)
    splits = []
    off = 0
    for name in ("k", "beta", "g", "sw", "gamma", "erase", "add"):
        splits.append(memory_controls[:, off : off + sizes[name]])
        off += sizes[name]
    k, beta, g, sw, gamma, erase, add = splits

    # output head (ntm_cell.py:220-221) — depends only on ctrl_out, so it is
    # shared by the Pallas and jnp branches below
    logit = (
        ctrl_out.astype(mm_dtype) @ params["out_w"].astype(mm_dtype)
    ).astype(jnp.float32) + params["out_b"]
    output = jax.nn.softmax(logit, axis=-1)

    if cfg.use_pallas and not with_debug:
        # (with_debug needs the intermediates, so it always takes the jnp
        # path below, even when the kernel is enabled)
        from ntm_tracker_tpu.ops.pallas.addressing import fused_ntm_addressing

        M, w, read = fused_ntm_addressing(
            k.reshape(B, H, D), beta, g,
            sw.reshape(B, H, cfg.shift_space), gamma,
            erase.reshape(B, cfg.write_head_size, D),
            add.reshape(B, cfg.write_head_size, D),
            M_prev, w_prev,
            read_heads=R, write_first=cfg.write_first,
            slotwise=cfg.slotwise_cosine,
        )
        new_state = {"M": M, "w": w, "read": read, "controller_state": ctrl_state}
        return output, logit, new_state

    # addressing (ntm_cell.py:133-176)
    k = jnp.tanh(k.reshape(B, H, D))
    cos_fn = (
        batched_slotwise_cosine_similarity
        if cfg.slotwise_cosine
        else batched_smooth_cosine_similarity
    )
    similarity = cos_fn(M_prev, k)
    beta = jax.nn.softplus(beta)[..., None]
    w_content = jax.nn.softmax(similarity * beta, axis=-1)
    g = jax.nn.sigmoid(g)[..., None]
    w_gated = w_content * g + w_prev * (1.0 - g)
    sw = jax.nn.softmax(sw.reshape(B, H, cfg.shift_space), axis=-1)
    w_conv = batched_circular_convolution(w_gated, sw)
    gamma = (jax.nn.softplus(gamma) + 1.0)[..., None]
    w = sharpen(w_conv, gamma)

    w_read = w[:, :R, :]
    w_write = w[:, R:, :]

    # erase/add write (ntm_cell.py:193-210)
    erase = jax.nn.sigmoid(erase.reshape(B, W, D))
    add = jnp.tanh(add.reshape(B, W, D))
    # outer products over (mem_size, mem_dim) per write head
    w_write_e = w_write[..., :, None]  # [B,W,N,1]
    M_erase = jnp.prod(1.0 - w_write_e * erase[:, :, None, :], axis=1)  # [B,N,D]
    M_write = jnp.sum(w_write_e * add[:, :, None, :], axis=1)  # [B,N,D]
    M = M_prev * M_erase + M_write

    # read (ntm_cell.py:212-215)
    read_src = M if cfg.write_first else M_prev
    read = jnp.einsum(
        "brn,bnd->brd", w_read, read_src, preferred_element_type=jnp.float32
    )

    new_state = {"M": M, "w": w, "read": read, "controller_state": ctrl_state}
    if with_debug:
        debug = {
            "k": k, "gamma": gamma, "add": add, "erase": erase, "beta": beta,
            "g": g, "sw": sw, "similarity": similarity,
            "w_content_focused": w_content, "w_gated": w_gated,
            "w_conv": w_conv, "w": w, "w_read": w_read, "w_write": w_write,
            "M": M, "M_prev": M_prev, "M_write": M_write, "M_erase": M_erase,
        }
        return output, logit, new_state, debug
    return output, logit, new_state


def ntm_cell_step_dn(
    params: Dict[str, Any],
    cfg: NTMConfig,
    inputs: jax.Array,
    state: NTMState,
    compute_dtype=None,
) -> Tuple[jax.Array, jax.Array, NTMState]:
    """Layout-optimized twin of `ntm_cell_step` for the training scan.

    The memory is carried TRANSPOSED as state['M_dn'] [B, mem_dim, mem_size]
    instead of [B, mem_size, mem_dim]. Why this matters on TPU: XLA tiles
    the two minor dims to (8 sublanes, 128 lanes), so the reference layout's
    mem_dim=20 minor axis is padded to 128 lanes — a 6.4x tax on the HBM
    bytes and VPU work of EVERY M-shaped tensor (the scan carry, erase/add
    intermediates, and all their backward cotangents, each touched 2600
    times per 1300-step BPTT). In [B, D, N] the 128-slot axis fills the
    lanes exactly and D=20 pads only 20->24 sublanes.

    MEASURED OUTCOME (v5e, B=256 knee, tools/profile_train.py dn_layout
    variants): 288.8 ms vs the reference layout's 288.7 — XLA's layout
    assignment already avoids the naive padding tax, so this is a
    documented NEGATIVE result kept behind TrainConfig.scan_layout for
    shapes/toolchains where the balance differs.

    Same math as ntm_cell_step up to float reassociation (einsum operand
    order); equivalence is asserted in tests/test_ntm_cell.py. The
    addressing quirk chain (across-slot cosine, Py2 shifts, +1e-3 sharpen)
    is untouched. cfg.use_pallas is ignored here (the jnp path IS the fast
    path at training batch sizes).

    Returns (output, logit, new_state) with new_state carrying 'M_dn'.
    """
    M_dn, w_prev, read_prev = state["M_dn"], state["w"], state["read"]
    B = inputs.shape[0]
    R, W, H, D = (
        cfg.read_head_size,
        cfg.write_head_size,
        cfg.num_heads,
        cfg.mem_dim,
    )

    ctrl_in = jnp.concatenate([inputs, read_prev.reshape(B, R * D)], axis=1)
    ctrl_out, ctrl_state = multi_lstm_step(
        params["controller"], ctrl_in, state["controller_state"],
        forget_bias=0.0, compute_dtype=compute_dtype,
    )

    mm_dtype = compute_dtype or ctrl_out.dtype
    memory_controls = (
        ctrl_out.astype(mm_dtype) @ params["heads_w"].astype(mm_dtype)
    ).astype(jnp.float32) + params["heads_b"]
    sizes = head_param_sizes(cfg)
    splits = []
    off = 0
    for name in ("k", "beta", "g", "sw", "gamma", "erase", "add"):
        splits.append(memory_controls[:, off : off + sizes[name]])
        off += sizes[name]
    k, beta, g, sw, gamma, erase, add = splits

    logit = (
        ctrl_out.astype(mm_dtype) @ params["out_w"].astype(mm_dtype)
    ).astype(jnp.float32) + params["out_b"]
    output = jax.nn.softmax(logit, axis=-1)

    k = jnp.tanh(k.reshape(B, H, D))
    cos_fn = (
        batched_slotwise_cosine_similarity_dn
        if cfg.slotwise_cosine
        else batched_smooth_cosine_similarity_dn
    )
    similarity = cos_fn(M_dn, k)
    beta = jax.nn.softplus(beta)[..., None]
    w_content = jax.nn.softmax(similarity * beta, axis=-1)
    g = jax.nn.sigmoid(g)[..., None]
    w_gated = w_content * g + w_prev * (1.0 - g)
    sw = jax.nn.softmax(sw.reshape(B, H, cfg.shift_space), axis=-1)
    w_conv = batched_circular_convolution(w_gated, sw)
    gamma = (jax.nn.softplus(gamma) + 1.0)[..., None]
    w = sharpen(w_conv, gamma)

    w_read = w[:, :R, :]
    w_write = w[:, R:, :]

    erase = jax.nn.sigmoid(erase.reshape(B, W, D))
    add = jnp.tanh(add.reshape(B, W, D))
    # [B,W,D,1] x [B,W,1,N] -> [B,D,N] (prod/sum over write heads)
    w_write_e = w_write[:, :, None, :]
    M_erase = jnp.prod(1.0 - erase[..., None] * w_write_e, axis=1)
    M_write = jnp.sum(add[..., None] * w_write_e, axis=1)
    M_new = M_dn * M_erase + M_write

    read_src = M_new if cfg.write_first else M_dn
    read = jnp.einsum(
        "brn,bdn->brd", w_read, read_src, preferred_element_type=jnp.float32
    )

    new_state = {
        "M_dn": M_new, "w": w, "read": read, "controller_state": ctrl_state,
    }
    return output, logit, new_state


def state_to_dn(state: NTMState) -> NTMState:
    """Reference-layout state -> the training scan's transposed carry."""
    out = dict(state)
    out["M_dn"] = jnp.swapaxes(out.pop("M"), 1, 2)
    return out


def state_from_dn(state_dn: NTMState) -> NTMState:
    """Transposed carry -> reference-layout state (M [B, N, D])."""
    out = dict(state_dn)
    out["M"] = jnp.swapaxes(out.pop("M_dn"), 1, 2)
    return out
