"""DNC core: LSTM controller + MemoryAccess + output linear.

Pure-function re-expression of dnc/dnc.py:36-142:
  controller input  = concat(x, prev read words)      (:106-107)
  output            = Linear(concat(ctrl_out, reads)) (:118-121)
  clip_value clamps controller/core outputs and state (:78-82,112-113)

The sonnet LSTM controller uses forget_bias=1.0 (snt.LSTM default), unlike
the NTM cell's BasicLSTMCell(forget_bias=0).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ntm_tracker_tpu.config import DNCConfig
from ntm_tracker_tpu.models.dnc.access import (
    AccessState,
    init_access_params,
    init_access_state,
    memory_access_step,
)
from ntm_tracker_tpu.ops.lstm import init_lstm_params, multi_lstm_step, zero_lstm_state


class DNCState(NamedTuple):
    access_output: jax.Array  # [B, R, W] read words
    access_state: AccessState
    controller_state: Any


def init_dnc_params(rng: jax.Array, cfg: DNCConfig, input_size: int) -> Dict[str, Any]:
    R, W = cfg.num_reads, cfg.word_size
    ctrl_in = input_size + R * W
    ks = jax.random.split(rng, 3)
    ctrl = init_lstm_params(ks[0], ctrl_in, cfg.hidden_size, 1, init_scale=0.0)
    # sonnet LSTM init: truncated normal 1/sqrt(fan_in) on the kernel
    fan_in = ctrl_in + cfg.hidden_size
    std = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    ctrl[0]["kernel"] = (
        jax.random.truncated_normal(ks[0], -2.0, 2.0, ctrl[0]["kernel"].shape) * std
    ).astype(jnp.float32)
    out_in = cfg.hidden_size + R * W
    std_o = 1.0 / jnp.sqrt(jnp.asarray(out_in, jnp.float32))
    return {
        "controller": ctrl,
        "access": init_access_params(ks[1], cfg, cfg.hidden_size),
        "out_w": (
            jax.random.truncated_normal(ks[2], -2.0, 2.0, (out_in, cfg.output_dim)) * std_o
        ).astype(jnp.float32),
        "out_b": jnp.zeros((cfg.output_dim,), jnp.float32),
    }


def init_dnc_state(cfg: DNCConfig, batch: int) -> DNCState:
    """Zeros everywhere (dnc/dnc.py:129-134)."""
    return DNCState(
        access_output=jnp.zeros((batch, cfg.num_reads, cfg.word_size)),
        access_state=init_access_state(cfg, batch),
        controller_state=zero_lstm_state(batch, cfg.hidden_size, 1),
    )


def _clip(x: jax.Array, clip_value: float) -> jax.Array:
    if clip_value and clip_value > 0:
        return jnp.clip(x, -clip_value, clip_value)
    return x


def dnc_step(
    params: Dict[str, Any],
    cfg: DNCConfig,
    inputs: jax.Array,
    prev_state: DNCState,
) -> Tuple[jax.Array, DNCState]:
    """One DNC step (dnc/dnc.py:84-127). inputs: [B, input_size]."""
    B = inputs.shape[0]
    ctrl_in = jnp.concatenate(
        [inputs.reshape(B, -1), prev_state.access_output.reshape(B, -1)], axis=1
    )
    ctrl_out, ctrl_state = multi_lstm_step(
        params["controller"], ctrl_in, prev_state.controller_state, forget_bias=1.0
    )
    ctrl_out = _clip(ctrl_out, cfg.clip_value)
    ctrl_state = jax.tree.map(lambda t: _clip(t, cfg.clip_value), ctrl_state)

    access_output, access_state = memory_access_step(
        params["access"], cfg, ctrl_out, prev_state.access_state
    )

    output = jnp.concatenate([ctrl_out, access_output.reshape(B, -1)], axis=1)
    output = output @ params["out_w"] + params["out_b"]
    output = _clip(output, cfg.clip_value)
    return output, DNCState(
        access_output=access_output,
        access_state=access_state,
        controller_state=ctrl_state,
    )


def dnc_unroll(
    params: Dict[str, Any],
    cfg: DNCConfig,
    inputs: jax.Array,
    state: Optional[DNCState] = None,
    remat: bool = True,
    time_major: bool = False,
    remat_chunk: Optional[int] = None,
) -> Tuple[jax.Array, DNCState]:
    """Scan the DNC over a sequence.

    The reference wraps the core in tf.nn.dynamic_rnn(time_major=True)
    (dnc/train.py:69-91, direct_offset_output_with_dnc.py:66-88).

    Even with the per-step jax.checkpoint, a scan's backward saves every
    step's CARRY — and the DNC carry is dominated by the [B, W, N, N]
    temporal link matrix (8.4 MB at B=256/N=128: 21.8 GB over a 1300-step
    sequence, past v5e HBM). remat_chunk=C nests the scan so only every
    C-th boundary carry persists and the backward replays one chunk at a
    time (T/C boundary saves + C transient saves). Gradients are exact —
    same math, different save schedule. Default None picks C=65 (the
    serialized frame length) automatically once the saved carry stream
    would exceed ~2 GB; 0 forces plain per-step saving.

    Args:
      inputs: [B, T, D] (or [T, B, D] if time_major).
    Returns:
      (outputs in the same layout, final state)
    """
    xs = inputs if time_major else jnp.swapaxes(inputs, 0, 1)
    T = xs.shape[0]
    if state is None:
        state = init_dnc_state(cfg, xs.shape[1])

    if remat_chunk is None:
        link_bytes = 4 * xs.shape[1] * cfg.num_writes * cfg.memory_size ** 2
        remat_chunk = 65 if (remat and T * link_bytes > (2 << 30)) else 0

    def body(carry, x_t):
        out, new_state = dnc_step(params, cfg, x_t, carry)
        return new_state, out

    if remat:
        body = jax.checkpoint(body)
    if remat and remat_chunk and T >= remat_chunk:
        C = remat_chunk
        n_chunks, tail_n = divmod(T, C)

        @jax.checkpoint
        def chunk_body(carry, x_chunk):
            return jax.lax.scan(body, carry, x_chunk)

        main = xs[: n_chunks * C].reshape(n_chunks, C, *xs.shape[1:])
        final_state, outputs = jax.lax.scan(chunk_body, state, main)
        outputs = outputs.reshape(n_chunks * C, *outputs.shape[2:])
        if tail_n:
            final_state, tail_out = jax.lax.scan(
                body, final_state, xs[n_chunks * C :]
            )
            outputs = jnp.concatenate([outputs, tail_out], axis=0)
    else:
        final_state, outputs = jax.lax.scan(body, state, xs)
    if not time_major:
        outputs = jnp.swapaxes(outputs, 0, 1)
    return outputs, final_state
