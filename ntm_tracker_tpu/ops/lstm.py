"""Stacked-LSTM controller with TF BasicLSTMCell semantics.

The reference controller is
`MultiRNNCell([BasicLSTMCell(hidden, forget_bias=0.0, state_is_tuple=False)])`
(ntm_cell.py:45-50). We re-express it as a pure function over an explicit
state pytree: a list of (c, h) pairs, one per layer (the reference's
concat-[c,h] "non-tuple" state is an artifact of TF placeholders; the pytree
is the JAX-native equivalent, see SURVEY.md §7 stage 2).

TF BasicLSTMCell math (gate order i, j, f, o; bias zeros):
    gates = concat([x, h], 1) @ W + b
    i, j, f, o = split(gates, 4, axis=1)
    c' = c * sigmoid(f + forget_bias) + sigmoid(i) * tanh(j)
    h' = tanh(c') * sigmoid(o)
with forget_bias = 0.0 here.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

LSTMState = List[Tuple[jax.Array, jax.Array]]  # [(c, h)] per layer


def init_lstm_params(
    rng: jax.Array,
    input_size: int,
    hidden_size: int,
    num_layers: int,
    init_scale: float = 0.05,
    dtype=jnp.float32,
) -> list[dict[str, jax.Array]]:
    """Uniform(-init_scale, init_scale) kernels, zero biases.

    The reference inherits the experiment's random_uniform_initializer for
    the LSTM kernel via variable scope (direct_offset_output.py:528,
    ntm_tracker_new.py:14) and zero-initializes the bias.
    """
    params = []
    in_dim = input_size
    for layer in range(num_layers):
        rng, kr = jax.random.split(rng)
        params.append(
            {
                "kernel": jax.random.uniform(
                    kr, (in_dim + hidden_size, 4 * hidden_size),
                    minval=-init_scale, maxval=init_scale, dtype=dtype,
                ),
                "bias": jnp.zeros((4 * hidden_size,), dtype=dtype),
            }
        )
        in_dim = hidden_size
    return params


def zero_lstm_state(batch: int, hidden_size: int, num_layers: int, dtype=jnp.float32) -> LSTMState:
    return [
        (jnp.zeros((batch, hidden_size), dtype), jnp.zeros((batch, hidden_size), dtype))
        for _ in range(num_layers)
    ]


def lstm_cell_step(
    params: dict[str, jax.Array],
    x: jax.Array,
    state: Tuple[jax.Array, jax.Array],
    forget_bias: float = 0.0,
    compute_dtype=None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """One BasicLSTMCell step. x: [B, in], state: ([B,H], [B,H])."""
    c, h = state
    kernel, bias = params["kernel"], params["bias"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        h = h.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    gates = (
        jnp.concatenate([x, h], axis=1) @ kernel
    ).astype(jnp.float32) + bias
    i, j, f, o = jnp.split(gates, 4, axis=1)
    new_c = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return new_h, (new_c, new_h)


def multi_lstm_step(
    params: Sequence[dict[str, jax.Array]],
    x: jax.Array,
    state: LSTMState,
    forget_bias: float = 0.0,
    compute_dtype=None,
) -> Tuple[jax.Array, LSTMState]:
    """Stacked LSTM (MultiRNNCell) step: each layer feeds the next."""
    new_state: LSTMState = []
    out = x
    for layer_params, layer_state in zip(params, state):
        out, s = lstm_cell_step(layer_params, out, layer_state, forget_bias, compute_dtype)
        new_state.append(s)
    return out, new_state
