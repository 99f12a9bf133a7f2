"""The legacy NTM tracker (reference ntm.py) as pure functions.

This is the reference's OLDER model — unreached by any entry point there
(SURVEY.md §2 row 3) — rebuilt as a usable model because its math is
genuinely different from the newer cell (models/ntm_cell.py):

  * hand-rolled per-gate LSTM controller: separate input/forget/output/
    update linears per layer; layer 0's gate input is
    [x, target, o_prev, read_0..read_{R-1}] (ntm.py:171-213); there is NO
    forget bias and the cell state never enters the gates
  * per-head SEPARATE linears for k/g/s_w/beta/gamma(+erase/add)
    (ntm.py:221-270) instead of one fused unpack
  * smooth cosine with the +1e-3 norm smoothing (ops.py:161-178)
  * SYMMETRIC circular-shift offsets via the index-gather convolution
    (ops.py:244-275) — not the batched Py2 floor-division offsets
  * sharpening WITHOUT the +1e-3 normalizer: w = w^gamma / sum(w^gamma)
    (ntm.py:259-260)
  * the target indicator is a separate controller input fed on step 0 and
    zero afterwards (ntm.py:69-75) — not a token channel
  * learnable initial state stored as Linear-over-zero-dummy biases
    (ntm.py:273-332): tanh(M), tanh(read), tanh(output/hidden), and
    softmax(read_w/write_w) whose raw values START at the reversed range
    [N..1] (Linear is_range=True, ops.py:112-121) so the initial attention
    peaks at slot 0

The core is written unbatched exactly like the reference (everything is a
vector per sample) and batched with jax.vmap; the sequence loop is a
lax.scan. Parity with the EXECUTED reference graph is pinned by
tests/test_tf_parity.py::TestExecutedLegacyNTM against fixtures from
tests/gen_tf_goldens.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ntm_tracker_tpu.ops.memory import smooth_cosine_similarity
from ntm_tracker_tpu.utils.misc import circular_convolution_1d

GATES = ("input", "forget", "output", "update")


@dataclasses.dataclass(frozen=True)
class LegacyNTMConfig:
    """ntm.py:14-39 constructor defaults."""

    num_features: int = 64          # target-indicator width == output_dim
    mem_size: int = 128
    mem_dim: int = 20
    shift_range: int = 1
    controller_dim: int = 100
    controller_layer_size: int = 10
    write_head_size: int = 1
    read_head_size: int = 1

    @property
    def shift_space(self) -> int:
        return 2 * self.shift_range + 1


def _uniform(rng, shape, scale):
    return jax.random.uniform(rng, shape, minval=-scale, maxval=scale,
                              dtype=jnp.float32)


def init_legacy_params(
    rng: jax.Array, cfg: LegacyNTMConfig, input_size: int,
    init_scale: float = 0.1,
) -> Dict[str, Any]:
    """Parameter pytree. The reference draws head weights from
    Normal(0, 0.5) and controller gates from glorot (ops.py:77-110,
    :56-76); a uniform init_scale is used here for stable training — the
    executed-TF parity tests inject exact values either way."""
    C, D, N, S = (cfg.controller_dim, cfg.mem_dim, cfg.mem_size,
                  cfg.shift_space)
    R, W, L = cfg.read_head_size, cfg.write_head_size, cfg.controller_layer_size
    k = iter(jax.random.split(rng, 4 * L + 7 * (R + W) + 2 * W + 8))

    controller: List[Dict[str, Dict[str, jax.Array]]] = []
    for layer in range(L):
        in_l = (input_size + cfg.num_features + C + R * D) if layer == 0 else 2 * C
        controller.append(
            {
                g: {"w": _uniform(next(k), (in_l, C), init_scale),
                    "b": jnp.zeros((C,), jnp.float32)}
                for g in GATES
            }
        )

    def head(is_write: bool) -> Dict[str, jax.Array]:
        p = {
            "k_w": _uniform(next(k), (C, D), init_scale),
            "k_b": jnp.zeros((D,)),
            "g_w": _uniform(next(k), (C, 1), init_scale),
            "g_b": jnp.zeros((1,)),
            "sw_w": _uniform(next(k), (C, S), init_scale),
            "sw_b": jnp.zeros((S,)),
            "beta_w": _uniform(next(k), (C, 1), init_scale),
            "beta_b": jnp.zeros((1,)),
            "gamma_w": _uniform(next(k), (C, 1), init_scale),
            "gamma_b": jnp.zeros((1,)),
        }
        if is_write:
            p["erase_w"] = _uniform(next(k), (C, D), init_scale)
            p["erase_b"] = jnp.zeros((D,))
            p["add_w"] = _uniform(next(k), (C, D), init_scale)
            p["add_b"] = jnp.zeros((D,))
        return p

    # reversed-range raw init weights: softmax peaks at slot 0 (ops.py:112-121)
    range_init = jnp.arange(N, 0, -1, dtype=jnp.float32)
    return {
        "controller": controller,
        "read_heads": [head(False) for _ in range(R)],
        "write_heads": [head(True) for _ in range(W)],
        "out_w": _uniform(next(k), (C, cfg.num_features), init_scale),
        "out_b": jnp.zeros((cfg.num_features,)),
        "init": {
            "M": _uniform(next(k), (N * D,), init_scale),
            "read_w": jnp.broadcast_to(range_init, (R, N)),
            "read": _uniform(next(k), (R, D), init_scale),
            "write_w": jnp.broadcast_to(range_init, (W, N)),
            "output": _uniform(next(k), (L, C), init_scale),
            "hidden": _uniform(next(k), (L, C), init_scale),
        },
    }


def init_legacy_state(params: Dict[str, Any], cfg: LegacyNTMConfig) -> Dict[str, jax.Array]:
    """Squash the learnable raw initial-state params (ntm.py:273-332);
    unbatched — vmap/broadcast for batches."""
    init = params["init"]
    return {
        "M": jnp.tanh(init["M"]).reshape(cfg.mem_size, cfg.mem_dim),
        "read_w": jax.nn.softmax(init["read_w"], axis=-1),
        "write_w": jax.nn.softmax(init["write_w"], axis=-1),
        "read": jnp.tanh(init["read"]),
        "output": jnp.tanh(init["output"]),
        "hidden": jnp.tanh(init["hidden"]),
    }


def _linear(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    return x @ w + b


def _head_weights(
    p: Dict[str, jax.Array], M_prev: jax.Array, w_prev: jax.Array,
    last_output: jax.Array,
) -> jax.Array:
    """One head's addressing chain (ntm.py:221-260)."""
    k = jnp.tanh(_linear(last_output, p["k_w"], p["k_b"]))
    g = jax.nn.sigmoid(_linear(last_output, p["g_w"], p["g_b"]))      # [1]
    s_w = jax.nn.softmax(_linear(last_output, p["sw_w"], p["sw_b"]))
    beta = jax.nn.softplus(_linear(last_output, p["beta_w"], p["beta_b"]))
    gamma = jax.nn.softplus(_linear(last_output, p["gamma_w"], p["gamma_b"])) + 1.0

    sim = smooth_cosine_similarity(M_prev, k)          # +1e-3 smoothing
    content = jax.nn.softmax(sim * beta)
    gated = content * g + w_prev * (1.0 - g)
    conv = circular_convolution_1d(gated, s_w)         # symmetric offsets
    powed = jnp.power(conv, gamma)
    return powed / jnp.sum(powed)                      # NO +1e-3 (ntm.py:260)


def legacy_ntm_step(
    params: Dict[str, Any],
    cfg: LegacyNTMConfig,
    x: jax.Array,
    target: jax.Array,
    state: Dict[str, jax.Array],
) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """One unbatched step: (output [F] softmaxed, logit [F], new state).

    x: [input_size] serialized features; target: [num_features] indicator
    (nonzero only on the first step, ntm.py:69-75).
    """
    M_prev = state["M"]

    # controller (ntm.py:171-213)
    outputs, hiddens = [], []
    for layer, gates in enumerate(params["controller"]):
        o_prev = state["output"][layer]
        h_prev = state["hidden"][layer]
        if layer == 0:
            gin = jnp.concatenate(
                [x, target, o_prev] + [state["read"][r] for r in range(cfg.read_head_size)]
            )
        else:
            gin = jnp.concatenate([outputs[-1], o_prev])
        i = jax.nn.sigmoid(_linear(gin, gates["input"]["w"], gates["input"]["b"]))
        f = jax.nn.sigmoid(_linear(gin, gates["forget"]["w"], gates["forget"]["b"]))
        o = jax.nn.sigmoid(_linear(gin, gates["output"]["w"], gates["output"]["b"]))
        update = jnp.tanh(_linear(gin, gates["update"]["w"], gates["update"]["b"]))
        hid = f * h_prev + i * update
        out = o * jnp.tanh(hid)
        hiddens.append(hid)
        outputs.append(out)
    last_output = outputs[-1]

    # memory (ntm.py:113-169): reads and writes both address M_prev
    read_w = jnp.stack(
        [
            _head_weights(p, M_prev, state["read_w"][r], last_output)
            for r, p in enumerate(params["read_heads"])
        ]
    )
    read = jnp.stack([M_prev.T @ read_w[r] for r in range(cfg.read_head_size)])

    erases, writes = jnp.ones_like(M_prev), jnp.zeros_like(M_prev)
    write_ws = []
    for wh, p in enumerate(params["write_heads"]):
        w_w = _head_weights(p, M_prev, state["write_w"][wh], last_output)
        erase = jax.nn.sigmoid(_linear(last_output, p["erase_w"], p["erase_b"]))
        add = jnp.tanh(_linear(last_output, p["add_w"], p["add_b"]))
        erases = erases * (1.0 - jnp.outer(w_w, erase))
        writes = writes + jnp.outer(w_w, add)
        write_ws.append(w_w)
    M = M_prev * erases + writes

    logit = _linear(last_output, params["out_w"], params["out_b"])
    output = jax.nn.softmax(logit)
    new_state = {
        "M": M,
        "read_w": read_w,
        "write_w": jnp.stack(write_ws),
        "read": read,
        "output": jnp.stack(outputs),
        "hidden": jnp.stack(hiddens),
    }
    return output, logit, new_state


def legacy_ntm_unroll(
    params: Dict[str, Any],
    cfg: LegacyNTMConfig,
    inputs: jax.Array,
    target: jax.Array,
    remat: bool = False,
) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Run the tracker over a sequence (ntm.py:41-111): the target
    indicator is presented on step 0 only; state starts from the learnable
    initial state.

    inputs: [T, input_size] (unbatched like the reference); use
    legacy_ntm_unroll_batched for [B, T, ...].
    Returns (outputs [T,F], logits [T,F], final state).
    """
    T = inputs.shape[0]
    targets = jnp.concatenate(
        [target[None], jnp.zeros((T - 1,) + target.shape, target.dtype)]
    )
    state = init_legacy_state(params, cfg)

    def body(carry, xt):
        x, tgt = xt
        out, logit, new_state = legacy_ntm_step(params, cfg, x, tgt, carry)
        return new_state, (out, logit)

    if remat:
        body = jax.checkpoint(body)
    final, (outs, logits) = jax.lax.scan(body, state, (inputs, targets))
    return outs, logits, final


def legacy_ntm_unroll_batched(params, cfg, inputs, targets, remat: bool = False):
    """vmap over the batch axis: inputs [B,T,IN], targets [B,F]."""
    return jax.vmap(
        lambda x, t: legacy_ntm_unroll(params, cfg, x, t, remat=remat),
        in_axes=(0, 0),
    )(inputs, targets)
