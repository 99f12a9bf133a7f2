"""DNC MemoryAccess: usage/linkage-based read-write memory.

Pure-function re-expression of the reference `dnc/access.py`:
  * `_read_inputs` (10 per-head linears, :160-218) becomes ONE fused matmul
    whose output is split — same math (each slice has its own rows of the
    weight matrix), one MXU pass instead of ten small ones.
  * `_erase_and_write` (:32-63), `_write_weights` (:220-257),
    `_read_weights` (:259-303) keep the exact formulas.
State is the AccessState namedtuple (:28) as a pytree.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ntm_tracker_tpu.config import DNCConfig
from ntm_tracker_tpu.models.dnc.addressing import (
    TemporalLinkageState,
    cosine_weights,
    directional_read_weights,
    temporal_linkage_update,
    usage_update,
    write_allocation_weights,
)


class AccessState(NamedTuple):
    memory: jax.Array         # [B, N, W]
    read_weights: jax.Array   # [B, R, N]
    write_weights: jax.Array  # [B, Wh, N]
    linkage: TemporalLinkageState
    usage: jax.Array          # [B, N]


def _interface_sizes(cfg: DNCConfig) -> Dict[str, int]:
    """Row layout of the fused interface linear (dnc/access.py:160-218)."""
    R, Wh, W = cfg.num_reads, cfg.num_writes, cfg.word_size
    return {
        "write_vectors": Wh * W,
        "erase_vectors": Wh * W,
        "free_gate": R,
        "allocation_gate": Wh,
        "write_gate": Wh,
        "read_mode": R * (1 + 2 * Wh),
        "write_keys": Wh * W,
        "write_strengths": Wh,
        "read_keys": R * W,
        "read_strengths": R,
    }


def init_access_params(rng: jax.Array, cfg: DNCConfig, input_size: int) -> Dict[str, Any]:
    """Fused interface projection. The reference uses snt.Linear defaults
    (truncated-normal scaled by 1/sqrt(fan_in)); we use the same scale."""
    sizes = _interface_sizes(cfg)
    total = sum(sizes.values())
    std = 1.0 / jnp.sqrt(jnp.asarray(input_size, jnp.float32))
    w = jax.random.truncated_normal(rng, -2.0, 2.0, (input_size, total)) * std
    return {"interface_w": w.astype(jnp.float32), "interface_b": jnp.zeros((total,), jnp.float32)}


def init_access_state(cfg: DNCConfig, batch: int) -> AccessState:
    """Zero state (snt.RNNCore.initial_state default: zeros)."""
    N, W, R, Wh = cfg.memory_size, cfg.word_size, cfg.num_reads, cfg.num_writes
    z = jnp.zeros
    return AccessState(
        memory=z((batch, N, W)),
        read_weights=z((batch, R, N)),
        write_weights=z((batch, Wh, N)),
        linkage=TemporalLinkageState(
            link=z((batch, Wh, N, N)), precedence_weights=z((batch, Wh, N))
        ),
        usage=z((batch, N)),
    )


def _read_inputs(params: Dict[str, Any], cfg: DNCConfig, inputs: jax.Array) -> Dict[str, jax.Array]:
    """Fused equivalent of dnc/access.py:160-218."""
    R, Wh, W = cfg.num_reads, cfg.num_writes, cfg.word_size
    B = inputs.shape[0]
    fused = inputs @ params["interface_w"] + params["interface_b"]
    sizes = _interface_sizes(cfg)
    out: Dict[str, jax.Array] = {}
    off = 0
    for name, size in sizes.items():
        out[name] = fused[:, off : off + size]
        off += size
    return {
        "write_vectors": out["write_vectors"].reshape(B, Wh, W),
        "erase_vectors": jax.nn.sigmoid(out["erase_vectors"]).reshape(B, Wh, W),
        "free_gate": jax.nn.sigmoid(out["free_gate"]),
        "allocation_gate": jax.nn.sigmoid(out["allocation_gate"]),
        "write_gate": jax.nn.sigmoid(out["write_gate"]),
        "read_mode": jax.nn.softmax(out["read_mode"].reshape(B, R, 1 + 2 * Wh), axis=-1),
        "write_content_keys": out["write_keys"].reshape(B, Wh, W),
        "write_content_strengths": out["write_strengths"],
        "read_content_keys": out["read_keys"].reshape(B, R, W),
        "read_content_strengths": out["read_strengths"],
    }


def erase_and_write(
    memory: jax.Array, address: jax.Array, reset_weights: jax.Array, values: jax.Array
) -> jax.Array:
    """M * prod(1 - w^T e) + w^T a  (dnc/access.py:32-63)."""
    weighted_resets = address[..., :, :, None] * reset_weights[..., :, None, :]
    reset_gate = jnp.prod(1 - weighted_resets, axis=1)
    memory = memory * reset_gate
    add = jnp.einsum("bhn,bhw->bnw", address, values,
                     preferred_element_type=jnp.float32)
    return memory + add


def _write_weights(
    cfg: DNCConfig, inputs: Dict[str, jax.Array], memory: jax.Array, usage: jax.Array
) -> jax.Array:
    """dnc/access.py:220-257."""
    write_content = cosine_weights(
        memory, inputs["write_content_keys"], inputs["write_content_strengths"]
    )
    write_alloc = write_allocation_weights(
        usage=usage,
        write_gates=inputs["allocation_gate"] * inputs["write_gate"],
        num_writes=cfg.num_writes,
    )
    ag = inputs["allocation_gate"][..., None]
    wg = inputs["write_gate"][..., None]
    return wg * (ag * write_alloc + (1 - ag) * write_content)


def _read_weights(
    cfg: DNCConfig,
    inputs: Dict[str, jax.Array],
    memory: jax.Array,
    prev_read_weights: jax.Array,
    link: jax.Array,
) -> jax.Array:
    """dnc/access.py:259-303."""
    Wh = cfg.num_writes
    content = cosine_weights(
        memory, inputs["read_content_keys"], inputs["read_content_strengths"]
    )
    forward = directional_read_weights(link, prev_read_weights, forward=True)
    backward = directional_read_weights(link, prev_read_weights, forward=False)
    backward_mode = inputs["read_mode"][:, :, :Wh]
    forward_mode = inputs["read_mode"][:, :, Wh : 2 * Wh]
    content_mode = inputs["read_mode"][:, :, 2 * Wh]
    return (
        content_mode[..., None] * content
        + jnp.sum(forward_mode[..., None] * forward, axis=2)
        + jnp.sum(backward_mode[..., None] * backward, axis=2)
    )


def memory_access_step(
    params: Dict[str, Any],
    cfg: DNCConfig,
    inputs: jax.Array,
    prev_state: AccessState,
) -> Tuple[jax.Array, AccessState]:
    """One MemoryAccess step (dnc/access.py:113-158).

    Args:
      inputs: [B, input_size] controller output.
    Returns:
      (read_words [B, R, W], next AccessState)
    """
    ctl = _read_inputs(params, cfg, inputs)

    usage = usage_update(
        write_weights=prev_state.write_weights,
        free_gate=ctl["free_gate"],
        read_weights=prev_state.read_weights,
        prev_usage=prev_state.usage,
    )
    write_weights = _write_weights(cfg, ctl, prev_state.memory, usage)
    memory = erase_and_write(
        prev_state.memory,
        address=write_weights,
        reset_weights=ctl["erase_vectors"],
        values=ctl["write_vectors"],
    )
    linkage = temporal_linkage_update(write_weights, prev_state.linkage)
    read_weights = _read_weights(
        cfg, ctl, memory, prev_state.read_weights, linkage.link
    )
    read_words = jnp.einsum(
        "brn,bnw->brw", read_weights, memory, preferred_element_type=jnp.float32
    )
    return read_words, AccessState(
        memory=memory,
        read_weights=read_weights,
        write_weights=write_weights,
        linkage=linkage,
        usage=usage,
    )
