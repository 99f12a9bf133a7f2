"""DNC addressing primitives: cosine content weights, temporal linkage,
freeness/allocation.

Pure-function re-expression of the reference `dnc/addressing.py` with the
same math contracts (epsilon 1e-6 at :28, stop_gradient on usage :302,
sorted-allocation :376-405). TPU notes:

  * The allocation "sort + exclusive cumprod + unsort" uses
    `jax.lax.top_k` + `jnp.cumprod` + `jnp.argsort(indices)` — argsort of
    the top_k index vector IS the inverse permutation, replacing the
    reference's per-row unstack/invert_permutation/gather loop
    (dnc/util.py:25-38), which would not vectorize on TPU.
  * The link update is O(N^2) elementwise on the VPU; everything else is
    batched matmul on the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# dnc/addressing.py:28
EPSILON = 1e-6


class TemporalLinkageState(NamedTuple):
    """link: [B, num_writes, N, N]; precedence_weights: [B, num_writes, N]."""

    link: jax.Array
    precedence_weights: jax.Array


def _vector_norms(m: jax.Array) -> jax.Array:
    """sqrt(sum(m^2) + eps), keepdims (dnc/addressing.py:34-36)."""
    return jnp.sqrt(jnp.sum(m * m, axis=2, keepdims=True) + EPSILON)


def cosine_weights(
    memory: jax.Array,
    keys: jax.Array,
    strengths: jax.Array,
    strength_op=jax.nn.softplus,
) -> jax.Array:
    """Cosine-similarity content addressing with weighted softmax.

    dnc/addressing.py:58-105.
    Args:
      memory:    [B, N, W]
      keys:      [B, H, W]
      strengths: [B, H]
    Returns: [B, H, N]
    """
    dot = jnp.einsum("bhw,bnw->bhn", keys, memory, preferred_element_type=jnp.float32)
    norm = jnp.einsum(
        "bhx,bnx->bhn", _vector_norms(keys), _vector_norms(memory),
        preferred_element_type=jnp.float32,
    )
    similarity = dot / (norm + EPSILON)
    from ntm_tracker_tpu.ops.memory import weighted_softmax

    return weighted_softmax(similarity, strengths, strength_op)


def temporal_linkage_update(
    write_weights: jax.Array, prev_state: TemporalLinkageState
) -> TemporalLinkageState:
    """Update link graphs and precedence weights (dnc/addressing.py:133-240).

    Args:
      write_weights: [B, num_writes, N]
    """
    w_i = write_weights[..., :, None]  # [B,Wh,N,1]
    w_j = write_weights[..., None, :]  # [B,Wh,1,N]
    prev_p_j = prev_state.precedence_weights[..., None, :]  # [B,Wh,1,N]
    prev_link_scale = 1 - w_i - w_j
    new_link = w_i * prev_p_j
    link = prev_link_scale * prev_state.link + new_link
    # zero the diagonal (dnc/addressing.py:212-218)
    n = link.shape[-1]
    eye = jnp.eye(n, dtype=link.dtype)
    link = link * (1.0 - eye)

    write_sum = jnp.sum(write_weights, axis=2, keepdims=True)
    precedence = (1 - write_sum) * prev_state.precedence_weights + write_weights
    return TemporalLinkageState(link=link, precedence_weights=precedence)


def directional_read_weights(
    link: jax.Array, prev_read_weights: jax.Array, forward: bool
) -> jax.Array:
    """Forward/backward read weights along the link graphs
    (dnc/addressing.py:155-181).

    Args:
      link: [B, num_writes, N, N]; prev_read_weights: [B, num_reads, N]
    Returns: [B, num_reads, num_writes, N]
    """
    if forward:
        # w_r @ L^T per (read, write) pair
        result = jnp.einsum(
            "brn,bwmn->brwm", prev_read_weights, link,
            preferred_element_type=jnp.float32,
        )
    else:
        result = jnp.einsum(
            "brn,bwnm->brwm", prev_read_weights, link,
            preferred_element_type=jnp.float32,
        )
    return result


def usage_update(
    write_weights: jax.Array,
    free_gate: jax.Array,
    read_weights: jax.Array,
    prev_usage: jax.Array,
) -> jax.Array:
    """u_t from prev write/read weights and the free gate
    (dnc/addressing.py:279-305, 342-374). Usage is non-differentiable w.r.t.
    write weights (stop_gradient at :302).

    Args:
      write_weights: [B, num_writes, N] (previous step's)
      free_gate:     [B, num_reads]
      read_weights:  [B, num_reads, N] (previous step's)
      prev_usage:    [B, N]
    """
    write_weights = jax.lax.stop_gradient(write_weights)
    agg = 1 - jnp.prod(1 - write_weights, axis=1)
    usage = prev_usage + (1 - prev_usage) * agg
    free_read = free_gate[..., None] * read_weights
    phi = jnp.prod(1 - free_read, axis=1)
    return usage * phi


def _allocation(usage: jax.Array) -> jax.Array:
    """Allocation weighting by usage sort (dnc/addressing.py:376-405).

    Args:
      usage: [B, N]
    Returns: [B, N]
    """
    usage = EPSILON + (1 - EPSILON) * usage
    nonusage = 1 - usage
    sorted_nonusage, indices = jax.lax.top_k(nonusage, k=usage.shape[-1])
    sorted_usage = 1 - sorted_nonusage
    # exclusive cumprod: shift right with 1 at position 0
    prod_sorted_usage = jnp.concatenate(
        [jnp.ones_like(sorted_usage[:, :1]), jnp.cumprod(sorted_usage[:, :-1], axis=1)],
        axis=1,
    )
    sorted_allocation = sorted_nonusage * prod_sorted_usage
    # unsort: argsort of the permutation is its inverse
    inverse = jnp.argsort(indices, axis=1)
    return jnp.take_along_axis(sorted_allocation, inverse, axis=1)


def write_allocation_weights(
    usage: jax.Array, write_gates: jax.Array, num_writes: int
) -> jax.Array:
    """Allocation weights for each write head, with simulated usage updates
    between heads (dnc/addressing.py:307-340).

    Args:
      usage: [B, N]; write_gates: [B, num_writes]
    Returns: [B, num_writes, N]
    """
    write_gates = write_gates[..., None]
    allocation_weights = []
    for i in range(num_writes):
        aw = _allocation(usage)
        allocation_weights.append(aw)
        usage = usage + (1 - usage) * write_gates[:, i, :] * aw
    return jnp.stack(allocation_weights, axis=1)
