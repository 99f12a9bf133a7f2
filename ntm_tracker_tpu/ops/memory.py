"""Core external-memory math, vectorized for TPU.

Behavioral contract follows the reference `ops.py`:
  * batched_smooth_cosine_similarity  <- ops.py:135-158 (l2_normalize both
    operands with TF's 1e-12 floor, then batched matmul)
  * smooth_cosine_similarity          <- ops.py:161-178 (legacy single-vector
    form with the `+ 1e-3` denominator — note this differs from the batched
    normalization; both are kept because the reference uses both)
  * batched_circular_convolution      <- ops.py:180-214, including the
    Python-2 floor-division quirk: with shift_space S the shift offsets are
    range(floor(-S/2), S + floor(-S/2)), i.e. {-2,-1,0} for S=3 — NOT the
    symmetric {-1,0,1}. The learned shift kernel absorbs the asymmetry, but
    we replicate it exactly for numerical parity.
  * circular_shift                    <- ops.py:216-242 (result[i] = x[(i+s) % N])
  * sharpen                           <- ntm_cell.py:169-176 (pow(gamma) with
    `+ 1e-3` in the normalizer)
  * weighted_softmax                  <- dnc/addressing.py:39-55

Everything here is a pure function on arrays: no variable creation (the
reference's `linear`/`Linear` variable factories become explicit param
pytrees owned by the cells).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TF tf.nn.l2_normalize epsilon (floor on the squared norm).
_L2_NORMALIZE_EPS = 1e-12


def _l2_normalize(x: jax.Array, axis: int) -> jax.Array:
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, _L2_NORMALIZE_EPS))


def batched_smooth_cosine_similarity(memory: jax.Array, keys: jax.Array) -> jax.Array:
    """Key/memory similarity with the reference's EXECUTED normalization.

    Args:
      memory: [batch, mem_size, mem_dim]
      keys:   [batch, num_heads, mem_dim]
    Returns:
      [batch, num_heads, mem_size]

    IMPORTANT reference quirk (ops.py:147-156): the reference transposes
    memory to [B, mem_dim, mem_size] FIRST and then l2_normalizes axis 2 —
    i.e. each mem_dim ROW is normalized across the 128 slots, NOT each slot
    vector. Keys are normalized along mem_dim as expected. This is almost
    certainly an upstream bug (the reference's own golden test expects
    proper slot-vector cosine and would fail against its implementation),
    but it is what every reference checkpoint was trained with, so we
    reproduce it exactly. `batched_slotwise_cosine_similarity` below is the
    intended math.
    """
    mem_n = _l2_normalize(memory, axis=1)  # normalize ACROSS slots (quirk)
    key_n = _l2_normalize(keys, axis=2)
    return jnp.einsum(
        "bhd,bnd->bhn", key_n, mem_n, preferred_element_type=jnp.float32
    )


def batched_slotwise_cosine_similarity(memory: jax.Array, keys: jax.Array) -> jax.Array:
    """True cosine similarity (each memory SLOT vector normalized) — the
    math ops.py:135-158 documents and its golden test (ops_test.py:6-37)
    expects, though the reference's code does not compute it. Offered as the
    sane alternative for new models."""
    mem_n = _l2_normalize(memory, axis=2)
    key_n = _l2_normalize(keys, axis=2)
    return jnp.einsum(
        "bhd,bnd->bhn", key_n, mem_n, preferred_element_type=jnp.float32
    )


def batched_smooth_cosine_similarity_dn(memory_dn: jax.Array, keys: jax.Array) -> jax.Array:
    """The EXECUTED-reference normalization (across-slot quirk) on memory
    carried TRANSPOSED as [batch, mem_dim, mem_size].

    Same math as batched_smooth_cosine_similarity up to float
    reassociation: the quirk normalizes each mem_dim row across the slots,
    which in this layout is the LANE axis — the whole point of the layout
    (see models/ntm_cell.ntm_cell_step_dn)."""
    mem_n = _l2_normalize(memory_dn, axis=2)  # across slots (the quirk)
    key_n = _l2_normalize(keys, axis=2)
    return jnp.einsum(
        "bhd,bdn->bhn", key_n, mem_n, preferred_element_type=jnp.float32
    )


def batched_slotwise_cosine_similarity_dn(memory_dn: jax.Array, keys: jax.Array) -> jax.Array:
    """True slot-vector cosine on [batch, mem_dim, mem_size] memory."""
    mem_n = _l2_normalize(memory_dn, axis=1)  # across mem_dim = per slot
    key_n = _l2_normalize(keys, axis=2)
    return jnp.einsum(
        "bhd,bdn->bhn", key_n, mem_n, preferred_element_type=jnp.float32
    )


def smooth_cosine_similarity(m: jax.Array, v: jax.Array) -> jax.Array:
    """Legacy unbatched form (ops.py:161-178): dot / (|m||v| + 1e-3).

    Args:
      m: [mem_size, mem_dim]; v: [mem_dim]
    Returns: [mem_size]
    """
    m_norm = jnp.sqrt(jnp.sum(jnp.square(m), axis=1))
    v_norm = jnp.sqrt(jnp.sum(jnp.square(v)))
    return (m @ v) / (m_norm * v_norm + 1e-3)


def circular_shift(x: jax.Array, shift: int) -> jax.Array:
    """result[..., i] = x[..., (i + shift) % N]  (ops.py:216-242)."""
    return jnp.roll(x, -shift, axis=-1)


def circular_convolution_shifts(shift_space: int) -> list[int]:
    """The shift offsets used by the reference's stack-of-shifts conv.

    ops.py:204-209 computes `start = -shift_space/2` under Python-2 floor
    division, so for S=3 the offsets are [-2,-1,0] and for S=5 [-3,-2,-1,0,1].
    """
    start = -((shift_space + 1) // 2)
    return list(range(start, shift_space + start))


def batched_circular_convolution(tensor: jax.Array, kernel: jax.Array) -> jax.Array:
    """Circular convolution of attention weights with a learned shift kernel.

    Args:
      tensor: [batch, num_heads, mem_size]
      kernel: [batch, num_heads, shift_space] (softmaxed shift weights)
    Returns:
      [batch, num_heads, mem_size]

    out[b,h,i] = sum_j kernel[b,h,j] * tensor[b,h,(i + s_j) % N] with the
    reference's asymmetric offsets s_j (see circular_convolution_shifts).
    Implemented as a sum of static rolls — for S=3 this is three VPU
    roll+FMA passes, cheaper than materializing the [B,H,N,S] stack of
    ops.py:208-213 and friendlier to XLA fusion.
    """
    shift_space = kernel.shape[-1]
    shifts = circular_convolution_shifts(shift_space)
    out = jnp.zeros_like(tensor)
    for j, s in enumerate(shifts):
        out = out + kernel[..., j : j + 1] * jnp.roll(tensor, -s, axis=-1)
    return out


def sharpen(w: jax.Array, gamma: jax.Array, eps: float = 1e-3) -> jax.Array:
    """Sharpening: w^gamma / (sum w^gamma + 1e-3)  (ntm_cell.py:169-176).

    Args:
      w:     [batch, num_heads, mem_size] (nonnegative)
      gamma: [batch, num_heads, 1], already softplus(.)+1
    """
    powed = jnp.power(w, gamma)
    return powed / (jnp.sum(powed, axis=2, keepdims=True) + eps)


def weighted_softmax(activations: jax.Array, strengths: jax.Array, strength_op) -> jax.Array:
    """softmax(activations * strength_op(strengths)[..., None], axis=-1).

    dnc/addressing.py:39-55.
    Args:
      activations: [batch, num_heads, mem_size]
      strengths:   [batch, num_heads]
    """
    sharp = activations * strength_op(strengths)[..., None]
    return jax.nn.softmax(sharp, axis=-1)


def outer_product(u: jax.Array, v: jax.Array) -> jax.Array:
    """Batched outer product: [B,n] x [B,m] -> [B,n,m]  (ops.py:277-304 modernized)."""
    return u[..., :, None] * v[..., None, :]
