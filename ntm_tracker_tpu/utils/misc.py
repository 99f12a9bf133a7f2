"""Small utilities from the reference's utils.py / utility.py / ops.py
legacy paths, kept for API completeness.

  pairwise_add              <- utility.py:4-44
  decaying_softmax          <- utility.py:47-59
  progress                  <- utils.py:14-31
  circular_convolution_1d   <- ops.py:244-275 (legacy unbatched gather form)

(unstack_into_tensorarray / stack_into_tensor have no JAX analogue — scan
stacks natively; utils.py's softmax/matmul/argmax shims are jnp builtins.)
"""

from __future__ import annotations

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_add(u: jax.Array, v: jax.Array | None = None, is_batch: bool = False) -> jax.Array:
    """All pairwise sums of two vectors: out[i,j] = u[i] + v[j]."""
    if v is None:
        v = u
    if is_batch:
        return u[..., :, None] + v[..., None, :]
    return u[:, None] + v[None, :]


def decaying_softmax(shape, axis: int) -> np.ndarray:
    """Constant softmax-of-reversed-range weights broadcast to `shape`."""
    rank = len(shape)
    max_val = shape[axis]
    weights = np.arange(1, max_val + 1, dtype=np.float32)[::-1]
    weights = np.exp(weights) / np.sum(np.exp(weights))
    bshape = [1] * rank
    bshape[axis] = max_val
    return np.zeros(shape, np.float32) + np.reshape(weights, bshape)


def circular_convolution_1d(v: jax.Array, k: jax.Array) -> jax.Array:
    """Legacy unbatched circular convolution (ops.py:244-275): gathers with
    indices [i+shift .. i-shift] per output element. NOTE this legacy form
    uses SYMMETRIC offsets (unlike the batched stack-of-shifts version's
    Py2 floor-division quirk)."""
    size = v.shape[0]
    ksize = k.shape[0]
    kshift = int(math.floor(ksize / 2.0))
    rows = []
    for i in range(size):
        idx = [(i + j) % size for j in range(kshift, -kshift - 1, -1)]
        rows.append(jnp.sum(v[jnp.array(idx)] * k))
    return jnp.stack(rows)


def progress(current: float, total: float, width: int = 40, out=sys.stdout) -> None:
    """Text progress bar (utils.py:14-31)."""
    frac = 0.0 if total == 0 else current / total
    done = int(round(width * frac))
    out.write(
        "\r[{}{}] {:.1f}%".format("#" * done, "-" * (width - done), frac * 100)
    )
    out.flush()
