"""Token-stream serialization and loss heads for the offset tracker.

Exact re-expression of the reference's input construction
(direct_offset_output.py:439-500) and output decoding (:577-606):

  * per frame: 64 feature tokens then ONE frame-delimiter token
    (delimiter at the END of each frame in training; the streaming
    tracker puts it at the START — test_tracker.py:400-404 — both are
    provided here)
  * channel layout: [512 VGG features | delimiter bit | target bit]
  * the target channel carries frame 0's gt heatmap on its 64 feature
    tokens and is zero everywhere else (:492-500)
  * predictions are read at each frame's delimiter step, frames 1..L-1
    (:581-593); loss = tf.nn.l2_loss(tanh(logits) - offsets) = 0.5*sum(sq)
  * heatmap variants use softmax cross-entropy over the 64 locations
    summed over steps / (L-1)  (main.py:1919-1923)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def serialize_tokens(
    features: jax.Array, target_heatmap: jax.Array
) -> jax.Array:
    """Build the [B, L*(F+1), C+2] token stream.

    Args:
      features: [B, L, F, C] per-frame feature tokens (e.g. F=64, C=512).
      target_heatmap: [B, F] frame-0 target indicator (flattened gt).
    Returns:
      tokens [B, L*(F+1), C+2].
    """
    B, L, F, C = features.shape
    # +delimiter channel (zeros on feature tokens)
    feat = jnp.concatenate([features, jnp.zeros((B, L, F, 1), features.dtype)], axis=3)
    # frame delimiter token: zeros except delimiter bit
    delim = jnp.zeros((B, L, 1, C + 1), features.dtype).at[..., C].set(1.0)
    toks = jnp.concatenate([feat, delim], axis=2)  # [B, L, F+1, C+1]
    toks = toks.reshape(B, L * (F + 1), C + 1)
    # target channel: frame-0 feature tokens carry the heatmap
    target = jnp.concatenate(
        [
            target_heatmap.astype(features.dtype),
            jnp.zeros((B, (L - 1) * (F + 1) + 1), features.dtype),
        ],
        axis=1,
    )
    return jnp.concatenate([toks, target[..., None]], axis=2)


def serialize_streaming_batch(
    features: jax.Array,
    target_heatmap: jax.Array | None,
    delimiter_first: bool = True,
) -> jax.Array:
    """One frame's F+1 tokens per batch element for ONLINE tracking.

    delimiter_first=True is the reference's streaming order
    (test_tracker.py:384-405); False matches the training serialization
    (delimiter last — the default the tracker uses, see
    tracking/tracker.py). Channel layout [C | delimiter | target] in both.

    Args:
      features: [B, F, C]; target_heatmap: [B, F] or None.
    Returns: [B, F+1, C+2]
    """
    B, F, C = features.shape
    if target_heatmap is None:
        tgt = jnp.zeros((B, F, 1), features.dtype)
    else:
        tgt = target_heatmap.reshape(B, F, 1).astype(features.dtype)
    feat = jnp.concatenate(
        [features, jnp.zeros((B, F, 1), features.dtype), tgt], axis=2
    )
    delim = jnp.zeros((B, 1, C + 2), features.dtype).at[:, 0, C].set(1.0)
    if delimiter_first:
        return jnp.concatenate([delim, feat], axis=1)
    return jnp.concatenate([feat, delim], axis=1)


def serialize_streaming_frame(
    features: jax.Array, target_heatmap: jax.Array | None
) -> jax.Array:
    """Unbatched reference streaming order (delimiter first);
    features [F, C] -> [F+1, C+2]."""
    tgt = None if target_heatmap is None else target_heatmap[None]
    return serialize_streaming_batch(features[None], tgt, delimiter_first=True)[0]


def gather_delimiter_outputs(logits: jax.Array, num_features: int) -> jax.Array:
    """Predictions at each frame's delimiter step, frames 1..L-1
    (direct_offset_output.py:581-593).

    Args:
      logits: [B, L*(F+1), out]
    Returns: [B, L-1, out]
    """
    B, T, out = logits.shape
    F1 = num_features + 1
    L = T // F1
    rest = logits[:, F1:, :].reshape(B, L - 1, F1, out)
    return rest[:, :, num_features, :]


def offsets_loss(logits: jax.Array, offsets: jax.Array, num_features: int) -> jax.Array:
    """0.5 * sum((tanh(delimiter_logits) - offsets[:,1:])^2)
    (direct_offset_output.py:593-606)."""
    pred = jnp.tanh(gather_delimiter_outputs(logits, num_features))
    diff = pred - offsets[:, 1:, :]
    return 0.5 * jnp.sum(jnp.square(diff))


def heatmap_loss(logits: jax.Array, gts: jax.Array, num_features: int) -> jax.Array:
    """Softmax cross-entropy against gt heatmaps at delimiter steps,
    normalized by (L-1) (main.py:1919-1923 structure).

    Args:
      logits: [B, L*(F+1), F]; gts: [B, L, F] (targets for frames 1..L-1).
    """
    out = gather_delimiter_outputs(logits, num_features)  # [B, L-1, F]
    labels = gts[:, 1:, :]
    log_p = jax.nn.log_softmax(out, axis=-1)
    ce = -jnp.sum(labels * log_p, axis=-1)
    L_minus_1 = out.shape[1]
    return jnp.sum(ce) / L_minus_1
