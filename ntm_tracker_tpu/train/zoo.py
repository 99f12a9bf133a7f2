"""The multi-experiment lab: every main.py experiment re-expressed.

Covers (SURVEY.md §2 row 21):
  * ntm()/ntm_two_step() whole-frame presentation  <- main.py:780-977
  * ntm_sequential() per-feature two-step stream   <- main.py:979-1291
  * ntm_sevenbyseven()/ntm_8by8() heatmap CE       <- main.py:1646-2297
  * lstm_only() baseline                           <- main.py:695-778
  * learned 1x1-conv input compressor              <- main.py:1005-1012
  * sanity_check_compressor (+ PCA variant)        <- main.py:1425-1538
  * find_validation_batch determinism helper       <- main.py:2299-2320
(copy_paste lives in train/experiments.py.)
"""

from __future__ import annotations

import pickle
import random as _random
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.config import NTMConfig
from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll, two_step_inputs
from ntm_tracker_tpu.ops.lstm import init_lstm_params, multi_lstm_step, zero_lstm_state
from ntm_tracker_tpu.ops.memory import batched_smooth_cosine_similarity


# ---------------------------------------------------------------------------
# input compressor (1x1 conv over channels, xavier init) — main.py:1005-1012
# ---------------------------------------------------------------------------

def init_compressor(rng: jax.Array, in_channels: int, compress_dim: int) -> jax.Array:
    """Xavier/Glorot-uniform [C_in, C_out] (tf.contrib.layers.xavier_initializer)."""
    limit = float(np.sqrt(6.0 / (in_channels + compress_dim)))
    return jax.random.uniform(
        rng, (in_channels, compress_dim), minval=-limit, maxval=limit
    )


def compress_features(features: jax.Array, w: jax.Array) -> jax.Array:
    """1x1 conv == matmul on the channel axis. features [..., C] -> [..., D]."""
    return jnp.einsum(
        "...c,cd->...d", features, w, preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# sequential serialization — main.py:1040-1105
# token order: frame 0's F feature tokens; then per frame t>=1:
#   [frame-delimiter] + [feature, feature-delimiter] * F
# channels: [C | feature-delim | frame-delim | target]
# ---------------------------------------------------------------------------

def serialize_sequential_tokens(features: jax.Array, target: jax.Array) -> jax.Array:
    """features [B,L,F,C], target [B,F] -> [B, F+(L-1)(2F+1), C+3]."""
    B, L, F, C = features.shape
    pad2 = jnp.zeros((B, L, F, 2), features.dtype)
    padded = jnp.concatenate([features, pad2], axis=3)  # [B,L,F,C+2]
    frame0 = padded[:, 0]  # [B,F,C+2]

    rest = padded[:, 1:]  # [B,L-1,F,C+2]
    feature_delim = jnp.zeros((B, L - 1, F, C + 2), features.dtype).at[..., C].set(1.0)
    # interleave feature tokens with feature delimiters
    inter = jnp.concatenate([rest, feature_delim], axis=3).reshape(
        B, L - 1, 2 * F, C + 2
    )
    frame_delim = jnp.zeros((B, L - 1, 1, C + 2), features.dtype).at[..., C + 1].set(1.0)
    per_frame = jnp.concatenate([frame_delim, inter], axis=2)  # [B,L-1,2F+1,C+2]
    stream = jnp.concatenate(
        [frame0, per_frame.reshape(B, (L - 1) * (2 * F + 1), C + 2)], axis=1
    )
    total = F + (L - 1) * (2 * F + 1)
    tgt = jnp.concatenate(
        [target.astype(features.dtype), jnp.zeros((B, total - F), features.dtype)],
        axis=1,
    )
    return jnp.concatenate([stream, tgt[..., None]], axis=2)


def sequential_gather(logits: jax.Array, num_features: int) -> jax.Array:
    """Per-feature predictions at the feature-delimiter steps
    (main.py:1219-1232). logits [B,T,1] -> [B, L-1, F]."""
    B, T, _ = logits.shape
    F = num_features
    x = logits[:, F:, 0]  # drop frame 0
    L1 = x.shape[1] // (2 * F + 1)
    x = x.reshape(B, L1, 2 * F + 1)[:, :, 1:]  # drop frame-delimiter step
    x = x.reshape(B, L1, F, 2)[:, :, :, 1]  # keep the feature-delimiter slot
    return x


def sequential_ce_loss(logits: jax.Array, gts: jax.Array, num_features: int) -> jax.Array:
    """sum softmax-CE over frames 1..L-1, / (L-1)  (main.py:1242-1247)."""
    out = sequential_gather(logits, num_features)  # [B,L-1,F]
    labels = gts[:, 1:, :]
    log_p = jax.nn.log_softmax(out, axis=-1)
    return -jnp.sum(labels * log_p) / out.shape[1]


def sequential_total_steps(num_features: int, sequence_length: int) -> int:
    return num_features + (sequence_length - 1) * (2 * num_features + 1)


# ---------------------------------------------------------------------------
# whole-frame presentation (ntm / ntm_two_step) — main.py:780-977
# ---------------------------------------------------------------------------

def whole_frame_tokens(features: jax.Array, target: jax.Array, two_step: bool) -> jax.Array:
    """features [B,L,F,C] flattened per frame; target [B,F] indicator on
    frame 0 only (ntm_tracker_new.py:123-190)."""
    B, L, F, C = features.shape
    flat = features.reshape(B, L, F * C)
    if two_step:
        return two_step_inputs(flat, target)
    dummy = jnp.zeros_like(target)
    toks = [
        jnp.concatenate([flat[:, t], target if t == 0 else dummy], axis=1)
        for t in range(L)
    ]
    return jnp.stack(toks, axis=1)


def whole_frame_ce_loss(
    logits: jax.Array, gts: jax.Array, two_step: bool
) -> jax.Array:
    """CE(logits, softmax(labels)) with the reference's exact label layout.

    two_step=False (ntm(), main.py:844-850): labels = softmax(gt) per frame,
    denominator L*B; logits [B,L,F].

    two_step=True (ntm_two_step(), main.py:916-956): output dim is F+1 (the
    extra "background" bit); the 2L-1 steps get labels
      frame-0 step      -> [0...0, 1]   (background)
      present step t>=1 -> [0...0, 1]   (background)
      ask step t>=1     -> [gt_t,  0]
    softmaxed, with denominator (2L-1)*B; logits [B, 2L-1, F+1].
    """
    B = logits.shape[0]
    L = gts.shape[1]
    F = gts.shape[2]
    if two_step:
        background = jnp.concatenate(
            [jnp.zeros((B, L - 1, F)), jnp.ones((B, L - 1, 1))], axis=2
        )
        gt_aug = jnp.concatenate(
            [gts[:, 1:, :], jnp.zeros((B, L - 1, 1))], axis=2
        )
        pairs = jnp.stack([background, gt_aug], axis=2).reshape(
            B, 2 * (L - 1), F + 1
        )
        first = jnp.concatenate(
            [jnp.zeros((B, 1, F)), jnp.ones((B, 1, 1))], axis=2
        )
        labels = jnp.concatenate([first, pairs], axis=1)  # [B, 2L-1, F+1]
        denom = (2 * L - 1) * B
    else:
        labels = gts
        denom = L * B
    labels = jax.nn.softmax(labels, axis=-1)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(labels * log_p) / denom


# ---------------------------------------------------------------------------
# lstm_only baseline — main.py:695-778
# ---------------------------------------------------------------------------

def init_lstm_baseline(
    rng: jax.Array,
    num_features: int,
    compress_dim: int,
    hidden_size: int,
    num_layers: int,
    init_scale: float = 0.1,
) -> Dict[str, Any]:
    ks = jax.random.split(rng, 3)
    in_dim = num_features * compress_dim + num_features  # features + indicator
    return {
        "lstm": init_lstm_params(ks[0], in_dim, hidden_size, num_layers, init_scale),
        "softmax_w": jax.random.uniform(
            ks[1], (hidden_size, num_features), minval=-init_scale, maxval=init_scale
        ),
        "softmax_b": jnp.zeros((num_features,)),
    }


def lstm_baseline_forward(
    params: Dict[str, Any], features: jax.Array, target: jax.Array
) -> jax.Array:
    """features [B,L,F,D] (compressed), target [B,F] -> logits [B,L,F]."""
    B, L, F, D = features.shape
    flat = features.reshape(B, L, F * D)
    state = zero_lstm_state(B, params["softmax_w"].shape[0], len(params["lstm"]))
    dummy = jnp.zeros_like(target)

    def body(carry, xs):
        x_t, is_first = xs
        tgt = jnp.where(is_first, target, dummy)
        out, new_state = multi_lstm_step(
            params["lstm"], jnp.concatenate([x_t, tgt], axis=1), carry
        )
        return new_state, out

    is_first = jnp.arange(L) == 0
    _, outs = jax.lax.scan(body, state, (jnp.swapaxes(flat, 0, 1), is_first))
    outs = jnp.swapaxes(outs, 0, 1)  # [B,L,H]
    return outs @ params["softmax_w"] + params["softmax_b"]


def lstm_baseline_loss(params, features, target, gts) -> jax.Array:
    """CE(logits, softmax(gt)) / L  (main.py:763-765)."""
    logits = lstm_baseline_forward(params, features, target)
    labels = jax.nn.softmax(gts, axis=-1)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(labels * log_p) / logits.shape[1]


# ---------------------------------------------------------------------------
# sanity checks — main.py:1425-1538
# ---------------------------------------------------------------------------

def sanity_check_similarity(
    features: jax.Array,
    gts: jax.Array,
    compressor_w: Optional[jax.Array] = None,
) -> jax.Array:
    """Can the gt heatmap be reproduced by cosine similarity alone?

    The frame-0 target-weighted average feature is matched against every
    location of every frame: features [B,L,F,C], gts [B,L,F] ->
    similarity [B,L,F] (main.py:1466-1483)."""
    if compressor_w is not None:
        features = compress_features(features, compressor_w)
    B, L, F, C = features.shape
    # [B,1,C] = gt0^T @ features0
    first = jnp.einsum(
        "bf,bfc->bc", gts[:, 0, :], features[:, 0], preferred_element_type=jnp.float32
    )[:, None, :]
    sim = batched_smooth_cosine_similarity(features.reshape(B, L * F, C), first)
    return sim.reshape(B, L, F)


def sanity_check_pca(
    features: np.ndarray, gts: jax.Array, compress_dim: int
) -> jax.Array:
    """PCA variant (main.py:1512-1528): host-side sklearn PCA to compress_dim
    then the same cosine check."""
    from sklearn.decomposition import PCA

    B, L, F, C = features.shape
    flat = np.reshape(np.asarray(features), (B * L * F, C))
    reduced = PCA(n_components=compress_dim).fit_transform(flat)
    reduced = jnp.asarray(np.reshape(reduced, (B, L, F, compress_dim)))
    return sanity_check_similarity(reduced, gts)


# ---------------------------------------------------------------------------
# find_validation_batch — main.py:2299-2320
# ---------------------------------------------------------------------------

def find_validation_batch(
    sequences_dir: str,
    target_step: int = 1700,
    batch_size: int = 1,
    min_length: int = 20,
    validation_interval: int = 100,
    seed: int = 42,
    dump_path: Optional[str] = None,
):
    """Replay the REFERENCE's training-loop RNG schedule (one shared
    random.Random alternating train/val shuffles, main.py:2299-2320) to
    recover which validation batch a reference run used at `target_step`.
    NOTE: this framework's own train loop uses independent RNG streams for
    the train iterator and validation batches, so this helper reconstructs
    reference runs, not ntm_tracker_tpu runs."""
    from ntm_tracker_tpu.data.sequences import get_valid_sequences

    rng = _random.Random(seed)
    _, train_seqs, val_seqs = get_valid_sequences(sequences_dir, min_length)
    train_seqs = train_seqs[: len(train_seqs) // batch_size * batch_size]
    val_seqs = val_seqs[: len(val_seqs) // batch_size * batch_size]
    rng.shuffle(train_seqs)
    for step in range(target_step + 1):
        if step % validation_interval == 0:
            rng.shuffle(val_seqs)
        if step == target_step:
            break
    if dump_path:
        with open(dump_path, "wb") as f:
            pickle.dump(val_seqs, f)
    return val_seqs


# ---------------------------------------------------------------------------
# heatmap experiment driver (sevenbyseven / 8by8) — glue used by the CLI
# ---------------------------------------------------------------------------

def heatmap_loss_fn(
    params,
    ncfg: NTMConfig,
    features: jax.Array,
    gts: jax.Array,
    compressor_w: Optional[jax.Array] = None,
    sequential: bool = False,
):
    """Loss for the heatmap experiments. features [B,L,F,C]; gts [B,L,F].

    sequential=False: frame-token stream (64+1 per frame) with delimiter-step
    gather + CE (ntm_sevenbyseven/ntm_8by8, main.py:1919-1923).
    sequential=True: per-feature stream (ntm_sequential, main.py:1242-1247).
    """
    from ntm_tracker_tpu.train.serialize import heatmap_loss, serialize_tokens

    if compressor_w is not None:
        features = compress_features(features, compressor_w)
    F = features.shape[2]
    if sequential:
        tokens = serialize_sequential_tokens(features, gts[:, 0, :])
        _, logits, _ = ntm_tracker_unroll(params, ncfg, tokens)
        return sequential_ce_loss(logits, gts, F)
    tokens = serialize_tokens(features, gts[:, 0, :])
    _, logits, _ = ntm_tracker_unroll(params, ncfg, tokens)
    return heatmap_loss(logits, gts, F)
