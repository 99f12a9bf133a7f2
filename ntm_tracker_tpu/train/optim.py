"""Optimizers with TF-1.x semantics, as optax GradientTransformations.

The reference trains with tf.train.RMSPropOptimizer(lr, decay, momentum)
plus tf.clip_by_global_norm (direct_offset_output.py:611-626; DNC entry
uses epsilon=1e-10 and clip 50, direct_offset_output_with_dnc.py:608-621).

TF RMSProp update (centered=False):
    ms  <- decay * ms + (1 - decay) * g^2
    mom <- momentum * mom + lr * g / sqrt(ms + eps)
    p   <- p - mom
Note TF adds eps INSIDE the sqrt — optax.scale_by_rms adds it outside (and
initializes ms to 1.0 via initial_scale), so we implement the exact rule.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class TFRMSPropState(NamedTuple):
    ms: optax.Updates
    mom: optax.Updates


def tf_rmsprop(
    learning_rate: float,
    decay: float = 0.9,
    momentum: float = 0.0,
    epsilon: float = 1e-10,
) -> optax.GradientTransformation:
    """Exact tf.train.RMSPropOptimizer. ms initialized to ONES like TF."""

    def init_fn(params):
        return TFRMSPropState(
            ms=jax.tree.map(jnp.ones_like, params),
            mom=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        ms = jax.tree.map(
            lambda m, g: decay * m + (1 - decay) * jnp.square(g), state.ms, updates
        )
        mom = jax.tree.map(
            lambda v, m, g: momentum * v + learning_rate * g * jax.lax.rsqrt(m + epsilon),
            state.mom, ms, updates,
        )
        new_updates = jax.tree.map(lambda v: -v, mom)
        return new_updates, TFRMSPropState(ms=ms, mom=mom)

    return optax.GradientTransformation(init_fn, update_fn)


def reference_optimizer(
    learning_rate: float = 1e-4,
    decay: float = 0.95,
    momentum: float = 0.9,
    epsilon: float = 1e-10,
    max_gradient_norm: float = 5.0,
) -> optax.GradientTransformation:
    """clip_by_global_norm -> TF RMSProp, the reference's exact chain."""
    return optax.chain(
        optax.clip_by_global_norm(max_gradient_norm),
        tf_rmsprop(learning_rate, decay, momentum, epsilon),
    )
