"""TF-RMSProp semantics tests: exact update-rule oracle."""

import jax.numpy as jnp
import numpy as np
import optax

from ntm_tracker_tpu.train.optim import reference_optimizer, tf_rmsprop


class TestTFRMSProp:
    def test_matches_tf_update_rule(self):
        lr, decay, momentum, eps = 0.01, 0.9, 0.8, 1e-10
        opt = tf_rmsprop(lr, decay, momentum, eps)
        p = {"w": jnp.array([1.0, -2.0, 3.0])}
        state = opt.init(p)
        # TF initializes the rms slot to ONES
        np.testing.assert_array_equal(np.asarray(state.ms["w"]), 1.0)

        ms, mom = np.ones(3), np.zeros(3)
        params = np.array([1.0, -2.0, 3.0])
        for step in range(3):
            g = np.array([0.5, -1.0, 2.0]) * (step + 1)
            updates, state = opt.update({"w": jnp.array(g, jnp.float32)}, state, p)
            params_jax = optax.apply_updates({"w": jnp.array(params, jnp.float32)}, updates)
            # oracle
            ms = decay * ms + (1 - decay) * g * g
            mom = momentum * mom + lr * g / np.sqrt(ms + eps)
            params = params - mom
            np.testing.assert_allclose(np.asarray(params_jax["w"]), params, rtol=1e-5)

    def test_global_norm_clip_chain(self):
        opt = reference_optimizer(
            learning_rate=1.0, decay=0.0, momentum=0.0, epsilon=1e-10,
            max_gradient_norm=1.0,
        )
        p = {"w": jnp.zeros(4)}
        state = opt.init(p)
        big = {"w": jnp.array([10.0, 0.0, 0.0, 0.0])}
        updates, _ = opt.update(big, state, p)
        # clipped to norm 1, then rmsprop with decay 0 -> ms = g^2,
        # update = -lr * g/|g| = -1 (sign of g)
        np.testing.assert_allclose(np.asarray(updates["w"])[0], -1.0, rtol=1e-4)
