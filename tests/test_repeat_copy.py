"""Repeat-copy task generator + masked loss tests (dnc/repeat_copy.py parity)."""

import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.models.dnc.repeat_copy import (
    DatasetTensors,
    RepeatCopy,
    bitstring_readable,
    masked_sigmoid_cross_entropy,
)


class TestRepeatCopy:
    def test_static_shapes(self):
        task = RepeatCopy(num_bits=4, batch_size=3, min_length=1, max_length=3,
                          min_repeats=1, max_repeats=2, seed=0)
        for _ in range(5):
            batch = task.sample()
            T = task.max_total_length
            assert batch.observations.shape == (T, 3, 6)
            assert batch.target.shape == (T, 3, 5)
            assert batch.mask.shape == (T, 3)

    def test_structure(self):
        task = RepeatCopy(num_bits=3, batch_size=1, min_length=2, max_length=2,
                          min_repeats=2, max_repeats=2, seed=1)
        b = task.sample()
        obs, targ, mask = map(np.asarray, b)
        # start marker at t=0 on channel num_bits
        assert obs[0, 0, 3] == 1.0
        # pattern occupies t=1..2; reps flag at t=3 normalized to 2/10
        np.testing.assert_allclose(obs[3, 0, 4], 0.2)
        # target = pattern repeated twice starting at t=4, end flag at t=8
        np.testing.assert_array_equal(targ[4:6, 0, :3], obs[1:3, 0, :3])
        np.testing.assert_array_equal(targ[6:8, 0, :3], obs[1:3, 0, :3])
        assert targ[8, 0, 3] == 1.0
        # mask covers exactly the target span (t=4..8)
        np.testing.assert_array_equal(mask[:, 0], [0, 0, 0, 0, 1, 1, 1, 1, 1])

    def test_masked_loss_matches_manual(self):
        rng = np.random.RandomState(2)
        T, B, C = 6, 2, 3
        logits = jnp.array(rng.randn(T, B, C), jnp.float32)
        target = jnp.array(rng.randint(0, 2, (T, B, C)), jnp.float32)
        mask = jnp.array(rng.randint(0, 2, (T, B)), jnp.float32)
        got = float(masked_sigmoid_cross_entropy(logits, target, mask))
        # manual sigmoid xent
        l, t = np.asarray(logits), np.asarray(target)
        xent = np.maximum(l, 0) - l * t + np.log1p(np.exp(-np.abs(l)))
        want = (xent.sum(2) * np.asarray(mask)).sum(0).sum() / B
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_loss_zero_when_mask_zero(self):
        logits = jnp.ones((4, 1, 2)) * 5
        target = jnp.zeros((4, 1, 2))
        mask = jnp.zeros((4, 1))
        assert float(masked_sigmoid_cross_entropy(logits, target, mask)) == 0.0

    def test_human_readable(self):
        task = RepeatCopy(num_bits=2, batch_size=1, seed=3)
        s = task.to_human_readable(task.sample())
        assert "Observations:" in s and "Targets:" in s
