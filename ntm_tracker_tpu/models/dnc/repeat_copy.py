"""Repeat-copy task: the DNC's unit-of-work benchmark.

Reimplements dnc/repeat_copy.py for JAX: the reference samples pattern
lengths/repeats INSIDE the graph (:269-272) which cannot jit (dynamic
shapes); here a host-side numpy sampler emits fixed-max-shape batches and
the existing mask machinery (:334-340) carries the variable lengths, so the
jitted train step sees static shapes (SURVEY.md §7 "RepeatCopy randomness").

Layout matches the reference exactly (time-major [T, B, C]):
  obs channels  = num_bits + start-marker + normalized-num-repeats (:261-266)
  targ channels = num_bits + end-marker
  mask[t,b] = 1 iff the prediction at (t,b) is penalized
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class DatasetTensors(NamedTuple):
    observations: jax.Array | np.ndarray  # [T, B, num_bits+2]
    target: jax.Array | np.ndarray        # [T, B, num_bits+1]
    mask: jax.Array | np.ndarray          # [T, B]


@dataclasses.dataclass
class RepeatCopy:
    """Host-side generator of repeat-copy batches (dnc/repeat_copy.py:115-392)."""

    num_bits: int = 6
    batch_size: int = 1
    min_length: int = 1
    max_length: int = 1
    min_repeats: int = 1
    max_repeats: int = 2
    norm_max: float = 10.0
    log_prob_in_bits: bool = False
    time_average_cost: bool = False
    seed: Optional[int] = None

    def __post_init__(self):
        self._rng = np.random.RandomState(self.seed)

    @property
    def target_size(self) -> int:
        return self.num_bits + 1

    @property
    def obs_size(self) -> int:
        return self.num_bits + 2

    @property
    def max_total_length(self) -> int:
        # total = sub_len * (reps + 1) + 3 (:275)
        return self.max_length * (self.max_repeats + 1) + 3

    def _normalise(self, val):
        return val / self.norm_max

    def _unnormalise(self, val):
        return val * self.norm_max

    def sample(self) -> DatasetTensors:
        """One batch with static shape [max_total_length, B, C]."""
        T = self.max_total_length
        B = self.batch_size
        full_obs = self.obs_size
        full_targ = self.target_size
        start_flag_idx = full_obs - 2
        reps_channel_idx = full_obs - 1

        obs = np.zeros((T, B, full_obs), np.float32)
        targ = np.zeros((T, B, full_targ), np.float32)
        mask = np.zeros((T, B), np.float32)

        for b in range(B):
            sub_len = self._rng.randint(self.min_length, self.max_length + 1)
            reps = self._rng.randint(self.min_repeats, self.max_repeats + 1)
            pattern = self._rng.randint(0, 2, size=(sub_len, self.num_bits)).astype(np.float32)

            # observation: start flag, pattern, num-repeats flag (:307-320)
            t = 0
            obs[t, b, start_flag_idx] = 1.0
            t += 1
            obs[t : t + sub_len, b, : self.num_bits] = pattern
            t += sub_len
            obs[t, b, reps_channel_idx] = self._normalise(float(reps))
            t += 1
            obs_end = t  # = sub_len + 2

            # target: pattern repeated, then end flag, offset to start at
            # obs_end (:322-339)
            rep_len = sub_len * reps
            targ[obs_end : obs_end + rep_len, b, : self.num_bits] = np.tile(
                pattern, (reps, 1)
            )
            end_flag_idx = self.target_size - 1  # target's own last channel
            targ[obs_end + rep_len, b, end_flag_idx] = 1.0

            # mask covers the target span (:334-336)
            mask[obs_end : obs_end + rep_len + 1, b] = 1.0

        return DatasetTensors(obs, targ, mask)

    def cost(self, logits, targ, mask):
        return masked_sigmoid_cross_entropy(
            logits, targ, mask,
            time_average=self.time_average_cost,
            log_prob_in_bits=self.log_prob_in_bits,
        )

    def to_human_readable(self, data: DatasetTensors, model_output=None, whole_batch=False) -> str:
        obs = np.asarray(data.observations)
        reps_flag = np.round(self._unnormalise(obs[:, :, -1:]))
        obs = np.concatenate([obs[:, :, :-1], reps_flag], axis=2)
        return bitstring_readable(
            data._replace(observations=obs), self.batch_size, model_output, whole_batch
        )


def masked_sigmoid_cross_entropy(
    logits, target, mask, time_average: bool = False, log_prob_in_bits: bool = False
):
    """Masked bernoulli NLL (dnc/repeat_copy.py:29-66). Time-major [T,B,C]."""
    # sigmoid xent: max(x,0) - x*z + log1p(exp(-|x|))
    xent = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss_time_batch = jnp.sum(xent, axis=2)
    loss_batch = jnp.sum(loss_time_batch * mask, axis=0)
    batch_size = logits.shape[1]
    if time_average:
        mask_count = jnp.sum(mask, axis=0)
        loss_batch = loss_batch / (mask_count + np.finfo(np.float32).eps)
    loss = jnp.sum(loss_batch) / batch_size
    if log_prob_in_bits:
        loss = loss / jnp.log(2.0)
    return loss


def bitstring_readable(data: DatasetTensors, batch_size: int, model_output=None, whole_batch=False) -> str:
    """ASCII visualization (dnc/repeat_copy.py:69-112)."""

    def _readable(datum):
        return "+" + " ".join(["-" if x == 0 else "%d" % x for x in datum]) + "+"

    obs_batch = np.asarray(data.observations)
    targ_batch = np.asarray(data.target)
    iterate_over = range(batch_size) if whole_batch else range(1)
    batch_strings = []
    for b in iterate_over:
        obs = obs_batch[:, b, :]
        targ = targ_batch[:, b, :]
        obs_strings = [_readable(obs[:, i]) for i in range(obs.shape[1])]
        targ_strings = [_readable(targ[:, i]) for i in range(targ.shape[1])]
        strings = [
            "Observations:\n" + "\n".join(obs_strings),
            "Targets:\n" + "\n".join(targ_strings),
        ]
        if model_output is not None:
            output = np.asarray(model_output)[:, b, :]
            strings.append(
                "Model Output:\n"
                + "\n".join(_readable(output[:, i]) for i in range(targ.shape[1]))
            )
        batch_strings.append("\n\n".join(strings))
    return "\n" + "\n\n\n\n".join(batch_strings)
