"""Standalone DNC repeat-copy trainer (reference dnc/train.py).

Same defaults: memory 16x16, 1 read 1 write head, LSTM-64, batch 16,
RMSProp(lr 1e-4, eps 1e-10), global-norm clip 50, report every 100 iters
(dnc/train.py:30-66). The SingularMonitoredSession + CheckpointSaverHook
resume behavior (:130-144) maps to the orbax CheckpointManager: training
always resumes from the latest checkpoint in checkpoint_dir if present.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ntm_tracker_tpu.config import DNCConfig
from ntm_tracker_tpu.models.dnc.dnc import dnc_unroll, init_dnc_params
from ntm_tracker_tpu.models.dnc.repeat_copy import RepeatCopy, masked_sigmoid_cross_entropy
from ntm_tracker_tpu.train.optim import tf_rmsprop


@dataclasses.dataclass
class RepeatCopyTrainConfig:
    """dnc/train.py:30-66 defaults."""

    hidden_size: int = 64
    memory_size: int = 16
    word_size: int = 16
    num_write_heads: int = 1
    num_read_heads: int = 1
    clip_value: float = 20.0
    max_grad_norm: float = 50.0
    learning_rate: float = 1e-4
    optimizer_epsilon: float = 1e-10
    batch_size: int = 16
    num_bits: int = 4
    min_length: int = 1
    max_length: int = 2
    min_repeats: int = 1
    max_repeats: int = 2
    num_training_iterations: int = 100_000
    report_interval: int = 100
    checkpoint_interval: int = -1  # -1 disables, like the flag default
    checkpoint_dir: str = "/tmp/tf/dnc"
    seed: Optional[int] = None


def train_repeat_copy(
    cfg: RepeatCopyTrainConfig = RepeatCopyTrainConfig(),
    num_iterations: Optional[int] = None,
    log=print,
):
    """Train the DNC on repeat-copy; returns (params, losses)."""
    task = RepeatCopy(
        num_bits=cfg.num_bits, batch_size=cfg.batch_size,
        min_length=cfg.min_length, max_length=cfg.max_length,
        min_repeats=cfg.min_repeats, max_repeats=cfg.max_repeats,
        seed=cfg.seed,
    )
    dcfg = DNCConfig(
        output_dim=task.target_size,
        memory_size=cfg.memory_size, word_size=cfg.word_size,
        num_reads=cfg.num_read_heads, num_writes=cfg.num_write_heads,
        hidden_size=cfg.hidden_size, clip_value=cfg.clip_value,
    )
    params = init_dnc_params(
        jax.random.PRNGKey(cfg.seed or 0), dcfg, task.obs_size
    )
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        # tf.train.RMSPropOptimizer defaults: decay=0.9, momentum=0.0
        # (dnc/train.py:123-124 passes only lr and epsilon)
        tf_rmsprop(cfg.learning_rate, decay=0.9, momentum=0.0,
                   epsilon=cfg.optimizer_epsilon),
    )
    opt_state = opt.init(params)

    ckpt = None
    start_iter = 0
    if cfg.checkpoint_interval > 0:
        from ntm_tracker_tpu.train.harness import CheckpointManager

        ckpt = CheckpointManager(cfg.checkpoint_dir, max_to_keep=5)
        latest = ckpt.latest_step()
        if latest is not None:
            restored = ckpt.restore(
                latest, template={"params": params, "opt_state": opt_state}
            )
            params, opt_state = restored["params"], restored["opt_state"]
            start_iter = latest
            log(f"resumed from checkpoint step {latest}")

    def loss_fn(p, obs, targ, mask):
        # dynamic_rnn(time_major=True) (dnc/train.py:80-85)
        logits, _ = dnc_unroll(p, dcfg, obs, time_major=True)
        return masked_sigmoid_cross_entropy(logits, targ, mask)

    @jax.jit
    def step(p, s, obs, targ, mask):
        loss, grads = jax.value_and_grad(loss_fn)(p, obs, targ, mask)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    # compiled ONCE, not per report (a fresh jit() in the loop would
    # re-trace the whole unroll at every report interval)
    report_fwd = jax.jit(lambda p, o: dnc_unroll(p, dcfg, o, time_major=True))

    total = num_iterations if num_iterations is not None else cfg.num_training_iterations
    losses, accum = [], 0.0
    for it in range(start_iter, total):
        batch = task.sample()
        params, opt_state, loss = step(
            params, opt_state,
            jnp.asarray(batch.observations), jnp.asarray(batch.target),
            jnp.asarray(batch.mask),
        )
        accum += float(loss)
        losses.append(float(loss))
        if (it + 1) % cfg.report_interval == 0:
            # the reference logs a human-readable obs/target/model-output
            # sample with every report (dnc/train.py:151-156)
            logits, _ = report_fwd(params, jnp.asarray(batch.observations))
            rounded = jnp.round(jax.nn.sigmoid(logits)) * jnp.asarray(
                batch.mask
            )[..., None]
            sample = task.to_human_readable(batch, np.asarray(rounded))
            log(f"{it + 1}: avg training loss "
                f"{accum / cfg.report_interval:.4f}\n{sample}")
            accum = 0.0
        if ckpt is not None and cfg.checkpoint_interval > 0 and (
            (it + 1) % cfg.checkpoint_interval == 0
        ):
            ckpt.save(it + 1, {"params": params, "opt_state": opt_state})
    return params, losses
