"""Training harness: epoch/step loop, periodic validation, checkpointing.

Replaces train_and_val_sevenbyseven (direct_offset_output.py:243-390):
tf.Session/Saver/queue-runners become a jitted step over a mesh, a prefetch
iterator, and an orbax CheckpointManager. Cadence matches the reference:
validate + checkpoint every `validation_interval` steps, capped at
`validation_batch` val batches, breadcrumb the latest checkpoint path.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Iterable, Optional

import jax


@dataclasses.dataclass
class MetricLogger:
    """Scalar metric logger: JSONL on disk (TensorBoard-free observability)."""

    log_dir: str

    def __post_init__(self):
        os.makedirs(self.log_dir, exist_ok=True)
        self._f = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")

    def log(self, step: int, **scalars):
        rec = {"step": step, "time": time.time()}
        for k, v in scalars.items():
            rec[k] = float(v)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class CheckpointManager:
    """Orbax-backed save/restore with a save_path.txt breadcrumb
    (direct_offset_output.py:329-333)."""

    def __init__(self, directory: str, max_to_keep: int = 1000):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any):
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        with open(os.path.join(self._dir, "save_path.txt"), "w") as f:
            f.write(os.path.join(self._dir, str(step)))

    def restore(
        self, step: Optional[int] = None, template: Any = None, partial: bool = False
    ) -> Any:
        """Restore a checkpoint. With partial=True the template may cover a
        subtree of what was saved (e.g. params only, skipping opt_state) —
        the inference-time contract (test_tracker.py restores weights only)."""
        import orbax.checkpoint as ocp

        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        if template is not None and not partial:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        raw = self._mgr.restore(step)
        if template is None:
            return raw

        def extract(tmpl, value):
            if isinstance(tmpl, dict):
                return {k: extract(v, value[k]) for k, v in tmpl.items()}
            if isinstance(tmpl, (list, tuple)):
                if hasattr(tmpl, "_fields") and isinstance(value, dict):
                    # orbax StandardSave stores NamedTuples as field dicts
                    return type(tmpl)(
                        *(extract(t, value[f]) for t, f in zip(tmpl, tmpl._fields))
                    )
                if isinstance(value, dict):
                    # plain sequences may come back as {'0': ..., '1': ...}
                    value = [value[str(i)] for i in range(len(tmpl))]
                if len(tmpl) != len(value):
                    raise ValueError(
                        f"partial restore: template sequence of length "
                        f"{len(tmpl)} vs saved {len(value)}"
                    )
                out = [extract(t, v) for t, v in zip(tmpl, value)]
                if isinstance(tmpl, tuple):
                    return type(tmpl)(*out) if hasattr(tmpl, "_fields") else tuple(out)
                return out
            return value

        return extract(template, raw)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()


def train_loop(
    train_step: Callable,
    eval_step: Optional[Callable],
    params: Any,
    opt_state: Any,
    train_batches: Iterable,
    val_batches_fn: Optional[Callable[[], Iterable]] = None,
    *,
    log_dir: str = "./log",
    validation_interval: int = 100,
    validation_batch: int = 1,
    log_interval: int = 10,
    checkpoint: Optional[CheckpointManager] = None,
    logger: Optional[MetricLogger] = None,
    max_steps: Optional[int] = None,
    profile_steps: Optional[tuple] = None,
):
    """The reference's epoch/step loop shape (validate-first, then train).

    profile_steps=(start, stop) captures a jax.profiler device trace over
    that step window into <log_dir>/profile (TensorBoard/Perfetto layout),
    with per-step StepTraceAnnotations.
    """
    logger = logger or MetricLogger(log_dir)
    profiler = None
    if profile_steps is not None:
        from ntm_tracker_tpu.utils.profiling import StepWindowProfiler

        profiler = StepWindowProfiler(
            os.path.join(log_dir, "profile"), *profile_steps
        )
    step = 0
    try:
        for batch in train_batches:
            if max_steps is not None and step >= max_steps:
                break
            if step % validation_interval == 0:
                if eval_step and val_batches_fn:
                    accumu, count = 0.0, 0
                    for vb in val_batches_fn():
                        aux = eval_step(params, vb)
                        accumu += float(aux["loss"])
                        count += 1
                        if count >= validation_batch:
                            break
                    if count:
                        logger.log(step, val_loss=accumu / count)
                # checkpoint on the interval even with no validation split
                # (the reference saves at every validation cadence,
                # direct_offset_output.py:329-333)
                if checkpoint is not None:
                    checkpoint.save(step, {"params": params, "opt_state": opt_state})
            if profiler is not None:
                with profiler.before_step(step):
                    params, opt_state, metrics = train_step(params, opt_state, batch)
                profiler.after_step(step)
            else:
                params, opt_state, metrics = train_step(params, opt_state, batch)
            if step % log_interval == 0:
                logger.log(step, train_loss=metrics["loss"])
            step += 1
    finally:
        if profiler is not None:
            profiler.close()
    return params, opt_state, step
