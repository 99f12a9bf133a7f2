"""Profiling hooks (SURVEY.md §5.1): jax.profiler integration replacing the
reference's TensorBoard graph dumps and commented tf.Print debugging."""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture a device trace viewable in TensorBoard/Perfetto:
    `with profile_trace('./profile'): run_steps()`."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepWindowProfiler:
    """Capture a device trace over a window of training steps.

    Drive it from a step loop: `prof.before_step(step)` starts the trace
    when `step == start` and returns a StepTraceAnnotation context (or a
    null context outside the window); `prof.after_step(step)` stops the
    trace after the last window step. Used by train.harness.train_loop's
    `profile_steps=(start, stop)` knob and the CLI's `--profile_steps a:b`.

    The trace lands in <log_dir>/plugins/profile/... (TensorBoard layout).
    """

    def __init__(self, log_dir: str, start: int, stop: int):
        if stop < start:
            raise ValueError(f"profile window stop {stop} < start {start}")
        self.log_dir = log_dir
        self.start = start
        self.stop = stop
        self._active = False

    def before_step(self, step: int):
        import jax

        if step == self.start and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        if self._active:
            return jax.profiler.StepTraceAnnotation("train", step_num=step)
        return contextlib.nullcontext()

    def after_step(self, step: int) -> None:
        import jax

        if self._active and step >= self.stop:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        """Stop the trace if the loop ended inside the window."""
        import jax

        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def parse_profile_steps(spec: str):
    """'120:130' -> (120, 130); '50' -> (50, 50); '' -> None."""
    if not spec:
        return None
    parts = spec.split(":")
    if len(parts) == 1:
        a = b = int(parts[0])
    elif len(parts) == 2:
        a, b = int(parts[0]), int(parts[1])
    else:
        raise ValueError(f"bad --profile_steps {spec!r}; use START:STOP")
    return (a, b)
