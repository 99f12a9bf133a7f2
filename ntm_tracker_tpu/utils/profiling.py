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
