"""Device-mesh scaling: data-parallel pjit over ICI.

The reference is single-device (SURVEY.md §2 row 28); the TPU-native scale
story is pure data parallelism — the model is ~1M params while the work
grows with batch x 1300 sequential cell steps, so the mesh shards the batch
axis and XLA all-reduces gradients over ICI (SURVEY.md §5.8). The sequence
axis stays local (65L sequential scan steps can't parallelize spatially);
scale goes into batch.

Everything here uses jax.sharding + jit (pjit): annotate in/out shardings,
let the SPMD partitioner insert the psum for the gradient all-reduce.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence] = None,
    axis: str = DATA_AXIS,
    batch_size: Optional[int] = None,
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices.

    If batch_size is given, the mesh is trimmed to the largest device count
    that divides it (sharding requires divisibility; batch_size=1 on an
    8-chip host must not crash — it just runs single-device)."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n != 0:
            n -= 1
        if n < len(devices):
            devices = devices[:n]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = DATA_AXIS) -> Any:
    """device_put every leaf with its leading axis split over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def parallel_train_step(
    train_step: Callable,
    mesh: Mesh,
    donate_argnums=(0, 1),
    axis: str = DATA_AXIS,
) -> Callable:
    """jit a (params, opt_state, batch, ...) -> (params, opt_state, metrics)
    step with replicated params/optimizer and batch-sharded data.

    The gradient all-reduce is inserted by the SPMD partitioner: the loss
    sums over the sharded batch axis, so dLoss/dparams is a psum over ICI.
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh, axis)

    return jax.jit(
        train_step,
        in_shardings=(repl, repl, data),
        out_shardings=(repl, repl, repl),
        donate_argnums=donate_argnums,
    )
