"""Multi-host (multi-process) data parallelism plumbing.

Single-host DP (parallel/mesh.py) shards the batch over the local chips; to
scale past one host, JAX runs one process per host and every process must:

  1. call jax.distributed.initialize (coordinator rendezvous)      -> here
  2. build the mesh over jax.devices() — the GLOBAL device list    -> mesh.py
     (unchanged: Mesh() over all devices is already global)
  3. feed only its LOCAL slice of the global batch, assembled into a
     globally-sharded jax.Array via make_array_from_process_local_data -> here
  4. read a DISJOINT shard of the dataset                          -> here

The training step itself (parallel_train_step) is unchanged: pjit over the
global mesh, gradient psum over ICI within a host and DCN across hosts —
XLA picks the collective path from the mesh topology.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ntm_tracker_tpu.parallel.mesh import DATA_AXIS


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize with idempotence and single-process no-op.

    Call before ANY jax computation on every host. Engages only when a
    coordinator is given explicitly (--dist_coordinator) or NTM_DIST_AUTO=1
    opts into JAX's own cluster auto-detection — cluster-ish env vars alone
    are NOT trusted (e.g. tunneled dev TPUs export TPU_WORKER_HOSTNAMES
    without being a multi-host fleet). Returns True if a multi-process
    runtime was initialized.
    """
    explicit = coordinator_address is not None
    opt_in = os.environ.get("NTM_DIST_AUTO", "") == "1"
    if not explicit and not opt_in:
        return False  # single-process: nothing to do
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    # NOTE: must run before anything touches the backend — even
    # jax.process_count() would initialize it — so probe nothing first and
    # tolerate the double-call error instead.
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise
    return jax.process_count() > 1


def process_shard_sequences(
    items: Sequence, process_id: Optional[int] = None,
    process_count: Optional[int] = None, allow_empty: bool = False,
) -> list:
    """Deterministic per-host dataset shard: round-robin over disjoint
    subsets, TRUNCATED to the same length on every process. Defaults to the
    live jax process topology.

    Equal lengths are load-bearing, not cosmetic: every train/eval step is
    a global collective, so if one host's shard yielded even one more batch
    per epoch, that host would block forever in a collective the others
    never enter. len(items) % n trailing items are dropped (at most n-1)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    if not 0 <= pid < n:
        raise ValueError(f"process_id {pid} out of range for {n} processes")
    if 0 < len(items) < n:
        if not allow_empty:
            raise ValueError(
                f"{len(items)} sequences cannot be sharded over {n} "
                f"processes: len(items)//n == 0, so EVERY host would get an "
                f"empty shard and the epoch would be a silent no-op (add "
                f"data or shrink the fleet; allow_empty=True opts into "
                f"empty shards for optional sets like validation)"
            )
        import sys

        print(f"WARNING: {len(items)} sequences over {n} processes -> "
              "every host gets an EMPTY shard", file=sys.stderr)
    per = len(items) // n
    return list(items)[pid::n][:per]


def global_batch_from_local(
    mesh: Mesh, local_batch: Any, axis: str = DATA_AXIS
) -> Any:
    """Assemble each process's LOCAL batch leaves into batch-sharded GLOBAL
    jax.Arrays (jax.make_array_from_process_local_data).

    Every process passes its local [B_local, ...] arrays; the result is a
    pytree of global [B_local * process_count, ...] arrays sharded over the
    mesh's data axis. With one process this degenerates to device_put with
    the same sharding, so single- and multi-host code paths are identical.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch,
    )
