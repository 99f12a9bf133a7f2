"""Multi-host readiness plumbing (parallel/distributed.py): process-local
batch assembly, dataset sharding, and initialize idempotence — exercised on
the virtual 8-device mesh (single process; JAX's process-local assembly is
identical code on 1 or N processes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntm_tracker_tpu.parallel.distributed import (
    global_batch_from_local,
    initialize_distributed,
    process_shard_sequences,
)
from ntm_tracker_tpu.parallel.mesh import DATA_AXIS, make_mesh, shard_batch


class TestProcessShard:
    def test_disjoint_equal_length_shards(self):
        """Shards are disjoint and EXACTLY equal-length: every train step is
        a global collective, so one extra batch on one host = a distributed
        hang. At most n-1 trailing items are dropped."""
        items = [f"seq{i}" for i in range(37)]
        for n in (1, 2, 4, 7):
            shards = [process_shard_sequences(items, pid, n) for pid in range(n)]
            flat = [x for s in shards for x in s]
            assert len(set(flat)) == len(flat)  # disjoint
            assert len({len(s) for s in shards}) == 1  # equal lengths
            assert len(s := shards[0]) == len(items) // n
            assert len(items) - len(flat) < n  # near-total coverage

    def test_defaults_to_live_topology(self):
        items = list(range(5))
        assert process_shard_sequences(items) == items  # 1 process here

    def test_rejects_bad_process_id(self):
        with pytest.raises(ValueError):
            process_shard_sequences([1, 2], process_id=3, process_count=2)

    def test_fewer_items_than_processes_fails_loudly(self):
        """per-host shard length 0 would turn every epoch into a silent
        no-op fleet-wide; refuse instead — except for optional sets
        (validation), where allow_empty opts into a warned empty shard."""
        with pytest.raises(ValueError, match="empty shard"):
            process_shard_sequences([1, 2], process_id=0, process_count=3)
        assert process_shard_sequences([], process_id=0, process_count=3) == []
        assert process_shard_sequences(
            [1, 2], process_id=0, process_count=3, allow_empty=True) == []


class TestGlobalBatch:
    def test_matches_shard_batch_single_process(self):
        mesh = make_mesh()
        batch = {
            "x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
            "y": np.ones((8,), np.float32),
        }
        a = global_batch_from_local(mesh, batch)
        b = shard_batch(mesh, batch)
        for k in batch:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
            assert a[k].sharding.spec == b[k].sharding.spec
            # really sharded: one row per device
            assert len(a[k].addressable_shards) == 8
            assert a[k].addressable_shards[0].data.shape[0] == 1

    def test_global_array_usable_in_sharded_compute(self):
        mesh = make_mesh()
        x = np.arange(16, dtype=np.float32).reshape(8, 2)
        g = global_batch_from_local(mesh, {"x": x})["x"]
        total = jax.jit(lambda a: jnp.sum(a * 2.0))(g)
        assert float(total) == float(x.sum() * 2)


class TestInitialize:
    def test_single_process_noop(self, monkeypatch):
        # no explicit coordinator and no opt-in -> must not try to
        # rendezvous, even when cluster-ISH env vars are present (tunneled
        # dev TPUs export TPU_WORKER_HOSTNAMES on a single host)
        monkeypatch.delenv("NTM_DIST_AUTO", raising=False)
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
        assert initialize_distributed() is False
        assert jax.process_count() == 1


class TestPrefetchErrors:
    def test_worker_exception_propagates(self):
        """A failure inside the prefetch thread must raise in the consumer,
        not silently truncate the epoch as a clean StopIteration."""
        from ntm_tracker_tpu.data.loader import PrefetchIterator

        def gen():
            yield 1
            raise IOError("corrupt record")

        it = PrefetchIterator(gen())
        assert next(it) == 1
        with pytest.raises(IOError, match="corrupt record"):
            next(it)

    def test_clean_exhaustion_still_stops(self):
        from ntm_tracker_tpu.data.loader import PrefetchIterator

        assert list(PrefetchIterator(iter([1, 2, 3]))) == [1, 2, 3]
