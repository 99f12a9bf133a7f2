"""Persistent XLA compilation cache for the round's entry points.

Why this exists: the per-round benchmark's fixed cost is dominated by
XLA/Mosaic compiles over the tunneled backend — the r4 rehearsal spent
roughly 850s of its 1500s budget compiling (headline sweep + two TRACK
cores) before a single measured step ran. jax's persistent compilation
cache serializes compiled executables to disk keyed by (HLO module,
compile options, backend/platform version), so a warm cache collapses
that fixed cost across processes: the driver's end-of-round `bench.py`
run re-hits the executables this session already built. Verified on the
tunneled axon backend (a 61 KB `jit_f-*-cache` executable entry was
written by the r4 probe, and a warm second process dropped first-call
time ~4.6x even with the tunnel mid-degradation). The key STRIPS
source-location debug info (verified r5: identical keys for the same
function shifted 5 lines, and a TPU run after an import-only refactor
of tracker.py/experiments.py re-hit every committed entry), so source
edits that don't change the traced computation keep the cache valid.
The converse caveat (also measured r5): programs that BAKE *trained*
weights as constants (the TRACK artifact's device loops and eval
programs) mint a fresh key every run — TPU training is not
bit-deterministic across processes even with fixed seeds (the rounded
IoU metrics coincide; the weight bytes do not) — so committing their
entries is pointless; only seeded-init programs (headline, entry(),
the fused train step) have stable keys worth committing. Load cost:
hitting is not free over the tunnel — a warm B=256 frame-step load
measured 603 s in a degraded window (r5) vs seconds in a good one,
which is why the bench's phase gates re-check the remaining budget
after every load.

Scope discipline: the cache is enabled ONLY from process entry points
(`bench.py`, `tools/track_artifact.py`, `__graft_entry__.py`) — never at
library import — so importing `ntm_tracker_tpu` stays side-effect free
and users opt in per process. `NTM_COMPILATION_CACHE=0` disables it even
there (e.g. to time a cold compile honestly).

CPU is excluded (measured r4): XLA:CPU AOT deserialization rejects this
machine's own cache entries with a machine-feature mismatch
("+prefer-no-gather ... could lead to execution errors such as SIGILL",
cpu_aot_loader.cc) and falls back to a full recompile — a warm 8-device
dryrun took 4m59s, the same as cold, plus the E-log noise. The helper
therefore no-ops when the configured platform is cpu (the virtual-mesh
dryrun and the test suite), keeping the cache a TPU-path optimization.
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at a repo-local directory.

    Returns the cache dir, or None when disabled via NTM_COMPILATION_CACHE=0
    (or a non-writable target). Must run before the first jit compile to be
    useful; jax's defaults (min compile time 1s, min entry 0 bytes) are kept
    — the multi-second XLA/Mosaic programs are the cost worth caching, and
    skipping sub-second entries keeps the directory small.
    """
    if os.environ.get("NTM_COMPILATION_CACHE", "1") == "0":
        return None

    import jax

    # Platform check WITHOUT initializing a backend: callers that want CPU
    # (dryrun_multichip, --platform cpu) set jax_platforms before calling.
    configured = jax.config.jax_platforms or ""
    if configured.split(",")[0] == "cpu":
        return None

    if cache_dir is None:
        cache_dir = os.environ.get("NTM_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    return cache_dir
