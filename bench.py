"""Headline benchmark: tracked frames/sec/chip (+ p50 per-frame latency).

Measures the streaming tracker's whole-frame device step — frozen VGG-16
conv1..conv4_3 on the 224x224 crop, the 64-token gather, and the 65
sequential NTM cell steps — exactly the per-frame work of the reference's
online tracker (test_tracker.py:284-299, which did it in 65 sess.run round
trips; here it is ONE device call).

Prints ONE JSON line:
  {"metric": "tracked_frames_per_sec_per_chip", "value": N,
   "unit": "frames/s", "vs_baseline": N/1000, ...}
vs_baseline is against the driver's north-star target of 1000 frames/s/chip
on v5e (BASELINE.md; the reference publishes no numbers of its own).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ntm_tracker_tpu.benchmarks import main


def _wait_for_backend(deadline: float) -> None:
    """Block until jax can initialize its backend, probing in a THROWAWAY
    child each attempt. The tunneled dev chip drops out for stretches
    (observed: init raising UNAVAILABLE, and also init HANGING >15 min),
    and jax caches a failed init in-process — so the parent must not touch
    jax until a fresh child has proven the backend up. Losing the round's
    benchmark record to a bad window is worse than waiting it out."""
    import subprocess
    import time

    attempt = 0
    while True:
        attempt += 1
        try:
            ok = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=240, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            ).returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            if attempt > 1:
                print(f"bench: backend up after {attempt} probes",
                      file=sys.stderr)
            return
        if time.time() >= deadline:
            # exit instead of falling through: in-process init on a down
            # tunnel can HANG indefinitely (not just raise), which wedges
            # any supervisor waiting on this process. A fast non-zero exit
            # lets the caller retry; the metric line is lost either way.
            print("bench: backend never became available within the retry "
                  "budget", file=sys.stderr)
            raise SystemExit(2)
        print(f"bench: backend unavailable (probe {attempt}); retrying in "
              "60s", file=sys.stderr)
        time.sleep(60)


if __name__ == "__main__":
    import time
    import traceback

    from ntm_tracker_tpu.utils.compcache import (
        enable_persistent_compilation_cache,
    )

    # Persistent XLA compile cache: the round's fixed cost is dominated by
    # remote compiles (~850s of the r4 rehearsal's 1500s budget); a warm
    # cache from this session's runs collapses that for the driver's run.
    enable_persistent_compilation_cache()

    # The wall-clock budget starts NOW (not when main() starts): backend
    # waiting eats it too, so main's phase gates and the TRACK artifact's
    # adaptive training see what is truly left of the driver's patience
    # (NTM_BENCH_BUDGET_S, default 1500s — the r3 run hit the driver's
    # timeout at rc=124 and lost half its accuracy artifact).
    deadline = time.time() + float(
        os.environ.get("NTM_BENCH_BUDGET_S", "1500"))

    # Outages of the tunneled chip longer than 15 min have been observed
    # (>1h once); waiting longer only helps — if the driver enforces a
    # shorter budget it kills the process either way, and a recorded
    # benchmark beats a recorded stack trace.
    _wait_for_backend(time.time() + 45 * 60)
    try:
        main(deadline=deadline)
    except Exception:
        # one retry rescues transient drops (remote compile hiccups etc.)
        traceback.print_exc()
        print("bench: retrying once after transient failure", file=sys.stderr)
        main(deadline=deadline)
