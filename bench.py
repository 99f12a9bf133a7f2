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

if __name__ == "__main__":
    try:
        main()
    except Exception:
        # tunneled dev TPUs occasionally drop a remote compile; one retry
        # rescues the round's benchmark record
        import traceback

        traceback.print_exc()
        print("bench: retrying once after transient failure", file=sys.stderr)
        main()
