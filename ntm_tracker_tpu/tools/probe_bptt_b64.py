"""Minimal repro + knob sweep for the Mosaic B=64 fused-BPTT crash
(VERDICT r3 weak #6 / next-round item 6).

scan_bptt.py's measured table shows the ceiling is the BATCH axis
(B=8/T=1300 compiles; B=64/T=12 dies in the Mosaic compile helper with
exit 1). This probe, run directly on the TPU backend:

  1. reproduces the failure at B=64/T=12 and captures the real error,
  2. bisects which of the two kernels (residual forward vs backward) dies,
  3. tries the obvious knobs: a raised VMEM limit
     (pltpu.CompilerParams(vmem_limit_bytes=...)) and
     dimension_semantics=("arbitrary",),
  4. records whether B=48 (between the known-good 32 and the crash at 64)
     compiles — locating the cliff.

Each attempt runs in a CHILD interpreter (the crash takes the process
down / wedges the backend client), with a timeout.

OUTCOME (r4): the OOM was fixed by design — scan_bptt.py now grids over
(B/BATCH_TILE, T) so scoped VMEM is bounded by the tile. This probe pins
BATCH_TILE high to keep reproducing the original single-tile failure.

The SECOND failure class lives at the other end of the batch axis:
B=512 with the SHIPPED tile of 64 (an 8-tile grid) dies in the remote
Mosaic compile helper with an opaque HTTP 500 and no diagnostic — the
r4 knee sweep's `compile failed*` footnote. `--b512` runs that minimal
repro (tile kept at the default, T=12 keeps it minutes-cheap). It is
perf-irrelevant (B=256 is the knee for both paths) and since r5 it is
also run-safety-irrelevant: train_step_with_bptt_fallback degrades any
fused-BPTT compile failure to the XLA scan.

Usage: python -m ntm_tracker_tpu.tools.probe_bptt_b64 [--b512]
"""

from __future__ import annotations

import subprocess
import sys

_CHILD = r"""
import sys
B, T, WHICH, TILE = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                     sys.argv[4])
import jax, jax.numpy as jnp
from ntm_tracker_tpu.config import NTMConfig
from ntm_tracker_tpu.models.ntm_cell import init_ntm_params, init_ntm_state
from ntm_tracker_tpu.ops.pallas import scan_bptt
# TILE "single" forces ONE grid tile so this probe keeps reproducing the
# ORIGINAL un-tiled scoped-VMEM OOM (the shipped kernel now grids over
# BATCH_TILE-row tiles and no longer has that batch ceiling); "default"
# keeps the shipped tile (the B=512 8-tile HTTP-500 repro needs it)
if TILE == "single":
    scan_bptt.BATCH_TILE = 1024
elif TILE != "default":
    scan_bptt.BATCH_TILE = int(TILE)

cfg = NTMConfig()  # flagship defaults — the config of the measured table
IN = 514           # TrackerConfig.input_depth: 512 features + 2 indicator bits
params = init_ntm_params(jax.random.PRNGKey(0), cfg, IN)
state = init_ntm_state(params, cfg, B)
tokens = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN), jnp.float32)

if WHICH == "fwd":
    out = scan_bptt._fwd_call(params, cfg, tokens, state, False)
    print("fwd ok", jax.tree_util.tree_leaves(out)[0].shape, flush=True)
    import numpy as np; np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
elif WHICH == "grad":
    def loss(p):
        logits, _ = scan_bptt.ntm_scan_fused_bptt(p, cfg, tokens, state)
        return jnp.sum(logits ** 2)
    g = jax.grad(loss)(params)
    import numpy as np; np.asarray(jax.tree_util.tree_leaves(g)[0])
    print("grad ok", flush=True)
print("CHILD_OK", flush=True)
"""


def attempt(b: int, t: int, which: str, extra_env: dict | None = None,
            timeout: int = 420, tile: str = "single") -> str:
    import os

    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    try:
        p = subprocess.run(
            [sys.executable, "-c", _CHILD, str(b), str(t), which, tile],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        return "TIMEOUT"
    if p.returncode == 0 and "CHILD_OK" in p.stdout:
        return "OK"
    tail = (p.stderr or p.stdout).strip().splitlines()[-12:]
    return f"rc={p.returncode}\n    " + "\n    ".join(tail)


def main() -> int:
    if "--b512" in sys.argv[1:]:
        # the 8-tile repro of the remote-compile HTTP 500 (shipped tile 64)
        runs = [
            ("control  B=256 T=12 grad, shipped tile (4 tiles, known good)",
             256, 12, "grad", None, "default"),
            ("repro    B=512 T=12 grad, shipped tile (8 tiles)",
             512, 12, "grad", None, "default"),
            ("bisect   B=512 T=12 fwd-kernel only, shipped tile",
             512, 12, "fwd", None, "default"),
        ]
    else:
        runs = [
            ("baseline B=32 T=12 grad (known good)", 32, 12, "grad", None,
             "single"),
            ("repro    B=64 T=12 grad", 64, 12, "grad", None, "single"),
            ("bisect   B=64 T=12 fwd-kernel only", 64, 12, "fwd", None,
             "single"),
            ("cliff    B=48 T=12 grad", 48, 12, "grad", None, "single"),
            ("knob     B=64 T=12 grad, 128M vmem limit", 64, 12, "grad",
             {"LIBTPU_INIT_ARGS": "--xla_tpu_scoped_vmem_limit_kib=131072"},
             "single"),
        ]
    for name, b, t, which, env, tile in runs:
        res = attempt(b, t, which, env, tile=tile)
        print(f"{name}: {res}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
