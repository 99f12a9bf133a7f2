"""Part 2 of the int8 root-cause probe: does s8xs8->s32 DOT_GENERAL hit
the v5e int8 MXU path even though s8 convolution does not?

probe_int8.py measured the s8 conv TOKEN path at ~3x slower than bf16 and
a lone s8 conv whose compile never finished inside 10+ minutes. If the s8
dot is fast (~2x bf16), an im2col int8 conv could still be a serving
lever; if the s8 dot is also slow, the int8 premise is dead on this
chip/toolchain and vgg_int8 keeps a measured rejection verdict.

MEASURED (v5e, round 4): s8xs8->s32 dot 1.99 ms (19.4 TFLOP/s) vs bf16
1.15 ms (33.5 TFLOP/s) vs f32-default 1.21 ms on the [8192,2304]x
[2304,1024] GEMM, and the s8 compile itself took minutes. int8 dot is
0.58x bf16 — NO int8 MXU path is reachable from XLA here; the rejection
verdict in models/vgg_int8.py is final for this toolchain.

Usage: python -m ntm_tracker_tpu.tools.probe_int8_dot
"""

from __future__ import annotations

import time

import numpy as np


def _time_fn(fn, *args, iters: int = 30, passes: int = 3) -> float:
    out = fn(*args)
    np.asarray(out[:1, :1])  # compile + value-fetch sync (CLAUDE.md)
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out[:1, :1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main() -> int:
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    # MXU-saturating GEMM: [8192, 2304] x [2304, 1024]
    M, K, N = 8192, 2304, 1024
    a = jnp.asarray(rng.rand(M, K).astype(np.float32) - 0.5)
    b = jnp.asarray(rng.rand(K, N).astype(np.float32) - 0.5)
    a8 = jnp.clip(jnp.round(a * 127), -127, 127).astype(jnp.int8)
    b8 = jnp.clip(jnp.round(b * 127), -127, 127).astype(jnp.int8)
    ab, bb = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)

    def dot(x, y, pet):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=pet)

    flops = 2.0 * M * K * N
    for tag, fn, args in (
        ("s8xs8->s32", jax.jit(lambda x, y: dot(x, y, jnp.int32)), (a8, b8)),
        ("bf16->f32 ", jax.jit(lambda x, y: dot(x, y, jnp.float32)), (ab, bb)),
        ("f32 dflt  ", jax.jit(lambda x, y: dot(x, y, jnp.float32)), (a, b)),
    ):
        print(f"compiling {tag}...", flush=True)
        ms = _time_fn(fn, *args)
        print(f"  {tag}: {ms:7.3f} ms   {flops / (ms * 1e-3) / 1e12:7.1f} "
              f"TFLOP/s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
