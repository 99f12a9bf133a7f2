"""Sequence unroll of the NTM cell — the reference's trackers re-done as scans.

LoopNTMTracker's `tf.while_loop(parallel_iterations=32, swap_memory=True)`
(ntm_tracker_new.py:34-49) becomes `jax.lax.scan` with optional
`jax.checkpoint` rematerialization: XLA compiles the scan body once, keeps
the 128x20 memory state resident in VMEM/HBM, and remat replaces the
reference's host-RAM activation swap as the length-scaling mechanism
(SURVEY.md §5.7).

The reference returns stacked per-step outputs/logits (ntm_tracker_new.py:42-44);
so do we. PlainNTMTracker (Python unroll) is subsumed — a scan is the same
computation; NTMTracker's two-step present/ask protocol lives in
`two_step_inputs` below.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ntm_tracker_tpu.config import NTMConfig
from ntm_tracker_tpu.models.ntm_cell import (
    NTMState,
    init_ntm_params,
    init_ntm_state,
    ntm_cell_step,
    ntm_cell_step_dn,
    state_from_dn,
    state_to_dn,
)


def ntm_tracker_unroll(
    params: Dict[str, Any],
    cfg: NTMConfig,
    inputs: jax.Array,
    state: Optional[NTMState] = None,
    remat: bool = True,
    compute_dtype=None,
    unroll: int = 1,
    layout: str = "nd",
    fused_bptt: bool | str = False,
) -> Tuple[jax.Array, jax.Array, NTMState]:
    """Run the cell over a serialized token sequence.

    Args:
      inputs: [batch, steps, input_size]
      state: optional initial state; defaults to the learnable initial state
        (ntm_tracker_new.py:15-16).
    Returns:
      (outputs [B,T,out], logits [B,T,out], final_state)

    remat accepts a bool or a policy string:
      True / "full"  — jax.checkpoint, recompute everything in the backward
      "dots"         — jax.checkpoint(policy=dots_saveable): SAVE each
                       step's matmul outputs (gates/head projections,
                       [B,4H]+[B,P] per step ~ the only MXU work),
                       recompute just the cheap elementwise addressing.
                       Skips the whole forward recompute at the price of
                       T*(4H+P)*B floats of HBM.
      False / "none" — save every intermediate (XLA default).

    Perf notes (v5e, B=8, T=1300 grad step): remat=True is ~1.8x FASTER
    than remat=False (33ms vs 58ms) — recomputing the cheap cell forward
    beats streaming 1300 steps of saved activations through HBM. unroll=13
    shaves a further ~6% (31.3ms) at the cost of ~13x scan-body compile
    time; expose it for long production runs. For the B=256 cached-token
    training knee, see tools/profile_train.py (round-3 sweep).

    Chunked remat (outer scan over frames, jax.checkpoint per 65-token
    chunk, plain inner scan) was measured at B=32/T=1300 and REJECTED:
    57.9ms per-step remat vs 82-91ms for chunk sizes 26/65/130 (and 84.5ms
    with no remat) — the per-chunk carry saves cost more HBM traffic than
    the recompute they avoid at this state size.
    """
    B = inputs.shape[0]
    if state is None:
        state = init_ntm_state(params, cfg, B)

    if isinstance(fused_bptt, str) and fused_bptt != "auto":
        # guard the truthiness trap: any typo'd string would otherwise
        # silently enable the fused kernel below
        raise ValueError(
            f"fused_bptt must be True, False or 'auto', got {fused_bptt!r}"
        )
    if fused_bptt == "auto":
        # measured winner at every training-scale batch on a SINGLE v5e
        # chip at f32 (r4 knee sweep, tools/bench_bptt_knee.py: 1.48x at
        # B=32, 1.61x at B=64, 1.39x at B=256 with BATCH_TILE=64) — but
        # Pallas calls carry no GSPMD partitioning rules, so under a pjit
        # mesh (parallel/mesh.py) the XLA scan remains the multi-chip
        # path; multi-chip users inside shard_map (per-device local
        # shapes) may still pass True. B<64 also stays on the XLA scan:
        # sub-64 batches run a narrower grid tile whose Mosaic compile
        # was measured at ~5 MINUTES (tile 32; tile 64 compiles in
        # 17-46 s) — a one-off the ~19 ms/step win only repays after
        # ~17k steps, far past the demo/TRACK-scale runs. Small-batch
        # production runs that amortize it may pass True explicitly.
        fused_bptt = (
            jax.default_backend() == "tpu"
            and jax.device_count() == 1
            and B >= 64
            and (compute_dtype is None or compute_dtype == jnp.float32)
        )

    if fused_bptt:
        # whole-sequence Pallas forward + hand-derived Pallas backward
        # (ops/pallas/scan_bptt.py) — f32 only; remat/unroll/layout knobs
        # do not apply inside the kernel. Grad-parity with the jnp scan is
        # asserted in tests/test_pallas_bptt.py.
        if compute_dtype is not None and compute_dtype != jnp.float32:
            raise ValueError("fused_bptt supports float32 compute only")
        from ntm_tracker_tpu.ops.pallas.scan_bptt import ntm_scan_fused_bptt

        logits, final_state = ntm_scan_fused_bptt(
            params, cfg, inputs, state,
            interpret=jax.default_backend() != "tpu",
        )
        return jax.nn.softmax(logits, axis=-1), logits, final_state

    # layout="dn" carries the memory transposed ([B, mem_dim, mem_size])
    # through the scan so the 128-slot axis fills the TPU's 128 lanes —
    # the reference layout pads mem_dim=20 to 128 lanes, a 6.4x HBM/VPU tax
    # on every M-shaped buffer and cotangent (see ntm_cell_step_dn).
    # Transposes happen ONCE at entry/exit; same math up to reassociation.
    if layout == "dn":
        state = state_to_dn(state)

        def body(carry: NTMState, x_t: jax.Array):
            out, logit, new_state = ntm_cell_step_dn(
                params, cfg, x_t, carry, compute_dtype
            )
            return new_state, (out, logit)

    elif layout == "nd":

        def body(carry: NTMState, x_t: jax.Array):
            out, logit, new_state = ntm_cell_step(
                params, cfg, x_t, carry, compute_dtype
            )
            return new_state, (out, logit)

    else:
        raise ValueError(f"unknown scan layout {layout!r}")

    if remat is True or remat == "full":
        body = jax.checkpoint(body)
    elif remat == "dots":
        body = jax.checkpoint(
            body, policy=jax.checkpoint_policies.dots_saveable
        )
    elif remat not in (False, "none"):
        raise ValueError(f"unknown remat policy {remat!r}")

    # scan over time: move steps to the leading axis
    xs = jnp.swapaxes(inputs, 0, 1)  # [T,B,D]
    final_state, (outputs, logits) = jax.lax.scan(body, state, xs, unroll=unroll)
    if layout == "dn":
        final_state = state_from_dn(final_state)
    return (
        jnp.swapaxes(outputs, 0, 1),
        jnp.swapaxes(logits, 0, 1),
        final_state,
    )


def make_streaming_step(params, cfg: NTMConfig, compute_dtype=None):
    """A jittable single-token step for online tracking.

    Replaces the reference's one-sess.run-per-token structure
    (test_tracker.py:284-299) — callers jit this (or the whole-frame scan in
    tracking/tracker.py) so state never leaves the device.
    """

    def step(x, state):
        return ntm_cell_step(params, cfg, x, state, compute_dtype)

    return step


def two_step_inputs(inputs: jax.Array, target: jax.Array) -> jax.Array:
    """Build the legacy two-step present/ask token stream
    (ntm_tracker_new.py:149-182): for each frame t>0 the cell first sees
    (0-switch, frame, 0-target) then (1-switch, 0-frame, 0-target); frame 0
    is a single (0-switch, frame, target) token.

    Args:
      inputs: [B, L, D] per-frame features; target: [B, Dt] frame-0 indicator.
    Returns:
      [B, 2L-1, 1+D+Dt] token stream.
    """
    B, L, D = inputs.shape
    Dt = target.shape[-1]
    zero_switch = jnp.zeros((B, 1))
    one_switch = jnp.ones((B, 1))
    dummy_input = jnp.zeros((B, D))
    dummy_target = jnp.zeros((B, Dt))

    toks = [jnp.concatenate([zero_switch, inputs[:, 0], target], axis=1)]
    for t in range(1, L):
        toks.append(jnp.concatenate([zero_switch, inputs[:, t], dummy_target], axis=1))
        toks.append(jnp.concatenate([one_switch, dummy_input, dummy_target], axis=1))
    return jnp.stack(toks, axis=1)


def init_tracker(rng: jax.Array, cfg: NTMConfig, input_size: int):
    """Convenience: (params, init_state_fn)."""
    params = init_ntm_params(rng, cfg, input_size)
    return params, functools.partial(init_ntm_state, params, cfg)
