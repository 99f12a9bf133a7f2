"""The MemoryCore interface: NTM and DNC behind one functional facade.

The reference's two training entries differ ONLY in the recurrent core
(direct_offset_output.py vs direct_offset_output_with_dnc.py — identical
serialization, loss, harness). Here that is one experiment parameterized by
`TrackerConfig.core` (SURVEY.md §7 stage 6).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from ntm_tracker_tpu.config import TrackerConfig
from ntm_tracker_tpu.models import ntm_cell
from ntm_tracker_tpu.models import ntm_tracker
from ntm_tracker_tpu.models.dnc import dnc as dnc_mod


@dataclasses.dataclass(frozen=True)
class MemoryCore:
    """Functional bundle: params/state constructors + unroll + single step."""

    init_params: Callable[[jax.Array, int], Any]
    init_state: Callable[[Any, int], Any]
    # unroll(params, inputs[B,T,D], state=None) -> (logits[B,T,out], final_state)
    unroll: Callable[..., Tuple[jax.Array, Any]]
    # step(params, x[B,D], state) -> (logit[B,out], state)
    step: Callable[..., Tuple[jax.Array, Any]]
    # state_view(state) -> {"M" [B,N,D], "w" [B,H,N], "read" [B,R,D]}: the
    # memory observables both cores expose for dashboards (the reference's
    # Ms/ws/reads image summaries, main.py:1186-1214)
    state_view: Callable[[Any], dict] = None  # type: ignore[assignment]


def unroll_states(
    core: MemoryCore,
    params: Any,
    inputs: jax.Array,
    state: Any = None,
    stride: int = 1,
    full_logits: bool = False,
) -> Tuple[jax.Array, dict, Any]:
    """Unroll while recording the memory observables every `stride` steps.

    The reference stacks M/w/read for EVERY step into image summaries
    (main.py:1186-1214); at T=1300 that is ~0.4 GB per batch-8 eval, so the
    scan here is chunked: only each chunk's last state is emitted, bounding
    the record to T/stride snapshots.

    Args:
      inputs: [B, T, D]. When stride does not divide T, the trailing
        T % stride steps still advance the state but emit no snapshot.
    Returns:
      (logits — [B, T//stride, out], the logit at each snapshot step, or
       [B, T, out] for every step when full_logits=True (lets a caller
       compute the training loss and the dashboards in ONE unroll),
       views {"M": [B, T//stride, N, D], "w": ..., "read": ...},
       final_state — after all T steps, including the unrecorded tail)
    """
    B, T, _D = inputs.shape
    if not 1 <= stride <= T:
        raise ValueError(f"stride={stride} out of range for T={T}")
    if state is None:
        state = core.init_state(params, B)
    n_chunks, rem = divmod(T, stride)
    xs = jnp.swapaxes(inputs[:, : n_chunks * stride], 0, 1)
    xs = xs.reshape(n_chunks, stride, B, inputs.shape[2])

    def inner(c, x):
        logit, s = core.step(params, x, c)
        return s, logit

    def chunk(carry, x_chunk):
        new_state, logits = jax.lax.scan(inner, carry, x_chunk)
        return new_state, (
            logits if full_logits else logits[-1],
            core.state_view(new_state),
        )

    final_state, (logits, views) = jax.lax.scan(chunk, state, xs)
    if full_logits:
        logits = logits.reshape(n_chunks * stride, *logits.shape[2:])
    if rem:
        tail = jnp.swapaxes(inputs[:, n_chunks * stride :], 0, 1)
        final_state, tail_logits = jax.lax.scan(inner, final_state, tail)
        if full_logits:
            logits = jnp.concatenate([logits, tail_logits], axis=0)
    views = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), views)
    return jnp.swapaxes(logits, 0, 1), views, final_state


def make_core(cfg: TrackerConfig) -> MemoryCore:
    if cfg.core == "ntm":
        ncfg = cfg.ntm

        def init_params(rng, input_size):
            return ntm_cell.init_ntm_params(rng, ncfg, input_size)

        def init_state(params, batch):
            return ntm_cell.init_ntm_state(params, ncfg, batch)

        def unroll(params, inputs, state=None, remat=True):
            # remat=True defers to the config's policy; False stays False
            # (e.g. inference paths that never differentiate)
            policy = cfg.train.remat_policy if remat is True else remat
            _, logits, final = ntm_tracker.ntm_tracker_unroll(
                params, ncfg, inputs, state=state, remat=policy,
                compute_dtype=cfg.compute_dtype,
                unroll=cfg.train.scan_unroll,
                layout=cfg.train.scan_layout,
                fused_bptt=cfg.train.fused_bptt,
            )
            return logits, final

        def step(params, x, state):
            _, logit, new_state = ntm_cell.ntm_cell_step(
                params, ncfg, x, state, compute_dtype=cfg.compute_dtype
            )
            return logit, new_state

        def state_view(state):
            return {"M": state["M"], "w": state["w"], "read": state["read"]}

        return MemoryCore(init_params, init_state, unroll, step, state_view)

    elif cfg.core == "dnc":
        dcfg = cfg.dnc

        def init_params(rng, input_size):
            return dnc_mod.init_dnc_params(rng, dcfg, input_size)

        def init_state(params, batch):
            del params  # DNC initial state is all zeros (dnc/dnc.py:129-134)
            return dnc_mod.init_dnc_state(dcfg, batch)

        def unroll(params, inputs, state=None, remat=True):
            outs, final = dnc_mod.dnc_unroll(
                params, dcfg, inputs, state=state, remat=remat,
                remat_chunk=dcfg.remat_chunk,
            )
            return outs, final

        def step(params, x, state):
            return dnc_mod.dnc_step(params, dcfg, x, state)

        def state_view(state):
            acc = state.access_state
            return {
                "M": acc.memory,
                "w": jnp.concatenate([acc.read_weights, acc.write_weights], axis=1),
                "read": state.access_output,
            }

        return MemoryCore(init_params, init_state, unroll, step, state_view)

    raise ValueError(f"unknown core: {cfg.core!r}")
