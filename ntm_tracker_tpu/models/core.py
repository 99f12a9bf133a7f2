"""The MemoryCore interface: NTM and DNC behind one functional facade.

The reference's two training entries differ ONLY in the recurrent core
(direct_offset_output.py vs direct_offset_output_with_dnc.py — identical
serialization, loss, harness). Here that is one experiment parameterized by
`TrackerConfig.core` (SURVEY.md §7 stage 6).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

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


def make_core(cfg: TrackerConfig) -> MemoryCore:
    if cfg.core == "ntm":
        ncfg = cfg.ntm

        def init_params(rng, input_size):
            return ntm_cell.init_ntm_params(rng, ncfg, input_size)

        def init_state(params, batch):
            return ntm_cell.init_ntm_state(params, ncfg, batch)

        def unroll(params, inputs, state=None, remat=True):
            _, logits, final = ntm_tracker.ntm_tracker_unroll(
                params, ncfg, inputs, state=state, remat=remat,
                compute_dtype=cfg.compute_dtype,
                unroll=cfg.train.scan_unroll,
            )
            return logits, final

        def step(params, x, state):
            _, logit, new_state = ntm_cell.ntm_cell_step(
                params, ncfg, x, state, compute_dtype=cfg.compute_dtype
            )
            return logit, new_state

        return MemoryCore(init_params, init_state, unroll, step)

    elif cfg.core == "dnc":
        dcfg = cfg.dnc

        def init_params(rng, input_size):
            return dnc_mod.init_dnc_params(rng, dcfg, input_size)

        def init_state(params, batch):
            del params  # DNC initial state is all zeros (dnc/dnc.py:129-134)
            return dnc_mod.init_dnc_state(dcfg, batch)

        def unroll(params, inputs, state=None, remat=True):
            outs, final = dnc_mod.dnc_unroll(params, dcfg, inputs, state=state, remat=remat)
            return outs, final

        def step(params, x, state):
            return dnc_mod.dnc_step(params, dcfg, x, state)

        return MemoryCore(init_params, init_state, unroll, step)

    raise ValueError(f"unknown core: {cfg.core!r}")
