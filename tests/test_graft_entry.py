"""Driver entry points (__graft_entry__.py) must never break silently.

The driver compile-checks entry() single-chip and executes
dryrun_multichip(N) on a virtual mesh every round; a regression there
costs the round its MULTICHIP artifact (round 3 shipped a NameError in the
dryrun tail for several commits before this guard). Execute both here on
the CPU mesh at the smallest sizes.
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402


def test_entry_compiles_and_runs():
    fn, example_args = __graft_entry__.entry()
    loss, offsets = jax.jit(fn)(*example_args)
    assert loss.shape == ()
    assert offsets.ndim == 3 and offsets.shape[-1] == 2
    assert bool(jax.numpy.isfinite(loss))


def test_dryrun_multichip_two_devices(capsys):
    # the REAL driver surface: multi-step mesh training, ckpt resume,
    # multi-host batch assembly, 2-process DP — all asserted inside
    __graft_entry__.dryrun_multichip(2)
    out = capsys.readouterr().out
    assert "OK" in out
