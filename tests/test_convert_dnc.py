"""convert-dnc edge cases (the executed-reference Saver round-trip parity
lives in test_tf_parity.py::test_convert_reference_dnc_checkpoint)."""

import numpy as np
import pytest

from ntm_tracker_tpu.config import DNCConfig
from ntm_tracker_tpu.models.dnc.access import _interface_sizes
from ntm_tracker_tpu.tools.convert_dnc_ckpt import (
    classify_variable,
    convert_dnc_variables,
)


def _cfg(**kw):
    base = dict(output_dim=2, memory_size=16, word_size=6, num_reads=3,
                num_writes=1, hidden_size=14)
    base.update(kw)
    return DNCConfig(**base)


def _fake_ckpt(cfg, rng):
    H = cfg.hidden_size
    ctrl_in = 11 + cfg.num_reads * cfg.word_size + H
    v = {
        "dnc/lstm/w_gates": rng.rand(ctrl_in, 4 * H),
        "dnc/lstm/b_gates": rng.rand(4 * H),
        "dnc/output_linear/w": rng.rand(
            H + cfg.num_reads * cfg.word_size, cfg.output_dim
        ),
        "dnc/output_linear/b": rng.rand(cfg.output_dim),
    }
    for head, size in _interface_sizes(cfg).items():
        v[f"dnc/memory_access/{head}/w"] = rng.rand(H, size)
        v[f"dnc/memory_access/{head}/b"] = rng.rand(size)
    return {k: a.astype(np.float32) for k, a in v.items()}


def test_interface_fused_in_layout_order():
    cfg = _cfg()
    rng = np.random.RandomState(0)
    v = _fake_ckpt(cfg, rng)
    params = convert_dnc_variables(v, cfg)
    off = 0
    for head, size in _interface_sizes(cfg).items():
        np.testing.assert_array_equal(
            params["access"]["interface_w"][:, off : off + size],
            v[f"dnc/memory_access/{head}/w"],
        )
        np.testing.assert_array_equal(
            params["access"]["interface_b"][off : off + size],
            v[f"dnc/memory_access/{head}/b"],
        )
        off += size
    np.testing.assert_array_equal(
        params["controller"][0]["kernel"], v["dnc/lstm/w_gates"]
    )


def test_missing_head_raises():
    cfg = _cfg()
    v = _fake_ckpt(cfg, np.random.RandomState(0))
    del v["dnc/memory_access/free_gate/w"]
    with pytest.raises(ValueError, match="free_gate"):
        convert_dnc_variables(v, cfg)


def test_wrong_hidden_size_raises():
    cfg = _cfg()
    v = _fake_ckpt(cfg, np.random.RandomState(0))
    with pytest.raises(ValueError, match="4\\*hidden"):
        convert_dnc_variables(v, _cfg(hidden_size=20))


def test_duplicate_claim_raises():
    cfg = _cfg()
    v = _fake_ckpt(cfg, np.random.RandomState(0))
    v["other/dnc/lstm/w_gates"] = v["dnc/lstm/w_gates"].copy()
    with pytest.raises(ValueError, match="both"):
        convert_dnc_variables(v, cfg)


def test_optimizer_slots_skipped():
    cfg = _cfg()
    v = _fake_ckpt(cfg, np.random.RandomState(0))
    v["dnc/lstm/w_gates/RMSProp"] = np.zeros((2, 2), np.float32)
    v["global_step"] = np.int64(3)
    convert_dnc_variables(v, cfg)  # no raise


def test_classifier_addresses():
    cfg = _cfg()
    assert classify_variable("rnn/dnc/lstm/w_gates", cfg) == (
        "controller", 0, "kernel")
    assert classify_variable("dnc/memory_access/read_keys/w", cfg) == (
        "interface", "read_keys", "w")
    assert classify_variable("dnc/output_linear/b", cfg) == ("out_b",)
    assert classify_variable("dnc/lstm/w_gates/RMSProp", cfg) is None
    assert classify_variable("dnc/memory_access/not_a_head/w", cfg) is None


def test_cli_parses():
    from ntm_tracker_tpu.cli import build_parser

    a = build_parser().parse_args(["convert-dnc", "--ckpt", "c", "--out", "o.npz"])
    assert a.fn.__name__ == "cmd_convert_dnc"
    a = build_parser().parse_args(
        ["track-vot", "--core", "dnc", "--dnc_npz", "d.npz"]
    )
    assert a.dnc_npz == "d.npz"
