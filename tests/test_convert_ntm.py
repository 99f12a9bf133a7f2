"""convert-ntm edge cases (the executed-reference round-trip parity lives
in test_tf_parity.py::test_convert_reference_checkpoint)."""

import numpy as np
import pytest

from ntm_tracker_tpu.config import NTMConfig
from ntm_tracker_tpu.models.ntm_cell import head_param_sizes
from ntm_tracker_tpu.tools.convert_ntm_ckpt import (
    classify_variable,
    convert_ntm_variables,
)


def _cfg(**kw):
    base = dict(output_dim=2, mem_size=16, mem_dim=8,
                controller_hidden_size=24, controller_num_layers=1,
                read_head_size=2, write_head_size=1)
    base.update(kw)
    return NTMConfig(**base)


def _fake_ckpt(cfg, rng):
    Hc = cfg.controller_hidden_size
    P = sum(head_param_sizes(cfg).values())
    kin = 10 + cfg.read_head_size * cfg.mem_dim + Hc
    v = {
        "ntm-tracker/ntm-cell/addressing/weights": rng.rand(Hc, P),
        "ntm-tracker/ntm-cell/addressing/biases": rng.rand(P),
        "ntm-tracker/ntm-cell/weights": rng.rand(Hc, cfg.output_dim),
        "ntm-tracker/ntm-cell/biases": rng.rand(cfg.output_dim),
        "ntm-tracker/init_state/M": rng.rand(cfg.mem_size, cfg.mem_dim),
        "ntm-tracker/init_state/w": rng.rand(cfg.num_heads, cfg.mem_size),
        "ntm-tracker/init_state/read": rng.rand(cfg.read_head_size, cfg.mem_dim),
        "ntm-tracker/ntm-cell/lstm-controller/cell_0/basic_lstm_cell/kernel":
            rng.rand(kin, 4 * Hc),
        "ntm-tracker/ntm-cell/lstm-controller/cell_0/basic_lstm_cell/bias":
            rng.rand(4 * Hc),
    }
    return {k: a.astype(np.float32) for k, a in v.items()}


def test_optimizer_slots_and_globals_are_skipped():
    cfg = _cfg()
    rng = np.random.RandomState(0)
    v = _fake_ckpt(cfg, rng)
    v["ntm-tracker/ntm-cell/addressing/weights/RMSProp"] = rng.rand(3, 3).astype(np.float32)
    v["ntm-tracker/ntm-cell/addressing/weights/RMSProp_1"] = rng.rand(3, 3).astype(np.float32)
    v["global_step"] = np.int64(1700)
    params = convert_ntm_variables(v, cfg)
    np.testing.assert_array_equal(
        params["heads_w"], v["ntm-tracker/ntm-cell/addressing/weights"]
    )
    assert len(params["controller"]) == 1


def test_wrong_config_shape_raises():
    cfg = _cfg()
    v = _fake_ckpt(cfg, np.random.RandomState(0))
    with pytest.raises(ValueError, match="heads_w"):
        convert_ntm_variables(v, _cfg(controller_hidden_size=32))


def test_missing_variable_raises():
    cfg = _cfg()
    v = _fake_ckpt(cfg, np.random.RandomState(0))
    del v["ntm-tracker/init_state/M"]
    with pytest.raises(ValueError, match="init_M"):
        convert_ntm_variables(v, cfg)


def test_pre_tf11_lstm_names_accepted():
    """2017-era TF named LSTM variables weights/biases; the suffix matcher
    accepts both generations."""
    cfg = _cfg()
    v = _fake_ckpt(cfg, np.random.RandomState(0))
    k = v.pop("ntm-tracker/ntm-cell/lstm-controller/cell_0/basic_lstm_cell/kernel")
    b = v.pop("ntm-tracker/ntm-cell/lstm-controller/cell_0/basic_lstm_cell/bias")
    v["ntm-tracker/ntm-cell/lstm-controller/cell_0/basic_lstm_cell/weights"] = k
    v["ntm-tracker/ntm-cell/lstm-controller/cell_0/basic_lstm_cell/biases"] = b
    params = convert_ntm_variables(v, cfg)
    np.testing.assert_array_equal(params["controller"][0]["kernel"], k)


def test_duplicate_address_claim_raises():
    """Two checkpoint variables mapping to the same pytree address (e.g. an
    unrelated head-shaped '*weights') must fail loudly — last-write-wins
    would silently substitute the real output head."""
    cfg = _cfg()
    rng = np.random.RandomState(0)
    v = _fake_ckpt(cfg, rng)
    v["some-other-scope/weights"] = rng.rand(
        cfg.controller_hidden_size, cfg.output_dim
    ).astype(np.float32)
    with pytest.raises(ValueError, match="both"):
        convert_ntm_variables(v, cfg)


def test_classifier_addresses():
    cfg = _cfg(controller_num_layers=2)
    assert classify_variable("a/ntm-cell/addressing/weights", (24, 1), cfg) == ("heads_w",)
    assert classify_variable(
        "a/lstm-controller/cell_1/basic_lstm_cell/kernel", (48, 96), cfg
    ) == ("controller", 1, "kernel")
    assert classify_variable("a/init_state/read", (2, 8), cfg) == ("init_read",)
    # optimizer slot names do not match any suffix
    assert classify_variable("a/addressing/weights/RMSProp", (24, 1), cfg) is None


def test_cli_parses():
    from ntm_tracker_tpu.cli import build_parser

    a = build_parser().parse_args(["convert-ntm", "--ckpt", "c", "--out", "o.npz"])
    assert a.fn.__name__ == "cmd_convert_ntm"
    b = build_parser().parse_args(["track-vot", "--ntm_npz", "o.npz"])
    assert b.ntm_npz == "o.npz"
