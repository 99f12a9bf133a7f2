"""Generate the frozen-seed regression fixtures (tests/fixtures/*.npz).

Run on CPU with f32-highest precision:
    python tests/gen_fixtures.py
Values are the CURRENT implementation's outputs for fixed seeds; the
regression test (test_regression_fixtures.py) fails if any numerical
contract drifts. Regenerate ONLY when a semantics change is intentional,
and say so in the commit message.

These fixtures detect DRIFT only — they are not parity evidence. Parity
against the reference comes from the EXECUTED-TensorFlow goldens
(tests/gen_tf_goldens.py -> tests/test_tf_parity.py), which run the
reference's own code.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def build():
    from ntm_tracker_tpu.config import DNCConfig, NTMConfig
    from ntm_tracker_tpu.models.dnc.dnc import dnc_unroll, init_dnc_params
    from ntm_tracker_tpu.models.ntm_cell import init_ntm_params, init_ntm_state
    from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll
    from ntm_tracker_tpu.train.serialize import offsets_loss, serialize_tokens
    from ntm_tracker_tpu.data import geometry

    out = {}

    # --- NTM forward over a fixed token stream ---------------------------
    ncfg = NTMConfig(output_dim=2, mem_size=32, mem_dim=8,
                     controller_hidden_size=24, controller_num_layers=2,
                     read_head_size=3, write_head_size=1, shift_range=1)
    params = init_ntm_params(jax.random.PRNGKey(1234), ncfg, 12)
    tokens = jax.random.normal(jax.random.PRNGKey(99), (2, 11, 12))
    _, logits, final = ntm_tracker_unroll(params, ncfg, tokens, remat=False)
    out["ntm_logits"] = np.asarray(logits)
    out["ntm_final_M"] = np.asarray(final["M"])
    out["ntm_final_w"] = np.asarray(final["w"])
    out["ntm_final_read"] = np.asarray(final["read"])

    # --- DNC forward -------------------------------------------------------
    dcfg = DNCConfig(output_dim=3, memory_size=16, word_size=6, num_reads=2,
                     num_writes=1, hidden_size=20, clip_value=20.0)
    dparams = init_dnc_params(jax.random.PRNGKey(7), dcfg, 9)
    dx = jax.random.normal(jax.random.PRNGKey(8), (2, 6, 9))
    douts, dfinal = dnc_unroll(dparams, dcfg, dx)
    out["dnc_outputs"] = np.asarray(douts)
    out["dnc_final_memory"] = np.asarray(dfinal.access_state.memory)
    out["dnc_final_usage"] = np.asarray(dfinal.access_state.usage)

    # --- serialization + loss ------------------------------------------------
    feats = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 4, 5))
    gt0 = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(4), (1, 4)))
    toks = serialize_tokens(feats, gt0)
    out["serialized_tokens"] = np.asarray(toks)
    fake_logits = jax.random.normal(jax.random.PRNGKey(5), (1, 15, 2))
    offs = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 2)) * 0.2
    out["offsets_loss"] = np.asarray(offsets_loss(fake_logits, offs, 4))

    # --- geometry ------------------------------------------------------------
    out["gt_first_frame_focus4"] = geometry.generate_gt(
        geometry.initial_transformed_bbox(8, 6), 8, 6, 4
    )
    out["gt_later_frame"] = geometry.generate_gt([0.2, 0.3, 0.7, 0.9], 8, 6)

    return out


if __name__ == "__main__":
    os.makedirs(FIXDIR, exist_ok=True)
    np.savez(os.path.join(FIXDIR, "forward_v1.npz"), **build())
    print("wrote", os.path.join(FIXDIR, "forward_v1.npz"))
