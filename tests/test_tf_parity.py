"""Executed-TensorFlow parity: the 1e-4 fidelity target, proven against
fixtures produced by RUNNING the reference's own code and the TF library ops
it depends on (tests/gen_tf_goldens.py).

Fixture provenance (committed .npz, regenerable with TF + /root/reference):
  tf_goldens_ops.npz          — reference ops.py:135-242 executed in a TF
                                session (across-slot cosine quirk, Py2 shift
                                offsets), tf.image.crop_and_resize, TF1
                                resize_images, tf.raw_ops.LSTMBlockCell gate
                                math, RMSPropOptimizer+clip trajectories
  tf_goldens_cell.npz         — reference ntm_cell.py executed 65 steps
                                through its state_placeholder streaming
                                contract (ntm_cell.py:255-282) at the
                                flagship config (128x20, 4r+1w, hidden 200)
  tf_goldens_cell_variant.npz — write_first=True, shift_range=2, 2 write
                                heads, 2 controller layers
  tf_goldens_tracker_*.npz    — the NTMTracker wrapper executed end-to-end
                                (zero_state + inline token construction;
                                plain and two-step present/ask modes)
  tf_goldens_legacy*.npz      — the reference's LEGACY ntm.py model
                                executed end-to-end (two configs)
  tf_goldens_preprocess.npz   — the reference's old_process_sequence
                                executed on the synthetic VID tree: every
                                output .txt/.bin byte-for-byte
                                (tests/gen_preprocess_golden.py)
  tf_goldens_dnc_core.npz     — the reference's FULL DNC core (dnc/dnc.py:
                                LSTM controller + MemoryAccess + output
                                linear, clip_value wiring) executed 4 steps
                                with all 24 variables injected
  tf_goldens_ckpt_convert.npz — a real tf.train.Saver round trip of the
                                reference training graph + its executed
                                rollout (the convert-ntm oracle)
  (tf_goldens_ops.npz also holds the reference's dnc/addressing.py outputs,
  executed under a minimal sonnet stub — cosine/linkage/usage/allocation)

This file needs only numpy + jax: a shared misreading of the reference
cannot pass here, because the oracle side actually ran the reference.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")

TOL = 1e-4  # the BASELINE.json north-star bound


def _load(name):
    path = os.path.join(FIXTURE_DIR, name)
    return np.load(path)


@pytest.fixture(scope="module")
def ops_g():
    return _load("tf_goldens_ops.npz")


class TestOpsGoldens:
    def test_across_slot_cosine_quirk(self, ops_g):
        """ops.py:135-158 as executed: memory rows l2-normalized ACROSS
        slots, keys across mem_dim."""
        from ntm_tracker_tpu.ops.memory import batched_smooth_cosine_similarity

        got = batched_smooth_cosine_similarity(
            jnp.asarray(ops_g["ops_cos_memory"]), jnp.asarray(ops_g["ops_cos_keys"])
        )
        np.testing.assert_allclose(got, ops_g["ops_cos_out"], atol=1e-5)

    @pytest.mark.parametrize("S", [3, 5])
    def test_circular_convolution_py2_offsets(self, ops_g, S):
        """ops.py:180-242 as executed: Py2 floor division start offsets
        ({-2,-1,0} for S=3, {-3..1} for S=5)."""
        from ntm_tracker_tpu.ops.memory import batched_circular_convolution

        got = batched_circular_convolution(
            jnp.asarray(ops_g[f"ops_conv{S}_tensor"]),
            jnp.asarray(ops_g[f"ops_conv{S}_kernel"]),
        )
        np.testing.assert_allclose(got, ops_g[f"ops_conv{S}_out"], atol=1e-5)

    @pytest.mark.parametrize("hw", [(14, 14), (7, 9)])
    def test_crop_and_resize(self, ops_g, hw):
        from ntm_tracker_tpu.data.image_ops import crop_and_resize

        got = crop_and_resize(
            jnp.asarray(ops_g["car_images"]), jnp.asarray(ops_g["car_boxes"]), hw
        )
        np.testing.assert_allclose(
            got, ops_g[f"car_out_{hw[0]}x{hw[1]}"], atol=1e-3, rtol=1e-5
        )

    @pytest.mark.parametrize("which,out_hw", [("up", (24, 30)), ("down", (9, 11))])
    def test_tf1_resize_bilinear(self, ops_g, which, out_hw):
        from ntm_tracker_tpu.data.image_ops import tf1_resize_bilinear

        got = tf1_resize_bilinear(jnp.asarray(ops_g["resize_src"]), out_hw)
        np.testing.assert_allclose(
            got, ops_g[f"resize_{which}"], atol=1e-3, rtol=1e-5
        )

    def test_lstm_gate_math(self, ops_g):
        """Gate math vs TF's own C++ LSTM kernel (tf.raw_ops.LSTMBlockCell,
        forget_bias=0, BasicLSTMCell-compatible i,j,f,o layout)."""
        from ntm_tracker_tpu.ops.lstm import lstm_cell_step

        params = {
            "kernel": jnp.asarray(ops_g["lstm_kernel"]),
            "bias": jnp.asarray(ops_g["lstm_bias"]),
        }
        h, (new_c, new_h) = lstm_cell_step(
            params,
            jnp.asarray(ops_g["lstm_x"]),
            (jnp.asarray(ops_g["lstm_c"]), jnp.asarray(ops_g["lstm_h"])),
            forget_bias=0.0,
        )
        np.testing.assert_allclose(new_c, ops_g["lstm_new_c"], atol=1e-6)
        np.testing.assert_allclose(new_h, ops_g["lstm_new_h"], atol=1e-6)

    def test_vgg_conv43_stack(self, ops_g):
        """conv1..conv4_3 on seeded weights vs TF's executed conv/pool
        kernels (slim vgg_16 architecture, reference vgg.py:125-150)."""
        from fixture_params import seeded_vgg_image, seeded_vgg_params

        from ntm_tracker_tpu.models.vgg import VGG16_PREFIX, vgg16_features

        params = {
            k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
            for k, v in seeded_vgg_params(VGG16_PREFIX).items()
        }
        got = vgg16_features(params, jnp.asarray(seeded_vgg_image()))
        ref = ops_g["vgg_conv43"]
        assert got.shape == ref.shape
        scale = float(np.abs(ref).max())
        np.testing.assert_allclose(got, ref, atol=max(1e-4, 1e-6 * scale))

    def test_rmsprop_clip_trajectory(self, ops_g):
        """6 steps of clip_by_global_norm(5) -> RMSProp(0.01,.95,.9) vs the
        executed tf.train.RMSPropOptimizer (direct_offset_output.py:611-626;
        TF default epsilon 1e-10)."""
        from ntm_tracker_tpu.train.optim import reference_optimizer

        params = {"a": jnp.asarray(ops_g["rms_a0"]), "b": jnp.asarray(ops_g["rms_b0"])}
        targets = {"a": jnp.asarray(ops_g["rms_ta"]), "b": jnp.asarray(ops_g["rms_tb"])}
        opt = reference_optimizer(
            learning_rate=0.01, decay=0.95, momentum=0.9, epsilon=1e-10,
            max_gradient_norm=5.0,
        )
        state = opt.init(params)
        for step in range(ops_g["rms_traj_a"].shape[0]):
            # loss = 4 * (l2_loss(a-ta) + l2_loss(b-tb)); grad = 4 * (p - t)
            grads = jax.tree.map(lambda p, t: 4.0 * (p - t), params, targets)
            updates, state = opt.update(grads, state)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            np.testing.assert_allclose(
                params["a"], ops_g["rms_traj_a"][step], atol=1e-5,
                err_msg=f"step {step}",
            )
            np.testing.assert_allclose(
                params["b"], ops_g["rms_traj_b"][step], atol=1e-5,
                err_msg=f"step {step}",
            )


# ---------------------------------------------------------------------------
# the executed reference NTMCell rollouts
# ---------------------------------------------------------------------------

def _unpack_cell_fixture(g):
    from ntm_tracker_tpu.config import NTMConfig

    (batch, steps, input_size, mem_size, mem_dim, shift_range, hidden,
     num_layers, read_heads, write_heads, write_first) = [
        int(x) for x in g["config"]
    ]
    cfg = NTMConfig(
        output_dim=2, mem_size=mem_size, mem_dim=mem_dim,
        shift_range=shift_range, controller_hidden_size=hidden,
        controller_num_layers=num_layers, read_head_size=read_heads,
        write_head_size=write_heads, write_first=bool(write_first),
        slotwise_cosine=False,
    )
    params = {
        "controller": [
            {
                "kernel": jnp.asarray(g[f"param_ctrl_kernel_{layer}"]),
                "bias": jnp.asarray(g[f"param_ctrl_bias_{layer}"]),
            }
            for layer in range(num_layers)
        ],
        "heads_w": jnp.asarray(g["param_heads_w"]),
        "heads_b": jnp.asarray(g["param_heads_b"]),
        "out_w": jnp.asarray(g["param_out_w"]),
        "out_b": jnp.asarray(g["param_out_b"]),
        "init_M": jnp.asarray(g["param_init_M"]),
        "init_w": jnp.asarray(g["param_init_w"]),
        "init_read": jnp.asarray(g["param_init_read"]),
    }
    return cfg, params, batch, steps


def _flat_controller_state(state):
    """Mirror MultiRNNCell(state_is_tuple=False): concat [c|h] per layer."""
    return jnp.concatenate([jnp.concatenate([c, h], 1) for c, h in state], 1)


@pytest.mark.parametrize(
    "fixture", ["tf_goldens_cell.npz", "tf_goldens_cell_variant.npz"]
)
class TestExecutedReferenceCell:
    def test_streaming_rollout_matches_tf(self, fixture):
        """Feed the token stream one step at a time through
        make_streaming_step (the state_placeholder contract) and compare
        every logit plus checkpointed full states against the executed
        reference."""
        from ntm_tracker_tpu.models.ntm_cell import init_ntm_state
        from ntm_tracker_tpu.models.ntm_tracker import make_streaming_step

        g = _load(fixture)
        cfg, params, batch, steps = _unpack_cell_fixture(g)
        step = jax.jit(make_streaming_step(params, cfg))
        state = init_ntm_state(params, cfg, batch)
        ckpt_at = [int(x) for x in g["ckpt_steps"]]
        worst = 0.0
        for t in range(steps):
            _out, logit, state = step(jnp.asarray(g["inputs"][t]), state)
            diff = float(np.max(np.abs(np.asarray(logit) - g["logits"][t])))
            worst = max(worst, diff)
            assert diff <= TOL, f"step {t}: logit diff {diff:.2e} > {TOL}"
            if t in ckpt_at:
                i = ckpt_at.index(t)
                np.testing.assert_allclose(
                    state["M"], g[f"state{i}_M"], atol=TOL, err_msg=f"M step {t}"
                )
                np.testing.assert_allclose(
                    state["w"], g[f"state{i}_w"], atol=TOL, err_msg=f"w step {t}"
                )
                np.testing.assert_allclose(
                    state["read"], g[f"state{i}_read"], atol=TOL,
                    err_msg=f"read step {t}",
                )
                np.testing.assert_allclose(
                    _flat_controller_state(state["controller_state"]),
                    g[f"state{i}_controller_state"], atol=TOL,
                    err_msg=f"controller step {t}",
                )
        # the rollouts should be far inside the target bound
        assert worst < TOL / 2, f"worst logit diff {worst:.2e}"

    def test_scan_rollout_matches_tf(self, fixture):
        """The batched lax.scan path (training) must hit the same goldens."""
        from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll

        g = _load(fixture)
        cfg, params, _batch, _steps = _unpack_cell_fixture(g)
        inputs = jnp.swapaxes(jnp.asarray(g["inputs"]), 0, 1)  # [B,T,D]
        _outs, logits, _state = jax.jit(
            lambda p, x: ntm_tracker_unroll(p, cfg, x)
        )(params, inputs)
        got = np.swapaxes(np.asarray(logits), 0, 1)  # [T,B,out]
        np.testing.assert_allclose(got, g["logits"], atol=TOL)

    def test_first_step_intermediates(self, fixture):
        """Pin the addressing chain at step 0 against the reference's debug
        dict (similarity -> content focus -> gate -> shift -> sharpen)."""
        from ntm_tracker_tpu.models.ntm_cell import init_ntm_state, ntm_cell_step

        g = _load(fixture)
        cfg, params, batch, _steps = _unpack_cell_fixture(g)
        state = init_ntm_state(params, cfg, batch)
        _o, _l, _s, debug = ntm_cell_step(
            params, cfg, jnp.asarray(g["inputs"][0]), state, with_debug=True
        )
        for key in ("similarity", "w_content_focused", "w_gated", "w_conv", "w"):
            np.testing.assert_allclose(
                debug[key], g["dbg0_" + key], atol=1e-5, err_msg=key
            )


@pytest.mark.parametrize(
    "fixture", ["tf_goldens_legacy.npz", "tf_goldens_legacy_variant.npz"]
)
class TestExecutedLegacyNTM:
    """models/legacy_ntm.py vs the EXECUTED reference ntm.py — the dead
    legacy model (SURVEY §2 row 3), now rebuilt and pinned to its actually-
    run graph (per-gate LSTM, separate head linears, +1e-3 cosine,
    symmetric shifts, epsilon-free sharpen, Linear-bias initial state)."""

    def _params(self, g, cfg):
        gates = ("input", "forget", "output", "update")
        controller = [
            {gg: {"w": jnp.asarray(g[f"param_ctrl_{layer}_{gg}_w"]),
                  "b": jnp.asarray(g[f"param_ctrl_{layer}_{gg}_b"])}
             for gg in gates}
            for layer in range(cfg.controller_layer_size)
        ]

        def head(prefix, is_write):
            parts = ["k", "g", "sw", "beta", "gamma"] + (
                ["erase", "add"] if is_write else []
            )
            return {
                f"{part}_{s}": jnp.asarray(g[f"param_{prefix}_{part}_{s}"])
                for part in parts for s in ("w", "b")
            }

        return {
            "controller": controller,
            "read_heads": [head(f"read{r}", False)
                           for r in range(cfg.read_head_size)],
            "write_heads": [head(f"write{w}", True)
                            for w in range(cfg.write_head_size)],
            "out_w": jnp.asarray(g["param_out_w"]),
            "out_b": jnp.asarray(g["param_out_b"]),
            "init": {
                "M": jnp.asarray(g["param_init_M"]),
                "read_w": jnp.asarray(g["param_init_read_w"]),
                "read": jnp.asarray(g["param_init_read"]),
                "write_w": jnp.asarray(g["param_init_write_w"]),
                "output": jnp.asarray(g["param_init_output"]),
                "hidden": jnp.asarray(g["param_init_hidden"]),
            },
        }

    def test_rollout_matches_executed_reference(self, fixture):
        from ntm_tracker_tpu.models.legacy_ntm import (
            LegacyNTMConfig,
            legacy_ntm_unroll,
        )

        g = _load(fixture)
        (steps, input_size, num_features, mem_size, mem_dim, shift_range,
         controller_dim, layers, read_heads, write_heads) = [
            int(x) for x in g["config"]
        ]
        cfg = LegacyNTMConfig(
            num_features=num_features, mem_size=mem_size, mem_dim=mem_dim,
            shift_range=shift_range, controller_dim=controller_dim,
            controller_layer_size=layers, write_head_size=write_heads,
            read_head_size=read_heads,
        )
        params = self._params(g, cfg)
        outs, logits, final = jax.jit(
            lambda p: legacy_ntm_unroll(
                p, cfg, jnp.asarray(g["inputs"]), jnp.asarray(g["target"])
            )
        )(params)
        np.testing.assert_allclose(np.asarray(logits), g["logits"], atol=TOL)
        np.testing.assert_allclose(np.asarray(outs), g["outputs"], atol=TOL)
        np.testing.assert_allclose(final["M"], g["final_M"], atol=TOL)
        np.testing.assert_allclose(final["read_w"], g["final_read_w"], atol=TOL)
        np.testing.assert_allclose(final["write_w"], g["final_write_w"], atol=TOL)
        np.testing.assert_allclose(final["read"], g["final_read"], atol=TOL)
        np.testing.assert_allclose(final["output"], g["final_output"], atol=TOL)
        np.testing.assert_allclose(final["hidden"], g["final_hidden"], atol=TOL)


@pytest.mark.parametrize("mode", ["plain", "twostep"])
def test_tracker_wrapper_matches_executed_reference(mode):
    """The tracker WRAPPER contract vs the executed ntm_tracker_new.
    NTMTracker: zero_state initial state + inline token construction —
    [frame|indicator] tokens ('plain') or the two-step present/ask stream
    (two_step_inputs, ntm_tracker_new.py:149-182)."""
    from ntm_tracker_tpu.config import NTMConfig
    from ntm_tracker_tpu.models.ntm_cell import init_ntm_state
    from ntm_tracker_tpu.models.ntm_tracker import (
        ntm_tracker_unroll,
        two_step_inputs,
    )

    g = _load(f"tf_goldens_tracker_{mode}.npz")
    (two_step, batch, frames, input_size, target_size, mem_size, mem_dim,
     hidden, read_heads) = [int(x) for x in g["config"]]
    cfg = NTMConfig(
        output_dim=2, mem_size=mem_size, mem_dim=mem_dim, shift_range=1,
        controller_hidden_size=hidden, controller_num_layers=1,
        read_head_size=read_heads, write_head_size=1,
    )
    params = {
        "controller": [{"kernel": jnp.asarray(g["param_ctrl_kernel_0"]),
                        "bias": jnp.asarray(g["param_ctrl_bias_0"])}],
        "heads_w": jnp.asarray(g["param_heads_w"]),
        "heads_b": jnp.asarray(g["param_heads_b"]),
        "out_w": jnp.asarray(g["param_out_w"]),
        "out_b": jnp.asarray(g["param_out_b"]),
        "init_M": jnp.asarray(g["param_init_M"]),
        "init_w": jnp.asarray(g["param_init_w"]),
        "init_read": jnp.asarray(g["param_init_read"]),
    }
    inputs = jnp.asarray(g["inputs"])      # [B, L, D]
    target = jnp.asarray(g["target"])      # [B, Dt]
    if two_step:
        tokens = two_step_inputs(inputs, target)
        # the reference emits 1 + 2*(L-1) outputs
        assert tokens.shape[1] == 1 + 2 * (frames - 1)
    else:
        B, L, _D = inputs.shape
        indicator = jnp.concatenate(
            [target[:, None, :], jnp.zeros((B, L - 1, target.shape[-1]))], 1
        )
        tokens = jnp.concatenate([inputs, indicator], axis=2)
    state = init_ntm_state(params, cfg, batch)
    outs, logits, _final = ntm_tracker_unroll(
        params, cfg, tokens, state=state, remat=False
    )
    np.testing.assert_allclose(np.asarray(logits), g["logits"], atol=TOL)
    np.testing.assert_allclose(np.asarray(outs), g["outputs"], atol=TOL)


class TestExecutedDNCAddressing:
    """models/dnc/addressing.py vs the reference's dnc/addressing.py
    EXECUTED under a minimal sonnet stub (the modules create no variables):
    1e-6-epsilon cosine, temporal linkage + directional reads,
    stop-gradient usage, sorted allocation with simulated inter-head usage."""

    def test_cosine_weights(self, ops_g):
        from ntm_tracker_tpu.models.dnc.addressing import cosine_weights

        got = cosine_weights(
            jnp.asarray(ops_g["dnc_memory"]), jnp.asarray(ops_g["dnc_keys"]),
            jnp.asarray(ops_g["dnc_strengths"]),
        )
        np.testing.assert_allclose(got, ops_g["dnc_cw"], atol=1e-6)

    def test_temporal_linkage_and_directional_reads(self, ops_g):
        from ntm_tracker_tpu.models.dnc.addressing import (
            TemporalLinkageState,
            directional_read_weights,
            temporal_linkage_update,
        )

        next_state = temporal_linkage_update(
            jnp.asarray(ops_g["dnc_write_w"]),
            TemporalLinkageState(
                link=jnp.asarray(ops_g["dnc_prev_link"]),
                precedence_weights=jnp.asarray(ops_g["dnc_prev_prec"]),
            ),
        )
        np.testing.assert_allclose(next_state.link, ops_g["dnc_link"], atol=1e-6)
        np.testing.assert_allclose(
            next_state.precedence_weights, ops_g["dnc_prec"], atol=1e-6
        )
        read_w = jnp.asarray(ops_g["dnc_read_w"])
        fwd = directional_read_weights(next_state.link, read_w, forward=True)
        bwd = directional_read_weights(next_state.link, read_w, forward=False)
        np.testing.assert_allclose(fwd, ops_g["dnc_fwd"], atol=1e-6)
        np.testing.assert_allclose(bwd, ops_g["dnc_bwd"], atol=1e-6)

    def test_usage_and_allocation(self, ops_g):
        from ntm_tracker_tpu.models.dnc.addressing import (
            usage_update,
            write_allocation_weights,
        )

        usage = usage_update(
            jnp.asarray(ops_g["dnc_write_w"]), jnp.asarray(ops_g["dnc_free_gate"]),
            jnp.asarray(ops_g["dnc_read_w"]), jnp.asarray(ops_g["dnc_prev_usage"]),
        )
        np.testing.assert_allclose(usage, ops_g["dnc_usage"], atol=1e-6)
        alloc = write_allocation_weights(
            jnp.asarray(ops_g["dnc_prev_usage"]),
            jnp.asarray(ops_g["dnc_write_gates"]), num_writes=2,
        )
        np.testing.assert_allclose(alloc, ops_g["dnc_alloc"], atol=1e-6)


def test_dnc_memory_access_matches_executed_reference(ops_g):
    """The FULL MemoryAccess subsystem vs the executed dnc/access.py
    (stubbed-sonnet run): 3 sequential steps from the zero state, ten
    interface linears injected; read words and the entire final AccessState
    must match."""
    from ntm_tracker_tpu.config import DNCConfig
    from ntm_tracker_tpu.models.dnc.access import (
        _interface_sizes,
        init_access_state,
        memory_access_step,
    )

    B, N, W, R, Wh, IN, T = [int(x) for x in ops_g["dncacc_config"]]
    cfg = DNCConfig(memory_size=N, word_size=W, num_reads=R, num_writes=Wh)
    # fuse the reference's ten linears into the single interface matmul,
    # column blocks in _interface_sizes order
    ws, bs = [], []
    for name in _interface_sizes(cfg):
        ws.append(np.asarray(ops_g[f"dncacc_{name}_w"]))
        bs.append(np.asarray(ops_g[f"dncacc_{name}_b"]))
    params = {
        "interface_w": jnp.asarray(np.concatenate(ws, axis=1)),
        "interface_b": jnp.asarray(np.concatenate(bs)),
    }
    state = init_access_state(cfg, B)
    reads = []
    for t in range(T):
        read_words, state = jax.jit(memory_access_step, static_argnums=1)(
            params, cfg, jnp.asarray(ops_g["dncacc_inputs"][t]), state
        )
        reads.append(np.asarray(read_words))
    np.testing.assert_allclose(np.stack(reads), ops_g["dncacc_reads"], atol=1e-5)
    np.testing.assert_allclose(
        state.memory, ops_g["dncacc_final_memory"], atol=1e-5
    )
    np.testing.assert_allclose(
        state.read_weights, ops_g["dncacc_final_read_weights"], atol=1e-5
    )
    np.testing.assert_allclose(
        state.write_weights, ops_g["dncacc_final_write_weights"], atol=1e-5
    )
    np.testing.assert_allclose(
        state.linkage.link, ops_g["dncacc_final_link"], atol=1e-5
    )
    np.testing.assert_allclose(
        state.linkage.precedence_weights, ops_g["dncacc_final_precedence"],
        atol=1e-5,
    )
    np.testing.assert_allclose(state.usage, ops_g["dncacc_final_usage"], atol=1e-5)


def test_gen_sequences_vs_executed_reference():
    """mining.gen_sequences vs the reference's EXECUTED sequence_generator.
    gen_sequences on the same seeded statistics. The two must agree exactly
    EXCEPT for the reference's final-buffer bug (sequence_generator.py:
    76-154 never flushes the trailing viable run after the loop; this
    implementation keeps it — documented in PARITY row 25)."""
    import pickle

    from fixture_params import seeded_mining_stats

    from ntm_tracker_tpu.data.mining import gen_sequences

    with open(os.path.join(FIXTURE_DIR, "ref_gen_sequences.pkl"), "rb") as f:
        ref = pickle.load(f)
    mine = gen_sequences(seeded_mining_stats(), 0.5)

    def normalize(seqs):
        out = []
        for seq_dir, obj, sid, length, frames in seqs:
            out.append(
                (
                    seq_dir, obj, int(sid), int(length),
                    [
                        (path, tuple(float(v) for v in size),
                         tuple(map(tuple, np.asarray(bbox, float))),
                         [np.asarray(g, bool).tolist() for g in gts])
                        for path, size, bbox, gts in frames
                    ],
                )
            )
        return out

    mine_n, ref_n = normalize(mine), normalize(ref)
    # the final trailing run exists in our output...
    assert len(mine_n) == len(ref_n) + 1
    # ...and everything the reference DID produce matches exactly
    assert mine_n[:-1] == ref_n
    # the flushed subsequence is a real viable run, not an artifact
    last = mine_n[-1]
    assert last[3] == len(last[4]) > 0


def test_offline_preprocess_matches_executed_reference(tmp_path):
    """The full offline preprocessor vs the reference's EXECUTED
    old_process_sequence (preprocess.py:255-350) on the synthetic VID tree
    (tests/synthetic_vid.py): identical gating decisions (which frames of
    which tracks get written) and BYTE-identical .txt/.bin files — cropbox,
    transformed bbox, offsets, float64 Gaussian heatmaps, and the exact
    text formatting of the on-disk contract.

    Fixture: tf_goldens_preprocess.npz (tests/gen_preprocess_golden.py,
    which executes the reference with FLAGS.focus under Py2 int-division
    semantics and self-checks this same comparison at generation time)."""
    from synthetic_vid import write_synthetic_vid

    from ntm_tracker_tpu.config import DataConfig
    from ntm_tracker_tpu.data.preprocess import PreprocessJob, run_preprocess

    g = _load("tf_goldens_preprocess.npz")
    ref_files = {
        str(p): g[f"data_{i}"].tobytes() for i, p in enumerate(g["paths"])
    }

    anno_dir, _ = write_synthetic_vid(str(tmp_path / "in"))
    out = tmp_path / "out"
    out.mkdir()
    run_preprocess(
        PreprocessJob(anno_dir, "/data/ILSVRC2015/Data", str(out), DataConfig()),
        num_workers=1,
    )
    ours = {}
    for dirpath, _dirs, files in os.walk(out):
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                ours[os.path.relpath(p, out)] = fh.read()

    # same set of files = identical legality gating (deform/zoom/bounds)
    assert set(ours) == set(ref_files)
    for p in sorted(ref_files):
        assert ours[p] == ref_files[p], f"byte mismatch in {p}"


def test_dnc_core_matches_executed_reference():
    """The FULL DNC core vs the executed dnc/dnc.py (stubbed-sonnet run,
    incl. an snt.LSTM stub with sonnet-v1 gate math): 4 sequential steps
    from the reference's own initial_state with ALL 24 variables injected.
    Covers the read-word concat wiring (:106-107,118), the clip_value
    clamping of controller output/state and core output (:78-82,112-113),
    and the output linear — on top of the already-verified MemoryAccess."""
    from ntm_tracker_tpu.config import DNCConfig
    from ntm_tracker_tpu.models.dnc.access import _interface_sizes
    from ntm_tracker_tpu.models.dnc.dnc import dnc_step, init_dnc_state

    g = _load("tf_goldens_dnc_core.npz")
    B, N, W, R, Wh, IN, HID, OUT, T = [int(x) for x in g["dnccore_config"]]
    cfg = DNCConfig(
        memory_size=N, word_size=W, num_reads=R, num_writes=Wh,
        hidden_size=HID, output_dim=OUT,
        clip_value=float(g["dnccore_clip"]),
    )

    def v(name):
        return jnp.asarray(g[f"dnccore_var_{name}"])

    ws = [np.asarray(v(f"{n}__w")) for n in _interface_sizes(cfg)]
    bs = [np.asarray(v(f"{n}__b")) for n in _interface_sizes(cfg)]
    params = {
        "controller": [{"kernel": v("lstm__w_gates"), "bias": v("lstm__b_gates")}],
        "access": {
            "interface_w": jnp.asarray(np.concatenate(ws, axis=1)),
            "interface_b": jnp.asarray(np.concatenate(bs)),
        },
        "out_w": v("output_linear__w"),
        "out_b": v("output_linear__b"),
    }
    state = init_dnc_state(cfg, B)
    outs = []
    for t in range(T):
        out_t, state = jax.jit(dnc_step, static_argnums=1)(
            params, cfg, jnp.asarray(g["dnccore_inputs"][t]), state
        )
        outs.append(np.asarray(out_t))
    np.testing.assert_allclose(np.stack(outs), g["dnccore_outputs"], atol=1e-5)
    np.testing.assert_allclose(
        state.access_output, g["dnccore_final_access_output"], atol=1e-5
    )
    np.testing.assert_allclose(
        state.access_state.memory, g["dnccore_final_memory"], atol=1e-5
    )
    np.testing.assert_allclose(
        state.access_state.usage, g["dnccore_final_usage"], atol=1e-5
    )
    np.testing.assert_allclose(
        state.access_state.linkage.link, g["dnccore_final_link"], atol=1e-5
    )
    # our LSTM state is (c, h); the golden's is (hidden, cell)
    c, h = state.controller_state[0]
    np.testing.assert_allclose(h, g["dnccore_final_ctrl_hidden"], atol=1e-5)
    np.testing.assert_allclose(c, g["dnccore_final_ctrl_cell"], atol=1e-5)


def test_convert_reference_checkpoint():
    """tools/convert_ntm_ckpt vs a REAL tf.train.Saver round trip of the
    executed reference cell under the training graph's scoping
    ('ntm-tracker'/'ntm-cell'/'lstm-controller'/'init_state',
    direct_offset_output.py:529-543): convert the checkpoint variables and
    reproduce the reference's 12-step rollout from its own learnable
    zero_state at <=1e-4 — a reference-trained tracker can be served here
    without retraining."""
    from ntm_tracker_tpu.config import NTMConfig
    from ntm_tracker_tpu.models.ntm_cell import init_ntm_state
    from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll
    from ntm_tracker_tpu.tools.convert_ntm_ckpt import (
        convert_ntm_variables,
        load_params_npz,
        save_params_npz,
    )

    g = _load("tf_goldens_ckpt_convert.npz")
    B, steps, IN, N, D, Hc, L, R, W = [int(x) for x in g["ckptcv_config"]]
    cfg = NTMConfig(
        output_dim=2, mem_size=N, mem_dim=D, controller_hidden_size=Hc,
        controller_num_layers=L, read_head_size=R, write_head_size=W,
    )
    variables = {
        str(name): g[f"ckptcv_var_{i}"]
        for i, name in enumerate(g["ckptcv_names"])
    }
    params = convert_ntm_variables(variables, cfg)

    # npz round trip preserves everything (the TF-free serving path)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        save_params_npz(f.name, params)
        params = load_params_npz(f.name)

    tokens = jnp.asarray(g["ckptcv_inputs"]).swapaxes(0, 1)  # [B, T, IN]
    state = init_ntm_state(params, cfg, B)
    _, logits, _ = ntm_tracker_unroll(params, cfg, tokens, state=state,
                                      remat=False)
    ref = np.asarray(g["ckptcv_logits"]).swapaxes(0, 1)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=TOL)
    worst = float(np.abs(np.asarray(logits) - ref).max())
    assert worst <= TOL, worst


@pytest.mark.parametrize("time_average", [False, True])
@pytest.mark.parametrize("log_prob_in_bits", [False, True])
def test_repeat_copy_cost_matches_executed_reference(
    ops_g, time_average, log_prob_in_bits
):
    """masked_sigmoid_cross_entropy vs the reference's EXECUTED cost
    (dnc/repeat_copy.py:29-66), all four variants on the same seeded
    time-major logits/targets/mask."""
    from ntm_tracker_tpu.models.dnc.repeat_copy import (
        masked_sigmoid_cross_entropy,
    )

    got = masked_sigmoid_cross_entropy(
        jnp.asarray(ops_g["rccost_logits"]),
        jnp.asarray(ops_g["rccost_target"]),
        jnp.asarray(ops_g["rccost_mask"]),
        time_average=time_average,
        log_prob_in_bits=log_prob_in_bits,
    )
    ref = float(ops_g[f"rccost_ta{int(time_average)}_bits{int(log_prob_in_bits)}"])
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


# ---------------------------------------------------------------------------
# the FULL streaming tracker loop vs the executed reference
# (tests/gen_tracker_loop_golden.py ran test_tracker.NTMTracker itself)
# ---------------------------------------------------------------------------

def run_repo_tracker_loop():
    """Drive this repo's StreamingTracker (delimiter_first=True — the
    reference's streaming protocol, test_tracker.py:400-404) over the seeded
    synthetic video with the seeded VGG + cell weights; returns the same
    trajectory records the golden generator captured from the reference.
    Shared with gen_tracker_loop_golden.py's generation-time self-check."""
    from tests.fixture_params import (
        TRACKER_LOOP_CONFIG,
        TRACKER_LOOP_REGION0,
        seeded_loop_cell_params,
        seeded_loop_video,
        seeded_vgg_params,
    )
    from ntm_tracker_tpu.config import NTMConfig, TrackerConfig
    from ntm_tracker_tpu.models.vgg import VGG16_PREFIX
    from ntm_tracker_tpu.tracking.tracker import StreamingTracker

    c = TRACKER_LOOP_CONFIG
    cfg = TrackerConfig(
        core="ntm",
        ntm=NTMConfig(
            mem_size=c["mem_size"], mem_dim=c["mem_dim"],
            shift_range=c["shift_range"],
            controller_hidden_size=c["hidden"],
            controller_num_layers=c["num_layers"],
            read_head_size=c["read_heads"],
            write_head_size=c["write_heads"],
        ),
    )
    vgg = {
        name: {"weights": jnp.asarray(p["weights"]),
               "biases": jnp.asarray(p["biases"])}
        for name, p in seeded_vgg_params(VGG16_PREFIX).items()
    }
    sp = seeded_loop_cell_params()
    params = {
        "controller": [
            {"kernel": jnp.asarray(sp[f"ctrl_kernel_{layer}"]),
             "bias": jnp.asarray(sp[f"ctrl_bias_{layer}"])}
            for layer in range(c["num_layers"])
        ],
        "heads_w": jnp.asarray(sp["heads_w"]),
        "heads_b": jnp.asarray(sp["heads_b"]),
        "out_w": jnp.asarray(sp["out_w"]),
        "out_b": jnp.asarray(sp["out_b"]),
        "init_M": jnp.asarray(sp["init_M"]),
        "init_w": jnp.asarray(sp["init_w"]),
        "init_read": jnp.asarray(sp["init_read"]),
    }
    video = seeded_loop_video()
    trk = StreamingTracker(cfg, vgg, params, delimiter_first=True)
    trk.init(video[0], TRACKER_LOOP_REGION0)
    cropboxes = [list(trk.cropbox)]
    regions, out_bboxes = [], []
    for t in range(1, len(video)):
        region = trk.track(video[t])
        regions.append(list(region))
        out_bboxes.append(list(trk.output_bbox))
        cropboxes.append(list(trk.cropbox))
    return {
        "loop_regions": np.array(regions, np.float64),
        "loop_output_bboxes": np.array(out_bboxes, np.float64),
        "loop_cropboxes": np.array(cropboxes, np.float64),
    }


class TestExecutedReferenceTrackerLoop:
    """The cross-frame composition — np-side preprocess padding -> 65 cell
    steps -> offset decode -> recrop feedback -> reported region
    (test_tracker.py:104-405) — pinned against an end-to-end EXECUTION of
    the reference's own NTMTracker class (real frozen-VGG .pb import, real
    Saver restore, its own scipy/np geometry), not just its pieces."""

    @pytest.fixture(scope="class")
    def loop(self):
        g = _load("tf_goldens_tracker_loop.npz")
        from tests.fixture_params import seeded_loop_video
        import hashlib

        video_sha = hashlib.sha256(seeded_loop_video().tobytes()).digest()
        assert bytes(g["loop_video_sha"]) == video_sha, (
            "seeded video drifted from the one the golden was generated on"
        )
        return g, run_repo_tracker_loop()

    @pytest.mark.parametrize(
        "key", ["loop_regions", "loop_output_bboxes", "loop_cropboxes"]
    )
    def test_trajectory_matches(self, loop, key):
        g, ours = loop
        ref = np.asarray(g[key])
        got = np.asarray(ours[key])
        assert got.shape == ref.shape
        # <=1e-4 relative on the reported trajectory (pixels for regions,
        # normalized units for boxes); atol covers near-zero coords
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4,
                                   err_msg=key)

    def test_loop_actually_moved(self, loop):
        """Guard against a degenerate golden (all-identical frames would
        pass parity trivially): the recrop feedback must actually move the
        cropbox across frames."""
        g, _ = loop
        crops = np.asarray(g["loop_cropboxes"])
        assert np.abs(np.diff(crops, axis=0)).max() > 1e-3


def test_convert_reference_dnc_checkpoint(tmp_path):
    """convert-dnc oracle: a REAL tf.train.Saver round trip of the
    reference DNC core (sonnet scoping dnc/lstm, dnc/memory_access/<head>,
    dnc/output_linear — direct_offset_output_with_dnc.py:66-88) converted
    onto the models/dnc pytree reproduces the executed rollout, through the
    .npz round trip inference hosts use."""
    from ntm_tracker_tpu.config import DNCConfig
    from ntm_tracker_tpu.models.dnc.dnc import dnc_step, init_dnc_state
    from ntm_tracker_tpu.tools.convert_dnc_ckpt import (
        convert_dnc_variables,
        load_params_npz,
        save_params_npz,
    )

    g = _load("tf_goldens_dnc_ckpt_convert.npz")
    B, N, W, R, Wh, IN, HID, OUT, T = [int(x) for x in g["dncckpt_config"]]
    cfg = DNCConfig(
        memory_size=N, word_size=W, num_reads=R, num_writes=Wh,
        hidden_size=HID, output_dim=OUT, clip_value=float(g["dncckpt_clip"]),
    )
    variables = {
        str(n): np.asarray(g[f"dncckpt_var_{i}"])
        for i, n in enumerate(g["dncckpt_names"])
    }
    # prove non-core variables are skipped, and an extra enclosing scope
    # (dynamic_rnn's 'rnn/') still converts
    variables["global_step"] = np.int64(2600)
    variables["dnc/lstm/w_gates/RMSProp"] = np.zeros((3, 3), np.float32)
    variables = {
        (f"rnn/{k}" if k.startswith("dnc/") else k): v
        for k, v in variables.items()
    }
    params = convert_dnc_variables(variables, cfg)
    save_params_npz(str(tmp_path / "dnc.npz"), params)
    params = load_params_npz(str(tmp_path / "dnc.npz"))

    state = init_dnc_state(cfg, B)
    outs = []
    for t in range(T):
        out_t, state = jax.jit(dnc_step, static_argnums=1)(
            params, cfg, jnp.asarray(g["dncckpt_inputs"][t]), state
        )
        outs.append(np.asarray(out_t))
    np.testing.assert_allclose(np.stack(outs), g["dncckpt_outputs"], atol=TOL)
