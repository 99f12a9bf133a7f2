"""Memory-state dashboards (the reference's train_M / w_reads / w_writes /
reads image summaries, main.py:1186-1214): unroll_states snapshot scan for
both cores, panel geometry, and the PNG writer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntm_tracker_tpu.config import DNCConfig, NTMConfig, TrackerConfig, TrainConfig
from ntm_tracker_tpu.models.core import make_core, unroll_states
from ntm_tracker_tpu.utils.viz import memory_panels, save_memory_panels


def _tiny_cfg(core):
    return TrackerConfig(
        core=core,
        ntm=NTMConfig(mem_size=8, mem_dim=4, controller_hidden_size=12,
                      read_head_size=2, write_head_size=1),
        dnc=DNCConfig(memory_size=8, word_size=4, hidden_size=12,
                      num_reads=2, num_writes=1),
        train=TrainConfig(sequence_length=2),
    )


@pytest.mark.parametrize("core_name", ["ntm", "dnc"])
class TestUnrollStates:
    def test_shapes_and_final_state(self, core_name):
        cfg = _tiny_cfg(core_name)
        core = make_core(cfg)
        params = core.init_params(jax.random.PRNGKey(0), 6)
        B, T, D = 2, 12, 6
        inputs = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))

        logits, views, final = unroll_states(core, params, inputs, stride=3)
        assert logits.shape[:2] == (B, T // 3)
        assert views["M"].shape == (B, T // 3, 8, 4)
        assert views["w"].shape == (B, T // 3, 3, 8)  # 2 read + 1 write
        assert views["read"].shape == (B, T // 3, 2, 4)

        # final state equals the plain unroll's final state
        _, plain_final = core.unroll(params, inputs)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            final, plain_final,
        )
        # the last snapshot is the final state's view
        last = core.state_view(final)
        for k in views:
            np.testing.assert_allclose(views[k][:, -1], last[k], atol=1e-6)

    def test_nondividing_stride_tail(self, core_name):
        """A stride that doesn't divide T records floor(T/stride) snapshots
        but the final state still reflects all T steps."""
        cfg = _tiny_cfg(core_name)
        core = make_core(cfg)
        params = core.init_params(jax.random.PRNGKey(0), 6)
        B, T = 2, 10
        inputs = jax.random.normal(jax.random.PRNGKey(2), (B, T, 6))
        logits, views, final = unroll_states(core, params, inputs, stride=3)
        assert logits.shape[:2] == (B, 3)
        assert views["M"].shape[:2] == (B, 3)
        _, plain_final = core.unroll(params, inputs)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            final, plain_final,
        )
        with pytest.raises(ValueError, match="out of range"):
            unroll_states(core, params, inputs, stride=11)


class TestPanels:
    def test_panel_geometry(self):
        T, N, D, H, R = 5, 8, 4, 3, 2
        rs = np.random.RandomState(0)
        panels = memory_panels(
            rs.rand(T, N, D), rs.rand(T, H, N), rs.rand(T, R, D), read_heads=R
        )
        assert panels["M"].shape == (N, T * D)
        assert panels["w_reads"].shape == (R * N, T)
        assert panels["w_writes"].shape == ((H - R) * N, T)
        assert panels["reads"].shape == (R * D, T)
        # timeline columns really are per-step slices
        M = rs.rand(T, N, D)
        p = memory_panels(M, rs.rand(T, H, N), rs.rand(T, R, D), R)
        np.testing.assert_array_equal(p["M"][:, 2 * D : 3 * D], M[2])

    def test_save_png(self, tmp_path):
        cfg = _tiny_cfg("ntm")
        core = make_core(cfg)
        params = core.init_params(jax.random.PRNGKey(0), 6)
        inputs = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 6))
        _l, views, _f = unroll_states(core, params, inputs, stride=2)
        path = save_memory_panels(views, read_heads=2, filename="mem_0",
                                  savedir=str(tmp_path))
        assert os.path.exists(path) and os.path.getsize(path) > 0


class TestExperimentHook:
    def test_memory_states_auto_stride(self):
        """OffsetExperiment.memory_states honors the max_snapshots bound and
        returns jittable views."""
        from ntm_tracker_tpu.config import DataConfig
        from ntm_tracker_tpu.models.vgg import init_vgg_params
        from ntm_tracker_tpu.train.experiments import (
            OffsetExperiment,
            synthetic_offset_batch,
        )

        cfg = TrackerConfig(
            core="ntm",
            ntm=NTMConfig(mem_size=8, mem_dim=4, controller_hidden_size=12,
                          read_head_size=2, write_head_size=1),
            data=DataConfig(crop_size=32, gt_width=2),
            train=TrainConfig(sequence_length=2, batch_size=1),
            num_features=4,
            feature_points=((1, 1), (1, 2), (2, 1), (2, 2)),
        )
        exp = OffsetExperiment(cfg, init_vgg_params(jax.random.PRNGKey(0)))
        params, _ = exp.init(jax.random.PRNGKey(1))
        batch = {
            k: jnp.array(v)
            for k, v in synthetic_offset_batch(cfg, np.random.RandomState(0)).items()
        }
        views = jax.jit(lambda p, b: exp.memory_states(p, b, max_snapshots=4))(
            params, batch
        )
        T = cfg.train.sequence_length * (cfg.num_features + 1)  # 10
        snaps = views["M"].shape[1]
        assert snaps <= 4  # the bound actually holds
        assert snaps == 3  # stride ceil(10/4)=3 -> floor(10/3) snapshots
        assert views["M"].shape[2:] == (8, 4)

        # the single-pass eval (loss + views in one unroll) agrees with the
        # separate eval step and memory_states passes
        aux2, views2 = jax.jit(
            lambda p, b: exp.eval_with_views(p, b, max_snapshots=4)
        )(params, batch)
        aux1 = jax.jit(exp.make_eval_step())(params, batch)
        np.testing.assert_allclose(
            np.asarray(aux2["loss"]), np.asarray(aux1["loss"]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(aux2["pred_offsets"]),
            np.asarray(aux1["pred_offsets"]), atol=1e-6,
        )
        for k in views:
            np.testing.assert_allclose(
                np.asarray(views2[k]), np.asarray(views[k]), atol=1e-6
            )
