"""End-to-end offset-experiment tests: full pipeline on tiny shapes, both
cores, plus the data-parallel sharded step on the virtual 8-device mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntm_tracker_tpu.config import DNCConfig, DataConfig, NTMConfig, TrackerConfig, TrainConfig
from ntm_tracker_tpu.models.vgg import init_vgg_params
from ntm_tracker_tpu.parallel.mesh import make_mesh, parallel_train_step, shard_batch
from ntm_tracker_tpu.train.experiments import (
    OffsetExperiment,
    copy_paste_loss,
    make_copy_paste_batch,
    synthetic_offset_batch,
)
from ntm_tracker_tpu.models.ntm_cell import init_ntm_params


def tiny_cfg(core="ntm", batch=2, seq_len=3):
    # crop 32 -> conv4_3 map is 4x4; use a 2x2 center grid of tokens
    return TrackerConfig(
        core=core,
        ntm=NTMConfig(output_dim=2, mem_size=16, mem_dim=8,
                      controller_hidden_size=32, read_head_size=2),
        dnc=DNCConfig(output_dim=2, memory_size=16, word_size=8,
                      num_reads=2, num_writes=1, hidden_size=32),
        data=DataConfig(crop_size=32, resize_hw=(48, 64), gt_width=2),
        train=TrainConfig(batch_size=batch, sequence_length=seq_len),
        num_features=4,
        feature_points=((1, 1), (1, 2), (2, 1), (2, 2)),
    )


@pytest.mark.parametrize("core", ["ntm", "dnc"])
def test_offset_experiment_trains(core):
    cfg = tiny_cfg(core)
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    exp = OffsetExperiment(cfg, vgg, image_mode="cropped")
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    step = jax.jit(exp.make_train_step())
    rng = np.random.RandomState(0)
    batch = {k: jnp.array(v) for k, v in synthetic_offset_batch(cfg, rng).items()}
    losses = []
    for _ in range(3):
        params, opt_state, m = step(params, opt_state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    # repeated steps on the same batch must reduce the loss
    assert losses[-1] < losses[0]


def test_offset_experiment_raw_image_mode():
    cfg = tiny_cfg("ntm", batch=1, seq_len=2)
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    exp = OffsetExperiment(cfg, vgg, image_mode="raw")
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    batch = {
        k: jnp.array(v)
        for k, v in synthetic_offset_batch(cfg, np.random.RandomState(1), "raw").items()
    }
    loss, aux = exp.loss_fn(params, batch)
    assert np.isfinite(float(loss))
    assert aux["pred_offsets"].shape == (1, 1, 2)


def test_vgg_params_receive_no_gradient():
    cfg = tiny_cfg("ntm", batch=1, seq_len=2)
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    exp = OffsetExperiment(cfg, vgg, image_mode="cropped")
    params, _ = exp.init(jax.random.PRNGKey(1))
    batch = {
        k: jnp.array(v)
        for k, v in synthetic_offset_batch(cfg, np.random.RandomState(2)).items()
    }

    def loss_wrt_vgg(vp):
        return OffsetExperiment(cfg, vp, image_mode="cropped").loss_fn(params, batch)[0]

    g = jax.grad(loss_wrt_vgg)(vgg)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert total == 0.0  # frozen via stop_gradient


class TestDataParallel:
    def test_sharded_step_matches_single_device(self):
        cfg = tiny_cfg("ntm", batch=8, seq_len=2)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        exp = OffsetExperiment(cfg, vgg, image_mode="cropped")
        params, opt_state = exp.init(jax.random.PRNGKey(1))
        batch_np = synthetic_offset_batch(cfg, np.random.RandomState(3))

        mesh = make_mesh()
        assert mesh.devices.size == 8
        pstep = parallel_train_step(exp.make_train_step(), mesh, donate_argnums=())
        sharded = shard_batch(mesh, batch_np)
        p1, o1, m1 = pstep(params, opt_state, sharded)

        sstep = jax.jit(exp.make_train_step(), donate_argnums=())
        batch_jnp = {k: jnp.array(v) for k, v in batch_np.items()}
        p2, o2, m2 = sstep(params, opt_state, batch_jnp)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


class TestCopyPaste:
    def test_batch_layout(self):
        inputs, labels = make_copy_paste_batch(np.random.RandomState(0), 2, 3, 5)
        assert inputs.shape == (2, 11, 4) and labels.shape == (2, 11, 4)
        # delimiter at step L on channel `width`
        np.testing.assert_array_equal(inputs[:, 5, 3], 1)
        # labels live in the second half
        np.testing.assert_array_equal(labels[:, :6, :], 0)
        np.testing.assert_array_equal(labels[:, 6:, :3], inputs[:, :5, :3])

    def test_loss_finite_and_differentiable(self):
        ncfg = NTMConfig(output_dim=4, mem_size=16, mem_dim=8,
                         controller_hidden_size=16, read_head_size=1)
        params = init_ntm_params(jax.random.PRNGKey(0), ncfg, 4)
        inputs, labels = make_copy_paste_batch(np.random.RandomState(1), 2, 3, 5)
        loss, g = jax.value_and_grad(copy_paste_loss)(
            params, ncfg, jnp.array(inputs), jnp.array(labels)
        )
        assert np.isfinite(float(loss))
        assert all(
            np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(g)
        )


def test_sharded_inference_matches_single_device():
    """Batch-sharded frame-step inference over the mesh == unsharded (the
    serving-scale counterpart of the sharded-training parity test)."""
    from ntm_tracker_tpu.models.core import make_core
    from ntm_tracker_tpu.parallel.mesh import batch_sharding, make_mesh
    from ntm_tracker_tpu.tracking.tracker import build_frame_step

    cfg = tiny_cfg("ntm", batch=8, seq_len=2)
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    core = make_core(cfg)
    params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
    _, step_rest = build_frame_step(cfg, core, vgg, params, donate_state=False)

    crops = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3)) * 30
    state = core.init_state(params, 8)
    off_ref, state_ref = step_rest(crops, state)

    mesh = make_mesh()
    sh = batch_sharding(mesh)
    crops_sh = jax.device_put(crops, sh)
    state_sh = jax.tree.map(lambda x: jax.device_put(x, sh), state)
    off_sh, state_new = step_rest(crops_sh, state_sh)

    np.testing.assert_allclose(np.asarray(off_sh), np.asarray(off_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state_new["M"]),
                               np.asarray(state_ref["M"]), rtol=2e-4, atol=1e-5)


def test_remat_policies_identical_grads():
    """remat_policy full / dots / none are pure perf knobs: identical loss
    and gradients (same math, different save/recompute schedule)."""
    import dataclasses

    vgg = init_vgg_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    results = []
    for policy in ("full", "dots", "none"):
        cfg = tiny_cfg("ntm")
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, remat_policy=policy)
        )
        exp = OffsetExperiment(cfg, vgg, image_mode="cropped")
        params, _ = exp.init(jax.random.PRNGKey(1))
        batch = {
            k: jnp.array(v)
            for k, v in synthetic_offset_batch(cfg, np.random.RandomState(0)).items()
        }
        (loss, _), grads = jax.jit(
            jax.value_and_grad(exp.loss_fn, has_aux=True)
        )(params, batch)
        results.append((float(loss), grads))
    for loss, grads in results[1:]:
        assert loss == results[0][0]
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            grads, results[0][1],
        )


def test_unknown_remat_policy_raises():
    from ntm_tracker_tpu.models.ntm_tracker import ntm_tracker_unroll
    from ntm_tracker_tpu.config import NTMConfig

    cfg = NTMConfig(mem_size=4, mem_dim=2, controller_hidden_size=4,
                    read_head_size=1)
    from ntm_tracker_tpu.models.ntm_cell import init_ntm_params

    params = init_ntm_params(jax.random.PRNGKey(0), cfg, 3)
    with pytest.raises(ValueError, match="remat"):
        ntm_tracker_unroll(params, cfg, jnp.zeros((1, 2, 3)), remat="bogus")


class TestBpttCompileFallback:
    """train_step_with_bptt_fallback: a fused-BPTT compile failure (the
    B=512 HTTP-500 class, ops/pallas/scan_bptt.py) must degrade to the
    XLA-scan step, not kill the run."""

    def _exp(self, fused):
        cfg = tiny_cfg("ntm")
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, fused_bptt=fused)
        )
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        return OffsetExperiment(cfg, vgg, image_mode="cropped")

    def _batch(self, cfg):
        rng = np.random.RandomState(0)
        return {k: jnp.array(v)
                for k, v in synthetic_offset_batch(cfg, rng).items()}

    def test_forced_compile_failure_falls_back_to_xla(self, monkeypatch):
        from ntm_tracker_tpu.ops.pallas import scan_bptt
        from ntm_tracker_tpu.train.experiments import (
            train_step_with_bptt_fallback,
        )

        def boom(*a, **k):
            raise RuntimeError("Mosaic compile: HTTP 500 (simulated)")

        # ntm_tracker_unroll imports the symbol from the module at call
        # time, so patching the module attribute intercepts the trace
        monkeypatch.setattr(scan_bptt, "ntm_scan_fused_bptt", boom)
        exp = self._exp(True)  # force the fused path (auto is off on CPU)
        params, opt_state = exp.init(jax.random.PRNGKey(1))
        step = train_step_with_bptt_fallback(exp)
        batch = self._batch(exp.cfg)
        params, opt_state, m = step(params, opt_state, batch)
        assert step.fell_back
        assert np.isfinite(float(m["loss"]))
        # subsequent calls stay on the rebuilt XLA step
        _, _, m2 = step(params, opt_state, batch)
        assert np.isfinite(float(m2["loss"]))

    def test_non_fused_failure_propagates(self):
        from ntm_tracker_tpu.train.experiments import (
            train_step_with_bptt_fallback,
        )

        exp = self._exp(False)  # fused explicitly off: nothing to fall
        # back from — errors must propagate unchanged
        params, opt_state = exp.init(jax.random.PRNGKey(1))
        step = train_step_with_bptt_fallback(exp)
        batch = self._batch(exp.cfg)
        bad = dict(batch)
        bad["gts"] = batch["gts"][:1]  # shape mismatch -> trace error
        with pytest.raises(Exception):
            step(params, opt_state, bad)
        assert not step.fell_back

    def test_no_fallback_when_first_call_succeeds(self):
        from ntm_tracker_tpu.train.experiments import (
            train_step_with_bptt_fallback,
        )

        exp = self._exp("auto")  # auto resolves to the XLA scan on CPU
        params, opt_state = exp.init(jax.random.PRNGKey(1))
        step = train_step_with_bptt_fallback(exp)
        batch = self._batch(exp.cfg)
        params, opt_state, m = step(params, opt_state, batch)
        assert not step.fell_back
        assert np.isfinite(float(m["loss"]))


def test_vgg_as_argument_matches_closure_constant():
    """train_step_with_bptt_fallback injects the frozen VGG into the batch
    so it compiles as an ARGUMENT; the step must be numerically identical
    to the closure-constant path (same math, different binding)."""
    from ntm_tracker_tpu.train.experiments import train_step_with_bptt_fallback

    cfg = tiny_cfg("ntm")
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    exp = OffsetExperiment(cfg, vgg, image_mode="cropped")
    params, opt_state = exp.init(jax.random.PRNGKey(1))
    batch = {k: jnp.array(v) for k, v in
             synthetic_offset_batch(cfg, np.random.RandomState(0)).items()}

    const_step = jax.jit(exp.make_train_step())
    p1, o1, m1 = const_step(params, opt_state, batch)

    arg_step = train_step_with_bptt_fallback(exp)
    p2, o2, m2 = arg_step(params, opt_state, batch)

    assert np.allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
