"""Scale head (TrackerConfig.predict_scale) — the beyond-reference third
output ds that lets the tracker adapt box SIZE.

The reference head is offsets-only (direct_offset_output.py output_dim=2):
the tracked box keeps its first-frame size forever, capping IoU on
scale-changing targets. These tests pin the new contract end to end:
geometry twins, target construction, loss/training, the host decode, the
device-loop decode parity, and the closed-loop active-resize targets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntm_tracker_tpu.config import (
    DataConfig,
    NTMConfig,
    TrackerConfig,
    TrainConfig,
    validate_head,
)
from ntm_tracker_tpu.data import geometry
from ntm_tracker_tpu.data.geometry_jnp import (
    canonical_box,
    center_log_scale,
    scale_box,
)
from ntm_tracker_tpu.models.core import make_core
from ntm_tracker_tpu.models.vgg import init_vgg_params
from ntm_tracker_tpu.tracking.tracker import StreamingTracker, decode_head


def scale_cfg(core: str = "ntm") -> TrackerConfig:
    return TrackerConfig(
        core=core,
        ntm=NTMConfig(output_dim=3, mem_size=16, mem_dim=8,
                      controller_hidden_size=32, read_head_size=2),
        data=DataConfig(crop_size=32, resize_hw=(48, 64), gt_width=2),
        train=TrainConfig(batch_size=1, sequence_length=2),
        num_features=4,
        feature_points=((1, 1), (1, 2), (2, 1), (2, 2)),
        predict_scale=True,
    )


class TestGeometry:
    def test_scale_roundtrip_numpy(self):
        """calculate_scale inverts scale_bbox for isotropic scaling."""
        init = geometry.initial_transformed_bbox(8, 6)
        for f in (0.5, 0.8, 1.0, 1.3, 2.0):
            scaled = geometry.scale_bbox(init, f)
            assert geometry.calculate_scale(scaled, init) == pytest.approx(
                np.log(f), abs=1e-12
            )
            # scaling preserves the center
            assert (scaled[0] + scaled[2]) / 2 == pytest.approx(0.5)
            assert (scaled[1] + scaled[3]) / 2 == pytest.approx(0.5)

    def test_jnp_twins_match_numpy(self):
        rng = np.random.RandomState(0)
        canon = canonical_box(8, 6)
        init = geometry.initial_transformed_bbox(8, 6)
        boxes = []
        for _ in range(8):
            y1, x1 = rng.uniform(0.0, 0.5, 2)
            h, w = rng.uniform(0.1, 0.45, 2)
            boxes.append([y1, x1, y1 + h, x1 + w])
        b = jnp.asarray(boxes, jnp.float32)
        got = np.asarray(center_log_scale(b, canon))
        # the numpy contract uses sqrt-area, anisotropic boxes included
        want = [geometry.calculate_scale(bx, init) for bx in boxes]
        np.testing.assert_allclose(got, want, atol=1e-5)

        factors = jnp.asarray(rng.uniform(0.5, 2.0, 8), jnp.float32)
        got_s = np.asarray(scale_box(b, factors))
        want_s = [geometry.scale_bbox(bx, float(f))
                  for bx, f in zip(boxes, np.asarray(factors))]
        np.testing.assert_allclose(got_s, want_s, atol=1e-6)

    def test_validate_head(self):
        cfg = scale_cfg()
        validate_head(cfg)  # 3 outputs + predict_scale: fine
        bad = TrackerConfig(predict_scale=True)  # default output_dim=2
        with pytest.raises(ValueError, match="output_dim"):
            validate_head(bad)
        bad2 = TrackerConfig(ntm=NTMConfig(output_dim=3))  # no flag
        with pytest.raises(ValueError, match="output_dim"):
            validate_head(bad2)


class TestLoaderScales:
    def test_record_log_scales_matches_geometry(self):
        from ntm_tracker_tpu.data.loader import record_log_scales

        rng = np.random.RandomState(3)
        init = geometry.initial_transformed_bbox(8, 6)
        boxes = []
        for _ in range(6):
            y1, x1 = rng.uniform(0.0, 0.4, 2)
            h, w = rng.uniform(0.1, 0.5, 2)
            boxes.append([y1, x1, y1 + h, x1 + w])
        got = record_log_scales(np.asarray(boxes, np.float32))
        want = [geometry.calculate_scale(b, init) for b in boxes]
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestDecode:
    def test_decode_head_matches_reference_when_disabled(self):
        """predict_scale=False must reproduce the exact reference decode
        (offset_bbox only) — byte-for-byte the old code path."""
        cfg = TrackerConfig()
        init = geometry.initial_transformed_bbox(8, 6)
        out = np.asarray([0.07, -0.11], np.float32)
        got = decode_head(cfg, init, out)
        want = geometry.offset_bbox(init, (float(out[0]), float(out[1])))
        assert got == want

    def test_decode_head_scales_then_shifts(self):
        cfg = scale_cfg()
        init = geometry.initial_transformed_bbox(8, 6)
        dy, dx, ds = 0.05, -0.03, 0.4
        got = decode_head(cfg, init, np.asarray([dy, dx, ds], np.float32))
        want = geometry.offset_bbox(
            geometry.scale_bbox(init, float(np.exp(ds * cfg.scale_range))),
            (dy, dx),
        )
        np.testing.assert_allclose(got, want, atol=1e-7)
        # the box actually grew: exp(0.4*0.5) = 1.22x each side
        assert (got[2] - got[0]) > (init[2] - init[0])

    def test_streaming_tracker_box_growth_follows_ds(self):
        """Drive StreamingTracker with a stubbed device step that emits a
        constant positive ds: the tracked box must grow by exp(ds*range)
        every frame (the recrop feeds the grown box back in)."""
        cfg = scale_cfg()
        core = make_core(cfg)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
        tr = StreamingTracker(cfg, vgg, params, core)
        H, W = 90, 160
        img = np.zeros((H, W, 3), np.float32)
        tr.init(img, (60.0, 30.0, 40.0, 30.0))
        ds = 0.3
        tr._step_rest = lambda crops, state: (
            jnp.asarray([[0.0, 0.0, ds]]), state
        )
        x0, y0, w0, h0 = tr.track(img)
        x1, y1, w1, h1 = tr.track(img)
        f = float(np.exp(ds * cfg.scale_range))
        # each recrop starts from the previous box, so sizes compound by f
        # TIMES the reference's dim/(dim-1) decode quirk (regions decode
        # with *dim but renormalize with /(dim-1) — one extra factor per
        # recrop, test_tracker.py:257-329)
        assert w1 / w0 == pytest.approx(f * W / (W - 1), rel=1e-5)
        assert h1 / h0 == pytest.approx(f * H / (H - 1), rel=1e-5)
        # zero (dy,dx): the center only moves by the coordinate-scaling
        # quirk factor itself (no ds-induced drift)
        assert x1 + w1 / 2 == pytest.approx(
            (x0 + w0 / 2) * W / (W - 1), abs=1e-3
        )
        assert y1 + h1 / 2 == pytest.approx(
            (y0 + h0 / 2) * H / (H - 1), abs=1e-3
        )


class TestTraining:
    def test_offset_experiment_trains_with_scale_targets(self):
        from ntm_tracker_tpu.tracking.demo import demo_config, training_batch
        from ntm_tracker_tpu.train.experiments import OffsetExperiment

        cfg = demo_config(crop_size=32, predict_scale=True)
        cfg = jax.tree_util.tree_map(lambda x: x, cfg)  # noqa: keep frozen
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        exp = OffsetExperiment(cfg, vgg, image_mode="cropped")
        params, opt_state = exp.init(jax.random.PRNGKey(1))
        step = jax.jit(exp.make_train_step())
        rng = np.random.RandomState(0)
        batch = training_batch(cfg, rng)
        assert "scales" in batch and batch["scales"].shape == (
            cfg.train.batch_size * cfg.train.sequence_length,
        )
        # scale-walk clips produce non-degenerate scale targets
        assert np.abs(batch["scales"]).max() > 1e-4
        # overfit the one fixed batch: loss must fall decisively
        losses = []
        for _ in range(30):
            params, opt_state, m = step(params, opt_state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < 0.5 * losses[0]

    def test_demo_batch_unchanged_without_flag(self):
        """predict_scale=False batches are IDENTICAL to before the flag
        existed (no 'scales' key, same rng stream)."""
        from ntm_tracker_tpu.tracking.demo import demo_config, training_batch

        cfg = demo_config(crop_size=32)
        b = training_batch(cfg, np.random.RandomState(7))
        assert "scales" not in b
        # the rng draw order with scale_walk=False is untouched: pin a
        # couple of values so a silent re-ordering cannot slip in
        assert b["y_offsets"].shape == (32,)

    def test_active_resize_scale_targets(self):
        from ntm_tracker_tpu.train.active_resize import (
            ActiveResizeExperiment,
            synthetic_active_batch,
        )

        cfg = scale_cfg()
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        exp = ActiveResizeExperiment(cfg, vgg)
        params, opt_state = exp.init(jax.random.PRNGKey(1))
        batch = synthetic_active_batch(cfg, np.random.RandomState(0))
        loss, aux = exp.loss_fn(params, jax.tree.map(jnp.asarray, batch))
        assert np.isfinite(float(loss))
        assert aux["final_bbox"].shape == (cfg.train.batch_size, 4)


class TestDeviceLoopParity:
    def test_device_loop_matches_host_with_scale_head(self):
        """The in-graph scale decode (scale_box + shift inside jit) must
        reproduce the host decode_head trajectory over several recrops —
        the predict_scale twin of TestDeviceTrackStep."""
        from ntm_tracker_tpu.tracking.tracker import make_device_track_step

        cfg = scale_cfg()
        core = make_core(cfg)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)

        rng = np.random.RandomState(0)
        H, W = 90, 160
        frames = (rng.rand(6, H, W, 3) * 255).astype(np.float32)
        region0 = (60.0, 30.0, 40.0, 30.0)

        host = StreamingTracker(cfg, vgg, params, core)
        host.init(frames[0], region0)
        host_regions = [host.track(frames[t]) for t in range(1, 6)]

        init_fn, step_fn = make_device_track_step(cfg, core, vgg, params)
        x, y, w, h = region0
        bbox = jnp.asarray(
            [[y / (H - 1), x / (W - 1), (y + h) / (H - 1), (x + w) / (W - 1)]],
            jnp.float32,
        )
        state = init_fn(frames[0:1], bbox, core.init_state(params, 1))
        dev_regions = []
        for t in range(1, 6):
            region, bbox, state = step_fn(frames[t: t + 1], bbox, state)
            dev_regions.append(np.asarray(region[0]))
        np.testing.assert_allclose(
            np.asarray(dev_regions), np.asarray(host_regions),
            atol=0.05, rtol=1e-4,
        )
