"""Streaming tracker + VOT adapter tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ntm_tracker_tpu.config import DataConfig, NTMConfig, TrackerConfig, TrainConfig
from ntm_tracker_tpu.models.core import make_core
from ntm_tracker_tpu.models.vgg import init_vgg_params
from ntm_tracker_tpu.tracking import vot
from ntm_tracker_tpu.tracking.tracker import StreamingTracker, build_frame_step


def tiny_cfg():
    return TrackerConfig(
        core="ntm",
        ntm=NTMConfig(output_dim=2, mem_size=16, mem_dim=8,
                      controller_hidden_size=32, read_head_size=2),
        data=DataConfig(crop_size=32, resize_hw=(48, 64), gt_width=2),
        train=TrainConfig(batch_size=1, sequence_length=2),
        num_features=4,
        feature_points=((1, 1), (1, 2), (2, 1), (2, 2)),
    )


class TestFrameStep:
    def test_one_call_per_frame(self):
        cfg = tiny_cfg()
        core = make_core(cfg)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
        step_first, step_rest = build_frame_step(cfg, core, vgg, params,
                                                 donate_state=False)
        crops = jnp.zeros((2, 32, 32, 3))
        state = core.init_state(params, 2)
        gt = jnp.ones((2, cfg.num_features)) / cfg.num_features
        off1, state = step_first(crops, gt, state)
        off2, state = step_rest(crops, state)
        assert off1.shape == (2, 2) and off2.shape == (2, 2)
        assert np.all(np.abs(np.asarray(off2)) <= 1.0)  # tanh range

    def test_target_channel_changes_result(self):
        cfg = tiny_cfg()
        core = make_core(cfg)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
        step_first, step_rest = build_frame_step(cfg, core, vgg, params,
                                                 donate_state=False)
        crops = jnp.ones((1, 32, 32, 3)) * 10
        s0 = core.init_state(params, 1)
        gt_a = jnp.zeros((1, 4)).at[0, 0].set(1.0)
        gt_b = jnp.zeros((1, 4)).at[0, 3].set(1.0)
        _, sa = step_first(crops, gt_a, s0)
        _, sb = step_first(crops, gt_b, core.init_state(params, 1))
        oa, _ = step_rest(crops, sa)
        ob, _ = step_rest(crops, sb)
        assert not np.allclose(np.asarray(oa), np.asarray(ob))


class TestStreamingTracker:
    def test_track_loop_geometry(self):
        cfg = tiny_cfg()
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        core = make_core(cfg)
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
        tracker = StreamingTracker(cfg, vgg, params, core)
        rng = np.random.RandomState(0)
        img = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
        tracker.init(img, (60.0, 40.0, 40.0, 30.0))  # x,y,w,h pixels
        regions = [tracker.track(img) for _ in range(3)]
        for x, y, w, h in regions:
            # untrained net: offsets in (-1,1) -> region stays finite and
            # the box size is preserved by the offset-only decode
            assert np.isfinite([x, y, w, h]).all()
            np.testing.assert_allclose(w, 40.0, rtol=0.05)
            np.testing.assert_allclose(h, 30.0, rtol=0.05)

    def test_zero_offset_keeps_box(self):
        """If the net outputs ~0 offsets, the region round-trips through the
        crop/decode geometry up to the reference's own normalize/denormalize
        mismatch: normalize_bbox divides by (dim-1) (preprocess.py:73-79)
        while _decode_bbox multiplies by dim (test_tracker.py:271), so each
        frame scales the box by dim/(dim-1). We reproduce that exactly."""
        cfg = tiny_cfg()
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        core = make_core(cfg)
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
        # zero the output head -> tanh(0) = 0 offsets
        params["out_w"] = jnp.zeros_like(params["out_w"])
        params["out_b"] = jnp.zeros_like(params["out_b"])
        tracker = StreamingTracker(cfg, vgg, params, core)
        img = np.zeros((100, 200, 3), np.uint8)
        region0 = (80.0, 30.0, 50.0, 40.0)
        tracker.init(img, region0)
        region1 = tracker.track(img)
        h, w = img.shape[:2]
        expected = (
            region0[0] * w / (w - 1),
            region0[1] * h / (h - 1),
            region0[2] * w / (w - 1),
            region0[3] * h / (h - 1),
        )
        np.testing.assert_allclose(region1, expected, atol=1e-3)


class TestVOT:
    def test_file_mode_round_trip(self, tmp_path):
        wd = str(tmp_path)
        (tmp_path / "images.txt").write_text("a.jpg\nb.jpg\nc.jpg\n")
        (tmp_path / "region.txt").write_text("10,20,30,40")
        handle = vot.VOT("rectangle", workdir=wd)
        region = handle.region()
        assert region == vot.Rectangle(10, 20, 30, 40)
        frames = []
        while True:
            f = handle.frame()
            if f is None:
                break
            frames.append(f)
            handle.report(vot.Rectangle(1, 2, 3, 4))
        # relative images.txt entries resolve against WORKDIR, not the CWD
        # (the reference always ran from the sequence dir; the workdir
        # generalization must not depend on where the process started)
        assert frames == [os.path.join(wd, x) for x in ("a.jpg", "b.jpg", "c.jpg")]
        handle.quit()
        out = (tmp_path / "output.txt").read_text().strip().splitlines()
        assert out == ["1,2,3,4"] * 3

    def test_polygon_conversion(self):
        poly = vot.Polygon([vot.Point(0, 0), vot.Point(4, 0), vot.Point(4, 2), vot.Point(0, 2)])
        rect = vot.convert_region(poly, "rectangle")
        assert rect == vot.Rectangle(0, 0, 4, 2)
        back = vot.convert_region(rect, "polygon")
        assert len(back.points) == 4

    def test_parse_encode(self):
        r = vot.parse_region("1.5,2,3,4")
        assert isinstance(r, vot.Rectangle)
        assert vot.parse_region("1,2,3,4,5,6") == vot.Polygon(
            [vot.Point(1, 2), vot.Point(3, 4), vot.Point(5, 6)]
        )
        assert vot.encode_region(r) == "1.5,2.0,3.0,4.0"


class TestDeviceTrackStep:
    def test_trajectory_matches_streaming_tracker(self):
        """The fully-on-device loop (geometry inside jit) must reproduce
        StreamingTracker's host-geometry trajectory, INCLUDING the
        reference's (dim-1)/dim decode quirk, over several recrops."""
        from ntm_tracker_tpu.models.core import make_core
        from ntm_tracker_tpu.tracking.tracker import make_device_track_step

        cfg = tiny_cfg()
        core = make_core(cfg)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)

        rng = np.random.RandomState(0)
        H, W = 90, 160
        frames = (rng.rand(6, H, W, 3) * 255).astype(np.float32)
        region0 = (60.0, 30.0, 40.0, 30.0)  # x, y, w, h pixels

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
            region, bbox, state = step_fn(frames[t : t + 1], bbox, state)
            dev_regions.append(np.asarray(region[0]))
        # f32 in-graph vs f64 host geometry accumulates over recrops;
        # 0.05 px over 5 chained crops is parity in substance
        np.testing.assert_allclose(
            np.asarray(dev_regions), np.asarray(host_regions),
            atol=0.05, rtol=1e-4,
        )

    def test_batched_tracks_are_independent(self):
        """The device loop at B=N (uniform-frame fleet serving: N tracks of
        the same camera geometry in ONE program) must produce exactly what
        N separate B=1 loops produce — no cross-sample coupling anywhere in
        crop/VGG/cell/recrop."""
        from ntm_tracker_tpu.models.core import make_core
        from ntm_tracker_tpu.tracking.tracker import make_device_track_step

        cfg = tiny_cfg()
        core = make_core(cfg)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)

        rng = np.random.RandomState(1)
        H, W = 60, 80
        T, N = 4, 3
        frames = (rng.rand(N, T, H, W, 3) * 255).astype(np.float32)
        regions0 = [(30.0, 15.0, 20.0, 16.0), (20.0, 10.0, 24.0, 20.0),
                    (40.0, 25.0, 16.0, 12.0)]

        def norm(region):
            x, y, w, h = region
            return [y / (H - 1), x / (W - 1),
                    (y + h) / (H - 1), (x + w) / (W - 1)]

        init_fn, step_fn = make_device_track_step(cfg, core, vgg, params)

        # batched run
        bbox = jnp.asarray([norm(r) for r in regions0], jnp.float32)
        state = init_fn(jnp.asarray(frames[:, 0]), bbox,
                        core.init_state(params, N))
        batched = []
        for t in range(1, T):
            region, bbox, state = step_fn(jnp.asarray(frames[:, t]),
                                          bbox, state)
            batched.append(np.asarray(region))

        # N separate single-track runs
        for i in range(N):
            bbox1 = jnp.asarray([norm(regions0[i])], jnp.float32)
            state1 = init_fn(jnp.asarray(frames[i, 0:1]), bbox1,
                             core.init_state(params, 1))
            for t in range(1, T):
                region1, bbox1, state1 = step_fn(
                    jnp.asarray(frames[i, t:t + 1]), bbox1, state1)
                np.testing.assert_allclose(
                    batched[t - 1][i], np.asarray(region1[0]),
                    rtol=1e-5, atol=1e-4,
                )


class TestValidateAggregates:
    def test_aggregate_clamps_at_zero_per_frame_stays_raw(self, tmp_path):
        """validate's aggregates clamp disjoint frames at 0 (same contract
        as tracking/demo.py), while the returned per-frame IoUs keep the
        reference's unclamped +1-area bb_iou (test_tracker.py:59-83)."""
        from PIL import Image

        from ntm_tracker_tpu.tracking.validate import replay_sequences

        seq_dir = tmp_path / "seq0"
        seq_dir.mkdir()
        rng = np.random.RandomState(0)
        frames = []
        for i in range(3):
            arr = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
            img_path = str(tmp_path / f"{i:06d}.JPEG")
            Image.fromarray(arr).save(img_path)
            (seq_dir / f"{i:06d}.txt").write_text(
                ",".join(["0.2", "0.25", "0.8", "0.85",
                          "0.125", "0.125", "0.875", "0.875",
                          img_path, "0.0", "0.0"]))
            frames.append(f"{i:06d}")

        class Wanderer:  # reports a box far off-frame every step
            def init(self, img, region):
                pass

            def track(self, img):
                return (5000.0, 5000.0, 10.0, 10.0)

        logs = []
        ious = replay_sequences([(str(seq_dir), frames)], None, None, None,
                                tracker=Wanderer(), log=logs.append)
        assert all(i < 0 for i in ious[0])  # raw quirk preserved
        assert "mean IoU 0.000" in logs[0]  # aggregate clamped


class TestFleetValidate:
    def _build_dataset(self, tmp_path, lengths=(4, 3, 5)):
        from PIL import Image

        rng = np.random.RandomState(7)
        seqs = []
        for s, n in enumerate(lengths):
            seq_dir = tmp_path / f"seq{s}"
            seq_dir.mkdir()
            frames = []
            for i in range(n):
                arr = np.zeros((60 + 10 * s, 80 + 10 * s, 3), np.uint8)
                y, x = 20 + 2 * i, 30 + 2 * i
                arr[y:y + 16, x:x + 16] = 255  # moving bright square
                arr += (rng.rand(*arr.shape) * 20).astype(np.uint8)
                img_path = str(tmp_path / f"s{s}_{i:06d}.JPEG")
                Image.fromarray(arr).save(img_path)
                (seq_dir / f"{i:06d}.txt").write_text(
                    ",".join(["0.2", "0.25", "0.8", "0.85",
                              "0.125", "0.125", "0.875", "0.875",
                              img_path, "0.0", "0.0"]))
                frames.append(f"{i:06d}")
            seqs.append((str(seq_dir), frames))
        return seqs

    def test_fleet_replay_matches_serial(self, tmp_path):
        """validate --fleet N: the wave-scheduled batched replay
        (replay_sequences_fleet over tracking/fleet.py) reproduces the
        serial replay's per-frame IoUs — including slot refill mid-run
        (capacity 2 < 3 sequences of differing lengths) and the
        single-frame-sequence fast path."""
        from tests.test_fleet import setup as fleet_setup

        from ntm_tracker_tpu.tracking.validate import (
            replay_sequences,
            replay_sequences_fleet,
        )

        seqs = self._build_dataset(tmp_path, lengths=(4, 1, 3))
        cfg, vgg, core, params = fleet_setup()

        serial = replay_sequences(seqs, cfg, vgg, params, core,
                                  log=lambda *_: None)
        fleet = replay_sequences_fleet(seqs, cfg, vgg, params, core,
                                       capacity=2, log=lambda *_: None)
        assert [len(s) for s in serial] == [3, 0, 2]
        assert [len(s) for s in fleet] == [3, 0, 2]
        for s, f in zip(serial, fleet):
            np.testing.assert_allclose(np.asarray(f), np.asarray(s),
                                       atol=0.02, rtol=1e-3)
