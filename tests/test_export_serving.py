"""AOT serving export (tools/export_serving.py + export-serving CLI).

The artifact must reproduce the live frame step on the same backend
(same math, pre-lowered; weights baked as constants vs the live step's
weight ARGUMENTS leave ~1e-6-scale const-folding differences), load
without touching model code, and drive the identical StreamingTracker
host-geometry loop.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ntm_tracker_tpu.config import (
    DataConfig,
    DNCConfig,
    NTMConfig,
    TrackerConfig,
)
from ntm_tracker_tpu.models.core import make_core
from ntm_tracker_tpu.models.vgg import init_vgg_params
from ntm_tracker_tpu.tools.export_serving import (
    ServingModel,
    export_serving,
    save_serving,
)
from ntm_tracker_tpu.tracking.tracker import StreamingTracker, build_frame_step


def tiny_cfg(core="ntm"):
    g = 4  # crop 32 -> 4x4 conv4_3 token grid
    return TrackerConfig(
        core=core,
        ntm=NTMConfig(mem_size=16, mem_dim=8, controller_hidden_size=24,
                      read_head_size=2),
        dnc=DNCConfig(output_dim=2, memory_size=16, word_size=8, num_reads=2,
                      num_writes=1, hidden_size=24),
        data=DataConfig(crop_size=8 * g, gt_width=g),
        num_features=g * g,
        feature_points=tuple((y, x) for y in range(g) for x in range(g)),
    )


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = tiny_cfg()
    core = make_core(cfg)
    vgg = init_vgg_params(jax.random.PRNGKey(0))
    params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
    path = str(tmp_path_factory.mktemp("export") / "serving.npz")
    save_serving(path, export_serving(cfg, core, vgg, params, batch=1))
    return cfg, core, vgg, params, path


class TestArtifactMatchesLiveStep:
    def test_first_and_steps_match(self, exported):
        cfg, core, vgg, params, path = exported
        model = ServingModel(path)
        step_first, step_rest = build_frame_step(
            cfg, core, vgg, params, donate_state=False)

        rng = np.random.RandomState(0)
        S, F = cfg.data.crop_size, cfg.num_features
        crop = rng.rand(1, S, S, 3).astype(np.float32) * 100 - 50
        gt = rng.rand(1, F).astype(np.float32)

        live_state = core.init_state(params, 1)
        live_off, live_state = step_first(jnp.asarray(crop),
                                          jnp.asarray(gt), live_state)

        # atol 1e-5, not exactness: the artifact BAKES weights as program
        # constants while the live step takes them as jit arguments (r5
        # refactor — shared compiles across weight values), so XLA
        # const-folds the two programs differently; f32 divergence is
        # ~2e-6 on ~10-magnitude state values
        leaves = model.init_state()
        off, leaves = model.first(crop, gt, leaves)
        np.testing.assert_allclose(off, np.asarray(live_off), atol=1e-5)

        for _ in range(3):
            crop = rng.rand(1, S, S, 3).astype(np.float32) * 100 - 50
            live_off, live_state = step_rest(jnp.asarray(crop), live_state)
            off, leaves = model.step(crop, leaves)
            np.testing.assert_allclose(off, np.asarray(live_off), atol=1e-5)
        # state leaves agree too (flattening order is the pytree order)
        for got, want in zip(leaves, jax.tree_util.tree_leaves(live_state)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5)

    def test_meta_fields(self, exported):
        cfg, _, _, _, path = exported
        meta = ServingModel(path).meta
        assert meta["core"] == "ntm"
        assert meta["batch"] == 1
        assert meta["crop_size"] == cfg.data.crop_size
        assert meta["num_features"] == cfg.num_features
        assert meta["data"]["cropbox_grid"] == cfg.data.cropbox_grid


class TestServingTrackerLoop:
    def test_trajectory_matches_live_tracker(self, exported):
        cfg, core, vgg, params, path = exported
        from ntm_tracker_tpu.data.synthetic import make_video

        frames, boxes = make_video(np.random.RandomState(7), 5, (60, 80))
        H, W = frames.shape[1:3]
        b0 = boxes[0]
        region0 = (b0[1] * W, b0[0] * H, (b0[3] - b0[1]) * W,
                   (b0[2] - b0[0]) * H)

        live = StreamingTracker(cfg, vgg, params, core)
        live.init(frames[0], region0)
        served = StreamingTracker.from_serving(ServingModel(path))
        served.init(frames[0], region0)
        assert served.cfg.data == cfg.data

        for t in range(1, 5):
            r_live = np.asarray(live.track(frames[t]))
            r_srv = np.asarray(served.track(frames[t]))
            np.testing.assert_allclose(r_srv, r_live, atol=1e-4)


class TestCrossPlatformExport:
    def test_multi_platform_artifact_runs_on_cpu(self, tmp_path):
        """platforms=['tpu','cpu'] lowers for BOTH targets on the CPU host
        (deploy artifacts are built wherever CI runs); the cpu branch must
        execute here and the platform list must be recorded."""
        cfg = tiny_cfg()
        core = make_core(cfg)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
        path = str(tmp_path / "xplat.npz")
        save_serving(path, export_serving(cfg, core, vgg, params, batch=1,
                                          platforms=["tpu", "cpu"]))
        model = ServingModel(path)
        assert set(model.meta["platforms"]) == {"tpu", "cpu"}
        S = cfg.data.crop_size
        off, _ = model.first(
            np.zeros((1, S, S, 3), np.float32),
            np.zeros((1, cfg.num_features), np.float32),
            model.init_state(),
        )
        assert np.isfinite(off).all()


class TestDncExport:
    def test_dnc_round_trip(self, tmp_path):
        cfg = tiny_cfg("dnc")
        core = make_core(cfg)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
        path = str(tmp_path / "dnc_serving.npz")
        save_serving(path, export_serving(cfg, core, vgg, params, batch=1))
        model = ServingModel(path)
        assert model.meta["core"] == "dnc"

        S = cfg.data.crop_size
        crop = np.zeros((1, S, S, 3), np.float32)
        gt = np.zeros((1, cfg.num_features), np.float32)
        off, leaves = model.first(crop, gt, model.init_state())
        off2, _ = model.step(crop, leaves)
        assert off.shape == off2.shape == (1, 2)
        assert np.isfinite(off).all() and np.isfinite(off2).all()


class TestInt8Export:
    def test_int8_artifact_matches_live_int8_step(self, tmp_path):
        """--vgg_int8 export: the quantized token path bakes into the
        lowered artifact (needs the canonical 224 grid — the only config
        where the int8 path engages)."""
        cfg = TrackerConfig(
            ntm=NTMConfig(mem_size=16, mem_dim=8, controller_hidden_size=24,
                          read_head_size=2),
            vgg_int8=True,
        )
        core = make_core(cfg)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
        path = str(tmp_path / "serving_int8.npz")
        save_serving(path, export_serving(cfg, core, vgg, params, batch=1))

        model = ServingModel(path)
        assert model.meta["vgg_int8"] is True  # provenance recorded
        step_first, step_rest = build_frame_step(cfg, core, vgg, params)
        rng = np.random.RandomState(0)
        crop = rng.rand(1, 224, 224, 3).astype(np.float32) * 100 - 50
        gt = np.zeros((1, cfg.num_features), np.float32)
        live_off, live_state = step_first(jnp.asarray(crop), jnp.asarray(gt),
                                          core.init_state(params, 1))
        # atol 2e-4, not exactness: the artifact bakes quantized weights
        # as constants while the live step quantizes jit ARGUMENTS (r5
        # refactor), so XLA const-folds the s8 requant chain differently
        # (measured 7.5e-5 / 0.17% relative — inside the int8 path's own
        # ~0.9995-cosine noise floor, models/vgg_int8.py)
        off, leaves = model.first(crop, gt, model.init_state())
        np.testing.assert_allclose(np.asarray(off), np.asarray(live_off),
                                   rtol=0, atol=2e-4)
        crop = rng.rand(1, 224, 224, 3).astype(np.float32) * 100 - 50
        live_off, _ = step_rest(jnp.asarray(crop), live_state)
        off, _ = model.step(crop, leaves)
        np.testing.assert_allclose(np.asarray(off), np.asarray(live_off),
                                   rtol=0, atol=2e-4)


class TestCLI:
    def test_export_serving_command(self, tmp_path, capsys):
        from ntm_tracker_tpu.cli import build_parser

        out = str(tmp_path / "serving.npz")
        args = build_parser().parse_args([
            "export-serving", "--mem_size", "16", "--mem_dim", "8",
            "--hidden_size", "24", "--read_head_size", "2",
            "--out", out,
        ])
        assert args.fn(args) == 0
        assert "exported init/first/step" in capsys.readouterr().out
        model = ServingModel(out)
        # default config: 224 crop, 64 tokens
        assert model.meta["crop_size"] == 224
        assert model.meta["num_features"] == 64

    def test_validate_serves_artifact(self, exported, tmp_path, capsys):
        """validate --serving_npz: the pickle replay driven from the AOT
        artifact."""
        import pickle

        from PIL import Image

        from ntm_tracker_tpu.cli import build_parser

        _, _, _, _, path = exported
        seq_dir = tmp_path / "seq0"
        seq_dir.mkdir()
        rng = np.random.RandomState(3)
        frames = []
        for i in range(3):
            arr = (rng.rand(90, 120, 3) * 255).astype(np.uint8)
            img_path = str(tmp_path / f"{i:06d}.JPEG")
            Image.fromarray(arr).save(img_path)
            (seq_dir / f"{i:06d}.txt").write_text(
                ",".join(["0.2", "0.25", "0.8", "0.85",
                          "0.125", "0.125", "0.875", "0.875",
                          img_path, "0.0", "0.0"]))
            frames.append(f"{i:06d}")
        pkl = tmp_path / "val.pkl"
        with open(pkl, "wb") as f:
            pickle.dump([(str(seq_dir), frames)], f)
        args = build_parser().parse_args([
            "validate", "--pickle_path", str(pkl), "--serving_npz", path,
        ])
        assert args.fn(args) == 0
        assert "overall mean IoU" in capsys.readouterr().out

    def test_track_vot_serves_artifact(self, exported, tmp_path, capsys):
        """track-vot --serving_npz: the VOT file protocol driven entirely
        from the AOT artifact (no model flags, no weights)."""
        from PIL import Image

        from ntm_tracker_tpu.cli import build_parser

        _, _, _, _, path = exported
        rng = np.random.RandomState(2)
        names = []
        for i in range(3):
            arr = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
            n = f"{i:08d}.jpg"
            Image.fromarray(arr).save(tmp_path / n)
            names.append(n)
        (tmp_path / "images.txt").write_text("\n".join(names) + "\n")
        (tmp_path / "region.txt").write_text("30,20,20,15")
        args = build_parser().parse_args([
            "track-vot", "--serving_npz", path, "--workdir", str(tmp_path),
        ])
        assert args.fn(args) == 0
        # file protocol reports a region for EVERY frame incl. the init
        # frame (reference vot.py advances _frame only on report), so 3
        # images -> 3 output regions and 4 processed frames
        assert "tracked 4 frames" in capsys.readouterr().out
        out_lines = (tmp_path / "output.txt").read_text().splitlines()
        assert len(out_lines) == 3
        assert all(len(l.split(",")) == 4 for l in out_lines)

    def test_vgg_int8_flag_mismatch_fails_loudly(self, exported, tmp_path):
        """--vgg_int8 with an exact-path artifact must fail, not silently
        serve the exact path (cli._serving_tracker invariant — the token
        path is baked into the lowered programs at export time)."""
        from ntm_tracker_tpu.cli import build_parser

        _, _, _, _, path = exported
        args = build_parser().parse_args([
            "track-vot", "--serving_npz", path, "--vgg_int8",
            "--workdir", str(tmp_path),
        ])
        with pytest.raises(SystemExit, match="exact token path"):
            args.fn(args)


class TestPortability:
    def test_pallas_configs_export_portably(self, tmp_path):
        """_portable must pin BOTH Pallas dispatch knobs: a cfg with
        NTMConfig.use_pallas=True (TPU-only Mosaic addressing kernel) still
        exports a CPU-lowerable artifact."""
        import dataclasses

        cfg = tiny_cfg()
        cfg = dataclasses.replace(
            cfg, ntm=dataclasses.replace(cfg.ntm, use_pallas=True))
        core = make_core(cfg)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
        p = str(tmp_path / "pallas_cfg.npz")
        save_serving(p, export_serving(cfg, core, vgg, params, batch=1))
        model = ServingModel(p)
        leaves = model.init_state()
        crops = np.zeros((1, cfg.data.crop_size, cfg.data.crop_size, 3),
                         np.float32)
        offsets, _ = model.step(crops, leaves)
        assert offsets.shape == (1, 2)


class TestDeviceLoopExport:
    H, W = 48, 64

    @pytest.fixture(scope="class")
    def exported_dev(self, tmp_path_factory):
        cfg = tiny_cfg()
        core = make_core(cfg)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
        path = str(tmp_path_factory.mktemp("exportd") / "serving_dev.npz")
        save_serving(path, export_serving(
            cfg, core, vgg, params, batch=1, device_loop=(self.H, self.W)))
        return cfg, core, vgg, params, path

    def test_device_loop_matches_live(self, exported_dev):
        """dinit/dstep reproduce make_device_track_step's closed-loop
        region/bbox trajectory from the artifact alone."""
        from ntm_tracker_tpu.tracking.tracker import make_device_track_step

        cfg, core, vgg, params, path = exported_dev
        model = ServingModel(path)
        assert model.has_device_loop
        assert model.meta["device_loop"] == [self.H, self.W]

        rng = np.random.RandomState(7)
        frames = (rng.rand(4, self.H, self.W, 3) * 255).astype(np.float32)
        x, y, w, h = 20.0, 12.0, 18.0, 14.0
        bbox0 = np.asarray([[y / (self.H - 1), x / (self.W - 1),
                             (y + h) / (self.H - 1),
                             (x + w) / (self.W - 1)]], np.float32)

        init_fn, step_fn = make_device_track_step(cfg, core, vgg, params)
        state_l = init_fn(frames[0:1], jnp.asarray(bbox0),
                          core.init_state(params, 1))
        bbox_l = jnp.asarray(bbox0)

        leaves = model.init_state()
        leaves = model.device_init(frames[0:1], bbox0, leaves)
        bbox_s = bbox0

        for t in range(1, 4):
            region_l, bbox_l, state_l = step_fn(frames[t:t + 1], bbox_l,
                                                state_l)
            region_s, bbox_s, leaves = model.device_step(frames[t:t + 1],
                                                         bbox_s, leaves)
            np.testing.assert_allclose(region_s, np.asarray(region_l),
                                       rtol=1e-5, atol=1e-4)
            np.testing.assert_allclose(np.asarray(bbox_s),
                                       np.asarray(bbox_l),
                                       rtol=1e-5, atol=1e-5)

    def test_plain_artifact_has_no_device_loop(self, exported_dev):
        from ntm_tracker_tpu.tools.export_serving import ServingModel as SM

        cfg, core, vgg, params, _ = exported_dev
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            p = td + "/plain.npz"
            save_serving(p, export_serving(cfg, core, vgg, params, batch=1))
            plain = SM(p)
            assert not plain.has_device_loop
            assert plain.meta["device_loop"] is None
            with pytest.raises(ValueError, match="device_loop"):
                plain.device_step(np.zeros((1, 8, 8, 3)),
                                  np.zeros((1, 4)), plain.init_state())

    def test_cli_flag_parses_and_rejects_garbage(self, tmp_path):
        from ntm_tracker_tpu.cli import build_parser

        for bad, msg in (("48x64a", "HxW"), ("0x640", "too small")):
            args = build_parser().parse_args([
                "export-serving", "--mem_size", "16", "--mem_dim", "8",
                "--hidden_size", "24", "--read_head_size", "2",
                "--device_loop", bad, "--out", str(tmp_path / "x.npz"),
            ])
            with pytest.raises(SystemExit, match=msg):
                args.fn(args)


class TestFleetServing:
    @pytest.fixture(scope="class")
    def exported2(self, tmp_path_factory):
        cfg = tiny_cfg()
        core = make_core(cfg)
        vgg = init_vgg_params(jax.random.PRNGKey(0))
        params = core.init_params(jax.random.PRNGKey(1), cfg.input_depth)
        path = str(tmp_path_factory.mktemp("export2") / "serving_b2.npz")
        save_serving(path, export_serving(cfg, core, vgg, params, batch=2))
        return cfg, core, vgg, params, path

    def test_fleet_from_serving_matches_live_fleet(self, exported2):
        """export-serving --batch N artifacts drive a FleetTracker with no
        model code: first is baked at B=1 (per-track add), init/step at N."""
        from ntm_tracker_tpu.tracking.fleet import FleetTracker

        cfg, core, vgg, params, path = exported2
        model = ServingModel(path)
        assert model.meta["batch"] == 2
        assert model.meta["first_batch"] == 1

        rng = np.random.RandomState(3)
        img_a = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
        img_b = (rng.rand(50, 70, 3) * 255).astype(np.uint8)
        region_a = (30.0, 15.0, 20.0, 16.0)
        region_b = (20.0, 10.0, 16.0, 12.0)

        live = FleetTracker(cfg, vgg, params, capacity=2, core=core)
        la, lb = live.add(img_a, region_a), live.add(img_b, region_b)
        served = FleetTracker.from_serving(model)
        sa, sb = served.add(img_a, region_a), served.add(img_b, region_b)

        for _ in range(3):
            live_out = live.step({la: img_a, lb: img_b})
            served_out = served.step({sa: img_a, sb: img_b})
            np.testing.assert_allclose(served_out[sa], live_out[la],
                                       rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(served_out[sb], live_out[lb],
                                       rtol=1e-4, atol=1e-3)
        # slot reuse through the artifact's sliced init state
        served.remove(sa)
        sa2 = served.add(img_a, region_a)
        assert sa2 == sa

    def test_streaming_tracker_rejects_fleet_artifact(self, exported2):
        *_, path = exported2
        with pytest.raises(ValueError, match="batch-1"):
            StreamingTracker.from_serving(ServingModel(path))

    def test_constructor_rejects_capacity_mismatch(self, exported2):
        """The public constructor must also refuse a serving model whose
        baked batch differs from capacity (silent state corruption
        otherwise: .at[slot] drops rows past the baked batch)."""
        from ntm_tracker_tpu.tracking.fleet import FleetTracker

        cfg, _, _, _, path = exported2
        with pytest.raises(ValueError, match="bakes batch"):
            FleetTracker(cfg, None, None, capacity=4,
                         serving_model=ServingModel(path))

    def test_validate_fleet_serves_batched_artifact(self, exported2,
                                                    tmp_path, capsys):
        """CLI success path: validate --fleet N --serving_npz with an
        artifact baked at batch N replays sequences through
        FleetTracker.from_serving."""
        import pickle

        from PIL import Image

        from ntm_tracker_tpu.cli import build_parser

        *_, path = exported2
        rng = np.random.RandomState(5)
        seqs = []
        for s in range(2):
            seq_dir = tmp_path / f"seq{s}"
            seq_dir.mkdir()
            frames = []
            for i in range(3):
                arr = (rng.rand(90, 120, 3) * 255).astype(np.uint8)
                img_path = str(tmp_path / f"s{s}_{i:06d}.JPEG")
                Image.fromarray(arr).save(img_path)
                (seq_dir / f"{i:06d}.txt").write_text(
                    ",".join(["0.2", "0.25", "0.8", "0.85",
                              "0.125", "0.125", "0.875", "0.875",
                              img_path, "0.0", "0.0"]))
                frames.append(f"{i:06d}")
            seqs.append((str(seq_dir), frames))
        pkl = tmp_path / "val.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(seqs, f)
        args = build_parser().parse_args([
            "validate", "--pickle_path", str(pkl),
            "--serving_npz", path, "--fleet", "2",
        ])
        assert args.fn(args) == 0
        assert "overall mean IoU" in capsys.readouterr().out

    def test_validate_fleet_batch_mismatch_fails_loudly(self, exported,
                                                        tmp_path):
        """validate --fleet N with an artifact baked at another batch must
        fail with the re-export guidance, not silently serve differently."""
        from ntm_tracker_tpu.cli import build_parser

        *_, path = exported
        import pickle

        with open(tmp_path / "val.pkl", "wb") as f:
            pickle.dump([], f)
        args = build_parser().parse_args([
            "validate", "--pickle_path", str(tmp_path / "val.pkl"),
            "--serving_npz", path, "--fleet", "2",
        ])
        with pytest.raises(SystemExit, match="bakes batch"):
            args.fn(args)
