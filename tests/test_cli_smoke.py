"""End-to-end CLI smoke runs on a miniature on-disk dataset.

Parser-only tests (test_cli_parser.py) can't catch body-level regressions
(a NameError in a command body parses fine); these actually execute the
command functions the way `python -m ntm_tracker_tpu <cmd>` would.
"""

import os

import numpy as np
import pytest

from ntm_tracker_tpu.cli import build_parser

SEQ_LEN = 4
GT = 8  # the flag default; lstm-only's 8x8 grid must match the 64-token VGG grid


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Frame records (.txt/.bin contract, preprocess.py:329-334) with real
    JPEGs and the default 8x8 gt grid."""
    from PIL import Image

    root = str(tmp_path_factory.mktemp("ds"))
    img_dir = os.path.join(root, "imgs", "train_seq00")
    seq_dir = os.path.join(root, "cropped", "train_seq00_0")
    os.makedirs(img_dir)
    os.makedirs(seq_dir)
    rng = np.random.RandomState(3)
    for i in range(SEQ_LEN + 1):
        arr = (rng.rand(360, 640, 3) * 255).astype(np.uint8)
        img_path = os.path.join(img_dir, f"{i:06d}.JPEG")
        Image.fromarray(arr).save(img_path, quality=95)
        crop = [0.2, 0.25, 0.8, 0.85]
        bbox = [0.125, 0.125, 0.875, 0.875]
        with open(os.path.join(seq_dir, f"{i:06d}.txt"), "w") as f:
            f.write(",".join(
                [str(v) for v in crop] + [str(v) for v in bbox]
                + [img_path, str(0.02 * i), str(-0.015 * i)]
            ))
        gt = rng.rand(GT, GT)
        (gt / gt.sum()).astype(np.float64).tofile(
            os.path.join(seq_dir, f"{i:06d}.bin")
        )
    return os.path.join(root, "cropped")


class TestLstmOnlySmoke:
    def test_runs_a_training_step(self, dataset, tmp_path, capsys):
        args = build_parser().parse_args([
            "lstm-only",
            "--sequences_dir", dataset,
            "--sequence_length", str(SEQ_LEN),
            "--batch_size", "1",
            "--num_epochs", "1",
            "--hidden_size", "8",
            "--num_layers", "1",
            "--compress_dim", "4",
            "--log_interval", "1",
            "--log_dir", str(tmp_path / "log"),
        ])
        assert args.fn(args) == 0
        out = capsys.readouterr().out
        assert "loss" in out  # at least one step ran and printed


MODEL_TINY = ["--mem_size", "16", "--mem_dim", "8", "--hidden_size", "24",
              "--read_head_size", "2"]


def _run(argv):
    args = build_parser().parse_args(argv)
    return args.fn(args)


class TestCopyPasteSmoke:
    def test_runs(self, tmp_path, capsys):
        assert _run([
            "copy-paste", *MODEL_TINY, "--batch_size", "4",
            "--sequence_length", "4", "--num_epochs", "20",
            "--log_interval", "10", "--log_dir", str(tmp_path),
        ]) == 0
        assert "loss" in capsys.readouterr().out


class TestDncRepeatCopySmoke:
    def test_runs(self, tmp_path, capsys):
        assert _run([
            "dnc-repeat-copy", "--hidden_size", "16", "--memory_size", "8",
            "--word_size", "8", "--num_bits", "3", "--batch_size", "4",
            "--num_training_iterations", "15", "--report_interval", "5",
            "--checkpoint_dir", str(tmp_path / "ckpt"),
        ]) == 0


class TestHeatmapSmoke:
    def test_frame_serialization_runs(self, dataset, tmp_path, capsys):
        assert _run([
            "train-heatmap", *MODEL_TINY,
            "--sequences_dir", dataset,
            "--serialization", "frame",
            "--sequence_length", str(SEQ_LEN), "--batch_size", "1",
            "--num_epochs", "1", "--log_interval", "1",
            "--validation_interval", "1000",
            "--log_dir", str(tmp_path),
        ]) == 0


class TestSanityCheckSmoke:
    def test_runs(self, dataset, tmp_path, capsys):
        assert _run([
            "sanity-check", *MODEL_TINY,
            "--sequences_dir", dataset, "--compress_dim", "8",
            "--sequence_length", str(SEQ_LEN), "--batch_size", "1",
            "--log_dir", str(tmp_path),
        ]) == 0
        assert "similarity" in capsys.readouterr().out.lower()

    def test_trained_compressor_roundtrip(self, dataset, tmp_path, capsys):
        """sanity_check_trained (main.py:2608-2632): train-heatmap with a
        compressor, then feed its checkpoint back into the cosine check."""
        assert _run([
            "train-heatmap", *MODEL_TINY,
            "--sequences_dir", dataset,
            "--serialization", "frame", "--compress_dim", "8",
            "--sequence_length", str(SEQ_LEN), "--batch_size", "1",
            "--num_epochs", "1", "--log_interval", "1",
            "--validation_interval", "1000",
            "--log_dir", str(tmp_path / "hm"),
        ]) == 0
        runs = list((tmp_path / "hm").iterdir())
        assert len(runs) == 1
        ckpt_dir = runs[0] / "ckpt"
        assert ckpt_dir.is_dir()
        assert _run([
            "sanity-check", *MODEL_TINY,
            "--sequences_dir", dataset, "--compress_dim", "8",
            "--compressor_ckpt", str(ckpt_dir),
            "--sequence_length", str(SEQ_LEN), "--batch_size", "1",
            "--log_dir", str(tmp_path),
        ]) == 0
        out = capsys.readouterr().out.lower()
        assert "sanity_check_trained" in out

    def test_trained_compressor_wrong_dim_fails_loudly(self, dataset, tmp_path):
        with pytest.raises(SystemExit, match="compressor"):
            _run([
                "sanity-check", *MODEL_TINY,
                "--sequences_dir", dataset, "--compress_dim", "8",
                "--compressor_ckpt", str(tmp_path / "nonexistent"),
                "--sequence_length", str(SEQ_LEN), "--batch_size", "1",
                "--log_dir", str(tmp_path),
            ])


class TestFindValidationBatchSmoke:
    def test_runs(self, dataset, tmp_path, capsys):
        assert _run([
            "find-validation-batch", "--sequences_dir", dataset,
            "--sequence_length", str(SEQ_LEN), "--batch_size", "1",
            "--target_step", "2", "--log_dir", str(tmp_path),
        ]) == 0


class TestInspectBatchSmoke:
    def test_writes_grid(self, dataset, tmp_path, capsys):
        assert _run([
            "inspect-batch", "--sequences_dir", dataset,
            "--out_dir", str(tmp_path), "--sequence_length", str(SEQ_LEN),
        ]) == 0
        assert list(tmp_path.glob("*.png"))


class TestCachedTrainSmoke:
    def test_unsharded_build_runs(self, dataset, tmp_path):
        """The default (no --shard) command body — the path every user gets
        without opting into the mesh build — must stay covered end to end."""
        import pathlib

        cache = tmp_path / "cache_unsharded"
        assert _run([
            "cache-features", "--sequences_dir", dataset,
            "--cache_dir", str(cache),
        ]) == 0
        assert list(pathlib.Path(cache).rglob("*.npy"))

    def test_cache_then_train(self, dataset, tmp_path, capsys):
        cache = str(tmp_path / "cache")
        assert _run([
            "cache-features", "--sequences_dir", dataset,
            "--cache_dir", cache, "--shard",
        ]) == 0
        assert _run([
            "train-offsets", *MODEL_TINY,
            "--sequences_dir", dataset, "--feature_cache", cache,
            "--sequence_length", str(SEQ_LEN), "--batch_size", "1",
            "--num_epochs", "1", "--log_interval", "1",
            "--validation_interval", "1000",
            "--log_dir", str(tmp_path / "log"),
        ]) == 0


class TestTrackVotSmoke:
    def test_file_protocol_runs(self, tmp_path, capsys):
        from PIL import Image

        rng = np.random.RandomState(1)
        names = []
        for i in range(3):
            arr = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
            n = f"{i:08d}.jpg"
            Image.fromarray(arr).save(tmp_path / n)
            names.append(n)
        (tmp_path / "images.txt").write_text("\n".join(names) + "\n")
        (tmp_path / "region.txt").write_text("60,40,30,25")
        assert _run([
            "track-vot", *MODEL_TINY, "--workdir", str(tmp_path),
        ]) == 0
        assert "tracked" in capsys.readouterr().out
        assert (tmp_path / "output.txt").exists()

    def test_serves_converted_dnc_npz(self, tmp_path, capsys):
        """track-vot --core dnc --dnc_npz: serve a converted reference DNC
        checkpoint through the file protocol."""
        import jax

        from PIL import Image

        from ntm_tracker_tpu.config import DNCConfig, TrackerConfig
        from ntm_tracker_tpu.models.dnc.dnc import init_dnc_params
        from ntm_tracker_tpu.tools.convert_dnc_ckpt import save_params_npz

        dnc_cfg = DNCConfig(
            output_dim=2, memory_size=16, word_size=8, num_reads=2,
            num_writes=1, hidden_size=24,
        )
        params = init_dnc_params(
            jax.random.PRNGKey(7), dnc_cfg, TrackerConfig().input_depth
        )
        npz = tmp_path / "dnc_params.npz"
        save_params_npz(str(npz), params)

        rng = np.random.RandomState(5)
        names = []
        for i in range(3):
            arr = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
            n = f"{i:08d}.jpg"
            Image.fromarray(arr).save(tmp_path / n)
            names.append(n)
        (tmp_path / "images.txt").write_text("\n".join(names) + "\n")
        (tmp_path / "region.txt").write_text("60,40,30,25")
        assert _run([
            "track-vot", *MODEL_TINY, "--core", "dnc",
            "--dnc_npz", str(npz), "--workdir", str(tmp_path),
        ]) == 0
        assert "tracked" in capsys.readouterr().out
        assert (tmp_path / "output.txt").exists()

    def test_dnc_npz_requires_dnc_core(self, tmp_path):
        with pytest.raises(SystemExit, match="core dnc"):
            _run([
                "track-vot", *MODEL_TINY,
                "--dnc_npz", str(tmp_path / "x.npz"),
                "--workdir", str(tmp_path),
            ])


class TestValidateSmoke:
    def test_replay_runs(self, dataset, tmp_path, capsys):
        import pickle

        seq_dir = os.path.join(dataset, "train_seq00_0")
        frames = [f"{i:06d}" for i in range(3)]
        pkl = tmp_path / "val.pkl"
        with open(pkl, "wb") as f:
            pickle.dump([(seq_dir, frames)], f)
        assert _run([
            "validate", *MODEL_TINY, "--pickle_path", str(pkl),
            "--log_dir", str(tmp_path),
        ]) == 0
        assert "mean IoU" in capsys.readouterr().out

    def test_fleet_replay_runs(self, dataset, tmp_path, capsys):
        import pickle

        seq_dir = os.path.join(dataset, "train_seq00_0")
        frames = [f"{i:06d}" for i in range(3)]
        pkl = tmp_path / "val.pkl"
        with open(pkl, "wb") as f:
            pickle.dump([(seq_dir, frames)] * 2, f)  # 2 seqs, one wave
        assert _run([
            "validate", *MODEL_TINY, "--pickle_path", str(pkl),
            "--fleet", "2", "--log_dir", str(tmp_path),
        ]) == 0
        assert "mean IoU" in capsys.readouterr().out

    def test_negative_fleet_fails_loudly(self, tmp_path):
        with pytest.raises(SystemExit, match="positive capacity"):
            _run([
                "validate", *MODEL_TINY,
                "--pickle_path", str(tmp_path / "x.pkl"), "--fleet", "-2",
            ])



def _tiny_pickle(tmp_path, rng, n_seqs=1, n_frames=4, gt_side=28):
    """generated_sequences.pkl shape (mining.gen_sequences) with real JPEGs."""
    import pickle

    from PIL import Image

    seqs = []
    for s in range(n_seqs):
        frames = []
        for i in range(n_frames):
            arr = (rng.rand(90, 160, 3) * 255).astype(np.uint8)
            p = str(tmp_path / f"s{s}_f{i}.JPEG")
            Image.fromarray(arr).save(p)
            bbox = [(40.0 + i, 20.0), (110.0 + i, 70.0)]
            gts = [rng.rand(gt_side, gt_side) > 0.9]
            frames.append((p, (160.0, 90.0), bbox, gts))
        seqs.append((f"seq{s}", "obj", 0, n_frames, frames))
    pkl = tmp_path / "gen.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(seqs, f)
    return str(pkl)


class TestWholeframeSmoke:
    def test_runs_a_step(self, tmp_path, capsys):
        pkl = _tiny_pickle(tmp_path, np.random.RandomState(2))
        assert _run([
            "train-wholeframe", *MODEL_TINY,
            "--pickle_path", pkl, "--sequence_length", "4",
            "--batch_size", "1", "--num_epochs", "1", "--log_interval", "1",
            "--compress_dim", "8", "--feature_layer", "conv4/conv4_3",
            "--log_dir", str(tmp_path / "log"),
        ]) == 0
        assert "loss" in capsys.readouterr().out


class TestActiveResizeSmoke:
    def test_runs_a_step(self, tmp_path, capsys):
        pkl = _tiny_pickle(tmp_path, np.random.RandomState(3))
        assert _run([
            "train-active-resize", *MODEL_TINY,
            "--pickle_path", pkl, "--sequence_length", "4",
            "--batch_size", "1", "--num_epochs", "1", "--log_interval", "1",
            "--compress_dim", "8",
            "--log_dir", str(tmp_path / "log"),
        ]) == 0
        assert "loss" in capsys.readouterr().out
