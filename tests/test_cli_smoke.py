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
    def test_cache_then_train(self, dataset, tmp_path, capsys):
        cache = str(tmp_path / "cache")
        assert _run([
            "cache-features", "--sequences_dir", dataset,
            "--cache_dir", cache,
        ]) == 0
        assert _run([
            "train-offsets", *MODEL_TINY,
            "--sequences_dir", dataset, "--feature_cache", cache,
            "--sequence_length", str(SEQ_LEN), "--batch_size", "1",
            "--num_epochs", "1", "--log_interval", "1",
            "--validation_interval", "1000",
            "--log_dir", str(tmp_path / "log"),
        ]) == 0
