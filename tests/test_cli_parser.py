"""CLI smoke: every subcommand parses with its minimal flags."""

import pytest

from ntm_tracker_tpu.cli import build_parser


@pytest.mark.parametrize(
    "argv",
    [
        ["train-offsets", "--sequences_dir", "x"],
        ["train-offsets", "--sequences_dir", "x", "--feature_cache", "c"],
        ["cache-features", "--sequences_dir", "x", "--cache_dir", "c",
         "--reverse_image", "--store_dtype", "float32", "--bf16",
         "--grid_width", "7", "--shard"],
        ["train-heatmap", "--sequences_dir", "x", "--feature_cache", "c",
         "--gt_width", "7"],
        ["inspect-batch", "--sequences_dir", "x", "--out_dir", "o",
         "--reverse_image"],
        ["train-heatmap", "--sequences_dir", "x", "--serialization", "frame"],
        ["train-wholeframe", "--pickle_path", "x.pkl", "--two_step"],
        ["lstm-only", "--sequences_dir", "x"],
        ["sanity-check", "--sequences_dir", "x", "--pca"],
        ["preprocess", "--annotation_dir", "a", "--image_dir", "i",
         "--output_dir", "o"],
        ["mine-sequences", "--image_dirs", "a,b", "--annotation_dirs", "c,d"],
        ["dnc-repeat-copy", "--num_training_iterations", "5"],
        ["copy-paste", "--width", "4"],
        ["track-vot", "--workdir", "w", "--core", "dnc", "--delimiter_first"],
        ["track-vot", "--serving_npz", "s.npz", "--vot_mode", "trax"],
        ["track-vot", "--workdir", "w", "--vgg_int8"],
        ["validate", "--pickle_path", "p.pkl"],
        ["validate", "--pickle_path", "p.pkl", "--serving_npz", "s.npz"],
        ["validate", "--pickle_path", "p.pkl", "--vgg_int8"],
        ["export-serving", "--out", "s.npz", "--platforms", "tpu,cpu",
         "--batch", "8", "--delimiter_first", "--vgg_int8"],
        ["find-validation-batch", "--sequences_dir", "x"],
        ["bench"],
        ["--platform", "cpu", "train-offsets", "--sequences_dir", "x",
         "--device_resize", "--save_imgs", "--bf16", "--core", "dnc"],
    ],
)
def test_subcommand_parses(argv):
    args = build_parser().parse_args(argv)
    assert callable(args.fn)


def test_unknown_command_rejected():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["not-a-command"])


def test_preprocess_defaults_match_dataconfig():
    """CLI preprocess defaults must equal DataConfig so a dataset built via
    CLI defaults matches one built from config (reference preprocess.py:522-523
    uses 0.1/0.1)."""
    from ntm_tracker_tpu.config import DataConfig

    args = build_parser().parse_args(
        ["preprocess", "--annotation_dir", "a", "--image_dir", "i",
         "--output_dir", "o"]
    )
    cfg = DataConfig()
    assert args.deform_threshold == cfg.deform_threshold == 0.1
    assert args.zoom_threshold == cfg.zoom_threshold == 0.1
    assert args.cropbox_grid == cfg.cropbox_grid
    assert args.bbox_grid == cfg.bbox_grid
    assert args.focus == cfg.focus


def test_gt_width_adapts_grid_for_all_commands():
    """gt_width != 8 must adapt num_features/feature_points/data.gt_width in
    _tracker_config itself (not only the heatmap branch): loader gts are
    gt_width^2, so a 64-token config against a 7x7 dataset crashes
    train-offsets / lstm-only / sanity-check."""
    from ntm_tracker_tpu.cli import _tracker_config, build_parser

    args = build_parser().parse_args(
        ["train-offsets", "--sequences_dir", "x", "--gt_width", "7"]
    )
    cfg = _tracker_config(args, "ntm")
    assert cfg.num_features == 49
    assert len(cfg.feature_points) == 49
    assert cfg.data.gt_width == 7
    # the canonical 8x8 keeps the reference conv43Points grid (which starts
    # at (6,6) — NOT the centered grid)
    args8 = build_parser().parse_args(["train-offsets", "--sequences_dir", "x"])
    cfg8 = _tracker_config(args8, "ntm")
    assert cfg8.num_features == 64 and cfg8.feature_points is None
    assert cfg8.data.gt_width == 8


def test_vgg_int8_flag_routes_into_config():
    from ntm_tracker_tpu.cli import _tracker_config, build_parser

    args = build_parser().parse_args(
        ["track-vot", "--workdir", "w", "--vgg_int8"]
    )
    assert _tracker_config(args, "ntm").vgg_int8 is True
    # commands without the flag keep the exact path
    args_off = build_parser().parse_args(
        ["train-offsets", "--sequences_dir", "x"]
    )
    assert _tracker_config(args_off, "ntm").vgg_int8 is False
