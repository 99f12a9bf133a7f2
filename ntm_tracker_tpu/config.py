"""Typed configuration for the whole framework.

Replaces the five per-script `tf.app.flags` blocks of the reference
(direct_offset_output.py:17-50, main.py:24-86, dnc/train.py:27-66,
preprocess.py:514-526, test_tracker.py:34-56) with one layered dataclass
config. Defaults follow the reference's primary pipeline
(direct_offset_output.py:21-49).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NTMConfig:
    """NTM cell hyper-parameters (ntm_cell.py:18-50, direct_offset_output.py:21-27)."""

    output_dim: int = 2
    mem_size: int = 128
    mem_dim: int = 20
    shift_range: int = 1
    controller_hidden_size: int = 200
    controller_num_layers: int = 1
    read_head_size: int = 4
    write_head_size: int = 1
    write_first: bool = False
    init_scale: float = 0.05  # direct_offset_output.py:42
    # use the fused Pallas addressing/update kernel for the post-controller
    # memory math (TPU only; jnp path is the reference semantics)
    use_pallas: bool = False
    # False (default) reproduces the reference's EXECUTED content addressing,
    # which l2-normalizes each mem_dim row ACROSS slots (ops.py:147-150 — an
    # upstream quirk its own golden test contradicts). True uses proper
    # slot-vector cosine for new models.
    slotwise_cosine: bool = False

    @property
    def num_heads(self) -> int:
        return self.read_head_size + self.write_head_size

    @property
    def shift_space(self) -> int:
        return 2 * self.shift_range + 1


@dataclasses.dataclass(frozen=True)
class DNCConfig:
    """DNC core hyper-parameters (dnc/dnc.py:42-76, direct_offset_output_with_dnc.py:22-30)."""

    output_dim: int = 2
    memory_size: int = 128
    word_size: int = 20
    num_reads: int = 4
    num_writes: int = 1
    hidden_size: int = 200
    clip_value: float = 20.0
    # BPTT carry-saving chunk (models/dnc/dnc.py:dnc_unroll): None = auto
    # (65 once the saved carry stream would pass ~2 GB), 0 = plain per-step
    # saving, >0 = explicit chunk length. Perf knob only; gradients exact.
    remat_chunk: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Data-layer geometry (preprocess.py:514-526, direct_offset_output.py:44-46)."""

    cropbox_grid: int = 8
    bbox_grid: int = 6
    # preprocess.py:522 default focus=4 (an INT: under Python 2 the
    # first-frame sigma is bbox_grid/focus = 6//4 = 1, and later frames use
    # the generate_gt default focus=3 -> sigma 2; geometry.generate_gt
    # reproduces the integer-division semantics)
    focus: int = 4
    gt_width: int = 8           # ground-truth heatmap side (direct_offset_output.py:44)
    crop_size: int = 224
    resize_hw: Tuple[int, int] = (720, 1280)
    deform_threshold: float = 0.1  # preprocess.py:523
    zoom_threshold: float = 0.1    # preprocess.py:524


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop knobs (direct_offset_output.py:30-48,611-626)."""

    batch_size: int = 1
    sequence_length: int = 20
    learning_rate: float = 1e-4
    decay: float = 0.95
    momentum: float = 0.9
    epsilon: float = 1e-10      # TF RMSPropOptimizer default
    max_gradient_norm: float = 5.0
    num_epochs: int = 1
    log_interval: int = 10
    validation_interval: int = 100
    validation_batch: int = 1
    seed: int = 42
    # lax.scan unroll factor for the training BPTT: 13 measured ~6% faster
    # on v5e at the cost of ~13x scan-body compile time (models/ntm_tracker
    # perf notes); 1 = fastest compile
    scan_unroll: int = 1
    # BPTT rematerialization policy: "full" (recompute the cell forward in
    # the backward), "dots" (save each step's matmul outputs, recompute
    # only elementwise addressing), "none" (save everything). See
    # models/ntm_tracker.ntm_tracker_unroll and tools/profile_train.py.
    remat_policy: str = "full"
    # memory layout of the NTM training-scan carry: "nd" (default) is the
    # reference layout; "dn" carries M transposed ([B, mem_dim, mem_size])
    # so the slot axis fills the TPU's 128 lanes. MEASURED EQUIVALENT on
    # v5e at the B=256 knee (288.8 vs 288.7 ms — XLA's layout assignment
    # already avoids the naive lane-padding tax); kept as a knob because
    # the balance can differ on other shapes/toolchains. Same math up to
    # float reassociation (models/ntm_cell.ntm_cell_step_dn).
    scan_layout: str = "nd"
    # run the NTM training BPTT as ONE fused Pallas forward + hand-derived
    # Pallas backward (ops/pallas/scan_bptt.py) instead of lax.scan +
    # autodiff. f32 compute only; grad-parity asserted in
    # tests/test_pallas_bptt.py. "auto" (default) resolves to True on a
    # single TPU chip at f32 with batch >= 64, False elsewhere (CPU runs
    # the XLA scan; pjit meshes keep the XLA scan — Pallas has no GSPMD
    # partitioning rules; sub-64 batches skip the narrow-tile Mosaic
    # compile, measured ~5 min at tile 32 — pass True to override).
    # Measured (v5e, T=1300, r4 knee sweep after the batch-tiled
    # grid removed the old B>32 ceiling and the dcontrols scratch-store
    # swap): fused beats the XLA scan at EVERY batch — 1.48x at B=32 and
    # 1.39x at the B=256 cached-training knee (207.8 vs 289.8 ms;
    # scan_bptt.py docstring has the full table).
    fused_bptt: bool | str = "auto"


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Assembled experiment config for the offset tracker
    (direct_offset_output.py / direct_offset_output_with_dnc.py)."""

    core: str = "ntm"  # "ntm" | "dnc"
    ntm: NTMConfig = dataclasses.field(default_factory=NTMConfig)
    dnc: DNCConfig = dataclasses.field(default_factory=DNCConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    num_features: int = 64      # 8x8 conv4_3 subsample (receptive_field_sizes.py:135-143)
    feature_depth: int = 512    # conv4_3 channels
    # (y,x) grid points on the endpoint feature map; None = the canonical
    # conv43Points 8x8 grid. Tests with small crops override this.
    feature_points: Optional[Tuple[Tuple[int, int], ...]] = None
    # compute dtype for the cell matmuls; params always float32.
    compute_dtype: jnp.dtype = jnp.float32
    # streaming inference kernel choice: None = auto (fused Pallas scan at
    # B=1 on TPU, jnp scan otherwise); False = always the jnp reference
    # path; True = always the fused kernel (NTM core only).
    fused_inference: Optional[bool] = None
    # matmul precision for the CELL steps of the serving frame step
    # (build_frame_step's scan; jnp path only — the fused Pallas kernel
    # has its own fixed numerics). None = the backend default (bf16
    # passes on TPU); "highest" runs the cell matmuls f32-exact while the
    # VGG stays at default precision — the serving-drift diagnostic knob
    # (tools/probe_drift_asym.py). Training is unaffected.
    cell_matmul_precision: Optional[str] = None
    # skip the conv4-block work outside the 8x8 token grid's receptive
    # field (models/vgg.py:vgg16_conv43_tokens — exact same tokens, ~24%
    # fewer conv FLOPs). Only engages for 224 crops with the canonical
    # feature grid; False forces the full-map path.
    fast_conv43: bool = True
    # OPT-IN quantized serving mode: run the VGG token convs s8xs8->s32
    # (models/vgg_int8.py; ~0.9995 token cosine vs the exact path). Changes
    # numerics — never use for parity work or training; only engages where
    # the fast_conv43 path applies (224 crops, canonical grid).
    vgg_int8: bool = False
    # BEYOND-REFERENCE scale head: the reference predicts (dy, dx) only
    # (direct_offset_output.py output_dim=2), freezing the tracked box at
    # its first-frame size — a hard IoU cap on scale-changing targets.
    # predict_scale=True adds a third tanh output ds; the decoded box is
    # the canonical box scaled by exp(ds * scale_range) about its center
    # before the (dy, dx) shift, and training supervises ds with the gt
    # box's crop-space log-scale (geometry.calculate_scale). The active
    # core's output_dim must be 3 (validate_head).
    predict_scale: bool = False
    # tanh -> log-scale range: |log s| <= scale_range per prediction
    # (0.15 = 0.86x..1.16x); also the target normalizer at training time.
    # Measured (v5e demo, 400 steps): 0.5 lets ds noise compound through
    # the recrop loop and collapses even constant-size scenes (smooth IoU
    # 0.83 -> 0.53); 0.15 bounds the per-frame damage (0.75 at 1200 steps).
    scale_range: float = 0.15

    @property
    def head_dim(self) -> int:
        """Output-head width the pipelines expect from the active core."""
        return 3 if self.predict_scale else 2

    @property
    def input_depth(self) -> int:
        # 512 + frame-delimiter bit + target-indicator bit (test_tracker.py:35)
        return self.feature_depth + 2

    @property
    def tokens_per_frame(self) -> int:
        return self.num_features + 1

    @property
    def total_steps(self) -> int:
        # direct_offset_output.py:460
        return self.train.sequence_length * self.tokens_per_frame


def validate_head(cfg: "TrackerConfig") -> None:
    """Fail fast when the active core's output layer doesn't match the
    decode contract (2 = reference offsets head, 3 = predict_scale head).
    Called from the offset pipelines' constructors — NOT from TrackerConfig
    itself, because non-tracker users (copy task, repeat-copy) size
    output_dim freely."""
    core_cfg = cfg.ntm if cfg.core == "ntm" else cfg.dnc
    if core_cfg.output_dim != cfg.head_dim:
        raise ValueError(
            f"{cfg.core} output_dim={core_cfg.output_dim} but "
            f"predict_scale={cfg.predict_scale} needs {cfg.head_dim} "
            "(set NTMConfig/DNCConfig output_dim to match)"
        )
