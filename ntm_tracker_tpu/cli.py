"""Command-line interface — the L7 entry points.

One `python -m ntm_tracker_tpu <command>` dispatcher replacing the
reference's per-script tf.app.flags blocks:

  train-offsets     <- direct_offset_output.py (--core dnc gives
                       direct_offset_output_with_dnc.py)
  train-heatmap     <- main.py ntm_sevenbyseven/ntm_8by8/ntm_sequential
  lstm-only         <- main.py lstm_only baseline
  sanity-check      <- main.py sanity_check_compressor (+--pca)
  preprocess        <- preprocess.py
  dnc-repeat-copy   <- dnc/train.py
  track-vot         <- test_tracker.py (VOT file protocol)
  validate          <- validate_tracker.py
  copy-paste        <- main.py copy_paste
  find-validation-batch <- main.py find_validation_batch
  train-active-resize <- main.py ntm_active_resize, COMPLETED (the
                       reference function never wires its cell)
  bench             <- bench.py (headline benchmark)

Flags keep the reference names and defaults (mem_size, mem_dim,
hidden_size, num_layers, read_head_size, write_head_size, write_first,
sequence_length, batch_size, learning_rate, momentum, decay,
max_gradient_norm, validation_interval, ...).
"""

from __future__ import annotations

import argparse


import os
import sys
from datetime import datetime


def _add_model_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--mem_size", type=int, default=128)
    p.add_argument("--mem_dim", type=int, default=20)
    p.add_argument("--hidden_size", type=int, default=200)
    p.add_argument("--num_layers", type=int, default=1)
    p.add_argument("--read_head_size", type=int, default=4)
    p.add_argument("--write_head_size", type=int, default=1)
    p.add_argument("--write_first", action="store_true")
    p.add_argument("--init_scale", type=float, default=0.05)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 matmul/conv compute (params stay fp32)")
    p.add_argument("--predict_scale", action="store_true",
                   help="beyond-reference (dy,dx,ds) head: the tracker "
                   "adapts box SIZE (widens output_dim to 3; scale "
                   "targets derive from the records' crop-space bboxes)")
    p.add_argument("--scale_range", type=float, default=0.15,
                   help="tanh->log-scale range for --predict_scale "
                   "(|log s| <= scale_range per prediction)")


def _add_train_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--sequence_length", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--max_gradient_norm", type=float, default=5.0)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--decay", type=float, default=0.95)
    p.add_argument("--log_dir", default="./log")
    p.add_argument("--tag", default="")
    p.add_argument("--ckpt_path", default="")
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--validation_interval", type=int, default=100)
    p.add_argument("--validation_batch", type=int, default=1)
    p.add_argument("--gt_width", type=int, default=8)
    p.add_argument("--reverse_image", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    # multi-host data parallelism (one process per host; batch_size is the
    # GLOBAL batch — each host loads batch_size/process_count sequences)
    p.add_argument("--dist_coordinator", default=None,
                   help="coordinator host:port for jax.distributed.initialize "
                   "(omit on single-host or auto-detected clusters)")
    p.add_argument("--dist_num_processes", type=int, default=None)
    p.add_argument("--dist_process_id", type=int, default=None)
    p.add_argument(
        "--profile_steps", default="",
        help="capture a jax.profiler device trace over a step window, "
        "e.g. 120:130 (lands in <log_dir>/profile, open with TensorBoard)",
    )


def _tracker_config(args, core: str):
    from ntm_tracker_tpu.config import (
        DataConfig,
        DNCConfig,
        NTMConfig,
        TrackerConfig,
        TrainConfig,
    )

    import jax.numpy as jnp

    # gt_width != 8 changes the token/heatmap grid for EVERY consumer of
    # the gt records (loader gts are gt_width^2): a centered stride-2 grid
    # on the 28x28 conv4_3 map (the reference's 7x7 variants, main.py:54,80)
    gw = getattr(args, "gt_width", 8)
    grid_kwargs = (
        {} if gw == 8
        else {"num_features": gw * gw, "feature_points": _centered_grid(gw)}
    )
    predict_scale = getattr(args, "predict_scale", False)
    out_dim = 3 if predict_scale else 2
    return TrackerConfig(
        core=core,
        **grid_kwargs,
        data=DataConfig(gt_width=gw),
        vgg_int8=getattr(args, "vgg_int8", False),
        compute_dtype=jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32,
        predict_scale=predict_scale,
        # fallback must agree with TrackerConfig.scale_range (0.15): 0.5 is
        # the measured-collapsing value (config.py), and a programmatic
        # caller setting predict_scale without scale_range would get it
        scale_range=getattr(args, "scale_range", TrackerConfig.scale_range),
        ntm=NTMConfig(
            output_dim=out_dim, mem_size=args.mem_size, mem_dim=args.mem_dim,
            controller_hidden_size=args.hidden_size,
            controller_num_layers=args.num_layers,
            read_head_size=args.read_head_size,
            write_head_size=args.write_head_size,
            write_first=args.write_first, init_scale=args.init_scale,
        ),
        dnc=DNCConfig(
            output_dim=out_dim, memory_size=args.mem_size, word_size=args.mem_dim,
            num_reads=args.read_head_size, num_writes=args.write_head_size,
            hidden_size=args.hidden_size,
        ),
        train=TrainConfig(
            batch_size=args.batch_size, sequence_length=args.sequence_length,
            learning_rate=args.learning_rate, decay=args.decay,
            momentum=args.momentum, max_gradient_norm=args.max_gradient_norm,
            num_epochs=args.num_epochs, log_interval=args.log_interval,
            validation_interval=args.validation_interval,
            validation_batch=args.validation_batch, seed=args.seed,
        ),
    )


def _load_vgg(args):
    import jax

    from ntm_tracker_tpu.models import vgg

    path = getattr(args, "vgg_weights", "")
    if path and path.endswith(".npz"):
        return vgg.load_params_npz(path)
    if path:
        import torch

        return vgg.load_params_torch(torch.load(path, map_location="cpu"))
    import sys

    # stderr: track-vot's trax mode owns stdout for the wire protocol
    print("WARNING: no --vgg_weights given; using random VGG init",
          file=sys.stderr)
    return vgg.init_vgg_params(jax.random.PRNGKey(0))


def _centered_grid(gw: int):
    """gt_width-derived stride-2 token grid centered on the 28x28 conv4_3
    map (the reference's 7x7/8x8 heatmap variants, main.py:54,80)."""
    start = (28 - 2 * (gw - 1)) // 2
    return tuple(
        (start + 2 * y, start + 2 * x) for y in range(gw) for x in range(gw)
    )


def _make_experiment(args, cfg, vgg_params):
    """Build the experiment object for the selected training command."""
    from ntm_tracker_tpu.train.experiments import HeatmapExperiment, OffsetExperiment

    kind = getattr(args, "experiment", "offsets")
    # host path pre-resizes with TF1 sampling semantics (loader.
    # tf1_resize_bilinear_np) -> device skips resize; --device_resize ships
    # raw frames and runs the identical TF1 grid on device instead
    mode = "raw" if getattr(args, "device_resize", False) else "resized"
    if kind == "offsets":
        return OffsetExperiment(cfg, vgg_params, image_mode=mode)
    # heatmap variants: output_dim = num_features (frame) or 1 (sequential)
    import dataclasses as _dc

    serialization = getattr(args, "serialization", "sequential")
    # the gt_width-derived token grid is already applied by _tracker_config
    out_dim = 1 if serialization == "sequential" else cfg.num_features
    cfg = _dc.replace(
        cfg,
        ntm=_dc.replace(cfg.ntm, output_dim=out_dim),
        dnc=_dc.replace(cfg.dnc, output_dim=out_dim),
    )
    return HeatmapExperiment(
        cfg, vgg_params, image_mode=mode,
        serialization=serialization,
        compress_dim=getattr(args, "compress_dim", 0),
    )


def cmd_train_offsets(args) -> int:
    import jax

    from ntm_tracker_tpu.parallel.distributed import (
        global_batch_from_local,
        initialize_distributed,
        process_shard_sequences,
    )

    # must run before any computation touches the devices
    initialize_distributed(
        args.dist_coordinator, args.dist_num_processes, args.dist_process_id
    )

    import jax.numpy as jnp
    import numpy as np

    from ntm_tracker_tpu.data.loader import PrefetchIterator, batch_iterator
    from ntm_tracker_tpu.data.sequences import get_valid_sequences
    from ntm_tracker_tpu.parallel.mesh import make_mesh, parallel_train_step, shard_batch
    from ntm_tracker_tpu.train.harness import CheckpointManager, train_loop

    cfg = _tracker_config(args, args.core)
    real_log_dir = os.path.abspath(
        os.path.join(args.log_dir, str(datetime.now()) + args.tag)
    )
    print("real log dir:", real_log_dir)

    feature_cache = getattr(args, "feature_cache", "")
    if feature_cache:
        # tokens come precomputed (cache-features); VGG weights are only
        # needed to verify the cache fingerprint, not to train
        vgg_params = _load_vgg(args) if args.vgg_weights else None
        if vgg_params is None:
            print("NOTE: feature-cache training without --vgg_weights; "
                  "cache fingerprint trusted from the manifest")
    else:
        vgg_params = _load_vgg(args)
    exp = _make_experiment(args, cfg, vgg_params)
    if feature_cache:
        # verify against the EXPERIMENT's config (train-heatmap swaps in a
        # gt_width-derived feature grid, which needs a matching cache built
        # with cache-features --grid_width)
        from ntm_tracker_tpu.data.feature_cache import verify_cache

        verify_cache(exp.cfg, feature_cache, flip=args.reverse_image,
                     vgg_params=vgg_params)
    params, opt_state = exp.init(jax.random.PRNGKey(cfg.train.seed))

    ckpt = CheckpointManager(os.path.join(real_log_dir, "ckpt"))
    if args.ckpt_path:
        restored = CheckpointManager(args.ckpt_path).restore(
            template={"params": params, "opt_state": opt_state}
        )
        params, opt_state = restored["params"], restored["opt_state"]
        print("restored from", args.ckpt_path)

    _, train_seqs, val_seqs = get_valid_sequences(
        args.sequences_dir, cfg.train.sequence_length
    )
    limit = getattr(args, "limit", 0)
    if limit > 0:
        # dress rehearsal (MIGRATION.md real-data runbook): cap BOTH
        # splits so a first full-dataset bring-up runs in minutes
        train_seqs, val_seqs = train_seqs[:limit], val_seqs[:limit]
        print(f"--limit {limit}: {len(train_seqs)} train / "
              f"{len(val_seqs)} val sequences kept")
    n_proc = jax.process_count()
    if n_proc > 1:
        # disjoint dataset shard per host; global batch split evenly.
        # validation is optional — a val set smaller than the fleet must
        # not kill the training run (empty shards skip the val loop)
        train_seqs = process_shard_sequences(train_seqs)
        val_seqs = process_shard_sequences(val_seqs, allow_empty=True)
        if cfg.train.batch_size % n_proc:
            raise SystemExit(
                f"--batch_size {cfg.train.batch_size} must divide by the "
                f"{n_proc} processes"
            )
    local_bs = cfg.train.batch_size // n_proc
    print(f"{len(train_seqs)} train seqs, {len(val_seqs)} val seqs"
          + (f" (process {jax.process_index()}/{n_proc})" if n_proc > 1 else ""))

    mesh = make_mesh(batch_size=cfg.train.batch_size)
    if mesh.devices.size < len(jax.devices()):
        print(f"NOTE: using {mesh.devices.size}/{len(jax.devices())} devices "
              f"(batch_size {cfg.train.batch_size} must divide the mesh)")
    from ntm_tracker_tpu.train.experiments import train_step_with_bptt_fallback

    # guarded first compile: a fused-BPTT Mosaic/compile-service failure
    # (the B=512 HTTP-500 class, ops/pallas/scan_bptt.py) falls back to
    # the XLA-scan BPTT instead of killing the training run
    pstep = train_step_with_bptt_fallback(
        exp,
        build=lambda e: parallel_train_step(
            e.make_train_step(), mesh, donate_argnums=()
        ),
    )
    eval_base = jax.jit(exp.make_eval_step())

    if getattr(args, "save_imgs", False):
        # PNG dashboards of crops / gt offsets / predictions at validation
        # time (the reference wrote one EVERY step, direct_offset_output.py:348
        # — here it is validation-cadence and opt-in)
        from ntm_tracker_tpu.models.vgg import VGG_MEAN
        from ntm_tracker_tpu.utils.viz import save_imgs, save_memory_panels

        counter = {"n": 0}
        # ONE forward per validation batch: loss/preds + memory dashboards
        # (at most ~256 snapshots over the token stream) share the tokens
        # and the unroll
        eval_views_fn = jax.jit(lambda p, b: exp.eval_with_views(p, b))
        read_heads = (
            cfg.ntm.read_head_size if args.core == "ntm" else cfg.dnc.num_reads
        )

        def eval_jit(p, b):
            aux, views = eval_views_fn(p, b)
            save_memory_panels(
                views, read_heads,
                f"step_{counter['n']}_memory", real_log_dir,
            )
            if "pred_offsets" in aux and "images" in b:
                L = cfg.train.sequence_length
                crops = np.asarray(exp.images_to_crops(
                    b["images"], b["cropboxes"]
                )) + VGG_MEAN
                B = crops.shape[0] // L
                sz = crops.shape[1]
                offsets = np.stack(
                    [np.asarray(b["y_offsets"]), np.asarray(b["x_offsets"])], -1
                ).reshape(B, L, 2)
                preds = np.concatenate(
                    [np.zeros((B, 1, 2)), np.asarray(aux["pred_offsets"])], axis=1
                )
                save_imgs(
                    [np.clip(crops, 0, 255).astype(np.uint8).reshape(B, L, sz, sz, 3),
                     offsets, preds],
                    f"step_{counter['n']}_validation", real_log_dir,
                )
            counter["n"] += 1
            return aux
    else:
        eval_jit = eval_base

    dev_resize = getattr(args, "device_resize", False)
    if dev_resize and getattr(args, "reverse_image", False):
        print("NOTE: --reverse_image flips before the resize on the raw "
              "path (TF1 grid is not flip-equivariant); using host resize")
        dev_resize = False

    # single-host: device_put with the batch sharding; multi-host: assemble
    # each process's local slice into globally-sharded arrays
    put = (
        (lambda b: shard_batch(mesh, b)) if n_proc == 1
        else (lambda b: global_batch_from_local(mesh, b))
    )

    if feature_cache:
        from ntm_tracker_tpu.data.feature_cache import token_batch_iterator

        def to_device(tb):
            b = {
                # tokens ship in the cache's storage dtype (float16 halves
                # the transfer); loss_fn casts to float32 on device
                "features": tb.features,
                "gts": tb.gts,
                "y_offsets": tb.y_offsets,
                "x_offsets": tb.x_offsets,
            }
            if cfg.predict_scale:
                b["scales"] = tb.scales / cfg.scale_range
            return put(b)

        train_it = PrefetchIterator(
            token_batch_iterator(train_seqs, local_bs, feature_cache,
                                 args.gt_width, shuffle=True,
                                 seed=cfg.train.seed,
                                 reverse_image=args.reverse_image,
                                 epochs=cfg.train.num_epochs,
                                 cropbox_grid=cfg.data.cropbox_grid,
                                 bbox_grid=cfg.data.bbox_grid),
            prefetch=2, device_put=to_device,
        )

        def val_batches():
            return (
                to_device(tb)
                for tb in token_batch_iterator(val_seqs, local_bs,
                                               feature_cache, args.gt_width,
                                               shuffle=True,
                                               seed=cfg.train.seed, epochs=1,
                                               reverse_image=args.reverse_image,
                                               cropbox_grid=cfg.data.cropbox_grid,
                                               bbox_grid=cfg.data.bbox_grid)
            )
    else:
        def to_device(fb):
            b = {
                # raw mode ships uint8 and casts on device (preprocess_frame
                # does astype(float32)); resized mode is already float32
                "images": fb.images if dev_resize else fb.images.astype(np.float32),
                "cropboxes": fb.cropboxes,
                "gts": fb.gts,
                "y_offsets": fb.y_offsets,
                "x_offsets": fb.x_offsets,
            }
            if cfg.predict_scale:
                b["scales"] = fb.scales / cfg.scale_range
            return put(b)

        train_it = PrefetchIterator(
            batch_iterator(train_seqs, local_bs, args.gt_width,
                           shuffle=True, seed=cfg.train.seed,
                           reverse_image=args.reverse_image,
                           epochs=cfg.train.num_epochs,
                           decode_resize_hw=None if dev_resize else (720, 1280),
                           cropbox_grid=cfg.data.cropbox_grid,
                           bbox_grid=cfg.data.bbox_grid),
            prefetch=2, device_put=to_device,
        )

        def val_batches():
            return (
                to_device(fb)
                for fb in batch_iterator(val_seqs, local_bs,
                                         args.gt_width, shuffle=True,
                                         seed=cfg.train.seed, epochs=1,
                                         reverse_image=args.reverse_image,
                                         decode_resize_hw=None if dev_resize
                                         else (720, 1280),
                                         cropbox_grid=cfg.data.cropbox_grid,
                                         bbox_grid=cfg.data.bbox_grid)
            )

    from ntm_tracker_tpu.utils.profiling import parse_profile_steps

    params, opt_state, steps = train_loop(
        pstep, lambda p, b: eval_jit(p, b), params, opt_state,
        train_it, val_batches,
        log_dir=real_log_dir,
        validation_interval=cfg.train.validation_interval,
        validation_batch=cfg.train.validation_batch,
        log_interval=cfg.train.log_interval,
        checkpoint=ckpt,
        profile_steps=parse_profile_steps(getattr(args, "profile_steps", "")),
    )
    ckpt.save(steps, {"params": params, "opt_state": opt_state})
    print(f"trained {steps} steps; final checkpoint in {real_log_dir}/ckpt")
    return 0


def cmd_preprocess(args) -> int:
    from ntm_tracker_tpu.config import DataConfig
    from ntm_tracker_tpu.data.preprocess import PreprocessJob, run_preprocess

    job = PreprocessJob(
        annotation_dir=args.annotation_dir,
        image_dir=args.image_dir,
        output_dir=args.output_dir,
        data=DataConfig(
            cropbox_grid=args.cropbox_grid, bbox_grid=args.bbox_grid,
            focus=args.focus, deform_threshold=args.deform_threshold,
            zoom_threshold=args.zoom_threshold,
        ),
    )
    if args.augment:
        from ntm_tracker_tpu.data.augment import run_preprocess_augmented

        n = run_preprocess_augmented(
            job, seq_length=args.max_sequence_length, seed=args.augment_seed,
            num_workers=args.num_workers, limit=args.limit,
        )
    else:
        n = run_preprocess(job, num_workers=args.num_workers,
                           limit=args.limit)
    print(f"generated {n} frames")
    return 0


def cmd_dnc_repeat_copy(args) -> int:
    from ntm_tracker_tpu.train.dnc_trainer import (
        RepeatCopyTrainConfig,
        train_repeat_copy,
    )

    cfg = RepeatCopyTrainConfig(
        hidden_size=args.hidden_size, memory_size=args.memory_size,
        word_size=args.word_size, num_write_heads=args.num_write_heads,
        num_read_heads=args.num_read_heads, clip_value=args.clip_value,
        max_grad_norm=args.max_grad_norm, learning_rate=args.learning_rate,
        optimizer_epsilon=args.optimizer_epsilon, batch_size=args.batch_size,
        num_bits=args.num_bits, min_length=args.min_length,
        max_length=args.max_length, min_repeats=args.min_repeats,
        max_repeats=args.max_repeats,
        num_training_iterations=args.num_training_iterations,
        report_interval=args.report_interval,
        checkpoint_interval=args.checkpoint_interval,
        checkpoint_dir=args.checkpoint_dir, seed=args.seed,
    )
    train_repeat_copy(cfg)
    return 0


def cmd_copy_paste(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ntm_tracker_tpu.config import NTMConfig
    from ntm_tracker_tpu.models.ntm_cell import init_ntm_params
    from ntm_tracker_tpu.train.experiments import copy_paste_loss, make_copy_paste_batch
    from ntm_tracker_tpu.train.optim import reference_optimizer

    ncfg = NTMConfig(
        output_dim=args.width + 1, mem_size=args.mem_size, mem_dim=args.mem_dim,
        controller_hidden_size=args.hidden_size,
        controller_num_layers=args.num_layers,
        read_head_size=args.read_head_size,
        write_head_size=args.write_head_size,
        write_first=args.write_first, init_scale=args.init_scale,
    )
    params = init_ntm_params(jax.random.PRNGKey(args.seed), ncfg, args.width + 1)
    opt = reference_optimizer(args.learning_rate, args.decay, args.momentum,
                              1e-10, args.max_gradient_norm)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, x, y):
        loss, g = jax.value_and_grad(copy_paste_loss)(p, ncfg, x, y)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    rng = np.random.RandomState(args.seed)
    for epoch in range(args.num_epochs):
        x, y = make_copy_paste_batch(rng, args.batch_size, args.width,
                                     args.sequence_length)
        params, opt_state, loss = step(params, opt_state, jnp.array(x), jnp.array(y))
        print(f"{epoch}: loss {float(loss)}")
    return 0


def _load_converted_npz(args, cfg, template_params):
    """Load converted REFERENCE weights (--ntm_npz / --dnc_npz), validated
    structurally against the live model config before serving."""
    from ntm_tracker_tpu.tools.convert_ntm_ckpt import validate_params_like

    ntm_npz = getattr(args, "ntm_npz", "")
    dnc_npz = getattr(args, "dnc_npz", "")
    if ntm_npz and dnc_npz:
        raise SystemExit("pass only one of --ntm_npz / --dnc_npz")
    if ntm_npz:
        if cfg.core != "ntm":
            raise SystemExit("--ntm_npz serves the NTM core; pass --core ntm "
                             "(or use --dnc_npz for DNC checkpoints)")
        from ntm_tracker_tpu.tools.convert_ntm_ckpt import load_params_npz
        loaded = load_params_npz(ntm_npz)
    else:
        if cfg.core != "dnc":
            raise SystemExit("--dnc_npz serves the DNC core; pass --core dnc")
        from ntm_tracker_tpu.tools.convert_dnc_ckpt import load_params_npz
        loaded = load_params_npz(dnc_npz)
    validate_params_like(loaded, template_params,
                         flag="--ntm_npz" if ntm_npz else "--dnc_npz")
    return loaded


def _resolve_tracker_weights(args, cfg, core):
    """Shared weight resolution for the serving commands (track-vot /
    export-serving): converted reference .npz beats --ckpt_path beats
    random init."""
    import jax

    from ntm_tracker_tpu.train.harness import CheckpointManager

    params = core.init_params(jax.random.PRNGKey(0), cfg.input_depth)
    if getattr(args, "ntm_npz", "") or getattr(args, "dnc_npz", ""):
        # converted REFERENCE weights (convert-ntm / convert-dnc): serve a
        # TF-trained tracker without retraining
        return _load_converted_npz(args, cfg, params)
    if args.ckpt_path:
        restored = CheckpointManager(args.ckpt_path).restore(
            template={"params": params}, partial=True
        )
        return restored["params"]
    return params


def _load_serving_model(serving_npz: str, args):
    """Load an AOT artifact, cross-checking the baked token path against
    --vgg_int8: the artifact's lowered programs fix exact-vs-int8 at export
    time, so a flag that disagrees with the file must fail loudly instead
    of silently serving the other path (same invariant as
    train/experiments.py's feature-cache check)."""
    import sys

    from ntm_tracker_tpu.tools.export_serving import ServingModel

    model = ServingModel(serving_npz)
    baked = bool(model.meta.get("vgg_int8"))
    if getattr(args, "vgg_int8", False) and not baked:
        raise SystemExit(
            f"--vgg_int8 requested but {serving_npz} was exported with the "
            "exact token path; re-export with export-serving --vgg_int8")
    if baked and not getattr(args, "vgg_int8", False):
        print(f"note: {serving_npz} bakes int8 VGG tokens (quantized "
              "numerics); exported that way via export-serving --vgg_int8",
              file=sys.stderr)
    return model


def _serving_tracker(serving_npz: str, args):
    """StreamingTracker from an AOT artifact (int8 flag cross-checked)."""
    from ntm_tracker_tpu.tracking.tracker import StreamingTracker

    return StreamingTracker.from_serving(_load_serving_model(serving_npz, args))


def cmd_track_vot(args) -> int:
    import numpy as np
    from PIL import Image

    from ntm_tracker_tpu.models.core import make_core
    from ntm_tracker_tpu.tracking import vot
    from ntm_tracker_tpu.tracking.tracker import StreamingTracker

    serving_npz = getattr(args, "serving_npz", "")
    if serving_npz:
        # AOT artifact (export-serving output): geometry, token order and
        # weights all live inside it — model flags are ignored, except
        # --vgg_int8 which is cross-checked against the baked token path
        tracker = _serving_tracker(serving_npz, args)
    else:
        cfg = _tracker_config(args, args.core)
        vgg_params = _load_vgg(args)
        core = make_core(cfg)
        params = _resolve_tracker_weights(args, cfg, core)
        tracker = StreamingTracker(
            cfg, vgg_params, params, core,
            delimiter_first=getattr(args, "delimiter_first", False),
        )

    vot_mode = getattr(args, "vot_mode", "auto")
    handle = vot.VOT("rectangle", workdir=args.workdir, mode=vot_mode)
    trax_wire = hasattr(handle, "_trax_native") or hasattr(handle, "_trax")
    selection = handle.region()
    imagefile = handle.frame()
    if not imagefile:
        return 0
    img = np.asarray(Image.open(imagefile).convert("RGB"))
    tracker.init(img, (selection.x, selection.y, selection.width, selection.height))
    count = 1
    while True:
        imagefile = handle.frame()
        if not imagefile:
            break
        img = np.asarray(Image.open(imagefile).convert("RGB"))
        x, y, w, h = tracker.track(img)
        handle.report(vot.Rectangle(x, y, w, h))
        count += 1
    handle.quit()
    # in trax mode stdout carries the protocol — keep chatter off it
    import sys as _sys
    print(f"tracked {count} frames",
          file=_sys.stderr if trax_wire else _sys.stdout)
    return 0


def _pickle_epoch_loop(args, cfg, seqs, make_batch, step, params, opt_state,
                       ckpt, real_log_dir) -> int:
    """The shuffle/step/log/checkpoint epoch loop shared by the
    pickle-dataset trainers (the reference's train_and_val shape,
    main.py:603-693). make_batch(index, seqs) -> (device batch, new index)."""
    import random as _random

    rng = _random.Random(cfg.train.seed)
    stepno = 0
    B = cfg.train.batch_size
    for _epoch in range(cfg.train.num_epochs):
        rng.shuffle(seqs)
        index = 0
        usable = len(seqs) // B * B
        while index < usable:
            batch, index = make_batch(index, seqs)
            params, opt_state, m = step(params, opt_state, batch)
            if stepno % args.log_interval == 0:
                print(f"{stepno}: loss {float(m['loss']):.5f}")
            if stepno and stepno % args.validation_interval == 0:
                ckpt.save(stepno, {"params": params, "opt_state": opt_state})
            stepno += 1
    ckpt.save(stepno, {"params": params, "opt_state": opt_state})
    print(f"trained {stepno} steps; checkpoint in {real_log_dir}/ckpt")
    return 0


def cmd_train_wholeframe(args) -> int:
    """ntm()/ntm_two_step() on the pickle-based mined dataset
    (main.py:780-977 + default_get_batch)."""
    import jax
    import jax.numpy as jnp

    from ntm_tracker_tpu.data.pickle_dataset import (
        default_get_batch,
        load_generated_sequences,
        load_wholeframe_batch,
    )
    from ntm_tracker_tpu.train.experiments import WholeFrameExperiment

    cfg = _tracker_config(args, "ntm")
    vgg_params = _load_vgg(args)
    exp = WholeFrameExperiment(
        cfg, vgg_params, endpoint=args.feature_layer,
        two_step=args.two_step, compress_dim=args.compress_dim,
    )
    params, opt_state = exp.init(jax.random.PRNGKey(cfg.train.seed))
    step = jax.jit(exp.make_train_step())

    from ntm_tracker_tpu.train.harness import CheckpointManager

    real_log_dir = os.path.abspath(
        os.path.join(args.log_dir, str(datetime.now()) + args.tag)
    )
    ckpt = CheckpointManager(os.path.join(real_log_dir, "ckpt"))
    if args.ckpt_path:
        restored = CheckpointManager(args.ckpt_path).restore(
            template={"params": params}, partial=True
        )
        params = restored["params"]

    seqs = load_generated_sequences(args.pickle_path, cfg.train.sequence_length)
    print(f"{len(seqs)} sequences after length filtering")

    def make_batch(index, seqs):
        frame_names, gts, index = default_get_batch(
            index, cfg.train.batch_size, cfg.train.sequence_length, seqs
        )
        images = load_wholeframe_batch(frame_names, cfg.data.crop_size)
        return {"images": jnp.asarray(images), "gts": jnp.asarray(gts)}, index

    return _pickle_epoch_loop(
        args, cfg, seqs, make_batch, step, params, opt_state, ckpt, real_log_dir
    )


def cmd_train_active_resize(args) -> int:
    """Closed-loop recrop training — the completed form of the reference's
    unfinished ntm_active_resize (main.py:1294-1422; train/active_resize.py)."""
    import jax
    import jax.numpy as jnp

    from ntm_tracker_tpu.data.pickle_dataset import (
        active_resize_get_batch,
        load_generated_sequences,
        load_wholeframe_batch,
    )
    from ntm_tracker_tpu.train.active_resize import ActiveResizeExperiment
    from ntm_tracker_tpu.train.harness import CheckpointManager

    cfg = _tracker_config(args, "ntm")
    vgg_params = _load_vgg(args)
    exp = ActiveResizeExperiment(cfg, vgg_params, compress_dim=args.compress_dim)
    params, opt_state = exp.init(jax.random.PRNGKey(cfg.train.seed))
    step = jax.jit(exp.make_train_step())

    real_log_dir = os.path.abspath(
        os.path.join(args.log_dir, str(datetime.now()) + args.tag)
    )
    ckpt = CheckpointManager(os.path.join(real_log_dir, "ckpt"))
    if args.ckpt_path:
        restored = CheckpointManager(args.ckpt_path).restore(
            template={"params": params}, partial=True
        )
        params = restored["params"]

    seqs = load_generated_sequences(args.pickle_path, cfg.train.sequence_length)
    print(f"{len(seqs)} sequences after length filtering")
    B, L, S = cfg.train.batch_size, cfg.train.sequence_length, cfg.data.crop_size

    def make_batch(index, seqs):
        frame_names, boxes, index = active_resize_get_batch(index, B, L, seqs)
        frames = load_wholeframe_batch(frame_names, S)
        return {
            "frames": jnp.asarray(frames.reshape(B, L, S, S, 3)),
            "bboxes": jnp.asarray(boxes),
        }, index

    return _pickle_epoch_loop(
        args, cfg, seqs, make_batch, step, params, opt_state, ckpt, real_log_dir
    )


def cmd_lstm_only(args) -> int:
    """LSTM-only baseline training on the heatmap task (main.py:695-778)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ntm_tracker_tpu.data.loader import batch_iterator
    from ntm_tracker_tpu.data.sequences import get_valid_sequences
    from ntm_tracker_tpu.train.optim import reference_optimizer
    from ntm_tracker_tpu.train.zoo import (
        compress_features,
        init_compressor,
        init_lstm_baseline,
        lstm_baseline_loss,
    )

    cfg = _tracker_config(args, "ntm")
    vgg_params = _load_vgg(args)
    F = cfg.num_features
    ks = jax.random.split(jax.random.PRNGKey(cfg.train.seed), 2)
    params = {
        "compressor": init_compressor(ks[0], cfg.feature_depth, args.compress_dim),
        "lstm": init_lstm_baseline(
            ks[1], F, args.compress_dim, args.hidden_size, args.num_layers
        ),
    }
    opt = reference_optimizer(args.learning_rate, args.decay, args.momentum,
                              1e-10, args.max_gradient_norm)
    opt_state = opt.init(params)

    from ntm_tracker_tpu.data.image_ops import preprocess_frame

    def loss_fn(p, images, cropboxes, gts):
        crops = jax.vmap(
            lambda im, cb: preprocess_frame(im, cb, resize_hw=cfg.data.resize_hw,
                                            crop_size=cfg.data.crop_size)
        )(images, cropboxes)
        from ntm_tracker_tpu.train.experiments import frame_tokens

        feats = frame_tokens(cfg, vgg_params, crops)
        L = cfg.train.sequence_length
        B = feats.shape[0] // L
        feats = compress_features(
            feats.reshape(B, L, F, cfg.feature_depth), p["compressor"]
        )
        gts = gts.reshape(B, L, F)
        return lstm_baseline_loss(p["lstm"], feats, gts[:, 0, :], gts)

    @jax.jit
    def step(p, s, images, cropboxes, gts):
        loss, g = jax.value_and_grad(loss_fn)(p, images, cropboxes, gts)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    _, train_seqs, _ = get_valid_sequences(args.sequences_dir, cfg.train.sequence_length)
    for i, fb in enumerate(
        batch_iterator(train_seqs, cfg.train.batch_size, args.gt_width,
                       seed=cfg.train.seed, epochs=cfg.train.num_epochs)
    ):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(fb.images, jnp.float32),
            jnp.asarray(fb.cropboxes), jnp.asarray(fb.gts),
        )
        if i % args.log_interval == 0:
            print(f"{i}: loss {float(loss):.5f}")
    return 0


def cmd_sanity_check(args) -> int:
    """Cosine-similarity heatmap sanity check (main.py:1425-1538): verify the
    VGG features (raw / compressed / PCA'd) can reproduce the gt heatmap
    without any training; writes similarity-vs-gt PNG grids."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ntm_tracker_tpu.data.image_ops import preprocess_frame
    from ntm_tracker_tpu.data.loader import load_frame_batch
    from ntm_tracker_tpu.data.sequences import get_valid_sequences, sevenbyseven_get_batch
    from ntm_tracker_tpu.train.zoo import sanity_check_pca, sanity_check_similarity
    from ntm_tracker_tpu.utils.viz import save_imgs

    cfg = _tracker_config(args, "ntm")
    vgg_params = _load_vgg(args)
    _, train_seqs, _ = get_valid_sequences(args.sequences_dir, cfg.train.sequence_length)
    frame_names, _ = sevenbyseven_get_batch(0, cfg.train.batch_size, train_seqs)
    fb = load_frame_batch(frame_names, args.gt_width)
    crops = jax.vmap(
        lambda im, cb: preprocess_frame(jnp.asarray(im, jnp.float32), cb,
                                        resize_hw=cfg.data.resize_hw,
                                        crop_size=cfg.data.crop_size)
    )(jnp.asarray(fb.images, jnp.float32), jnp.asarray(fb.cropboxes))
    from ntm_tracker_tpu.train.experiments import frame_tokens

    feats = frame_tokens(cfg, vgg_params, crops)
    L = cfg.train.sequence_length
    B = feats.shape[0] // L
    F = cfg.num_features
    feats = feats.reshape(B, L, F, cfg.feature_depth)
    gts = jnp.asarray(fb.gts).reshape(B, L, F)
    name = "sanity_check"
    if args.pca and args.compressor_ckpt:
        raise SystemExit("--pca and --compressor_ckpt are mutually exclusive")
    if args.pca:
        sim = sanity_check_pca(np.asarray(feats), gts, args.compress_dim)
    elif args.compressor_ckpt:
        # the sanity_check_trained dispatch (main.py:2608-2632): run the
        # cosine check through a TRAINED 1x1 compressor restored from a
        # train-heatmap --compress_dim checkpoint
        from ntm_tracker_tpu.train.harness import CheckpointManager

        template = {"params": {"compressor": jnp.zeros(
            (cfg.feature_depth, args.compress_dim), jnp.float32
        )}}
        try:
            w = CheckpointManager(args.compressor_ckpt).restore(
                template=template, partial=True
            )["params"]["compressor"]
        except (KeyError, ValueError, FileNotFoundError) as e:
            raise SystemExit(
                f"--compressor_ckpt {args.compressor_ckpt} has no "
                f"[{cfg.feature_depth},{args.compress_dim}] compressor — "
                f"was it trained with train-heatmap --compress_dim "
                f"{args.compress_dim}? ({e})"
            )
        # the partial restore extracts by key only — a checkpoint trained
        # with a different --compress_dim restores fine, so pin the shape
        want = (cfg.feature_depth, args.compress_dim)
        if tuple(np.shape(w)) != want:
            raise SystemExit(
                f"--compressor_ckpt compressor shape "
                f"{tuple(np.shape(w))} != {want} — it was trained with "
                f"train-heatmap --compress_dim {np.shape(w)[-1]}, not "
                f"{args.compress_dim}"
            )
        sim = sanity_check_similarity(feats, gts, compressor_w=w)
        name = "sanity_check_trained"
    else:
        sim = sanity_check_similarity(feats, gts)
    side = int(round(F ** 0.5))
    grid = lambda x: np.asarray(x).reshape(B, L, side, side, 1) * 255.0
    path = save_imgs([grid(sim), grid(gts * F)], name, args.log_dir)
    print("similarity-vs-gt grid written to", path)
    return 0


def cmd_validate(args) -> int:
    from ntm_tracker_tpu.tracking.validate import validate_tracker

    return validate_tracker(args)


def cmd_mine_sequences(args) -> int:
    """Sequence mining: annotations -> prior-box IoU matching ->
    generated_sequences.pkl (sequence_generator.py main)."""
    from ntm_tracker_tpu.data.mining import mine_and_dump

    seqs = mine_and_dump(
        args.image_dirs.split(","), args.annotation_dirs.split(","),
        out_path=args.output_pickle, iou_threshold=args.iou_threshold,
        num_workers=args.num_workers, layers=args.layers.split(","),
    )
    print(f"generated {len(seqs)} sequences -> {args.output_pickle}")
    return 0


def cmd_find_validation_batch(args) -> int:
    from ntm_tracker_tpu.train.zoo import find_validation_batch

    seqs = find_validation_batch(
        args.sequences_dir, target_step=args.target_step,
        batch_size=args.batch_size, min_length=args.sequence_length,
        validation_interval=args.validation_interval, seed=args.seed,
        dump_path=f"validation_seqs_{args.target_step}.pkl",
    )
    print(f"dumped {len(seqs)} sequences to validation_seqs_{args.target_step}.pkl")
    return 0


def cmd_bench(args) -> int:
    from ntm_tracker_tpu.benchmarks import main as bench_main

    bench_main()
    return 0


def cmd_convert_vgg(args) -> int:
    """One-off vgg_16.ckpt -> .npz conversion (the reference's freeze_vgg
    workflow, freeze_vgg.py:4-16, re-targeted at load_params_npz)."""
    from ntm_tracker_tpu.tools.convert_vgg import (
        activation_stats,
        convert_vgg_checkpoint,
    )

    shapes = convert_vgg_checkpoint(
        args.ckpt, args.out, require_conv5=args.require_conv5,
        expect_sha256=args.expect_sha256 or None,
    )
    for key in sorted(shapes):
        print(f"  {key}  {shapes[key]}")
    print(f"wrote {len(shapes)} arrays to {args.out}")
    stats = activation_stats(args.out)
    print("conv4_3 self-check on a deterministic ramp image "
          "(ImageNet weights give O(10-100) activations; a wrong/"
          "random-looking conversion reads very differently):")
    for k, v in stats.items():
        print(f"  {k}: {v:.4f}")
    return 0


def cmd_convert_ntm(args) -> int:
    """Reference NTM training checkpoint -> our param pytree .npz
    (tools/convert_ntm_ckpt.py; pass the model flags the checkpoint was
    trained with — the converter validates every shape against them)."""
    from ntm_tracker_tpu.config import NTMConfig
    from ntm_tracker_tpu.tools.convert_ntm_ckpt import (
        convert_checkpoint,
        save_params_npz,
    )

    ntm_cfg = NTMConfig(
        output_dim=2, mem_size=args.mem_size, mem_dim=args.mem_dim,
        controller_hidden_size=args.hidden_size,
        controller_num_layers=args.num_layers,
        read_head_size=args.read_head_size,
        write_head_size=args.write_head_size,
        write_first=args.write_first,
    )
    params = convert_checkpoint(args.ckpt, ntm_cfg)
    save_params_npz(args.out, params)
    n = 7 + 2 * len(params["controller"])
    print(f"converted {n} cell parameters -> {args.out}")
    print("serve with: track-vot --ntm_npz", args.out)
    return 0


def cmd_convert_dnc(args) -> int:
    """Reference DNC training checkpoint -> our param pytree .npz
    (tools/convert_dnc_ckpt.py; pass the model flags the checkpoint was
    trained with — the converter validates every shape against them)."""
    from ntm_tracker_tpu.config import DNCConfig
    from ntm_tracker_tpu.tools.convert_dnc_ckpt import (
        convert_checkpoint,
        save_params_npz,
    )

    dnc_cfg = DNCConfig(
        output_dim=2, memory_size=args.mem_size, word_size=args.mem_dim,
        num_reads=args.read_head_size, num_writes=args.write_head_size,
        hidden_size=args.hidden_size,
    )
    params = convert_checkpoint(args.ckpt, dnc_cfg)
    save_params_npz(args.out, params)
    print(f"converted controller + 10 interface heads + output linear "
          f"-> {args.out}")
    print("serve with: track-vot --core dnc --dnc_npz", args.out)
    return 0


def cmd_export_serving(args) -> int:
    """AOT-export the serving frame step to a standalone artifact
    (tools/export_serving.py): weights baked in, pre-lowered StableHLO —
    a fresh serving process needs neither this package's model code nor a
    compile. Accepts the same weight sources as track-vot."""
    from ntm_tracker_tpu.models.core import make_core
    from ntm_tracker_tpu.tools.export_serving import (
        export_serving,
        save_serving,
    )

    # validate the flag FIRST: a typo must not cost the user the whole
    # model/weights build before erroring
    device_loop = None
    if getattr(args, "device_loop", ""):
        try:
            h, w = args.device_loop.lower().split("x")
            device_loop = (int(h), int(w))
        except ValueError:
            raise SystemExit(
                f"--device_loop wants HxW (e.g. 360x640), got "
                f"{args.device_loop!r}")
        if device_loop[0] < 2 or device_loop[1] < 2:
            raise SystemExit(
                f"--device_loop frame geometry too small: {args.device_loop}")

    cfg = _tracker_config(args, args.core)
    vgg_params = _load_vgg(args)
    core = make_core(cfg)
    params = _resolve_tracker_weights(args, cfg, core)

    platforms = [s.strip() for s in args.platforms.split(",") if s.strip()] or None
    artifact = export_serving(
        cfg, core, vgg_params, params, batch=args.batch,
        delimiter_first=getattr(args, "delimiter_first", False),
        platforms=platforms, device_loop=device_loop,
    )
    save_serving(args.out, artifact)
    import json as _json
    import os as _os

    meta = _json.loads(str(artifact["meta"]))
    tokens = "int8 tokens, " if meta.get("vgg_int8") else ""
    entries = "init/first/step"
    if meta.get("device_loop"):
        h, w = meta["device_loop"]
        entries += f"/dinit/dstep@{h}x{w}"
    print(f"exported {entries} for platforms {meta['platforms']} "
          f"(batch {meta['batch']}, {tokens}{meta['core']} core) -> {args.out} "
          f"({_os.path.getsize(args.out) / 1e6:.1f} MB)")
    if meta["batch"] == 1:
        print("serve with: StreamingTracker.from_serving(ServingModel(path))")
    else:
        print("serve with: FleetTracker.from_serving(ServingModel(path)) "
              f"or validate --fleet {meta['batch']} --serving_npz")
    return 0


def cmd_cache_features(args) -> int:
    """Precompute the frozen VGG tokens of every frame record (and
    optionally the flipped variant) so training can skip the VGG entirely
    (train-offsets --feature_cache)."""
    import os as _os

    import jax.numpy as jnp

    from ntm_tracker_tpu.config import TrackerConfig
    from ntm_tracker_tpu.data.feature_cache import build_feature_cache

    cfg = TrackerConfig(
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    if args.grid_width != 8:
        import dataclasses as _dc

        gw = args.grid_width
        cfg = _dc.replace(
            cfg, num_features=gw * gw, feature_points=_centered_grid(gw)
        )
    vgg_params = _load_vgg(args)
    seq_dirs = [
        _os.path.join(args.sequences_dir, x)
        for x in sorted(_os.listdir(args.sequences_dir))
        if _os.path.isdir(_os.path.join(args.sequences_dir, x))
    ]
    mesh = None
    if args.shard:
        import jax

        from ntm_tracker_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(batch_size=args.frames_per_batch)
        print(f"sharding the build over {mesh.devices.size} of "
              f"{len(jax.devices())} devices")
    variants = [False] + ([True] if args.reverse_image else [])
    for flip in variants:
        man = build_feature_cache(
            cfg, vgg_params, seq_dirs, args.cache_dir,
            flip=flip, store_dtype=args.store_dtype, mesh=mesh,
            frames_per_batch=args.frames_per_batch, gt_width=args.gt_width,
            progress=lambda done, total: print(
                f"\r{'flip' if flip else 'base'}: {done}/{total} frames",
                end="", flush=True,
            ),
        )
        print(f"\n{man['num_frames']} frames cached "
              f"({man['store_dtype']}, fingerprint {man['fingerprint']})")
    return 0


def cmd_inspect_batch(args) -> int:
    """Eyeball harness for the input pipeline — the reference's
    --test_input / --test_read_imgs debug flags
    (direct_offset_output.py:227-241, main.py:321-341): load one batch
    through the real loader, print the record fields, write a PNG grid of
    the crops, gt heatmaps and offsets."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ntm_tracker_tpu.config import DataConfig
    from ntm_tracker_tpu.data.image_ops import preprocess_frame
    from ntm_tracker_tpu.data.loader import batch_iterator
    from ntm_tracker_tpu.data.sequences import get_valid_sequences
    from ntm_tracker_tpu.models.vgg import VGG_MEAN
    from ntm_tracker_tpu.utils.viz import save_imgs

    d = DataConfig()
    seqs, train_seqs, _ = get_valid_sequences(
        args.sequences_dir, args.sequence_length
    )
    use = train_seqs or seqs
    fb = next(batch_iterator(
        use, args.batch_size, args.gt_width, shuffle=False,
        reverse_image=args.reverse_image,
        decode_resize_hw=tuple(d.resize_hw),
    ))
    B, L = args.batch_size, args.sequence_length
    for i in range(min(B * L, args.max_print)):
        print(
            f"frame {i}: cropbox={np.round(fb.cropboxes[i], 4).tolist()} "
            f"y_off={fb.y_offsets[i]:+.4f} x_off={fb.x_offsets[i]:+.4f} "
            f"gt_sum={fb.gts[i].sum():.4f}"
        )
    crops = jax.vmap(
        lambda im, cb: preprocess_frame(
            im, cb, resize_hw=d.resize_hw, crop_size=d.crop_size,
            do_resize=False,
        )
    )(jnp.asarray(fb.images), jnp.asarray(fb.cropboxes))
    sz = d.crop_size
    crop_imgs = np.clip(
        np.asarray(crops) + VGG_MEAN, 0, 255
    ).astype(np.uint8).reshape(B, L, sz, sz, 3)
    g = fb.gts.reshape(B, L, args.gt_width, args.gt_width, 1)
    gt_imgs = (g / max(float(g.max()), 1e-9) * 255).astype(np.uint8)
    offsets = np.stack([fb.y_offsets, fb.x_offsets], -1).reshape(B, L, 2)
    path = save_imgs([crop_imgs, gt_imgs, offsets], "inspect_batch", args.out_dir)
    print("wrote", path)
    return 0


def build_parser() -> argparse.ArgumentParser:
    from ntm_tracker_tpu.config import DataConfig

    p = argparse.ArgumentParser(prog="ntm_tracker_tpu")
    p.add_argument(
        "--platform", choices=["cpu", "tpu"], default=None,
        help="force a JAX backend (set before any computation; needed on "
        "hosts where the TPU plugin overrides JAX_PLATFORMS)",
    )
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train-offsets", help="primary tracker training")
    _add_model_flags(t)
    _add_train_flags(t)
    t.add_argument("--core", choices=["ntm", "dnc"], default="ntm")
    t.add_argument("--sequences_dir", required=True)
    t.add_argument("--vgg_weights", default="")
    t.add_argument("--save_imgs", action="store_true",
                   help="write crop/gt/prediction PNG grids at validation")
    t.add_argument("--device_resize", action="store_true",
                   help="ship native-size uint8 frames and do the 720x1280 "
                   "TF1 resize on device (same sampling semantics, much "
                   "less host->device transfer; needs uniform frame sizes "
                   "per batch)")
    t.add_argument("--feature_cache", default="",
                   help="train from precomputed VGG tokens (cache-features) "
                   "instead of decoding+convolving frames every step; "
                   "--vgg_weights then only verifies the cache fingerprint")
    t.add_argument("--limit", type=int, default=0,
                   help="dress rehearsal: keep only the first N train and "
                   "val sequences (0 = all; MIGRATION.md real-data runbook)")
    t.set_defaults(fn=cmd_train_offsets, experiment="offsets")

    cf = sub.add_parser(
        "cache-features",
        help="precompute the frozen VGG tokens of a cropped dataset for "
        "train-offsets --feature_cache (VGG is frozen, so its tokens are a "
        "pure function of the dataset — compute them once, not every step)",
    )
    cf.add_argument("--sequences_dir", required=True)
    cf.add_argument("--cache_dir", required=True)
    cf.add_argument("--vgg_weights", default="")
    cf.add_argument("--gt_width", type=int, default=8)
    cf.add_argument("--grid_width", type=int, default=8,
                    help="token grid side: 8 = the canonical conv43Points "
                    "grid; 7 matches train-heatmap --gt_width 7 (the "
                    "centered stride-2 grid)")
    cf.add_argument("--store_dtype", choices=["float16", "float32"],
                    default="float16",
                    help="on-disk token dtype (float16 halves size; tokens "
                    "are bounded ReLU activations, well inside f16 range)")
    cf.add_argument("--frames_per_batch", type=int, default=256,
                    help="device batch for the one-off VGG sweep")
    cf.add_argument("--reverse_image", action="store_true",
                    help="also cache the horizontally-flipped variant "
                    "(needed to train with --reverse_image)")
    cf.add_argument("--shard", action="store_true",
                    help="shard each frame batch over all local devices "
                    "(data-parallel build; tokens are per-frame so the "
                    "output is float-equivalent to the single-device build)")
    cf.add_argument("--bf16", action="store_true",
                    help="bfloat16 VGG compute for the sweep (match the "
                    "training flag you plan to use)")
    cf.set_defaults(fn=cmd_cache_features)

    ib = sub.add_parser(
        "inspect-batch",
        help="input-pipeline eyeball harness (the reference's --test_input/"
        "--test_read_imgs): print one batch's record fields, write a PNG "
        "grid of crops + gt heatmaps + offsets",
    )
    ib.add_argument("--sequences_dir", required=True)
    ib.add_argument("--out_dir", default=".")
    ib.add_argument("--batch_size", type=int, default=1)
    ib.add_argument("--sequence_length", type=int, default=20)
    ib.add_argument("--gt_width", type=int, default=8)
    ib.add_argument("--reverse_image", action="store_true")
    ib.add_argument("--max_print", type=int, default=20)
    ib.set_defaults(fn=cmd_inspect_batch)

    th = sub.add_parser(
        "train-heatmap",
        help="heatmap-output experiments (ntm_sevenbyseven / ntm_8by8 / "
        "ntm_sequential of the reference's main.py)",
    )
    _add_model_flags(th)
    _add_train_flags(th)
    th.add_argument("--core", choices=["ntm", "dnc"], default="ntm")
    th.add_argument("--sequences_dir", required=True)
    th.add_argument("--vgg_weights", default="")
    th.add_argument(
        "--serialization", choices=["sequential", "frame"], default="sequential",
        help="'sequential' is the reference structure (BOTH ntm_sevenbyseven "
        "and ntm_8by8 use the per-feature 2F+1 stream, main.py:2040-2135); "
        "'frame' is a TPU-friendly non-reference variant (64+delimiter "
        "tokens, heatmap read at frame delimiters)")
    th.add_argument("--compress_dim", type=int, default=0,
                    help="1x1-conv input compressor output channels (0=off)")
    th.add_argument("--feature_cache", default="",
                    help="train from precomputed VGG tokens (build with "
                    "cache-features --grid_width matching --gt_width)")
    th.set_defaults(fn=cmd_train_offsets, experiment="heatmap")

    pp = sub.add_parser("preprocess", help="build the cropped dataset")
    pp.add_argument("--annotation_dir", required=True)
    pp.add_argument("--image_dir", required=True)
    pp.add_argument("--output_dir", required=True)
    pp.add_argument("--cropbox_grid", type=int, default=DataConfig.cropbox_grid)
    pp.add_argument("--bbox_grid", type=int, default=DataConfig.bbox_grid)
    pp.add_argument("--focus", type=int, default=DataConfig.focus)
    pp.add_argument("--deform_threshold", type=float, default=DataConfig.deform_threshold)
    pp.add_argument("--zoom_threshold", type=float, default=DataConfig.zoom_threshold)
    pp.add_argument("--num_workers", type=int, default=7)
    pp.add_argument(
        "--augment", action="store_true",
        help="write dilated/jittered augmented sub-sequences (the repaired "
        "version of the reference's dead data_augmentation path, "
        "preprocess.py:356-474) instead of the plain per-object walk",
    )
    pp.add_argument("--max_sequence_length", type=int, default=20,
                    help="frames per augmented sub-sequence")
    pp.add_argument("--augment_seed", type=int, default=0)
    pp.add_argument("--limit", type=int, default=0,
                    help="dress rehearsal: process only the first N "
                    "sequence dirs (0 = all; MIGRATION.md real-data "
                    "runbook)")
    pp.set_defaults(fn=cmd_preprocess)

    d = sub.add_parser("dnc-repeat-copy", help="DNC repeat-copy training")
    d.add_argument("--hidden_size", type=int, default=64)
    d.add_argument("--memory_size", type=int, default=16)
    d.add_argument("--word_size", type=int, default=16)
    d.add_argument("--num_write_heads", type=int, default=1)
    d.add_argument("--num_read_heads", type=int, default=1)
    d.add_argument("--clip_value", type=float, default=20)
    d.add_argument("--max_grad_norm", type=float, default=50)
    d.add_argument("--learning_rate", type=float, default=1e-4)
    d.add_argument("--optimizer_epsilon", type=float, default=1e-10)
    d.add_argument("--batch_size", type=int, default=16)
    d.add_argument("--num_bits", type=int, default=4)
    d.add_argument("--min_length", type=int, default=1)
    d.add_argument("--max_length", type=int, default=2)
    d.add_argument("--min_repeats", type=int, default=1)
    d.add_argument("--max_repeats", type=int, default=2)
    d.add_argument("--num_training_iterations", type=int, default=100000)
    d.add_argument("--report_interval", type=int, default=100)
    d.add_argument("--checkpoint_interval", type=int, default=-1)
    d.add_argument("--checkpoint_dir", default="/tmp/ntm_tracker_tpu/dnc")
    d.add_argument("--seed", type=int, default=0)
    d.set_defaults(fn=cmd_dnc_repeat_copy)

    c = sub.add_parser("copy-paste", help="NTM copy-paste sanity training")
    _add_model_flags(c)
    _add_train_flags(c)
    c.add_argument("--width", type=int, default=3)
    c.set_defaults(fn=cmd_copy_paste)

    v = sub.add_parser("track-vot", help="VOT-protocol streaming tracking")
    _add_model_flags(v)
    _add_train_flags(v)
    v.add_argument("--core", choices=["ntm", "dnc"], default="ntm")
    v.add_argument("--vgg_weights", default="")
    v.add_argument("--workdir", default=".")
    v.add_argument("--ntm_npz", default="",
                   help="converted reference weights (convert-ntm output); "
                   "overrides --ckpt_path")
    v.add_argument("--dnc_npz", default="",
                   help="converted reference DNC weights (convert-dnc "
                   "output, requires --core dnc); overrides --ckpt_path")
    v.add_argument("--delimiter_first", action="store_true",
                   help="use the reference's streaming token order "
                   "(delimiter prepended; train/inference mismatch)")
    v.add_argument("--serving_npz", default="",
                   help="serve an AOT artifact (export-serving output) — "
                   "weights, geometry and token order come from the "
                   "artifact; model/weight flags are ignored")
    v.add_argument("--vgg_int8", action="store_true",
                   help="serve the VGG token convs s8xs8->s32 "
                   "(models/vgg_int8.py; quantized numerics, throughput "
                   "mode — not for parity work)")
    v.add_argument("--vot_mode", choices=["auto", "file", "trax", "trax-lib"],
                   default="auto",
                   help="protocol: file (images.txt/region.txt in "
                   "--workdir), trax (native TraX wire protocol over "
                   "stdin/stdout, no deps), trax-lib (the optional trax "
                   "package); auto = trax-lib if importable else file")
    v.set_defaults(fn=cmd_track_vot)

    wf = sub.add_parser(
        "train-wholeframe",
        help="whole-feature-map experiments ntm()/ntm_two_step() on the "
        "pickle-based mined dataset (sequence mining via data/mining.py)")
    _add_model_flags(wf)
    _add_train_flags(wf)
    wf.add_argument("--pickle_path", default="generated_sequences.pkl")
    wf.add_argument("--vgg_weights", default="")
    wf.add_argument("--feature_layer", default="conv4/conv4_3",
                    help="feature endpoint; must match the grid the gt "
                    "masks were mined on (mine-sequences --layers): "
                    "'conv4/conv4_3' (28x28, the mining default) or "
                    "'pool5' (7x7)")
    wf.add_argument("--two_step", action="store_true",
                    help="present/ask protocol (ntm_two_step)")
    wf.add_argument("--compress_dim", type=int, default=128)
    wf.set_defaults(fn=cmd_train_wholeframe)

    ar = sub.add_parser(
        "train-active-resize",
        help="closed-loop recrop training (the completed form of the "
        "reference's unfinished ntm_active_resize)")
    _add_model_flags(ar)
    _add_train_flags(ar)
    ar.add_argument("--pickle_path", default="generated_sequences.pkl")
    ar.add_argument("--vgg_weights", default="")
    ar.add_argument("--compress_dim", type=int, default=128)
    ar.set_defaults(fn=cmd_train_active_resize)

    lo = sub.add_parser("lstm-only", help="LSTM baseline on the heatmap task")
    _add_model_flags(lo)
    _add_train_flags(lo)
    lo.add_argument("--sequences_dir", required=True)
    lo.add_argument("--vgg_weights", default="")
    lo.add_argument("--compress_dim", type=int, default=128)
    lo.set_defaults(fn=cmd_lstm_only)

    sc = sub.add_parser("sanity-check",
                        help="cosine-similarity heatmap reproduction check")
    _add_model_flags(sc)
    _add_train_flags(sc)
    sc.add_argument("--sequences_dir", required=True)
    sc.add_argument("--vgg_weights", default="")
    sc.add_argument("--pca", action="store_true")
    sc.add_argument("--compress_dim", type=int, default=128)
    sc.add_argument("--compressor_ckpt", default="",
                    help="checkpoint dir of a train-heatmap --compress_dim "
                    "run: run the check through the TRAINED compressor "
                    "(the reference's sanity_check_trained dispatch, "
                    "main.py:2608-2632)")
    sc.set_defaults(fn=cmd_sanity_check)

    val = sub.add_parser("validate", help="replay pickled validation sequences")
    _add_model_flags(val)
    _add_train_flags(val)
    val.add_argument("--core", choices=["ntm", "dnc"], default="ntm")
    val.add_argument("--vgg_weights", default="")
    val.add_argument("--ntm_npz", default="",
                     help="converted reference weights (convert-ntm output)")
    val.add_argument("--dnc_npz", default="",
                     help="converted reference DNC weights (convert-dnc "
                     "output, requires --core dnc)")
    val.add_argument("--pickle_path", required=True)
    val.add_argument("--delimiter_first", action="store_true")
    val.add_argument("--serving_npz", default="",
                     help="replay through an AOT artifact (export-serving "
                     "output); model/weight flags are ignored")
    val.add_argument("--vgg_int8", action="store_true",
                     help="quantized VGG token convs (see track-vot)")
    val.add_argument("--fleet", type=int, default=0, metavar="N",
                     help="replay up to N sequences per batched device step "
                     "(tracking/fleet.py) instead of one at a time; with "
                     "--serving_npz, N must equal the artifact's baked "
                     "batch (export-serving --batch N)")
    val.add_argument("--limit", type=int, default=0,
                     help="dress rehearsal: replay only the first N pickled "
                     "sequences (0 = all; MIGRATION.md real-data runbook)")
    val.set_defaults(fn=cmd_validate)

    ms = sub.add_parser("mine-sequences",
                        help="mine single-object subsequences from VID "
                        "annotations into generated_sequences.pkl")
    ms.add_argument("--image_dirs", required=True,
                    help="comma-separated image roots")
    ms.add_argument("--annotation_dirs", required=True,
                    help="comma-separated annotation roots")
    ms.add_argument("--output_pickle", default="generated_sequences.pkl")
    ms.add_argument("--iou_threshold", type=float, default=0.5)
    ms.add_argument("--layers", default="conv4_3",
                    help="comma-separated prior grids to match (conv4_3, "
                    "pool5, ...); must match train-wholeframe "
                    "--feature_layer")
    ms.add_argument("--num_workers", type=int, default=7)
    ms.set_defaults(fn=cmd_mine_sequences)

    f = sub.add_parser("find-validation-batch")
    _add_train_flags(f)
    f.add_argument("--sequences_dir", required=True)
    f.add_argument("--target_step", type=int, default=1700)
    f.set_defaults(fn=cmd_find_validation_batch)

    cv = sub.add_parser(
        "convert-vgg",
        help="convert the public slim vgg_16.ckpt to the .npz weight layout",
    )
    cv.add_argument("--ckpt", required=True, help="path to vgg_16.ckpt")
    cv.add_argument("--out", required=True, help="destination .npz")
    cv.add_argument("--require_conv5", action="store_true",
                    help="fail unless the conv5 block is present")
    cv.add_argument("--expect_sha256", default="",
                    help="verify the checkpoint bytes hash to this hex "
                    "digest before converting (guards against a corrupt "
                    "or wrong download)")
    cv.set_defaults(fn=cmd_convert_vgg)

    cn = sub.add_parser(
        "convert-ntm",
        help="convert a REFERENCE training checkpoint (TF1 Saver, "
        "direct_offset_output graph) into this framework's NTM params "
        "(.npz usable via track-vot/validate --ntm_npz) — serve a "
        "TF-trained tracker without retraining",
    )
    _add_model_flags(cn)
    cn.add_argument("--ckpt", required=True,
                    help="checkpoint prefix (the model.ckpt-NNN the "
                    "reference's save_path.txt points at)")
    cn.add_argument("--out", required=True, help="destination .npz")
    cn.set_defaults(fn=cmd_convert_ntm)

    cd = sub.add_parser(
        "convert-dnc",
        help="convert a REFERENCE DNC training checkpoint (TF1 Saver, "
        "direct_offset_output_with_dnc graph: dnc/lstm + "
        "dnc/memory_access/* + dnc/output_linear) into this framework's "
        "DNC params (.npz usable via track-vot/validate --core dnc "
        "--dnc_npz)",
    )
    _add_model_flags(cd)
    cd.add_argument("--ckpt", required=True,
                    help="checkpoint prefix (model.ckpt-NNN)")
    cd.add_argument("--out", required=True, help="destination .npz")
    cd.set_defaults(fn=cmd_convert_dnc)

    es = sub.add_parser(
        "export-serving",
        help="AOT-export the serving frame step (weights baked, pre-lowered "
        "StableHLO) to one .npz artifact servable without model code or "
        "compile; same weight sources as track-vot",
    )
    _add_model_flags(es)
    _add_train_flags(es)
    es.add_argument("--core", choices=["ntm", "dnc"], default="ntm")
    es.add_argument("--vgg_weights", default="")
    es.add_argument("--ntm_npz", default="",
                    help="converted reference weights (convert-ntm output); "
                    "overrides --ckpt_path")
    es.add_argument("--dnc_npz", default="",
                    help="converted reference DNC weights (requires "
                    "--core dnc); overrides --ckpt_path")
    es.add_argument("--delimiter_first", action="store_true",
                    help="bake the reference's streaming token order in")
    es.add_argument("--vgg_int8", action="store_true",
                    help="bake the quantized VGG token path into the "
                    "artifact (see track-vot)")
    es.add_argument("--batch", type=int, default=1,
                    help="batch baked into the artifact (1 = streaming "
                    "tracker; >1 = fleet-style batches)")
    es.add_argument("--device_loop", default="", metavar="HxW",
                    help="also bake the fully device-resident track loop "
                    "(crop geometry + VGG + cell steps + recrop feedback "
                    "in one program) at this raw-frame geometry, e.g. "
                    "360x640 (ServingModel.device_init/device_step)")
    es.add_argument("--platforms", default="",
                    help="comma-separated lowering platforms (e.g. "
                    "tpu,cpu); default = the current backend")
    es.add_argument("--out", required=True, help="destination .npz")
    es.set_defaults(fn=cmd_export_serving)

    b = sub.add_parser("bench", help="headline throughput benchmark")
    b.set_defaults(fn=cmd_bench)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
