"""Frozen-feature cache: precompute the VGG conv4_3 tokens once, train on
tokens directly.

The reference re-runs the frozen VGG-16 on every training step even though
its weights never change (the graph is imported as constants,
direct_offset_output.py:417-428) — so ~95% of each training step's FLOPs
recompute a pure function of the dataset. This module computes the
`[F, C]` token array of every frame record ONCE (on device, batched), stores
it next to a manifest, and the training loop then runs only the memory-core
BPTT: `cli.py cache-features` + `train-offsets --feature_cache`.

Layout: `<cache_dir>/<base|flip>/<seq_basename>/<frame>.npy` (one token
array per frame record, mirroring the dataset's per-frame .txt/.bin
contract) plus `<cache_dir>/<base|flip>/manifest.json` recording a
fingerprint of everything the tokens depend on (VGG weights, crop/resize
geometry, feature grid, compute dtype). `flip/` holds the tokens of
horizontally-mirrored frames for the --reverse_image augmentation
(direct_offset_output.py:186-187 — the flip changes the crop content, so
flipped tokens are a separate cache).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterator, List, NamedTuple, Sequence, Tuple

import numpy as np

CACHE_VERSION = 1
_MANIFEST = "manifest.json"


class TokenBatch(NamedTuple):
    features: np.ndarray   # [B*L, F, C] store_dtype tokens
    gts: np.ndarray        # [B*L, gt, gt] float32
    y_offsets: np.ndarray  # [B*L] float32
    x_offsets: np.ndarray  # [B*L] float32
    # raw log-scale targets (loader.record_log_scales; flip-invariant)
    scales: np.ndarray = None  # [B*L] float32


def cache_fingerprint(cfg, vgg_params, flip: bool) -> str:
    """Hash of everything the cached tokens are a function of: the VGG
    weights, the crop/resize geometry, the feature grid and the compute
    dtype. A changed fingerprint means the cache is stale."""
    import jax

    h = hashlib.sha256()
    h.update(
        (
            f"v{CACHE_VERSION};crop{cfg.data.crop_size};"
            f"resize{tuple(cfg.data.resize_hw)};flip{bool(flip)};"
            # fast_conv43 is deliberately NOT hashed: it changes the compute
            # route, not the values (vgg16_conv43_tokens is test-asserted
            # bit-identical to the full-map path)
            f"pts{cfg.feature_points};F{cfg.num_features};"
            f"C{cfg.feature_depth};dtype{np.dtype(cfg.compute_dtype).name}"
            # vgg_int8 CHANGES token values (unlike fast_conv43), so an
            # int8-built cache must never serve exact-path training; the
            # token is appended only when set so existing exact-path
            # caches keep their fingerprints
            + (";int8" if getattr(cfg, "vgg_int8", False) else "")
        ).encode()
    )
    leaves, _ = jax.tree_util.tree_flatten_with_path(vgg_params)
    for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
        arr = np.asarray(leaf, dtype=np.float32)
        h.update(str(path).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()[:16]


def _variant_dir(cache_dir: str, flip: bool) -> str:
    return os.path.join(cache_dir, "flip" if flip else "base")


def _frame_path(root: str, frame_record_path: str) -> str:
    seq = os.path.basename(os.path.dirname(frame_record_path))
    return os.path.join(root, seq, os.path.basename(frame_record_path) + ".npy")


def read_manifest(cache_dir: str, flip: bool = False) -> dict:
    path = os.path.join(_variant_dir(cache_dir, flip), _MANIFEST)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no feature cache manifest at {path}; build one with "
            "`cache-features`" + (" --reverse_image" if flip else "")
        )
    with open(path) as f:
        return json.load(f)


def verify_cache(cfg, cache_dir: str, flip: bool = False,
                 vgg_params=None) -> dict:
    """Check the manifest against the config (and, when VGG params are at
    hand, the full fingerprint). Returns the manifest."""
    man = read_manifest(cache_dir, flip)
    if (man["num_features"], man["feature_depth"]) != (
        cfg.num_features, cfg.feature_depth
    ):
        raise ValueError(
            f"feature cache {cache_dir} holds "
            f"[{man['num_features']},{man['feature_depth']}] tokens but the "
            f"config expects [{cfg.num_features},{cfg.feature_depth}]"
        )
    if vgg_params is not None:
        fp = cache_fingerprint(cfg, vgg_params, flip)
        if fp != man["fingerprint"]:
            raise ValueError(
                f"feature cache {cache_dir} is stale: fingerprint "
                f"{man['fingerprint']} != expected {fp} (VGG weights or "
                "crop/resize geometry changed — rebuild with cache-features)"
            )
    return man


def build_feature_cache(
    cfg,
    vgg_params,
    sequence_dirs: Sequence[str],
    cache_dir: str,
    *,
    flip: bool = False,
    store_dtype: str = "float16",
    frames_per_batch: int = 256,
    gt_width: int = 8,
    decode_resize_hw=None,
    progress=None,
    mesh=None,
) -> dict:
    """Compute and store the tokens of EVERY frame record under each
    sequence dir (all .txt frames, not just one dilated subset — the cache
    then serves any sequence_length).

    Device work is jitted once at a fixed [frames_per_batch] shape; the last
    chunk is padded. With a `jax.sharding.Mesh`, the frame batch is sharded
    over the mesh's devices (pure data parallelism — tokens are per-frame,
    so the sharded build is float-equivalent to the single-device one —
    the partitioned convs schedule differently, so not bitwise).
    Returns the manifest dict."""
    import jax
    import jax.numpy as jnp

    from ntm_tracker_tpu.data.image_ops import preprocess_frame
    from ntm_tracker_tpu.data.loader import load_frame_batch
    from ntm_tracker_tpu.train.experiments import frame_tokens

    d = cfg.data
    if decode_resize_hw is None:
        decode_resize_hw = tuple(d.resize_hw)

    def tokens_impl(images, cropboxes):
        crops = jax.vmap(
            lambda im, cb: preprocess_frame(
                im, cb, resize_hw=d.resize_hw, crop_size=d.crop_size,
                do_resize=False,
            )
        )(images, cropboxes)
        return frame_tokens(cfg, vgg_params, crops)

    put = None
    if mesh is not None and mesh.devices.size > 1:
        from ntm_tracker_tpu.parallel.mesh import batch_sharding

        n = int(mesh.devices.size)
        if frames_per_batch % n != 0:
            raise ValueError(
                f"frames_per_batch={frames_per_batch} must divide over the "
                f"{n}-device mesh (use parallel.mesh.make_mesh(batch_size=...) "
                "to trim the mesh)"
            )
        data_sh = batch_sharding(mesh)
        tokens_fn = jax.jit(
            tokens_impl, in_shardings=(data_sh, data_sh), out_shardings=data_sh
        )
        put = lambda x: jax.device_put(x, data_sh)  # noqa: E731
    else:
        tokens_fn = jax.jit(tokens_impl)

    # cache entries are keyed by the sequence dir's BASENAME (_frame_path),
    # so two sequence dirs sharing a basename under different parents would
    # silently overwrite / cross-read each other's tokens — refuse up front
    from collections import Counter

    basenames = [os.path.basename(os.path.normpath(s)) for s in sequence_dirs]
    dups = sorted(b for b, n in Counter(basenames).items() if n > 1)
    if dups:
        raise ValueError(
            f"sequence dirs with duplicate basenames would collide in the "
            f"cache layout: {dups} (cache entries are keyed by basename; "
            f"pass dirs with unique names or use separate cache_dirs)"
        )

    frames: List[str] = []
    for seqdir in sequence_dirs:
        names = sorted(
            x[:-4] for x in os.listdir(seqdir) if x.endswith(".txt")
        )
        frames += [os.path.join(seqdir, n) for n in names]
    if not frames:
        raise ValueError(f"no frame records under {sequence_dirs!r}")

    root = _variant_dir(cache_dir, flip)
    os.makedirs(root, exist_ok=True)
    if store_dtype not in ("float16", "float32"):
        # ml_dtypes types (bfloat16) don't survive an .npy round trip
        raise ValueError(f"store_dtype must be float16/float32, got {store_dtype}")
    np_dtype = np.dtype(store_dtype)
    done = 0
    for start in range(0, len(frames), frames_per_batch):
        chunk = frames[start : start + frames_per_batch]
        pad = frames_per_batch - len(chunk)
        padded = chunk + [chunk[-1]] * pad
        fb = load_frame_batch(
            padded, gt_width, reverse_image=flip,
            decode_resize_hw=decode_resize_hw,
        )
        images = jnp.asarray(fb.images.astype(np.float32))
        cropboxes = jnp.asarray(fb.cropboxes)
        if put is not None:
            images, cropboxes = put(images), put(cropboxes)
        toks = np.asarray(tokens_fn(images, cropboxes)).astype(np_dtype)
        for i, frame in enumerate(chunk):
            out = _frame_path(root, frame)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            np.save(out, toks[i])
        done += len(chunk)
        if progress is not None:
            progress(done, len(frames))

    manifest = {
        "version": CACHE_VERSION,
        "fingerprint": cache_fingerprint(cfg, vgg_params, flip),
        "store_dtype": np_dtype.name,
        "num_features": cfg.num_features,
        "feature_depth": cfg.feature_depth,
        "flip": bool(flip),
        "num_frames": len(frames),
        "crop_size": d.crop_size,
        "resize_hw": list(d.resize_hw),
    }
    with open(os.path.join(root, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_token_batch(
    frame_paths: Sequence[str],
    gt_width: int,
    cache_dir: str,
    reverse_image: bool = False,
    use_native: bool = True,
    cropbox_grid: int = 8,
    bbox_grid: int = 6,
) -> TokenBatch:
    """Assemble a token batch: per-frame .npy tokens from the cache +
    gt/offset fields from the .txt/.bin records (the cheap part of the
    loader — no JPEG decode, no resize)."""
    from ntm_tracker_tpu.data.loader import load_record_arrays, record_log_scales

    root = _variant_dir(cache_dir, reverse_image)
    feats = np.stack([np.load(_frame_path(root, p)) for p in frame_paths])
    _crops, offsets, gts, _paths, bboxes = load_record_arrays(
        frame_paths, gt_width, use_native
    )
    xo = -offsets[:, 1] if reverse_image else offsets[:, 1]
    return TokenBatch(
        features=feats,
        gts=gts,
        y_offsets=offsets[:, 0].copy(),
        x_offsets=np.asarray(xo),
        # grids must match the records' preprocess-time grids (see
        # loader.load_frame_batch)
        scales=record_log_scales(bboxes, cropbox_grid, bbox_grid),
    )


def token_batch_iterator(
    seqs,
    batch_size: int,
    cache_dir: str,
    gt_width: int = 8,
    shuffle: bool = True,
    seed: int = 42,
    reverse_image: bool = False,
    epochs: int = 1,
    cropbox_grid: int = 8,
    bbox_grid: int = 6,
) -> Iterator[TokenBatch]:
    """The loader.batch_iterator twin for cached tokens: same epoch/shuffle
    shape (direct_offset_output.py:292-353), no image work."""
    import random as _random

    from ntm_tracker_tpu.data.sequences import sevenbyseven_get_batch

    rng = _random.Random(seed)
    seqs = list(seqs)
    usable = len(seqs) // batch_size * batch_size
    for _ in range(epochs):
        if shuffle:
            rng.shuffle(seqs)
        index = 0
        while index < usable:
            frame_names, index = sevenbyseven_get_batch(index, batch_size, seqs)
            yield load_token_batch(
                frame_names, gt_width, cache_dir, reverse_image=reverse_image,
                cropbox_grid=cropbox_grid, bbox_grid=bbox_grid,
            )
