"""Host-side data loader with double-buffered device prefetch.

Replaces the reference's in-graph queue pipeline (FIFOQueue + TextLineReader
+ WholeFileReader + FixedLengthRecordReader, direct_offset_output.py:159-224)
with the TPU-native split (SURVEY.md §5.8):
  host thread:   read .txt/.bin records, decode JPEGs (PIL), stack batches
  device (jit):  resize -> mean-subtract -> crop_and_resize (image_ops.py)
  prefetch:      a background thread keeps `prefetch` batches ahead,
                 jax.device_put-ing while the train step runs.

A batch covers batch_size sequences x seq_len frames, flattened to
[B*L, ...] like the reference's get_input(batch*seq_len).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, NamedTuple, Optional, Sequence

import numpy as np

from ntm_tracker_tpu.data.preprocess import read_frame_record


class FrameBatch(NamedTuple):
    images: np.ndarray     # [B*L, H, W, 3] uint8 decoded frames (pre-resize)
    cropboxes: np.ndarray  # [B*L, 4] float32
    gts: np.ndarray        # [B*L, gt, gt] float32
    y_offsets: np.ndarray  # [B*L] float32
    x_offsets: np.ndarray  # [B*L] float32
    # RAW log-scale of the record's crop-space bbox vs the canonical box
    # (geometry.calculate_scale) — the scale-head target BEFORE the
    # cfg.scale_range normalization (applied by the consumer, which owns
    # the config). Flip-invariant, so reverse_image leaves it alone.
    scales: np.ndarray = None  # [B*L] float32


def tf1_resize_bilinear_np(image: np.ndarray, out_hw) -> np.ndarray:
    """Numpy twin of image_ops.tf1_resize_bilinear (TF1 legacy grid:
    src = i * in/out, NOT half-pixel centered) for the host decode path, so
    the sampling semantics match the reference end-to-end regardless of
    where the resize runs."""
    H, W = image.shape[:2]
    out_h, out_w = out_hw
    if (H, W) == (out_h, out_w):
        return image.astype(np.float32)
    ys = np.arange(out_h, dtype=np.float64) * (H / out_h)
    xs = np.arange(out_w, dtype=np.float64) * (W / out_w)
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, H - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    fy = (ys - np.floor(ys)).astype(np.float32)[:, None, None]
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, W - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    fx = (xs - np.floor(xs)).astype(np.float32)[None, :, None]
    img = image.astype(np.float32)
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def _decode_image(path: str, resize_hw=None) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)
    if resize_hw is not None:
        # TF1-semantics resize (matches the reference's in-graph
        # resize_images, direct_offset_output.py:195); returns float32
        return tf1_resize_bilinear_np(img, resize_hw)
    return img


def _decode_images_parallel(paths: Sequence[str], resize_hw, workers: int = 8) -> np.ndarray:
    """Decode+resize a batch — native C++ pipeline when available (libjpeg
    decode + TF1 bilinear in one thread pool, native/jpeg_pipeline.cpp),
    else PIL + numpy under a Python thread pool. The 720x1280 upscale of a
    full batch is the loader's dominant host cost."""
    if resize_hw is not None and len(paths) > 1:
        try:
            from ntm_tracker_tpu.data.native_jpeg import decode_resize_batch_native

            return decode_resize_batch_native(paths, resize_hw)
        except RuntimeError:
            pass  # no toolchain/libjpeg or an exotic JPEG: Python fallback
    if len(paths) <= 1:
        return np.stack([_decode_image(p, resize_hw) for p in paths])
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(workers, len(paths))) as ex:
        return np.stack(list(ex.map(lambda p: _decode_image(p, resize_hw), paths)))


def load_record_arrays(
    frame_paths: Sequence[str], gt_width: int = 8, use_native: bool = True
):
    """(cropboxes [N,4], offsets [N,2], gts [N,g,g] — all float32 — image
    paths, and crop-space bboxes [N,4]) for a list of frame records: the
    native C++ thread-pool reader (native/record_loader.cpp) with Python
    fallback. The single .txt/.bin reader shared by the image path
    (load_frame_batch) and the feature-cache path
    (feature_cache.load_token_batch)."""
    if use_native:
        try:
            from ntm_tracker_tpu.data.native_loader import load_records_native

            crops, bboxes, offsets, gts, img_paths = load_records_native(
                frame_paths, gt_width
            )
            return (np.asarray(crops, np.float32), offsets, gts,
                    list(img_paths), np.asarray(bboxes, np.float32))
        except RuntimeError:
            pass  # no native toolchain; fall through to the Python reader
    recs = [read_frame_record(p, gt_width) for p in frame_paths]
    crops = np.asarray([r["cropbox"] for r in recs], np.float32)
    offsets = np.array(
        [[r["y_offset"], r["x_offset"]] for r in recs], np.float32
    )
    gts = np.stack([r["gt"] for r in recs]).astype(np.float32)
    bboxes = np.asarray([r["bbox"] for r in recs], np.float32)
    return crops, offsets, gts, [r["image_path"] for r in recs], bboxes


def record_log_scales(
    bboxes: np.ndarray, cropbox_grid: int = 8, bbox_grid: int = 6
) -> np.ndarray:
    """[N,4] crop-space bboxes -> [N] raw log-scale targets vs the
    canonical box (vectorized geometry.calculate_scale). The scale-head's
    per-record supervision (TrackerConfig.predict_scale); raw — the
    consumer divides by cfg.scale_range."""
    side = bbox_grid / float(cropbox_grid)
    area = np.maximum(
        (bboxes[:, 2] - bboxes[:, 0]) * (bboxes[:, 3] - bboxes[:, 1]),
        np.finfo(np.float32).tiny,
    )
    return (0.5 * np.log(area / (side * side))).astype(np.float32)


def load_frame_batch(
    frame_paths: Sequence[str],
    gt_width: int = 8,
    reverse_image: bool = False,
    decode_resize_hw=(720, 1280),
    use_native: bool = True,
    cropbox_grid: int = 8,
    bbox_grid: int = 6,
) -> FrameBatch:
    """Load B*L frame records + images (host side).

    Record parsing (.txt/.bin) goes through the native C++ thread-pool
    loader when available (ntm_tracker_tpu/native/record_loader.cpp),
    falling back to the Python reader. reverse_image mirrors the
    reference's horizontal-flip augmentation
    (direct_offset_output.py:186-187,203-204): x offsets negate, and the
    crop is horizontally flipped — realized here by flipping the decoded
    frame and mirroring the cropbox's x extent, which is sample-exact
    equivalent to the reference's flip-after-crop under the corner-aligned
    crop_and_resize grid. (The frame-0 gt indicator channel is NOT flipped
    — the reference doesn't flip it either.)

    The sample-exactness claim requires flipping AFTER the 720x1280 host
    resize: the TF1 resize grid (src = i * in/out) is not flip-equivariant,
    so flip-then-device-resize would shift every flipped crop by a constant
    sub-pixel amount. decode_resize_hw=None + reverse_image is therefore
    rejected (the CLI falls back to host resize for this combination).
    """
    if reverse_image and decode_resize_hw is None:
        raise ValueError(
            "reverse_image requires the host-side resize (set "
            "decode_resize_hw): the TF1 resize grid is not flip-equivariant, "
            "so flipping before the device resize breaks reference parity"
        )

    def _flip(images, cropboxes):
        images = np.ascontiguousarray(images[:, :, ::-1])
        c = cropboxes.copy()
        c[:, 1], c[:, 3] = 1.0 - cropboxes[:, 3], 1.0 - cropboxes[:, 1]
        return images, c

    crops, offsets, gts, img_paths, bboxes = load_record_arrays(
        frame_paths, gt_width, use_native
    )
    images = _decode_images_parallel(img_paths, decode_resize_hw)
    xo = -offsets[:, 1] if reverse_image else offsets[:, 1]
    if reverse_image:
        images, crops = _flip(images, crops)
    return FrameBatch(
        images=images,
        cropboxes=crops,
        gts=gts,
        y_offsets=offsets[:, 0].copy(),
        x_offsets=np.asarray(xo),
        # flip-invariant (area is preserved by the horizontal mirror); the
        # grids must match the ones preprocess stored the records with
        # (cli --cropbox_grid/--bbox_grid), else the canonical-box area the
        # scale targets are measured against is silently wrong
        scales=record_log_scales(bboxes, cropbox_grid, bbox_grid),
    )


class PrefetchIterator:
    """Wrap a batch iterator with a background prefetch thread + device_put."""

    def __init__(self, it: Iterator, prefetch: int = 2, device_put=None):
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._sentinel = object()
        self._device_put = device_put
        self._error: Optional[BaseException] = None

        def worker():
            try:
                for item in it:
                    if device_put is not None:
                        item = device_put(item)
                    self._q.put(item)
            except BaseException as e:  # noqa: BLE001 — re-raised in __next__
                # a worker-thread failure (corrupt record, missing JPEG, ...)
                # must surface in the consumer, not truncate the epoch as a
                # clean StopIteration
                self._error = e
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._sentinel:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def batch_iterator(
    seqs,
    batch_size: int,
    gt_width: int = 8,
    shuffle: bool = True,
    seed: int = 42,
    reverse_image: bool = False,
    epochs: int = 1,
    decode_resize_hw=(720, 1280),
    cropbox_grid: int = 8,
    bbox_grid: int = 6,
):
    """Yield FrameBatch per training step, like the reference's epoch loop
    (direct_offset_output.py:292-353).

    decode_resize_hw=None ships native-size uint8 frames and leaves the
    TF1-semantics 720x1280 resize to the device (image_mode='raw') — 4-16x
    less host->device transfer; requires uniform frame sizes per batch."""
    from ntm_tracker_tpu.data.sequences import sevenbyseven_get_batch
    import random as _random

    rng = _random.Random(seed)
    seqs = list(seqs)
    usable = len(seqs) // batch_size * batch_size
    for _ in range(epochs):
        if shuffle:
            rng.shuffle(seqs)
        index = 0
        while index < usable:
            frame_names, index = sevenbyseven_get_batch(index, batch_size, seqs)
            try:
                yield load_frame_batch(
                    frame_names, gt_width, reverse_image=reverse_image,
                    decode_resize_hw=decode_resize_hw,
                    cropbox_grid=cropbox_grid, bbox_grid=bbox_grid,
                )
            except ValueError as e:
                if decode_resize_hw is None and ("stack" in str(e).lower() or "same shape" in str(e).lower()):
                    raise ValueError(
                        "device_resize needs uniform frame sizes within a "
                        "batch; use host resize (decode_resize_hw set) for "
                        "mixed-resolution batches"
                    ) from e
                raise
