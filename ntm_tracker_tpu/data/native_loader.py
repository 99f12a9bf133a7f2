"""ctypes binding for the native parallel record loader, with transparent
fallback to the pure-Python reader (data/preprocess.read_frame_record)."""

from __future__ import annotations

import ctypes
from typing import List, Sequence, Tuple

import numpy as np

_IMG_PATH_CAP = 1024


def _get_fn():
    from ntm_tracker_tpu.native.build import load_library

    lib = load_library("record_loader")
    fn = lib.load_records
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_char_p, ctypes.c_int,
    ]
    return fn


def native_available() -> bool:
    try:
        _get_fn()
        return True
    except RuntimeError:
        return False


def load_records_native(
    paths: Sequence[str], gt_width: int = 8, num_threads: int = 8
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, List[str]]:
    """Load n frame records in parallel.

    Returns (cropboxes [n,4], bboxes [n,4], offsets [n,2] (y,x),
             gts [n,gt,gt] float32, image_paths).
    Raises RuntimeError if the native library can't build; callers fall back
    to the Python reader.
    """
    fn = _get_fn()
    n = len(paths)
    gt_elems = gt_width * gt_width
    cropboxes = np.empty((n, 4), np.float32)
    bboxes = np.empty((n, 4), np.float32)
    offsets = np.empty((n, 2), np.float32)
    gts = np.empty((n, gt_elems), np.float32)
    img_buf = ctypes.create_string_buffer(n * _IMG_PATH_CAP)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])

    rc = fn(
        c_paths, n, gt_elems,
        cropboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        gts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img_buf, num_threads,
    )
    if rc != 0:
        raise IOError(f"native loader failed on record {rc - 1}: {paths[rc - 1]}")
    img_paths = [
        img_buf.raw[i * _IMG_PATH_CAP : (i + 1) * _IMG_PATH_CAP]
        .split(b"\0", 1)[0]
        .decode()
        for i in range(n)
    ]
    return cropboxes, bboxes, offsets, gts.reshape(n, gt_width, gt_width), img_paths
