"""ctypes binding for the native JPEG decode+resize pipeline
(native/jpeg_pipeline.cpp): the loader's host-side hot path — libjpeg
decode and the TF1-grid bilinear upscale — in one C++ thread pool, no GIL.

Raises RuntimeError when the toolchain/libjpeg is unavailable or a decode
fails; callers fall back to the PIL+numpy path (data/loader.py)."""

from __future__ import annotations

import ctypes
import os
from typing import Sequence, Tuple

import numpy as np

from ntm_tracker_tpu.native.build import load_library

_FN = None


def _load():
    global _FN
    if _FN is None:
        lib = load_library("jpeg_pipeline", ldflags=("-ljpeg",))
        fn = lib.ntm_decode_resize_batch
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        _FN = fn
    return _FN


def decode_resize_batch_native(
    paths: Sequence[str], out_hw: Tuple[int, int], num_threads: int = 0
) -> np.ndarray:
    """Decode `paths` and TF1-bilinear-resize each to out_hw.

    Returns float32 [N, out_h, out_w, 3]. num_threads=0 uses one thread per
    core (capped at 16)."""
    fn = _load()
    n = len(paths)
    out_h, out_w = out_hw
    out = np.empty((n, out_h, out_w, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 8, 16)
    errbuf = ctypes.create_string_buffer(512)
    rc = fn(
        c_paths, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads, errbuf, len(errbuf),
    )
    if rc != 0:
        raise RuntimeError(f"native jpeg pipeline failed: {errbuf.value.decode()}")
    return out
