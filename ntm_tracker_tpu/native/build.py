"""Build-and-cache for the native components.

Compiles <name>.cpp next to this file into a shared library under
~/.cache/ntm_tracker_tpu (keyed by source hash), loads it with ctypes.
Callers must handle RuntimeError and fall back to pure Python — the
framework never hard-requires the native path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

_CACHE: dict[str, ctypes.CDLL] = {}


def load_library(name: str, ldflags: tuple = ()) -> ctypes.CDLL:
    if name in _CACHE:
        return _CACHE[name]
    src = Path(__file__).parent / f"{name}.cpp"
    code = src.read_bytes() + repr(ldflags).encode()
    digest = hashlib.sha256(code).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get("NTM_TRACKER_CACHE", os.path.expanduser("~/.cache/ntm_tracker_tpu"))
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    so_path = cache_dir / f"{name}-{digest}.so"
    if not so_path.exists():
        # pid-unique temp: concurrent cold-cache builds must not interleave
        # writes into the same file before the atomic publish
        tmp = so_path.with_suffix(f".so.tmp.{os.getpid()}")
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
            str(src), "-o", str(tmp), *ldflags,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            detail = getattr(e, "stderr", str(e))
            raise RuntimeError(f"native build failed for {name}: {detail}") from e
        os.replace(tmp, so_path)
    try:
        lib = ctypes.CDLL(str(so_path))
    except OSError as e:
        # a corrupt/foreign-arch cached .so must trigger the Python
        # fallback (callers catch RuntimeError), and must not poison the
        # cache forever
        try:
            os.unlink(so_path)
        except OSError:
            pass
        raise RuntimeError(f"native library load failed for {name}: {e}") from e
    _CACHE[name] = lib
    return lib
