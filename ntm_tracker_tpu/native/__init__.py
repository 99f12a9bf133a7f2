"""Native (C++) runtime components, built on demand with g++ and bound via
ctypes (no pybind11 in this environment)."""

from ntm_tracker_tpu.native.build import load_library
