"""Native C++ fast-path loader (built by webp_tpu/native/build.py)."""

import ctypes
import os

_LIB = None
_TRIED = False


def _lib_path():
    return os.path.join(os.path.dirname(__file__), "libwebptpu.so")


def load():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        p = _lib_path()
        if os.path.exists(p):
            try:
                _LIB = ctypes.CDLL(p)
            except OSError:
                _LIB = None
    return _LIB


def available() -> bool:
    return load() is not None
