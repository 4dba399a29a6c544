"""Native (C++) host kernels, built on demand with g++ + bound via ctypes.

The compute path is JAX/XLA/Pallas (device); this tier covers host-side
post-processing hot spots.  Build artifacts land in the package dir
(falls back to a temp dir when read-only); loading is lazy and failures
degrade silently to the python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "overlap.cpp")
_lib = None
_build_failed = False


def _so_path() -> str:
    d = os.path.dirname(__file__)
    if os.access(d, os.W_OK):
        return os.path.join(d, "_overlap.so")
    return os.path.join(tempfile.gettempdir(), "nanodecoder_overlap.so")


def _build() -> str | None:
    so = _so_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", so],
            check=True, capture_output=True, timeout=120,
        )
        return so
    except Exception:
        return None


def load() -> ctypes.CDLL | None:
    """The compiled library, or None when unavailable (no g++ etc.)."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    so = _build()
    if so is None:
        _build_failed = True
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.best_overlap_len.restype = ctypes.c_int
        lib.best_overlap_len.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib
    except OSError:
        _build_failed = True
        return None


def best_overlap_len_native(left: bytes, right: bytes, max_k: int) -> int | None:
    """Native overlap scorer; None when the native lib is unavailable."""
    lib = load()
    if lib is None:
        return None
    return int(lib.best_overlap_len(left, len(left), right, len(right), max_k))
