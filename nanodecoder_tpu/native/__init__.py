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
        lib.banded_edit_distance.restype = ctypes.c_int
        lib.banded_edit_distance.argtypes = [
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


def edit_distance(a: str, b: str, band: int | None = None) -> int:
    """Levenshtein distance.  Native banded implementation, widening
    the band until it covers the optimum; pure-python fallback."""
    ab, bb = a.encode(), b.encode()
    lib = load()
    if lib is not None:
        band = band or max(16, abs(len(a) - len(b)) + 8)
        while True:
            d = int(lib.banded_edit_distance(ab, len(ab), bb, len(bb), band))
            # The true distance is <= max(n, m); a band >= distance is
            # sufficient, so stop once the result fits within the band.
            if 0 <= d <= band or band >= max(len(a), len(b)):
                return d if d >= 0 else max(len(a), len(b))
            band *= 2
    # numpy fallback (full DP)
    import numpy as np

    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return n or m
    av = np.frombuffer(ab, np.uint8)
    bv = np.frombuffer(bb, np.uint8)
    prev = np.arange(m + 1)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, np.int64)
        cur[0] = i
        sub = prev[:-1] + (av[i - 1] != bv)
        np.minimum(sub, prev[1:] + 1, out=sub)
        # left-to-right dependency for insertions
        run = sub.copy()
        for j in range(1, m):  # pragma: no cover (fallback path)
            run[j] = min(run[j], run[j - 1] + 1)
        cur[1:] = run
        prev = cur
    return int(prev[m])


def read_identity(called: str, truth: str) -> float:
    """1 - edit_distance/len(truth) — the standard read-identity metric."""
    if not truth:
        return 1.0 if not called else 0.0
    return max(0.0, 1.0 - edit_distance(called, truth) / len(truth))
