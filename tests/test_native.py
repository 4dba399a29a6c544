"""Native C++ host-kernel tests: build, bind, and match the python
reference implementation exactly."""

import numpy as np
import pytest

from nanodecoder_tpu.native import best_overlap_len_native, load


def _py_best_overlap(left: str, right: str, max_k: int) -> int:
    max_k = min(max_k, len(left), len(right))
    if max_k <= 0:
        return 0
    lbuf = np.frombuffer(left[-max_k:].encode(), np.uint8)
    rbuf = np.frombuffer(right[:max_k].encode(), np.uint8)
    best_k, best_score = 0, 0
    for k in range(1, max_k + 1):
        eq = int(np.count_nonzero(lbuf[max_k - k:] == rbuf[:k]))
        score = 2 * eq - k
        if score > best_score:
            best_k, best_score = k, score
    return best_k


def test_native_builds():
    assert load() is not None, "g++ build of native overlap kernel failed"


def test_native_matches_python(rng_np):
    for _ in range(50):
        n1 = int(rng_np.integers(1, 200))
        n2 = int(rng_np.integers(1, 200))
        left = "".join(rng_np.choice(list("ACGT"), size=n1))
        right = "".join(rng_np.choice(list("ACGT"), size=n2))
        # Sometimes make a true overlap
        if rng_np.random() < 0.5 and n1 > 20:
            k = int(rng_np.integers(5, min(n1, 60)))
            right = left[-k:] + right
        max_k = int(rng_np.integers(1, 120))
        got = best_overlap_len_native(left.encode(), right.encode(), max_k)
        want = _py_best_overlap(left, right, max_k)
        assert got == want, (left, right, max_k, got, want)


def test_native_finds_known_overlap():
    left = "A" * 50 + "ACGTACGTACGTACGT"
    right = "ACGTACGTACGTACGT" + "C" * 50
    assert best_overlap_len_native(left.encode(), right.encode(), 40) == 16
