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


class TestEditDistance:
    def test_known_distances(self):
        from nanodecoder_tpu.native import edit_distance

        assert edit_distance("", "") == 0
        assert edit_distance("ACGT", "ACGT") == 0
        assert edit_distance("ACGT", "AGGT") == 1   # sub
        assert edit_distance("ACGT", "ACGGT") == 1  # ins
        assert edit_distance("ACGT", "AGT") == 1    # del
        assert edit_distance("AAAA", "TTTT") == 4
        assert edit_distance("", "ACG") == 3

    def test_matches_python_dp(self, rng_np):
        from nanodecoder_tpu.native import edit_distance

        def slow(a, b):
            n, m = len(a), len(b)
            D = [[0] * (m + 1) for _ in range(n + 1)]
            for i in range(n + 1):
                D[i][0] = i
            for j in range(m + 1):
                D[0][j] = j
            for i in range(1, n + 1):
                for j in range(1, m + 1):
                    D[i][j] = min(D[i-1][j] + 1, D[i][j-1] + 1,
                                  D[i-1][j-1] + (a[i-1] != b[j-1]))
            return D[n][m]

        for _ in range(20):
            a = "".join(rng_np.choice(list("ACGT"), size=rng_np.integers(0, 60)))
            b = "".join(rng_np.choice(list("ACGT"), size=rng_np.integers(0, 60)))
            assert edit_distance(a, b) == slow(a, b), (a, b)

    def test_read_identity(self):
        from nanodecoder_tpu.native import read_identity

        assert read_identity("ACGT", "ACGT") == 1.0
        assert abs(read_identity("ACGA", "ACGT") - 0.75) < 1e-9
        assert read_identity("", "ACGT") == 0.0
