"""Preprocessed training shards: write + lazy batch iterator.

Reference analog: preprocess.py writing torch .pt shards consumed
lazily by train.py (SURVEY.md §2.1, §3.3).  Format here: .npz files of
fixed-shape example arrays — numpy-native, mmap-friendly, no pickle.

Each shard holds:
  signal      (N, chunk_len) f32      sig_lengths (N,) i32
  tgt_in      (N, T) i32              tgt_out     (N, T) i32
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

import numpy as np

from nanodecoder_tpu.config import Config


def write_shard(path: str, examples: list[dict[str, np.ndarray]]) -> None:
    batch = {k: np.stack([e[k] for e in examples]) for k in examples[0]}
    # Uncompressed: float32 signal barely deflates, and compressed npz
    # members cannot be random-accessed — reads decompress whole arrays.
    np.savez(path, **batch)


def list_shards(shard_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(shard_dir, "*.npz")))


def shard_batches(
    shard_dir: str, config: Config, shuffle_seed: int = 0, loop: bool = True
) -> Iterator[dict[str, np.ndarray]]:
    """Yield (A, B, ...) batches by cycling shards; shuffles example
    order within each shard pass."""
    paths = list_shards(shard_dir)
    if not paths:
        raise FileNotFoundError(f"no .npz shards in {shard_dir}")
    a, b = config.train.accum_steps, config.train.batch_size
    need = a * b
    rng = np.random.default_rng(shuffle_seed)
    while True:
        for p in paths:
            # Materialize each member ONCE per shard pass: npz member
            # access decompresses/reads the whole array every time, so
            # per-batch data[k][idx] would re-read 10s of MB per step.
            with np.load(p) as data:
                arrays = {k: np.asarray(data[k]) for k in data.files}
            n = arrays["signal"].shape[0]
            order = rng.permutation(n)
            for start in range(0, n - need + 1, need):
                idx = order[start : start + need]
                yield {
                    k: v[idx].reshape((a, b) + v.shape[1:])
                    for k, v in arrays.items()
                }
        if not loop:
            return
