"""Training data pipeline + synthetic nanopore signal simulator.

Reference analog: preprocess.py + the lazy shard iterator
(SURVEY.md §2.1 'Preprocess entry', §3.3) — the reference pairs signal
chunks with ground-truth base labels produced offline.

Because the reference mount is empty this round (SURVEY.md §0, §7 R1),
the framework ships a *simulator* producing nanopore-like signal from
random DNA: each base emits a dwell of D~Gamma samples at a
base/context-dependent current level plus noise — enough structure that
a seq2seq model genuinely has to learn alignment + classification, and
enough to exercise the full train->basecall->stitch->parity loop.
Real-data ingest drops into the same `examples -> batches` API.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np

from nanodecoder_tpu.config import Config
from nanodecoder_tpu.vocab import BOS_ID, EOS_ID, PAD_ID


def pack_targets(ids: np.ndarray, tmax: int) -> tuple[np.ndarray, np.ndarray]:
    """Token ids -> fixed-shape (tgt_in, tgt_out) teacher-forcing pair:
    tgt_in = BOS + ids, tgt_out = ids + EOS, both PAD-padded to tmax.
    `ids` must already be truncated to <= tmax - 1."""
    assert ids.shape[0] <= tmax - 1, "ids must leave room for EOS"
    tgt_in = np.full(tmax, PAD_ID, np.int32)
    tgt_out = np.full(tmax, PAD_ID, np.int32)
    L = ids.shape[0]
    tgt_in[0] = BOS_ID
    tgt_in[1 : L + 1] = ids
    tgt_out[:L] = ids
    tgt_out[L] = EOS_ID
    return tgt_in, tgt_out


@dataclasses.dataclass
class SimSpec:
    """Nanopore-ish signal model: 3-mer context current levels."""

    mean_dwell: float = 9.0      # samples per base
    dwell_shape: float = 3.0     # gamma shape (dwell jitter)
    noise_sigma: float = 0.25    # gaussian current noise
    context: int = 3             # k-mer size driving the level table
    seed: int = 1234

    def level_table(self) -> np.ndarray:
        """(4**context,) current levels in 'normalized pA', fixed by seed."""
        rng = np.random.default_rng(self.seed)
        return rng.normal(0.0, 1.0, size=4 ** self.context).astype(np.float32)


def simulate_read_with_dwells(
    rng: np.random.Generator,
    n_bases: int,
    spec: SimSpec,
    levels: np.ndarray | None = None,
) -> tuple[str, np.ndarray, np.ndarray]:
    """Random DNA -> (sequence, float32 signal, per-base dwell counts)."""
    if levels is None:
        levels = spec.level_table()
    bases = rng.integers(0, 4, size=n_bases)
    k = spec.context
    # Context index of base i: bases[i-k+1..i] as a base-4 number (edges clamp).
    padded = np.concatenate([np.full(k - 1, bases[0]), bases])
    ctx_idx = np.zeros(n_bases, np.int64)
    for j in range(k):
        ctx_idx = ctx_idx * 4 + padded[j : j + n_bases]
    dwells = np.maximum(
        rng.gamma(spec.dwell_shape, spec.mean_dwell / spec.dwell_shape, size=n_bases),
        1.0,
    ).astype(np.int64)
    sig = np.repeat(levels[ctx_idx], dwells)
    sig = sig + rng.normal(0.0, spec.noise_sigma, size=sig.shape[0]).astype(np.float32)
    seq = "".join("ACGT"[b] for b in bases)
    return seq, sig.astype(np.float32), dwells


def simulate_read(
    rng: np.random.Generator,
    n_bases: int,
    spec: SimSpec,
    levels: np.ndarray | None = None,
) -> tuple[str, np.ndarray]:
    """Random DNA -> (sequence, float32 signal) under the simulator."""
    seq, sig, _ = simulate_read_with_dwells(rng, n_bases, spec, levels)
    return seq, sig


def make_example(
    rng: np.random.Generator,
    config: Config,
    spec: SimSpec,
    levels: np.ndarray,
) -> dict[str, np.ndarray]:
    """One (signal chunk, target) training pair with static shapes.

    A window of exactly `chunk_len` samples is cut out of a longer
    simulated read — matching the inference-time chunker's base density
    (including partial dwells at the window edges).  Labels are the
    bases whose dwell *midpoint* falls inside the window (the simulator
    knows exact dwell boundaries, so labels are exact, not
    proportional).  ~10% of examples are short (padded) windows to
    cover the tail-chunk path.

    signal: (chunk_len,) f32 (zero-padded), sig_length: () i32,
    tgt_in: (T,) i32 = BOS + bases, tgt_out: (T,) i32 = bases + EOS,
    both PAD-padded to T = max_decode_len.
    """
    scfg, mcfg = config.signal, config.model
    tmax = mcfg.max_decode_len
    clen = scfg.chunk_len

    short = rng.random() < 0.1
    window = int(rng.integers(clen // 8, clen)) if short else clen
    # Enough bases that the signal definitely covers window + slack.
    n_bases = int(window / spec.mean_dwell * 1.6) + 8
    seq, sig, dwells = simulate_read_with_dwells(rng, n_bases, spec, levels)
    total = sig.shape[0]
    start = int(rng.integers(0, max(total - window, 0) + 1))
    sig = sig[start : start + window]
    n = sig.shape[0]

    # Bases whose dwell midpoint lies in [start, start+n).
    ends = np.cumsum(dwells)
    mids = ends - dwells / 2.0
    sel = (mids >= start) & (mids < start + n)
    label = "".join(c for c, m in zip(seq, sel) if m)

    signal = np.zeros(clen, np.float32)
    signal[:n] = sig
    from nanodecoder_tpu.io.signal import normalize_signal

    signal[:n] = normalize_signal(signal[:n], scfg.normalization, scfg.mad_scale,
                                  scfg.clip_sigma)

    from nanodecoder_tpu.vocab import make_vocab

    # Tokenize through the configured k-mer vocab (truncate at a token
    # boundary, leaving room for EOS).
    ids = make_vocab(mcfg.kmer_k).encode(label)[: tmax - 1]
    tgt_in, tgt_out = pack_targets(ids, tmax)
    return {
        "signal": signal,
        "sig_lengths": np.int32(n),
        "tgt_in": tgt_in,
        "tgt_out": tgt_out,
    }


def synthetic_batches(
    config: Config,
    spec: SimSpec | None = None,
    seed: int = 0,
    accum_axis: bool = True,
) -> Iterator[dict[str, np.ndarray]]:
    """Infinite iterator of batch pytrees shaped for make_train_step:
    (A, B, ...) when accum_axis else (B, ...)."""
    spec = spec or SimSpec()
    levels = spec.level_table()
    rng = np.random.default_rng(seed)
    a = config.train.accum_steps
    b = config.train.batch_size
    count = a * b if accum_axis else b
    while True:
        exs = [make_example(rng, config, spec, levels) for _ in range(count)]
        batch = {k: np.stack([e[k] for e in exs]) for k in exs[0]}
        if accum_axis:
            batch = {k: v.reshape((a, b) + v.shape[1:]) for k, v in batch.items()}
        yield batch


def prefetch_batches(
    it: Iterator[dict[str, np.ndarray]], depth: int = 4
) -> Iterator[dict[str, np.ndarray]]:
    """Overlap host-side batch generation with device steps.

    A single daemon producer thread drains `it` into a bounded queue
    (preserving the source stream exactly — training stays
    deterministic); the consumer blocks only when generation falls
    behind.  Reference analog: the producer/iterator feeding per-GPU
    batches (SURVEY.md §2.4 DP row); here it exists because the
    synthetic simulator is host-compute-bound while the train step is
    a ~4ms device program (docs/PERF.md).
    """
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _SENTINEL = object()  # source exhausted cleanly

    def _put(item) -> bool:
        """Bounded put that gives up when the consumer has stopped."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def producer() -> None:
        # Source errors are enqueued and re-raised in the consumer —
        # NOT converted into the exhaustion sentinel (a masked producer
        # exception surfaces as a bare StopIteration in the train loop
        # and skips the final checkpoint save).
        try:
            for batch in it:
                if not _put(batch):
                    return
            _put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — relayed, not swallowed
            _put(e)

    t = threading.Thread(target=producer, daemon=True, name="batch-prefetch")
    t.start()
    try:
        while True:
            batch = q.get()
            if batch is _SENTINEL:
                return
            if isinstance(batch, BaseException):
                raise batch
            yield batch
    finally:
        stop.set()


def interleave_batches(
    config: Config,
    seeds: tuple[int, ...],
    spec: SimSpec | None = None,
    accum_axis: bool = True,
    depth: int = 2,
) -> Iterator[dict[str, np.ndarray]]:
    """Multi-worker synthetic generation: one producer thread per seed,
    batches interleaved through a shared bounded queue.  Each worker's
    stream is deterministic per its seed; the *interleaving order* is
    not — use the single-producer `prefetch_batches(synthetic_batches(...))`
    when exact batch-order reproducibility matters more than feed rate.
    """
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=max(depth, len(seeds)))
    stop = threading.Event()

    def worker(seed: int) -> None:
        # Worker exceptions are relayed through the queue; the generators
        # are infinite, so a worker only exits on stop or error.
        try:
            src = synthetic_batches(config, spec=spec, seed=seed,
                                    accum_axis=accum_axis)
            for batch in src:
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — relayed, not swallowed
            while not stop.is_set():
                try:
                    q.put(e, timeout=0.5)
                    return
                except queue.Full:
                    continue

    threads = [
        threading.Thread(target=worker, args=(s,), daemon=True, name=f"sim-{s}")
        for s in seeds
    ]
    for t in threads:
        t.start()
    try:
        while True:
            try:
                item = q.get(timeout=5.0)
            except queue.Empty:
                if not any(t.is_alive() for t in threads):
                    raise RuntimeError(
                        "all interleave_batches workers died without "
                        "reporting an error"
                    ) from None
                continue
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def synthetic_valid_batches(config: Config, n_batches: int = 4, seed: int = 999,
                            spec: SimSpec | None = None):
    """Finite list of micro-batches (B, ...) for validation."""
    it = synthetic_batches(config, spec=spec, seed=seed, accum_axis=False)
    return [next(it) for _ in range(n_batches)]
