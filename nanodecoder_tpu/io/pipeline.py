"""Async streaming ingest: fast5 files -> normalized chunk batches.

Reference analog: the reference reads fast5 synchronously inside the
basecall loop (SURVEY.md §3.2) — once decode is fast, h5py becomes the
bottleneck (§7 R5).  This pipeline keeps chips fed:

  reader thread pool (h5py, normalize, chunk)
      -> bounded queue of per-read chunk work
      -> batcher packing chunks from MANY reads into fixed-shape
         (batch_chunks, chunk_len) device batches
      -> consumer (Translator/engine) with >=2 batches in flight.

Structured concurrency (SURVEY.md §5.2): one producer pool, one bounded
queue, clean shutdown via sentinels; no shared mutable state beyond the
queues.
"""

from __future__ import annotations

import dataclasses
import multiprocessing
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

from nanodecoder_tpu.config import SignalConfig
from nanodecoder_tpu.io.fast5 import RawRead, iter_fast5_reads, list_signal_files, read_fast5_file
from nanodecoder_tpu.io.signal import (_PACKED_WIRES, ChunkBatch, chunk_signal,
                                        convert_h2d, normalize_signal)
from nanodecoder_tpu.utils.logging import get_logger

log = get_logger("pipeline")


@dataclasses.dataclass
class ReadChunks:
    """A read's chunks, queued for decoding."""

    read: RawRead
    chunks: ChunkBatch


@dataclasses.dataclass
class PackedBatch:
    """Fixed-shape batch of chunks drawn from >=1 reads.

    sources[i] = (read_index, chunk_index) for row i; rows beyond
    `n_real` are padding.
    """

    chunks: np.ndarray    # (batch_chunks, chunk_len) f32 (or f16 H2D mode)
    lengths: np.ndarray   # (batch_chunks,) i32
    sources: list[tuple[int, int]]
    n_real: int


_SENTINEL = object()
_EMPTY_SIGNAL = np.zeros((0,), np.float32)


def _ingest_file_worker(path: str, scfg: SignalConfig, h2d_name: str):
    """Full per-file ingest, run in a SUBPROCESS (process ingest mode):
    h5py/pod5 read, per-read normalization, chunking, and the H2D dtype
    cast all happen outside the parent's GIL.

    Measured motivation (round 4, 16 files x 24 reads): thread-mode
    ingest showed ZERO scaling from 1 to 16 workers (40 ms/batch flat)
    — h5py's global lock plus numpy's small-array ops (median/MAD on
    ~34k samples) hold the GIL, and the engine's collector/stitch
    threads compete for it.  The returned reads carry an EMPTY signal
    array (the raw signal is dead weight after chunking — sample counts
    live in ChunkBatch.total_samples); only the f16 chunks cross the
    process pipe (~3.4 MB/file)."""
    out = []
    for read in read_fast5_file(path):
        norm = normalize_signal(read.signal, scfg.normalization,
                                scfg.mad_scale, scfg.clip_sigma)
        cb = chunk_signal(norm, scfg.chunk_len, scfg.chunk_overlap,
                          scfg.min_chunk_fill)
        cb = dataclasses.replace(
            cb, chunks=convert_h2d(cb.chunks, h2d_name, scfg.clip_sigma))
        slim = RawRead(read_id=read.read_id, signal=_EMPTY_SIGNAL,
                       source_file=read.source_file)
        out.append(ReadChunks(read=slim, chunks=cb))
    return out


_INGEST_POOL = None
_INGEST_POOL_WORKERS = 0
_INGEST_POOL_LOCK = threading.Lock()


def _get_ingest_pool(num_workers: int):
    """Process-global persistent ingest pool (forkserver context).

    forkserver: worker processes fork from a clean single-threaded
    server, never from this multi-threaded jax/TPU parent (Python 3.12
    warns that such forks can deadlock in the child).  The server
    preloads the worker module so each worker starts warm.  The pool
    is grown (never shrunk) to the largest worker count requested and
    reused across pipelines/runs."""
    global _INGEST_POOL, _INGEST_POOL_WORKERS
    with _INGEST_POOL_LOCK:
        if _INGEST_POOL is None or _INGEST_POOL_WORKERS < num_workers:
            from concurrent.futures import ProcessPoolExecutor

            ctx = multiprocessing.get_context("forkserver")
            try:
                ctx.set_forkserver_preload(["nanodecoder_tpu.io.pipeline"])
            except Exception:  # pragma: no cover — preload is an optimization
                pass
            old = _INGEST_POOL
            _INGEST_POOL = ProcessPoolExecutor(max_workers=num_workers,
                                               mp_context=ctx)
            _INGEST_POOL_WORKERS = num_workers
            if old is not None:
                old.shutdown(wait=False, cancel_futures=True)
            else:
                import atexit

                atexit.register(
                    lambda: _INGEST_POOL and _INGEST_POOL.shutdown(
                        wait=False, cancel_futures=True))
    return _INGEST_POOL


class AsyncChunkPipeline:
    """files -> (ReadChunks stream, packed fixed-shape batches).

    Usage:
        pipe = AsyncChunkPipeline(files, signal_cfg, batch_chunks=32)
        for packed in pipe.batches():  # fixed-shape, ready for device
            ...
        reads = pipe.reads  # index -> RawRead/ChunkBatch bookkeeping
    """

    def __init__(
        self,
        files: list[str],
        scfg: SignalConfig,
        batch_chunks: int,
        num_workers: int = 4,
        queue_depth: int = 64,
        h2d_dtype=np.float32,
        ingest: str = "process",
    ):
        """`h2d_dtype`: dtype of the packed batch arrays.  float16
        halves the host->device transfer (the tunneled relay moves
        ~26 MB/s, so the 2 MB f32 signal batch is a first-order engine
        cost); z-scored signal clipped to +-5 sigma loses less
        precision in f16 than the bf16 compute path quantizes anyway,
        so the engine selects f16 whenever compute_dtype is bfloat16.

        `ingest`: "process" (default) runs per-file ingest in a
        subprocess pool — thread mode measured ZERO worker scaling
        (h5py lock + GIL; see _ingest_file_worker); "thread" keeps the
        in-process pool (no pickling, exercised by tests and useful
        when fork is unavailable)."""
        self.files = files
        self.scfg = scfg
        # Wire-name plumbing: "int4"/"int6" are packed sub-byte wires
        # (uint8 arrays of chunk_len/2 + 4 or 3*chunk_len/4 + 4 columns,
        # per-chunk scale in the trailing bytes — io.signal
        # quantize_h2d_int4/int6); every other name maps 1:1 onto a
        # numpy dtype of chunk_len columns.
        from nanodecoder_tpu.io.signal import wire_columns, wire_np_dtype

        self.h2d_name = str(h2d_dtype) if str(h2d_dtype) in _PACKED_WIRES \
            else np.dtype(h2d_dtype).name
        self.h2d_dtype = wire_np_dtype(self.h2d_name)
        self.wire_cols = wire_columns(scfg.chunk_len, self.h2d_name)
        self.batch_chunks = batch_chunks
        self.num_workers = num_workers
        if ingest not in ("process", "thread"):
            raise ValueError(f"unknown ingest mode {ingest!r}")
        self.ingest = ingest
        # queue_depth 64 reads ~= 2.4 batches at batch_chunks=512 (one
        # read is ~19 chunks); the old 16 could not hold even ONE
        # batch ahead of the consumer.
        self.read_queue: queue.Queue = queue.Queue(maxsize=queue_depth)
        self.reads: list[ReadChunks] = []
        self._stop = threading.Event()
        self._producer_thread: threading.Thread | None = None

    # --- producer --------------------------------------------------------

    def _process_file(self, path: str) -> list[ReadChunks]:
        out = []
        for read in read_fast5_file(path):
            norm = normalize_signal(
                read.signal, self.scfg.normalization, self.scfg.mad_scale,
                self.scfg.clip_sigma,
            )
            cb = chunk_signal(norm, self.scfg.chunk_len, self.scfg.chunk_overlap,
                              self.scfg.min_chunk_fill)
            out.append(ReadChunks(read=read, chunks=cb))
        return out

    def _put(self, item) -> bool:
        """Blocking put that aborts when stop() is requested — a plain
        put() can deadlock: the consumer may stop and drain ONCE while
        worker results are still arriving, after which the producer
        would block forever on the refilled bounded queue (caught by
        the shutdown stress test)."""
        while not self._stop.is_set():
            try:
                self.read_queue.put(item, timeout=0.05)
                return True
            except queue.Full:
                continue
        return False

    def _producer(self) -> None:
        try:
            if self.ingest == "process":
                self._producer_process_pool()
            else:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for result in pool.map(self._process_file, self.files):
                        for rc in result:
                            if not self._put(rc):
                                return
        except Exception as e:  # surface ingest errors to the consumer
            log.error("ingest failed: %s", e)
            self._put(e)
        finally:
            self._put(_SENTINEL)

    def _producer_process_pool(self) -> None:
        """Subprocess-pool ingest: real parallelism for the h5py+numpy
        per-file work.  At most 2*workers files are in flight; results
        are consumed in submission order (file order preserved,
        matching thread mode).  The pool is process-global and
        persistent (_get_ingest_pool): forkserver children are clean
        single-purpose processes — fork()ing this heavily threaded
        (engine collector/D2H/jax) parent risks inheriting a held lock
        in the child — and reuse avoids respawning workers every run."""
        import collections as _collections

        h2d_name = self.h2d_name
        pool = _get_ingest_pool(self.num_workers)
        futs: _collections.deque = _collections.deque()
        it = iter(self.files)

        def submit_next() -> None:
            path = next(it, None)
            if path is not None:
                futs.append(pool.submit(_ingest_file_worker, path,
                                        self.scfg, h2d_name))

        for _ in range(2 * self.num_workers):
            submit_next()
        while futs and not self._stop.is_set():
            result = futs.popleft().result()
            submit_next()
            for rc in result:
                if not self._put(rc):
                    return

    def start(self) -> "AsyncChunkPipeline":
        self._producer_thread = threading.Thread(target=self._producer, daemon=True)
        self._producer_thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        # Drain so the producer isn't blocked on a full queue.
        try:
            while True:
                self.read_queue.get_nowait()
        except queue.Empty:
            pass

    # --- consumer --------------------------------------------------------

    def read_stream(self) -> Iterator[ReadChunks]:
        """Yield reads in ingest order, recording them in self.reads."""
        if self._producer_thread is None:
            self.start()
        while True:
            item = self.read_queue.get()
            if item is _SENTINEL:
                return
            if isinstance(item, Exception):
                raise item
            self.reads.append(item)
            yield item

    def batches(self) -> Iterator[PackedBatch]:
        """Pack the chunk streams of consecutive reads into fixed-shape
        batches; the final partial batch is zero-padded."""
        clen = self.scfg.chunk_len
        bsz = self.batch_chunks
        buf_chunks: list[np.ndarray] = []
        buf_lens: list[int] = []
        buf_src: list[tuple[int, int]] = []

        def flush() -> PackedBatch:
            n_real = len(buf_chunks)
            chunks = np.zeros((bsz, self.wire_cols), self.h2d_dtype)
            lengths = np.zeros((bsz,), np.int32)
            quantize = self.h2d_name in ("int8",) + _PACKED_WIRES
            for i, (c, l) in enumerate(zip(buf_chunks, buf_lens)):
                # Process-mode rows arrive pre-converted; thread-mode
                # f32 rows into a quantized buffer need the rint
                # quantizer (plain assignment would truncate toward
                # zero / shape-mismatch the packed wire).
                chunks[i] = (convert_h2d(c, self.h2d_name, self.scfg.clip_sigma)
                             if quantize and c.dtype != self.h2d_dtype else c)
                lengths[i] = l
            pb = PackedBatch(chunks=chunks, lengths=lengths,
                             sources=list(buf_src), n_real=n_real)
            buf_chunks.clear()
            buf_lens.clear()
            buf_src.clear()
            return pb

        for ridx, rc in enumerate(self.read_stream()):
            for ci in range(rc.chunks.n_chunks):
                buf_chunks.append(rc.chunks.chunks[ci])
                buf_lens.append(int(rc.chunks.lengths[ci]))
                buf_src.append((ridx, ci))
                if len(buf_chunks) == bsz:
                    yield flush()
        if buf_chunks:
            yield flush()


def stream_chunk_batches(
    root: str,
    scfg: SignalConfig,
    batch_chunks: int,
    num_workers: int = 4,
    files: list[str] | None = None,
) -> AsyncChunkPipeline:
    files = files if files is not None else list_signal_files(root)
    return AsyncChunkPipeline(files, scfg, batch_chunks, num_workers=num_workers).start()
