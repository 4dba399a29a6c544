"""Streaming basecall engine: async ingest -> device pipeline -> FASTQ.

Reference analog: the NanoDecoder basecall entry script walking a fast5
dir and calling Translator per batch (SURVEY.md §3.2) — but re-built
around the TPU execution model:

  * chunks from MANY reads are packed into one fixed device shape
    (one XLA program, compiled once),
  * dispatch-ahead: JAX's async dispatch keeps >=`depth` batches in
    flight so host ingest/stitch overlaps device decode
    (BASELINE config C4: "async fast5/pod5 ingest, data-parallel"),
  * reads are stitched + written the moment their last chunk arrives
    (bounded memory over arbitrarily large flowcells),
  * resumable: completed read ids can be skipped on restart
    (SURVEY.md §5.3 — resumable inference).
"""

from __future__ import annotations

import collections
import os
import threading
import time
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from nanodecoder_tpu.config import Config
from nanodecoder_tpu.decode.beam import beam_decode
from nanodecoder_tpu.decode.greedy import greedy_decode
from nanodecoder_tpu.decode.translator import _phred_from_log_probs
from nanodecoder_tpu.io.pipeline import AsyncChunkPipeline, PackedBatch
from nanodecoder_tpu.io.stitch import stitch_chunks
from nanodecoder_tpu.models.model import encode
from nanodecoder_tpu.utils.logging import get_logger
from nanodecoder_tpu.utils.statistics import ThroughputMeter
from nanodecoder_tpu.vocab import make_vocab

log = get_logger("engine")


def _finish_read_task(read_id: str, parts, cb, stitch_method: str,
                      kmer_k: int, write_format: str):
    """Per-read finalization (k-mer expand + Phred + stitch + record
    formatting), shaped to run in the INGEST PROCESS POOL: the ~1.7 ms
    of numpy/string work per read held the GIL in the collector thread
    and starved the producer (round-4 stage budget: stitch+write
    41 ms/batch busy while ingest-wait was the top stage).  Inputs are
    a few KB of token arrays; output is the formatted FASTX record.

    parts: [(tokens, tok_len, lps, pos), ...] in chunk order;
    cb: the read's ChunkBatch (starts/lengths/overlap metadata)."""
    from nanodecoder_tpu.vocab import make_vocab

    vocab = make_vocab(kmer_k)  # lru-cached per worker process
    seqs, quals, positions = [], [], []
    for toks, tlen, lps, pos in parts:
        seq_c, pos_c, lp_c = vocab.decode_expand(
            toks[:tlen], pos[:tlen], lps[:tlen])
        seqs.append(seq_c)
        quals.append(_phred_from_log_probs(lp_c))
        positions.append(pos_c)
    if stitch_method == "attn":
        from nanodecoder_tpu.io.stitch import stitch_chunks_attn

        seq, qual = stitch_chunks_attn(seqs, positions, cb.starts,
                                       cb.lengths, quals=quals)
    else:
        seq, qual = stitch_chunks(
            seqs, cb.starts, cb.lengths, cb.chunk_len, cb.chunk_overlap,
            method=stitch_method, quals=quals,
        )
    if write_format == "fastq":
        import io as _io

        from nanodecoder_tpu.io.fastx import write_fastq

        buf = _io.StringIO()
        write_fastq([(read_id, seq, qual)], buf)
        record = buf.getvalue()
    else:
        record = f">{read_id}\n{seq}\n"
    return record, len(seq)


class StreamingBasecaller:
    def __init__(self, params, config: Config, mesh_plan=None, depth: int = 2,
                 attn_pos: bool = True):
        """attn_pos=False drops the per-token attention-position tensor
        from the device program's outputs — it is consumed only by the
        "attn" stitcher, and on the tunneled relay every D2H byte is
        wall time (~98 KB/batch at b512; the link is the engine's
        binding resource once ingest and stitch run in the process
        pool)."""
        self.config = config
        self.depth = depth
        self.attn_pos = attn_pos
        mcfg, dcfg = config.model, config.decode
        self.vocab = make_vocab(mcfg.kmer_k)

        # Params are jit arguments (device-resident), never closures —
        # see Translator.__init__ for the measured cost of capturing.

        def _compact(tokens, lengths, lps, sample_pos):
            """Shrink the D2H transfer (the relay's per-batch transfer
            measured ~26 MB/s): token ids fit int16 for any vocab this
            model family uses, sample positions fit int16 (< chunk_len),
            and f16 log-probs keep ~3 significant digits — far inside
            Phred rounding.  attn_pos=False drops the position tensor
            entirely (only the "attn" stitcher reads it)."""
            outs = (tokens.astype(jnp.int16), lengths,
                    lps.astype(jnp.float16))
            if attn_pos:
                outs = outs + (sample_pos.astype(jnp.int16),)
            return outs

        # H2D wire dtype (io/pipeline converts; config.DecodeConfig
        # h2d_dtype): dequantized on device by io.signal.wire_to_f32
        # (int8 fixed-scale; int4 per-chunk-scale sub-byte packing).
        from nanodecoder_tpu.io.signal import wire_to_f32

        h2d_name = dcfg.resolve_h2d(mcfg.compute_dtype)
        clip_sigma = config.signal.clip_sigma
        chunk_len = config.signal.chunk_len

        def greedy_program(params, signal, lengths):
            signal = wire_to_f32(signal, h2d_name, clip_sigma, chunk_len)
            memory, mem_len = encode(params, mcfg, signal, lengths)
            r = greedy_decode(params, mcfg, memory, mem_len, min_len=dcfg.min_len)
            ds = mcfg.time_downsample
            return _compact(r.tokens, r.lengths, r.token_log_probs,
                            r.attn_pos * ds + ds // 2)

        def beam_program(params, signal, lengths):
            signal = wire_to_f32(signal, h2d_name, clip_sigma, chunk_len)
            memory, mem_len = encode(params, mcfg, signal, lengths)
            r = beam_decode(params, mcfg, dcfg, memory, mem_len)
            # Exact per-token lps + attn positions of the best hypothesis
            # (backpointer reconstruction in decode/beam.py) — beam mode
            # emits real Phred strings and supports the attn stitcher.
            ds = mcfg.time_downsample
            return _compact(r.tokens[:, 0], r.lengths[:, 0],
                            r.token_log_probs[:, 0],
                            r.attn_pos[:, 0] * ds + ds // 2)

        def sample_program(params, signal, lengths, key):
            from nanodecoder_tpu.decode.sampling import sample_decode

            signal = wire_to_f32(signal, h2d_name, clip_sigma, chunk_len)
            memory, mem_len = encode(params, mcfg, signal, lengths)
            r = sample_decode(params, mcfg, dcfg, memory, mem_len, key)
            ds = mcfg.time_downsample
            return _compact(r.tokens, r.lengths, r.token_log_probs,
                            r.attn_pos * ds + ds // 2)

        attn_pos = self.attn_pos
        self._sampling = dcfg.mode == "sample"
        if self._sampling:
            program = sample_program
            self._sample_base_key = jax.random.PRNGKey(dcfg.sampling_seed)
            self._sample_batch_no = 0
        else:
            program = greedy_program if dcfg.mode == "greedy" else beam_program
            if dcfg.mode == "beam":
                from nanodecoder_tpu.decode.beam import warn_if_beam_spill

                warn_if_beam_spill(dcfg)
        # One-time serving fold (see Translator.__init__): the per-batch
        # program receives pre-folded compute-dtype weights.
        from nanodecoder_tpu.models.model import prepare_serving_params

        params = jax.jit(lambda p: prepare_serving_params(p, mcfg))(
            jax.device_put(params))
        if mesh_plan is not None:
            self._params = mesh_plan.replicate(params)
            self._program = mesh_plan.shard_decode_fn(
                program, n_extra_replicated=1 if self._sampling else 0)
            self._place = mesh_plan.shard_batch
        else:
            self._params = params
            self._program = jax.jit(program)
            self._place = lambda b: b

    def _decode(self, signal, lengths):
        if self._sampling:
            key = jax.random.fold_in(self._sample_base_key, self._sample_batch_no)
            self._sample_batch_no += 1
            return self._program(self._params, signal, lengths, key)
        return self._program(self._params, signal, lengths)

    # -----------------------------------------------------------------

    def run(
        self,
        files: list[str],
        out,
        stitch_method: str = "trim",
        skip_read_ids: Iterable[str] = (),
        num_workers: int = 4,
        meter: ThroughputMeter | None = None,
        write_format: str = "fastq",
        done_log=None,
        stage_timer=None,
    ) -> ThroughputMeter:
        """Basecall `files`, writing FASTQ/FASTA records to text file `out`.

        `done_log`: optional file handle; completed read ids are appended
        one per line (resume support — pass previous contents as
        `skip_read_ids` on restart).
        `stage_timer`: optional utils.StageTimer — accumulates per-stage
        wall time (ingest-wait / dispatch / collect / stitch+write), the
        SURVEY §5.1 observability the reference lacks."""
        from nanodecoder_tpu.io.fastx import write_fasta, write_fastq
        from nanodecoder_tpu.utils.profiling import StageTimer

        timer = stage_timer if stage_timer is not None else StageTimer()

        cfg = self.config
        skip = set(skip_read_ids)
        # H2D wire dtype: auto = f16 in bf16 fast mode (finer than the
        # bf16 compute quantization), f32 in parity mode; int8 opt-in
        # halves the relay-bound transfer again (config.DecodeConfig).
        h2d = cfg.decode.resolve_h2d(cfg.model.compute_dtype)
        pipe = AsyncChunkPipeline(
            files, cfg.signal, cfg.decode.effective_batch_chunks(engine=True),
            num_workers=num_workers,
            h2d_dtype=h2d,
        ).start()
        meter = meter or ThroughputMeter(n_reads=0)

        # per-read assembly state
        per_read: dict[int, dict[int, tuple[np.ndarray, int, np.ndarray]]] = (
            collections.defaultdict(dict)
        )
        # Per-read finalization runs in the shared ingest process pool
        # (see _finish_read_task); the collector only submits a few KB
        # of token arrays and later writes the returned record.  Output
        # order = read completion order (FIFO drain).
        from nanodecoder_tpu.io.pipeline import _get_ingest_pool

        stitch_pool = _get_ingest_pool(num_workers)
        stitch_futs: collections.deque = collections.deque()

        def finish_read(ridx: int) -> None:
            rc = pipe.reads[ridx]
            if rc.read.read_id in skip:
                per_read.pop(ridx, None)
                return
            parts = per_read.pop(ridx)
            cb = rc.chunks
            parts_list = [parts[ci] for ci in range(cb.n_chunks)]
            # Ship only the stitch metadata across the process pipe:
            # cb.chunks still holds the read's full converted signal
            # (~100+ KB/read), which the worker never reads — mirror the
            # _EMPTY_SIGNAL trick io/pipeline uses for RawRead.
            import dataclasses as _dc

            cb_meta = _dc.replace(
                cb, chunks=np.zeros((cb.n_chunks, 0), np.float32))
            stitch_futs.append((
                stitch_pool.submit(_finish_read_task, rc.read.read_id,
                                   parts_list, cb_meta, stitch_method,
                                   cfg.model.kmer_k, write_format),
                rc.read.read_id, cb.total_samples, cb.n_chunks,
            ))

        def drain_finished(block: bool = False) -> None:
            """Write completed records (FIFO).  block=True waits for all."""
            while stitch_futs and (block or stitch_futs[0][0].done()):
                fut, read_id, n_samples, n_chunks = stitch_futs.popleft()
                record, n_bases = fut.result()
                out.write(record)
                if done_log is not None:
                    done_log.write(read_id + "\n")
                meter.update(n_samples, n_bases, n_chunks, 1)

        # Collection (device->host transfer + assembly + stitch + write)
        # runs on its OWN thread behind a bounded queue: np.asarray
        # releases the GIL during the transfer, so collecting batch i
        # overlaps dispatching/computing batches i+1..i+depth instead
        # of serializing with them (collect was 87% of engine wall time
        # when serial — docs/PERF.md round 2).  The queue bound is the
        # device-buffer backpressure (same role `in_flight` played).
        #
        # The D2H conversion itself goes through a small thread POOL:
        # on the tunneled relay a batch transfer is latency-bound
        # (~155 ms measured vs ~8 ms of bytes at relay bandwidth), so
        # transfers of consecutive in-flight batches must overlap each
        # other, not just overlap dispatch.  Ordering is preserved by
        # the FIFO queue of futures; assembly stays single-threaded.
        import queue as _queue
        from concurrent.futures import ThreadPoolExecutor

        depth = max(self.depth, 1)
        result_q: _queue.Queue = _queue.Queue(maxsize=depth)
        transfer_pool = ThreadPoolExecutor(max_workers=depth,
                                           thread_name_prefix="engine-d2h")
        collector_exc: list[BaseException] = []

        def to_host(dev_out):
            return tuple(np.asarray(x) for x in dev_out)

        def collect_one(item) -> None:
            fut, packed = item
            with timer.stage("d2h-wait"):
                tokens, tlens, lps, *rest = fut.result()
                # attn_pos=False mode: positions never crossed the
                # link; the expand stream still needs a same-shape
                # array (values unused by trim/align stitching).
                pos = rest[0] if rest else np.zeros_like(tokens)
            with timer.stage("stitch+write"):
                for row, (ridx, ci) in enumerate(packed.sources):
                    per_read[ridx][ci] = (tokens[row], int(tlens[row]), lps[row], pos[row])
                    if len(per_read[ridx]) == pipe.reads[ridx].chunks.n_chunks:
                        finish_read(ridx)
                drain_finished()
                # One durability point per batch, not per read (a flush
                # is a syscall; resume re-basecalls at most one batch).
                # The OUTPUT flushes first so it is always at least as
                # durable as the done log: a crash between the two can
                # only re-basecall reads, never silently drop records
                # the done log (or the resume output-scan) already
                # claims as complete.
                if done_log is not None:
                    out.flush()
                    done_log.flush()

        def collector() -> None:
            while True:
                item = result_q.get()
                if item is None:
                    # Final drain: wait out the in-flight stitch tasks.
                    if not collector_exc:
                        try:
                            with timer.stage("stitch+write"):
                                drain_finished(block=True)
                                if done_log is not None:
                                    out.flush()
                                    done_log.flush()
                        except BaseException as e:  # noqa: BLE001
                            collector_exc.append(e)
                    return
                if not collector_exc:
                    try:
                        collect_one(item)
                    except BaseException as e:  # noqa: BLE001 — relayed to caller
                        collector_exc.append(e)
                # After a failure, keep draining so the producer's
                # bounded put() never deadlocks.

        col_thread = threading.Thread(target=collector, name="engine-collector",
                                      daemon=True)
        col_thread.start()
        # Wall-time attribution (VERDICT r3 weak #2): the producer loop
        # and the collector thread run CONCURRENTLY, so per-stage totals
        # can exceed wall time.  Each chain's stages DO sum to that
        # chain's busy time, so the budget reports both chains plus the
        # wall; the binding chain is the one whose total approaches the
        # wall.  producer chain = ingest-wait + dispatch +
        # backpressure-wait (blocked on the bounded result queue, i.e.
        # waiting for the collector/device); collector chain = d2h-wait
        # (transfer completion) + stitch+write.
        t_wall0 = time.perf_counter()
        try:
            batches = pipe.batches()
            while not collector_exc:
                with timer.stage("ingest-wait"):
                    packed = next(batches, None)
                if packed is None:
                    break
                with timer.stage("dispatch"):
                    batch = self._place(
                        {"signal": jnp.asarray(packed.chunks),
                         "lengths": jnp.asarray(packed.lengths)}
                    )
                    dev_out = self._decode(batch["signal"], batch["lengths"])
                    fut = transfer_pool.submit(to_host, dev_out)
                with timer.stage("backpressure-wait"):
                    result_q.put((fut, packed))
        finally:
            result_q.put(None)
            col_thread.join()
            transfer_pool.shutdown(wait=False)
            pipe.stop()
            timer.totals["wall"] += time.perf_counter() - t_wall0
            timer.counts["wall"] += 1
        if collector_exc:
            raise collector_exc[0]
        return meter
