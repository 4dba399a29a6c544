"""Streaming engine + async pipeline tests: fast5 dir -> FASTQ with
batching across reads, dispatch-ahead, resume, and a full e2e smoke
(SURVEY.md §4: integration tests the reference ran via CI shell)."""

import io
import os

import h5py
import numpy as np
import pytest

from nanodecoder_tpu.config import tiny_test_config
from nanodecoder_tpu.io.pipeline import AsyncChunkPipeline
from nanodecoder_tpu.io.signal import chunk_signal


def _write_fast5(path, reads):
    """reads: dict read_id -> float signal (stored uncalibrated)."""
    with h5py.File(path, "w") as f:
        for i, (rid, sig) in enumerate(reads.items()):
            g = f.create_group(f"Raw/Reads/Read_{i}") if i == 0 and len(reads) == 1 \
                else f.create_group(f"read_{rid}/Raw")
            if i == 0 and len(reads) == 1:
                g.attrs["read_id"] = rid.encode()
                g.create_dataset("Signal", data=sig.astype(np.int16))
            else:
                g.attrs["read_id"] = rid.encode()
                g.create_dataset("Signal", data=sig.astype(np.int16))


def _write_multi_fast5(path, reads):
    with h5py.File(path, "w") as f:
        for rid, sig in reads.items():
            raw = f.create_group(f"read_{rid}/Raw")
            raw.attrs["read_id"] = rid.encode()
            raw.create_dataset("Signal", data=sig.astype(np.int16))


class TestAsyncPipeline:
    def test_batches_cover_all_chunks(self, tmp_path, rng_np):
        scfg = tiny_test_config().signal
        reads = {f"r{i}": rng_np.normal(0, 300, size=rng_np.integers(300, 1500))
                 for i in range(5)}
        _write_multi_fast5(str(tmp_path / "a.fast5"), reads)
        pipe = AsyncChunkPipeline([str(tmp_path / "a.fast5")], scfg, batch_chunks=4,
                                  num_workers=2)
        total_rows = 0
        for pb in pipe.batches():
            assert pb.chunks.shape == (4, scfg.chunk_len)
            total_rows += pb.n_real
            for row in range(pb.n_real, 4):
                assert pb.lengths[row] == 0  # padding rows
        expect = sum(
            chunk_signal(np.asarray(sig, np.float32), scfg.chunk_len,
                         scfg.chunk_overlap).n_chunks
            for sig in reads.values()
        )
        assert total_rows == expect
        assert len(pipe.reads) == 5

    def test_error_propagates(self, tmp_path):
        scfg = tiny_test_config().signal
        bad = str(tmp_path / "bad.fast5")
        open(bad, "w").write("not hdf5")
        pipe = AsyncChunkPipeline([bad], scfg, batch_chunks=2)
        with pytest.raises(Exception):
            list(pipe.batches())

    def test_stop_is_clean(self, tmp_path, rng_np):
        scfg = tiny_test_config().signal
        reads = {f"r{i}": rng_np.normal(0, 300, size=800) for i in range(20)}
        _write_multi_fast5(str(tmp_path / "a.fast5"), reads)
        pipe = AsyncChunkPipeline([str(tmp_path / "a.fast5")], scfg, batch_chunks=2,
                                  queue_depth=2).start()
        it = pipe.batches()
        next(it)
        pipe.stop()  # must not deadlock

    def test_collector_thread_error_propagates(self, tiny_params, tiny_config,
                                               tmp_path, rng_np):
        """An exception raised on the collector thread (e.g. a failing
        output writer) must surface in run()'s caller, not hang the
        producer behind the bounded queue or die silently."""
        from nanodecoder_tpu.decode.engine import StreamingBasecaller

        reads = {f"r{i}": rng_np.normal(0, 300, size=700) for i in range(8)}
        _write_multi_fast5(str(tmp_path / "a.fast5"), reads)

        class BoomWriter:
            def write(self, s):
                raise RuntimeError("disk full")

        caller = StreamingBasecaller(tiny_params, tiny_config)
        with pytest.raises(RuntimeError, match="disk full"):
            caller.run([str(tmp_path / "a.fast5")], BoomWriter())


def _boom_finish_task(*args, **kwargs):
    raise RuntimeError("boom")


class TestStreamingEngine:
    @pytest.fixture(scope="class")
    def engine(self, tiny_params, tiny_config):
        from nanodecoder_tpu.decode.engine import StreamingBasecaller

        return StreamingBasecaller(tiny_params, tiny_config)

    def test_end_to_end_fastq(self, engine, tmp_path, rng_np):
        reads = {f"r{i}": rng_np.normal(0, 300, size=rng_np.integers(200, 900))
                 for i in range(4)}
        _write_multi_fast5(str(tmp_path / "a.fast5"), reads)
        out = io.StringIO()
        meter = engine.run([str(tmp_path / "a.fast5")], out)
        text = out.getvalue()
        assert text.count("@") >= 4
        for rid in reads:
            assert f"@{rid}\n" in text
        assert meter.n_reads == 4
        assert meter.n_samples == sum(len(s) for s in reads.values())

    def test_no_attn_pos_matches_default(self, tiny_params, tiny_config,
                                         tmp_path, rng_np):
        """attn_pos=False (positions never cross the link) must produce
        byte-identical trim-stitched output to the default program."""
        from nanodecoder_tpu.decode.engine import StreamingBasecaller

        reads = {f"r{i}": rng_np.normal(0, 300, size=600) for i in range(3)}
        _write_multi_fast5(str(tmp_path / "np.fast5"), reads)
        out_a, out_b = io.StringIO(), io.StringIO()
        StreamingBasecaller(tiny_params, tiny_config).run(
            [str(tmp_path / "np.fast5")], out_a)
        StreamingBasecaller(tiny_params, tiny_config, attn_pos=False).run(
            [str(tmp_path / "np.fast5")], out_b)
        assert out_a.getvalue() == out_b.getvalue()

    def test_stitch_worker_error_propagates(self, tiny_params, tiny_config,
                                            tmp_path, rng_np):
        """A failure inside the offloaded per-read finish task must
        surface to the caller (collector relays it), not hang or drop
        reads silently.  The patch target must be a real module-level
        function (pickled by reference into the worker process)."""
        from unittest import mock

        from nanodecoder_tpu.decode import engine as eng

        reads = {f"r{i}": rng_np.normal(0, 300, size=500) for i in range(2)}
        _write_multi_fast5(str(tmp_path / "err.fast5"), reads)
        caller = eng.StreamingBasecaller(tiny_params, tiny_config)
        with mock.patch.object(eng, "_finish_read_task", _boom_finish_task):
            with pytest.raises(RuntimeError, match="boom"):
                caller.run([str(tmp_path / "err.fast5")], io.StringIO())

    @pytest.mark.parametrize("wire", ["int8", "int6", "int4"])
    def test_quantized_h2d_mode_runs(self, tiny_params, tiny_config, tmp_path,
                                     rng_np, wire):
        import dataclasses as dc

        from nanodecoder_tpu.decode.engine import StreamingBasecaller

        cfg = dc.replace(tiny_config, decode=dc.replace(
            tiny_config.decode, h2d_dtype=wire))
        reads = {f"r{i}": rng_np.normal(0, 300, size=600) for i in range(2)}
        _write_multi_fast5(str(tmp_path / "i8.fast5"), reads)
        out = io.StringIO()
        meter = StreamingBasecaller(tiny_params, cfg).run(
            [str(tmp_path / "i8.fast5")], out)
        assert meter.n_reads == 2 and out.getvalue().count("@") >= 2

    def test_resume_skips(self, engine, tmp_path, rng_np):
        reads = {f"r{i}": rng_np.normal(0, 300, size=500) for i in range(3)}
        _write_multi_fast5(str(tmp_path / "b.fast5"), reads)
        out = io.StringIO()
        engine.run([str(tmp_path / "b.fast5")], out, skip_read_ids={"r0", "r2"})
        text = out.getvalue()
        assert "@r1\n" in text
        assert "@r0\n" not in text and "@r2\n" not in text

    def test_done_log_written(self, engine, tmp_path, rng_np):
        reads = {"rx": rng_np.normal(0, 300, size=400)}
        _write_multi_fast5(str(tmp_path / "c.fast5"), reads)
        out = io.StringIO()
        done = io.StringIO()
        engine.run([str(tmp_path / "c.fast5")], out, done_log=done)
        assert done.getvalue().strip() == "rx"

    def test_fasta_format(self, engine, tmp_path, rng_np):
        reads = {"rf": rng_np.normal(0, 300, size=400)}
        _write_multi_fast5(str(tmp_path / "d.fast5"), reads)
        out = io.StringIO()
        engine.run([str(tmp_path / "d.fast5")], out, write_format="fasta")
        assert out.getvalue().startswith(">rf\n")


class TestTranslator:
    def test_decode_chunk_batch_strips_padding(self, tiny_params, tiny_config, rng_np):
        from nanodecoder_tpu.decode.translator import Translator

        tr = Translator(tiny_params, tiny_config)
        # 6 chunks with batch_chunks=4 -> two device batches, second padded.
        n = 6
        clen = tiny_config.signal.chunk_len
        chunks = rng_np.normal(size=(n, clen)).astype(np.float32)
        lengths = np.full((n,), clen, np.int32)
        tok, tlen, lps, sc, pos = tr.decode_chunk_batch(chunks, lengths)
        assert tok.shape[0] == n and tlen.shape[0] == n
        assert lps.shape[0] == n and sc.shape[0] == n and pos.shape[0] == n

    def test_basecall_read_attn_stitch(self, tiny_params, tiny_config, rng_np):
        from nanodecoder_tpu.decode.translator import Translator
        from nanodecoder_tpu.io.fast5 import RawRead

        tr = Translator(tiny_params, tiny_config)
        sig = rng_np.normal(size=1200).astype(np.float32)
        bc = tr.basecall_read(RawRead("x", sig, "mem"), stitch_method="attn")
        assert bc.read_id == "x"
        assert bc.n_chunks >= 2

    def test_beam_per_token_quality_and_attn_stitch(self, tiny_params,
                                                    tiny_config, rng_np):
        """Beam mode emits exact per-token log-probs (varying Phred per
        base, not a constant per read) and real attention positions
        (so the attn stitcher works) — VERDICT r1 item 6."""
        import dataclasses as dc

        from nanodecoder_tpu.decode.translator import Translator
        from nanodecoder_tpu.io.fast5 import RawRead

        cfg = dc.replace(
            tiny_config,
            decode=dc.replace(tiny_config.decode, mode="beam", beam_size=3,
                              length_penalty="avg"),
        )
        tr = Translator(tiny_params, cfg)
        clen = cfg.signal.chunk_len
        chunks = rng_np.normal(size=(2, clen)).astype(np.float32)
        lengths = np.full((2,), clen, np.int32)
        tok, tlen, lps, sc, pos = tr.decode_chunk_batch(chunks, lengths)
        for i in range(2):
            n = int(tlen[i])
            if n >= 3:
                row = lps[i, :n]
                assert not np.allclose(row, row[0]), "per-token lps are constant"
                assert np.all(row <= 1e-6)
        # attn stitch runs on beam output (no silent trim fallback)
        sig = rng_np.normal(size=1200).astype(np.float32)
        bc = tr.basecall_read(RawRead("y", sig, "mem"), stitch_method="attn")
        assert bc.n_chunks >= 2 and isinstance(bc.sequence, str)


class TestPipelineStress:
    def test_many_files_tiny_queue_exactly_once(self, tmp_path, rng_np):
        """Stress the bounded queue: 24 files x 3 reads through a
        queue of depth 2 with 6 workers — every read delivered exactly
        once, in a deterministic (file-order) stream."""
        cfg = tiny_test_config()
        expect = []
        for fi in range(24):
            reads = {f"s{fi}_{ri}": rng_np.normal(size=(700,)) * 50
                     for ri in range(3)}
            _write_multi_fast5(str(tmp_path / f"f{fi}.fast5"), reads)
            expect.extend(sorted(reads))
        files = sorted(str(tmp_path / f"f{fi}.fast5") for fi in range(24))
        pipe = AsyncChunkPipeline(files, cfg.signal, batch_chunks=4,
                                  num_workers=6, queue_depth=2)
        got = [rc.read.read_id for rc in pipe.read_stream()]
        assert sorted(got) == sorted(expect)
        assert len(got) == len(set(got)) == 72

    def test_early_stop_under_pressure_shuts_down(self, tmp_path, rng_np):
        """Consumer abandons the stream mid-way with the producer
        blocked on a full queue — stop() must unblock it and the
        producer thread must exit."""
        cfg = tiny_test_config()
        for fi in range(10):
            reads = {f"t{fi}_{ri}": rng_np.normal(size=(900,)) * 50
                     for ri in range(4)}
            _write_multi_fast5(str(tmp_path / f"g{fi}.fast5"), reads)
        files = sorted(str(tmp_path / f"g{fi}.fast5") for fi in range(10))
        pipe = AsyncChunkPipeline(files, cfg.signal, batch_chunks=4,
                                  num_workers=4, queue_depth=1)
        stream = pipe.read_stream()
        for _ in range(3):
            next(stream)
        pipe.stop()
        pipe._producer_thread.join(timeout=10.0)
        assert not pipe._producer_thread.is_alive()


class TestStreamingEngineMesh:
    """The engine's multi-chip path (cli/basecall --mesh ->
    StreamingBasecaller(mesh_plan=...)) on the 8-device virtual mesh:
    sharded decode + host assembly must produce byte-identical FASTQ
    to the single-device engine (VERDICT r2 item 4a)."""

    @pytest.mark.parametrize("mode", ["greedy", "beam"])
    def test_mesh_engine_matches_single_device(self, tiny_params, tiny_config,
                                               tmp_path, rng_np, mode):
        import dataclasses as dc

        import jax

        from nanodecoder_tpu.config import MeshConfig
        from nanodecoder_tpu.decode.engine import StreamingBasecaller
        from nanodecoder_tpu.parallel.mesh import make_mesh_plan

        assert jax.device_count() >= 8
        cfg = dc.replace(
            tiny_config,
            decode=dc.replace(tiny_config.decode, batch_chunks=8, mode=mode,
                              beam_size=3),
        )
        reads = {f"m{i}": rng_np.normal(0, 300, size=rng_np.integers(300, 1100))
                 for i in range(6)}
        path = str(tmp_path / "m.fast5")
        _write_multi_fast5(path, reads)

        out_single = io.StringIO()
        StreamingBasecaller(tiny_params, cfg).run([path], out_single)
        plan = make_mesh_plan(MeshConfig(num_devices=8))
        out_mesh = io.StringIO()
        StreamingBasecaller(tiny_params, cfg, mesh_plan=plan).run([path], out_mesh)
        assert out_single.getvalue() == out_mesh.getvalue()
        assert out_mesh.getvalue().count("@") >= 6


class TestStreamingEngineSampleMode:
    def test_sample_mode_end_to_end(self, tiny_params, tiny_config, tmp_path, rng_np):
        import dataclasses as dc

        from nanodecoder_tpu.decode.engine import StreamingBasecaller

        config = dc.replace(tiny_config, decode=dc.replace(
            tiny_config.decode, mode="sample", temperature=1.0, sampling_seed=11))
        reads = {f"s{i}": rng_np.normal(0, 300, size=rng_np.integers(200, 900))
                 for i in range(3)}
        _write_multi_fast5(str(tmp_path / "s.fast5"), reads)
        eng = StreamingBasecaller(tiny_params, config)
        out = io.StringIO()
        meter = eng.run([str(tmp_path / "s.fast5")], out)
        assert meter.n_reads == 3
        # reproducible across a fresh engine with the same seed
        eng2 = StreamingBasecaller(tiny_params, config)
        out2 = io.StringIO()
        eng2.run([str(tmp_path / "s.fast5")], out2)
        assert out.getvalue() == out2.getvalue()
