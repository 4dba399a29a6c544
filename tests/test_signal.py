"""Unit tests for the io layer: normalize, chunk, stitch round-trips
(SURVEY.md §4 consequence 1: property — stitch(chunk(x)) round-trips)."""

import numpy as np
import pytest

from nanodecoder_tpu.io.signal import chunk_signal, normalize_signal
from nanodecoder_tpu.io.stitch import stitch_chunks


class TestNormalize:
    def test_mad_centering(self, rng_np):
        x = rng_np.normal(500.0, 30.0, size=10000).astype(np.float32)
        y = normalize_signal(x, "mad")
        assert abs(float(np.median(y))) < 1e-3
        # MAD-scaled sigma should be ~1 for gaussian data
        assert 0.8 < float(np.std(y)) < 1.2

    def test_mad_robust_to_spikes(self, rng_np):
        x = rng_np.normal(0.0, 1.0, size=10000).astype(np.float32)
        x[::100] = 1e5  # current spikes
        y = normalize_signal(x, "mad", clip_sigma=5.0)
        assert np.abs(y).max() <= 5.0
        assert abs(float(np.median(y))) < 0.05

    def test_meanstd(self, rng_np):
        x = rng_np.normal(3.0, 2.0, size=5000).astype(np.float32)
        y = normalize_signal(x, "meanstd", clip_sigma=0)
        assert abs(float(y.mean())) < 1e-4
        assert abs(float(y.std()) - 1.0) < 1e-3

    def test_none_passthrough(self):
        x = np.arange(10, dtype=np.int16)
        y = normalize_signal(x, "none")
        assert y.dtype == np.float32
        np.testing.assert_allclose(y, x)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            normalize_signal(np.zeros(4), "bogus")


class TestChunk:
    def test_exact_cover(self):
        x = np.arange(1000, dtype=np.float32)
        cb = chunk_signal(x, chunk_len=256, chunk_overlap=56)  # stride 200
        # Every sample must be covered by at least one chunk.
        covered = np.zeros(1000, bool)
        for s, l in zip(cb.starts, cb.lengths):
            covered[s : s + l] = True
        assert covered.all()
        # Chunk contents match the source signal.
        for i, (s, l) in enumerate(zip(cb.starts, cb.lengths)):
            np.testing.assert_array_equal(cb.chunks[i, :l], x[s : s + l])
            assert (cb.chunks[i, l:] == 0).all()

    def test_static_shape(self):
        for n in (100, 2048, 5000):
            cb = chunk_signal(np.ones(n, np.float32), 2048, 256)
            assert cb.chunks.shape[1] == 2048

    def test_short_read_single_chunk(self):
        cb = chunk_signal(np.ones(100, np.float32), 2048, 256)
        assert cb.n_chunks == 1
        assert cb.lengths[0] == 100

    def test_overlap_consistency(self):
        cb = chunk_signal(np.ones(10000, np.float32), 2048, 256)
        strides = np.diff(cb.starts)
        assert (strides == 2048 - 256).all()

    def test_overlap_ge_len_raises(self):
        with pytest.raises(ValueError):
            chunk_signal(np.ones(100, np.float32), 128, 128)


class TestStitch:
    def _fake_calls(self, seq: str, chunk_len: int, overlap: int, bases_per_sample: float):
        """Cut a known sequence into overlapping per-chunk basecalls the
        way a perfect basecaller would, given uniform base density."""
        n_samples = int(len(seq) / bases_per_sample)
        sig = np.zeros(n_samples, np.float32)
        cb = chunk_signal(sig, chunk_len, overlap)
        seqs = []
        for s, l in zip(cb.starts, cb.lengths):
            lo = int(round(s * bases_per_sample))
            hi = int(round((s + l) * bases_per_sample))
            seqs.append(seq[lo:hi])
        return seqs, cb

    @pytest.mark.parametrize("method", ["trim", "align"])
    def test_roundtrip_uniform(self, method, rng_np):
        seq = "".join(rng_np.choice(list("ACGT"), size=2000))
        seqs, cb = self._fake_calls(seq, chunk_len=512, overlap=128, bases_per_sample=0.25)
        out = stitch_chunks(seqs, cb.starts, cb.lengths, 512, 128, method=method)
        # Uniform density + perfect chunk calls => near-exact roundtrip.
        assert abs(len(out) - len(seq)) <= 4
        # Alignment-free check: large shared content
        matches = sum(a == b for a, b in zip(out, seq))
        assert matches / max(len(seq), 1) > 0.95

    def test_single_chunk_identity(self):
        out = stitch_chunks(["ACGT"], np.array([0]), np.array([100]), 100, 10)
        assert out == "ACGT"

    def test_empty(self):
        assert stitch_chunks([], np.array([]), np.array([]), 100, 10) == ""

    def test_trim_exact_concat_no_overlap(self):
        # Zero overlap => midpoint trim degenerates to concatenation.
        seqs = ["AAAA", "CCCC", "GGGG"]
        starts = np.array([0, 100, 200])
        lengths = np.array([100, 100, 100])
        out = stitch_chunks(seqs, starts, lengths, 100, 0, method="trim")
        assert out == "AAAACCCCGGGG"

    @pytest.mark.parametrize("method", ["trim", "align"])
    def test_quals_ride_base_selection(self, method, rng_np):
        """With quals=, stitch returns (seq, qual) where qual[j] is the
        quality of the chunk base that produced seq[j] — verified by
        encoding each base's identity into its quality value."""
        seq = "".join(rng_np.choice(list("ACGT"), size=1200))
        seqs, cb = self._fake_calls(seq, chunk_len=512, overlap=128,
                                    bases_per_sample=0.25)
        code = {"A": 10.0, "C": 20.0, "G": 30.0, "T": 40.0}
        quals = [np.array([code[c] for c in s], np.float32) for s in seqs]
        out, qual = stitch_chunks(seqs, cb.starts, cb.lengths, 512, 128,
                                  method=method, quals=quals)
        assert len(out) == qual.shape[0]
        assert all(code[c] == q for c, q in zip(out, qual))
        # No-quals call is unchanged (plain string, same content).
        out2 = stitch_chunks(seqs, cb.starts, cb.lengths, 512, 128, method=method)
        assert out2 == out

    def test_attn_quals_ride_base_selection(self):
        from nanodecoder_tpu.io.stitch import stitch_chunks_attn

        starts = np.array([0, 400])
        lengths = np.array([500, 500])
        seqs = ["ACGTACGTA", "GTACGTACG"]
        pos0 = np.arange(50, 500, 50)
        pos1 = np.arange(10, 500, 50)
        code = {"A": 10.0, "C": 20.0, "G": 30.0, "T": 40.0}
        quals = [np.array([code[c] for c in s], np.float32) for s in seqs]
        out, qual = stitch_chunks_attn(seqs, [pos0, pos1], starts, lengths,
                                       quals=quals)
        assert len(out) == qual.shape[0]
        assert all(code[c] == q for c, q in zip(out, qual))


class TestAttnStitch:
    def test_positions_partition_exactly(self):
        from nanodecoder_tpu.io.stitch import stitch_chunks_attn

        # Two chunks overlapping by 100 samples; tokens carry exact
        # positions — each base must be kept exactly once.
        starts = np.array([0, 400])
        lengths = np.array([500, 500])
        # chunk 0: bases at samples 50..450 step 50  -> ACGTACGTA
        seqs = ["ACGTACGTA", "GTACGTACG"]
        pos0 = np.arange(50, 500, 50)
        # chunk 1 positions are chunk-relative: bases at abs 410..810
        pos1 = np.arange(10, 500, 50)
        out = stitch_chunks_attn(seqs, [pos0, pos1], starts, lengths)
        # ownership midpoint = (400 + 0 + 500)/2 = 450 absolute
        keep0 = "".join(c for c, p in zip(seqs[0], pos0) if p < 450)
        keep1 = "".join(c for c, p in zip(seqs[1], pos1 + 400) if p >= 450)
        assert out == keep0 + keep1

    def test_single_chunk(self):
        from nanodecoder_tpu.io.stitch import stitch_chunks_attn

        assert stitch_chunks_attn(["ACG"], [np.array([1, 2, 3])],
                                  np.array([0]), np.array([100])) == "ACG"


class TestH2DInt8:
    def test_quantize_roundtrip_error_bound(self, rng_np):
        from nanodecoder_tpu.io.signal import h2d_int8_scale, quantize_h2d_int8

        x = np.clip(rng_np.normal(size=(4096,)).astype(np.float32) * 2, -5, 5)
        q = quantize_h2d_int8(x, 5.0)
        back = q.astype(np.float32) * h2d_int8_scale(5.0)
        # max error = half a quantization step
        assert np.max(np.abs(back - x)) <= 5.0 / 127.0 / 2 + 1e-6
        assert q.dtype == np.int8

    def test_convert_h2d_dispatch(self, rng_np):
        from nanodecoder_tpu.io.signal import convert_h2d

        x = rng_np.normal(size=(8, 16)).astype(np.float32)
        assert convert_h2d(x, np.dtype(np.float16), 5.0).dtype == np.float16
        assert convert_h2d(x, np.dtype(np.int8), 5.0).dtype == np.int8
        np.testing.assert_array_equal(convert_h2d(x, np.dtype(np.float32), 5.0), x)

    def test_translator_int8_mode_decodes(self, rng_np, tiny_trained_setup=None):
        """int8 wire mode runs end-to-end and produces tokens close to
        the f32 path (same model, tiny config)."""
        import dataclasses as dc

        import jax

        from nanodecoder_tpu.config import tiny_test_config
        from nanodecoder_tpu.decode.translator import Translator
        from nanodecoder_tpu.models.model import init_model

        cfg = tiny_test_config()
        params = init_model(jax.random.PRNGKey(0), cfg.model)
        chunks = np.clip(rng_np.normal(size=(4, cfg.signal.chunk_len)), -5, 5
                         ).astype(np.float32)
        lens = np.full((4,), cfg.signal.chunk_len, np.int32)
        t32 = Translator(params, cfg)
        cfg8 = dc.replace(cfg, decode=dc.replace(cfg.decode, h2d_dtype="int8"))
        t8 = Translator(params, cfg8)
        out32 = t32.decode_chunk_batch(chunks, lens)
        out8 = t8.decode_chunk_batch(chunks, lens)
        # ~0.02 sigma input noise: decode lengths stay close; token
        # streams may differ on near-ties, so just require the program
        # to run and produce same-shape outputs with plausible lengths.
        assert out8[0].shape == out32[0].shape
        assert np.all(out8[1] >= 0)


class TestH2DInt4:
    def test_pack_unpack_roundtrip(self, rng_np):
        """numpy pack -> device (jnp) unpack recovers the signal within
        half a quantization step of the per-chunk scale."""
        import jax

        jax.config.update("jax_platforms", "cpu")
        from nanodecoder_tpu.io.signal import quantize_h2d_int4, wire_to_f32

        x = np.clip(rng_np.normal(size=(6, 64)).astype(np.float32) * 2, -5, 5)
        wire = quantize_h2d_int4(x)
        assert wire.dtype == np.uint8 and wire.shape == (6, 64 // 2 + 4)
        back = np.asarray(wire_to_f32(wire, "int4", 5.0, 64))
        scales = np.abs(x).max(axis=1)
        step = scales / 7.0
        assert np.all(np.abs(back - x) <= step[:, None] / 2 + 1e-6)

    def test_zero_rows_decode_to_zero(self):
        from nanodecoder_tpu.io.signal import wire_to_f32

        wire = np.zeros((2, 36), np.uint8)  # padded batch rows
        back = np.asarray(wire_to_f32(wire, "int4", 5.0, 64))
        np.testing.assert_array_equal(back, np.zeros((2, 64), np.float32))

    def test_wire_shape_helpers(self):
        from nanodecoder_tpu.io.signal import wire_columns, wire_np_dtype

        assert wire_columns(2048, "int4") == 1028
        assert wire_columns(2048, "int8") == 2048
        assert wire_np_dtype("int4") == np.uint8
        assert wire_np_dtype("float16") == np.float16


class TestH2DInt6:
    def test_pack_unpack_roundtrip(self, rng_np):
        import jax

        jax.config.update("jax_platforms", "cpu")
        from nanodecoder_tpu.io.signal import quantize_h2d_int6, wire_to_f32

        x = np.clip(rng_np.normal(size=(5, 64)).astype(np.float32) * 2, -5, 5)
        wire = quantize_h2d_int6(x)
        assert wire.dtype == np.uint8 and wire.shape == (5, 48 + 4)
        back = np.asarray(wire_to_f32(wire, "int6", 5.0, 64))
        step = np.abs(x).max(axis=1) / 31.0
        assert np.all(np.abs(back - x) <= step[:, None] / 2 + 1e-6)

    def test_wire_helpers(self):
        from nanodecoder_tpu.io.signal import wire_columns, wire_np_dtype

        assert wire_columns(2048, "int6") == 1540
        assert wire_np_dtype("int6") == np.uint8
