"""k-mer vocabulary tests (SURVEY.md §2.2: the reference's token unit is
an open question — single bases or k-mers — so both are supported and
both must round-trip exactly)."""

import numpy as np
import pytest

from nanodecoder_tpu.config import Config, tiny_test_config
from nanodecoder_tpu.vocab import (
    BOS_ID,
    EOS_ID,
    PAD_ID,
    UNK_ID,
    DNA_VOCAB,
    make_vocab,
    vocab_size_for,
)


def test_vocab_size_for():
    assert vocab_size_for(1) == 8
    assert vocab_size_for(2) == 4 + 4 + 16
    assert vocab_size_for(3) == 4 + 4 + 16 + 64
    with pytest.raises(ValueError):
        vocab_size_for(0)


def test_k1_layout_unchanged():
    v = make_vocab(1)
    assert v is DNA_VOCAB
    assert v.itos == ("<pad>", "<s>", "</s>", "<unk>", "A", "C", "G", "T")
    assert v.size == 8


@pytest.mark.parametrize("k", [1, 2, 3])
@pytest.mark.parametrize(
    "seq", ["", "A", "ACGT", "ACGTACG", "TTTTTTTTTTT", "GATTACA"]
)
def test_roundtrip(k, seq):
    v = make_vocab(k)
    ids = v.encode(seq)
    assert ids.dtype == np.int32
    assert v.decode(ids) == seq
    # Token count: ceil(len/k).
    assert ids.shape[0] == -(-len(seq) // k) if seq else ids.shape[0] == 0


def test_bos_eos_and_specials():
    v = make_vocab(3)
    ids = v.encode("ACGTA", add_bos=True, add_eos=True)
    assert ids[0] == BOS_ID and ids[-1] == EOS_ID
    assert v.decode(ids) == "ACGTA"
    # Decode stops at EOS, skips PAD/BOS/UNK.
    tail = np.concatenate([ids, v.encode("GGG")])
    assert v.decode(tail) == "ACGTA"


def test_unknown_chars_map_to_unk():
    v1, v3 = make_vocab(1), make_vocab(3)
    assert list(v1.encode("ANG")) == [4, UNK_ID, 6]
    # Any group containing a non-ACGT char -> one <unk> token.
    ids = v3.encode("ACGTNA")
    assert ids[0] == v3.stoi["ACG"] and ids[1] == UNK_ID
    assert v3.decode(ids) == "ACG"  # UNK contributes no bases


def test_decode_expand_alignment():
    v = make_vocab(3)
    ids = np.concatenate([v.encode("ACGTA"), [EOS_ID, PAD_ID]])
    pos = np.arange(len(ids), dtype=np.int32) * 10
    lps = -0.1 * np.arange(len(ids), dtype=np.float32)
    seq, pos_b, lps_b = v.decode_expand(ids, pos, lps)
    assert seq == "ACGTA"
    assert pos_b.tolist() == [0, 0, 0, 10, 10]  # ACG at pos 0, TA at pos 10
    np.testing.assert_allclose(lps_b, [0.0, 0.0, 0.0, -0.1, -0.1], rtol=1e-6)
    assert pos_b.dtype == pos.dtype and lps_b.dtype == lps.dtype


def _kmer_tiny_config(k: int) -> Config:
    import dataclasses

    cfg = tiny_test_config()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, kmer_k=k, vocab_size=vocab_size_for(k)),
    )


def test_config_json_autoderives_vocab_size():
    cfg = _kmer_tiny_config(3)
    loaded = Config.from_json(
        '{"model": {"kmer_k": 3, "d_model": 32}}'
    )
    assert loaded.model.vocab_size == vocab_size_for(3) == 88
    # Explicit vocab_size is respected (and round-trips).
    again = Config.from_json(cfg.to_json())
    assert again.model.vocab_size == 88 and again.model.kmer_k == 3


def test_init_model_validates_kmer_vocab_size():
    import dataclasses

    import jax

    from nanodecoder_tpu.models.model import init_model

    cfg = tiny_test_config()
    bad = dataclasses.replace(cfg.model, kmer_k=3)  # vocab_size still 8
    with pytest.raises(ValueError, match="vocab_size"):
        init_model(jax.random.PRNGKey(0), bad)


def test_make_example_kmer_targets():
    from nanodecoder_tpu.train.data import SimSpec, make_example

    cfg = _kmer_tiny_config(3)
    spec = SimSpec()
    levels = spec.level_table()
    rng = np.random.default_rng(0)
    v = make_vocab(3)
    for _ in range(8):
        ex = make_example(rng, cfg, spec, levels)
        ids = ex["tgt_out"]
        # All ids are in-range for the k-mer vocab; EOS present.
        assert ids.max() < v.size
        assert (ids == EOS_ID).sum() == 1
        # tgt_in is BOS + shift of tgt_out.
        assert ex["tgt_in"][0] == BOS_ID
        L = int((ids != PAD_ID).sum()) - 1  # tokens before EOS
        np.testing.assert_array_equal(ex["tgt_in"][1 : L + 1], ids[:L])


def test_end_to_end_kmer_decode_and_stitch():
    """A k=3 model basecalls a simulated read end-to-end (random params:
    the output is junk, but every shape/alignment contract must hold,
    including the attn stitcher's per-base positions)."""
    import jax

    from nanodecoder_tpu.decode.translator import Translator
    from nanodecoder_tpu.io.fast5 import RawRead
    from nanodecoder_tpu.models.model import init_model
    from nanodecoder_tpu.train.data import SimSpec, simulate_read

    cfg = _kmer_tiny_config(3)
    params = init_model(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(1)
    _seq, sig = simulate_read(rng, 120, SimSpec())
    read = RawRead(read_id="r0", signal=sig, source_file="<sim>")
    tr = Translator(params, cfg)
    for method in ("trim", "attn"):
        bc = tr.basecall_read(read, stitch_method=method)
        assert set(bc.sequence) <= set("ACGT")
        assert bc.n_chunks >= 1
