"""fast5 reader + FASTX writer tests using generated HDF5 fixtures
(SURVEY.md §4: the reference lacks a fast5 fixture; we build ours
in-test with h5py)."""

import io

import h5py
import numpy as np

from nanodecoder_tpu.io.fast5 import iter_fast5_reads, list_signal_files, read_fast5_file
from nanodecoder_tpu.io.fastx import merge_fastx_shards, write_fasta, write_fastq


def _make_single_read_fast5(path, read_id="read0", n=1000, seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 2000, size=n).astype(np.int16)
    with h5py.File(path, "w") as f:
        g = f.create_group(f"Raw/Reads/Read_{seed}")
        g.attrs["read_id"] = read_id.encode()
        g.create_dataset("Signal", data=raw)
        ch = f.create_group("UniqueGlobalKey/channel_id")
        ch.attrs["offset"] = 10.0
        ch.attrs["range"] = 1400.0
        ch.attrs["digitisation"] = 8192.0
    return raw


def _make_multi_read_fast5(path, read_ids, n=500):
    rng = np.random.default_rng(42)
    raws = {}
    with h5py.File(path, "w") as f:
        for rid in read_ids:
            g = f.create_group(f"read_{rid}")
            raw_grp = g.create_group("Raw")
            raw = rng.integers(0, 2000, size=n).astype(np.int16)
            raw_grp.attrs["read_id"] = rid.encode()
            raw_grp.create_dataset("Signal", data=raw)
            ch = g.create_group("channel_id")
            ch.attrs["offset"] = 5.0
            ch.attrs["range"] = 1000.0
            ch.attrs["digitisation"] = 4096.0
            raws[rid] = raw
    return raws


def test_single_read_fast5(tmp_path):
    p = str(tmp_path / "one.fast5")
    raw = _make_single_read_fast5(p, "abc123", n=1234)
    reads = read_fast5_file(p)
    assert len(reads) == 1
    r = reads[0]
    assert r.read_id == "abc123"
    assert r.n_samples == 1234
    # calibration: (raw + 10) * 1400/8192
    np.testing.assert_allclose(
        r.signal, (raw.astype(np.float32) + 10.0) * (1400.0 / 8192.0), rtol=1e-6
    )


def test_multi_read_fast5(tmp_path):
    p = str(tmp_path / "multi.fast5")
    raws = _make_multi_read_fast5(p, ["r1", "r2", "r3"])
    reads = read_fast5_file(p)
    assert sorted(r.read_id for r in reads) == ["r1", "r2", "r3"]
    for r in reads:
        np.testing.assert_allclose(
            r.signal, (raws[r.read_id].astype(np.float32) + 5.0) * (1000.0 / 4096.0),
            rtol=1e-6,
        )


def test_iter_directory(tmp_path):
    _make_single_read_fast5(str(tmp_path / "a.fast5"), "a", seed=1)
    _make_multi_read_fast5(str(tmp_path / "sub" / "b.fast5").replace("sub/", "") , ["b1"])
    (tmp_path / "noise.txt").write_text("ignore me")
    files = list_signal_files(str(tmp_path))
    assert all(f.endswith(".fast5") for f in files)
    ids = sorted(r.read_id for r in iter_fast5_reads(str(tmp_path)))
    assert "a" in ids and "b1" in ids


def test_write_fasta_wrap():
    buf = io.StringIO()
    write_fasta([("r1", "ACGT" * 30)], buf, width=50)
    lines = buf.getvalue().splitlines()
    assert lines[0] == ">r1"
    assert all(len(l) <= 50 for l in lines[1:])
    assert "".join(lines[1:]) == "ACGT" * 30


def test_write_fastq_quality():
    buf = io.StringIO()
    write_fastq([("r1", "ACGT", 20.0), ("r2", "GG", [10.0, 30.0])], buf)
    lines = buf.getvalue().splitlines()
    assert lines[0] == "@r1" and lines[2] == "+"
    assert lines[3] == chr(33 + 20) * 4
    assert lines[7] == chr(33 + 10) + chr(33 + 30)


def test_merge_shards(tmp_path):
    p1, p2 = str(tmp_path / "out.fq.shard00000"), str(tmp_path / "out.fq.shard00001")
    open(p1, "w").write("@a\nAC\n+\n!!\n")
    open(p2, "w").write("@b\nGT\n+\n!!\n")
    out = str(tmp_path / "out.fq")
    merge_fastx_shards([p2, p1], out, delete_shards=True)
    text = open(out).read()
    assert text.index("@a") < text.index("@b")  # sorted shard order
    import os
    assert not os.path.exists(p1) and not os.path.exists(p2)


class TestRecoverFastxOutput:
    """Resume-append recovery (ADVICE r3 duplicate window)."""

    def test_scans_complete_records_fastq(self, tmp_path):
        from nanodecoder_tpu.io.fastx import recover_fastx_output, write_fastq

        p = tmp_path / "out.fastq"
        with open(p, "w") as f:
            write_fastq([("r1", "ACGT", 20.0), ("r2 extra meta", "GG", 30.0)], f)
        ids = recover_fastx_output(str(p))
        assert ids == {"r1", "r2"}
        # file untouched (no partial tail)
        assert open(p).read().count("@") >= 2

    def test_truncates_partial_tail(self, tmp_path):
        from nanodecoder_tpu.io.fastx import recover_fastx_output, write_fastq

        p = tmp_path / "out.fastq"
        with open(p, "w") as f:
            write_fastq([("r1", "ACGT", 20.0)], f)
            f.write("@r2\nACG")  # crash mid-record, no trailing newline
        ids = recover_fastx_output(str(p))
        assert ids == {"r1"}
        content = open(p).read()
        assert "r2" not in content
        assert content.endswith("\n")
        # appending a new record keeps the file well-formed
        from nanodecoder_tpu.io.fastx import write_fastq as wq

        with open(p, "a") as f:
            wq([("r3", "TT", 10.0)], f)
        lines = open(p).read().splitlines()
        assert len(lines) % 4 == 0 and lines[4] == "@r3"

    def test_fasta_variant_and_missing_file(self, tmp_path):
        from nanodecoder_tpu.io.fastx import recover_fastx_output, write_fasta

        p = tmp_path / "out.fasta"
        assert recover_fastx_output(str(p), "fasta") == set()
        with open(p, "w") as f:
            write_fasta([("a", "ACGT"), ("b", "G")], f)
            f.write(">c\n")  # header written, sequence line lost... 
        # ">c" has a newline but its sequence line is missing entirely
        ids = recover_fastx_output(str(p), "fasta")
        assert ids == {"a", "b"}
        assert ">c" not in open(p).read()
