"""Host-side signal IO: ingest, normalization, chunking, stitching, FASTX.

Reference analog: the nanopore dataset module under onmt/inputters/
plus the NanoDecoder-specific basecall/stitch scripts (SURVEY.md §2.1).
Everything here is numpy on the host; device work starts in decode/.
"""

from nanodecoder_tpu.io.signal import normalize_signal, chunk_signal, ChunkBatch  # noqa: F401
from nanodecoder_tpu.io.stitch import stitch_chunks  # noqa: F401
from nanodecoder_tpu.io.fast5 import iter_fast5_reads, read_fast5_file, RawRead  # noqa: F401
from nanodecoder_tpu.io.fastx import write_fasta, write_fastq, merge_fastx_shards  # noqa: F401
