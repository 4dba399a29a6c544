"""nanodecoder_tpu — a TPU-native nanopore basecalling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
achilles1989/NanoDecoder (an OpenNMT-py-derived seq2seq attention
basecaller; see SURVEY.md for the reference's layer map):

  raw fast5 signal -> normalize -> chunk -> encoder (conv + LSTM or
  transformer) -> attention decoder (greedy/beam, on-device, KV cache)
  -> stitch -> FASTA/FASTQ.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  io/        L1  signal ingest: fast5/pod5 readers, normalize, chunk,
                 stitch, fastx writers, async streaming pipeline (host)
  models/    L2  encoders/decoders/modules as functional JAX pytrees
  ops/       --  Pallas TPU kernels (incremental attention, fused beam step)
  decode/    L4  jitted greedy + beam drivers (lax.while_loop, KV cache)
  parallel/  --  mesh / pjit shardings / multi-host bootstrap
  train/     L3  loss, optax optimizers, trainer, checkpointing
  utils/     L5  statistics, reporting, profiling
  cli/       L6  basecall / train / preprocess entry points
"""

__version__ = "0.1.0"

from nanodecoder_tpu.vocab import Vocab, DNA_VOCAB, make_vocab, vocab_size_for  # noqa: F401
