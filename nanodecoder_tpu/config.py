"""Typed configuration for the whole framework.

The reference carries every knob in one giant argparse registry
(onmt/opts.py, ~1k LoC; SURVEY.md §2.1) and reconstructs model topology
from opts pickled inside checkpoints.  We replace that with small typed
dataclasses, serialized as JSON next to checkpoints (SURVEY.md §5.6).

All shape-bearing fields are static ints so that everything under jit
traces with static shapes (XLA requirement; SURVEY.md §7 R4).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any


def _asdict(obj) -> dict[str, Any]:
    return dataclasses.asdict(obj)


@dataclasses.dataclass(frozen=True)
class SignalConfig:
    """Raw-signal normalization + chunking (reference: fast5 ingest +
    chunk/normalize stage, SURVEY.md §2.1 'Signal ingest')."""

    chunk_len: int = 2048        # samples per chunk (BASELINE.json config C2)
    chunk_overlap: int = 256     # overlap between consecutive chunks
    min_chunk_fill: float = 0.25 # drop trailing chunk if < this fraction real samples
    normalization: str = "mad"   # "mad" (median/MAD z-score) | "meanstd" | "none"
    mad_scale: float = 1.4826    # MAD -> sigma consistency constant
    clip_sigma: float = 5.0      # clip normalized signal to +-clip_sigma (0 = off)

    @property
    def chunk_stride(self) -> int:
        return self.chunk_len - self.chunk_overlap


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Seq2seq model topology (reference: onmt/opts.py model_opts +
    model_builder.build_model, SURVEY.md §2.1)."""

    vocab_size: int = 8
    kmer_k: int = 1                     # target tokens = k-mers (SURVEY §2.2); vocab_size must equal vocab_size_for(kmer_k)
    d_model: int = 256
    # --- conv front-end over raw samples (reference: audio-encoder-style
    # conv stack, SURVEY.md §2.1 'Encoder front-end') ---
    conv_channels: tuple[int, ...] = (64, 128, 256)
    conv_kernels: tuple[int, ...] = (5, 5, 5)
    conv_strides: tuple[int, ...] = (2, 2, 2)   # product = time downsample factor
    # --- encoder ---
    encoder_type: str = "transformer"  # "transformer" | "lstm"
    enc_layers: int = 6
    enc_heads: int = 8
    enc_ffn_dim: int = 1024
    lstm_hidden: int = 256              # per-direction hidden for the biLSTM path
    # --- decoder ---
    decoder_type: str = "transformer"  # "transformer" | "rnn"
    dec_layers: int = 3
    dec_heads: int = 8
    # Decoder K/V head count (GQA/MQA, TPU-first design): the decode
    # loop is HBM-bound on K/V cache reads (docs/PERF.md roofline);
    # sharing K/V across query-head groups divides that traffic by
    # dec_heads/dec_kv_heads (8x for MQA) at equal query capacity.
    # 0 = dec_heads (standard MHA).  Applies to the transformer
    # decoder's self- AND cross-attention; the encoder keeps MHA (its
    # attention is a batch matmul, not cache-bound).
    dec_kv_heads: int = 0
    dec_ffn_dim: int = 1024
    rnn_attention: str = "general"      # Luong score for the RNN path: dot|general|mlp
    # --- common ---
    dropout: float = 0.1
    max_decode_len: int = 320           # static decode-loop bound (chunk_len/stride ~ bases+slack)
    # Staged cache growth: run the decode as consecutive while_loops
    # with the self-cache (and beam reorder) sized 1/4 -> 1/2 -> full
    # max_decode_len.  Every per-step cache read/permute touches only
    # the live prefix's bytes — the b256 beam reorder (the top loop
    # term, AT the HBM floor for a full-cache permute) and the masked
    # self-cache reads shrink ~2x at mean decode length ~0.6*tmax.
    # Token-exact: stage bounds are multiples of the DMA block and the
    # step semantics are unchanged (goldens must not move).
    staged_decode: bool = False
    # Explicit stage schedule for staged_decode (empty = the default
    # quarter/half/full split).  Must be ascending multiples of the DMA
    # block (8) ending at max_decode_len.  Tuned against the decode-
    # length histogram: the flagship's lengths are mean 57 / max 62 at
    # tmax 96, so e.g. (64, 96) keeps nearly every row inside one
    # 2/3-size stage instead of crossing two boundaries (the round-5
    # stage sweep in docs/PERF.md records the measured options).
    stage_schedule: tuple[int, ...] = ()
    param_dtype: str = "float32"        # master params
    compute_dtype: str = "bfloat16"     # activations on TPU ("float32" = parity mode, SURVEY §7 R2)
    use_pallas: bool = False            # Pallas decode-attention kernel (TPU hot path)
    # (A fused whole-decoder-layer Pallas kernel was built, measured 4x
    # SLOWER than the per-op mix on v5e — the step is MXU-pass-bound,
    # not op-chain-bound — and removed; the result is recorded in
    # docs/PERF.md "round-2 continued".)
    # Lean decode path: LN affines + biases folded into the adjacent
    # matmuls (one fused QKV matmul per layer, pre-cast weights, f32
    # generator with ln_out folded in) and an optimization barrier that
    # keeps the self caches in their storage dtype across while-loop
    # iterations.  Device-trace-driven (docs/PERF.md round-2): removes
    # the per-step param restage copies and XLA's f32 upcast of the
    # bf16 cache carry.  f32 mode is token-parity-tested vs the
    # unfolded path.
    lean_step: bool = True
    # int8 cross-K/V decode caches (per-lane symmetric scales folded
    # exactly into the query matrix / output — only the HBM *storage*
    # is quantized).  The decode loop is bandwidth-bound on cross-cache
    # reads (docs/PERF.md roofline); int8 halves that traffic.
    # Requires use_pallas; identity-validate before enabling by default.
    cross_cache_int8: bool = False

    @property
    def time_downsample(self) -> int:
        p = 1
        for s in self.conv_strides:
            p *= s
        return p

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.enc_heads == 0
        return self.d_model // self.enc_heads

    @property
    def dec_kv(self) -> int:
        """Resolved decoder K/V head count (0 -> dec_heads = MHA)."""
        kv = self.dec_kv_heads or self.dec_heads
        assert self.dec_heads % kv == 0, "dec_heads must be divisible by dec_kv_heads"
        return kv


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Decoding strategy (reference: onmt/translate/* + penalties,
    SURVEY.md §2.1, §3.5)."""

    mode: str = "greedy"          # "greedy" | "beam" | "sample"
    beam_size: int = 5
    # --- random-sampling mode (reference: random_sampling.py —
    # translate -random_sampling_topk/-random_sampling_temp) ---
    temperature: float = 1.0      # softmax temperature (sample mode)
    sampling_topk: int = 0        # restrict sampling to top-k tokens (0 = full vocab)
    sampling_topp: float = 0.0    # nucleus sampling mass (0 = off)
    sampling_seed: int = 0        # PRNG seed for sample mode
    # Default is per-token average normalization: with label smoothing
    # (train default 0.1, vocab 8) every token is floored at p ~ eps/7,
    # so an unnormalized score prefers EOS-at-step-1 (-4.3) over any
    # correct ~230-token hypothesis (sum ~ -11) and beam decode emits
    # 1-token junk. "none" reproduces the reference's raw-sum scoring.
    length_penalty: str = "avg"   # "none" | "wu" | "avg"
    alpha: float = 0.6            # wu penalty exponent
    min_len: int = 0              # mask EOS before this many tokens (reference: translate min_length)
    coverage_penalty: str = "none"  # "none" | "wu" | "summary" (reference: PenaltyBuilder)
    beta: float = 0.0             # coverage penalty weight
    n_best: int = 1
    max_len: int = 320            # must equal ModelConfig.max_decode_len
    batch_chunks: int = 32        # chunks per device batch (BASELINE C2)
    # Beam mode's measured device sweet spot differs from greedy's
    # (v5e, k=4 MQA flagship: greedy 512, beam 128 — past ~640 decode
    # rows the K-tiled caches spill; docs/PERF.md round 3).  0 = use
    # batch_chunks for beam too.  effective_batch_chunks() resolves
    # the operating point for the active mode — the serving config can
    # carry BOTH published operating points (VERDICT r3 weak #5).
    batch_chunks_beam: int = 0
    # The streaming engine's sweet spot is SMALLER than raw decode's:
    # its pipeline is link-bound (tunneled relay), and coarser batches
    # reduce transfer/compute overlap granularity — measured round 5
    # (engine ks/s at 512/576/640 = 13,185/13,755/10,946 in one window
    # while raw greedy preferred 640).  0 = use the mode default.
    batch_chunks_engine: int = 0
    use_pallas: bool = True       # pallas attention kernels on TPU hot path
    # Beam reorder strategy (lean transformer path only).  True = the
    # self cache is NEVER physically permuted: rows stay in write-time
    # frame and a composed ancestry map (B, K, T) int32 — updated per
    # step by a gather 32x smaller than the cache — indirects the
    # masked self-attention read (token-exact vs the physical permute;
    # tests/test_decode.py).  Chip A/B (round 5, b256 beam5): the
    # indirection measured 5,299 ks/s vs 11,574 for the physical
    # permute — 2.2x SLOWER.  The ancestry map itself is tiny, but the
    # self-attention read must gather T cache rows per (batch, beam)
    # every step; XLA materializes that gathered prefix as a fresh
    # (B*K, T, Dh) copy per step — the same bytes the permute moves,
    # now strided instead of contiguous, plus the compose ops.  The
    # round-4 roofline bounded the permute's bytes, not the count of
    # programs that touch them.  Physical reorder is the default;
    # the indirection stays as an A/B lever (docs/PERF.md round 5).
    path_reorder: bool = False
    # Signal host->device dtype.  The engine's H2D transfer is its
    # single largest link cost (2 MB f32 per 512-chunk batch; the
    # tunneled relay moves ~26 MB/s).  "auto" = float16 when compute is
    # bfloat16 (f16 z-scores are finer than the bf16 compute
    # quantization), float32 in parity mode.  "int8" quantizes the
    # +-clip_sigma z-scores to 127 steps (~0.04 sigma resolution) and
    # dequantizes on device — halves the transfer again; identity
    # impact measured in bench_results/identity_r04.jsonl.
    h2d_dtype: str = "auto"       # "auto" | "float32" | "float16" | "int8"

    def resolve_h2d(self, compute_dtype: str) -> str:
        """Concrete H2D dtype name for the active compute dtype.

        Raises on unsupported names: convert_h2d only special-cases the
        names below, so e.g. 'int16' would silently astype z-scores to
        integers in {-5..5} and basecall garbage with no error."""
        valid = ("auto", "float32", "float16", "int8", "int6", "int4")
        if self.h2d_dtype not in valid:
            raise ValueError(
                f"h2d_dtype={self.h2d_dtype!r} unsupported; choose one of "
                f"{valid}")
        if self.h2d_dtype != "auto":
            return self.h2d_dtype
        return "float16" if compute_dtype == "bfloat16" else "float32"

    def effective_batch_chunks(self, engine: bool = False) -> int:
        """Device batch for the active decode mode.  `engine=True`
        prefers batch_chunks_engine (the streaming engine's link-bound
        sweet spot) over the raw-decode operating point."""
        if engine and self.batch_chunks_engine > 0:
            return self.batch_chunks_engine
        if self.mode == "beam" and self.batch_chunks_beam > 0:
            return self.batch_chunks_beam
        return self.batch_chunks


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop knobs (reference: onmt/opts.py train_opts + trainer,
    SURVEY.md §2.1 'Trainer'/'Optimizer wrapper'/'Loss')."""

    batch_size: int = 32
    accum_steps: int = 1
    label_smoothing: float = 0.1
    optimizer: str = "adam"
    learning_rate: float = 2.0      # noam peak multiplier (OpenNMT-style)
    lr_schedule: str = "noam"       # "noam" | "constant" | "cosine"
    warmup_steps: int = 4000
    adam_b1: float = 0.9
    adam_b2: float = 0.998
    grad_clip: float = 5.0
    guided_attention_weight: float = 0.0  # diagonal guided-attn aux loss
    guided_attention_sigma: float = 0.2
    train_steps: int = 10000
    valid_every: int = 1000
    save_every: int = 1000
    seed: int = 0
    ckpt_dir: str = "checkpoints"
    keep_checkpoints: int = 5


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh for data-parallel decode/training (SURVEY.md §2.4:
    DP is the only strategy in the reference; we keep a `data` axis and
    leave room for a `model` axis without building TP)."""

    data_axis: str = "data"
    num_devices: int = 0  # 0 = all visible devices


@dataclasses.dataclass(frozen=True)
class Config:
    signal: SignalConfig = SignalConfig()
    model: ModelConfig = ModelConfig()
    decode: DecodeConfig = DecodeConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()

    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "Config":
        raw = json.loads(text)

        def build(cls, d):
            fields = {f.name: f for f in dataclasses.fields(cls)}
            kwargs = {}
            for k, v in d.items():
                if k not in fields:
                    continue
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return cls(**kwargs)

        model_raw = raw.get("model", {})
        model = build(ModelConfig, model_raw)
        if "vocab_size" not in model_raw and model.kmer_k != 1:
            # Ergonomics: a config that sets only kmer_k gets the
            # matching generator/embedding dimension automatically.
            from nanodecoder_tpu.vocab import vocab_size_for

            model = dataclasses.replace(model, vocab_size=vocab_size_for(model.kmer_k))
        return Config(
            signal=build(SignalConfig, raw.get("signal", {})),
            model=model,
            decode=build(DecodeConfig, raw.get("decode", {})),
            train=build(TrainConfig, raw.get("train", {})),
            mesh=build(MeshConfig, raw.get("mesh", {})),
        )


def tiny_test_config() -> Config:
    """Small topology for unit tests / CPU runs."""
    return Config(
        signal=SignalConfig(chunk_len=256, chunk_overlap=32),
        model=ModelConfig(
            d_model=32,
            conv_channels=(16, 32),
            conv_kernels=(5, 5),
            conv_strides=(2, 2),
            enc_layers=2,
            enc_heads=4,
            enc_ffn_dim=64,
            lstm_hidden=32,
            dec_layers=2,
            dec_heads=4,
            dec_ffn_dim=64,
            max_decode_len=48,
            compute_dtype="float32",
        ),
        decode=DecodeConfig(max_len=48, batch_chunks=4, use_pallas=False),
        train=TrainConfig(batch_size=4, warmup_steps=10, train_steps=20),
    )
