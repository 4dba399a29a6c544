"""Benchmark harness — emits ONE JSON line with the headline metric.

Headline (BASELINE.md): basecalled raw-signal samples/s/chip, measured
on the flagship transformer model decoding synthetic nanopore reads
(batch=32, chunk=2048 — BASELINE.json config C2) with the full
on-device greedy decode loop.

`vs_baseline`: no published reference numbers exist (BASELINE.md —
empty mount, `"published": {}`), so the ratio is reported against the
reference-era expectation recorded in bench_results/baseline_ref.json
when present, else 1.0.

Usage: python bench.py [--cpu] [--seconds N] [--beam]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def _bench_engine(args, config, params) -> None:
    """Full streaming basecall throughput: synthetic fast5 (or pod5,
    --pod5 — the SURVEY §7 R5 columnar-ingest comparison) flowcell ->
    async ingest -> device decode -> stitch -> FASTQ (discarded)."""
    import io as _io
    import tempfile

    import h5py
    import numpy as np

    from nanodecoder_tpu.decode.engine import StreamingBasecaller
    from nanodecoder_tpu.train.data import SimSpec, simulate_read
    from nanodecoder_tpu.utils.statistics import ThroughputMeter

    spec = SimSpec()
    levels = spec.level_table()
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="bench_fast5_")
    n_files, reads_per_file = args.files, args.reads_per_file
    files = []
    for fi in range(n_files):
        reads = []
        for ri in range(reads_per_file):
            n_bases = int(rng.integers(2000, 6000))
            _seq, sig = simulate_read(rng, n_bases, spec, levels)
            reads.append((f"bench{fi}_{ri}", (sig * 1000).astype(np.int16)))
        if args.pod5:
            from nanodecoder_tpu.io.pod5 import Pod5Read, write_pod5

            path = os.path.join(tmp, f"r{fi}.pod5")
            write_pod5(path, [Pod5Read(read_id=rid, signal=s)
                              for rid, s in reads])
        else:
            path = os.path.join(tmp, f"r{fi}.fast5")
            with h5py.File(path, "w") as f:
                for rid, s in reads:
                    raw = f.create_group(f"read_{rid}/Raw")
                    raw.attrs["read_id"] = rid.encode()
                    raw.create_dataset("Signal", data=s)
        files.append(path)

    caller = StreamingBasecaller(params, config, depth=args.depth,
                                 attn_pos=False)  # bench stitch=trim
    # Warmup pass (compile) on one file.
    caller.run(files[:1], _io.StringIO(), num_workers=args.workers)
    meter = ThroughputMeter(n_reads=0)
    out = _io.StringIO()
    timer = None
    if args.stage_times:
        from nanodecoder_tpu.utils.profiling import StageTimer

        timer = StageTimer()
    meter2 = caller.run(files, out, meter=meter, stage_timer=timer,
                        num_workers=args.workers)
    rates = meter2.rates()
    print(f"# engine: {meter2.n_reads} reads, {meter2.n_chunks} chunks, "
          f"{rates['reads_per_sec']:.2f} reads/s", file=sys.stderr)
    if timer is not None:
        summary = timer.summary()
        print(f"# stage times: {summary}", file=sys.stderr)
        # Wall-time-ATTRIBUTED stage budget (VERDICT r3 weak #2): the
        # producer loop and the collector thread run concurrently, so
        # raw stage totals can exceed wall.  Each chain's stages sum to
        # that chain's busy time; the binding chain is the one whose
        # total approaches the wall.  backpressure-wait on the producer
        # = waiting for device+collector; d2h-wait on the collector =
        # relay transfer completion.
        wall = summary.get("wall", {}).get("total_sec", 0.0)

        def _chain(names):
            return {
                "stages": {n: round(summary[n]["total_sec"], 4)
                           for n in names if n in summary},
                "total_sec": round(sum(summary[n]["total_sec"]
                                       for n in names if n in summary), 4),
            }

        producer = _chain(["ingest-wait", "dispatch", "backpressure-wait"])
        collector = _chain(["d2h-wait", "stitch+write"])
        binding = ("producer" if producer["total_sec"] >= collector["total_sec"]
                   else "collector")
        art = {
            "config": {"batch_chunks": config.decode.effective_batch_chunks(engine=True),
                       "depth": args.depth, "workers": args.workers,
                       "format": "pod5" if args.pod5 else "fast5",
                       "compute_dtype": config.model.compute_dtype,
                       "files": n_files, "reads_per_file": reads_per_file},
            "reads": meter2.n_reads, "chunks": meter2.n_chunks,
            "rates": rates,
            "wall_sec": round(wall, 4),
            "producer_chain": producer,
            "collector_chain": collector,
            "binding_chain": binding,
            "stages_sec": summary,
            "note": "each chain's stages sum to that chain's busy time; "
                    "chains run concurrently (collector thread + "
                    "dispatch-ahead), so chain totals need not sum to wall",
        }
        os.makedirs("bench_results", exist_ok=True)
        with open("bench_results/engine_stages.json", "w") as f:
            json.dump(art, f, indent=2)
        print("# wrote bench_results/engine_stages.json", file=sys.stderr)
    print(json.dumps({
        "metric": "streaming_basecall_samples_per_sec_per_chip",
        "value": round(rates["ksamples_per_sec"], 2),
        "unit": "ksamples/s",
        "vs_baseline": 1.0,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    ap.add_argument("--seconds", type=float, default=10.0, help="min measure time")
    ap.add_argument("--beam", action="store_true", help="beam decode instead of greedy")
    ap.add_argument("--batches", type=int, default=8, help="timed batches minimum")
    ap.add_argument("--depth", type=int, default=8,
                    help="dispatch-ahead depth (1 = block every batch, "
                         "i.e. per-batch latency mode)")
    ap.add_argument("--batch", type=int, default=0,
                    help="chunks per device batch (default: the committed "
                         "config's per-mode operating points — round-5 h2 "
                         "flagship sweet spots 640 greedy (43.6k ks/s; "
                         "512/768/896/1024 = 42-44.2/42.8/40.9/36.0k), "
                         "256 beam (12.3k; 320/384 = 11.9/12.1k), 512 "
                         "engine (13.9k; 640 = 10.3-10.9k — the link-bound "
                         "pipeline wants finer overlap granularity); "
                         "BASELINE C2's nominal shape is 32)")
    ap.add_argument("--f32", action="store_true",
                    help="decode in float32 parity mode (default: bfloat16 "
                         "fast mode — measured identity delta < 1e-4, see "
                         "docs/PERF.md)")
    ap.add_argument("--staged", action="store_true",
                    help="staged decode-cache growth (quarter/half/full "
                         "tmax stages): per-step cache reads and the beam "
                         "reorder touch only the live prefix")
    ap.add_argument("--stages", default="",
                    help="explicit stage schedule, comma-separated multiples "
                         "of 8 ending at max_decode_len (e.g. 64,96); "
                         "implies --staged")
    ap.add_argument("--path-reorder", action="store_true",
                    help="beam: path-indirection cache reorder instead of "
                         "the default physical per-step permute (A/B lever; "
                         "measured 2.2x SLOWER on chip — docs/PERF.md r5)")
    ap.add_argument("--h2d", default="",
                    choices=["", "float32", "float16", "int8", "int6", "int4"],
                    help="override signal H2D wire dtype: float32 | float16 "
                         "| int8 (default: config / auto — f16 in bf16 mode)")
    ap.add_argument("--int8-cross", action="store_true",
                    help="int8 cross-K/V decode caches (halves the decode "
                         "loop's dominant HBM traffic; see docs/PERF.md "
                         "roofline + identity validation)")
    ap.add_argument("--ckpt", default="",
                    help="params .npz to bench (default: the committed "
                         "flagship; config.json is read from alongside)")
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction, default=True,
                    help="allow the Pallas decode-attention/beam kernels "
                         "(MHA configs only — GQA/MQA models always route "
                         "to the XLA grouped einsum, measured faster; see "
                         "models/decoder._attn_step)")
    ap.add_argument("--engine", action="store_true",
                    help="benchmark the full streaming path (ingest+decode+"
                         "stitch over generated fast5 files) instead of raw "
                         "device decode (BASELINE config C4)")
    ap.add_argument("--files", type=int, default=4,
                    help="engine mode: synthetic fast5 files to generate")
    ap.add_argument("--reads-per-file", type=int, default=8,
                    help="engine mode: reads per synthetic fast5 file")
    ap.add_argument("--pod5", action="store_true",
                    help="engine mode: generate pod5 instead of fast5 "
                         "(columnar-ingest comparison, SURVEY §7 R5)")
    ap.add_argument("--workers", type=int, default=8,
                    help="engine mode: fast5 reader threads (ingest-wait "
                         "was the top stage at 4 once decode hit 20k+)")
    ap.add_argument("--stage-times", action="store_true",
                    help="engine mode: print per-stage wall-time breakdown")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nanodecoder_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    import numpy as np

    from nanodecoder_tpu.config import Config, DecodeConfig
    from nanodecoder_tpu.decode.translator import Translator
    from nanodecoder_tpu.models.model import init_model, param_count
    from nanodecoder_tpu.train.data import SimSpec, simulate_read

    # Use the committed trained flagship when present: decode length
    # (EOS behavior) is model-dependent, and random weights terminate
    # unrealistically early — inflating samples/s.
    ckpt_npz = args.ckpt or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "bench_results", "flagship_params.npz")
    config = Config()  # flagship defaults: d_model=256, 6+3 layers, chunk=2048
    have_committed = False
    if os.path.exists(ckpt_npz):
        from nanodecoder_tpu.train.checkpoint import load_params_npz

        cfg_json = os.path.join(os.path.dirname(ckpt_npz), "config.json")
        if os.path.exists(cfg_json):
            with open(cfg_json) as f:
                loaded = Config.from_json(f.read())
            # Adopt the COMMITTED serving config wholesale (model,
            # signal AND decode): the decode section carries the
            # published operating points (batch_chunks per mode, wire
            # dtype) — reconstructing it from dataclass defaults made
            # "bench with no flags reproduces the published row" only
            # approximately true (round-5 fix).  Flags below override.
            config = dataclasses.replace(
                config, model=loaded.model, signal=loaded.signal,
                decode=loaded.decode)
            have_committed = True
        params = load_params_npz(ckpt_npz,
                                 init_model(jax.random.PRNGKey(0), config.model))
        print("# params: trained flagship checkpoint", file=sys.stderr)
    else:
        params = init_model(jax.random.PRNGKey(0), config.model)
        print("# params: RANDOM INIT (decode lengths unrealistic)", file=sys.stderr)
    if args.beam:
        config = dataclasses.replace(
            config, decode=dataclasses.replace(config.decode, mode="beam")
        )
    if args.pallas:  # after checkpoint-config load so it isn't overwritten
        config = dataclasses.replace(
            config,
            model=dataclasses.replace(config.model, use_pallas=True),
            decode=dataclasses.replace(config.decode, use_pallas=True),
        )
    if args.int8_cross:
        config = dataclasses.replace(
            config, model=dataclasses.replace(config.model, cross_cache_int8=True)
        )
    if not args.f32:
        # bf16 fast mode: halves KV-cache HBM traffic in the decode loop
        # (measured 2x decode throughput on v5e; mean read identity is
        # unchanged to 4 decimal places vs f32 — docs/PERF.md).
        config = dataclasses.replace(
            config,
            model=dataclasses.replace(config.model, compute_dtype="bfloat16"),
        )
    if args.h2d:
        config = dataclasses.replace(
            config, decode=dataclasses.replace(config.decode, h2d_dtype=args.h2d)
        )
    if args.staged or args.stages:
        schedule = (tuple(int(s) for s in args.stages.split(","))
                    if args.stages else ())
        config = dataclasses.replace(
            config, model=dataclasses.replace(config.model, staged_decode=True,
                                              stage_schedule=schedule)
        )
    if args.path_reorder:
        config = dataclasses.replace(
            config, decode=dataclasses.replace(config.decode,
                                               path_reorder=True)
        )
    # --batch overrides ALL per-mode batch fields (as cli/basecall.py
    # does); without it the committed config's operating points stand
    # (engine mode resolves its own batch_chunks_engine).  Without a
    # committed config, fall back to the round-4 sweet spots.
    batch = args.batch or (0 if have_committed else (256 if args.beam else 512))
    if batch:
        config = dataclasses.replace(
            config, decode=dataclasses.replace(
                config.decode, batch_chunks=batch, batch_chunks_beam=batch,
                batch_chunks_engine=batch)
        )
    n_params = param_count(params)

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}, "
          f"params: {n_params/1e6:.2f}M", file=sys.stderr)

    if args.engine:
        _bench_engine(args, config, params)
        return

    translator = Translator(params, config)

    # Synthetic chunk batch at the benchmark shape (C2: batch=32, chunk=2048).
    bsz = config.decode.batch_chunks
    clen = config.signal.chunk_len
    rng = np.random.default_rng(0)
    spec = SimSpec()
    levels = spec.level_table()
    chunks = np.zeros((bsz, clen), np.float32)
    for i in range(bsz):
        _seq, sig = simulate_read(rng, int(clen / spec.mean_dwell * 0.95), spec, levels)
        n = min(sig.shape[0], clen)
        chunks[i, :n] = sig[:n]
    lengths = np.full((bsz,), clen, np.int32)

    import jax.numpy as jnp

    from nanodecoder_tpu.io.signal import convert_h2d

    wire = convert_h2d(chunks, translator._h2d, config.signal.clip_sigma)
    jc, jl = jnp.asarray(wire), jnp.asarray(lengths)

    # Warmup (compile) — excluded from timing.
    t0 = time.perf_counter()
    out = translator._decode_jit(jc, jl)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    import numpy as _np

    lens_np = _np.asarray(out[1])
    mean_len = float(_np.mean(lens_np))
    max_len = int(_np.max(lens_np))
    print(f"# warmup/compile: {compile_s:.1f}s, decode len mean {mean_len:.0f} / "
          f"max {max_len} tokens (loop runs to the batch max — straggler cost)",
          file=sys.stderr)

    # Steady-state measurement with bounded dispatch-ahead (depth 2 —
    # the same in-flight pattern the streaming engine uses in
    # production): block on batch i-2 while dispatching batch i, so the
    # device never idles on host/relay dispatch latency but the queue
    # stays bounded.  --depth 1 restores strict per-batch blocking
    # (per-batch latency mode).
    from collections import deque

    inflight: deque = deque()
    n_batches = 0
    t0 = time.perf_counter()
    while True:
        out = translator._decode_jit(jc, jl)
        inflight.append(out)
        if len(inflight) >= args.depth:
            jax.block_until_ready(inflight.popleft())
        n_batches += 1
        elapsed = time.perf_counter() - t0
        if n_batches >= args.batches and elapsed >= args.seconds:
            break
    while inflight:
        jax.block_until_ready(inflight.popleft())
    elapsed = time.perf_counter() - t0

    samples = n_batches * bsz * clen
    samples_per_sec = samples / elapsed
    ksamples = samples_per_sec / 1e3

    vs_baseline = 1.0
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_results", "baseline_ref.json")
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
        if ref.get("ksamples_per_sec"):
            vs_baseline = ksamples / float(ref["ksamples_per_sec"])

    print(json.dumps({
        "metric": "basecalled_samples_per_sec_per_chip",
        "value": round(ksamples, 2),
        "unit": "ksamples/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
