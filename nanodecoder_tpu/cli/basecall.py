"""Basecall CLI entry point.

Reference analog: translate.py / the NanoDecoder basecall script
(SURVEY.md §2.1 L6, §3.2).

    python -m nanodecoder_tpu.cli.basecall \
        --input reads_dir/ --output out.fastq --ckpt ckpt_dir [--beam 5]

Multi-host: run one process per host with jax.distributed configured;
each host basecalls its static file shard and writes
out.fastq.shardNNNNN; host 0 merges (SURVEY.md §2.5).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="TPU-native nanopore basecaller")
    ap.add_argument("--input", required=True, help="fast5/pod5 file or directory")
    ap.add_argument("--output", required=True, help="output FASTQ/FASTA path")
    ap.add_argument("--ckpt", required=True, help="checkpoint directory (orbax) or .npz params")
    ap.add_argument("--format", choices=["fastq", "fasta"], default="fastq")
    ap.add_argument("--beam", type=int, default=0, help="beam size (0 = greedy)")
    ap.add_argument("--length-penalty", choices=["none", "wu", "avg"], default="avg",
                    help="beam score normalization (avg default: raw-sum "
                         "scoring prefers degenerate early-EOS hypotheses "
                         "under label smoothing — docs/PERF.md)")
    ap.add_argument("--alpha", type=float, default=0.6)
    ap.add_argument("--coverage-penalty", choices=["none", "wu", "summary"],
                    default="none", help="beam coverage penalty (reference "
                    "PenaltyBuilder)")
    ap.add_argument("--beta", type=float, default=0.0, help="coverage weight")
    ap.add_argument("--min-len", type=int, default=0,
                    help="mask EOS before this many tokens")
    ap.add_argument("--sample", action="store_true",
                    help="random-sampling decode (reference: translate "
                         "-random_sampling_topk/-random_sampling_temp)")
    ap.add_argument("--temperature", type=float, default=1.0,
                    help="sampling softmax temperature")
    ap.add_argument("--sampling-topk", type=int, default=0,
                    help="restrict sampling to the top-k tokens (0 = full vocab)")
    ap.add_argument("--sampling-topp", type=float, default=0.0,
                    help="nucleus sampling mass (0 = off)")
    ap.add_argument("--sampling-seed", type=int, default=0,
                    help="PRNG seed for --sample")
    ap.add_argument("--batch-chunks", type=int, default=0, help="override batch size")
    ap.add_argument("--stitch", choices=["trim", "align", "attn"], default="trim",
                    help="chunk merge rule: proportional trim, overlap "
                         "alignment, or attention-position (greedy only)")
    ap.add_argument("--workers", type=int, default=8,
                    help="ingest worker processes (subprocess pool; thread "
                         "mode measured zero worker scaling — io/pipeline)")
    ap.add_argument("--h2d", default="",
                    choices=["", "float32", "float16", "int8", "int6", "int4"],
                    help="signal H2D wire dtype: float32 | float16 | int8 "
                         "(default auto: f16 in bf16 mode; int8 halves the "
                         "dominant transfer — identity impact in "
                         "bench_results/identity_r04.jsonl)")
    ap.add_argument("--depth", type=int, default=4,
                    help="device batches in flight (dispatch-ahead depth; "
                         "higher overlaps more transfer with compute)")
    ap.add_argument("--resume", action="store_true",
                    help="append to an existing <output>: reads already "
                         "present (scanned from the output itself, plus "
                         "<output>.done) are skipped; a partial trailing "
                         "record from a crash is truncated first, so no "
                         "duplicates are possible")
    ap.add_argument("--cpu", action="store_true", help="run on CPU")
    ap.add_argument("--parity", action="store_true",
                    help="f32 parity mode (SURVEY.md R2) instead of bf16")
    ap.add_argument("--stage-times", action="store_true",
                    help="log per-stage wall time (ingest-wait/dispatch/"
                         "collect/stitch+write)")
    import argparse as _ap

    ap.add_argument("--pallas", action=_ap.BooleanOptionalAction, default=None,
                    help="fused Pallas decode kernels (default: on when "
                         "running on TPU, off elsewhere — interpret mode "
                         "on CPU is for tests, not speed)")
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nanodecoder_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    from nanodecoder_tpu.cli.common import load_params_and_config
    from nanodecoder_tpu.decode.engine import StreamingBasecaller
    from nanodecoder_tpu.io.fast5 import list_signal_files
    from nanodecoder_tpu.parallel.mesh import make_mesh_plan
    from nanodecoder_tpu.parallel.multihost import (
        host_shard_path,
        initialize_multihost,
        merge_host_shards,
        partition_files_for_host,
        barrier,
    )
    from nanodecoder_tpu.utils.logging import get_logger
    from nanodecoder_tpu.utils.report import ReportManager

    log = get_logger("basecall")
    pid, pcount = initialize_multihost()

    params, config = load_params_and_config(args.ckpt)
    overrides = {}
    if args.beam > 0 and args.sample:
        log.error("--beam and --sample are mutually exclusive")
        return 2
    if args.beam > 0:
        overrides.update(mode="beam", beam_size=args.beam,
                         length_penalty=args.length_penalty, alpha=args.alpha,
                         coverage_penalty=args.coverage_penalty, beta=args.beta)
    if args.sample:
        overrides.update(mode="sample", temperature=args.temperature,
                         sampling_topk=args.sampling_topk,
                         sampling_topp=args.sampling_topp,
                         sampling_seed=args.sampling_seed)
    if args.min_len > 0:
        overrides.update(min_len=args.min_len)
    if args.h2d:
        overrides.update(h2d_dtype=args.h2d)
    if args.batch_chunks > 0:
        overrides.update(batch_chunks=args.batch_chunks,
                         batch_chunks_beam=args.batch_chunks,
                         batch_chunks_engine=args.batch_chunks)
    if overrides:
        config = dataclasses.replace(
            config, decode=dataclasses.replace(config.decode, **overrides)
        )
    config = dataclasses.replace(
        config, model=dataclasses.replace(
            config.model,
            compute_dtype="float32" if args.parity else "bfloat16")
    )
    use_pallas = (jax.default_backend() == "tpu") if args.pallas is None else args.pallas
    config = dataclasses.replace(
        config,
        model=dataclasses.replace(config.model, use_pallas=use_pallas),
        decode=dataclasses.replace(config.decode, use_pallas=use_pallas),
    )

    files = list_signal_files(args.input)
    if not files:
        log.error("no fast5/pod5 files under %s", args.input)
        return 2
    files = partition_files_for_host(files)
    out_path = args.output if pcount == 1 else host_shard_path(args.output)

    skip: set[str] = set()
    done_path = out_path + ".done"
    out_mode = "w"
    if args.resume:
        import os

        from nanodecoder_tpu.io.fastx import recover_fastx_output

        # Ground truth = the output file itself: the engine flushes the
        # done-log once per BATCH, so after a crash up to one batch of
        # reads can be present in the output but absent from the done
        # log — re-basecalling those would append duplicate records.
        # recover_fastx_output scans the complete records (and truncates
        # a partial trailing one) and we append from there.
        if os.path.exists(done_path):
            skip = set(open(done_path).read().split())
        emitted = recover_fastx_output(out_path, args.format)
        skip |= emitted
        out_mode = "a"
        log.info("resume: skipping %d completed reads (%d from output scan)",
                 len(skip), len(emitted))

    plan = make_mesh_plan(config.mesh) if jax.device_count() > 1 else None
    caller = StreamingBasecaller(params, config, mesh_plan=plan,
                                 depth=args.depth,
                                 attn_pos=args.stitch == "attn")
    from nanodecoder_tpu.utils.profiling import StageTimer

    timer = StageTimer() if args.stage_times else None
    with open(out_path, out_mode) as out, open(done_path, "a") as done_log:
        meter = caller.run(
            files, out, stitch_method=args.stitch, skip_read_ids=skip,
            num_workers=args.workers, write_format=args.format,
            done_log=done_log, stage_timer=timer,
        )
    barrier("basecall-done")
    if pcount > 1:
        merge_host_shards(args.output)
    if timer is not None:
        for name, st in timer.summary().items():
            log.info("stage %-12s total %7.3fs  mean %6.2fms  x%d",
                     name, st["total_sec"], st["mean_sec"] * 1e3, st["count"])
    ReportManager().report_inference(meter.rates(), {"n_hosts": pcount})
    return 0


if __name__ == "__main__":
    sys.exit(main())
