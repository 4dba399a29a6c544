"""Accuracy evaluation: read identity of basecalls vs ground truth.

Two modes:
  1. File mode — compare a called FASTA/FASTQ against a truth TSV
     (read_id<TAB>sequence):
       python -m nanodecoder_tpu.cli.evaluate --called out.fastq --truth truth.tsv
  2. Closed-loop simulator mode — simulate reads, basecall them with a
     checkpoint, report identity (the self-referential accuracy gate,
     SURVEY.md §7 R1):
       python -m nanodecoder_tpu.cli.evaluate --ckpt ckpts --simulate 20 [--beam 5]

Identity = 1 - edit_distance(called, truth)/len(truth) via the native
banded Levenshtein (nanodecoder_tpu/native).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


def _read_fastx(path: str) -> dict[str, str]:
    out: dict[str, str] = {}
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith("@"):  # fastq record
            out[line[1:].split()[0]] = lines[i + 1]
            i += 4
        elif line.startswith(">"):
            rid = line[1:].split()[0]
            seq = []
            i += 1
            while i < len(lines) and not lines[i].startswith((">", "@")):
                seq.append(lines[i])
                i += 1
            out[rid] = "".join(seq)
        else:
            i += 1
    return out


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Basecall accuracy evaluation")
    ap.add_argument("--called", default="", help="called FASTA/FASTQ")
    ap.add_argument("--truth", default="", help="truth TSV: read_id<TAB>sequence")
    ap.add_argument("--ckpt", default="", help="checkpoint for simulator mode")
    ap.add_argument("--simulate", type=int, default=0, help="simulate N reads")
    ap.add_argument("--read-bases", type=int, default=3000)
    ap.add_argument("--beam", type=int, default=0)
    ap.add_argument("--stitch", choices=["trim", "align", "attn"], default="attn")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="",
                    help="override model compute dtype (e.g. bfloat16) — "
                         "quantifies the fast-mode accuracy delta (SURVEY §7 R2)")
    ap.add_argument("--batch", type=int, default=0,
                    help="override decode batch_chunks")
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction, default=None,
                    help="fused Pallas decode kernels (default: on when "
                         "running on TPU)")
    ap.add_argument("--staged", action="store_true",
                    help="staged decode-cache growth (token-exact vs the "
                         "single-stage loop; flag exists for on-hardware "
                         "verification of that claim)")
    ap.add_argument("--h2d", default="",
                    choices=["", "float32", "float16", "int8", "int6", "int4"],
                    help="signal H2D wire dtype override: float32 | float16 "
                         "| int8 (measures the engine's wire numerics)")
    ap.add_argument("--int8-cross", action="store_true",
                    help="int8 cross-K/V decode caches (perf mode; this "
                         "flag exists to quantify its identity delta)")
    ap.add_argument("--json", action="store_true", help="emit one JSON line")
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

    from nanodecoder_tpu.native import read_identity
    from nanodecoder_tpu.utils.logging import get_logger

    log = get_logger("evaluate")

    pairs: list[tuple[str, str, str]] = []  # (read_id, called, truth)
    if args.simulate:
        from nanodecoder_tpu.cli.common import load_params_and_config
        from nanodecoder_tpu.decode.translator import Translator
        from nanodecoder_tpu.io.fast5 import RawRead
        from nanodecoder_tpu.train.data import SimSpec, simulate_read

        params, config = load_params_and_config(args.ckpt)
        # Default to the serving fast path (bf16), like cli/basecall —
        # --dtype float32 restores the parity mode.  (The checkpoint's
        # config carries the *training* compute dtype.)
        config = dataclasses.replace(
            config, model=dataclasses.replace(
                config.model, compute_dtype=args.dtype or "bfloat16")
        )
        if args.batch:
            config = dataclasses.replace(
                config, decode=dataclasses.replace(config.decode,
                                                   batch_chunks=args.batch)
            )
        use_pallas = (jax.default_backend() == "tpu") if args.pallas is None else args.pallas
        config = dataclasses.replace(
            config,
            model=dataclasses.replace(config.model, use_pallas=use_pallas),
            decode=dataclasses.replace(config.decode, use_pallas=use_pallas),
        )
        if args.beam > 0:
            config = dataclasses.replace(
                config, decode=dataclasses.replace(config.decode, mode="beam",
                                                   beam_size=args.beam)
            )
        if args.int8_cross:
            config = dataclasses.replace(
                config, model=dataclasses.replace(config.model,
                                                  cross_cache_int8=True)
            )
        if args.h2d:
            config = dataclasses.replace(
                config, decode=dataclasses.replace(config.decode,
                                                   h2d_dtype=args.h2d)
            )
        if args.staged:
            config = dataclasses.replace(
                config, model=dataclasses.replace(config.model,
                                                  staged_decode=True)
            )
        tr = Translator(params, config)
        spec = SimSpec()
        levels = spec.level_table()
        rng = np.random.default_rng(args.seed)
        for i in range(args.simulate):
            truth, sig = simulate_read(rng, args.read_bases, spec, levels)
            bc = tr.basecall_read(RawRead(f"sim{i}", sig, "sim"),
                                  stitch_method=args.stitch)
            pairs.append((f"sim{i}", bc.sequence, truth))
    else:
        if not (args.called and args.truth):
            log.error("need --called+--truth or --ckpt+--simulate")
            return 2
        called = _read_fastx(args.called)
        truth = {}
        with open(args.truth) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) == 2:
                    truth[parts[0]] = parts[1]
        for rid, t in truth.items():
            pairs.append((rid, called.get(rid, ""), t))

    idents, len_ratios = [], []
    for rid, called_seq, truth_seq in pairs:
        ident = read_identity(called_seq, truth_seq)
        idents.append(ident)
        len_ratios.append(len(called_seq) / max(len(truth_seq), 1))
        log.info("%s: identity %.4f (called %d / true %d bases)",
                 rid, ident, len(called_seq), len(truth_seq))
    summary = {
        "n_reads": len(pairs),
        "mean_identity": float(np.mean(idents)) if idents else 0.0,
        "median_identity": float(np.median(idents)) if idents else 0.0,
        "min_identity": float(np.min(idents)) if idents else 0.0,
        "mean_length_ratio": float(np.mean(len_ratios)) if len_ratios else 0.0,
    }
    if len(idents) >= 10:
        # Bootstrap 95% CI on the mean — identity claims at n=12 were
        # inside plausible noise (VERDICT r2); the CI makes every mode
        # comparison carry its own resolution.
        boot_rng = np.random.default_rng(0)
        arr = np.asarray(idents)
        means = np.mean(
            arr[boot_rng.integers(0, len(arr), size=(2000, len(arr)))], axis=1
        )
        summary["mean_ci95"] = [float(np.percentile(means, 2.5)),
                                float(np.percentile(means, 97.5))]
    if args.json:
        print(json.dumps(summary))
    else:
        log.info("summary: %s", summary)
    return 0


if __name__ == "__main__":
    sys.exit(main())
