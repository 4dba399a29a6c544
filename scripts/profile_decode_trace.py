"""Capture a jax.profiler device trace of the greedy decode loop and
summarize per-op device time from the trace protobuf.

The marginal-timing harnesses (profile_step_ablation / cross_variants)
give per-variant totals; this gives the actual per-op breakdown of the
production decode step — where the 810 us/step at batch 256 goes.

Usage: python scripts/profile_decode_trace.py [--batch 256] [--fused]
Writes the trace under /tmp/nd_trace and prints the top device ops by
total time, parsed from the .xplane.pb with a minimal varint reader (no
tensorboard dependency).
"""
from __future__ import annotations

import argparse
import dataclasses
import glob
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from nanodecoder_tpu.config import Config
from nanodecoder_tpu.models.model import init_model
from nanodecoder_tpu.decode.translator import Translator
from nanodecoder_tpu.train.checkpoint import load_params_npz


# --- minimal xplane.pb reader ------------------------------------------------
# The XPlane proto (tensorflow/compiler/xla/backends/profiler) layout used:
# XSpace{ planes=1 } / XPlane{ name=1, lines=3, event_metadata=4(map),
# stat_metadata=5 } / XLine{ events=4 } / XEvent{ metadata_id=1,
# duration_ps=3 } / XEventMetadata{ id=1, name=2 }.


def _varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def _fields(buf):
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
            yield fnum, v
        elif wt == 1:
            yield fnum, buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            yield fnum, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield fnum, buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")


def summarize_xplane(path, top=40):
    with open(path, "rb") as f:
        space = f.read()
    results = {}
    for fnum, plane_buf in _fields(space):
        if fnum != 1:
            continue
        meta = {}
        lines = []
        plane_name = ""
        for pf, val in _fields(plane_buf):
            if pf == 2:  # XPlane.name
                plane_name = val.decode(errors="replace")
            elif pf == 3:
                lines.append(val)
            elif pf == 4:  # map<int64, XEventMetadata>
                mid = None
                mname = ""
                for mf, mval in _fields(val):
                    if mf == 2:  # value: XEventMetadata
                        for ef, ev in _fields(mval):
                            if ef == 1:
                                mid = ev
                            elif ef == 2:
                                mname = ev.decode(errors="replace")
                if mid is not None:
                    meta[mid] = mname
        if "TPU" not in plane_name and "/device" not in plane_name.lower():
            continue
        totals = {}
        counts = {}
        for line_buf in lines:
            for lf, ev_buf in _fields(line_buf):
                if lf != 4:
                    continue
                mid = 0
                dur = 0
                for ef, ev in _fields(ev_buf):
                    if ef == 1:
                        mid = ev
                    elif ef == 3:
                        dur = ev
                name = meta.get(mid, str(mid))
                totals[name] = totals.get(name, 0) + dur
                counts[name] = counts.get(name, 0) + 1
        if totals:
            results[plane_name] = (totals, counts)
    for plane_name, (totals, counts) in results.items():
        print(f"\n== {plane_name} ==")
        items = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
        for name, ps in items:
            print(f"  {ps/1e9:10.3f} ms  x{counts[name]:<6d} {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--beam", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/nd_trace")
    ap.add_argument("--parse-only", default="")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    if args.parse_only:
        summarize_xplane(args.parse_only, args.top)
        return

    with open("bench_results/config.json") as f:
        config = Config.from_json(f.read())
    config = dataclasses.replace(
        config,
        model=dataclasses.replace(config.model, use_pallas=True,
                                  fused_step=args.fused),
        decode=dataclasses.replace(config.decode, use_pallas=True,
                                   batch_chunks=args.batch,
                                   mode="beam" if args.beam else "greedy"),
    )
    params = load_params_npz("bench_results/flagship_params.npz",
                             init_model(jax.random.PRNGKey(0), config.model))
    translator = Translator(params, config)

    from nanodecoder_tpu.train.data import SimSpec, simulate_read

    rng = np.random.default_rng(0)
    spec = SimSpec()
    levels = spec.level_table()
    b, clen = args.batch, config.signal.chunk_len
    chunks = np.zeros((b, clen), np.float32)
    for i in range(b):
        _seq, sig = simulate_read(rng, int(clen / spec.mean_dwell * 0.95), spec, levels)
        n = min(sig.shape[0], clen)
        chunks[i, :n] = sig[:n]
    jc = jnp.asarray(chunks)
    jl = jnp.full((b,), clen, jnp.int32)

    out = translator._decode_jit(jc, jl)
    jax.block_until_ready(out)
    print("# warm; tracing", args.reps, "decodes")
    jax.profiler.start_trace(args.logdir)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = translator._decode_jit(jc, jl)
    _ = float(jnp.sum(out[1].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"# traced {args.reps} decodes in {dt*1e3:.0f} ms")
    pbs = sorted(glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
    if not pbs:
        print("no xplane.pb found under", args.logdir)
        return
    summarize_xplane(pbs[-1], args.top)


if __name__ == "__main__":
    main()
