"""Consolidated TPU profiling harness (one script, subcommands).

Replaces the round-1/2 one-shot scripts (profile_decode, profile_beam*,
profile_ondevice, profile_decode_trace, profile_step_ablation,
profile_cross_variants, profile_marginal, profile_headtohead); their
measured conclusions live in docs/PERF.md.

Subcommands:
  trace     capture a jax.profiler device trace of the production decode
            program (greedy or --beam) and print the per-op device-time
            breakdown parsed straight from the .xplane.pb (no
            tensorboard).  THE tool for step-level evidence.
  ondevice  device-truth throughput: K full encode+greedy batches inside
            ONE jitted fori_loop (the tunneled relay makes per-call
            block_until_ready unreliable; the 2K-K marginal is robust).
  beamstep  real beam_decode per-step cost from the (hi-lo) marginal of
            two static max_decode_len builds with EOS masked out.
  decode    component microbench: encoder forward, single decode_step,
            stripped fori decode loop, full greedy loop.

All subcommands load the committed flagship from bench_results/ unless
--ckpt points elsewhere (config.json is read from alongside the .npz).
"""
from __future__ import annotations

import argparse
import dataclasses
import glob
import os
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
import sys

sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np


# --- shared helpers ---------------------------------------------------------


def load_flagship(ckpt: str = "", dtype: str = "bfloat16", pallas: bool = True,
                  tmax: int = 0):
    from nanodecoder_tpu.config import Config
    from nanodecoder_tpu.models.model import init_model
    from nanodecoder_tpu.train.checkpoint import load_params_npz

    npz = ckpt or os.path.join(_REPO, "bench_results", "flagship_params.npz")
    with open(os.path.join(os.path.dirname(npz), "config.json")) as f:
        config = Config.from_json(f.read())
    mcfg = dataclasses.replace(config.model, compute_dtype=dtype,
                               use_pallas=pallas)
    if tmax:
        mcfg = dataclasses.replace(mcfg, max_decode_len=tmax)
    config = dataclasses.replace(config, model=mcfg)
    params = load_params_npz(npz, init_model(jax.random.PRNGKey(0), mcfg))
    return params, config


def sim_chunks(config, batch: int):
    """Simulator-realistic signal chunks (random noise decodes to junk
    lengths; realistic chunks exercise the true step count)."""
    from nanodecoder_tpu.train.data import SimSpec, simulate_read

    rng = np.random.default_rng(0)
    spec = SimSpec()
    levels = spec.level_table()
    clen = config.signal.chunk_len
    chunks = np.zeros((batch, clen), np.float32)
    for i in range(batch):
        _seq, sig = simulate_read(rng, int(clen / spec.mean_dwell * 0.95),
                                  spec, levels)
        n = min(sig.shape[0], clen)
        chunks[i, :n] = sig[:n]
    return jnp.asarray(chunks), jnp.full((batch,), clen, jnp.int32)


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = [fn(*args) for _ in range(n)]
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# --- minimal xplane.pb reader ----------------------------------------------
# XSpace{ planes=1 } / XPlane{ name=2, lines=3, event_metadata=4(map) } /
# XLine{ events=4 } / XEvent{ metadata_id=1, duration_ps=3 } /
# XEventMetadata{ id=1, name=2 }.


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


# --- subcommands ------------------------------------------------------------


def cmd_trace(args):
    from nanodecoder_tpu.decode.translator import Translator

    if args.parse_only:
        summarize_xplane(args.parse_only, args.top)
        return
    params, config = load_flagship(args.ckpt)
    config = dataclasses.replace(
        config,
        decode=dataclasses.replace(config.decode, use_pallas=True,
                                   batch_chunks=args.batch,
                                   beam_size=args.beam_size,
                                   mode="beam" if args.beam else "greedy"),
    )
    translator = Translator(params, config)
    jc, jl = sim_chunks(config, args.batch)
    # _decode_jit takes the H2D WIRE format (int6 default since round
    # 5), not raw f32 — convert exactly as bench.py does.
    from nanodecoder_tpu.io.signal import convert_h2d

    jc = jnp.asarray(convert_h2d(np.asarray(jc), translator._h2d,
                                 config.signal.clip_sigma))
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


def cmd_ondevice(args):
    from nanodecoder_tpu.decode.greedy import greedy_decode
    from nanodecoder_tpu.models.model import encode

    params, config = load_flagship(args.ckpt, dtype=args.dtype,
                                   pallas=args.pallas)
    mcfg = config.model
    bsz, clen = args.batch, config.signal.chunk_len
    jc, jl = sim_chunks(config, bsz)

    def one_batch(p, s, l, salt):
        # salt the signal so XLA can't hoist the body out of the loop
        memory, mem_len = encode(p, mcfg, s + salt * 1e-6, l)
        r = greedy_decode(p, mcfg, memory, mem_len)
        return jnp.sum(r.lengths), r.lengths

    def k_batches(p, s, l, k):
        def body(i, acc):
            t, _ = one_batch(p, s, l, i.astype(jnp.float32))
            return acc + t
        return jax.lax.fori_loop(0, k, body, jnp.zeros((), jnp.int32))

    fk = jax.jit(k_batches, static_argnames=("k",))

    def run(k):
        t0 = time.perf_counter()
        out = fk(params, jc, jl, k)
        _ = int(out)  # host fetch drains the queue
        return time.perf_counter() - t0

    _ = int(fk(params, jc, jl, args.k))
    _ = int(fk(params, jc, jl, 2 * args.k))
    t1 = min(run(args.k) for _ in range(2))
    t2 = min(run(2 * args.k) for _ in range(2))
    per_batch = (t2 - t1) / args.k
    _, lens = jax.jit(one_batch)(params, jc, jl, jnp.zeros(()))
    lens = np.asarray(lens)
    steps = min(int(lens.max()) + 1, mcfg.max_decode_len)
    ksamp = bsz * clen / per_batch / 1e3
    print(f"b={bsz} dtype={mcfg.compute_dtype} pallas={mcfg.use_pallas}: "
          f"K:{t1*1e3:.0f}ms 2K:{t2*1e3:.0f}ms -> {per_batch*1e3:.1f} ms/batch, "
          f"{steps} steps, {per_batch/steps*1e6:.0f} us/step, {ksamp:.0f} "
          f"ksamples/s (mean len {lens.mean():.0f})")


def cmd_beamstep(args):
    from nanodecoder_tpu.decode.beam import beam_decode
    from nanodecoder_tpu.models.model import encode

    params, config = load_flagship(args.ckpt)
    base_m = config.model
    b, k, clen = args.batch, args.beam_size, config.signal.chunk_len
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((b, clen)), jnp.float32)
    lens = jnp.full((b,), clen, jnp.int32)

    def timed(fn, args_, repeats=5):
        np.asarray(fn(*args_)[0])  # compile
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(*args_)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    times = {}
    for tmax in (args.lo, args.hi):
        mcfg = dataclasses.replace(base_m, max_decode_len=tmax)
        dcfg = dataclasses.replace(config.decode, mode="beam", beam_size=k,
                                   min_len=tmax, max_len=tmax,
                                   use_pallas=args.pallas)

        def prog(p, s, l, mcfg=mcfg, dcfg=dcfg):
            mem, ml = encode(p, mcfg, s, l)
            r = beam_decode(p, mcfg, dcfg, mem, ml)
            return r.scores, r.tokens

        t = timed(jax.jit(prog), (params, sig, lens))
        times[tmax] = t
        print(f"tmax={tmax:4d}: {t*1e3:8.1f} ms total")
    per = (times[args.hi] - times[args.lo]) / (args.hi - args.lo)
    print(f"per-step: {per*1e6:.1f} us  (pallas={args.pallas}, b={b}, K={k})")


def cmd_decode(args):
    from nanodecoder_tpu.decode.greedy import greedy_decode
    from nanodecoder_tpu.models.model import (decode_step, encode,
                                              init_decode_state)

    params, config = load_flagship(args.ckpt, dtype=args.dtype,
                                   pallas=args.pallas, tmax=args.tmax)
    mcfg = config.model
    b = args.batch
    jc, jl = sim_chunks(config, b)

    enc = jax.jit(lambda p, x, l: encode(p, mcfg, x, l))
    t_enc = timeit(enc, params, jc, jl)
    memory, mem_len = enc(params, jc, jl)
    print(f"encoder  b={b} dtype={args.dtype}: {t_enc*1e3:.3f} ms  "
          f"memory {memory.shape} {memory.dtype}")

    from nanodecoder_tpu.models.decoder import prepare_decode_params

    params = prepare_decode_params(params, mcfg, memory.dtype)
    state0 = init_decode_state(params, mcfg, memory, mem_len)
    cur = jnp.full((b,), 1, jnp.int32)
    step = jax.jit(lambda p, c, st: decode_step(p, mcfg, c, st),
                   donate_argnums=(2,))
    lp, ap_, st = step(params, cur, state0)
    jax.block_until_ready((lp, st))
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        lp, ap_, st = step(params, cur, st)
    jax.block_until_ready((lp, st))
    print(f"one decode_step (donated): {(time.perf_counter()-t0)/n*1e3:.3f} ms")
    del st, state0
    memory, mem_len = enc(params, jc, jl)

    dec = jax.jit(lambda p, m, ml: greedy_decode(p, mcfg, m, ml))
    t_full = timeit(dec, params, memory, mem_len, n=3)
    res = dec(params, memory, mem_len)
    steps = int(jnp.max(res.lengths))
    print(f"full greedy loop: {t_full*1e3:.1f} ms, mean len "
          f"{float(jnp.mean(res.lengths)):.0f} max {steps} -> "
          f"{t_full/max(steps,1)*1e6:.0f} us/step")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("trace", help="device trace + per-op breakdown")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--beam", action="store_true")
    p.add_argument("--beam-size", type=int, default=5)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--logdir", default="/tmp/nd_trace")
    p.add_argument("--parse-only", default="")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--ckpt", default="")
    p.set_defaults(fn=cmd_trace)

    p = sub.add_parser("ondevice", help="K-batch fori_loop device truth")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--ckpt", default="")
    p.set_defaults(fn=cmd_ondevice)

    p = sub.add_parser("beamstep", help="beam per-step marginal (hi-lo tmax)")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--beam-size", type=int, default=5)
    p.add_argument("--lo", type=int, default=64)
    p.add_argument("--hi", type=int, default=128)
    p.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--ckpt", default="")
    p.set_defaults(fn=cmd_beamstep)

    p = sub.add_parser("decode", help="encoder/step/loop component times")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--tmax", type=int, default=0)
    p.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--ckpt", default="")
    p.set_defaults(fn=cmd_decode)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
