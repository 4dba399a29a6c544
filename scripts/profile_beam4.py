"""Real beam_decode per-step cost: time the actual jitted program at two
static max_decode_len values with EOS masked out (min_len=tmax), so the
loop runs exactly tmax steps; per-step = (t(hi) - t(lo)) / (hi - lo).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_beam4.py \
         [--batch 16] [--beam 5] [--fused/--no-fused]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from nanodecoder_tpu.config import Config
from nanodecoder_tpu.decode.beam import beam_decode
from nanodecoder_tpu.models.model import encode, init_model
from nanodecoder_tpu.train.checkpoint import load_params_npz


def timed(fn, args_, repeats=5):
    np.asarray(fn(*args_)[0])  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn(*args_)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--lo", type=int, default=64)
    ap.add_argument("--hi", type=int, default=320)
    ap.add_argument("--fused", action=argparse.BooleanOptionalAction, default=True)
    args = ap.parse_args()

    with open("bench_results/config.json") as f:
        config = Config.from_json(f.read())
    base_m = dataclasses.replace(config.model, compute_dtype="bfloat16",
                                 use_pallas=True)
    params = load_params_npz("bench_results/flagship_params.npz",
                             init_model(jax.random.PRNGKey(0), base_m))
    b, k, clen = args.batch, args.beam, config.signal.chunk_len
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((b, clen)), jnp.float32)
    lens = jnp.full((b,), clen, jnp.int32)

    times = {}
    for tmax in (args.lo, args.hi):
        mcfg = dataclasses.replace(base_m, max_decode_len=tmax)
        dcfg = dataclasses.replace(config.decode, mode="beam", beam_size=k,
                                   min_len=tmax, max_len=tmax,
                                   use_pallas=args.fused)

        def prog(p, s, l, mcfg=mcfg, dcfg=dcfg):
            mem, ml = encode(p, mcfg, s, l)
            r = beam_decode(p, mcfg, dcfg, mem, ml)
            return r.scores, r.tokens

        t = timed(jax.jit(prog), (params, sig, lens))
        times[tmax] = t
        print(f"tmax={tmax:4d}: {t*1e3:8.1f} ms total")
    per = (times[args.hi] - times[args.lo]) / (args.hi - args.lo)
    print(f"per-step: {per*1e6:.1f} us  (fused={args.fused}, b={b}, K={k})")


if __name__ == "__main__":
    main()
