"""Microbenchmark the decode-step components on the real chip.

Times, for a given batch/dtype: (a) one jitted decoder step standalone,
(b) the full greedy while_loop, (c) encoder forward — to locate the
per-step cost. Usage: python scripts/profile_decode.py [--batch N]
[--dtype bfloat16|float32] [--tmax N]
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


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--tmax", type=int, default=320)
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    from nanodecoder_tpu.config import Config
    from nanodecoder_tpu.models.model import (decode_step, encode,
                                              init_decode_state, init_model)
    from nanodecoder_tpu.decode.greedy import greedy_decode

    cfg_json = os.path.join("bench_results", "config.json")
    with open(cfg_json) as f:
        config = Config.from_json(f.read())
    mcfg = dataclasses.replace(
        config.model, compute_dtype=args.dtype, max_decode_len=args.tmax,
        use_pallas=args.pallas)
    params = init_model(jax.random.PRNGKey(0), mcfg)

    b, s = args.batch, config.signal.chunk_len
    signal = jnp.asarray(np.random.default_rng(0).standard_normal((b, s)), jnp.float32)
    lengths = jnp.full((b,), s, jnp.int32)

    enc = jax.jit(lambda p, x, l: encode(p, mcfg, x, l))
    t_enc = timeit(enc, params, signal, lengths)
    memory, mem_len = enc(params, signal, lengths)
    print(f"encoder  b={b} dtype={args.dtype}: {t_enc*1e3:.3f} ms  "
          f"memory {memory.shape} {memory.dtype}")

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
    t_step = (time.perf_counter() - t0) / n
    print(f"one decode_step (donated): {t_step*1e3:.3f} ms")
    del st, state0

    memory, mem_len = enc(params, signal, lengths)

    # Stripped loop: fori_loop over decode_step only, no greedy bookkeeping.
    def stripped(p, m, ml):
        st0 = init_decode_state(p, mcfg, m, ml)
        c0 = jnp.full((b,), 1, jnp.int32)

        def body(i, carry):
            c, st, acc = carry
            lp, _, st = decode_step(p, mcfg, c, st)
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            return nxt, st, acc + lp[:, 0]

        _, _, acc = jax.lax.fori_loop(
            0, args.tmax, body, (c0, st0, jnp.zeros((b,), jnp.float32)))
        return acc

    f_stripped = jax.jit(stripped)
    t_strip = timeit(f_stripped, params, memory, mem_len, n=3)
    print(f"stripped fori loop x{args.tmax}: {t_strip*1e3:.1f} ms "
          f"-> {t_strip/args.tmax*1e6:.0f} us/step")

    dec = jax.jit(lambda p, m, ml: greedy_decode(p, mcfg, m, ml))
    t_full = timeit(dec, params, memory, mem_len, n=3)
    res = dec(params, memory, mem_len)
    mean_len = float(jnp.mean(res.lengths))
    steps = int(jnp.max(res.lengths))
    # random params: loop may exit early or run to tmax
    print(f"full greedy loop: {t_full*1e3:.1f} ms, mean len {mean_len:.0f} "
          f"max {steps} -> {t_full/max(steps,1)*1e6:.0f} us/step")


if __name__ == "__main__":
    main()
