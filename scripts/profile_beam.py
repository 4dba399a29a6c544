"""Ablate the beam-search step on device: decoder step at B*K rows,
state reorder, topk+bookkeeping — each in a K-iteration fori_loop.
Usage: python scripts/profile_beam.py [--batch 32] [--beam 5]"""
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
from nanodecoder_tpu.models.model import (decode_step, encode, init_decode_state,
                                          init_model, reorder_decode_state)
from nanodecoder_tpu.train.checkpoint import load_params_npz


def clock_loop(tag, jitted, args_, steps):
    out = jitted(*args_)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    r1 = jitted(*args_)
    _ = np.asarray(jax.tree_util.tree_leaves(r1)[0])
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    r1 = jitted(*args_)
    r2 = jitted(*args_)
    _ = np.asarray(jax.tree_util.tree_leaves(r2)[0])
    t2 = time.perf_counter() - t0
    per = (t2 - t1) / steps
    print(f"{tag:24s}: {per*1e6:8.0f} us/step")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--pallas", action="store_true", default=True)
    args = ap.parse_args()

    with open("bench_results/config.json") as f:
        config = Config.from_json(f.read())
    mcfg = dataclasses.replace(config.model, compute_dtype=args.dtype,
                               use_pallas=args.pallas)
    params = load_params_npz("bench_results/flagship_params.npz",
                             init_model(jax.random.PRNGKey(0), mcfg))
    b, k, clen = args.batch, args.beam, config.signal.chunk_len
    v = mcfg.vocab_size
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((b, clen)), jnp.float32)
    lens = jnp.full((b,), clen, jnp.int32)
    enc = jax.jit(lambda p, s, l: encode(p, mcfg, s, l))
    memory, mem_len = enc(params, sig, lens)
    np.asarray(mem_len)

    mem_t = jnp.repeat(memory, k, axis=0)
    len_t = jnp.repeat(mem_len, k, axis=0)

    def mk(with_step, with_reorder, with_topk):
        def run(p, mem_t, len_t):
            st0 = init_decode_state(p, mcfg, mem_t, len_t)
            cur0 = jnp.zeros((b * k,), jnp.int32)
            alive0 = jnp.zeros((b, k), jnp.float32)

            def body(i, carry):
                cur, st, alive = carry
                lp = jnp.zeros((b * k, v), jnp.float32)
                if with_step:
                    lp, _pos, st = decode_step(p, mcfg, cur, st)
                if with_topk:
                    cand = alive[:, :, None] + lp.reshape(b, k, v)
                    ts_, ti = jax.lax.top_k(cand.reshape(b, k * v), 2 * k)
                    origin = ti // v
                    a_s, a_i = jax.lax.top_k(jnp.where((ti % v) == 2, -1e9, ts_), k)
                    alive = a_s
                    ao = jnp.take_along_axis(origin, a_i, axis=1)
                    flat_origin = (jnp.arange(b)[:, None] * k + ao).reshape(-1)
                    cur = jnp.take_along_axis((ti % v), a_i, axis=1).reshape(-1).astype(jnp.int32)
                else:
                    flat_origin = jnp.arange(b * k)
                if with_reorder:
                    st = reorder_decode_state(st, flat_origin)
                return (cur, st, alive)

            cur, st, alive = jax.lax.fori_loop(0, args.steps, body, (cur0, st0, alive0))
            return alive

        return jax.jit(run)

    clock_loop("step only", mk(True, False, False), (params, mem_t, len_t), args.steps)
    clock_loop("step+topk", mk(True, False, True), (params, mem_t, len_t), args.steps)
    clock_loop("reorder only(identity)", mk(False, True, False), (params, mem_t, len_t), args.steps)
    clock_loop("step+topk+reorder", mk(True, True, True), (params, mem_t, len_t), args.steps)


if __name__ == "__main__":
    main()
