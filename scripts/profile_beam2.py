"""Compare beam reorder strategies (flat gather vs one-hot matmul) and
topk strategies (lax.top_k vs fused Pallas advance) on device."""
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
                                          init_model, reorder_decode_state,
                                          reorder_decode_state_beam)
from nanodecoder_tpu.ops.beam_step import beam_advance
from nanodecoder_tpu.train.checkpoint import load_params_npz

EOS_ID = 2


def clock_loop(tag, jitted, args_, steps):
    out = jitted(*args_)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    r1 = jitted(*args_)
    _ = np.asarray(jax.tree_util.tree_leaves(r1)[0])
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    r1 = jitted(*args_)
    r2 = jitted(*args_)
    _ = np.asarray(jax.tree_util.tree_leaves(r2)[0])
    t2 = time.perf_counter() - t0
    print(f"{tag:28s}: {(t2-t1)/steps*1e6:8.0f} us/step")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()

    with open("bench_results/config.json") as f:
        config = Config.from_json(f.read())
    mcfg = dataclasses.replace(config.model, compute_dtype="bfloat16",
                               use_pallas=True)
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

    def mk(topk_mode, reorder_mode, with_step=True):
        def run(p, mem_t, len_t):
            st0 = init_decode_state(p, mcfg, mem_t, len_t)
            cur0 = jnp.zeros((b * k,), jnp.int32)
            alive0 = jnp.zeros((b, k), jnp.float32)
            fin0 = jnp.full((b, k), -1e9, jnp.float32)

            def body(i, carry):
                cur, st, alive, fin = carry
                if with_step:
                    lp, _pos, st = decode_step(p, mcfg, cur, st)
                else:
                    lp = jnp.zeros((b * k, v), jnp.float32) - 0.1 * i
                lp3 = lp.reshape(b, k, v)
                pen = jnp.asarray(1.0, jnp.float32)
                if topk_mode == "pallas":
                    ti, a_s, a_i, f_s, f_i = beam_advance(alive, lp3, fin, pen,
                                                          k, v, EOS_ID)
                    origin = ti // v
                    tokk = (ti % v).astype(jnp.int32)
                    ao = jnp.take_along_axis(origin, a_i, axis=1)
                    cur = jnp.take_along_axis(tokk, a_i, axis=1).reshape(-1)
                    alive, fin = a_s, f_s
                elif topk_mode == "lax":
                    cand = alive[:, :, None] + lp3
                    ts_, ti = jax.lax.top_k(cand.reshape(b, k * v), 2 * k)
                    origin = ti // v
                    tokk = (ti % v).astype(jnp.int32)
                    is_eos = tokk == EOS_ID
                    a_s, a_i = jax.lax.top_k(jnp.where(is_eos, -1e9, ts_), k)
                    f_s, _ = jax.lax.top_k(
                        jnp.concatenate([fin, jnp.where(is_eos, ts_ / pen, -1e9)], 1), k)
                    ao = jnp.take_along_axis(origin, a_i, axis=1)
                    cur = jnp.take_along_axis(tokk, a_i, axis=1).reshape(-1)
                    alive, fin = a_s, f_s
                else:  # none
                    ao = jnp.zeros((b, k), jnp.int32)
                    alive = alive - 0.1
                if reorder_mode == "matmul":
                    st = reorder_decode_state_beam(st, ao)
                elif reorder_mode == "gather":
                    flat_origin = (jnp.arange(b)[:, None] * k + ao).reshape(-1)
                    st = reorder_decode_state(st, flat_origin)
                return (cur, st, alive, fin)

            cur, st, alive, fin = jax.lax.fori_loop(
                0, args.steps, body, (cur0, st0, alive0, fin0))
            return alive + fin + cur[0]

        return jax.jit(run)

    A = (params, mem_t, len_t)
    clock_loop("step+none+none", mk("none", "none"), A, args.steps)
    clock_loop("step+lax+none", mk("lax", "none"), A, args.steps)
    clock_loop("step+pallas+none", mk("pallas", "none"), A, args.steps)
    clock_loop("step+lax+gather", mk("lax", "gather"), A, args.steps)
    clock_loop("step+lax+matmul", mk("lax", "matmul"), A, args.steps)
    clock_loop("step+pallas+matmul", mk("pallas", "matmul"), A, args.steps)
    clock_loop("nostep+pallas+none", mk("pallas", "none", with_step=False), A, args.steps)
    clock_loop("nostep+lax+none", mk("lax", "none", with_step=False), A, args.steps)
    clock_loop("nostep+none+matmul", mk("none", "matmul", with_step=False), A, args.steps)
    clock_loop("nostep+none+gather", mk("none", "gather", with_step=False), A, args.steps)


if __name__ == "__main__":
    main()
