"""Beam-step ablation with tunnel-proof timing.

Method: one jitted program whose fori_loop bound is a TRACED argument;
cost/step = (t(n_long) - t(n_short)) / (n_long - n_short), min over
repeats.  This cancels dispatch/transfer overhead that made the
1-call-vs-2-call method return negative numbers over the relay.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_beam3.py \
         [--batch 16] [--beam 5] [--dtype bfloat16] [--pallas]
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
from nanodecoder_tpu.models.model import (decode_step, encode, init_decode_state,
                                          init_model, reorder_decode_state_beam)
from nanodecoder_tpu.train.checkpoint import load_params_npz

EOS = 2


def per_step_cost(jitted, args_, n_short=40, n_long=240, repeats=4):
    for n in (n_short, n_long):  # compile both
        np.asarray(jitted(jnp.int32(n), *args_))
    best = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(jitted(jnp.int32(n_short), *args_))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(jitted(jnp.int32(n_long), *args_))
        tl = time.perf_counter() - t0
        best.append((tl - ts) / (n_long - n_short))
    return min(best)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--fused", action="store_true", help="use pallas beam_advance")
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
    memory, mem_len = jax.jit(lambda p, s, l: encode(p, mcfg, s, l))(params, sig, lens)
    np.asarray(mem_len)
    mem_t = jnp.repeat(memory, k, axis=0)
    len_t = jnp.repeat(mem_len, k, axis=0)

    def advance(alive, lp):
        """The lax.top_k beam bookkeeping from decode/beam.py."""
        cand = alive[:, :, None] + lp.reshape(b, k, v)
        ts_, ti = jax.lax.top_k(cand.reshape(b, k * v), 2 * k)
        tok = ti % v
        origin = ti // v
        a_s, a_i = jax.lax.top_k(jnp.where(tok == EOS, -1e9, ts_), k)
        ao = jnp.take_along_axis(origin, a_i, axis=1)
        cur = jnp.take_along_axis(tok, a_i, axis=1).reshape(-1).astype(jnp.int32)
        return a_s, ao, cur

    def advance_fused(alive, lp, fin):
        from nanodecoder_tpu.ops.beam_step import beam_advance

        top_ids, a_s, a_i, nf, fi = beam_advance(
            alive, lp.reshape(b, k, v), fin, jnp.float32(1.0), k, v, EOS,
            interpret=jax.default_backend() != "tpu")
        tok = (top_ids % v).astype(jnp.int32)
        origin = top_ids // v
        ao = jnp.take_along_axis(origin, a_i, axis=1)
        cur = jnp.take_along_axis(tok, a_i, axis=1).reshape(-1).astype(jnp.int32)
        return a_s, ao, cur, nf

    def mk(with_step, with_topk, with_reorder, with_seqs=False):
        tmax = mcfg.max_decode_len

        def run(n, p, mem_t, len_t):
            st0 = init_decode_state(p, mcfg, mem_t, len_t)
            cur0 = jnp.zeros((b * k,), jnp.int32)
            alive0 = jnp.zeros((b, k), jnp.float32)
            fin0 = jnp.full((b, k), -1e9, jnp.float32)
            seqs0 = dict(
                alive_seq=jnp.zeros((b, k, tmax), jnp.int32),
                fin_seq=jnp.zeros((b, k, tmax), jnp.int32),
                fin_len=jnp.zeros((b, k), jnp.int32),
            )

            def gather_beams(x, idx):
                return jax.vmap(lambda row, i: row[i])(x, idx)

            def body(i, carry):
                cur, st, alive, fin, seqs = carry
                if with_step:
                    lp, _pos, st = decode_step(p, mcfg, cur, st)
                else:
                    # carry-dependent fake logits (not DCE-able, ~free)
                    lp = alive.reshape(b * k, 1) * 1e-3 + jnp.zeros((b * k, v))
                if with_topk == "fused":
                    alive, ao, cur, fin = advance_fused(alive, lp, fin)
                elif with_topk:
                    alive, ao, cur = advance(alive, lp)
                else:
                    ao = jnp.tile(jnp.arange(k)[None, :], (b, 1))
                    cur = jnp.argmax(lp, -1).astype(jnp.int32)
                    alive = alive + lp.reshape(b, k, v).max(-1) * 1e-6
                if with_reorder:
                    st = reorder_decode_state_beam(st, ao)
                    # depend on st so the reorder can't be DCE'd
                    alive = alive + st["layers"][0]["self_k"][0, 0].sum().astype(jnp.float32) * 1e-9
                if with_seqs:
                    # the real beam body's sequence bookkeeping
                    origin2k = jnp.tile(jnp.arange(k)[None, :], (b, 2))
                    tok2k = jnp.tile(cur.reshape(b, k), (1, 2))
                    cand_seq = gather_beams(seqs["alive_seq"], origin2k)
                    cand_seq = jax.lax.dynamic_update_slice_in_dim(
                        cand_seq, tok2k[:, :, None], jnp.minimum(i, tmax - 1), axis=2)
                    a_idx = jnp.tile(jnp.arange(k)[None, :], (b, 1))
                    new_alive_seq = gather_beams(cand_seq, a_idx)
                    all_seq = jnp.concatenate([seqs["fin_seq"], cand_seq], axis=1)
                    all_len = jnp.concatenate(
                        [seqs["fin_len"], jnp.full((b, 2 * k), i, jnp.int32)], axis=1)
                    f_idx = jnp.tile(jnp.arange(k)[None, :], (b, 1)) + (cur.reshape(b, k) % 2)
                    seqs = dict(
                        alive_seq=new_alive_seq,
                        fin_seq=gather_beams(all_seq, f_idx),
                        fin_len=jnp.take_along_axis(all_len, f_idx, axis=1),
                    )
                    alive = alive + seqs["fin_seq"][0, 0, 0].astype(jnp.float32) * 1e-9
                return (cur, st, alive, fin, seqs)

            cur, st, alive, fin, seqs = jax.lax.fori_loop(
                0, n, body, (cur0, st0, alive0, fin0, seqs0))
            return alive.sum() + cur.sum()

        return jax.jit(run)

    cases = [
        ("step only", (True, False, False)),
        ("topk only", (False, True, False)),
        ("topk fused only", (False, "fused", False)),
        ("reorder only", (False, False, True)),
        ("topk+reorder", (False, True, True)),
        ("step+topk", (True, True, False)),
        ("full (lax.top_k)", (True, True, True)),
        ("full (fused)", (True, "fused", True)),
        ("full fused + seqs", (True, "fused", True, True)),
        ("seqs only", (False, False, False, True)),
    ]
    for tag, flags in cases:
        us = per_step_cost(mk(*flags), (params, mem_t, len_t)) * 1e6
        print(f"{tag:22s}: {us:8.1f} us/step")


if __name__ == "__main__":
    main()
