"""Device-truth throughput: wrap K iterations of the full
encode+greedy-decode program in ONE jitted lax.fori_loop, so a single
relay call measures K batches of pure device compute (no host dispatch
in the loop). Reports per-batch time from the (2K - K) marginal.

Usage: python scripts/profile_ondevice.py [--batch N] [--dtype D] [--k K]
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
from nanodecoder_tpu.decode.greedy import greedy_decode
from nanodecoder_tpu.models.model import encode, init_model
from nanodecoder_tpu.train.checkpoint import load_params_npz
from nanodecoder_tpu.train.data import SimSpec, simulate_read


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default=None, help="override compute dtype")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    with open("bench_results/config.json") as f:
        config = Config.from_json(f.read())
    mcfg = config.model
    if args.dtype:
        mcfg = dataclasses.replace(mcfg, compute_dtype=args.dtype)
    if args.pallas:
        mcfg = dataclasses.replace(mcfg, use_pallas=True)
    params = load_params_npz("bench_results/flagship_params.npz",
                             init_model(jax.random.PRNGKey(0), mcfg))

    bsz, clen = args.batch, config.signal.chunk_len
    rng = np.random.default_rng(0)
    spec = SimSpec()
    levels = spec.level_table()
    chunks = np.zeros((bsz, clen), np.float32)
    for i in range(bsz):
        _seq, sig = simulate_read(rng, int(clen / spec.mean_dwell * 0.95), spec, levels)
        n = min(sig.shape[0], clen)
        chunks[i, :n] = sig[:n]
    jc = jnp.asarray(chunks)
    jl = jnp.asarray(np.full((bsz,), clen, np.int32))

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

    # compile both variants first
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
          f"{steps} steps, {per_batch/steps*1e6:.0f} us/step, {ksamp:.0f} ksamples/s "
          f"(mean len {lens.mean():.0f})")


if __name__ == "__main__":
    main()
