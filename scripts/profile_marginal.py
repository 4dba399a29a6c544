"""Trustworthy TPU timing over the axon relay: block_until_ready has
shown inconsistent behavior, so measure wall time of N vs 2N dispatched
calls with a final np.asarray() host fetch (which must drain the queue),
and report the marginal per-call time (cancels fixed RPC overhead)."""
from __future__ import annotations

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


def drain_time(fn, args, n):
    """Dispatch n calls, force final host fetch, return wall seconds."""
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return time.perf_counter() - t0


def marginal(tag, fn, args, n=4):
    out = fn(*args)  # compile
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t1 = drain_time(fn, args, n)
    t2 = drain_time(fn, args, 2 * n)
    per = (t2 - t1) / n
    print(f"{tag}: N={n}:{t1*1e3:.1f}ms 2N:{t2*1e3:.1f}ms -> marginal {per*1e3:.2f} ms/call")
    return per


def main():
    with open("bench_results/config.json") as f:
        config = Config.from_json(f.read())
    params = load_params_npz("bench_results/flagship_params.npz",
                             init_model(jax.random.PRNGKey(0), config.model))
    mcfg = config.model
    rng = np.random.default_rng(0)
    spec = SimSpec()
    levels = spec.level_table()

    for bsz in (32, 128):
        clen = config.signal.chunk_len
        chunks = np.zeros((bsz, clen), np.float32)
        for i in range(bsz):
            _seq, sig = simulate_read(rng, int(clen / spec.mean_dwell * 0.95), spec, levels)
            n = min(sig.shape[0], clen)
            chunks[i, :n] = sig[:n]
        jc, jl = jnp.asarray(chunks), jnp.asarray(np.full((bsz,), clen, np.int32))

        enc = jax.jit(lambda p, s, l: encode(p, mcfg, s, l))
        t_enc = marginal(f"encoder b={bsz}", enc, (params, jc, jl))

        def full(p, s, l):
            memory, mem_len = encode(p, mcfg, s, l)
            r = greedy_decode(p, mcfg, memory, mem_len)
            return r.tokens, r.lengths

        f = jax.jit(full)
        t_full = marginal(f"enc+greedy b={bsz}", f, (params, jc, jl))
        out = f(params, jc, jl)
        ml = float(np.mean(np.asarray(out[1])))
        mx = int(np.max(np.asarray(out[1])))
        steps = min(mx + 1, mcfg.max_decode_len)
        print(f"  mean len {ml:.0f} max {mx} -> decode {(t_full-t_enc)*1e3:.1f}ms"
              f" / ~{steps} steps = {(t_full-t_enc)/steps*1e6:.0f} us/step")
        ksamp = bsz * clen / t_full / 1e3
        print(f"  -> {ksamp:.0f} ksamples/s")


if __name__ == "__main__":
    main()
