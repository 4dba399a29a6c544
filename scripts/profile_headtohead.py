"""Head-to-head: bench-style Translator._decode_jit vs direct jitted
encode+greedy, same trained params, same inputs. Locates the 2500x
discrepancy between bench.py and profile_decode.py."""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from nanodecoder_tpu.config import Config
from nanodecoder_tpu.decode.greedy import greedy_decode
from nanodecoder_tpu.decode.translator import Translator
from nanodecoder_tpu.models.model import encode, init_model
from nanodecoder_tpu.train.checkpoint import load_params_npz
from nanodecoder_tpu.train.data import SimSpec, simulate_read


def clock(tag, fn, *args, n=5):
    out = fn(*args)  # warmup/compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1e3:.2f} ms/call")
    return out, dt


def main():
    with open("bench_results/config.json") as f:
        config = Config.from_json(f.read())
    params = load_params_npz("bench_results/flagship_params.npz",
                             init_model(jax.random.PRNGKey(0), config.model))
    bsz, clen = 32, config.signal.chunk_len
    rng = np.random.default_rng(0)
    spec = SimSpec()
    levels = spec.level_table()
    chunks = np.zeros((bsz, clen), np.float32)
    for i in range(bsz):
        _seq, sig = simulate_read(rng, int(clen / spec.mean_dwell * 0.95), spec, levels)
        n = min(sig.shape[0], clen)
        chunks[i, :n] = sig[:n]
    lengths = np.full((bsz,), clen, np.int32)
    jc, jl = jnp.asarray(chunks), jnp.asarray(lengths)

    tr = Translator(params, config)
    out, dt_tr = clock("translator._decode_jit", tr._decode_jit, jc, jl)
    print("  mean len:", float(np.mean(np.asarray(out[1]))))

    mcfg = config.model

    def direct(p, s, l):
        memory, mem_len = encode(p, mcfg, s, l)
        return greedy_decode(p, mcfg, memory, mem_len)

    f = jax.jit(direct)
    res, dt_d = clock("direct jit(encode+greedy)", f, params, jc, jl)
    print("  mean len:", float(np.mean(np.asarray(res.lengths))),
          "max:", int(np.max(np.asarray(res.lengths))))

    # Same, via np.asarray fetch to rule out phantom async completion
    t0 = time.perf_counter()
    res = f(params, jc, jl)
    _ = np.asarray(res.tokens)
    print(f"direct with D2H fetch: {(time.perf_counter()-t0)*1e3:.2f} ms")

    enc = jax.jit(lambda p, s, l: encode(p, mcfg, s, l))
    clock("encoder only", enc, params, jc, jl)


if __name__ == "__main__":
    main()
