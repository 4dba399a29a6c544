"""Bisect the greedy program: why does encode+loop combined cost more
than the sum of its parts? (round 5; standalone loop 2.1 ms vs 10.2 ms
of while time in the full-program trace at b512)."""

import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import jax
import jax.numpy as jnp
import numpy as np

from profile import load_flagship, sim_chunks  # noqa: E402


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    params, config = load_flagship(None)
    mcfg = config.model
    jc, jl = sim_chunks(config, batch)

    from nanodecoder_tpu.decode.greedy import greedy_decode
    from nanodecoder_tpu.models.model import encode

    # 1. encoder alone
    enc = jax.jit(lambda p, x, l: encode(p, mcfg, x, l))
    t_enc = timeit(enc, params, jc, jl)
    memory, mem_len = enc(params, jc, jl)
    print(f"encoder alone:        {t_enc*1e3:7.2f} ms")

    # 2. loop alone (memory precomputed)
    dec = jax.jit(lambda p, m, ml: greedy_decode(p, mcfg, m, ml))
    t_dec = timeit(dec, params, memory, mem_len)
    print(f"loop alone:           {t_dec*1e3:7.2f} ms")

    # 3. fused encode+loop
    def fused(p, x, l):
        m, ml = encode(p, mcfg, x, l)
        return greedy_decode(p, mcfg, m, ml)

    t_fused = timeit(jax.jit(fused), params, jc, jl)
    print(f"encode+loop fused:    {t_fused*1e3:7.2f} ms   "
          f"(parts sum {1e3*(t_enc+t_dec):.2f})")

    # 3b. wire dequant + encode + loop
    from nanodecoder_tpu.io.signal import convert_h2d, wire_to_f32

    h2d = config.decode.resolve_h2d(mcfg.compute_dtype)
    wire = jnp.asarray(convert_h2d(np.asarray(jc), h2d,
                                   config.signal.clip_sigma))

    def fused_wire(p, w, l):
        x = wire_to_f32(w, h2d, config.signal.clip_sigma,
                        config.signal.chunk_len)
        m, ml = encode(p, mcfg, x, l)
        return greedy_decode(p, mcfg, m, ml)

    t_fw = timeit(jax.jit(fused_wire), params, wire, jl)
    print(f"wire+encode+loop:     {t_fw*1e3:7.2f} ms   (wire={h2d})")

    # 3c. + d2h compaction (= the full greedy program body)
    from nanodecoder_tpu.decode.translator import Translator

    def fused_all(p, w, l):
        r = fused_wire(p, w, l)
        ds = mcfg.time_downsample
        return Translator._compact_d2h(r.tokens, r.lengths,
                                       r.token_log_probs, r.scores,
                                       r.attn_pos * ds + ds // 2)

    t_fa = timeit(jax.jit(fused_all), params, wire, jl)
    print(f"+compact_d2h:         {t_fa*1e3:7.2f} ms")

    # 4. full translator program (device-resident wire input)
    tr = Translator(params, config)
    t_full = timeit(tr._decode_jit, wire, jl)
    print(f"full program:         {t_full*1e3:7.2f} ms")

    # 2 again — window-drift control
    t_dec2 = timeit(dec, params, memory, mem_len)
    print(f"loop alone (again):   {t_dec2*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
