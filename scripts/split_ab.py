"""A/B: monolithic greedy program vs encode-program + loop-program
split, measured with pipelined dispatch (the bench meter's method) so
the tunneled relay's per-dispatch latency amortizes out.

Hypothesis (round 5): inside the monolithic program, memory-space
assignment gives VMEM to the encoder's buffers, leaving the decode
loop's hot operands (cross K/V, combined cache) ping-ponging via
per-step copy-starts; in a dedicated loop program the loop gets the
VMEM budget (standalone loop ~3.7 ms vs ~10 ms of in-program while
time in the b512 trace).
"""

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


def pipelined(fn_chain, n=30, warm=4):
    """Dispatch fn_chain() n times without blocking; wall/dispatch."""
    outs = [fn_chain() for _ in range(warm)]
    jax.block_until_ready(outs[-1])
    t0 = time.perf_counter()
    outs = [fn_chain() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    params, config = load_flagship(None)
    # Device-resident params: numpy leaves would re-cross the ~26 MB/s
    # relay on EVERY dispatch. Fold+pre-cast exactly as serving does.
    from nanodecoder_tpu.models.model import prepare_serving_params

    params = jax.jit(
        lambda p: prepare_serving_params(p, config.model))(params)
    jax.block_until_ready(params)
    mcfg = config.model
    jc, jl = sim_chunks(config, batch)

    from nanodecoder_tpu.decode.greedy import greedy_decode
    from nanodecoder_tpu.io.signal import convert_h2d, wire_to_f32
    from nanodecoder_tpu.models.model import encode

    h2d = config.decode.resolve_h2d(mcfg.compute_dtype)
    wire = jnp.asarray(convert_h2d(np.asarray(jc), h2d,
                                   config.signal.clip_sigma))

    def mono(p, w, l):
        x = wire_to_f32(w, h2d, config.signal.clip_sigma,
                        config.signal.chunk_len)
        m, ml = encode(p, mcfg, x, l)
        r = greedy_decode(p, mcfg, m, ml)
        return r.tokens, r.lengths

    def enc_prog(p, w, l):
        x = wire_to_f32(w, h2d, config.signal.clip_sigma,
                        config.signal.chunk_len)
        return encode(p, mcfg, x, l)

    def loop_prog(p, m, ml):
        r = greedy_decode(p, mcfg, m, ml)
        return r.tokens, r.lengths

    jmono = jax.jit(mono)
    jenc = jax.jit(enc_prog)
    jloop = jax.jit(loop_prog)

    t_mono = pipelined(lambda: jmono(params, wire, jl))
    ks = batch * config.signal.chunk_len / t_mono / 1e3
    print(f"monolithic:  {t_mono*1e3:7.2f} ms/batch  ({ks:8.0f} ksamples/s)")

    def chain():
        m, ml = jenc(params, wire, jl)
        return jloop(params, m, ml)

    t_split = pipelined(chain)
    ks = batch * config.signal.chunk_len / t_split / 1e3
    print(f"enc+loop:    {t_split*1e3:7.2f} ms/batch  ({ks:8.0f} ksamples/s)")

    t_mono2 = pipelined(lambda: jmono(params, wire, jl))
    ks = batch * config.signal.chunk_len / t_mono2 / 1e3
    print(f"monolithic2: {t_mono2*1e3:7.2f} ms/batch  ({ks:8.0f} ksamples/s)")


if __name__ == "__main__":
    main()
