"""Multi-chip scaling-efficiency sweep (BASELINE.md: reads/s at
1/8/16 chips, >=85% efficiency target).

On real multi-chip hardware this measures true scaling over ICI.  With
one chip (or none), `--virtual N` runs the identical sharded program on
N virtual CPU devices — validating the mesh/sharding structure and
producing a (host-bound, not ICI-bound) efficiency curve.

    python bench/scaling.py --virtual 8
    python bench/scaling.py            # real devices, all visible chips

Emits one JSON line per mesh size:
  {"metric": "scaling_sweep", "n_devices": N, "ksamples_per_sec": X,
   "efficiency_vs_1chip": E}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (0 = real devices)")
    ap.add_argument("--chunks-per-device", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nanodecoder_tpu.config import Config, MeshConfig
    from nanodecoder_tpu.decode.greedy import greedy_decode
    from nanodecoder_tpu.models.model import encode, init_model
    from nanodecoder_tpu.parallel.mesh import make_mesh_plan

    # Small-ish model on CPU sweeps; flagship on real chips.
    config = Config()
    if args.virtual:
        from nanodecoder_tpu.config import tiny_test_config

        config = tiny_test_config()
    mcfg = config.model
    clen = config.signal.chunk_len
    params = init_model(jax.random.PRNGKey(0), mcfg)

    def program(params, signal, lengths):
        memory, mem_len = encode(params, mcfg, signal, lengths)
        r = greedy_decode(params, mcfg, memory, mem_len)
        return r.tokens, r.lengths

    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= len(devices)]
    base_rate = None
    rng = np.random.default_rng(0)
    for n in sizes:
        plan = make_mesh_plan(MeshConfig(num_devices=n), devices=devices[:n])
        fn = plan.shard_decode_fn(program)
        b = args.chunks_per_device * n
        sig = jnp.asarray(rng.normal(size=(b, clen)).astype(np.float32))
        lens = jnp.full((b,), clen, jnp.int32)
        params_r = plan.replicate(params)
        batch = plan.shard_batch({"s": sig, "l": lens})
        jax.block_until_ready(fn(params_r, batch["s"], batch["l"]))  # compile
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = fn(params_r, batch["s"], batch["l"])
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.repeats
        rate = b * clen / dt / 1e3  # ksamples/s
        per_chip = rate / n
        if base_rate is None:
            base_rate = per_chip
        print(json.dumps({
            "metric": "scaling_sweep",
            "n_devices": n,
            "ksamples_per_sec": round(rate, 1),
            "ksamples_per_sec_per_chip": round(per_chip, 1),
            "efficiency_vs_1chip": round(per_chip / base_rate, 3),
            "virtual": bool(args.virtual),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
