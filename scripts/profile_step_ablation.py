"""Ablate decode-step components on device: run a 320-iteration
fori_loop whose body contains only selected parts of the decoder step,
and report marginal per-step cost per component. bf16, batch from
--batch. Components are cumulative variants mirroring
models/decoder.transformer_decoder_step."""
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
from nanodecoder_tpu.models import modules as nn
from nanodecoder_tpu.models.decoder import init_transformer_cache
from nanodecoder_tpu.models.model import encode, init_model
from nanodecoder_tpu.train.checkpoint import load_params_npz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=320)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--only", default="", help="comma-separated variant names")
    args = ap.parse_args()

    with open("bench_results/config.json") as f:
        config = Config.from_json(f.read())
    mcfg = dataclasses.replace(config.model, compute_dtype=args.dtype)
    params = load_params_npz("bench_results/flagship_params.npz",
                             init_model(jax.random.PRNGKey(0), mcfg))
    b, clen = args.batch, config.signal.chunk_len
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((b, clen)), jnp.float32)
    lens = jnp.full((b,), clen, jnp.int32)
    enc = jax.jit(lambda p, s, l: encode(p, mcfg, s, l))
    memory, mem_len = enc(params, sig, lens)
    np.asarray(mem_len)

    dp = params["decoder"]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    def make_loop(which):
        if which == ("fusedlayer",):
            from nanodecoder_tpu.ops.decoder_layer import (decoder_layer_step,
                                                           fuse_layer_weights)

            fusedw = [fuse_layer_weights(layer, dtype) for layer in dp["layers"]]
            h, dh = mcfg.dec_heads, mcfg.d_model // mcfg.dec_heads
            d = h * dh

            def body_fused(i, carry):
                y1, state = carry
                step = state["step"]
                y = y1[:, 0, :]
                new_layers = []
                for cache, wf in zip(state["layers"], fusedw):
                    t = cache["self_k"].shape[1]
                    s = cache["cross_k"].shape[1]
                    y, k1, v1, amax = decoder_layer_step(
                        y, cache["self_k"].reshape(b, t, d),
                        cache["self_v"].reshape(b, t, d),
                        cache["cross_k"].reshape(b, s, d),
                        cache["cross_v"].reshape(b, s, d),
                        step, state["mem_lengths"], wf, mcfg.dec_heads)
                    self_k = jax.lax.dynamic_update_slice_in_dim(
                        cache["self_k"], k1.reshape(b, 1, h, dh), step, axis=1)
                    self_v = jax.lax.dynamic_update_slice_in_dim(
                        cache["self_v"], v1.reshape(b, 1, h, dh), step, axis=1)
                    new_layers.append({**cache, "self_k": self_k, "self_v": self_v})
                out = nn.layer_norm(dp["ln_out"], y[:, None, :])
                state = {**state, "layers": new_layers, "step": step + 1}
                y_next = out + jnp.sum(out, axis=-1, keepdims=True) * 1e-9
                return (y_next, state)

            def loop_fused(p, memory, mem_len):
                cache = init_transformer_cache(dp, mcfg, memory, mem_len, b, dtype)
                cache.pop("fusedw", None)
                y0 = jnp.zeros((b, 1, mcfg.d_model), dtype)
                yN, st = jax.lax.fori_loop(0, args.steps, body_fused, (y0, cache))
                return jnp.sum(yN.astype(jnp.float32))

            return jax.jit(loop_fused)

        def body_fn(i, carry):
            y1, state = carry
            step = state["step"]
            tmax = mcfg.max_decode_len
            pos = jnp.arange(tmax)
            self_mask = (pos <= step)[None, None, None, :]
            new_layers = []
            from nanodecoder_tpu.models.decoder import _attn_step
            self_valid = jnp.full((b,), step + 1, jnp.int32)
            for layer, cache in zip(dp["layers"], state["layers"]):
                if "self" in which:
                    h = nn.layer_norm(layer["ln1"], y1)
                    k1 = nn._split_heads(nn.dense(layer["self_attn"]["k"], h), mcfg.dec_heads)
                    v1 = nn._split_heads(nn.dense(layer["self_attn"]["v"], h), mcfg.dec_heads)
                    self_k = jax.lax.dynamic_update_slice_in_dim(cache["self_k"], k1, step, axis=1)
                    self_v = jax.lax.dynamic_update_slice_in_dim(cache["self_v"], v1, step, axis=1)
                    # Production (models/decoder.py): self-attention is
                    # ALWAYS the XLA path — VMEM-resident loop carries.
                    a, _, _ = _attn_step(layer["self_attn"], mcfg.dec_heads, h, self_k,
                                         self_v, self_mask, self_valid, False)
                    y1 = y1 + a
                    cache = {**cache, "self_k": self_k, "self_v": self_v}
                if "dus_only" in which:
                    h = nn.layer_norm(layer["ln1"], y1)
                    k1 = nn._split_heads(nn.dense(layer["self_attn"]["k"], h), mcfg.dec_heads)
                    v1 = nn._split_heads(nn.dense(layer["self_attn"]["v"], h), mcfg.dec_heads)
                    self_k = jax.lax.dynamic_update_slice_in_dim(cache["self_k"], k1, step, axis=1)
                    self_v = jax.lax.dynamic_update_slice_in_dim(cache["self_v"], v1, step, axis=1)
                    y1 = y1 + self_k[:, 0:1, :, :].reshape(y1.shape) * 0.0
                    cache = {**cache, "self_k": self_k, "self_v": self_v}
                if "cross" in which:
                    h = nn.layer_norm(layer["ln2"], y1)
                    a, _, _ = _attn_step(layer["cross_attn"], mcfg.dec_heads, h,
                                         cache["cross_k"], cache["cross_v"],
                                         state["cross_mask"], state["mem_lengths"],
                                         args.pallas)
                    y1 = y1 + a
                if "ffn" in which:
                    h = nn.layer_norm(layer["ln3"], y1)
                    y1 = y1 + nn.ffn(layer["ffn"], h)
                new_layers.append(cache)
            out = nn.layer_norm(dp["ln_out"], y1)
            state = {**state, "layers": new_layers, "step": step + 1}
            # tiny generator-ish readout to keep everything live
            y_next = out + jnp.sum(out, axis=-1, keepdims=True) * 1e-9
            return (y_next, state)

        def loop(p, memory, mem_len):
            cache = init_transformer_cache(dp, mcfg, memory, mem_len, b, dtype)
            y0 = jnp.zeros((b, 1, mcfg.d_model), dtype)
            yN, st = jax.lax.fori_loop(0, args.steps, body_fn, (y0, cache))
            return jnp.sum(yN.astype(jnp.float32))

        return jax.jit(loop)

    variants = [
        ("empty", ()),
        ("dus_only", ("dus_only",)),
        ("self", ("self",)),
        ("cross", ("cross",)),
        ("ffn", ("ffn",)),
        ("self+cross", ("self", "cross")),
        ("full", ("self", "cross", "ffn")),
        ("fusedlayer", ("fusedlayer",)),
    ]
    if args.only:
        variants = [vv for vv in variants if vv[0] in args.only.split(",")]
    results = {}
    for name, which in variants:
        f = make_loop(which)
        _ = float(f(params, memory, mem_len))  # compile+run
        t0 = time.perf_counter()
        _ = float(f(params, memory, mem_len))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _i in range(2):
            out = f(params, memory, mem_len)
        _ = float(out)
        t2 = (time.perf_counter() - t0)
        per_step = (t2 - t1) / args.steps
        results[name] = per_step
        print(f"{name:12s}: {per_step*1e6:8.1f} us/step  (1x {t1*1e3:.0f}ms 2x {t2*1e3:.0f}ms)")


if __name__ == "__main__":
    main()
