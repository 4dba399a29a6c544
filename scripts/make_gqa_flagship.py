"""Convert an MHA flagship checkpoint to GQA/MQA by averaging KV heads.

The decode loop is KV-cache-bandwidth-bound (docs/PERF.md roofline);
dec_kv_heads < dec_heads divides that traffic by the group size.  The
K/V projection weights of each decoder layer (self + cross) are
head-block-averaged into the reduced KV heads — a warm start that a
short finetune recovers from, instead of the ~26k-step from-scratch
train the k=3 flagship needed.

Usage:
  python scripts/make_gqa_flagship.py \
      --src bench_results/flagship_params.npz --kv-heads 1 --out gqa_init
writes <out>/params.npz + <out>/config.json (train --init-npz consumes
them).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_params(params, src_cfg, tgt_cfg):
    """Head-average the decoder K/V projections: (D, H*dh) ->
    (D, Hk*dh) by meaning each KV group's head blocks.  Only the
    transformer decoder's self_attn/cross_attn k/v change; everything
    else passes through."""
    import jax.numpy as jnp

    h = src_cfg.dec_heads
    hk = tgt_cfg.dec_kv
    dh = src_cfg.d_model // h
    g = h // hk

    def shrink(p):
        w = p["w"]
        d_in = w.shape[0]
        w2 = w.reshape(d_in, hk, g, dh).mean(axis=2).reshape(d_in, hk * dh)
        out = {"w": w2}
        if "b" in p:
            out["b"] = p["b"].reshape(hk, g, dh).mean(axis=1).reshape(hk * dh)
        return out

    dec = params["decoder"]
    new_layers = []
    for layer in dec["layers"]:
        new_layers.append({
            **layer,
            "self_attn": {**layer["self_attn"],
                          "k": shrink(layer["self_attn"]["k"]),
                          "v": shrink(layer["self_attn"]["v"])},
            "cross_attn": {**layer["cross_attn"],
                           "k": shrink(layer["cross_attn"]["k"]),
                           "v": shrink(layer["cross_attn"]["v"])},
        })
    return {**params, "decoder": {**dec, "layers": new_layers}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="bench_results/flagship_params.npz")
    ap.add_argument("--kv-heads", type=int, default=1)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from nanodecoder_tpu.cli.common import load_params_and_config
    from nanodecoder_tpu.train.checkpoint import save_params_npz

    params, config = load_params_and_config(args.src)
    tgt_model = dataclasses.replace(config.model, dec_kv_heads=args.kv_heads)
    tgt_config = dataclasses.replace(config, model=tgt_model)
    p2 = convert_params(params, config.model, tgt_model)
    os.makedirs(args.out, exist_ok=True)
    save_params_npz(os.path.join(args.out, "params.npz"), p2)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        f.write(tgt_config.to_json())
    print(json.dumps({"out": args.out, "kv_heads": args.kv_heads}))


if __name__ == "__main__":
    main()
