"""Warm-start a topology variant of the committed flagship.

Round-5 capacity sweep (VERDICT r4 weak #5: no d_model/layers/ffn sweep
at measured serving cost has ever been run): builds a `train --init-npz`
warm start for an arbitrary ModelConfig field override, copying every
leaf whose path+shape matches the source flagship (the k-mer warm-start
machinery, scripts/make_kmer_flagship.convert_params) and freshly
initializing the rest.

Note the enc_heads variants copy 100% of leaves — the q/k/v/o
projections are (D, D) regardless of head count; only the head
*partition* of those matrices changes, which finetuning adapts.  Fewer,
wider heads are also a serving-kernel lever: the flash kernel's per-head
QK/PV dots at Dh=32 pad their narrow dims to the 128-wide MXU, and the
8 per-head (S, S) softmaxes are its VPU cost — enc_heads=4 halves both
(docs/PERF.md round-5 floor analysis).

Usage:
  python scripts/make_variant.py --out runs/h4_init --set enc_heads=4
  python scripts/make_variant.py --out runs/e8_init --set enc_layers=8
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_kmer_flagship import convert_params  # noqa: E402


def parse_override(s: str):
    k, v = s.split("=", 1)
    try:
        v = int(v)
    except ValueError:
        try:
            v = float(v)
        except ValueError:
            pass
    return k, v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="bench_results/flagship_params.npz")
    ap.add_argument("--out", required=True)
    ap.add_argument("--set", action="append", required=True,
                    help="ModelConfig field override, e.g. enc_heads=4")
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--lr", type=float, default=2e-4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from nanodecoder_tpu.config import Config
    from nanodecoder_tpu.models.model import init_model, param_count
    from nanodecoder_tpu.train.checkpoint import load_params_npz, save_params_npz

    cfg_json = os.path.join(os.path.dirname(args.src), "config.json")
    with open(cfg_json) as f:
        config = Config.from_json(f.read())
    overrides = dict(parse_override(s) for s in args.set)
    model = dataclasses.replace(config.model, **overrides)
    config = dataclasses.replace(
        config,
        model=model,
        train=dataclasses.replace(
            config.train, train_steps=args.steps, learning_rate=args.lr,
            lr_schedule="cosine", warmup_steps=500),
    )

    src_params = load_params_npz(
        args.src, init_model(jax.random.PRNGKey(0),
                             Config.from_json(open(cfg_json).read()).model))
    template = init_model(jax.random.PRNGKey(1), model)
    params, n_copied, n_fresh = convert_params(src_params, template)
    os.makedirs(args.out, exist_ok=True)
    save_params_npz(os.path.join(args.out, "params.npz"), params)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        f.write(config.to_json())
    print(f"{args.out}: {param_count(params)/1e6:.2f}M params, "
          f"{n_copied} leaves copied, {n_fresh} fresh, overrides={overrides}")


if __name__ == "__main__":
    main()
