"""Warm-start a flagship at a DIFFERENT k-mer vocabulary.

Each decode step emits k bases, so raising k cuts the dominant decode
step count ~proportionally (docs/PERF.md: the k=1 -> k=3 swap delivered
3.1x end-to-end).  The conv front-end, encoder, and decoder attention /
FFN blocks are vocabulary-independent — only the target embedding and
the generator head change shape.  This script copies every leaf whose
path+shape matches the source checkpoint and freshly initializes the
rest (embedding + generator), producing a `train --init-npz` warm start
that a short finetune completes (vs the ~26k-step from-scratch train).

Usage:
  python scripts/make_kmer_flagship.py \
      --src bench_results/flagship_params.npz --k 4 --out k4_init \
      [--max-decode-len 96]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_params(src_params, tgt_template):
    """Copy src leaves into the target structure where path+shape match;
    keep the target's fresh init elsewhere.  Returns (params, n_copied,
    n_fresh)."""
    import jax

    src_flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(src_params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        src_flat[key] = leaf
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(tgt_template)
    new_leaves = []
    n_copied = n_fresh = 0
    for kp, leaf in leaves_with_path:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        src = src_flat.get(key)
        if src is not None and src.shape == leaf.shape:
            new_leaves.append(src.astype(leaf.dtype))
            n_copied += 1
        else:
            new_leaves.append(leaf)
            n_fresh += 1
    return jax.tree_util.tree_unflatten(treedef, new_leaves), n_copied, n_fresh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="bench_results/flagship_params.npz")
    ap.add_argument("--k", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-decode-len", type=int, default=0,
                    help="decode-loop bound for the new k (0 = scale the "
                         "source bound by src_k/new_k, rounded up to 8)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from nanodecoder_tpu.cli.common import load_params_and_config
    from nanodecoder_tpu.models.model import init_model
    from nanodecoder_tpu.train.checkpoint import save_params_npz
    from nanodecoder_tpu.vocab import vocab_size_for

    params, config = load_params_and_config(args.src)
    tmax = args.max_decode_len or -((-config.model.max_decode_len
                                     * config.model.kmer_k // args.k) // 8) * 8
    tgt_model = dataclasses.replace(
        config.model, kmer_k=args.k, vocab_size=vocab_size_for(args.k),
        max_decode_len=tmax)
    tgt_config = dataclasses.replace(
        config, model=tgt_model,
        decode=dataclasses.replace(config.decode, max_len=tmax))
    template = init_model(jax.random.PRNGKey(0), tgt_model)
    p2, n_copied, n_fresh = convert_params(params, template)
    os.makedirs(args.out, exist_ok=True)
    save_params_npz(os.path.join(args.out, "params.npz"), p2)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        f.write(tgt_config.to_json())
    print(json.dumps({"out": args.out, "k": args.k,
                      "vocab_size": tgt_model.vocab_size,
                      "max_decode_len": tmax,
                      "copied": n_copied, "fresh": n_fresh}))


if __name__ == "__main__":
    main()
