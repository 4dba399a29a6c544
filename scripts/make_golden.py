"""Regenerate the golden-parity fixtures (SURVEY.md §4 consequence 3).

With the reference unavailable (empty mount), the parity gate is
self-referential: fixed simulator reads are basecalled with the
committed flagship checkpoint on CPU in f32 parity mode, and the exact
output strings are stored.  Any future change that flips a single base
on these reads fails tests/test_golden.py.

    python scripts/make_golden.py   # writes tests/golden/flagship_golden.json
"""

from __future__ import annotations

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import dataclasses

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from nanodecoder_tpu.config import Config
from nanodecoder_tpu.decode.translator import Translator
from nanodecoder_tpu.io.fast5 import RawRead
from nanodecoder_tpu.models.model import init_model
from nanodecoder_tpu.train.checkpoint import load_params_npz
from nanodecoder_tpu.train.data import SimSpec, simulate_read

GOLDEN_READS = [(101, 900), (202, 2500), (303, 5200)]  # (seed, n_bases)


def golden_reads():
    spec = SimSpec()
    levels = spec.level_table()
    out = []
    for seed, n in GOLDEN_READS:
        rng = np.random.default_rng(seed)
        seq, sig = simulate_read(rng, n, spec, levels)
        out.append((f"golden_{seed}", seq, sig))
    return out


def main() -> int:
    npz = os.path.join(REPO, "bench_results", "flagship_params.npz")
    if not os.path.exists(npz):
        print("no flagship checkpoint at", npz)
        return 1
    with open(os.path.join(REPO, "bench_results", "config.json")) as f:
        config = Config.from_json(f.read())
    # f32 parity mode (SURVEY.md §7 R2): full-precision compute AND a
    # full-precision H2D wire, so the goldens are invariant to the
    # serving wire default (int8/int6/...) in config.json.
    config = dataclasses.replace(
        config,
        model=dataclasses.replace(config.model, compute_dtype="float32"),
        decode=dataclasses.replace(config.decode, h2d_dtype="float32"),
    )
    params = load_params_npz(npz, init_model(jax.random.PRNGKey(0), config.model))
    tr = Translator(params, config)

    from nanodecoder_tpu.native import read_identity

    golden = {"config": "flagship/f32/greedy", "reads": {}}
    for rid, true_seq, sig in golden_reads():
        bc = tr.basecall_read(RawRead(rid, sig, "sim"))
        ident = read_identity(bc.sequence, true_seq)
        golden["reads"][rid] = {
            "sequence": bc.sequence,
            "n_true_bases": len(true_seq),
            "identity": round(ident, 4),
        }
        print(f"{rid}: {len(bc.sequence)} bases called / {len(true_seq)} true, "
              f"identity {ident:.4f}")
    out_path = os.path.join(REPO, "tests", "golden", "flagship_golden.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(golden, f, indent=1)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
