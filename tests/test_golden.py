"""Golden-parity gate (SURVEY.md §4 consequence 3, §7 R1).

The committed flagship checkpoint must basecall the fixed simulator
reads to EXACTLY the stored strings (CPU, f32 parity mode).  Catches
any semantic drift in normalize/chunk/encoder/decoder/greedy/stitch.
Skips when the checkpoint or fixture is absent (pre-training rounds).
"""

import dataclasses
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPZ = os.path.join(REPO, "bench_results", "flagship_params.npz")
GOLDEN = os.path.join(REPO, "tests", "golden", "flagship_golden.json")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(NPZ) and os.path.exists(GOLDEN)),
    reason="flagship checkpoint / golden fixture not committed yet",
)


@pytest.fixture(scope="module")
def translator():
    import jax

    from nanodecoder_tpu.config import Config
    from nanodecoder_tpu.decode.translator import Translator
    from nanodecoder_tpu.models.model import init_model
    from nanodecoder_tpu.train.checkpoint import load_params_npz

    with open(os.path.join(REPO, "bench_results", "config.json")) as f:
        config = Config.from_json(f.read())
    # f32 parity mode: full-precision compute AND H2D wire, matching
    # scripts/make_golden.py — the gate must not move when the serving
    # wire default (h2d_dtype) changes in config.json.
    config = dataclasses.replace(
        config,
        model=dataclasses.replace(config.model, compute_dtype="float32"),
        decode=dataclasses.replace(config.decode, h2d_dtype="float32"),
    )
    params = load_params_npz(NPZ, init_model(jax.random.PRNGKey(0), config.model))
    return Translator(params, config)


def test_golden_basecalls_exact(translator):
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_golden import golden_reads

    from nanodecoder_tpu.io.fast5 import RawRead

    with open(GOLDEN) as f:
        golden = json.load(f)
    for rid, _true_seq, sig in golden_reads():
        bc = translator.basecall_read(RawRead(rid, sig, "sim"))
        assert bc.sequence == golden["reads"][rid]["sequence"], rid


def test_golden_accuracy_floor():
    """The stored goldens themselves must show the model actually
    learned (edit-distance read identity vs simulator truth)."""
    with open(GOLDEN) as f:
        golden = json.load(f)
    for rid, rec in golden["reads"].items():
        # Floor tracks the flagship's measured band: n=100 min identity
        # 0.9007 (bench_results/identity_r03.jsonl); the three golden
        # reads sit at 0.899-0.919.
        assert rec["identity"] > 0.85, (rid, rec["identity"])
