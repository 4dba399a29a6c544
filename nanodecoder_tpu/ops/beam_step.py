"""Pallas kernel: fused beam-search advance (score add + top-2K).

Reference analog: BeamSearch.advance's score-add + topk(beam*vocab)
(SURVEY.md §3.5) — the per-token host round trip the reference pays.
Here it's one Pallas program per chunk row: add cumulative beam scores
to the step log-probs and extract the top 2K (score, index) pairs by
iterative max-extraction over the K*V lane vector (K*V = 40 for
beam=5 x vocab=8 — the extraction is 2K unrolled VPU reductions, cheap;
the value is fusion, not FLOPs, per SURVEY.md §7 R6).

`beam_topk_reference` (lax.top_k) defines the semantics, including
torch-style lowest-index tie-breaking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
_BIG_I32 = 2**30  # python int literal — jnp scalars would be captured consts


def beam_topk_reference(alive_scores, log_probs, n_out: int):
    """alive_scores: (B, K) f32; log_probs: (B, K, V) f32.
    Returns (scores (B, n_out), ids (B, n_out) int32) of the top
    candidates of alive+lp flattened over (K*V), ties -> lowest index."""
    cand = alive_scores[:, :, None] + log_probs
    b, k, v = cand.shape
    return jax.lax.top_k(cand.reshape(b, k * v), n_out)


def _beam_topk_kernel(alive_ref, lp_ref, scores_ref, ids_ref, *, n_out: int):
    k, v = lp_ref.shape[1], lp_ref.shape[2]
    n = k * v
    alive = alive_ref[:].astype(jnp.float32)          # (1, K)
    lp = lp_ref[0].astype(jnp.float32)                # (K, V)
    cand = alive.reshape(k, 1) + lp                   # (K, V)
    flat = cand.reshape(1, n)                         # (1, K*V) in lanes
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    for j in range(n_out):
        m = jnp.max(flat, axis=1, keepdims=True)      # (1, 1)
        is_max = flat >= m
        amax = jnp.min(jnp.where(is_max, idx, _BIG_I32), axis=1, keepdims=True)
        scores_ref[0, j] = m[0, 0]
        ids_ref[0, j] = amax[0, 0]
        flat = jnp.where(idx == amax, NEG_INF, flat)


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def beam_topk(alive_scores, log_probs, n_out: int, interpret: bool = False):
    """Fused add+topk over the beam*vocab candidates.  See
    beam_topk_reference for semantics."""
    b, k, v = log_probs.shape
    scores, ids = pl.pallas_call(
        functools.partial(_beam_topk_kernel, n_out=n_out),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, v), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_out), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_out), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_out), jnp.float32),
            jax.ShapeDtypeStruct((b, n_out), jnp.int32),
        ),
        interpret=interpret,
    )(alive_scores.astype(jnp.float32), log_probs.astype(jnp.float32))
    return scores, ids
