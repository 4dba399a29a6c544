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


def _beam_topk_kernel(flat_ref, scores_ref, ids_ref, *, n_out: int):
    """Vectorized over the whole batch in ONE grid step: every array is
    (B, K*V) or (B, n_out) — B in sublanes, candidates in lanes (K*V is
    ~40 lanes, far under one vreg row).  Top-n_out by iterative
    max-extraction, ties -> lowest index (torch.topk parity)."""
    bb, n = flat_ref.shape
    flat = flat_ref[:].astype(jnp.float32)                       # (B, N)
    idx = jax.lax.broadcasted_iota(jnp.int32, (bb, n), 1)
    for j in range(n_out):
        m = jnp.max(flat, axis=1, keepdims=True)                 # (B, 1)
        amax = jnp.min(jnp.where(flat >= m, idx, _BIG_I32), axis=1,
                       keepdims=True)                            # (B, 1)
        scores_ref[:, j : j + 1] = m
        ids_ref[:, j : j + 1] = amax
        flat = jnp.where(idx == amax, NEG_INF, flat)


def _extract_top(flat, idx, n_out):
    """Iterative top-n_out over lanes: returns (scores (B, n_out),
    ids (B, n_out)), ties -> lowest index.  Pure jnp — usable inside a
    kernel (unrolled VPU ops) or as the XLA fallback."""
    s_cols, i_cols = [], []
    for _ in range(n_out):
        m = jnp.max(flat, axis=1, keepdims=True)
        amax = jnp.min(jnp.where(flat >= m, idx, _BIG_I32), axis=1, keepdims=True)
        s_cols.append(m)
        i_cols.append(amax)
        flat = jnp.where(idx == amax, NEG_INF, flat)
    return jnp.concatenate(s_cols, axis=1), jnp.concatenate(i_cols, axis=1)


def _beam_advance_kernel(pen_ref, flat_ref, fin_ref, top_ids_ref,
                         alive_s_ref, alive_sel_ref, fin_s_ref, fin_sel_ref,
                         *, k: int, v: int, eos_id: int):
    """Fused beam advance: ONE program computes the top-2K candidates,
    the new alive set (best K non-EOS) and the merged finished set
    (best K of old-finished + newly-finished), replacing three
    lax.top_k calls whose sort-based TPU lowering dominated the beam
    step (~0.9 ms/step measured at b=32, K=5, V=8)."""
    bb, n = flat_ref.shape
    pen = pen_ref[0]
    flat = flat_ref[:].astype(jnp.float32)                       # (B, K*V)
    idx = jax.lax.broadcasted_iota(jnp.int32, (bb, n), 1)
    tops, topi = _extract_top(flat, idx, 2 * k)                  # (B, 2K)
    top_ids_ref[:] = topi

    tok = topi - (topi // v) * v
    is_eos = tok == eos_id
    idx2 = jax.lax.broadcasted_iota(jnp.int32, (bb, 2 * k), 1)

    alive_s, alive_sel = _extract_top(
        jnp.where(is_eos, NEG_INF, tops), idx2, k)
    alive_s_ref[:] = alive_s
    alive_sel_ref[:] = alive_sel

    fin_cand = jnp.where(is_eos, tops / pen, NEG_INF)            # (B, 2K)
    allf = jnp.concatenate([fin_ref[:].astype(jnp.float32), fin_cand], axis=1)
    idx3 = jax.lax.broadcasted_iota(jnp.int32, (bb, 3 * k), 1)
    fin_s, fin_sel = _extract_top(allf, idx3, k)
    fin_s_ref[:] = fin_s
    fin_sel_ref[:] = fin_sel


@functools.partial(jax.jit, static_argnames=("k", "v", "eos_id", "interpret"))
def beam_advance(alive_scores, log_probs, fin_scores, pen, k: int, v: int,
                 eos_id: int, interpret: bool = False):
    """Fused beam-search advance (reference analog: BeamSearch.advance +
    update_finished's candidate selection, SURVEY.md §3.5).

    alive_scores: (B, K) f32; log_probs: (B, K, V) f32;
    fin_scores: (B, K) f32 (length-penalized); pen: scalar f32 — the
    length-penalty divisor at this step.

    Returns (top_ids (B, 2K) into K*V, new_alive_scores (B, K),
    alive_sel (B, K) into 2K, new_fin_scores (B, K),
    fin_sel (B, K) into 3K — j < K is old finished slot j, j >= K is
    new candidate j-K).  Semantics match the pure-XLA fallback in
    decode/beam.py (ties -> lowest index, torch.topk parity)."""
    b = log_probs.shape[0]
    flat = (alive_scores[:, :, None].astype(jnp.float32)
            + log_probs.astype(jnp.float32)).reshape(b, k * v)
    kern = functools.partial(_beam_advance_kernel, k=k, v=v, eos_id=eos_id)
    out_specs = tuple(
        pl.BlockSpec((b, w), lambda: (0, 0), memory_space=pltpu.VMEM)
        for w in (2 * k, k, k, k, k)
    )
    out_shape = (
        jax.ShapeDtypeStruct((b, 2 * k), jnp.int32),
        jax.ShapeDtypeStruct((b, k), jnp.float32),
        jax.ShapeDtypeStruct((b, k), jnp.int32),
        jax.ShapeDtypeStruct((b, k), jnp.float32),
        jax.ShapeDtypeStruct((b, k), jnp.int32),
    )
    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pen (1,) scalar
            pl.BlockSpec((b, k * v), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(pen.reshape(1).astype(jnp.float32), flat,
      fin_scores.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def beam_topk(alive_scores, log_probs, n_out: int, interpret: bool = False):
    """Fused add+topk over the beam*vocab candidates.  See
    beam_topk_reference for semantics.  The score add + reshape stay in
    XLA (they fuse for free); the kernel owns the iterative top-n_out
    extraction.  Single grid step, whole batch in VMEM (rank-1/blocked
    small trailing dims are rejected by the Mosaic lowering — the
    original per-row grid failed at (1, 5) blocks on real TPU)."""
    b, k, v = log_probs.shape
    flat = (alive_scores[:, :, None].astype(jnp.float32)
            + log_probs.astype(jnp.float32)).reshape(b, k * v)
    scores, ids = pl.pallas_call(
        functools.partial(_beam_topk_kernel, n_out=n_out),
        in_specs=[pl.BlockSpec((b, k * v), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((b, n_out), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, n_out), lambda: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_out), jnp.float32),
            jax.ShapeDtypeStruct((b, n_out), jnp.int32),
        ),
        interpret=interpret,
    )(flat)
    return scores, ids
