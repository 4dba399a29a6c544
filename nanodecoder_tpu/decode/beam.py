"""Vectorized on-device beam search.

Reference analog: onmt/translate/beam_search.py `BeamSearch.advance` /
`update_finished` (SURVEY.md §3.5) — per step: add cumulative scores,
apply length penalty, topk over beam*vocab, mark EOS, reorder the
decoder cache by beam origin.  The reference runs this in Python with a
device sync per token.

TPU-first re-design: the classic alive/finished vectorized formulation
(PAPERS.md: vectorized beam search for encoder-decoder ASR; also the
standard JAX NMT pattern).  All beams of all chunks live in one
(B*K)-row device batch; each step does ONE fused program:

  log-prob add -> top_k(2K) over K*V -> split alive/finished ->
  gather sequences + KV caches by beam origin.

2K candidates guarantee K non-EOS continuations always exist.  The
whole loop is a `lax.while_loop` with an admissible early-stop bound
(best achievable alive score vs worst kept finished score).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nanodecoder_tpu.config import DecodeConfig, ModelConfig
from nanodecoder_tpu.decode.penalties import coverage_penalty, length_penalty
from nanodecoder_tpu.models.model import (decode_step, init_decode_state,
                                          reorder_decode_state_beam)
from nanodecoder_tpu.vocab import BOS_ID, EOS_ID, PAD_ID

NEG_INF = -1.0e9


class BeamResult(NamedTuple):
    tokens: jnp.ndarray   # (B, K, max_len) int32 — best-first hypotheses
    lengths: jnp.ndarray  # (B, K) int32 — emitted tokens incl. EOS
    scores: jnp.ndarray   # (B, K) f32 — length-penalized log-prob
    finished: jnp.ndarray  # (B, K) bool — hypothesis ended with EOS


def _gather_beams(x, idx):
    """x: (B, K_in, ...), idx: (B, K_out) -> (B, K_out, ...)."""
    return jax.vmap(lambda row, i: row[i])(x, idx)


def beam_decode(params, cfg: ModelConfig, dcfg: DecodeConfig,
                memory, mem_lengths) -> BeamResult:
    """Beam-search decode a memory-bank batch.  memory: (B, S, D)."""
    b = memory.shape[0]
    k = dcfg.beam_size
    v = cfg.vocab_size
    tmax = cfg.max_decode_len

    # Tile encoder outputs beam-wise: row b*K + j is beam j of chunk b.
    mem_t = jnp.repeat(memory, k, axis=0)
    len_t = jnp.repeat(mem_lengths, k, axis=0)
    state0 = init_decode_state(params, cfg, mem_t, len_t)
    s = memory.shape[1]

    # Coverage penalty needs per-hypothesis accumulated cross-attention
    # mass; the Pallas attention kernel never materializes the
    # probabilities, so coverage mode runs the XLA attention path and
    # the lax.top_k advance (reference: PenaltyBuilder coverage_wu /
    # coverage_summary applied at hypothesis finalization).
    need_cov = dcfg.coverage_penalty != "none" and dcfg.beta != 0.0
    use_fused = dcfg.use_pallas and not need_cov

    init = dict(
        state=state0,
        cur=jnp.full((b * k,), BOS_ID, jnp.int32),
        alive_seq=jnp.full((b, k, tmax), PAD_ID, jnp.int32),
        # Beam 0 starts at 0, the rest at -inf so step 0 picks distinct tokens.
        alive_scores=jnp.tile(
            jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)])[None, :],
            (b, 1),
        ).astype(jnp.float32),
        fin_seq=jnp.full((b, k, tmax), PAD_ID, jnp.int32),
        fin_scores=jnp.full((b, k), NEG_INF, jnp.float32),
        fin_lengths=jnp.zeros((b, k), jnp.int32),
        fin_flags=jnp.zeros((b, k), jnp.bool_),
        cov=jnp.zeros((b, k, s if need_cov else 1), jnp.float32),
        t=jnp.zeros((), jnp.int32),
    )

    max_pen = length_penalty(tmax, dcfg.length_penalty, dcfg.alpha)

    def cond(c):
        # Best score any alive beam could still reach (log-probs only
        # decrease; penalty divisor is max at tmax for negative scores).
        best_alive_bound = c["alive_scores"][:, 0] / max_pen
        worst_finished = jnp.min(
            jnp.where(c["fin_flags"], c["fin_scores"], NEG_INF), axis=1
        )
        done = jnp.all(worst_finished >= best_alive_bound)
        return jnp.logical_and(c["t"] < tmax, ~done)

    def body(c):
        t = c["t"]
        if need_cov:
            log_probs, _attn, attn_probs, state = decode_step(
                params, cfg, c["cur"], c["state"], return_attn=True
            )
        else:
            log_probs, _attn, state = decode_step(params, cfg, c["cur"], c["state"])
            attn_probs = None
        if dcfg.min_len > 0:
            # Reference parity (translate -min_length): EOS is not a
            # legal continuation before min_len tokens.
            log_probs = jnp.where(
                (t < dcfg.min_len)
                & (jnp.arange(v)[None, :] == EOS_ID),
                NEG_INF, log_probs,
            )
        lp = log_probs.reshape(b, k, v)
        pen = length_penalty(t + 1, dcfg.length_penalty, dcfg.alpha)

        # ---- advance: top-2K candidates, new alive set, merged
        # finished set.  The Pallas kernel fuses all three selections
        # into one program; lax.top_k's sort-based TPU lowering made
        # the three separate calls ~0.9 ms/step (measured b=32 K=5).
        if use_fused:
            from nanodecoder_tpu.ops.beam_step import beam_advance

            top_ids, new_alive_scores, alive_idx, new_fin_scores, fin_idx = (
                beam_advance(
                    c["alive_scores"], lp, c["fin_scores"], pen, k, v, EOS_ID,
                    interpret=jax.default_backend() != "tpu",
                )
            )
            tok = (top_ids % v).astype(jnp.int32)
            is_eos = tok == EOS_ID
            origin = top_ids // v
            cov_cand = c["cov"][:, :1]  # unused placeholder
            cov_pen_cand = jnp.zeros((b, 2 * k), jnp.float32)
        else:
            cand = c["alive_scores"][:, :, None] + lp   # (B, K, V)
            flat = cand.reshape(b, k * v)
            top_scores, top_ids = jax.lax.top_k(flat, 2 * k)  # (B, 2K)
            tok = (top_ids % v).astype(jnp.int32)
            is_eos = tok == EOS_ID
            origin = top_ids // v
            alive_cand = jnp.where(is_eos, NEG_INF, top_scores)
            new_alive_scores, alive_idx = jax.lax.top_k(alive_cand, k)  # (B, K)
            if need_cov:
                # Candidate coverage = origin's accumulated mass + this
                # step's attention row of the origin beam.
                cov_step = c["cov"] + attn_probs.reshape(b, k, -1)
                cov_cand = _gather_beams(cov_step, origin)      # (B, 2K, S)
                cov_pen_cand = coverage_penalty(
                    cov_cand, dcfg.coverage_penalty, dcfg.beta)  # (B, 2K)
            else:
                cov_cand = c["cov"][:, :1]
                cov_pen_cand = jnp.zeros((b, 2 * k), jnp.float32)
            new_fin_cand = jnp.where(
                is_eos, top_scores / pen - cov_pen_cand, NEG_INF)  # (B, 2K)
            all_scores = jnp.concatenate([c["fin_scores"], new_fin_cand], axis=1)
            new_fin_scores, fin_idx = jax.lax.top_k(all_scores, k)  # idx in [0,3K)

        cand_seq = _gather_beams(c["alive_seq"], origin)  # (B, 2K, T)
        cand_seq = jax.lax.dynamic_update_slice_in_dim(
            cand_seq, tok[:, :, None], t, axis=2
        )

        # ---- new alive: best K non-EOS candidates ----
        new_alive_seq = _gather_beams(cand_seq, alive_idx)
        alive_origin = jnp.take_along_axis(origin, alive_idx, axis=1)  # (B, K)
        new_cur = jnp.take_along_axis(tok, alive_idx, axis=1).reshape(-1)
        new_cov = _gather_beams(cov_cand, alive_idx) if need_cov else c["cov"]

        # ---- reorder decoder state rows by beam origin ----
        # Block-diagonal one-hot matmul, not a leading-dim gather (TPU
        # gathers on the cache's row axis are ~3x slower — measured).
        state = reorder_decode_state_beam(state, alive_origin)

        # ---- merge newly finished into the finished set ----
        all_seq = jnp.concatenate([c["fin_seq"], cand_seq], axis=1)
        all_len = jnp.concatenate(
            [c["fin_lengths"], jnp.full((b, 2 * k), t + 1, jnp.int32)], axis=1
        )
        all_flags = jnp.concatenate([c["fin_flags"], is_eos], axis=1)
        return dict(
            state=state,
            cur=new_cur,
            alive_seq=new_alive_seq,
            alive_scores=new_alive_scores,
            fin_seq=_gather_beams(all_seq, fin_idx),
            fin_scores=new_fin_scores,
            fin_lengths=jnp.take_along_axis(all_len, fin_idx, axis=1),
            fin_flags=jnp.take_along_axis(all_flags, fin_idx, axis=1),
            cov=new_cov,
            t=t + 1,
        )

    out = jax.lax.while_loop(cond, body, init)

    # Rows with no finished hypothesis fall back to the best alive beam
    # (length-penalized at tmax), matching reference behavior when no
    # EOS is emitted within max_len.
    none_finished = ~jnp.any(out["fin_flags"], axis=1)  # (B,)
    alive_pen_scores = out["alive_scores"] / max_pen
    if need_cov:
        alive_pen_scores = alive_pen_scores - coverage_penalty(
            out["cov"], dcfg.coverage_penalty, dcfg.beta)
    sel = none_finished[:, None]
    fin_seq = jnp.where(sel[:, :, None], out["alive_seq"], out["fin_seq"])
    fin_scores = jnp.where(sel, alive_pen_scores, out["fin_scores"])
    fin_lengths = jnp.where(sel, jnp.full((b, k), tmax, jnp.int32), out["fin_lengths"])
    fin_flags = jnp.where(sel, jnp.zeros((b, k), jnp.bool_), out["fin_flags"])
    return BeamResult(tokens=fin_seq, lengths=fin_lengths, scores=fin_scores,
                      finished=fin_flags)
