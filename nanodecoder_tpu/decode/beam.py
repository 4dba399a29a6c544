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
  gather KV caches by beam origin.

2K candidates guarantee K non-EOS continuations always exist.  The
whole loop is a `lax.while_loop` with an admissible early-stop bound
(best achievable alive score vs worst kept finished score).

Sequences are tracked with BACKPOINTERS, not materialized hypothesis
matrices: the loop writes only (B, K) token/origin rows per step
(tok_hist / org_hist) and finished hypotheses store (score, end step,
origin beam).  Full sequences are reconstructed once after the loop by
a reverse scan.  The naive formulation gathered three (B, ~2K, T_max)
sequence matrices per step, which measured ~340 us/step at b=16 K=5 on
the v5e (~30% of the whole beam step) — see docs/PERF.md.
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
    token_log_probs: jnp.ndarray  # (B, K, max_len) f32 — per-token lp
    attn_pos: jnp.ndarray  # (B, K, max_len) int32 — per-token cross-attn
    #                         argmax encoder position (alignment)


# Measured VMEM spill wall (v5e, k=4 MQA flagship, round 4): past
# ~1920 decode rows the K-tiled beam caches spill and throughput drops
# ~33% (b512*K5 = 2560 rows ran 6,387 vs b256's 9,576 ks/s).  A user
# setting batch_chunks_beam above the wall gets a loud warning instead
# of a silent cliff (VERDICT r4 weak #7).
SPILL_WALL_ROWS = 1920


def warn_if_beam_spill(dcfg: DecodeConfig) -> None:
    """Warn once per driver init when the beam row count exceeds the
    measured VMEM spill wall."""
    rows = dcfg.effective_batch_chunks() * dcfg.beam_size
    if rows > SPILL_WALL_ROWS:
        from nanodecoder_tpu.utils.logging import get_logger

        get_logger("beam").warning(
            "beam decode at %d rows (batch %d x K=%d) exceeds the measured "
            "~%d-row VMEM spill wall — expect ~33%% lower throughput; "
            "reduce batch_chunks_beam (the committed sweet spot is 256)",
            rows, dcfg.effective_batch_chunks(), dcfg.beam_size,
            SPILL_WALL_ROWS)


def _gather_beams(x, idx):
    """x: (B, K_in, ...), idx: (B, K_out) -> (B, K_out, ...)."""
    return jax.vmap(lambda row, i: row[i])(x, idx)


def _backtrack(hist, eos_at, start_beam, emit_eos, fin_lp, fin_pos, tmax):
    """Reconstruct sequences (+ per-token log-probs and attention
    positions) from backpointers.

    hist: (B, K, T, 4) f32 — channels (token, origin, log-prob,
    cross-attn position) of alive beam j at step t, packed into ONE
    tensor so the loop writes one slice and this scan gathers once per
    step (four separate (B, K, T) histories cost 4 gathers + 4 DUS per
    step of ~4 us fixed cost each — round-4 beam trace).  Integer
    channels are exact in f32 (tokens < 2^9, positions < 2^11).

    For each output slot (B, S): `eos_at` is the position of the final
    token (EOS for finished hypotheses, one past the last token for
    alive fallbacks), `start_beam` the alive-beam index the path ends
    in, `emit_eos` whether position eos_at holds EOS (whose log-prob /
    position are `fin_lp` / `fin_pos`, recorded at finalization — EOS
    never enters the alive histories).  eos_at = -1 yields an all-PAD
    row.  Returns (tokens, lps, pos), each (B, S, T).
    """
    b, s = eos_at.shape

    def step(cur, t):
        # cur: (B, S) alive-beam index valid for reading step t.
        r4 = jnp.take_along_axis(hist[:, :, t, :], cur[:, :, None], axis=1)
        read = r4[..., 0].astype(jnp.int32)
        nxt = r4[..., 1].astype(jnp.int32)
        lp_read = r4[..., 2]
        pos_read = r4[..., 3].astype(jnp.int32)
        at_eos = (t == eos_at) & emit_eos
        before = t < eos_at
        out = jnp.where(at_eos, EOS_ID,
                        jnp.where(before, read, PAD_ID)).astype(jnp.int32)
        lp_out = jnp.where(at_eos, fin_lp,
                           jnp.where(before, lp_read, 0.0)).astype(jnp.float32)
        pos_out = jnp.where(at_eos, fin_pos,
                            jnp.where(before, pos_read, 0)).astype(jnp.int32)
        cur = jnp.where(before, nxt, start_beam)
        return cur, (out, lp_out, pos_out)

    _, (cols, lp_cols, pos_cols) = jax.lax.scan(
        step, start_beam, jnp.arange(tmax - 1, -1, -1))

    def mv(a):
        return jnp.moveaxis(a[::-1], 0, 2)  # (T,B,S) -> (B,S,T)

    return mv(cols), mv(lp_cols), mv(pos_cols)


def beam_decode(params, cfg: ModelConfig, dcfg: DecodeConfig,
                memory, mem_lengths) -> BeamResult:
    """Beam-search decode a memory-bank batch.  memory: (B, S, D)."""
    b = memory.shape[0]
    k = dcfg.beam_size
    v = cfg.vocab_size
    tmax = cfg.max_decode_len
    # Coverage penalty needs materialized attention probs, which the
    # lean step never returns — run the whole decode (init, steps,
    # reorder) on the unfolded per-layer-cache path in that mode.
    need_cov = dcfg.coverage_penalty != "none" and dcfg.beta != 0.0
    if need_cov and cfg.lean_step:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, lean_step=False)

    # Decode rows: row b*K + j is beam j of chunk b.  Transformer path:
    # cross K/V stay per-chunk (beam-invariant) and the grouped
    # attention kernel serves all K beams from one cache read per step
    # (1/K the dominant HBM traffic).  RNN path: tile the memory
    # beam-wise as the reference does.
    import dataclasses as _dc

    from nanodecoder_tpu.decode.greedy import (decode_stage_lengths,
                                               grow_self_cache)

    staged = (cfg.staged_decode and cfg.lean_step
              and cfg.decoder_type == "transformer")
    stages = decode_stage_lengths(tmax, cfg.stage_schedule) if staged else [tmax]
    if cfg.decoder_type == "transformer":
        state0 = init_decode_state(
            params, _dc.replace(cfg, max_decode_len=stages[0]), memory,
            mem_lengths, beam_k=k)
    else:
        mem_t = jnp.repeat(memory, k, axis=0)
        len_t = jnp.repeat(mem_lengths, k, axis=0)
        state0 = init_decode_state(params, cfg, mem_t, len_t)
    s = memory.shape[1]
    # Lean decode path (folded weights, closure of the loop body); the
    # coverage-penalty path (return_attn) falls back to the unfolded
    # step inside decode_step.
    from nanodecoder_tpu.models.decoder import prepare_decode_params

    params = prepare_decode_params(params, cfg, memory.dtype)

    # Path-indirection reorder (DecodeConfig.path_reorder, default
    # OFF): the self cache stays in write-time frame and the per-step
    # physical permute is replaced by composing the (B, K, T) ancestry
    # map — the lean step gathers its masked self-attention read
    # through it.  Token-exact, but chip-measured 2.2x SLOWER than the
    # physical permute (5,299 vs 11,574 ks/s, round 5): the read-time
    # gather re-materializes the same prefix bytes every step, strided.
    # Kept as an A/B lever; see config.py and docs/PERF.md.
    use_path = (dcfg.path_reorder and cfg.lean_step
                and cfg.decoder_type == "transformer")
    if use_path:
        state0["self_path"] = jnp.zeros((b, k, stages[0]), jnp.int32)

    # Coverage penalty needs per-hypothesis accumulated cross-attention
    # mass; the Pallas attention kernel never materializes the
    # probabilities, so coverage mode runs the XLA attention path and
    # the lax.top_k advance (reference: PenaltyBuilder coverage_wu /
    # coverage_summary applied at hypothesis finalization).
    use_fused = dcfg.use_pallas and not need_cov
    if need_cov and dcfg.use_pallas:
        # Trace-time warning (fires once per compile): this is a real
        # perf cliff — the fused advance kernel AND the Pallas decode
        # attention are both off because coverage needs materialized
        # attention probabilities.
        from nanodecoder_tpu.utils.logging import get_logger

        get_logger("beam").warning(
            "coverage_penalty=%r disables the fused beam kernel and Pallas "
            "attention (needs materialized attention probs) — expect a "
            "slower decode", dcfg.coverage_penalty)

    init = dict(
        state=state0,
        cur=jnp.full((b * k,), BOS_ID, jnp.int32),
        # Beam 0 starts at 0, the rest at -inf so step 0 picks distinct tokens.
        alive_scores=jnp.tile(
            jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)])[None, :],
            (b, 1),
        ).astype(jnp.float32),
        # Backpointer history of the alive set (written, never gathered
        # in-loop): ONE (B, K, T, 4) f32 tensor packing (token, origin,
        # log-prob, attn position) — see _backtrack.
        hist=jnp.zeros((b, k, tmax, 4), jnp.float32),
        # Finished-set metadata; sequences are reconstructed post-loop.
        # fin_scores stays separate (the top_k operand); the five
        # bookkeeping fields are packed (B, K, 5) f32 channels
        # (eos step, parent beam, finished flag, EOS log-prob, EOS attn
        # position) so the per-step merge is ONE gather instead of five.
        fin_scores=jnp.full((b, k), NEG_INF, jnp.float32),
        fin_meta=jnp.concatenate([
            jnp.full((b, k, 1), -1.0, jnp.float32),   # eos step
            jnp.zeros((b, k, 4), jnp.float32),
        ], axis=2),
        cov=jnp.zeros((b, k, s if need_cov else 1), jnp.float32),
        t=jnp.zeros((), jnp.int32),
    )

    max_pen = length_penalty(tmax, dcfg.length_penalty, dcfg.alpha)

    def make_cond(stage_t):
        def cond(c):
            # Best score any alive beam could still reach (log-probs
            # only decrease; penalty divisor is max at tmax for
            # negative scores).
            best_alive_bound = c["alive_scores"][:, 0] / max_pen
            finished = c["fin_meta"][..., 2] > 0.5
            worst_finished = jnp.min(
                jnp.where(finished, c["fin_scores"], NEG_INF), axis=1
            )
            done = jnp.all(worst_finished >= best_alive_bound)
            return jnp.logical_and(c["t"] < stage_t, ~done)
        return cond

    def make_body(scfg):
      def body(c):
        t = c["t"]
        if need_cov:
            log_probs, step_attn, attn_probs, state = decode_step(
                params, scfg, c["cur"], c["state"], return_attn=True
            )
        else:
            log_probs, step_attn, state = decode_step(params, scfg, c["cur"], c["state"])
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

        # ---- per-candidate token log-prob + attention position ----
        # lp of candidate (origin o, token w) is just lp[b, o, w] — a
        # flat gather by top_ids, valid for both the fused-kernel and
        # XLA paths (the kernel returns candidate *cum* scores only).
        cand_lp = jnp.take_along_axis(lp.reshape(b, k * v), top_ids, axis=1)
        attn_bk = step_attn.reshape(b, k)
        cand_pos = jnp.take_along_axis(attn_bk, origin, axis=1)       # (B, 2K)

        # ---- new alive: best K non-EOS candidates.  The four
        # per-candidate channels are packed into ONE (B, 2K, 4) f32
        # tensor so selection is a single gather and the history write
        # a single dynamic-update-slice (integer channels exact in
        # f32; 8 latency-bound ~4 us ops -> 2, round-4 beam trace).
        cand_pack = jnp.stack([
            tok.astype(jnp.float32), origin.astype(jnp.float32),
            cand_lp, cand_pos.astype(jnp.float32)], axis=2)
        alive_pack = jnp.take_along_axis(
            cand_pack, alive_idx[:, :, None], axis=1)      # (B, K, 4)
        alive_origin = alive_pack[..., 1].astype(jnp.int32)
        new_cur = alive_pack[..., 0].astype(jnp.int32).reshape(-1)
        hist = jax.lax.dynamic_update_slice(
            c["hist"], alive_pack[:, :, None, :],
            (0, 0, t, 0))
        new_cov = _gather_beams(cov_cand, alive_idx) if need_cov else c["cov"]

        # ---- reorder decoder state rows by beam origin ----
        if use_path:
            # Compose ancestry instead of permuting the cache: new beam
            # j inherits parent o(j)'s path for steps < t and records
            # slot o(j) as the writer of its step-t row.
            path = jnp.take_along_axis(
                state["self_path"], alive_origin[:, :, None], axis=1)
            path = jax.lax.dynamic_update_slice(
                path, alive_origin[:, :, None], (0, 0, t))
            state = {**state, "self_path": path}
        else:
            state = reorder_decode_state_beam(state, alive_origin)

        # ---- merge newly finished into the finished set: ONE gather
        # over the packed (B, 3K, 5) metadata channels ----
        cand_meta = jnp.stack([
            jnp.full((b, 2 * k), t, jnp.float32),          # eos step
            origin.astype(jnp.float32),                     # parent beam
            is_eos.astype(jnp.float32),                     # finished flag
            cand_lp,                                        # EOS log-prob
            cand_pos.astype(jnp.float32)], axis=2)          # EOS attn pos
        all_meta = jnp.concatenate([c["fin_meta"], cand_meta], axis=1)
        return dict(
            state=state,
            cur=new_cur,
            alive_scores=new_alive_scores,
            hist=hist,
            fin_scores=new_fin_scores,
            fin_meta=jnp.take_along_axis(all_meta, fin_idx[:, :, None],
                                         axis=1),
            cov=new_cov,
            t=t + 1,
        )
      return body

    out = init
    for _i, _st in enumerate(stages):
        out = jax.lax.while_loop(
            make_cond(_st),
            make_body(_dc.replace(cfg, max_decode_len=_st)), out)
        if _i + 1 < len(stages):
            out = {**out, "state": grow_self_cache(out["state"],
                                                   stages[_i + 1])}
    t_end = out["t"]
    meta = out["fin_meta"]
    m_step = meta[..., 0].astype(jnp.int32)
    m_origin = meta[..., 1].astype(jnp.int32)
    m_flags = meta[..., 2] > 0.5
    m_lp = meta[..., 3]
    m_pos = meta[..., 4].astype(jnp.int32)

    # Rows with no finished hypothesis fall back to the best alive beams
    # (length-penalized at tmax), matching reference behavior when no
    # EOS is emitted within max_len.
    none_finished = ~jnp.any(m_flags, axis=1)  # (B,)
    alive_pen_scores = out["alive_scores"] / max_pen
    if need_cov:
        alive_pen_scores = alive_pen_scores - coverage_penalty(
            out["cov"], dcfg.coverage_penalty, dcfg.beta)
    sel = none_finished[:, None]                         # (B, 1)
    beam_ids = jnp.tile(jnp.arange(k)[None, :], (b, 1))  # (B, K)

    # Per output slot: final-token position, path-end beam, EOS flag.
    # Unfilled finished slots (flags False, step -1) become all-PAD.
    eos_at = jnp.where(sel, t_end, jnp.where(m_flags, m_step, -1))
    start_beam = jnp.where(sel, beam_ids, m_origin)
    emit_eos = jnp.where(sel, False, m_flags)

    tokens, token_lps, attn_pos = _backtrack(
        out["hist"], eos_at, start_beam, emit_eos,
        jnp.where(sel, 0.0, m_lp),
        jnp.where(sel, 0, m_pos), tmax)
    fin_scores = jnp.where(sel, alive_pen_scores, out["fin_scores"])
    fin_lengths = jnp.where(
        sel, jnp.full((b, k), tmax, jnp.int32),
        jnp.where(m_flags, m_step + 1, 0))
    fin_flags = jnp.where(sel, jnp.zeros((b, k), jnp.bool_), m_flags)
    return BeamResult(tokens=tokens, lengths=fin_lengths, scores=fin_scores,
                      finished=fin_flags, token_log_probs=token_lps,
                      attn_pos=attn_pos)
