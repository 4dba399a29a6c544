"""Greedy (argmax) decoding, fully on device.

Reference analog: onmt/translate/greedy_search.py driven step-by-step
from Python (SURVEY.md §2.1, §3.2).  Here the loop is one
`lax.while_loop` inside jit: zero host round-trips until the token
matrix comes back.

Tie-breaking: `jnp.argmax` returns the lowest index on ties, matching
torch.argmax/topk semantics (SURVEY.md §7 R2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nanodecoder_tpu.config import ModelConfig
from nanodecoder_tpu.models.model import decode_step, init_decode_state
from nanodecoder_tpu.vocab import BOS_ID, EOS_ID, PAD_ID


def decode_stage_lengths(tmax: int, schedule: tuple[int, ...] = ()) -> list[int]:
    """Stage schedule for staged cache growth — default ~quarter, ~half,
    full, each a multiple of the DMA block (8).  The decode runs as
    consecutive while_loops whose self cache is sized to the stage, so
    per-step cache reads (and the beam reorder) touch only the live
    prefix's bytes.  An explicit `schedule` (ModelConfig.stage_schedule)
    overrides the split — tuned against the decode-length histogram."""
    if schedule:
        qs = sorted(set(schedule))
        if qs[-1] != tmax or any(q % 8 != 0 or q <= 0 for q in qs):
            raise ValueError(
                f"stage_schedule {schedule} must be ascending multiples of 8 "
                f"ending at max_decode_len={tmax}")
        return qs
    qs = sorted({max(8, (tmax // 4) // 8 * 8),
                 max(8, (tmax // 2) // 8 * 8), tmax})
    return [q for q in qs if q <= tmax]


def grow_self_cache(state, new_t: int):
    """Pad the combined self cache's T dim with zeros up to new_t
    (stage transition; padded rows are masked until written).  The beam
    ancestry map (path_reorder mode) grows alongside it."""
    kv = state["self_kv"]
    pad = jnp.zeros((kv.shape[0], new_t - kv.shape[1], kv.shape[2]),
                    kv.dtype)
    out = {**state, "self_kv": jnp.concatenate([kv, pad], axis=1)}
    if "self_path" in state:
        p = state["self_path"]
        ppad = jnp.zeros((p.shape[0], p.shape[1], new_t - p.shape[2]),
                         p.dtype)
        out["self_path"] = jnp.concatenate([p, ppad], axis=2)
    return out


class GreedyResult(NamedTuple):
    tokens: jnp.ndarray      # (B, max_len) int32, PAD after EOS
    lengths: jnp.ndarray     # (B,) int32 — tokens emitted incl. EOS
    token_log_probs: jnp.ndarray  # (B, max_len) f32 — log-prob of chosen token
    scores: jnp.ndarray      # (B,) f32 — summed log-probs
    attn_pos: jnp.ndarray    # (B, max_len) int32 — per-token cross-attn
    #                          argmax encoder position (alignment)


def greedy_decode(params, cfg: ModelConfig, memory, mem_lengths,
                  min_len: int = 0) -> GreedyResult:
    """Decode every row of a memory-bank batch greedily.

    memory: (B, S, D) encoder output; mem_lengths: (B,).
    The loop exits early once every row has emitted EOS.  min_len
    masks EOS before that many tokens (reference: translate
    -min_length on GreedySearch).
    """
    import dataclasses as _dc

    b = memory.shape[0]
    tmax = cfg.max_decode_len
    staged = (cfg.staged_decode and cfg.lean_step
              and cfg.decoder_type == "transformer")
    stages = decode_stage_lengths(tmax, cfg.stage_schedule) if staged else [tmax]
    state0 = init_decode_state(
        params, _dc.replace(cfg, max_decode_len=stages[0]), memory,
        mem_lengths)
    # Lean path: fold LN affines/biases into the matmuls ONCE, outside
    # the loop; the body closes over the folded weights.
    from nanodecoder_tpu.models.decoder import prepare_decode_params

    params = prepare_decode_params(params, cfg, memory.dtype)

    init = dict(
        state=state0,
        cur=jnp.full((b,), BOS_ID, jnp.int32),
        tokens=jnp.full((b, tmax), PAD_ID, jnp.int32),
        lps=jnp.zeros((b, tmax), jnp.float32),
        pos=jnp.zeros((b, tmax), jnp.int32),
        finished=jnp.zeros((b,), jnp.bool_),
        lengths=jnp.zeros((b,), jnp.int32),
        t=jnp.zeros((), jnp.int32),
    )

    def make_cond(stage_t):
        def cond(c):
            return jnp.logical_and(c["t"] < stage_t, ~jnp.all(c["finished"]))
        return cond

    def make_body(scfg):
        def body(c):
            log_probs, attn_pos, state = decode_step(params, scfg, c["cur"],
                                                     c["state"])
            if min_len > 0:
                log_probs = jnp.where(
                    (c["t"] < min_len)
                    & (jnp.arange(log_probs.shape[-1])[None, :] == EOS_ID),
                    -1e9, log_probs,
                )
            nxt = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
            lp = jnp.take_along_axis(log_probs, nxt[:, None], axis=-1)[:, 0]
            # Finished rows keep emitting PAD with zero score.
            nxt = jnp.where(c["finished"], PAD_ID, nxt)
            lp = jnp.where(c["finished"], 0.0, lp)
            t = c["t"]
            tokens = jax.lax.dynamic_update_slice_in_dim(c["tokens"], nxt[:, None], t, axis=1)
            lps = jax.lax.dynamic_update_slice_in_dim(c["lps"], lp[:, None], t, axis=1)
            pos = jax.lax.dynamic_update_slice_in_dim(c["pos"], attn_pos[:, None], t, axis=1)
            now_finished = jnp.logical_or(c["finished"], nxt == EOS_ID)
            lengths = jnp.where(c["finished"], c["lengths"], t + 1)
            return dict(
                state=state, cur=nxt, tokens=tokens, lps=lps, pos=pos,
                finished=now_finished, lengths=lengths, t=t + 1,
            )
        return body

    out = init
    for i, st in enumerate(stages):
        scfg = _dc.replace(cfg, max_decode_len=st)
        out = jax.lax.while_loop(make_cond(st), make_body(scfg), out)
        if i + 1 < len(stages):
            out = {**out, "state": grow_self_cache(out["state"],
                                                   stages[i + 1])}
    # Rows that never emitted EOS have length tmax.
    lengths = jnp.where(out["finished"], out["lengths"], tmax)
    return GreedyResult(
        tokens=out["tokens"],
        lengths=lengths,
        token_log_probs=out["lps"],
        scores=jnp.sum(out["lps"], axis=-1),
        attn_pos=out["pos"],
    )
