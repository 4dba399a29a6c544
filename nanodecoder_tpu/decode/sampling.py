"""Random-sampling decoding (temperature / top-k / top-p), on device.

Reference analog: onmt/translate/greedy_search.py's
`sample_with_temperature` / random-sampling path (SURVEY.md §2.1
"Greedy search (or random_sampling.py)"): translate with
`-random_sampling_topk K -random_sampling_temp T`.  Semantics:

  1. scale: log-probs are re-normalized at temperature T
     (log_softmax(logits/T) == log_softmax(log_probs/T), since the
     1/T rescale of the log-partition renormalizes away),
  2. restrict: keep only the top-k tokens (k=0 -> full vocab) and/or
     the top-p nucleus (smallest prefix of the sorted distribution
     with cumulative probability >= p; p=0 -> off),
  3. sample categorically from the renormalized restricted
     distribution.

The reference drives this from Python one token at a time; here the
whole loop is a single `lax.while_loop` under jit (zero host
round-trips), with a counter-derived PRNG key per step
(`jax.random.fold_in(rng, t)`) so the program stays deterministic for
a fixed seed regardless of early-exit step count.

Recorded per-token scores are the log-probs of the chosen token under
the restricted, renormalized distribution (what the sampler actually
drew from) in f32 — used for Phred qualities exactly like greedy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nanodecoder_tpu.config import DecodeConfig, ModelConfig
from nanodecoder_tpu.decode.greedy import GreedyResult
from nanodecoder_tpu.models.model import decode_step, init_decode_state
from nanodecoder_tpu.vocab import BOS_ID, EOS_ID, PAD_ID

NEG_INF = -1.0e9


def restrict_log_probs(log_probs, topk: int, topp: float):
    """Mask log-probs outside the top-k set / top-p nucleus to -inf and
    renormalize.  log_probs: (B, V) f32, already log-softmaxed.

    Ties at the k-th value are all kept (the torch.topk analog keeps
    exactly k by index order; with continuous logits exact ties do not
    occur in practice, and keeping ties is the safer superset)."""
    v = log_probs.shape[-1]
    lp = log_probs
    if topk and 0 < topk < v:
        kth = jnp.sort(lp, axis=-1)[:, v - topk][:, None]
        lp = jnp.where(lp < kth, NEG_INF, lp)
    if topp and 0.0 < topp < 1.0:
        sorted_lp = jnp.sort(lp, axis=-1)[:, ::-1]
        probs = jnp.exp(sorted_lp)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < topp  # smallest prefix reaching mass p
        min_kept = jnp.min(
            jnp.where(keep, sorted_lp, jnp.inf), axis=-1, keepdims=True
        )
        lp = jnp.where(lp < min_kept, NEG_INF, lp)
    return jax.nn.log_softmax(lp, axis=-1)


def sample_decode(params, cfg: ModelConfig, dcfg: DecodeConfig,
                  memory, mem_lengths, rng) -> GreedyResult:
    """Sample one hypothesis per memory-bank row.  memory: (B, S, D).

    Returns the same structure as greedy_decode (GreedyResult) so all
    downstream plumbing (Phred, stitching, attention positions) is
    shared.  temperature<=0 is rejected at config time; temperature=1,
    topk=0, topp=0 is pure ancestral sampling.
    """
    b = memory.shape[0]
    tmax = cfg.max_decode_len
    temp = float(dcfg.temperature)
    state0 = init_decode_state(params, cfg, memory, mem_lengths)
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

    def cond(c):
        return jnp.logical_and(c["t"] < tmax, ~jnp.all(c["finished"]))

    def body(c):
        log_probs, attn_pos, state = decode_step(params, cfg, c["cur"], c["state"])
        if temp != 1.0:
            log_probs = jax.nn.log_softmax(log_probs / temp, axis=-1)
        if dcfg.min_len > 0:
            log_probs = jnp.where(
                (c["t"] < dcfg.min_len)
                & (jnp.arange(log_probs.shape[-1])[None, :] == EOS_ID),
                NEG_INF, log_probs,
            )
        lp_r = restrict_log_probs(log_probs, dcfg.sampling_topk, dcfg.sampling_topp)
        key = jax.random.fold_in(rng, c["t"])
        nxt = jax.random.categorical(key, lp_r, axis=-1).astype(jnp.int32)
        lp = jnp.take_along_axis(lp_r, nxt[:, None], axis=-1)[:, 0]
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

    out = jax.lax.while_loop(cond, body, init)
    lengths = jnp.where(out["finished"], out["lengths"], tmax)
    return GreedyResult(
        tokens=out["tokens"],
        lengths=lengths,
        token_log_probs=out["lps"],
        scores=jnp.sum(out["lps"], axis=-1),
        attn_pos=out["pos"],
    )
