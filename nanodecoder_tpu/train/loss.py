"""Label-smoothed NLL loss.

Reference analog: onmt/utils/loss.py — NMTLossCompute +
LabelSmoothingLoss + shards() (SURVEY.md §2.1).  The reference splits
the time dimension into shards to bound generator activation memory on
2018 GPUs; under XLA the full (B, T, V) pass fits trivially (V=8) and
rematerialization (`jax.checkpoint`) is the mechanism if a config ever
needs it — so shards() has no analog here by design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nanodecoder_tpu.vocab import PAD_ID


def label_smoothed_nll(log_probs, targets, smoothing: float = 0.1,
                       pad_id: int = PAD_ID):
    """Per-token label-smoothed negative log-likelihood.

    log_probs: (B, T, V) f32 log-softmax output; targets: (B, T) int32.
    Returns (loss_sum, n_tokens, n_correct) — summed over non-pad
    tokens, matching the reference's token-summed loss normalization.

    Smoothed target distribution: (1 - eps) on the gold label, eps
    spread uniformly over the other non-pad labels.
    """
    v = log_probs.shape[-1]
    valid = (targets != pad_id)
    n_tokens = jnp.sum(valid)

    gold_lp = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    if smoothing > 0.0:
        # Uniform mass over V-2 classes (exclude gold and pad).
        smooth_lp = (jnp.sum(log_probs, axis=-1)
                     - gold_lp
                     - log_probs[..., pad_id])
        eps_i = smoothing / (v - 2)
        per_tok = -((1.0 - smoothing) * gold_lp + eps_i * smooth_lp)
    else:
        per_tok = -gold_lp

    loss_sum = jnp.sum(jnp.where(valid, per_tok, 0.0))
    pred = jnp.argmax(log_probs, axis=-1)
    n_correct = jnp.sum(jnp.logical_and(pred == targets, valid))
    return loss_sum, n_tokens, n_correct


def guided_attention_loss(attn, tgt_lengths, enc_lengths, sigma: float = 0.2):
    """Diagonal guided-attention auxiliary loss (Tacotron-style).

    Basecalling alignment is monotonic and near-linear within a chunk
    (bases are roughly uniformly spread over samples), so penalizing
    cross-attention mass far from the diagonal bootstraps alignment
    through the no-gradient plateau that pure NLL suffers at the start
    of training.  Training-only; inference is untouched.

    attn: (B, H, T, S) cross-attention probs (last decoder layer).
    tgt_lengths: (B,) valid target tokens; enc_lengths: (B,) valid
    encoder positions.  Returns mean penalty over valid (b, h, t).
    """
    b, h, t, s = attn.shape
    t_ids = jnp.arange(t, dtype=jnp.float32)[None, :, None]  # (1, T, 1)
    s_ids = jnp.arange(s, dtype=jnp.float32)[None, None, :]  # (1, 1, S)
    tl = jnp.maximum(tgt_lengths.astype(jnp.float32), 1.0)[:, None, None]
    el = jnp.maximum(enc_lengths.astype(jnp.float32), 1.0)[:, None, None]
    # w[b,t,s] = 1 - exp(-(s/el - t/tl)^2 / (2 sigma^2)), zero outside valid
    diff = s_ids / el - t_ids / tl
    w = 1.0 - jnp.exp(-jnp.square(diff) / (2.0 * sigma * sigma))
    valid = ((t_ids < tl) & (s_ids < el)).astype(jnp.float32)
    w = w * valid  # (B, T, S)
    pen = jnp.sum(attn.astype(jnp.float32) * w[:, None, :, :], axis=(2, 3))  # (B, H)
    denom = jnp.maximum(jnp.sum(valid[:, :, 0], axis=-1), 1.0)[:, None]  # valid T rows
    return jnp.mean(pen / denom)


def loss_and_metrics(log_probs, targets, smoothing: float = 0.1):
    """Mean-per-token loss (for grad) + metrics dict (for reporting)."""
    loss_sum, n_tokens, n_correct = label_smoothed_nll(log_probs, targets, smoothing)
    denom = jnp.maximum(n_tokens, 1).astype(jnp.float32)
    loss = loss_sum / denom
    # Unsmoothed xent for ppl reporting (reference reports true NLL).
    gold_lp = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    valid = targets != PAD_ID
    xent_sum = -jnp.sum(jnp.where(valid, gold_lp, 0.0))
    metrics = {
        "loss_sum": loss_sum,
        "xent_sum": xent_sum,
        "n_tokens": n_tokens,
        "n_correct": n_correct,
    }
    return loss, metrics
