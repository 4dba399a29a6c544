"""Length penalties for beam scoring.

Reference analog: onmt/translate/penalties.py PenaltyBuilder
(SURVEY.md §2.1, §3.5): "wu" (GNMT) and "avg" length normalization.
Coverage penalty is omitted: basecalling chunks are short and the
reference's default decode path does not enable it (unverifiable this
round — SURVEY.md §7 R3; the knob layout leaves room to add it).
"""

from __future__ import annotations

import jax.numpy as jnp


def length_penalty(length, kind: str = "none", alpha: float = 0.6):
    """Divisor applied to cumulative log-prob at `length` tokens.

    "wu":  ((5 + length) / 6) ** alpha   (GNMT)
    "avg": length                         (per-token average)
    "none": 1
    `length` may be a traced array; result is f32.
    """
    length = jnp.asarray(length, jnp.float32)
    if kind == "wu":
        return jnp.power((5.0 + length) / 6.0, alpha)
    if kind == "avg":
        return jnp.maximum(length, 1.0)
    if kind == "none":
        return jnp.ones_like(length)
    raise ValueError(f"unknown length penalty {kind!r}")


def coverage_penalty(attn_sums, kind: str = "none", beta: float = 0.0):
    """Coverage penalty over accumulated cross-attention mass
    (reference: PenaltyBuilder's coverage_wu/coverage_summary).

    attn_sums: (..., S) — per-source-position attention totals for a
    hypothesis.  "wu": beta * sum(log(min(a, 1))) (GNMT; penalizes
    under-covered source positions).  "summary": beta * (sum(max(a,1)) - S).
    Returns a penalty SUBTRACTED from the hypothesis score.  Disabled
    ("none") by default — the basecall decode path does not accumulate
    per-position attention mass unless coverage is enabled.
    """
    if kind == "none" or beta == 0.0:
        return jnp.zeros(attn_sums.shape[:-1], jnp.float32)
    a = attn_sums.astype(jnp.float32)
    if kind == "wu":
        return -beta * jnp.sum(jnp.log(jnp.clip(a, 1e-10, 1.0)), axis=-1)
    if kind == "summary":
        s = a.shape[-1]
        return beta * (jnp.sum(jnp.maximum(a, 1.0), axis=-1) - s)
    raise ValueError(f"unknown coverage penalty {kind!r}")
