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
