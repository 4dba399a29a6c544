"""Optimizer construction: optax chains + LR schedules.

Reference analog: onmt/utils/optimizers.py — the Optimizer wrapper with
Adam/SGD, noam warmup-decay, gradient clipping (SURVEY.md §2.1).
"""

from __future__ import annotations

import optax

from nanodecoder_tpu.config import TrainConfig


def noam_schedule(d_model: int, warmup_steps: int, scale: float = 1.0):
    """OpenNMT/transformer 'noam' schedule:
    lr = scale * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)."""
    import jax.numpy as jnp

    def schedule(step):
        step = jnp.asarray(step, jnp.float32) + 1.0  # 1-indexed like the reference
        return scale * d_model ** -0.5 * jnp.minimum(
            step ** -0.5, step * warmup_steps ** -1.5
        )

    return schedule


def build_schedule(cfg: TrainConfig, d_model: int):
    if cfg.lr_schedule == "noam":
        return noam_schedule(d_model, cfg.warmup_steps, cfg.learning_rate)
    if cfg.lr_schedule == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.train_steps, cfg.warmup_steps + 1),
        )
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def host_lr(cfg: TrainConfig, d_model: int, step: int) -> float:
    """Host-side (pure python math) LR value for reporting.

    Never call the jnp schedule with a python scalar from the host
    loop: the value constant-folds into the HLO, producing a NEW tiny
    program (and a compile) every step.
    """
    import math

    s = float(step) + 1.0
    if cfg.lr_schedule == "noam":
        return cfg.learning_rate * d_model ** -0.5 * min(
            s ** -0.5, s * cfg.warmup_steps ** -1.5
        )
    if cfg.lr_schedule == "constant":
        return cfg.learning_rate
    if cfg.lr_schedule == "cosine":
        warm, total = cfg.warmup_steps, max(cfg.train_steps, cfg.warmup_steps + 1)
        if s < warm:
            return cfg.learning_rate * s / warm
        frac = min((s - warm) / max(total - warm, 1), 1.0)
        return cfg.learning_rate * 0.5 * (1.0 + math.cos(math.pi * frac))
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def build_optimizer(cfg: TrainConfig, d_model: int):
    """Returns (optax.GradientTransformation, schedule_fn)."""
    schedule = build_schedule(cfg, d_model)
    if cfg.optimizer == "adam":
        opt = optax.adam(schedule, b1=cfg.adam_b1, b2=cfg.adam_b2)
    elif cfg.optimizer == "adamw":
        opt = optax.adamw(schedule, b1=cfg.adam_b1, b2=cfg.adam_b2)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(schedule)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    chain = [optax.clip_by_global_norm(cfg.grad_clip)] if cfg.grad_clip > 0 else []
    chain.append(opt)
    return optax.chain(*chain), schedule
