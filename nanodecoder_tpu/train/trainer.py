"""Trainer: jitted train step + epoch loop.

Reference analog: onmt/trainer.py — Trainer.train with gradient
accumulation (accum_count), validation, reporting hooks, and the
multi-GPU all-reduce call site (SURVEY.md §2.1, §3.1).

TPU-first re-design: ONE jitted function does forward + loss + backward
+ clip + optax update; gradient accumulation is a `lax.scan` over
micro-batches *inside* the step (no Python-loop grad stitching); the
gradient all-reduce disappears — data parallelism is expressed as
shardings on the jitted step (parallel/sharding.py) and XLA inserts the
psum (SURVEY.md §2.4/§2.5).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterator, NamedTuple

import jax
import jax.numpy as jnp
import optax

from nanodecoder_tpu.config import Config
from nanodecoder_tpu.models.model import decode_teacher_forced, encode
from nanodecoder_tpu.train.loss import loss_and_metrics
from nanodecoder_tpu.train.optim import build_optimizer
from nanodecoder_tpu.utils.report import ReportManager
from nanodecoder_tpu.utils.statistics import Statistics


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def make_train_step(config: Config, optimizer) -> Callable:
    """Build the pure train-step function.

    batch pytree (leading `accum` axis when accum_steps > 1):
      signal:  (A, B, S) f32   sig_lengths: (A, B) i32
      tgt_in:  (A, B, T) i32   tgt_out:     (A, B, T) i32
    Returns (new_state, metrics) — metrics summed over micro-batches.
    """
    mcfg = config.model
    smoothing = config.train.label_smoothing
    ga_weight = config.train.guided_attention_weight
    ga_sigma = config.train.guided_attention_sigma

    def micro_loss(params, mb, rng, inv_total_tokens, inv_accum):
        """Micro-batch objective scaled so that SUMMING gradients over
        micro-batches yields exactly the single-big-batch gradient:
        NLL is token-summed / total tokens across ALL micro-batches
        (not mean-of-means — micro-batches with unequal real-token
        counts would be mis-weighted), guided attention is a row-mean
        so dividing by the accum count reproduces the full-batch mean
        (micro-batch row counts are equal by construction)."""
        mem, mem_len = encode(params, mcfg, mb["signal"], mb["sig_lengths"],
                              rng=rng, train=True)
        log_probs, attn = decode_teacher_forced(
            params, mcfg, mb["tgt_in"], mem, mem_len, rng=rng, train=True
        )
        _loss, metrics = loss_and_metrics(log_probs, mb["tgt_out"], smoothing)
        loss = metrics["loss_sum"] * inv_total_tokens
        if ga_weight > 0.0 and attn is not None:
            from nanodecoder_tpu.train.loss import guided_attention_loss
            from nanodecoder_tpu.vocab import PAD_ID

            tgt_lengths = jnp.sum(mb["tgt_out"] != PAD_ID, axis=-1)
            loss = loss + (ga_weight * inv_accum) * guided_attention_loss(
                attn, tgt_lengths, mem_len, ga_sigma
            )
        return loss, metrics

    grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

    def train_step(state: TrainState, batch, rng):
        accum = batch["signal"].shape[0]
        rngs = jax.random.split(rng, accum)
        # Token counts are pure data, so the TOTAL across micro-batches
        # is known before the scan; baking 1/total into each micro
        # objective makes the summed gradient equal the single-batch
        # gradient with no post-hoc rescale.
        from nanodecoder_tpu.vocab import PAD_ID

        total_tokens = jnp.maximum(
            jnp.sum(batch["tgt_out"] != PAD_ID), 1
        ).astype(jnp.float32)
        inv_total = 1.0 / total_tokens
        inv_accum = jnp.float32(1.0 / accum)

        def scan_body(carry, xs):
            grads_acc, metrics_acc = carry
            mb, r = xs
            (_loss, metrics), grads = grad_fn(state.params, mb, r,
                                              inv_total, inv_accum)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            metrics_acc = jax.tree_util.tree_map(jnp.add, metrics_acc, metrics)
            return (grads_acc, metrics_acc), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        zero_metrics = {
            "loss_sum": jnp.zeros((), jnp.float32),
            "xent_sum": jnp.zeros((), jnp.float32),
            "n_tokens": jnp.zeros((), jnp.int32),
            "n_correct": jnp.zeros((), jnp.int32),
        }
        (grads, metrics), _ = jax.lax.scan(
            scan_body, (zero_grads, zero_metrics), (batch, rngs)
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_eval_step(config: Config) -> Callable:
    mcfg = config.model

    def eval_step(params, batch):
        mem, mem_len = encode(params, mcfg, batch["signal"], batch["sig_lengths"])
        log_probs, _ = decode_teacher_forced(
            params, mcfg, batch["tgt_in"], mem, mem_len
        )
        _loss, metrics = loss_and_metrics(log_probs, batch["tgt_out"],
                                          config.train.label_smoothing)
        return metrics

    return eval_step


class Trainer:
    """Host-side loop: feeds batches to the jitted step, reports, saves.

    `train_iter` yields batch pytrees WITH the accum leading axis
    (shape (A, B, ...)); `valid_iter_fn` returns a fresh finite
    iterator of micro-batches (no accum axis)."""

    def __init__(
        self,
        config: Config,
        params,
        report: ReportManager | None = None,
        checkpointer=None,
        mesh_plan=None,
        early_stopping=None,
    ):
        self.early_stopping = early_stopping
        self.config = config
        optimizer, self.schedule = build_optimizer(config.train, config.model.d_model)
        self.optimizer = optimizer
        opt_state = optimizer.init(params)
        self.state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
        step_fn = make_train_step(config, optimizer)
        eval_fn = make_eval_step(config)
        if mesh_plan is not None:
            # Data-parallel: batch sharded over the data axis, state
            # replicated; XLA inserts the gradient psum.
            step_fn = mesh_plan.shard_train_step(step_fn)
            eval_fn = mesh_plan.shard_eval_step(eval_fn)
        self._train_step = jax.jit(step_fn, donate_argnums=(0,)) if mesh_plan is None else step_fn
        self._eval_step = jax.jit(eval_fn) if mesh_plan is None else eval_fn
        self.report = report or ReportManager()
        self.checkpointer = checkpointer
        self.rng = jax.random.PRNGKey(config.train.seed)

    def train(self, train_iter: Iterator, valid_iter_fn=None, steps: int | None = None):
        cfg = self.config.train
        steps = steps or cfg.train_steps
        stats = Statistics()
        start_step = int(self.state.step)
        for _ in range(start_step, steps):
            batch = next(train_iter)
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, metrics = self._train_step(self.state, batch, step_rng)
            step = int(self.state.step)
            stats.update(
                float(metrics["xent_sum"]),
                int(metrics["n_tokens"]),
                int(metrics["n_correct"]),
            )
            # Host-side LR (never the jnp schedule with a python int —
            # that constant-folds a fresh program per step; see
            # optim.host_lr).
            from nanodecoder_tpu.train.optim import host_lr

            lr = host_lr(cfg, self.config.model.d_model, step - 1)
            self.report.report_training(step, stats, lr)
            if valid_iter_fn is not None and step % cfg.valid_every == 0:
                vstats = self.validate(valid_iter_fn(), step)
                if self.early_stopping is not None and self.early_stopping.update(vstats):
                    self.report.log.info("early stopping at step %d (best %s=%.4f)",
                                         step, self.early_stopping.metric,
                                         self.early_stopping.best)
                    break
            if self.checkpointer is not None and step % cfg.save_every == 0:
                self.checkpointer.save(step, self.state)
        return self.state

    def validate(self, valid_iter: Iterator, step: int) -> Statistics:
        vstats = Statistics()
        for batch in valid_iter:
            metrics = self._eval_step(self.state.params, batch)
            vstats.update(
                float(metrics["xent_sum"]),
                int(metrics["n_tokens"]),
                int(metrics["n_correct"]),
            )
        self.report.report_validation(step, vstats)
        return vstats
