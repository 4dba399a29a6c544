"""Shared CLI plumbing: checkpoint/param/config loading."""

from __future__ import annotations

import os

import jax

from nanodecoder_tpu.config import Config
from nanodecoder_tpu.models.model import init_model


def load_params_and_config(ckpt: str) -> tuple:
    """Load (params, config) from either an orbax checkpoint dir
    (written by CheckpointManager, with config.json alongside) or a
    .npz params export (config.json expected next to it)."""
    if ckpt.endswith(".npz"):
        cfg_path = os.path.join(os.path.dirname(os.path.abspath(ckpt)), "config.json")
        with open(cfg_path) as f:
            config = Config.from_json(f.read())
        like = init_model(jax.random.PRNGKey(0), config.model)
        from nanodecoder_tpu.train.checkpoint import load_params_npz

        return load_params_npz(ckpt, like), config

    from nanodecoder_tpu.train.checkpoint import CheckpointManager, load_config
    from nanodecoder_tpu.train.optim import build_optimizer
    from nanodecoder_tpu.train.trainer import TrainState

    import jax.numpy as jnp

    config = load_config(ckpt)
    params = init_model(jax.random.PRNGKey(0), config.model)
    optimizer, _ = build_optimizer(config.train, config.model.d_model)
    template = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
    mgr = CheckpointManager(ckpt, config)
    state = mgr.restore(template)
    mgr.close()
    return state.params, config
