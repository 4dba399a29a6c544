"""Export a sweep variant's latest checkpoint to <run_dir>/params.npz
(+ config.json) so evaluate/bench can load it with --ckpt.

Usage: python scripts/export_variant.py runs/h4_ft
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from nanodecoder_tpu.config import Config  # noqa: E402
from nanodecoder_tpu.models.model import init_model, param_count  # noqa: E402
from nanodecoder_tpu.train.checkpoint import (CheckpointManager,  # noqa: E402
                                              save_params_npz)
from nanodecoder_tpu.train.optim import build_optimizer  # noqa: E402
from nanodecoder_tpu.train.trainer import TrainState  # noqa: E402


def main():
    run_dir = sys.argv[1]
    ckpt_dir = os.path.join(run_dir, "ckpts")
    config = Config.from_json(open(os.path.join(ckpt_dir, "config.json")).read())
    params = init_model(jax.random.PRNGKey(0), config.model)
    opt, _ = build_optimizer(config.train, config.model.d_model)
    tmpl = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    mgr = CheckpointManager(ckpt_dir, config)
    step = mgr.latest_step()
    state = mgr.restore(tmpl)
    mgr.close()
    save_params_npz(os.path.join(run_dir, "params.npz"), state.params)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        f.write(config.to_json())
    print(f"{run_dir}: exported step-{step} "
          f"({param_count(state.params)/1e6:.2f}M params)")


if __name__ == "__main__":
    main()
