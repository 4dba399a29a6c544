"""Export the latest orbax training checkpoint to the committed
flagship artifact consumed by bench.py and the golden-parity tests:
bench_results/flagship_params.npz + bench_results/config.json.

    python scripts/export_flagship.py <ckpt_dir>
"""

from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from nanodecoder_tpu.models.model import init_model, param_count
from nanodecoder_tpu.train.checkpoint import (
    CheckpointManager,
    load_config,
    save_params_npz,
)
from nanodecoder_tpu.train.optim import build_optimizer
from nanodecoder_tpu.train.trainer import TrainState


def main() -> int:
    ckpt_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/train_ws/ckpts"
    config = load_config(ckpt_dir)
    params = init_model(jax.random.PRNGKey(0), config.model)
    optimizer, _ = build_optimizer(config.train, config.model.d_model)
    template = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
    mgr = CheckpointManager(ckpt_dir, config)
    step = mgr.latest_step()
    state = mgr.restore(template)
    mgr.close()
    out_dir = os.path.join(REPO, "bench_results")
    os.makedirs(out_dir, exist_ok=True)
    save_params_npz(os.path.join(out_dir, "flagship_params.npz"), state.params)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        f.write(config.to_json())
    print(f"exported step-{step} params ({param_count(state.params)/1e6:.2f}M) "
          f"-> {out_dir}/flagship_params.npz")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
