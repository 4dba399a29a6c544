"""Checkpoint save/restore via Orbax.

Reference analog: onmt/models/model_saver.py — periodic .pt dicts of
{model, generator, vocab, opts, optim} with -train_from resume
(SURVEY.md §2.1, §5.4).  Here: Orbax checkpoints of the full TrainState
pytree + the typed Config serialized alongside (the reference embeds
opts in the checkpoint; we embed config JSON so topology reconstructs
at load).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from nanodecoder_tpu.config import Config
from nanodecoder_tpu.utils.logging import get_logger

log = get_logger("checkpoint")


class CheckpointManager:
    def __init__(self, directory: str, config: Config, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.config = config
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        cfg_path = os.path.join(self.directory, "config.json")
        if not os.path.exists(cfg_path):
            with open(cfg_path, "w") as f:
                f.write(config.to_json())

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()
        log.info("saved checkpoint @ step %d -> %s", step, self.directory)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, abstract_state: Any, step: int | None = None) -> Any:
        """Restore into the structure of `abstract_state` (a concrete or
        jax.eval_shape'd TrainState pytree)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
        log.info("restored checkpoint @ step %d from %s", step, self.directory)
        return restored

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def load_config(directory: str) -> Config:
    with open(os.path.join(directory, "config.json")) as f:
        return Config.from_json(f.read())


def save_params_npz(path: str, params) -> None:
    """Flat .npz export — a dependency-free interchange format for
    params only (the analog of the reference's inference-time
    load_test_model path, which doesn't need optimizer state)."""
    import numpy as np

    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params_npz(path: str, like) -> Any:
    """Load a save_params_npz export into the structure of `like`."""
    import numpy as np

    data = np.load(path)
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for kp, leaf in leaves_with_path:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        arr = data[key]
        assert arr.shape == leaf.shape, f"{key}: {arr.shape} vs {leaf.shape}"
        new_leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
