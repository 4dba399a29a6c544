"""Mesh construction + sharded program builders.

Design (SURVEY.md §2.4): DP is the only parallelism the reference has
and the only one this model family needs (vocab=8, d_model<=1k —
nothing to tensor-shard).  The mesh keeps a single `data` axis; the
MeshPlan abstraction leaves room for a `model` axis later without
building TP now.

Inference: weights replicated, chunk batches sharded on `data`
(BASELINE north star: "model weights replicated across a multi-host TPU
pod slice while signal chunks stream data-parallel").
Training: same sharding; XLA turns the replicated-param gradient sum
into a psum over `data` — the reference's all_reduce_and_rescale
becomes one sharding annotation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nanodecoder_tpu.config import MeshConfig


@dataclasses.dataclass
class MeshPlan:
    mesh: Mesh
    data_axis: str

    @property
    def n_devices(self) -> int:
        return int(np.prod(self.mesh.devices.shape))

    # --- shardings -------------------------------------------------------

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def data_sharded(self, ndim: int = 1) -> NamedSharding:
        """Shard the leading (batch) axis over `data`."""
        spec = P(self.data_axis, *([None] * (ndim - 1)))
        return NamedSharding(self.mesh, spec)

    def shard_batch(self, batch: Any) -> Any:
        """Place a host batch pytree with leading batch axis sharded."""
        def put(x):
            return jax.device_put(x, self.data_sharded(np.ndim(x)))
        return jax.tree_util.tree_map(put, batch)

    def replicate(self, tree: Any) -> Any:
        return jax.device_put(tree, self.replicated())

    # --- program builders -----------------------------------------------

    def shard_decode_fn(self, fn: Callable, n_extra_replicated: int = 0) -> Callable:
        """Jit `fn(params, signal, lengths, *extra) -> outputs` with
        params (and any trailing extra args, e.g. a sampling PRNG key)
        replicated and the batch sharded on `data`."""
        extra = tuple(self.replicated() for _ in range(n_extra_replicated))
        return jax.jit(
            fn,
            in_shardings=(self.replicated(), self.data_sharded(2),
                          self.data_sharded(1)) + extra,
            out_shardings=None,  # let XLA propagate (batch-sharded)
        )

    def shard_train_step(self, step_fn: Callable) -> Callable:
        """Jit `step_fn(state, batch, rng)` with state replicated and
        batch sharded on the micro-batch axis (axis 1 of (A, B, ...)).
        XLA inserts the gradient psum over `data`."""
        batch_spec = NamedSharding(self.mesh, P(None, self.data_axis))
        # A single sharding acts as a pytree prefix for the whole batch.
        return jax.jit(
            step_fn,
            in_shardings=(self.replicated(), batch_spec, self.replicated()),
            out_shardings=(self.replicated(), self.replicated()),
            donate_argnums=(0,),
        )

    def shard_eval_step(self, eval_fn: Callable) -> Callable:
        batch_spec = NamedSharding(self.mesh, P(self.data_axis))
        return jax.jit(
            eval_fn,
            in_shardings=(self.replicated(), batch_spec),
            out_shardings=self.replicated(),
        )


def make_mesh_plan(cfg: MeshConfig | None = None, devices=None) -> MeshPlan:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = cfg.num_devices or len(devices)
    devices = np.asarray(devices[:n])
    mesh = Mesh(devices, (cfg.data_axis,))
    return MeshPlan(mesh=mesh, data_axis=cfg.data_axis)
