"""Pallas kernel: in-place KV-cache block write via DMA.

Device-trace evidence (round 3, v5e): XLA lays the combined decode
cache (B, T, C) out with T minor (the attention einsum wants lanes=T
for its logits), so `dynamic_update_slice` of the step row is a
read-modify-write that touches every tile of the cache — measured
131-166 us/step, >5x the byte cost, and the single largest term of the
decode loop after the kernel/step surgery.

This kernel bypasses layout assignment: the cache stays in HBM
(memory_space ANY, aliased input->output so the update is in-place) and
one async DMA copies the step's aligned 8-row block in.  Mosaic
requires sublane DMA slices to have 8-aligned offset and extent, so the
decode step stages the current block's rows in a tiny (B, 8, C) carry
(elementwise select, no DUS) and re-flushes that block every step —
only the block's bytes move.

Non-TPU backends (tests, CPU) fall back to lax.dynamic_update_slice —
identical semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


BLOCK = 8  # Mosaic DMA sublane slices need 8-aligned offset AND extent


def _write_block_kernel(step_ref, slab_ref, cache_in_ref, out_ref, sem):
    del cache_in_ref  # aliased with out_ref; never read
    t0 = pl.multiple_of((step_ref[0] // BLOCK) * BLOCK, BLOCK)
    copy = pltpu.make_async_copy(
        slab_ref, out_ref.at[:, pl.ds(t0, BLOCK), :], sem)
    copy.start()
    copy.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def write_cache_block(cache, slab, step, interpret: bool = False):
    """cache: (B, T, C) with T % 8 == 0; slab: (B, 8, C) holding the
    rows of the aligned 8-step block containing `step` (caller fills
    rows <= step%8, zeros the rest); step: scalar int32 in [0, T).
    Returns cache with the block [align8(step) : align8(step)+8)
    replaced by `slab` — in-place on TPU via one async DMA (only the
    block's bytes move; XLA's dynamic_update_slice on this T-minor-
    tiled buffer RMW'd every tile of the cache, 131-166 us/step in the
    v5e device trace).

    `interpret=True` runs the Pallas kernel body under the interpreter
    (CI parity coverage of the DMA/alignment logic off-device); the
    default on non-TPU backends is the semantically identical
    dynamic_update_slice fallback."""
    if not interpret and jax.default_backend() != "tpu":
        t0 = (step // BLOCK) * BLOCK
        return jax.lax.dynamic_update_slice_in_dim(
            cache, slab.astype(cache.dtype), t0, axis=1)
    b, t, c = cache.shape
    return pl.pallas_call(
        _write_block_kernel,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, t, c), cache.dtype),
        input_output_aliases={2: 0},
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )(step.reshape(1).astype(jnp.int32), slab.astype(cache.dtype), cache)
