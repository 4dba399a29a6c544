"""Pallas kernel: encoder self-attention without HBM-materialized probs.

Device-trace evidence (round 3, v5e, b=256, S=256, 8 heads): XLA's
encoder attention materializes the f32 (B, H, S, S) logits tensor to
HBM — 2.1 GB, ~2.47 ms per layer, ~15 ms of the 31 ms greedy program
once the decode loop was fast.  Per-chunk S is small (<= a few hundred
positions — SURVEY §5.7 chunk-parallel design), so one (b, h) grid
step's whole (S, S) score tile fits VMEM: this kernel computes scores,
masked f32 softmax, and the PV matmul in one program; probabilities
never touch HBM.

Forward-only: the encoder uses it for inference (train=False) — the
teacher-forced training path keeps the differentiable XLA einsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _enc_attn_kernel(len_ref, q_ref, k_ref, v_ref, o_ref,
                     *, scale, heads, s, rows):
    # `rows` batch rows x `heads` per grid step, fully unrolled: a
    # (b, h) grid measured grid-overhead-bound (2048 steps of ~2 MFLOP
    # each -> 1.63 ms/layer); one-row steps got 0.85; multi-row blocks
    # amortize further.  Operands arrive head-flattened (rows, H*S, Dh)
    # — static leading-dim slices are the layout Mosaic lowers cleanly
    # (a (1, S, H, Dh) block with middle-dim indexing fails with
    # 'unsupported shape cast').
    g = pl.program_id(0)
    for r in range(rows):
        n = len_ref[g * rows + r]
        for hi in range(heads):
            q = q_ref[r, hi * s:(hi + 1) * s, :]           # (S, Dh)
            k = k_ref[r, hi * s:(hi + 1) * s, :]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (S, S) f32
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < n, logits, NEG_INF)
            m = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            o_ref[r, hi * s:(hi + 1) * s, :] = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[r, hi * s:(hi + 1) * s, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_encoder_attention(q, k, v, lengths, interpret: bool = False):
    """q/k/v: (B, S, H, Dh); lengths: (B,) valid key counts.
    Returns (B, S, H, Dh) attention output; softmax in f32 over the
    masked key prefix (same math as modules.attention_core for MHA)."""
    b, s, h, dh = q.shape
    scale = 1.0 / (dh ** 0.5)
    # rows=4 at (S=256, D=256) hit the 16 MB scoped-VMEM stack limit by
    # 48 KB (4 x 4 x (H*S, Dh) bf16 blocks); 2 is the sweet spot.
    rows = next(r for r in (2, 1) if b % r == 0)

    def flat(x):  # (B, S, H, Dh) -> (B, H*S, Dh)
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, h * s, dh)

    spec = pl.BlockSpec((rows, h * s, dh), lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_enc_attn_kernel, scale=scale, heads=h, s=s,
                          rows=rows),
        grid=(b // rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h * s, dh), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), flat(q), flat(k), flat(v))
    return jnp.transpose(out.reshape(b, h, s, dh), (0, 2, 1, 3))


def _enc_attn_kernel_flat(len_ref, q_ref, k_ref, v_ref, o_ref,
                          *, scale, heads, dh, rows):
    """Natural-layout variant: q/k/v arrive (rows, S, D) with D = H*Dh —
    exactly what the QKV projection matmuls produce.  Heads are static
    LANE slices taken in-kernel; the round-3 flat (B, H*S, Dh) layout
    forced XLA to materialize three (B, S, H, Dh) transpose copies per
    layer on the way in and one on the way out (~2.0 ms/layer at b=512
    vs 1.6 ms of kernel — the device trace's single biggest term).
    Bonus: a (*, Dh=32) block pads lanes 32->128 in VMEM (4x the
    footprint), so this layout also shrinks VMEM 4x and admits bigger
    row blocks."""
    g = pl.program_id(0)
    for r in range(rows):
        n = len_ref[g * rows + r]
        # Load each (S, D) row ONCE; per-head lane slices are then value
        # slices (register extracts), not ref loads — slicing the ref
        # per head made Mosaic materialize a relayout copy per slice
        # (17.5 MB scoped-VMEM stack at rows=2, over the 16 MB limit).
        qr = q_ref[r]
        kr = k_ref[r]
        vr = v_ref[r]
        outs = []
        for hi in range(heads):
            q = jax.lax.slice_in_dim(qr, hi * dh, (hi + 1) * dh, axis=1)
            k = jax.lax.slice_in_dim(kr, hi * dh, (hi + 1) * dh, axis=1)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (S, S) f32
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < n, logits, NEG_INF)
            m = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            outs.append(jax.lax.dot_general(
                p.astype(vr.dtype),
                jax.lax.slice_in_dim(vr, hi * dh, (hi + 1) * dh, axis=1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype))
        # One full-lane store per row (per-head lane-slice stores would
        # relayout 8x; the concat is register shuffling).
        o_ref[r] = jnp.concatenate(outs, axis=1)


@functools.partial(jax.jit, static_argnames=("heads", "interpret", "rows"))
def flash_encoder_attention_nld(q, k, v, lengths, heads: int,
                                interpret: bool = False, rows: int = 1):
    """q/k/v: (B, S, D) in the projection's natural layout, D = heads*Dh.
    Returns (B, S, D).  Same masked-softmax math as
    flash_encoder_attention but with zero layout copies outside the
    kernel.  rows=1 measured fastest on the v5e (1.86 ms/layer at
    b=512, S=256, D=256 INCLUDING projections, vs 3.66 for the flat
    kernel + its transpose copies; rows 2/4/8: 2.5/2.2/2.1)."""
    b, s, d = q.shape
    dh = d // heads
    scale = 1.0 / (dh ** 0.5)
    rows = next(r for r in (rows, 4, 2, 1) if b % r == 0)
    spec = pl.BlockSpec((rows, s, d), lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_enc_attn_kernel_flat, scale=scale, heads=heads,
                          dh=dh, rows=rows),
        grid=(b // rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, d), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k, v)


def _enc_attn_kernel_qkv(len_ref, qkv_ref, o_ref, *, scale, heads, dh, rows):
    """Fused-QKV natural-layout variant: the operand arrives (rows, S,
    3D) — the lean encoder's single QKV projection output — and Q/K/V
    are LANE slices taken in-kernel.  Splitting host-side would cost
    three (B, S, D) slice copies per layer (~0.4 ms of HBM round trips
    per layer at b=512); here the slab is loaded once and sliced in
    registers, exactly like the per-head slices of the nld kernel."""
    # Two VPU-pass "optimizations" were tried here and measured SLOWER
    # on v5e (docs/PERF.md round 5): folding the attention scale into
    # the exp's subtract (5.27 -> 5.58 ms/layer-instr) and applying the
    # 1/sum softmax normalization to the (S, Dh) context after the PV
    # matmul instead of dividing the (S, S) probs (5.62) — the (S, 1)
    # lane-broadcast costs more than the full-width pass it saves.
    # Mosaic fuses the straightforward formulation best; keep it.
    g = pl.program_id(0)
    d = heads * dh
    for r in range(rows):
        n = len_ref[g * rows + r]
        slab = qkv_ref[r]                                   # (S, 3D)
        s = slab.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        live = col < n
        outs = []
        for hi in range(heads):
            q = jax.lax.slice_in_dim(slab, hi * dh, (hi + 1) * dh, axis=1)
            k = jax.lax.slice_in_dim(slab, d + hi * dh, d + (hi + 1) * dh,
                                     axis=1)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (S, S) f32
            logits = jnp.where(live, logits, NEG_INF)
            m = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            outs.append(jax.lax.dot_general(
                p.astype(slab.dtype),
                jax.lax.slice_in_dim(slab, 2 * d + hi * dh,
                                     2 * d + (hi + 1) * dh, axis=1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype))
        o_ref[r] = jnp.concatenate(outs, axis=1)


@functools.partial(jax.jit, static_argnames=("heads", "interpret", "rows"))
def flash_encoder_attention_qkv(qkv, lengths, heads: int,
                                interpret: bool = False, rows: int = 1):
    """qkv: (B, S, 3D) fused projection output, D = heads*Dh.
    Returns (B, S, D) — same masked-softmax math as
    flash_encoder_attention_nld with the Q/K/V split done in-kernel."""
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    scale = 1.0 / (dh ** 0.5)
    rows = next(r for r in (rows, 4, 2, 1) if b % r == 0)
    in_spec = pl.BlockSpec((rows, s, d3), lambda bi: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rows, s, d), lambda bi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_enc_attn_kernel_qkv, scale=scale, heads=heads,
                          dh=dh, rows=rows),
        grid=(b // rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qkv)


def encoder_attention_reference(q, k, v, lengths):
    """jnp reference with identical masking semantics (test oracle)."""
    from nanodecoder_tpu.models import modules as nn

    mask = nn.length_mask(lengths, k.shape[1])[:, None, None, :]
    out, _ = nn.attention_core(q, k, v, mask)
    return out
