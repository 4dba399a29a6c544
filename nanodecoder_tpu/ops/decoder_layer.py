"""Fused transformer-decoder LAYER step: one Pallas program per layer.

Reference analog (SURVEY.md §2.1/§3.2): the per-token decode step of
onmt/decoders/transformer.py — LN, self-attention against the
incremental cache, cross-attention over the encoder memory, FFN — which
the reference runs as ~20 separate framework ops per layer from Python.

Motivation (docs/PERF.md round-2 roofline): at batch 256 the greedy
decode step runs ~680 us against a ~370 us HBM floor; the residual is
NOT bandwidth but the ~40-op per-step XLA chain — each small op
(layernorm, 256x256 projection, cache update) carries a ~5-10 us fixed
cost.  Fusing a whole decoder layer into ONE Pallas program removes
that chain: per step the model runs 3 fused layer programs plus the
embedding/generator/bookkeeping ops.

Design:
  - grid over batch row blocks (BLOCK_B rows/program); the layer's
    weights use constant index maps so Mosaic keeps them VMEM-resident
    across grid steps (no per-block re-fetch).
  - self/cross K/V caches stream HBM->VMEM once per step, exactly like
    ops/attention.py; all attention math is the same proven
    block-diagonal-matmul formulation (one MXU matmul per row for all
    heads), f32 softmax, head-mean cross argmax for the stitcher.
  - the CURRENT token's self K/V row is computed in-kernel and
    attended from registers (score appended to the cached prefix
    [0, step)), and returned as (B, D) outputs `k_new`/`v_new`; the
    caller dynamic-update-slices them into the cache OUTSIDE the
    kernel (an in-place (B, 1, D) write — avoids writing the whole
    cache block back through the Pallas output path).
  - weights are pre-fused once per decode program by
    `fuse_layer_weights`: self Q/K/V concatenate into ONE (D, 3D)
    matmul; biases and LN affines stay f32; matrices are cast to the
    compute dtype.  Matmuls accumulate f32 (preferred_element_type).

`decoder_layer_step_reference` (pure jnp, f32) defines the semantics;
tests compare the kernel in interpreter mode against it and the fused
decode path against the unfused XLA path at the token level.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LN_EPS = 1e-6


def fuse_layer_weights(layer, compute_dtype):
    """Per-layer params pytree -> flat tuple of fused kernel weights.

    Order matches the kernel's input signature.  Matrices are cast to
    `compute_dtype` (bandwidth); LN affines and biases stay f32
    (accuracy; they add post-accumulation)."""
    cdt = jnp.dtype(compute_dtype)
    d = layer["ln1"]["scale"].shape[0]

    def mat(p):
        return p["w"].astype(cdt)

    def bias(p, n):
        return p["b"].astype(jnp.float32).reshape(1, n)

    def ln(p):
        return (p["scale"].astype(jnp.float32).reshape(1, d),
                p["bias"].astype(jnp.float32).reshape(1, d))

    sa, ca, ff = layer["self_attn"], layer["cross_attn"], layer["ffn"]
    ln1g, ln1b = ln(layer["ln1"])
    ln2g, ln2b = ln(layer["ln2"])
    ln3g, ln3b = ln(layer["ln3"])
    w_qkv = jnp.concatenate([mat(sa["q"]), mat(sa["k"]), mat(sa["v"])], axis=1)
    b_qkv = jnp.concatenate([bias(sa["q"], d), bias(sa["k"], d), bias(sa["v"], d)],
                            axis=1)
    f = ff["in"]["w"].shape[1]
    return (
        ln1g, ln1b, w_qkv, b_qkv, mat(sa["o"]), bias(sa["o"], d),
        ln2g, ln2b, mat(ca["q"]), bias(ca["q"], d), mat(ca["o"]), bias(ca["o"], d),
        ln3g, ln3b, mat(ff["in"]), bias(ff["in"], f), mat(ff["out"]), bias(ff["out"], d),
    )


def _ln_f32(x, g, b):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * g + b


def decoder_layer_step_reference(y, self_k, self_v, cross_k, cross_v,
                                 step, mem_lengths, weights, n_heads: int):
    """Pure-jnp semantics of the fused layer step (f32 compute).

    y: (B, D) layer input; self_k/self_v: (B, Tmax, D) cache (prefix
    [0, step) valid); cross_k/cross_v: (B, S, D); step: scalar int32;
    mem_lengths: (B,).  Returns (y_out (B, D) in y.dtype,
    k_new (B, D), v_new (B, D) in cache dtype, amax (B,) int32)."""
    (ln1g, ln1b, w_qkv, b_qkv, w_so, b_so,
     ln2g, ln2b, w_cq, b_cq, w_co, b_co,
     ln3g, ln3b, w_f1, b_f1, w_f2, b_f2) = weights
    b, t, d = self_k.shape
    s = cross_k.shape[1]
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    yf = y.astype(jnp.float32)

    h1 = _ln_f32(yf, ln1g, ln1b)
    qkv = h1 @ w_qkv.astype(jnp.float32) + b_qkv
    q, k1, v1 = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]

    def mha_prefix(qrow, kc, vc, valid, k_cur=None, v_cur=None):
        qh = qrow.reshape(b, n_heads, dh)
        kh = kc.astype(jnp.float32).reshape(b, -1, n_heads, dh)
        vh = vc.astype(jnp.float32).reshape(b, -1, n_heads, dh)
        logits = jnp.einsum("bhd,bthd->bht", qh, kh) * scale
        mask = jnp.arange(kh.shape[1])[None, None, :] < valid[:, None, None]
        logits = jnp.where(mask, logits, NEG_INF)
        if k_cur is not None:
            cur = jnp.sum(qh * k_cur.reshape(b, n_heads, dh), axis=-1) * scale
            logits = jnp.concatenate([logits, cur[:, :, None]], axis=-1)
            vh = jnp.concatenate([vh, v_cur.reshape(b, 1, n_heads, dh)], axis=1)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.einsum("bht,bthd->bhd", p, vh)
        return out.reshape(b, d), p

    valid_self = jnp.full((b,), step, jnp.int32)
    ctx, _ = mha_prefix(q, self_k, self_v, valid_self, k_cur=k1, v_cur=v1)
    yf = yf + ctx @ w_so.astype(jnp.float32) + b_so

    h2 = _ln_f32(yf, ln2g, ln2b)
    qc = h2 @ w_cq.astype(jnp.float32) + b_cq
    ctx, probs = mha_prefix(qc, cross_k, cross_v, mem_lengths.astype(jnp.int32))
    # Head-mean cross-attention argmax (ties -> lowest position).
    pmean = jnp.mean(probs, axis=1)  # (B, S)
    amax = jnp.argmax(pmean, axis=-1).astype(jnp.int32)
    yf = yf + ctx @ w_co.astype(jnp.float32) + b_co

    h3 = _ln_f32(yf, ln3g, ln3b)
    f = jax.nn.relu(h3 @ w_f1.astype(jnp.float32) + b_f1)
    yf = yf + f @ w_f2.astype(jnp.float32) + b_f2
    return (yf.astype(y.dtype), k1.astype(self_k.dtype), v1.astype(self_v.dtype),
            amax)


def _layer_kernel(step_ref, len_ref, y_ref, sk_ref, sv_ref, ck_ref, cv_ref,
                  ln1g, ln1b, wqkv, bqkv, wso, bso,
                  ln2g, ln2b, wcq, bcq, wco, bco,
                  ln3g, ln3b, wf1, bf1, wf2, bf2,
                  yo_ref, kn_ref, vn_ref, amax_ref, ctx_ref,
                  *, n_heads: int, block_b: int):
    t, d = sk_ref.shape[1], sk_ref.shape[2]
    s = ck_ref.shape[1]
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    blk = pl.program_id(0)
    step = step_ref[0]
    cdt = wqkv.dtype

    yf = y_ref[...].astype(jnp.float32)  # (block_b, D)

    # --- LN1 + fused QKV projection (one MXU matmul for all three) ---
    h1 = _ln_f32(yf, ln1g[...], ln1b[...])
    qkv = jnp.dot(h1.astype(cdt), wqkv[...],
                  preferred_element_type=jnp.float32) + bqkv[...]
    q, k1, v1 = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    kn_ref[...] = k1.astype(kn_ref.dtype)
    vn_ref[...] = v1.astype(vn_ref.dtype)

    # Head-membership masks (shared by self + cross attention).
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (d, n_heads), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (d, n_heads), 1)
    head_of_lane = i_ids // dh                      # (D, H) lane's head id
    memb_dh = (head_of_lane == h_ids).astype(jnp.float32)   # (D, H)
    memb_hd = memb_dh.T                                      # (H, D)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (t, n_heads), 0)
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n_heads), 0)
    ss_ids = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)

    def one_token_attn(qrow, kc, vc, ids, valid, k_cur=None, v_cur=None):
        """Per-row fused MHA.  qrow (D,) f32; kc/vc (T', D) in their
        STORAGE dtype (the MXU takes bf16 inputs with f32 accumulation;
        upcasting whole cache blocks to f32 materializes VPU copies
        that dominated the per-op cross kernel — docs/PERF.md).
        Returns (ctx (D,), per-head probs (T', H))."""
        qmat = jnp.where(head_of_lane == h_ids, qrow.reshape(d, 1),
                         0.0).astype(kc.dtype)
        sc = jnp.dot(kc, qmat, preferred_element_type=jnp.float32) * scale
        sc = jnp.where(ids < valid, sc, NEG_INF)    # (T', H)
        m = jnp.max(sc, axis=0, keepdims=True)      # (1, H)
        if k_cur is not None:
            s_cur = jnp.dot((qrow * k_cur).reshape(1, d), memb_dh,
                            preferred_element_type=jnp.float32) * scale  # (1, H)
            m = jnp.maximum(m, s_cur)
        p = jnp.exp(sc - m)                         # (T', H)
        z = jnp.sum(p, axis=0, keepdims=True)       # (1, H)
        if k_cur is not None:
            p_cur = jnp.exp(s_cur - m)              # (1, H)
            z = z + p_cur
        p = p / z                                   # normalized per head
        oh = jnp.dot(p.T.astype(vc.dtype), vc,
                     preferred_element_type=jnp.float32)  # (H, D)
        out = jnp.sum(memb_hd * oh, axis=0)         # (D,)
        if k_cur is not None:
            p_cur_lane = jnp.dot(p_cur / z, memb_hd,
                                 preferred_element_type=jnp.float32)[0]  # (D,)
            out = out + p_cur_lane * v_cur
        return out, p

    # --- self-attention (cached prefix [0, step) + current token) ---
    # Per-row contexts land in a VMEM scratch (Mosaic has no
    # dynamic_update_slice on values; indexed ref stores are fine).
    for r in range(block_b):
        # Current token's K/V round-trip through the cache dtype: the
        # unfused path writes them to the bf16 cache before attending.
        o, _ = one_token_attn(q[r], sk_ref[r], sv_ref[r], t_ids, step,
                              k_cur=k1[r].astype(kn_ref.dtype).astype(jnp.float32),
                              v_cur=v1[r].astype(vn_ref.dtype).astype(jnp.float32))
        ctx_ref[r, :] = o
    yf = yf + jnp.dot(ctx_ref[...].astype(cdt), wso[...],
                      preferred_element_type=jnp.float32) + bso[...]

    # --- cross-attention over the encoder memory ---
    h2 = _ln_f32(yf, ln2g[...], ln2b[...])
    qc = jnp.dot(h2.astype(cdt), wcq[...],
                 preferred_element_type=jnp.float32) + bcq[...]
    for r in range(block_b):
        valid = len_ref[blk * block_b + r]
        o, p = one_token_attn(qc[r], ck_ref[r], cv_ref[r], s_ids, valid)
        ctx_ref[r, :] = o
        # Head-mean argmax encoder position (ties -> lowest index);
        # sum over heads is proportional to the mean.
        pmean = jnp.sum(p, axis=1, keepdims=True)   # (S, 1)
        pm_max = jnp.max(pmean, axis=0, keepdims=True)
        amax_ref[r, 0] = jnp.min(jnp.where(pmean >= pm_max, ss_ids, 2 ** 30))
    yf = yf + jnp.dot(ctx_ref[...].astype(cdt), wco[...],
                      preferred_element_type=jnp.float32) + bco[...]

    # --- FFN ---
    h3 = _ln_f32(yf, ln3g[...], ln3b[...])
    f = jax.nn.relu(jnp.dot(h3.astype(cdt), wf1[...],
                            preferred_element_type=jnp.float32) + bf1[...])
    yf = yf + jnp.dot(f.astype(cdt), wf2[...],
                      preferred_element_type=jnp.float32) + bf2[...]
    yo_ref[...] = yf.astype(yo_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def decoder_layer_step(y, self_k, self_v, cross_k, cross_v, step, mem_lengths,
                       weights, n_heads: int, interpret: bool = False):
    """Fused decoder layer step (see module docstring).

    y: (B, D); self_k/self_v: (B, Tmax, D); cross_k/cross_v: (B, S, D);
    step: scalar int32; mem_lengths: (B,); weights: tuple from
    `fuse_layer_weights`.  Returns (y_out, k_new, v_new, amax)."""
    b, t, d = self_k.shape
    s = cross_k.shape[1]
    f = weights[14].shape[1]
    block_b = 8 if b % 8 == 0 else (4 if b % 4 == 0 else (2 if b % 2 == 0 else 1))
    grid = (b // block_b,)

    def row_spec(n):
        return pl.BlockSpec((block_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def cache_spec(n):
        return pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    w_specs = [const_spec(w.shape) for w in weights]
    out, k_new, v_new, amax = pl.pallas_call(
        functools.partial(_layer_kernel, n_heads=n_heads, block_b=block_b),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # step (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mem_lengths (B,)
            row_spec(d),                              # y
            cache_spec(t), cache_spec(t),             # self K/V
            cache_spec(s), cache_spec(s),             # cross K/V
            *w_specs,
        ],
        out_specs=(
            row_spec(d),
            row_spec(d),
            row_spec(d),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, d), y.dtype),
            jax.ShapeDtypeStruct((b, d), self_k.dtype),
            jax.ShapeDtypeStruct((b, d), self_v.dtype),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((block_b, d), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * (3 * d + 2 * d + 2 * f) + 4 * b * (t + s) * d,
            bytes_accessed=(2 * b * (t + s) * d * self_k.dtype.itemsize
                            + (3 * d * d + 2 * d * d + 2 * d * f) * 2
                            + 6 * b * d * y.dtype.itemsize),
            transcendentals=b * (t + s) * n_heads,
        ),
    )(jnp.reshape(step.astype(jnp.int32), (1,)), mem_lengths.astype(jnp.int32),
      y, self_k, self_v, cross_k, cross_v, *weights)
    return out, k_new, v_new, amax[:, 0]
