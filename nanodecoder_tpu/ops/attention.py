"""Pallas kernel: one-token multi-head attention against a KV cache.

This is the decode hot loop's inner op (reference analog: the
per-step GlobalAttention / MultiHeadedAttention call inside the
Python decode loop, SURVEY.md §2.1 'Attention modules', §3.2).  One
kernel fuses, per batch row:

    scores = (K @ q_blockdiag) * scale     # one MXU matmul, all heads
    softmax over valid cache prefix (f32, single pass, fused masking)
    out    = sum_t broadcast(probs) * V    # MXU matmul + VPU reduce

so the (B, T, D) K/V caches are streamed HBM->VMEM exactly once per
step with no materialized (B, H, T) probability tensor in HBM.

Layout choice: caches are (B, T, D=H*Dh) with D contiguous in lanes —
the head split is purely logical (block-diagonal masks built from
iota), so DMAs are dense rows, not strided per-head gathers.

A jnp reference implementation (`decode_attention_reference`) defines
the semantics; tests compare the kernel in interpreter mode against it.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def decode_attention_reference(q, k_cache, v_cache, valid_lens, n_heads: int):
    """Reference semantics (pure jnp).

    q: (B, D) current-token queries (already projected).
    k_cache/v_cache: (B, T, Dk) with Dk = n_kv * head_dim (GQA/MQA:
    n_kv <= n_heads KV heads shared across query-head groups).
    valid_lens: (B,) int32 — attend to cache positions [0, valid).
    Returns (B, D) attention output in q.dtype; softmax in f32.
    """
    b, t, dk = k_cache.shape
    d = q.shape[1]
    dh = d // n_heads
    n_kv = dk // dh
    qh = q.reshape(b, n_heads, dh)
    kh = jnp.repeat(k_cache.reshape(b, t, n_kv, dh), n_heads // n_kv, axis=2)
    vh = jnp.repeat(v_cache.reshape(b, t, n_kv, dh), n_heads // n_kv, axis=2)
    scale = 1.0 / math.sqrt(dh)
    logits = jnp.einsum("bhd,bthd->bht", qh, kh, preferred_element_type=jnp.float32)
    logits = logits * scale
    mask = jnp.arange(t)[None, None, :] < valid_lens[:, None, None]
    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bht,bthd->bhd", probs.astype(vh.dtype), vh)
    return out.reshape(b, d).astype(q.dtype)


def _decode_attn_kernel(len_ref, q_ref, k_ref, v_ref, *rest,
                        n_heads: int, block_b: int, quantized: bool):
    if quantized:
        ks_ref, vs_ref, o_ref, amax_ref = rest
    else:
        o_ref, amax_ref = rest
    t, dk = k_ref.shape[1], k_ref.shape[2]
    # MHA: q_ref is (block_b, D); GQA: (block_b, H, dh) — the wrapper
    # pre-splits heads so the kernel's query build is 2-D (transpose +
    # sublane masks); 1-D lane slicing/concat builds abort the Mosaic
    # layout pass.
    gqa = q_ref.ndim == 3
    d = n_heads * q_ref.shape[-1] if gqa else q_ref.shape[1]
    dh = d // n_heads
    n_kv = dk // dh           # GQA/MQA: cache holds n_kv <= n_heads heads
    kv_group = n_heads // n_kv
    scale = 1.0 / math.sqrt(dh)
    blk = pl.program_id(0)

    i_ids = jax.lax.broadcasted_iota(jnp.int32, (d, n_heads), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (d, n_heads), 1)
    memb = (h_ids.T == i_ids.T // dh).astype(jnp.float32)  # (H, D)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (t, n_heads), 0)
    tt_ids = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)

    for r in range(block_b):  # unrolled over the row block
        valid = len_ref[blk * block_b + r]
        # K/V stay in their storage dtype: the MXU takes bf16 (or the
        # f32 parity mode's f32) inputs directly with f32 accumulation.
        # An .astype(f32) here materializes a (T, D) VPU copy per row —
        # measured as the dominant cross-attention cost at batch 256
        # (673 us/step vs the ~245 us HBM floor, profile_step_ablation).
        k = k_ref[r]                      # (T, Dk) storage dtype
        v = v_ref[r]                      # (T, Dk)

        # Block-diagonal query matrix: qmat[i, h] = q[i] if i//dh == h,
        # so all heads' scores come from ONE (T,Dk)x(Dk,H) MXU matmul.
        # GQA: query head h's slice lands on its KV head's (h//group)
        # dh-lane block — qr.T masked per KV group, sublane-concat.
        if n_kv == n_heads:
            q = q_ref[r].astype(jnp.float32)  # (D,)
            qmat = jnp.where(i_ids // dh == h_ids, q.reshape(d, 1), 0.0)
        else:
            qr_t = q_ref[r].astype(jnp.float32).T          # (dh, H)
            col_kv = jax.lax.broadcasted_iota(jnp.int32, (dh, n_heads), 1) // kv_group
            blocks = [jnp.where(col_kv == g, qr_t, 0.0) for g in range(n_kv)]
            qmat = blocks[0] if n_kv == 1 else jnp.concatenate(blocks, axis=0)
            q = None  # (Dk, H) qmat is the only query form used below
        if quantized:
            # Fold the int8 K dequant scales into the query matrix.
            # int8 is not an MXU input dtype and the fold must stay
            # exact (f32 scales), so this path keeps the f32 upcast.
            qmat = qmat * ks_ref[r].astype(jnp.float32).reshape(d, 1)
            k = k.astype(jnp.float32)
            v = v.astype(jnp.float32)
        else:
            qmat = qmat.astype(k.dtype)   # bf16 query == the XLA path's dense output

        scores = jnp.dot(k, qmat, preferred_element_type=jnp.float32) * scale  # (T, H)
        scores = jnp.where(t_ids < valid, scores, NEG_INF)

        m = jnp.max(scores, axis=0, keepdims=True)          # (1, H)
        p = jnp.exp(scores - m)                              # (T, H)
        z = jnp.sum(p, axis=0, keepdims=True)                # (1, H)
        p = p / z

        # Head-mean attention argmax — the token's aligned source position
        # (consumed by the attention-based stitcher; reference analog:
        # TranslationBuilder attaching attention maps, SURVEY.md §2.1).
        pmean = jnp.sum(p, axis=1, keepdims=True)            # (T, 1) ∝ mean
        pm_max = jnp.max(pmean, axis=0, keepdims=True)
        is_max = pmean >= pm_max
        amax_ref[r, 0] = jnp.min(jnp.where(is_max, tt_ids, 2 ** 30))

        # Weighted sum via ONE MXU matmul: oh[h, :] = sum_t p[t,h] v[t,:]
        # then select each lane's own head with the membership mask —
        # avoids materializing a (T, D) broadcast product on the VPU.
        # Probs cast to the V dtype (== the XLA path: attention_core
        # does probs.astype(v.dtype) before the PV einsum).
        oh = jnp.dot(p.T.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)  # (H, Dk)
        if n_kv == n_heads:
            out = jnp.sum(memb * oh, axis=0)                 # (D,)
            if quantized:
                # Fold the int8 V dequant scales into the output lanes.
                out = out * vs_ref[r].astype(jnp.float32)
            o_ref[r, :] = out.astype(o_ref.dtype)
        else:
            # GQA: head h's output is its KV head's dh-lane block of
            # oh[h] — select per KV group, emit (H, dh); the wrapper's
            # 3-D output reshapes to (B, D) for free outside.
            kv_ids = jax.lax.broadcasted_iota(jnp.int32, (n_heads, dh), 0) // kv_group
            out_h = jnp.zeros((n_heads, dh), jnp.float32)
            for g in range(n_kv):
                out_h = out_h + jnp.where(kv_ids == g,
                                          oh[:, g * dh:(g + 1) * dh], 0.0)
            o_ref[r] = out_h.astype(o_ref.dtype)


def quantize_cache_int8(x):
    """(B, T, D) cache -> (int8 values, (B, D) f32 per-lane scales).

    Symmetric per-(row, lane) quantization.  Exactness note: the
    attention math folds the scales OUTSIDE the quantized tensors —
    scores use k_q @ (scale_k * qmat) and outputs use (p.T @ v_q) *
    scale_v — so the only error is the int8 rounding of the stored
    values; all accumulation stays f32.  Purpose: the decode loop is
    HBM-bound on cross-cache reads (docs/PERF.md roofline); int8 halves
    that traffic vs bf16.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1)                    # (B, D)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[:, None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_cache_int8(q, scale, dtype):
    """Inverse of quantize_cache_int8 (XLA fallback path)."""
    return (q.astype(jnp.float32) * scale[:, None, :]).astype(dtype)


def decode_attention_grouped_reference(q, k_cache, v_cache, valid_lens,
                                       n_heads: int, group: int):
    """Reference semantics for beam-grouped decode attention.

    q: (B*group, D) — `group` consecutive rows (the beams of one chunk)
    share the SAME cache row.  k_cache/v_cache: (B, T, Dk) with
    Dk = n_kv * head_dim (GQA supported); valid_lens: (B,).  Equivalent
    to tiling the caches `group`-wise and calling
    decode_attention_reference.
    """
    b = k_cache.shape[0]
    k_t = jnp.repeat(k_cache, group, axis=0)
    v_t = jnp.repeat(v_cache, group, axis=0)
    len_t = jnp.repeat(valid_lens, group, axis=0)
    return decode_attention_reference(q, k_t, v_t, len_t, n_heads)


def _decode_attn_grouped_kernel(len_ref, q_ref, k_ref, v_ref, *rest,
                                n_heads: int, group: int, quantized: bool):
    """One grid step = one chunk: its (T, D) K/V stream HBM->VMEM ONCE
    and all `group` beam queries attend against them — cross-cache
    traffic divided by the beam width (the caches are beam-invariant).

    All beams' + heads' scores come from ONE (T,D)x(D,G*H) MXU matmul:
    column j of the block-sparse query matrix holds beam j//H's query
    restricted to head j%H's lanes.
    """
    if quantized:
        ks_ref, vs_ref, o_ref, amax_ref = rest
    else:
        o_ref, amax_ref = rest
    t, dk = k_ref.shape[1], k_ref.shape[2]
    gqa = q_ref.shape[1] != group     # GQA: q pre-split as (1, G*H, dh)
    d = n_heads * q_ref.shape[2] if gqa else q_ref.shape[2]
    dh = d // n_heads
    n_kv = dk // dh           # GQA/MQA: cache holds n_kv <= n_heads heads
    kv_group = n_heads // n_kv
    gh = group * n_heads
    scale = 1.0 / math.sqrt(dh)
    blk = pl.program_id(0)

    valid = len_ref[blk]
    # K/V stay in storage dtype (MXU takes bf16 with f32 accumulation);
    # the quantized path upcasts below to keep the scale fold exact.
    k = k_ref[0]                                          # (T, Dk)
    v = v_ref[0]                                          # (T, Dk)

    if not gqa:
        q = q_ref[0].astype(jnp.float32)                  # (G, D)
        i_ids = jax.lax.broadcasted_iota(jnp.int32, (d, gh), 0)
        j_ids = jax.lax.broadcasted_iota(jnp.int32, (d, gh), 1)
        # qmat[i, j] = q[j // H, i] when i's head == j's head else 0.
        # Built by an unrolled select over the (small) group dim —
        # Mosaic's gather lowering rejects take_along_axis with
        # broadcast shapes.
        qsel = jnp.zeros((d, gh), jnp.float32)
        for g in range(group):
            qsel = qsel + jnp.where(j_ids // n_heads == g, q[g].reshape(d, 1), 0.0)
        qmat = jnp.where(i_ids // dh == j_ids % n_heads, qsel, 0.0)
    else:
        # GQA: column j = (beam j//H, head h=j%H); rows = that head's
        # KV block.  2-D build: transpose of the pre-split queries,
        # masked per KV group, sublane-concat (1-D lane slicing aborts
        # the Mosaic layout pass).
        qall_t = q_ref[0].astype(jnp.float32).T           # (dh, GH)
        col_kv = (jax.lax.broadcasted_iota(jnp.int32, (dh, gh), 1)
                  % n_heads) // kv_group
        blocks = [jnp.where(col_kv == g, qall_t, 0.0) for g in range(n_kv)]
        qmat = blocks[0] if n_kv == 1 else jnp.concatenate(blocks, axis=0)
    if quantized:
        # Fold the int8 K dequant scales into the query matrix: exact.
        qmat = qmat * ks_ref[0].astype(jnp.float32).reshape(dk, 1)
        k = k.astype(jnp.float32)
        v = v.astype(jnp.float32)
    else:
        qmat = qmat.astype(k.dtype)

    scores = jnp.dot(k, qmat, preferred_element_type=jnp.float32) * scale  # (T, GH)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (t, gh), 0)
    scores = jnp.where(t_ids < valid, scores, NEG_INF)

    m = jnp.max(scores, axis=0, keepdims=True)            # (1, GH)
    p = jnp.exp(scores - m)
    z = jnp.sum(p, axis=0, keepdims=True)
    p = p / z                                             # (T, GH)

    # Head-mean argmax per beam (ties -> lowest position).  Lane-dim
    # splitting reshapes like (T, GH)->(T, G, H) are unsupported shape
    # casts in Mosaic — the per-beam head sum is a (GH, G) mask matmul
    # instead.
    jj = jax.lax.broadcasted_iota(jnp.int32, (gh, group), 0)
    gg = jax.lax.broadcasted_iota(jnp.int32, (gh, group), 1)
    beam_sel = (jj // n_heads == gg).astype(jnp.float32)  # (GH, G)
    pmean = jnp.dot(p, beam_sel, preferred_element_type=jnp.float32)  # (T, G)
    pm_max = jnp.max(pmean, axis=0, keepdims=True)
    is_max = pmean >= pm_max
    tg_ids = jax.lax.broadcasted_iota(jnp.int32, (t, group), 0)
    # amax_ref is the WHOLE (B, G) SMEM buffer (a (1, G) blocked SMEM
    # spec violates Mosaic's 8-sublane block rule — observed on v5e);
    # each grid step writes its own row, one scalar per beam (SMEM
    # stores must be scalars).
    for g in range(group):
        amax_ref[blk, g] = jnp.min(
            jnp.where(is_max[:, g : g + 1], tg_ids[:, g : g + 1], 2 ** 30))

    # Weighted sums for all beams+heads in ONE MXU matmul, then each
    # output lane selects its own (beam, head) row.  The (GH, D) ->
    # (G, D) head-block reduction is another mask matmul (no 3-D
    # reshape, see above): mask rows to their own head's lanes, then
    # segment-sum the H rows of each beam with beam_sel.T.
    oh = jnp.dot(p.T.astype(v.dtype), v,
                 preferred_element_type=jnp.float32)           # (GH, Dk)
    if n_kv == n_heads:
        j_row = jax.lax.broadcasted_iota(jnp.int32, (gh, d), 0)
        lane_hh = jax.lax.broadcasted_iota(jnp.int32, (gh, d), 1) // dh
        memb_big = (j_row % n_heads == lane_hh).astype(jnp.float32)  # (GH, D)
        oh_big = oh * memb_big
    else:
        # GQA: move row j's KV-block lanes to its head block, masked to
        # rows of that head (static lane slices + concat -> (GH, D)).
        j_row1 = jax.lax.broadcasted_iota(jnp.int32, (gh, dh), 0)
        pieces = []
        for hh in range(n_heads):
            kv = hh // kv_group
            pieces.append(jnp.where(j_row1 % n_heads == hh,
                                    oh[:, kv * dh:(kv + 1) * dh], 0.0))
        oh_big = jnp.concatenate(pieces, axis=1)                 # (GH, D)
    out = jnp.dot(beam_sel.T, oh_big,
                  preferred_element_type=jnp.float32)            # (G, D)
    if quantized:
        # Fold the int8 V dequant scales into the output lanes: exact.
        out = out * vs_ref[0].astype(jnp.float32)[None, :]
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "group", "interpret"))
def decode_attention_grouped(q, k_cache, v_cache, valid_lens, n_heads: int,
                             group: int, k_scale=None, v_scale=None,
                             interpret: bool = False):
    """Beam-grouped fused one-token MHA: rows g*group..(g+1)*group-1 of
    `q` attend against cache row g.  See
    decode_attention_grouped_reference for semantics.  With
    k_scale/v_scale ((B, D) f32), the caches are int8 and the dequant
    scales fold into the query matrix / output lanes.  Returns
    ((B*group, D) out, (B*group,) argmax positions)."""
    b, t, dk = k_cache.shape
    d = q.shape[1]
    dh = d // n_heads
    quantized = k_scale is not None
    assert not (quantized and dk != d), "int8 + GQA: use the XLA fallback"
    if dk == d:
        qg = q.reshape(b, group, d)
        q_spec = pl.BlockSpec((1, group, d), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        # GQA: heads pre-split outside so the kernel query build is 2-D.
        qg = q.reshape(b, group * n_heads, dh)
        q_spec = pl.BlockSpec((1, group * n_heads, dh), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (B,) valid_lens
        q_spec,
        pl.BlockSpec((1, t, dk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, dk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [valid_lens.astype(jnp.int32), qg, k_cache, v_cache]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, dk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dk), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]
    out, amax = pl.pallas_call(
        functools.partial(_decode_attn_grouped_kernel, n_heads=n_heads,
                          group=group, quantized=quantized),
        grid=(b,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, group, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (B, G) — see kernel
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, group, d), q.dtype),
            jax.ShapeDtypeStruct((b, group), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * dk * 2 * group,
            bytes_accessed=b * t * dk * 2 * k_cache.dtype.itemsize
            + b * group * d * 2,
            transcendentals=b * t * group * n_heads,
        ),
    )(*args)
    return out.reshape(b * group, d), amax.reshape(b * group)


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def decode_attention(q, k_cache, v_cache, valid_lens, n_heads: int,
                     k_scale=None, v_scale=None, interpret: bool = False):
    """Fused one-token MHA over a (B, T, D) KV cache.  See
    decode_attention_reference for semantics.  With k_scale/v_scale
    ((B, D) f32), the caches are int8 and the dequant scales fold into
    the query matrix / output lanes (exact accumulation in f32).

    Grid: batch row blocks (BLOCK_B rows per program) so K/V stream
    HBM->VMEM once with double-buffered DMAs; valid_lens lives whole in
    SMEM (rank-1 *blocked* SMEM specs are rejected by the Mosaic
    lowering — observed at batch 128)."""
    b, t, dk = k_cache.shape
    d = q.shape[1]
    dh = d // n_heads
    n_kv = dk // dh
    block_b = 8 if b % 8 == 0 else (4 if b % 4 == 0 else (2 if b % 2 == 0 else 1))
    grid = (b // block_b,)
    quantized = k_scale is not None
    assert not (quantized and n_kv != n_heads), "int8 + GQA: use the XLA fallback"
    if n_kv == n_heads:
        q_spec = pl.BlockSpec((block_b, d), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        q_arg = q
    else:
        # GQA: heads pre-split outside (free reshape) so the kernel's
        # query build stays 2-D — see _decode_attn_kernel.
        q_spec = pl.BlockSpec((block_b, n_heads, dh), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        q_arg = q.reshape(b, n_heads, dh)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (B,) valid_lens
        q_spec,
        pl.BlockSpec((block_b, t, dk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, t, dk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [valid_lens.astype(jnp.int32), q_arg, k_cache, v_cache]
    if quantized:
        in_specs += [
            pl.BlockSpec((block_b, dk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, dk), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]
    if n_kv == n_heads:
        out_spec = pl.BlockSpec((block_b, d), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape0 = jax.ShapeDtypeStruct((b, d), q.dtype)
    else:
        # GQA emits per-row (H, dh) blocks (a sublane->lane flatten is
        # not a supported in-kernel reshape); flattened for free below.
        out_spec = pl.BlockSpec((block_b, n_heads, dh), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape0 = jax.ShapeDtypeStruct((b, n_heads, dh), q.dtype)
    out, amax = pl.pallas_call(
        functools.partial(_decode_attn_kernel, n_heads=n_heads,
                          block_b=block_b, quantized=quantized),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            out_spec,
            pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            out_shape0,
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * dk * 2,
            bytes_accessed=b * t * dk * 2 * k_cache.dtype.itemsize + b * d * 2,
            transcendentals=b * t * n_heads,
        ),
    )(*args)
    return out.reshape(b, d), amax[:, 0]
