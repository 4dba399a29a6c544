"""Shared neural modules as pure functions over param pytrees.

Reference analog: onmt/modules/ — Embeddings, PositionalEncoding,
MultiHeadedAttention, GlobalAttention (Luong), PositionwiseFeedForward
(SURVEY.md §2.1 'Attention modules' / 'Other modules').

Conventions (TPU-first):
  * params: nested dicts of jnp arrays, float32 masters.
  * activations: computed in `compute_dtype` (bf16 on TPU), with
    softmax/variance accumulation forced to float32 (SURVEY.md §7 R2 —
    parity across dtypes hinges on f32 accumulation at reductions).
  * shapes: batch-major (B, T, D); no dynamic shapes anywhere.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # additive mask value; avoids NaN-producing -inf in softmax


# ---------------------------------------------------------------------------
# initializers


def glorot(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    scale = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -scale, scale)


def normal_init(key, shape, stddev, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * stddev


def init_dense(key, in_dim: int, out_dim: int, use_bias: bool = True):
    p = {"w": glorot(key, (in_dim, out_dim))}
    if use_bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def init_layer_norm(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_embedding(key, vocab: int, dim: int):
    return {"table": normal_init(key, (vocab, dim), 1.0 / math.sqrt(dim))}


# ---------------------------------------------------------------------------
# forward ops


def dense(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm(p, x, eps: float = 1e-6):
    # Reduce in f32 regardless of compute dtype (R2: parity).
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def embed(p, ids, compute_dtype):
    return p["table"].astype(compute_dtype)[ids]


def sinusoidal_positions(max_len: int, dim: int) -> jnp.ndarray:
    """Transformer sinusoidal positional encoding table (f32,
    (max_len, dim)).  Matches the standard interleaved sin/cos layout
    used by the reference's PositionalEncoding module."""
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim))
    ang = pos * div  # (max_len, dim/2)
    pe = jnp.zeros((max_len, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, 1::2].set(jnp.cos(ang))
    return pe


def dropout(x, rate: float, rng, train: bool):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# multi-head attention


def init_mha(key, d_model: int, n_heads: int, kv_heads: int | None = None):
    """kv_heads < n_heads = GQA/MQA: K/V project to kv_heads * head_dim
    and are shared across query-head groups (decode KV-cache traffic /
    (n_heads/kv_heads) — the TPU decode loop is cache-bandwidth-bound,
    docs/PERF.md roofline)."""
    kv = kv_heads or n_heads
    dk = d_model // n_heads * kv
    ks = jax.random.split(key, 4)
    return {
        "q": init_dense(ks[0], d_model, d_model),
        "k": init_dense(ks[1], d_model, dk),
        "v": init_dense(ks[2], d_model, dk),
        "o": init_dense(ks[3], d_model, d_model),
    }


def _split_heads(x, n_heads):
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def _merge_heads(x):
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def attention_core(q, k, v, mask=None):
    """Scaled dot-product attention.

    q: (B, Tq, H, Dh), k/v: (B, Tk, Hk, Dh) with Hk dividing H (GQA:
    each KV head serves a contiguous group of H/Hk query heads), mask:
    broadcastable to (B, H, Tq, Tk) with 1=keep / 0=drop.  Softmax in
    float32 (R2).  The GQA path uses a grouped einsum (KV heads as a
    batch dim) — never materializes the repeated KV tensor.
    """
    b, tq, hq, dh = q.shape
    hk = k.shape[2]
    tk = k.shape[1]
    scale = 1.0 / math.sqrt(dh)
    if hk == hq:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
    else:
        g = hq // hk
        qg = q.reshape(b, tq, hk, g, dh)
        logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits.reshape(b, hq, tq, tk)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if hk == hq:
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    else:
        g = hq // hk
        pg = probs.astype(v.dtype).reshape(b, hk, g, tq, tk)
        out = jnp.einsum("bhgqk,bkhd->bqhgd", pg, v).reshape(b, tq, hq, dh)
    return out, probs


def mha(p, n_heads, query, key_value, mask=None, dropout_rate=0.0, rng=None,
        train=False, kv_heads: int | None = None):
    """Full (non-incremental) multi-head attention.
    query: (B, Tq, D); key_value: (B, Tk, D)."""
    q = _split_heads(dense(p["q"], query), n_heads)
    k = _split_heads(dense(p["k"], key_value), kv_heads or n_heads)
    v = _split_heads(dense(p["v"], key_value), kv_heads or n_heads)
    out, probs = attention_core(q, k, v, mask)
    out = dropout(out, dropout_rate, rng, train)
    return dense(p["o"], _merge_heads(out)), probs


def mha_project_kv(p, n_heads, key_value, kv_heads: int | None = None):
    """Precompute K/V once (cross-attention setup for incremental
    decode — reference analog: the transformer decoder caching
    memory-bank projections per layer, SURVEY.md §2.1)."""
    k = _split_heads(dense(p["k"], key_value), kv_heads or n_heads)
    v = _split_heads(dense(p["v"], key_value), kv_heads or n_heads)
    return k, v


def mha_step(p, n_heads, query_1, k, v, mask=None):
    """One-token attention against precomputed K/V.
    query_1: (B, 1, D); k/v: (B, Tk, H, Dh); mask: (B, 1, 1, Tk) or None."""
    q = _split_heads(dense(p["q"], query_1), n_heads)
    out, probs = attention_core(q, k, v, mask)
    return dense(p["o"], _merge_heads(out)), probs


# ---------------------------------------------------------------------------
# feed-forward


def init_ffn(key, d_model: int, ffn_dim: int):
    k1, k2 = jax.random.split(key)
    return {"in": init_dense(k1, d_model, ffn_dim), "out": init_dense(k2, ffn_dim, d_model)}


def ffn(p, x, dropout_rate=0.0, rng=None, train=False):
    h = jax.nn.relu(dense(p["in"], x))
    h = dropout(h, dropout_rate, rng, train)
    return dense(p["out"], h)


# ---------------------------------------------------------------------------
# masks


def length_mask(lengths, max_len):
    """(B,) lengths -> (B, max_len) bool validity mask."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]


def causal_mask(t: int):
    """(1, 1, t, t) lower-triangular bool mask."""
    m = jnp.tril(jnp.ones((t, t), jnp.bool_))
    return m[None, None, :, :]
