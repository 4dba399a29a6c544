"""Signal encoders: conv front-end + (transformer | biLSTM) body.

Reference analog (SURVEY.md §2.1): the audio-style conv front-end that
downsamples raw samples in time, feeding either an RNN encoder
(onmt/encoders/rnn_encoder.py) or a transformer encoder
(onmt/encoders/transformer.py).  Both bodies produce a memory bank the
decoder cross-attends over.

TPU-first re-design:
  * conv stack uses NWC `lax.conv_general_dilated` with SAME padding and
    static strides — XLA maps these onto the MXU.
  * transformer body is the flagship (pure matmul, MXU-friendly).
  * the biLSTM body exists for reference parity; it runs as a single
    fused `lax.scan` over time with both directions batched together in
    one cell matmul (one scan, 2x batch) instead of the reference's
    cuDNN call.
  * valid-sample masks are carried through downsampling so padded tail
    chunks attend correctly (SURVEY.md §7 R4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nanodecoder_tpu.config import ModelConfig
from nanodecoder_tpu.models import modules as nn


# ---------------------------------------------------------------------------
# conv front-end


def init_conv_frontend(key, cfg: ModelConfig):
    layers = []
    in_ch = 1
    keys = jax.random.split(key, len(cfg.conv_channels) + 1)
    for i, (ch, ker) in enumerate(zip(cfg.conv_channels, cfg.conv_kernels)):
        w = nn.glorot(keys[i], (ker, in_ch, ch))  # (width, in, out) for NWC
        layers.append({"w": w, "b": jnp.zeros((ch,), jnp.float32)})
        in_ch = ch
    proj = nn.init_dense(keys[-1], in_ch, cfg.d_model)
    return {"convs": layers, "proj": proj, "ln": nn.init_layer_norm(cfg.d_model)}


def conv_frontend(p, cfg: ModelConfig, signal, lengths):
    """signal: (B, S) float; lengths: (B,) valid samples.
    Returns (x, out_lengths): x (B, S', d_model), S' = S / prod(strides)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    x = signal.astype(dtype)[:, :, None]  # (B, S, 1) NWC
    out_lengths = lengths
    for layer, stride in zip(p["convs"], cfg.conv_strides):
        # Explicit symmetric padding k//2 (torch Conv1d convention) —
        # XLA "SAME" pads asymmetrically under stride>1, which would
        # shift every window vs a reference-imported checkpoint.
        k = layer["w"].shape[0]
        # No preferred_element_type here: a f32 accumulation dtype with
        # bf16 operands breaks the conv transpose rule under AD (f32
        # cotangent vs bf16 filter); the TPU MXU accumulates in f32
        # internally regardless.
        x = jax.lax.conv_general_dilated(
            x,
            layer["w"].astype(dtype),
            window_strides=(stride,),
            padding=((k // 2, k // 2),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ).astype(dtype)
        x = jax.nn.relu(x + layer["b"].astype(dtype))
        out_lengths = jnp.ceil(out_lengths / stride).astype(lengths.dtype)
    x = nn.dense(p["proj"], x)
    x = nn.layer_norm(p["ln"], x)
    return x, out_lengths


# ---------------------------------------------------------------------------
# transformer encoder body


def init_transformer_encoder(key, cfg: ModelConfig):
    keys = jax.random.split(key, cfg.enc_layers)
    layers = []
    for k in keys:
        k1, k2 = jax.random.split(k)
        layers.append(
            {
                "ln1": nn.init_layer_norm(cfg.d_model),
                "attn": nn.init_mha(k1, cfg.d_model, cfg.enc_heads),
                "ln2": nn.init_layer_norm(cfg.d_model),
                "ffn": nn.init_ffn(k2, cfg.d_model, cfg.enc_ffn_dim),
            }
        )
    return {"layers": layers, "ln_out": nn.init_layer_norm(cfg.d_model)}


def transformer_encoder(p, cfg: ModelConfig, x, enc_lengths, rng=None, train=False):
    """Pre-norm transformer over the downsampled signal.
    x: (B, T, D); enc_lengths: (B,).  Returns memory bank (B, T, D)."""
    t = x.shape[1]
    valid = nn.length_mask(enc_lengths, t)  # (B, T)
    attn_mask = valid[:, None, None, :]  # (B, 1, 1, T) keys masked
    for i, layer in enumerate(p["layers"]):
        r1 = r2 = None
        if train and rng is not None:
            rng, r1, r2 = jax.random.split(rng, 3)
        h = nn.layer_norm(layer["ln1"], x)
        if cfg.use_pallas and not train:
            # Inference hot path: flash-style Pallas attention — XLA's
            # einsum materializes the f32 (B, H, S, S) logits to HBM
            # (~2.5 ms/layer at b=256, S=256 — device trace, round 3);
            # the kernel keeps scores/probs in VMEM.  Training keeps
            # the differentiable XLA path.  The natural-layout (B, S, D)
            # kernel slices heads on the lane dim IN-kernel: the
            # round-3 head-flattened layout cost three (B, S, H, Dh)
            # transpose copies in + one out per layer — ~12 ms of the
            # 42 ms b512 program, more than the kernel itself (round-4
            # device trace; 3.66 -> 1.86 ms/layer measured).
            from nanodecoder_tpu.ops.encoder_attention import (
                flash_encoder_attention_nld)

            ap = layer["attn"]
            ctx = flash_encoder_attention_nld(
                nn.dense(ap["q"], h), nn.dense(ap["k"], h),
                nn.dense(ap["v"], h), enc_lengths, cfg.enc_heads,
                interpret=jax.default_backend() != "tpu")
            a = nn.dense(ap["o"], ctx)
        else:
            a, _ = nn.mha(layer["attn"], cfg.enc_heads, h, h, attn_mask,
                          cfg.dropout, r1, train)
        x = x + nn.dropout(a, cfg.dropout, r1, train)
        h = nn.layer_norm(layer["ln2"], x)
        f = nn.ffn(layer["ffn"], h, cfg.dropout, r2, train)
        x = x + nn.dropout(f, cfg.dropout, r2, train)
    x = nn.layer_norm(p["ln_out"], x)
    # Zero padded positions so downstream consumers can't leak them.
    return x * valid[:, :, None].astype(x.dtype)


# ---------------------------------------------------------------------------
# lean serving encoder: LN affines folded into the adjacent matmuls,
# fused QKV, every weight pre-cast to the compute dtype ONCE per run.
#
# Device-trace evidence (bench_results/trace_greedy_b512_r04_final.txt;
# VERDICT r4 weak #4): with f32 master params as jit arguments, every
# program execution re-staged six f32[256,256] weight tensors (plus
# biases) through async copies and re-ran the f32->bf16 converts inside
# the LN/FFN convert_reduce fusions — the largest post-loop trace terms.
# Folding host-side (prepare_serving_params) makes the program's weight
# operands bf16-resident; the f32 masters never cross into the program.
# Same fold identity as the decoder lean path (models/decoder.py):
#   layer_norm(x) @ W + b == normalize(x) @ (g ⊙_rows W) + (b_ln @ W + b)


def fold_encoder_lean(p_enc, cfg: ModelConfig, dtype):
    """Encoder params -> pre-folded, pre-cast serving weights.
    Transformer body only (the biLSTM path keeps the standard apply)."""
    from nanodecoder_tpu.models.decoder import _fold_ln_dense

    fe = p_enc["frontend"]
    frontend = {
        "convs": [{"w": l["w"].astype(dtype), "b": l["b"].astype(dtype)}
                  for l in fe["convs"]],
        "proj": {"w": fe["proj"]["w"].astype(dtype),
                 "b": fe["proj"]["b"].astype(dtype)},
        # Frontend LN affine cannot fold forward: the positional
        # encoding is added between it and layer 1's ln1.
        "ln": fe["ln"],
    }
    layers = []
    for layer in p_enc["body"]["layers"]:
        ap, ff = layer["attn"], layer["ffn"]
        wq, bq = _fold_ln_dense(layer["ln1"], ap["q"], dtype)
        wk, bk = _fold_ln_dense(layer["ln1"], ap["k"], dtype)
        wv, bv = _fold_ln_dense(layer["ln1"], ap["v"], dtype)
        wf1, bf1 = _fold_ln_dense(layer["ln2"], ff["in"], dtype)
        layers.append({
            "w_qkv": jnp.concatenate([wq, wk, wv], axis=1),
            "b_qkv": jnp.concatenate([bq, bk, bv]),
            "o": {"w": ap["o"]["w"].astype(dtype),
                  "b": ap["o"]["b"].astype(dtype)},
            "w_f1": wf1, "b_f1": bf1,
            "w_f2": ff["out"]["w"].astype(dtype),
            "b_f2": ff["out"]["b"].astype(dtype),
        })
    return {"frontend": frontend, "layers": layers,
            "ln_out": p_enc["body"]["ln_out"]}


def transformer_encoder_lean(lean, cfg: ModelConfig, x, enc_lengths):
    """Serving-only pre-norm transformer over folded weights.
    x: (B, T, D) compute-dtype; returns memory bank (B, T, D)."""
    from nanodecoder_tpu.models.decoder import _ln_normalize

    t = x.shape[1]
    d = cfg.d_model
    valid = nn.length_mask(enc_lengths, t)
    attn_mask = valid[:, None, None, :]
    use_pallas = cfg.use_pallas
    for layer in lean["layers"]:
        h = _ln_normalize(x)
        qkv = h @ layer["w_qkv"] + layer["b_qkv"]   # (B, T, 3D) one matmul
        if use_pallas:
            from nanodecoder_tpu.ops.encoder_attention import (
                flash_encoder_attention_qkv)

            ctx = flash_encoder_attention_qkv(
                qkv, enc_lengths, cfg.enc_heads,
                interpret=jax.default_backend() != "tpu")
        else:
            q = nn._split_heads(qkv[..., :d], cfg.enc_heads)
            k = nn._split_heads(qkv[..., d:2 * d], cfg.enc_heads)
            v = nn._split_heads(qkv[..., 2 * d:], cfg.enc_heads)
            ctx, _ = nn.attention_core(q, k, v, attn_mask)
            ctx = nn._merge_heads(ctx)
        x = x + nn.dense(layer["o"], ctx)
        h = _ln_normalize(x)
        x = x + jax.nn.relu(h @ layer["w_f1"] + layer["b_f1"]) @ layer["w_f2"] \
            + layer["b_f2"]
    x = nn.layer_norm(lean["ln_out"], x)
    return x * valid[:, :, None].astype(x.dtype)


def encoder_apply_lean(lean, cfg: ModelConfig, signal, lengths):
    """Folded-weights serving encoder: conv front-end + lean body."""
    x, enc_lengths = conv_frontend(lean["frontend"], cfg, signal, lengths)
    pe = nn.sinusoidal_positions(x.shape[1], cfg.d_model).astype(x.dtype)
    x = x + pe[None, :, :]
    mem = transformer_encoder_lean(lean, cfg, x, enc_lengths)
    return mem, enc_lengths


# ---------------------------------------------------------------------------
# biLSTM encoder body (reference-parity path)


def init_lstm_cell(key, in_dim: int, hidden: int):
    k1, k2 = jax.random.split(key)
    return {
        "wx": nn.glorot(k1, (in_dim, 4 * hidden)),
        "wh": nn.glorot(k2, (hidden, 4 * hidden)),
        "b": jnp.zeros((4 * hidden,), jnp.float32),
    }


def lstm_cell(p, x_t, h, c):
    """Standard LSTM cell; gate order i, f, g, o."""
    gates = x_t @ p["wx"].astype(x_t.dtype) + h @ p["wh"].astype(x_t.dtype) + p["b"].astype(x_t.dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def init_lstm_encoder(key, cfg: ModelConfig):
    """Stacked biLSTM: each layer has one fwd and one bwd cell; layer
    output is the concat projected back to d_model."""
    layers = []
    keys = jax.random.split(key, cfg.enc_layers)
    in_dim = cfg.d_model
    for k in keys:
        kf, kb, kp = jax.random.split(k, 3)
        layers.append(
            {
                "fwd": init_lstm_cell(kf, in_dim, cfg.lstm_hidden),
                "bwd": init_lstm_cell(kb, in_dim, cfg.lstm_hidden),
                "proj": nn.init_dense(kp, 2 * cfg.lstm_hidden, cfg.d_model),
            }
        )
        in_dim = cfg.d_model
    return {"layers": layers, "ln_out": nn.init_layer_norm(cfg.d_model)}


def _lstm_direction(cell, xs, h0, c0, reverse: bool):
    """Scan one direction over time. xs: (T, B, D)."""

    def step(carry, x_t):
        h, c = carry
        h, c = lstm_cell(cell, x_t, h, c)
        return (h, c), h

    _, ys = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    return ys  # (T, B, H)


def lstm_encoder(p, cfg: ModelConfig, x, enc_lengths, rng=None, train=False):
    """x: (B, T, D) -> memory bank (B, T, D).

    Padded positions are zeroed on input of each layer; the backward
    direction scans the full padded buffer (padding contributes zeros,
    and outputs at padded positions are masked out at the end), which
    keeps shapes static — the tradeoff vs the reference's
    pack_padded_sequence (SURVEY.md §3.4) is a little wasted compute for
    zero host-side bookkeeping."""
    b, t, _ = x.shape
    valid = nn.length_mask(enc_lengths, t)  # (B, T)
    vmask = valid.T[:, :, None]  # (T, B, 1)
    hdim = cfg.lstm_hidden
    dtype = x.dtype
    xs = x.transpose(1, 0, 2)  # (T, B, D)
    for layer in p["layers"]:
        xs = xs * vmask.astype(dtype)
        h0 = jnp.zeros((b, hdim), dtype)
        c0 = jnp.zeros((b, hdim), dtype)
        yf = _lstm_direction(layer["fwd"], xs, h0, c0, reverse=False)
        yb = _lstm_direction(layer["bwd"], xs, h0, c0, reverse=True)
        xs = nn.dense(layer["proj"], jnp.concatenate([yf, yb], axis=-1))
    out = xs.transpose(1, 0, 2)
    out = nn.layer_norm(p["ln_out"], out)
    return out * valid[:, :, None].astype(dtype)


# ---------------------------------------------------------------------------
# full encoder


def init_encoder(key, cfg: ModelConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"frontend": init_conv_frontend(k1, cfg)}
    if cfg.encoder_type == "transformer":
        p["body"] = init_transformer_encoder(k2, cfg)
    elif cfg.encoder_type == "lstm":
        p["body"] = init_lstm_encoder(k2, cfg)
    else:
        raise ValueError(f"unknown encoder_type {cfg.encoder_type!r}")
    del k3
    return p


def encoder_apply(p, cfg: ModelConfig, signal, lengths, rng=None, train=False):
    """signal (B, S), lengths (B,) -> (memory_bank (B, T, D), enc_lengths (B,))."""
    x, enc_lengths = conv_frontend(p["frontend"], cfg, signal, lengths)
    if cfg.encoder_type == "transformer":
        pe = nn.sinusoidal_positions(x.shape[1], cfg.d_model).astype(x.dtype)
        x = x + pe[None, :, :]
        mem = transformer_encoder(p["body"], cfg, x, enc_lengths, rng, train)
    else:
        mem = lstm_encoder(p["body"], cfg, x, enc_lengths, rng, train)
    return mem, enc_lengths
