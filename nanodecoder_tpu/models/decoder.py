"""Attention decoders: transformer (KV cache) and input-feed RNN (Luong).

Reference analog (SURVEY.md §2.1): onmt/decoders/transformer.py (self +
cross attention, incremental per-layer state cache — the reference's
KV-cache analog) and onmt/decoders/decoder.py (InputFeedRNNDecoder with
GlobalAttention).

TPU-first re-design: the decoder exposes TWO pure entry points —

  decode_teacher_forced(params, cfg, tgt_in, memory, ...) — full-T pass
      for training (all timesteps at once, causal mask; MXU-sized
      matmuls instead of the reference's per-step python loop).

  decoder_step(params, cfg, token_emb, state) -> (hidden, new_state) —
      one-token step with explicit state, shaped so the entire decode
      loop fits inside `lax.while_loop` on device (SURVEY.md §3.2: the
      reference's key inefficiency is one host round-trip per token).

State layout (all fixed-shape, donated across steps):
  transformer: per layer {k: (B, Tmax, H, Dh), v: ...} self cache written
      with dynamic_update_slice at `step`, plus precomputed cross K/V.
  rnn: per layer (h, c) + input-feed context vector.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from nanodecoder_tpu.config import ModelConfig
from nanodecoder_tpu.models import modules as nn
from nanodecoder_tpu.models.encoder import init_lstm_cell, lstm_cell


# ---------------------------------------------------------------------------
# transformer decoder


def init_transformer_decoder(key, cfg: ModelConfig):
    keys = jax.random.split(key, cfg.dec_layers)
    layers = []
    for k in keys:
        k1, k2, k3 = jax.random.split(k, 3)
        layers.append(
            {
                "ln1": nn.init_layer_norm(cfg.d_model),
                "self_attn": nn.init_mha(k1, cfg.d_model, cfg.dec_heads,
                                         kv_heads=cfg.dec_kv),
                "ln2": nn.init_layer_norm(cfg.d_model),
                "cross_attn": nn.init_mha(k2, cfg.d_model, cfg.dec_heads,
                                          kv_heads=cfg.dec_kv),
                "ln3": nn.init_layer_norm(cfg.d_model),
                "ffn": nn.init_ffn(k3, cfg.d_model, cfg.dec_ffn_dim),
            }
        )
    return {"layers": layers, "ln_out": nn.init_layer_norm(cfg.d_model)}


def transformer_decoder_forced(p, cfg: ModelConfig, y, memory, mem_lengths,
                               rng=None, train=False):
    """Teacher-forced full-sequence pass.
    y: (B, T, D) embedded target inputs; memory: (B, S, D).
    Returns hidden states (B, T, D) and the last layer's cross-attention
    probs (B, H, T, S) (reference parity: attention maps are surfaced to
    the translation builder, SURVEY.md §2.1)."""
    t = y.shape[1]
    s = memory.shape[1]
    self_mask = nn.causal_mask(t)
    cross_mask = nn.length_mask(mem_lengths, s)[:, None, None, :]
    attn_probs = None
    for layer in p["layers"]:
        r1 = r2 = r3 = None
        if train and rng is not None:
            rng, r1, r2, r3 = jax.random.split(rng, 4)
        h = nn.layer_norm(layer["ln1"], y)
        a, _ = nn.mha(layer["self_attn"], cfg.dec_heads, h, h, self_mask,
                      kv_heads=cfg.dec_kv)
        y = y + nn.dropout(a, cfg.dropout, r1, train)
        h = nn.layer_norm(layer["ln2"], y)
        a, attn_probs = nn.mha(layer["cross_attn"], cfg.dec_heads, h, memory,
                               cross_mask, kv_heads=cfg.dec_kv)
        y = y + nn.dropout(a, cfg.dropout, r2, train)
        h = nn.layer_norm(layer["ln3"], y)
        f = nn.ffn(layer["ffn"], h, cfg.dropout, r3, train)
        y = y + nn.dropout(f, cfg.dropout, r3, train)
    return nn.layer_norm(p["ln_out"], y), attn_probs


def init_transformer_cache(p, cfg: ModelConfig, memory, mem_lengths, batch: int,
                           dtype, beam_k: int = 1) -> dict[str, Any]:
    """Build the fixed-shape decode state: precompute cross K/V per layer
    (memory projections happen once per chunk batch, not once per token)
    and allocate zeroed self-attention caches of length max_decode_len.

    beam_k > 1: `memory` is the UNtiled (B, S, D) chunk batch and the
    decode rows are (B*beam_k) beams in chunk-major order.  Only the
    path-dependent self caches are allocated per beam; cross K/V and
    masks stay per-chunk — they are beam-invariant, so the grouped
    attention kernel streams each chunk's cache from HBM once per step
    for all K beams (1/K the cross traffic, the beam decode's dominant
    HBM cost — docs/PERF.md roofline)."""
    tmax = cfg.max_decode_len
    hk, dh = cfg.dec_kv, cfg.d_model // cfg.dec_heads
    layers = []
    quant = cfg.cross_cache_int8
    # Lean path: ONE combined self cache for all layers, layout
    # (rows, T, L, 2*Dk) with layer l's [K|V] row contiguous last.
    # The per-layer design cost six ~37 us dynamic-update-slices per
    # decode step (v5e device trace, b=256 — latency-bound, not
    # byte-bound); combined, the step writes one slice and the beam
    # reorder gathers one tensor instead of six (measured 8,506 vs
    # 8,177 ks/s greedy).  A time-major (T, rows, L, 2Dk) variant was
    # measured TOO (contiguous per-step write): 7,403 ks/s — the
    # leading-T einsums push the folded bias vectors out of VMEM and
    # the loop restages 11 of them per step; row-major wins.
    combined = cfg.decoder_type == "transformer" and cfg.lean_step
    for layer in p["layers"]:
        ck, cv = nn.mha_project_kv(layer["cross_attn"], cfg.dec_heads, memory,
                                   kv_heads=hk)
        entry = {} if combined else {
            "self_k": jnp.zeros((batch * beam_k, tmax, hk, dh), dtype),
            "self_v": jnp.zeros((batch * beam_k, tmax, hk, dh), dtype),
        }
        if quant:
            # int8 storage with per-(row, lane) scales: the decode
            # loop's dominant HBM traffic (cross reads) halves; the
            # scales fold exactly into the attention math
            # (ops/attention.quantize_cache_int8).
            from nanodecoder_tpu.ops.attention import quantize_cache_int8

            b_, s_, _, _ = ck.shape
            dk = hk * dh
            kq, ks = quantize_cache_int8(ck.reshape(b_, s_, dk))
            vq, vs = quantize_cache_int8(cv.reshape(b_, s_, dk))
            entry.update(cross_k=kq.reshape(b_, s_, hk, dh),
                         cross_v=vq.reshape(b_, s_, hk, dh),
                         cross_k_scale=ks, cross_v_scale=vs)
        else:
            entry.update(cross_k=ck, cross_v=cv)
        layers.append(entry)
    s = memory.shape[1]
    state = {
        "layers": layers,
        "cross_mask": nn.length_mask(mem_lengths, s)[:, None, None, :],
        "mem_lengths": mem_lengths.astype(jnp.int32),
        "step": jnp.zeros((), jnp.int32),
    }
    if combined:
        # 3-D (rows, T, L*2*Dk), written per step by an in-place Pallas
        # DMA of the current aligned 8-row block (ops/cache_update —
        # XLA's DUS on this T-minor-tiled buffer RMW'd every tile,
        # 131-166 us/step in the device trace).  self_kv_stage carries
        # the block's rows between steps.  Rows beyond `step` are zeros
        # and always masked.
        from nanodecoder_tpu.ops.cache_update import BLOCK

        assert tmax % BLOCK == 0, (
            f"max_decode_len must be a multiple of {BLOCK} for the "
            f"block-DMA cache write; got {tmax}")
        c = len(p["layers"]) * 2 * hk * dh
        # Lane dim padded to a 128 multiple: Mosaic DMA slices must be
        # lane-tile-aligned.  The pad bytes are dead weight, never read.
        c_pad = -(-c // 128) * 128
        state["self_kv"] = jnp.zeros((batch * beam_k, tmax, c_pad), dtype)
        state["self_kv_stage"] = jnp.zeros((batch * beam_k, BLOCK, c_pad),
                                           dtype)
    return state


def _attn_step(attn_params, n_heads, h, k_cache, v_cache, mask4d, valid_lens,
               use_pallas: bool, k_scale=None, v_scale=None):
    """One-token attention against a cached K/V — either the fused
    Pallas kernel (TPU hot path) or the jnp path.  k_cache/v_cache:
    (B, T, H, Dh); h: (Brows, 1, D) where Brows is B or B*group — when
    Brows > B, `group` consecutive rows (the beams of one chunk) share
    cache row Brows//B (beam-grouped cross attention).  k_scale/v_scale
    ((B, Dk) where Dk = kv_heads * head_dim) mark int8-quantized caches;
    the int8 scale fold is MHA-only, so int8 + GQA routes to the XLA
    fallback below.  Returns (out, probs_or_None,
    argmax_or_None): the Pallas kernel never materializes probs but
    emits the head-mean argmax position directly."""
    b, t, nh, dh = k_cache.shape  # nh = KV head count (GQA: <= n_heads)
    group = h.shape[0] // b
    d = nh * dh
    # Path choice, measured on v5e (MQA flagship): the Pallas kernels'
    # block-diagonal formulation was built for MHA (where it won 3.7x
    # over XLA) but wastes n_heads/kv_heads of its MXU lanes under
    # GQA/MQA — the XLA grouped einsum measured 14,306 vs 8,500 ks/s
    # greedy (b=256) and 3,078 vs 2,339 beam (b=64, despite the
    # fallback's repeated caches).  So GQA/MQA always routes to XLA;
    # the kernels serve MHA configs.  (The int8 scale fold is also
    # MHA-only.)
    if nh != n_heads:
        use_pallas = False
    if use_pallas:
        from nanodecoder_tpu.ops.attention import (decode_attention,
                                                   decode_attention_grouped)

        q = nn.dense(attn_params["q"], h)[:, 0, :]  # (Brows, D)
        interp = jax.default_backend() != "tpu"
        if group > 1:
            ctx, amax = decode_attention_grouped(
                q, k_cache.reshape(b, t, d), v_cache.reshape(b, t, d),
                valid_lens, n_heads, group, k_scale=k_scale, v_scale=v_scale,
                interpret=interp,
            )
        else:
            ctx, amax = decode_attention(
                q, k_cache.reshape(b, t, d), v_cache.reshape(b, t, d),
                valid_lens, n_heads, k_scale=k_scale, v_scale=v_scale,
                interpret=interp,
            )
        return nn.dense(attn_params["o"], ctx[:, None, :]), None, amax
    if k_scale is not None:
        # XLA fallback: dequantize (the traffic win is Pallas-only).
        from nanodecoder_tpu.ops.attention import dequantize_cache_int8

        cdt = h.dtype
        k_cache = dequantize_cache_int8(
            k_cache.reshape(b, t, d), k_scale, cdt).reshape(b, t, nh, dh)
        v_cache = dequantize_cache_int8(
            v_cache.reshape(b, t, d), v_scale, cdt).reshape(b, t, nh, dh)
    if group > 1:
        # Beam-grouped XLA attention: the K beams of a chunk share one
        # cross cache, so the cache stays (B, T, Hk, Dh) and only the
        # QUERY carries the beam dim.  The earlier fallback tiled the
        # caches with jnp.repeat — at b=128 K=5 MQA that materialized a
        # (128, 5, 256, 32) broadcast per K and V per layer EVERY step
        # (~126 MB/step, the largest term of the round-4 beam trace).
        r = n_heads // nh
        q = nn.dense(attn_params["q"], h)            # (B*g, 1, D)
        q5 = q.reshape(b, group, nh, r, dh)
        scores = jnp.einsum("bgkrd,btkd->bgkrt", q5, k_cache,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(dh))
        # cross_mask is per-chunk (B, 1, 1, T) -> broadcast over (g, k, r)
        m = mask4d[:, None, :, :, :] if mask4d.ndim == 4 else mask4d
        scores = jnp.where(m.reshape(b, 1, 1, 1, t), scores, nn.NEG_INF)
        p = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bgkrt,btkd->bgkrd", p.astype(v_cache.dtype),
                         v_cache)
        out = nn.dense(attn_params["o"],
                       ctx.reshape(b * group, 1, n_heads * dh))
        probs = p.reshape(b * group, n_heads, 1, t)
        return out, probs, None
    a, probs = nn.mha_step(attn_params, n_heads, h, k_cache, v_cache, mask4d)
    return a, probs, None


# ---------------------------------------------------------------------------
# lean decode path: LN affines + biases folded into the adjacent matmuls
#
# Device-trace evidence (docs/PERF.md round-2 continued): at batch 256
# the while-body restages ~8 small f32 param vectors (ln2 scales/biases,
# generator bias) into VMEM EVERY step (~100 us in-flight each), and the
# per-op chain runs 3 separate Q/K/V projections per layer.  Folding
#   layer_norm(x) @ W + b  ==  normalize(x) @ (g[:, None] * W)
#                              + (b_ln @ W + b)
# removes the LN affine params from the loop entirely, concatenates
# self Q/K/V into ONE matmul, and pre-casts every matrix to the compute
# dtype once per decode program.  The final ln_out affine folds into the
# f32 generator the same way.  The folded pytree is a CLOSURE of the
# decode loop body (never a while-loop carry — carried weights measured
# catastrophically slow on the fused-kernel path).


def _ln_normalize(x, eps: float = 1e-6):
    """layer_norm without the affine (it is folded into the next matmul).
    Reduction in f32 like nn.layer_norm (SURVEY §7 R2)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _fold_ln_dense(ln, dense_p, dtype):
    """Fold an LN affine into a following dense: returns (w', b')
    with w' = g ⊙_rows W (compute dtype) and b' = b_ln @ W + b."""
    g = ln["scale"].astype(jnp.float32)
    bl = ln["bias"].astype(jnp.float32)
    w = dense_p["w"].astype(jnp.float32)
    b = dense_p["b"].astype(jnp.float32) if "b" in dense_p else 0.0
    w2 = (g[:, None] * w).astype(dtype)
    b2 = (bl @ w + b).astype(dtype)
    return w2, b2


def fold_lean_params(p_dec, p_gen, cfg: ModelConfig, dtype):
    """Decoder + generator params -> folded decode-loop weights."""
    layers = []
    for layer in p_dec["layers"]:
        sa, ca, ff = layer["self_attn"], layer["cross_attn"], layer["ffn"]
        wq, bq = _fold_ln_dense(layer["ln1"], sa["q"], dtype)
        wk, bk = _fold_ln_dense(layer["ln1"], sa["k"], dtype)
        wv, bv = _fold_ln_dense(layer["ln1"], sa["v"], dtype)
        wcq, bcq = _fold_ln_dense(layer["ln2"], ca["q"], dtype)
        wf1, bf1 = _fold_ln_dense(layer["ln3"], ff["in"], dtype)
        layers.append({
            "w_qkv": jnp.concatenate([wq, wk, wv], axis=1),
            "b_qkv": jnp.concatenate([bq, bk, bv]),
            "self_o": {"w": sa["o"]["w"].astype(dtype),
                       "b": sa["o"]["b"].astype(dtype)},
            "cross_q": {"w": wcq, "b": bcq},
            "cross_o": {"w": ca["o"]["w"].astype(dtype),
                        "b": ca["o"]["b"].astype(dtype)},
            "w_f1": wf1, "b_f1": bf1,
            "w_f2": ff["out"]["w"].astype(dtype),
            "b_f2": ff["out"]["b"].astype(dtype),
        })
    # Generator stays f32 (R2 parity: logits/argmax in f32) with the
    # ln_out affine folded in.
    gw = p_dec["ln_out"]["scale"].astype(jnp.float32)[:, None] \
        * p_gen["w"].astype(jnp.float32)
    gb = p_dec["ln_out"]["bias"].astype(jnp.float32) @ p_gen["w"].astype(jnp.float32) \
        + p_gen["b"].astype(jnp.float32)
    return {"layers": layers, "gen_w": gw, "gen_b": gb}


def prepare_decode_params(params, cfg: ModelConfig, dtype):
    """Augment `params` with the folded lean-decode weights (transformer
    greedy/sampling path).  Call OUTSIDE the decode while_loop; the body
    closes over the result."""
    if cfg.decoder_type != "transformer" or not cfg.lean_step:
        return params
    if "_lean" in params:  # already folded once per run (serving params)
        return params
    return {**params,
            "_lean": fold_lean_params(params["decoder"], params["generator"],
                                      cfg, dtype)}


def _transformer_decoder_step_lean(lean, cfg: ModelConfig, y1, state):
    """Lean one-token decode (folded weights).  Returns the FINAL
    normalized hidden WITHOUT the ln_out affine (folded into the
    generator): (hidden (B, 1, D), (None, amax), new_state)."""
    step = state["step"]
    tmax = cfg.max_decode_len
    b = y1.shape[0]
    nh, dh = cfg.dec_heads, cfg.d_model // cfg.dec_heads
    d = nh * dh
    dk = cfg.dec_kv * dh
    pos = jnp.arange(tmax)
    self_mask = (pos <= step)[None, None, None, :]
    at_cur = (pos == step)[None, :, None, None]   # bcast to (B, T, Hk, Dh)
    # The barrier pins the carried cache to its storage dtype: without
    # it XLA hoists the scores-einsum f32 upcast of the bf16 cache INTO
    # the loop carry, doubling self-cache HBM traffic (device trace).
    # Self caches of ALL layers live in ONE (B, T, L, 2*Dk) tensor
    # (init_transformer_cache): attention reads the cache with the
    # current token's K/V row substituted by a where-select at `step`
    # (elementwise identical to updating first), and the six per-layer
    # dynamic-update-slices (~37 us fixed cost each, v5e device trace)
    # collapse into ONE combined write at the end of the step.
    kv_read = jax.lax.optimization_barrier(state["self_kv"])
    if "self_path" in state:
        # Beam path-indirection mode (DecodeConfig.path_reorder): cache
        # rows live in WRITE-TIME frame (slot r, step s) = the K/V of
        # whatever beam occupied slot r at step s; the cache is never
        # physically permuted.  self_path[b, j, s] names the slot whose
        # step-s row belongs to current beam j's ancestry, so the
        # masked self-attention read gathers through it — the same
        # bytes the read always streamed, with the per-step 2x-cache
        # permute replaced by a (B, K, T) int32 path update.
        path = state["self_path"]                     # (B, K, T)
        bq, kk, _ = path.shape
        kv4 = kv_read.reshape(bq, kk, tmax, kv_read.shape[2])
        kv_read = jnp.take_along_axis(
            kv4, path[:, :, :, None], axis=1).reshape(b, tmax, -1)
    new_rows = []
    amax = None
    for i, (ll, cache) in enumerate(zip(lean["layers"], state["layers"])):
        h = _ln_normalize(y1)                               # (B, 1, D)
        qkv = h @ ll["w_qkv"] + ll["b_qkv"]                 # (B, 1, D+2Dk)
        q1 = qkv[..., :d]
        k1 = nn._split_heads(qkv[..., d:d + dk], cfg.dec_kv)
        v1 = nn._split_heads(qkv[..., d + dk:], cfg.dec_kv)
        k_c = kv_read[:, :tmax, 2 * dk * i:2 * dk * i + dk].reshape(
            b, tmax, cfg.dec_kv, dh)
        v_c = kv_read[:, :tmax, 2 * dk * i + dk:2 * dk * (i + 1)].reshape(
            b, tmax, cfg.dec_kv, dh)
        k_use = jnp.where(at_cur, k1, k_c)  # k1 (B,1,Hk,Dh) bcasts over T
        v_use = jnp.where(at_cur, v1, v_c)
        a, _ = nn.attention_core(nn._split_heads(q1, nh), k_use, v_use,
                                 self_mask)
        y1 = y1 + nn.dense(ll["self_o"], nn._merge_heads(a))
        h = _ln_normalize(y1)
        a, _probs, am = _attn_step(
            {"q": ll["cross_q"], "o": ll["cross_o"]}, nh, h,
            cache["cross_k"], cache["cross_v"], state["cross_mask"],
            state["mem_lengths"], cfg.use_pallas,
            k_scale=cache.get("cross_k_scale"),
            v_scale=cache.get("cross_v_scale"),
        )
        if am is not None:
            amax = am
        elif _probs is not None and i == len(lean["layers"]) - 1:
            # Head-mean argmax from the LAST layer only (the alignment
            # consumers read the final cross-attention) — computing it
            # per layer cost ~2 ms/batch of (B, K, H) reduce chains in
            # the round-4 beam trace.
            pm = jnp.mean(_probs[:, :, 0, :].astype(jnp.float32), axis=1)
            amax = jnp.argmax(pm, axis=-1).astype(jnp.int32)
        y1 = y1 + a
        h = _ln_normalize(y1)
        y1 = y1 + jax.nn.relu(h @ ll["w_f1"] + ll["b_f1"]) @ ll["w_f2"] + ll["b_f2"]
        new_rows.append(qkv[..., d:])                        # (B, 1, 2Dk)
    n_layers = len(lean["layers"])
    c_pad = state["self_kv"].shape[2]
    if c_pad > n_layers * 2 * dk:  # lane-tile pad (see init)
        new_rows.append(jnp.zeros(
            (b, 1, c_pad - n_layers * 2 * dk), qkv.dtype))
    rows = jnp.concatenate(new_rows, axis=2)                 # (B, 1, C_pad)
    # Stage the current aligned 8-step block (elementwise select — no
    # DUS) and flush it with one in-place DMA (ops/cache_update): XLA's
    # DUS on the T-minor cache layout RMW'd every tile (~131 us/step
    # measured); the DMA moves only the block's bytes.
    from nanodecoder_tpu.ops.cache_update import BLOCK, write_cache_block

    local = step % BLOCK
    iota8 = jnp.arange(BLOCK)[None, :, None]
    stage = jnp.where(
        iota8 == local, rows.astype(state["self_kv_stage"].dtype),
        jnp.where(iota8 < local, state["self_kv_stage"], 0))
    self_kv = write_cache_block(state["self_kv"], stage, step)
    out = _ln_normalize(y1)  # ln_out affine lives in the folded generator
    new_state = {**state, "self_kv": self_kv, "self_kv_stage": stage,
                 "step": step + 1}
    return out, (None, amax), new_state


def transformer_decoder_step(p, cfg: ModelConfig, y1, state):
    """One-token decode. y1: (B, 1, D) embedded current token.
    Returns (hidden (B, 1, D), cross-attn probs (B, H, 1, S) or None
    when the Pallas path is active, new state)."""
    assert "self_kv" not in state, (
        "state was initialized for the lean (combined-cache) path; the "
        "unfolded step needs per-layer caches — init with lean_step=False "
        "(beam coverage mode does this) or route through the lean step")
    step = state["step"]
    tmax = cfg.max_decode_len
    b = y1.shape[0]
    # Self-attention key mask: positions <= step are valid.
    pos = jnp.arange(tmax)
    self_mask = (pos <= step)[None, None, None, :]  # (1,1,1,Tmax)
    self_valid = jnp.full((b,), step + 1, jnp.int32)
    new_layers = []
    attn_probs = None
    attn_amax = None
    for layer, cache in zip(p["layers"], state["layers"]):
        h = nn.layer_norm(layer["ln1"], y1)
        # Project this token's K/V and write them into the cache at `step`.
        k1 = nn._split_heads(nn.dense(layer["self_attn"]["k"], h), cfg.dec_kv)
        v1 = nn._split_heads(nn.dense(layer["self_attn"]["v"], h), cfg.dec_kv)
        self_k = jax.lax.dynamic_update_slice_in_dim(cache["self_k"], k1, step, axis=1)
        self_v = jax.lax.dynamic_update_slice_in_dim(cache["self_v"], v1, step, axis=1)
        # Self-attention always takes the XLA path: XLA streams the
        # loop-carried caches at the HBM roofline (~121 us/step at
        # b=128 — 126 MB of K/V per step, right at spec bandwidth)
        # while the Pallas kernel measured ~378 us (extra copies in/out
        # of the loop carry).  Pallas wins only for cross-attention,
        # where XLA's 1-token einsum lowering is ~5x off the roofline.
        a, _, _ = _attn_step(layer["self_attn"], cfg.dec_heads, h, self_k, self_v,
                             self_mask, self_valid, False)
        y1 = y1 + a
        h = nn.layer_norm(layer["ln2"], y1)
        a, attn_probs, attn_amax = _attn_step(
            layer["cross_attn"], cfg.dec_heads, h,
            cache["cross_k"], cache["cross_v"], state["cross_mask"],
            state["mem_lengths"], cfg.use_pallas,
            k_scale=cache.get("cross_k_scale"),
            v_scale=cache.get("cross_v_scale"),
        )
        y1 = y1 + a
        h = nn.layer_norm(layer["ln3"], y1)
        y1 = y1 + nn.ffn(layer["ffn"], h)
        new_layers.append({**cache, "self_k": self_k, "self_v": self_v})
    out = nn.layer_norm(p["ln_out"], y1)
    new_state = {**state, "layers": new_layers, "step": step + 1}
    return out, (attn_probs, attn_amax), new_state


# ---------------------------------------------------------------------------
# input-feed RNN decoder with Luong attention (reference-parity path)


def init_global_attention(key, d_model: int, score: str):
    """Luong attention (reference: onmt/modules/global_attention.py).
    score: dot | general | mlp.  The score *type* lives in ModelConfig,
    not in the params pytree (pytree leaves must be arrays)."""
    p: dict[str, Any] = {}
    if score == "general":
        p["wa"] = nn.init_dense(key, d_model, d_model, use_bias=False)
    elif score == "mlp":
        k1, k2, k3 = jax.random.split(key, 3)
        p["wq"] = nn.init_dense(k1, d_model, d_model, use_bias=False)
        p["wk"] = nn.init_dense(k2, d_model, d_model, use_bias=True)
        p["va"] = nn.init_dense(k3, d_model, 1, use_bias=False)
    k_out = jax.random.fold_in(key, 7)
    p["wo"] = nn.init_dense(k_out, 2 * d_model, d_model, use_bias=(score == "mlp"))
    return p


def global_attention(p, query, memory, mem_mask, score_type: str = "general"):
    """query: (B, D); memory: (B, S, D); mem_mask: (B, S) bool.
    Returns (attended context->output (B, D), probs (B, S))."""
    if score_type == "dot":
        scores = jnp.einsum("bd,bsd->bs", query, memory, preferred_element_type=jnp.float32)
    elif score_type == "general":
        scores = jnp.einsum("bd,bsd->bs", nn.dense(p["wa"], query), memory,
                            preferred_element_type=jnp.float32)
    elif score_type == "mlp":
        q = nn.dense(p["wq"], query)[:, None, :]
        k = nn.dense(p["wk"], memory)
        scores = nn.dense(p["va"], jnp.tanh(q + k))[..., 0].astype(jnp.float32)
    else:
        raise ValueError(f"unknown attention score {score_type!r}")
    scores = jnp.where(mem_mask, scores, nn.NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bs,bsd->bd", probs.astype(memory.dtype), memory)
    out = jnp.tanh(nn.dense(p["wo"], jnp.concatenate([ctx, query], axis=-1)))
    return out, probs


def init_rnn_decoder(key, cfg: ModelConfig):
    keys = jax.random.split(key, cfg.dec_layers + 1)
    layers = []
    # Input-feed: first layer consumes [embedding ; prev attn output].
    in_dim = 2 * cfg.d_model
    for k in keys[: cfg.dec_layers]:
        layers.append(init_lstm_cell(k, in_dim, cfg.d_model))
        in_dim = cfg.d_model
    return {
        "layers": layers,
        "attn": init_global_attention(keys[-1], cfg.d_model, cfg.rnn_attention),
    }


def init_rnn_state(cfg: ModelConfig, memory, mem_lengths, batch: int, dtype):
    d = cfg.d_model
    return {
        "hidden": [
            {"h": jnp.zeros((batch, d), dtype), "c": jnp.zeros((batch, d), dtype)}
            for _ in range(cfg.dec_layers)
        ],
        "input_feed": jnp.zeros((batch, d), dtype),
        "memory": memory,
        "mem_mask": nn.length_mask(mem_lengths, memory.shape[1]),
        "step": jnp.zeros((), jnp.int32),
    }


def rnn_decoder_step(p, cfg: ModelConfig, y1, state):
    """One input-feed RNN step. y1: (B, 1, D) embedded token."""
    x = jnp.concatenate([y1[:, 0, :], state["input_feed"]], axis=-1)
    new_hidden = []
    for cell, hc in zip(p["layers"], state["hidden"]):
        h, c = lstm_cell(cell, x, hc["h"], hc["c"])
        new_hidden.append({"h": h, "c": c})
        x = h
    attn_out, probs = global_attention(p["attn"], x, state["memory"], state["mem_mask"],
                                       cfg.rnn_attention)
    new_state = {
        **state,
        "hidden": new_hidden,
        "input_feed": attn_out,
        "step": state["step"] + 1,
    }
    return attn_out[:, None, :], probs[:, None, None, :], new_state


def rnn_decoder_forced(p, cfg: ModelConfig, y, memory, mem_lengths,
                       rng=None, train=False):
    """Teacher-forced RNN decode via lax.scan over time.
    y: (B, T, D). Returns (hidden (B, T, D), attn (B, 1, T, S))."""
    b = y.shape[0]
    dtype = y.dtype
    state0 = init_rnn_state(cfg, memory, mem_lengths, b, dtype)
    hidden0 = [(hc["h"], hc["c"]) for hc in state0["hidden"]]
    mem_mask = state0["mem_mask"]

    def step(carry, y_t):
        hidden, input_feed = carry
        x = jnp.concatenate([y_t, input_feed], axis=-1)
        new_hidden = []
        for cell, (h, c) in zip(p["layers"], hidden):
            h, c = lstm_cell(cell, x, h, c)
            new_hidden.append((h, c))
            x = h
        attn_out, probs = global_attention(p["attn"], x, memory, mem_mask,
                                           cfg.rnn_attention)
        return (new_hidden, attn_out), (attn_out, probs)

    ys = y.transpose(1, 0, 2)  # (T, B, D)
    (_, _), (outs, probs) = jax.lax.scan(
        step, (hidden0, state0["input_feed"]), ys
    )
    hidden = outs.transpose(1, 0, 2)
    attn = probs.transpose(1, 0, 2)[:, None, :, :]  # (B, 1, T, S)
    return hidden, attn
