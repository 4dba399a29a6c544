"""GQA/MQA decoder attention (ModelConfig.dec_kv_heads).

TPU-first design lever: the decode loop is KV-cache-bandwidth-bound
(docs/PERF.md roofline); sharing K/V across query-head groups divides
that traffic by dec_heads/dec_kv_heads.  Ladder: kernel vs jnp
reference (interpret), full greedy/beam token parity across the lean /
per-op Pallas / XLA paths (f32), teacher-forced gradients, and the
head-averaging warm-start conversion."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanodecoder_tpu.config import DecodeConfig, ModelConfig
from nanodecoder_tpu.models.model import decode_teacher_forced, init_model


def _cfg(nkv, **kw):
    base = dict(d_model=64, enc_layers=1, dec_layers=2, dec_heads=4,
                dec_kv_heads=nkv, dec_ffn_dim=128, enc_ffn_dim=128,
                max_decode_len=24, compute_dtype="float32",
                use_pallas=True, lean_step=True)
    base.update(kw)
    return ModelConfig(**base)


@pytest.mark.parametrize("nkv", [1, 2, 4])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_decode_attention_gqa_matches_reference(nkv, dtype, rng_np):
    from nanodecoder_tpu.ops.attention import (decode_attention,
                                               decode_attention_reference)

    b, t, heads, dh = 4, 24, 4, 16
    d, dk = heads * dh, nkv * dh
    q = jnp.asarray(rng_np.normal(size=(b, d)), dtype)
    k = jnp.asarray(rng_np.normal(size=(b, t, dk)), dtype)
    v = jnp.asarray(rng_np.normal(size=(b, t, dk)), dtype)
    vl = jnp.asarray(rng_np.integers(1, t + 1, size=(b,)), jnp.int32)
    ref = decode_attention_reference(q, k, v, vl, heads)
    got, _amax = decode_attention(q, k, v, vl, heads, interpret=True)
    atol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=atol, rtol=1e-2)


@pytest.mark.parametrize("nkv", [1, 2])
def test_gqa_greedy_token_parity_across_paths(nkv, rng_np):
    from nanodecoder_tpu.decode.greedy import greedy_decode

    cfg = _cfg(nkv)
    params = init_model(jax.random.PRNGKey(0), cfg)
    b, s = 4, 20
    memory = jnp.asarray(rng_np.normal(size=(b, s, cfg.d_model)) * 0.5, jnp.float32)
    lens = jnp.asarray([20, 15, 8, 20], jnp.int32)
    g_lean = greedy_decode(params, cfg, memory, lens)
    g_pallas = greedy_decode(params, dataclasses.replace(cfg, lean_step=False),
                             memory, lens)
    g_xla = greedy_decode(
        params, dataclasses.replace(cfg, lean_step=False, use_pallas=False),
        memory, lens)
    for other in (g_pallas, g_xla):
        for name in ("tokens", "lengths", "attn_pos"):
            np.testing.assert_array_equal(np.asarray(getattr(g_lean, name)),
                                          np.asarray(getattr(other, name)))


@pytest.mark.parametrize("nkv", [1, 2])
def test_gqa_beam_parity_and_cache_shape(nkv, rng_np):
    from nanodecoder_tpu.decode.beam import beam_decode
    from nanodecoder_tpu.models.model import init_decode_state

    cfg = _cfg(nkv)
    params = init_model(jax.random.PRNGKey(0), cfg)
    b, s = 3, 16
    memory = jnp.asarray(rng_np.normal(size=(b, s, cfg.d_model)) * 0.5, jnp.float32)
    lens = jnp.full((b,), s, jnp.int32)
    st = init_decode_state(params, cfg, memory, lens)
    dh = cfg.d_model // cfg.dec_heads
    # lean path: ONE combined (B, T, L*2*Dk) self cache + the 8-row
    # DMA staging block (ops/cache_update.BLOCK)
    from nanodecoder_tpu.ops.cache_update import BLOCK

    c_pad = -(-(cfg.dec_layers * 2 * nkv * dh) // 128) * 128
    assert st["self_kv"].shape == (b, cfg.max_decode_len, c_pad)
    assert st["self_kv_stage"].shape == (b, BLOCK, c_pad)
    assert st["layers"][0]["cross_k"].shape == (b, s, nkv, dh)
    st_unfolded = init_decode_state(
        params, dataclasses.replace(cfg, lean_step=False), memory, lens)
    assert st_unfolded["layers"][0]["self_k"].shape == (
        b, cfg.max_decode_len, nkv, dh)
    dcfg = DecodeConfig(beam_size=3, max_len=24, use_pallas=True)
    b1 = beam_decode(params, cfg, dcfg, memory, lens)
    b2 = beam_decode(params,
                     dataclasses.replace(cfg, use_pallas=False, lean_step=False),
                     dcfg, memory, lens)
    np.testing.assert_array_equal(np.asarray(b1.tokens), np.asarray(b2.tokens))
    np.testing.assert_allclose(np.asarray(b1.scores), np.asarray(b2.scores),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("nkv", [1, 4])
def test_bf16_lean_near_parity(nkv, rng_np):
    """bf16 fast mode: the lean (folded-weight) path may differ from
    the unfolded path only at near-ties — require >=98% token agreement
    and identical early-exit behavior (ADVICE r2: lean_step default
    changed bf16 numerics with only f32 parity asserted)."""
    from nanodecoder_tpu.decode.greedy import greedy_decode

    cfg = _cfg(nkv, compute_dtype="bfloat16")
    params = init_model(jax.random.PRNGKey(0), cfg)
    b, s = 8, 20
    memory = jnp.asarray(rng_np.normal(size=(b, s, cfg.d_model)) * 0.5,
                         jnp.bfloat16)
    lens = jnp.asarray(rng_np.integers(6, s + 1, size=(b,)), jnp.int32)
    g_lean = greedy_decode(params, cfg, memory, lens)
    g_unfolded = greedy_decode(params, dataclasses.replace(cfg, lean_step=False),
                               memory, lens)
    tl, tu = np.asarray(g_lean.tokens), np.asarray(g_unfolded.tokens)
    ll, lu = np.asarray(g_lean.lengths), np.asarray(g_unfolded.lengths)
    n_cmp = agree = 0
    for i in range(b):
        n = int(min(ll[i], lu[i]))
        n_cmp += max(n, 1)
        agree += int(np.sum(tl[i, :n] == tu[i, :n]))
    assert agree / n_cmp >= 0.98, (agree, n_cmp)


def test_gqa_teacher_forced_grads(rng_np):
    """GQA training path: loss is finite and K/V grads have the reduced
    shape."""
    cfg = _cfg(2)
    params = init_model(jax.random.PRNGKey(0), cfg)
    b, s, t = 2, 12, 6
    memory = jnp.asarray(rng_np.normal(size=(b, s, cfg.d_model)), jnp.float32)
    lens = jnp.full((b,), s, jnp.int32)
    tgt = jnp.asarray(rng_np.integers(0, cfg.vocab_size, (b, t)), jnp.int32)

    def loss_fn(p):
        lp, _ = decode_teacher_forced(p, cfg, tgt, memory, lens)
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], axis=-1))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gk = grads["decoder"]["layers"][0]["self_attn"]["k"]["w"]
    assert gk.shape == (cfg.d_model, 2 * (cfg.d_model // cfg.dec_heads))
    assert float(jnp.max(jnp.abs(gk))) > 0


def test_kmer_warm_start_partial_copy(rng_np):
    """scripts/make_kmer_flagship.py: vocabulary-independent leaves
    (encoder, decoder attention/FFN) copy exactly; embedding + generator
    keep the fresh init; the converted model decodes end-to-end."""
    from scripts.make_kmer_flagship import convert_params
    from nanodecoder_tpu.vocab import vocab_size_for

    src_cfg = _cfg(1, kmer_k=1, vocab_size=8)
    src = init_model(jax.random.PRNGKey(0), src_cfg)
    tgt_cfg = dataclasses.replace(src_cfg, kmer_k=2,
                                  vocab_size=vocab_size_for(2))
    template = init_model(jax.random.PRNGKey(7), tgt_cfg)
    p2, n_copied, n_fresh = convert_params(src, template)
    assert n_fresh == 3  # tgt embedding + generator w/b
    np.testing.assert_array_equal(
        np.asarray(p2["decoder"]["layers"][0]["self_attn"]["q"]["w"]),
        np.asarray(src["decoder"]["layers"][0]["self_attn"]["q"]["w"]))
    assert p2["generator"]["w"].shape == (src_cfg.d_model, vocab_size_for(2))
    np.testing.assert_array_equal(np.asarray(p2["generator"]["w"]),
                                  np.asarray(template["generator"]["w"]))
    from nanodecoder_tpu.decode.greedy import greedy_decode

    memory = jnp.asarray(rng_np.normal(size=(2, 10, src_cfg.d_model)), jnp.float32)
    g = greedy_decode(p2, tgt_cfg, memory, jnp.full((2,), 10, jnp.int32))
    assert g.tokens.shape == (2, tgt_cfg.max_decode_len)


def test_mqa_warm_start_head_average(rng_np):
    """scripts/make_gqa_flagship.py conversion: averaging KV head
    blocks of an MHA checkpoint gives exactly the MHA output when all
    heads are identical, and runs end-to-end otherwise."""
    from scripts.make_gqa_flagship import convert_params

    cfg = _cfg(4)  # source: MHA (4 heads)
    params = init_model(jax.random.PRNGKey(0), cfg)
    tgt_cfg = dataclasses.replace(cfg, dec_kv_heads=1)
    p2 = convert_params(params, cfg, tgt_cfg)
    dh = cfg.d_model // cfg.dec_heads
    k2 = p2["decoder"]["layers"][0]["self_attn"]["k"]["w"]
    assert k2.shape == (cfg.d_model, dh)
    # The converted KV weight is the mean of the source head blocks.
    src = params["decoder"]["layers"][0]["self_attn"]["k"]["w"]
    np.testing.assert_allclose(
        np.asarray(k2),
        np.asarray(src.reshape(cfg.d_model, cfg.dec_heads, dh).mean(axis=1)),
        rtol=1e-6)
    # And the converted model decodes without error.
    from nanodecoder_tpu.decode.greedy import greedy_decode

    memory = jnp.asarray(rng_np.normal(size=(2, 10, cfg.d_model)), jnp.float32)
    lens = jnp.full((2,), 10, jnp.int32)
    g = greedy_decode(p2, tgt_cfg, memory, lens)
    assert g.tokens.shape == (2, cfg.max_decode_len)
