"""Fused decoder-layer step kernel tests (ops/decoder_layer.py).

Ladder (SURVEY.md §4 consequence 1-2): kernel in interpreter mode vs
the pure-jnp reference; the reference vs the unfused module path at the
step level; and the fused full greedy decode vs the unfused paths at
the TOKEN level (argmax-stable in f32)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanodecoder_tpu.config import ModelConfig
from nanodecoder_tpu.models.decoder import init_transformer_decoder
from nanodecoder_tpu.ops.decoder_layer import (decoder_layer_step,
                                               decoder_layer_step_reference,
                                               fuse_layer_weights)


def _tiny_cfg(**kw):
    base = dict(d_model=64, enc_layers=1, dec_layers=2, dec_heads=4,
                dec_ffn_dim=128, enc_ffn_dim=128, max_decode_len=24,
                compute_dtype="float32", use_pallas=True, fused_step=True)
    base.update(kw)
    return ModelConfig(**base)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("b,t,s,step", [(8, 16, 24, 5), (4, 12, 8, 0), (8, 16, 24, 15)])
def test_fused_layer_kernel_matches_reference(dtype, b, t, s, step, rng_np):
    cfg = _tiny_cfg()
    d = cfg.d_model
    layer = init_transformer_decoder(jax.random.PRNGKey(0), cfg)["layers"][0]
    y = jnp.asarray(rng_np.normal(size=(b, d)), dtype)
    sk = jnp.asarray(rng_np.normal(size=(b, t, d)), dtype)
    sv = jnp.asarray(rng_np.normal(size=(b, t, d)), dtype)
    ck = jnp.asarray(rng_np.normal(size=(b, s, d)), dtype)
    cv = jnp.asarray(rng_np.normal(size=(b, s, d)), dtype)
    stepj = jnp.asarray(step, jnp.int32)
    ml = jnp.asarray(rng_np.integers(1, s + 1, size=(b,)), jnp.int32)
    w = fuse_layer_weights(layer, dtype)
    ref = decoder_layer_step_reference(y, sk, sv, ck, cv, stepj, ml, w, cfg.dec_heads)
    got = decoder_layer_step(y, sk, sv, ck, cv, stepj, ml, w, cfg.dec_heads,
                             interpret=True)
    atol = 2e-5 if dtype == jnp.float32 else 8e-2
    for name, r, g in zip(["y", "k_new", "v_new"], ref[:3], got[:3]):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   atol=atol, rtol=1e-2, err_msg=name)
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))


def test_fused_reference_matches_module_step(rng_np):
    """The fused-layer reference must agree with the unfused module
    path (transformer_decoder_step with use_pallas=False) for a
    single-layer model at one step."""
    from nanodecoder_tpu.models.decoder import (init_transformer_cache,
                                                transformer_decoder_step)

    cfg = _tiny_cfg(dec_layers=1, use_pallas=False, fused_step=False)
    d = cfg.d_model
    b, s, t = 4, 10, cfg.max_decode_len
    p = init_transformer_decoder(jax.random.PRNGKey(1), cfg)
    memory = jnp.asarray(rng_np.normal(size=(b, s, d)), jnp.float32)
    ml = jnp.asarray([10, 7, 3, 10], jnp.int32)
    state = init_transformer_cache(p, cfg, memory, ml, b, jnp.float32)

    # Run two unfused steps to populate the cache, capture the second.
    y_a = jnp.asarray(rng_np.normal(size=(b, 1, d)), jnp.float32)
    y_b = jnp.asarray(rng_np.normal(size=(b, 1, d)), jnp.float32)
    _, _, state1 = transformer_decoder_step(p, cfg, y_a, state)
    out2, _, _ = transformer_decoder_step(p, cfg, y_b, state1)

    # Fused reference at step=1 with the same cache contents.
    cache = state1["layers"][0]
    h, dh = cfg.dec_heads, d // cfg.dec_heads
    w = fuse_layer_weights(p["layers"][0], jnp.float32)
    y_ref, _, _, _ = decoder_layer_step_reference(
        y_b[:, 0, :], cache["self_k"].reshape(b, t, d),
        cache["self_v"].reshape(b, t, d), cache["cross_k"].reshape(b, s, d),
        cache["cross_v"].reshape(b, s, d), jnp.asarray(1, jnp.int32), ml, w,
        cfg.dec_heads)
    # out2 has the final ln_out applied; apply it to the reference too.
    from nanodecoder_tpu.models import modules as nn

    y_ref = nn.layer_norm(p["ln_out"], y_ref[:, None, :])
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(out2),
                               atol=2e-5, rtol=1e-3)


def test_fused_greedy_decode_token_parity(rng_np):
    """Full greedy decode: fused path == per-op Pallas path == XLA path
    at the token level (f32)."""
    from nanodecoder_tpu.decode.greedy import greedy_decode
    from nanodecoder_tpu.models.model import init_model

    cfg = _tiny_cfg()
    params = init_model(jax.random.PRNGKey(0), cfg)
    b, s = 4, 20
    memory = jnp.asarray(rng_np.normal(size=(b, s, cfg.d_model)) * 0.5, jnp.float32)
    lens = jnp.asarray([20, 15, 8, 20], jnp.int32)
    g_fused = greedy_decode(params, cfg, memory, lens)
    g_pallas = greedy_decode(params, dataclasses.replace(cfg, fused_step=False),
                             memory, lens)
    g_xla = greedy_decode(params, dataclasses.replace(cfg, use_pallas=False),
                          memory, lens)
    for other in (g_pallas, g_xla):
        np.testing.assert_array_equal(np.asarray(g_fused.tokens),
                                      np.asarray(other.tokens))
        np.testing.assert_array_equal(np.asarray(g_fused.lengths),
                                      np.asarray(other.lengths))
        np.testing.assert_array_equal(np.asarray(g_fused.attn_pos),
                                      np.asarray(other.attn_pos))
        np.testing.assert_allclose(np.asarray(g_fused.token_log_probs),
                                   np.asarray(other.token_log_probs),
                                   atol=1e-5, rtol=1e-4)


def test_fused_state_excluded_for_beam_and_int8(rng_np):
    """fusedw is only added on the greedy bf16/f32 path."""
    from nanodecoder_tpu.models.decoder import init_transformer_cache

    cfg = _tiny_cfg()
    p = init_transformer_decoder(jax.random.PRNGKey(0), cfg)
    b, s = 2, 8
    memory = jnp.asarray(rng_np.normal(size=(b, s, cfg.d_model)), jnp.float32)
    ml = jnp.full((b,), s, jnp.int32)
    st = init_transformer_cache(p, cfg, memory, ml, b, jnp.float32)
    assert "fusedw" in st
    st_beam = init_transformer_cache(p, cfg, memory, ml, b, jnp.float32, beam_k=3)
    assert "fusedw" not in st_beam
    cfg_i8 = dataclasses.replace(cfg, cross_cache_int8=True)
    st_i8 = init_transformer_cache(p, cfg_i8, memory, ml, b, jnp.float32)
    assert "fusedw" not in st_i8
