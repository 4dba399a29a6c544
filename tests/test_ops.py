"""Pallas kernel tests — interpreter mode vs jnp reference
(SURVEY.md §4 consequence 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanodecoder_tpu.ops.attention import decode_attention, decode_attention_reference


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("b,t,heads,dh", [(4, 64, 4, 32), (3, 40, 2, 16)])
def test_decode_attention_matches_reference(dtype, b, t, heads, dh, rng_np):
    d = heads * dh
    q = jnp.asarray(rng_np.normal(size=(b, d)), dtype)
    k = jnp.asarray(rng_np.normal(size=(b, t, d)), dtype)
    v = jnp.asarray(rng_np.normal(size=(b, t, d)), dtype)
    valid = jnp.asarray(rng_np.integers(1, t + 1, size=(b,)), jnp.int32)
    ref = decode_attention_reference(q, k, v, valid, heads)
    got, amax = decode_attention(q, k, v, valid, heads, interpret=True)
    atol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=atol, rtol=1e-2
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("b,t,heads,dh,group", [(3, 64, 4, 32, 5), (2, 40, 2, 16, 3)])
def test_decode_attention_grouped_matches_reference(dtype, b, t, heads, dh,
                                                    group, rng_np):
    from nanodecoder_tpu.ops.attention import (
        decode_attention_grouped, decode_attention_grouped_reference)

    d = heads * dh
    q = jnp.asarray(rng_np.normal(size=(b * group, d)), dtype)
    k = jnp.asarray(rng_np.normal(size=(b, t, d)), dtype)
    v = jnp.asarray(rng_np.normal(size=(b, t, d)), dtype)
    valid = jnp.asarray(rng_np.integers(1, t + 1, size=(b,)), jnp.int32)
    ref = decode_attention_grouped_reference(q, k, v, valid, heads, group)
    got, amax = decode_attention_grouped(q, k, v, valid, heads, group,
                                         interpret=True)
    atol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=atol,
        rtol=1e-2)


def test_decode_attention_grouped_matches_ungrouped(rng_np):
    """group-tiled caches through the per-row kernel == grouped kernel
    (same math, 1/group the cache traffic); argmax positions included."""
    from nanodecoder_tpu.ops.attention import decode_attention_grouped

    b, t, heads, dh, group = 2, 32, 4, 16, 5
    d = heads * dh
    q = jnp.asarray(rng_np.normal(size=(b * group, d)), jnp.float32)
    k = jnp.asarray(rng_np.normal(size=(b, t, d)), jnp.float32)
    v = jnp.asarray(rng_np.normal(size=(b, t, d)), jnp.float32)
    valid = jnp.array([t, 11], jnp.int32)
    out_g, amax_g = decode_attention_grouped(q, k, v, valid, heads, group,
                                             interpret=True)
    k_t = jnp.repeat(k, group, axis=0)
    v_t = jnp.repeat(v, group, axis=0)
    len_t = jnp.repeat(valid, group, axis=0)
    out_u, amax_u = decode_attention(q, k_t, v_t, len_t, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_u), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(amax_g), np.asarray(amax_u))


@pytest.mark.parametrize("grouped", [False, True])
def test_decode_attention_int8_fold_is_exact(grouped, rng_np):
    """The int8 path's scale folding must equal attention over the
    DEQUANTIZED caches exactly (the only approximation is the int8
    rounding of the stored values, which the dequantized reference
    shares)."""
    from nanodecoder_tpu.ops.attention import (
        decode_attention_grouped, decode_attention_grouped_reference,
        dequantize_cache_int8, quantize_cache_int8)

    b, t, heads, dh, group = 2, 32, 4, 16, 3 if grouped else 1
    d = heads * dh
    q = jnp.asarray(rng_np.normal(size=(b * group, d)), jnp.float32)
    k = jnp.asarray(rng_np.normal(size=(b, t, d)), jnp.float32)
    v = jnp.asarray(rng_np.normal(size=(b, t, d)), jnp.float32)
    valid = jnp.array([t, 13], jnp.int32)
    kq, ks = quantize_cache_int8(k)
    vq, vs = quantize_cache_int8(v)
    k_dq = dequantize_cache_int8(kq, ks, jnp.float32)
    v_dq = dequantize_cache_int8(vq, vs, jnp.float32)
    ref = decode_attention_grouped_reference(q, k_dq, v_dq, valid, heads, group)
    if grouped:
        got, _ = decode_attention_grouped(q, kq, vq, valid, heads, group,
                                          k_scale=ks, v_scale=vs,
                                          interpret=True)
    else:
        got, _ = decode_attention(q, kq, vq, valid, heads,
                                  k_scale=ks, v_scale=vs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # And the quantization error itself is small vs the exact caches.
    exact = decode_attention_grouped_reference(q, k, v, valid, heads, group)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=0.05,
                               rtol=0.05)


def test_decode_step_int8_cross_cache_close(rng_np):
    """decode_step with cross_cache_int8 stays close to the exact path
    (same tokens aside from near-ties; log-probs within ~1e-2)."""
    import dataclasses as dc

    from nanodecoder_tpu.config import tiny_test_config
    from nanodecoder_tpu.models.model import (decode_step, encode,
                                              init_decode_state, init_model)

    cfg = tiny_test_config().model
    params = init_model(jax.random.PRNGKey(0), cfg)
    sig = jnp.asarray(rng_np.normal(size=(2, 256)), jnp.float32)
    lens = jnp.full((2,), 256, jnp.int32)
    memory, mem_len = encode(params, cfg, sig, lens)
    toks = jnp.array([1, 1], jnp.int32)

    base_state = init_decode_state(params, cfg, memory, mem_len)
    lp0, pos0, _ = decode_step(params, cfg, toks, base_state)

    cfg_q = dc.replace(cfg, cross_cache_int8=True)
    q_state = init_decode_state(params, cfg_q, memory, mem_len)
    assert q_state["layers"][0]["cross_k"].dtype == jnp.int8
    lp1, pos1, _ = decode_step(params, cfg_q, toks, q_state)
    np.testing.assert_allclose(np.asarray(lp0), np.asarray(lp1), atol=2e-2)


def test_decode_attention_respects_valid_len(rng_np):
    """Positions >= valid must not influence the output."""
    b, t, heads, dh = 2, 32, 2, 16
    d = heads * dh
    q = jnp.asarray(rng_np.normal(size=(b, d)), jnp.float32)
    k = jnp.asarray(rng_np.normal(size=(b, t, d)), jnp.float32)
    v = jnp.asarray(rng_np.normal(size=(b, t, d)), jnp.float32)
    valid = jnp.array([5, 17], jnp.int32)
    out1, _ = decode_attention(q, k, v, valid, heads, interpret=True)
    # Corrupt the invalid tail — output must be identical.
    k2 = k.at[0, 5:].set(99.0).at[1, 17:].set(-99.0)
    v2 = v.at[0, 5:].set(99.0).at[1, 17:].set(-99.0)
    out2, _ = decode_attention(q, k2, v2, valid, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_reference_matches_modules_mha_step(rng_np):
    """The (B,T,D)-layout kernel semantics must equal the (B,T,H,Dh)
    attention core used by the decoder."""
    from nanodecoder_tpu.models import modules as nn

    b, t, heads, dh = 2, 24, 4, 8
    d = heads * dh
    q = jnp.asarray(rng_np.normal(size=(b, d)), jnp.float32)
    k = jnp.asarray(rng_np.normal(size=(b, t, d)), jnp.float32)
    v = jnp.asarray(rng_np.normal(size=(b, t, d)), jnp.float32)
    valid = jnp.array([24, 10], jnp.int32)
    ref = decode_attention_reference(q, k, v, valid, heads)
    mask = nn.length_mask(valid, t)[:, None, None, :]
    core, _ = nn.attention_core(
        q.reshape(b, 1, heads, dh),
        k.reshape(b, t, heads, dh),
        v.reshape(b, t, heads, dh),
        mask,
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(core.reshape(b, d)), atol=1e-5
    )


def test_greedy_decode_pallas_parity(rng_np):
    """Full greedy decode with the Pallas attention step (interpret
    mode) must produce byte-identical tokens vs the jnp path."""
    import dataclasses

    from nanodecoder_tpu.config import tiny_test_config
    from nanodecoder_tpu.decode.greedy import greedy_decode
    from nanodecoder_tpu.models.model import encode, init_model

    cfg = tiny_test_config().model
    params = init_model(jax.random.PRNGKey(11), cfg)
    signal = jnp.asarray(rng_np.normal(size=(2, 256)).astype(np.float32))
    lengths = jnp.array([256, 200], jnp.int32)
    memory, mem_len = encode(params, cfg, signal, lengths)

    res_jnp = greedy_decode(params, cfg, memory, mem_len)
    cfg_p = dataclasses.replace(cfg, use_pallas=True)
    res_pal = greedy_decode(params, cfg_p, memory, mem_len)
    np.testing.assert_array_equal(np.asarray(res_jnp.tokens), np.asarray(res_pal.tokens))
    np.testing.assert_allclose(
        np.asarray(res_jnp.token_log_probs), np.asarray(res_pal.token_log_probs),
        atol=1e-4,
    )


@pytest.mark.parametrize("b,k,v,n_out", [(3, 5, 8, 10), (2, 3, 8, 6), (1, 1, 8, 2)])
def test_beam_topk_matches_reference(b, k, v, n_out, rng_np):
    from nanodecoder_tpu.ops.beam_step import beam_topk, beam_topk_reference

    alive = jnp.asarray(rng_np.normal(size=(b, k)).astype(np.float32))
    lp = jnp.asarray(rng_np.normal(size=(b, k, v)).astype(np.float32))
    ref_s, ref_i = beam_topk_reference(alive, lp, n_out)
    got_s, got_i = beam_topk(alive, lp, n_out, interpret=True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))


def test_beam_topk_tie_break_lowest_index():
    from nanodecoder_tpu.ops.beam_step import beam_topk

    alive = jnp.zeros((1, 2), jnp.float32)
    lp = jnp.zeros((1, 2, 4), jnp.float32)  # all ties
    s, i = beam_topk(alive, lp, 3, interpret=True)
    np.testing.assert_array_equal(np.asarray(i[0]), [0, 1, 2])


def test_beam_decode_pallas_parity(rng_np):
    """Full beam decode with both Pallas kernels (interpret mode) must
    match the jnp path exactly."""
    import dataclasses

    from nanodecoder_tpu.config import tiny_test_config
    from nanodecoder_tpu.decode.beam import beam_decode
    from nanodecoder_tpu.models.model import encode, init_model

    cfg = tiny_test_config().model
    params = init_model(jax.random.PRNGKey(12), cfg)
    signal = jnp.asarray(rng_np.normal(size=(2, 256)).astype(np.float32))
    lengths = jnp.array([256, 180], jnp.int32)
    memory, mem_len = encode(params, cfg, signal, lengths)
    dcfg = dataclasses.replace(tiny_test_config().decode, mode="beam", beam_size=3)

    res = beam_decode(params, cfg, dcfg, memory, mem_len)
    cfg_p = dataclasses.replace(cfg, use_pallas=True)
    dcfg_p = dataclasses.replace(dcfg, use_pallas=True)
    res_p = beam_decode(params, cfg_p, dcfg_p, memory, mem_len)
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(res_p.tokens))
    np.testing.assert_allclose(np.asarray(res.scores), np.asarray(res_p.scores), atol=1e-4)


def test_decode_attention_argmax_output(rng_np):
    """The kernel's argmax output must equal the reference head-mean
    attention argmax (lowest index on ties)."""
    b, t, heads, dh = 3, 32, 4, 16
    d = heads * dh
    q = jnp.asarray(rng_np.normal(size=(b, d)), jnp.float32)
    k = jnp.asarray(rng_np.normal(size=(b, t, d)), jnp.float32)
    v = jnp.asarray(rng_np.normal(size=(b, t, d)), jnp.float32)
    valid = jnp.array([32, 20, 7], jnp.int32)
    _, amax = decode_attention(q, k, v, valid, heads, interpret=True)
    # reference probs
    import math
    qh = np.asarray(q).reshape(b, heads, dh)
    kh = np.asarray(k).reshape(b, t, heads, dh)
    logits = np.einsum("bhd,bthd->bht", qh, kh) / math.sqrt(dh)
    mask = np.arange(t)[None, None, :] < np.asarray(valid)[:, None, None]
    logits = np.where(mask, logits, -1e9)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = p.mean(1).argmax(-1)
    np.testing.assert_array_equal(np.asarray(amax), want)
    assert (np.asarray(amax) < np.asarray(valid)).all()


@pytest.mark.parametrize("b,k,v", [(3, 5, 8), (2, 3, 8), (1, 1, 8)])
def test_beam_advance_matches_topk_path(b, k, v, rng_np):
    """The fused advance kernel must reproduce the lax.top_k-based
    selection exactly: top-2K ids, alive set, merged finished set."""
    from nanodecoder_tpu.ops.beam_step import beam_advance

    eos = 2
    alive = jnp.asarray(rng_np.normal(size=(b, k)).astype(np.float32))
    lp = jnp.asarray(rng_np.normal(size=(b, k, v)).astype(np.float32))
    fin = jnp.asarray(rng_np.normal(size=(b, k)).astype(np.float32))
    pen = jnp.asarray(2.5, jnp.float32)

    top_ids, a_s, a_i, f_s, f_i = beam_advance(alive, lp, fin, pen, k, v, eos,
                                               interpret=True)

    flat = (alive[:, :, None] + lp).reshape(b, k * v)
    ref_ts, ref_ti = jax.lax.top_k(flat, 2 * k)
    tok = ref_ti % v
    is_eos = tok == eos
    ref_as, ref_ai = jax.lax.top_k(jnp.where(is_eos, -1e9, ref_ts), k)
    allf = jnp.concatenate([fin, jnp.where(is_eos, ref_ts / pen, -1e9)], axis=1)
    ref_fs, ref_fi = jax.lax.top_k(allf, k)

    np.testing.assert_array_equal(np.asarray(top_ids), np.asarray(ref_ti))
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(ref_as), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a_i), np.asarray(ref_ai))
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(ref_fs), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(f_i), np.asarray(ref_fi))


def test_reorder_decode_state_beam_matches_flat_gather(rng_np):
    """One-hot matmul beam reorder == flat leading-dim gather."""
    from nanodecoder_tpu.config import tiny_test_config
    from nanodecoder_tpu.models.model import (encode, init_decode_state,
                                              init_model, reorder_decode_state,
                                              reorder_decode_state_beam)

    cfg = tiny_test_config().model
    params = init_model(jax.random.PRNGKey(5), cfg)
    bsz, k = 2, 3
    signal = jnp.asarray(rng_np.normal(size=(bsz * k, 256)).astype(np.float32))
    lengths = jnp.full((bsz * k,), 256, jnp.int32)
    memory, mem_len = encode(params, cfg, signal, lengths)
    state = init_decode_state(params, cfg, memory, mem_len)
    # write something nonzero into the combined self cache (lean layout)
    state["self_kv"] = jnp.asarray(
        rng_np.normal(size=state["self_kv"].shape).astype(np.float32))
    origin = jnp.asarray(rng_np.integers(0, k, size=(bsz, k)).astype(np.int32))
    flat = (jnp.arange(bsz)[:, None] * k + origin).reshape(-1)

    got = reorder_decode_state_beam(state, origin)
    ref = reorder_decode_state(state, flat)
    np.testing.assert_array_equal(np.asarray(got["self_kv"]),
                                  np.asarray(ref["self_kv"]))
    for gc, rc in zip(got["layers"], ref["layers"]):
        # cross K/V must be untouched (beam-invariant)
        np.testing.assert_array_equal(np.asarray(gc["cross_k"]), np.asarray(rc["cross_k"]))

    # per-layer (unfolded) layout: same equivalence
    import dataclasses as dc

    state_u = init_decode_state(params, dc.replace(cfg, lean_step=False),
                                memory, mem_len)
    for c in state_u["layers"]:
        c["self_k"] = jnp.asarray(
            rng_np.normal(size=c["self_k"].shape).astype(np.float32))
        c["self_v"] = jnp.asarray(
            rng_np.normal(size=c["self_v"].shape).astype(np.float32))
    got_u = reorder_decode_state_beam(state_u, origin)
    ref_u = reorder_decode_state(state_u, flat)
    for gc, rc in zip(got_u["layers"], ref_u["layers"]):
        np.testing.assert_array_equal(np.asarray(gc["self_k"]), np.asarray(rc["self_k"]))
        np.testing.assert_array_equal(np.asarray(gc["self_v"]), np.asarray(rc["self_v"]))


class TestEncoderAttention:
    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_kernel_matches_reference(self, rng_np, dtype):
        import jax.numpy as jnp

        from nanodecoder_tpu.ops.encoder_attention import (
            encoder_attention_reference, flash_encoder_attention)

        b, s, h, dh = 3, 64, 4, 16
        dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
        q = jnp.asarray(rng_np.normal(size=(b, s, h, dh)), dt)
        k = jnp.asarray(rng_np.normal(size=(b, s, h, dh)), dt)
        v = jnp.asarray(rng_np.normal(size=(b, s, h, dh)), dt)
        lens = jnp.asarray([s, s // 2, 5], jnp.int32)
        ref = encoder_attention_reference(q, k, v, lens)
        got = flash_encoder_attention(q, k, v, lens, interpret=True)
        atol = 2e-5 if dtype == "float32" else 5e-2
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=atol, rtol=1e-2)

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_nld_kernel_matches_reference(self, rng_np, dtype):
        """Natural-layout (B, S, D) kernel == 4-D reference (heads are
        lane slices; _split_heads is a pure reshape, so merging the
        reference's output over lanes is the same layout)."""
        import jax.numpy as jnp

        from nanodecoder_tpu.ops.encoder_attention import (
            encoder_attention_reference, flash_encoder_attention_nld)

        b, s, h, dh = 3, 64, 4, 16
        dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
        q = jnp.asarray(rng_np.normal(size=(b, s, h, dh)), dt)
        k = jnp.asarray(rng_np.normal(size=(b, s, h, dh)), dt)
        v = jnp.asarray(rng_np.normal(size=(b, s, h, dh)), dt)
        lens = jnp.asarray([s, s // 2, 5], jnp.int32)
        ref = encoder_attention_reference(q, k, v, lens).reshape(b, s, h * dh)
        got = flash_encoder_attention_nld(
            q.reshape(b, s, h * dh), k.reshape(b, s, h * dh),
            v.reshape(b, s, h * dh), lens, h, interpret=True)
        atol = 2e-5 if dtype == "float32" else 5e-2
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=atol, rtol=1e-2)

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_qkv_kernel_matches_reference(self, rng_np, dtype):
        """Fused-QKV (B, S, 3D) kernel == 4-D reference — the lean
        serving encoder's hot path (the QKV slab is the projection
        matmul's natural output; Q/K/V and heads are lane slices taken
        in-kernel)."""
        import jax.numpy as jnp

        from nanodecoder_tpu.ops.encoder_attention import (
            encoder_attention_reference, flash_encoder_attention_qkv)

        b, s, h, dh = 3, 64, 4, 16
        dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
        q = jnp.asarray(rng_np.normal(size=(b, s, h, dh)), dt)
        k = jnp.asarray(rng_np.normal(size=(b, s, h, dh)), dt)
        v = jnp.asarray(rng_np.normal(size=(b, s, h, dh)), dt)
        lens = jnp.asarray([s, s // 2, 5], jnp.int32)
        ref = encoder_attention_reference(q, k, v, lens).reshape(b, s, h * dh)
        qkv = jnp.concatenate([q.reshape(b, s, h * dh),
                               k.reshape(b, s, h * dh),
                               v.reshape(b, s, h * dh)], axis=-1)
        got = flash_encoder_attention_qkv(qkv, lens, h, interpret=True)
        atol = 2e-5 if dtype == "float32" else 5e-2
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=atol, rtol=1e-2)

    def test_full_encoder_parity(self, rng_np):
        """Pallas-encoder output == XLA-encoder output (f32, eval)."""
        import dataclasses as dc

        import jax
        import jax.numpy as jnp

        from nanodecoder_tpu.config import tiny_test_config
        from nanodecoder_tpu.models.model import encode, init_model

        cfg = tiny_test_config().model
        params = init_model(jax.random.PRNGKey(2), cfg)
        sig = jnp.asarray(rng_np.normal(size=(3, 256)).astype(np.float32))
        lens = jnp.asarray([256, 200, 96], jnp.int32)
        m_xla, l_xla = encode(params, dc.replace(cfg, use_pallas=False), sig, lens)
        m_pl, l_pl = encode(params, dc.replace(cfg, use_pallas=True), sig, lens)
        np.testing.assert_array_equal(np.asarray(l_xla), np.asarray(l_pl))
        np.testing.assert_allclose(np.asarray(m_pl), np.asarray(m_xla),
                                   atol=2e-5, rtol=1e-4)


class TestCacheUpdateKernel:
    """Interpret-mode coverage of the Pallas DMA cache writer — the
    round-3 decode win whose kernel body previously ran ONLY on TPU
    (VERDICT r3 weak #4).  The dynamic_update_slice fallback is the
    semantic oracle; f32 comparisons are bit-exact."""

    def _ref(self, cache, slab, step):
        import jax

        from nanodecoder_tpu.ops.cache_update import BLOCK

        t0 = (int(step) // BLOCK) * BLOCK
        return jax.lax.dynamic_update_slice_in_dim(
            cache, slab.astype(cache.dtype), t0, axis=1)

    @pytest.mark.parametrize("step", [0, 3, 7, 8, 11, 15, 56, 63])
    def test_interpret_matches_fallback_f32(self, rng_np, step):
        """Every position of an 8-block (edges included) and the first/
        last block of the cache, bit-for-bit in f32."""
        import jax.numpy as jnp

        from nanodecoder_tpu.ops.cache_update import BLOCK, write_cache_block

        b, t, c = 3, 64, 256  # c: lane-tile aligned (128 multiple)
        cache = jnp.asarray(rng_np.normal(size=(b, t, c)).astype(np.float32))
        slab = jnp.asarray(
            rng_np.normal(size=(b, BLOCK, c)).astype(np.float32))
        got = write_cache_block(cache, slab, jnp.int32(step), interpret=True)
        ref = self._ref(cache, slab, step)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_interpret_lane_padded_c(self, rng_np):
        """C = 384 (3 lane tiles) — the decoder's padded combined-cache
        lane dim (init_transformer_cache pads C to a 128 multiple)."""
        import jax.numpy as jnp

        from nanodecoder_tpu.ops.cache_update import BLOCK, write_cache_block

        b, t, c = 2, 32, 384
        cache = jnp.asarray(rng_np.normal(size=(b, t, c)).astype(np.float32))
        slab = jnp.asarray(
            rng_np.normal(size=(b, BLOCK, c)).astype(np.float32))
        for step in (5, 24, 31):
            got = write_cache_block(cache, slab, jnp.int32(step),
                                    interpret=True)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(self._ref(cache, slab, step)))

    def test_interpret_bf16_slab_semantics(self, rng_np):
        """bf16 cache (the serving dtype): the slab is cast to the cache
        dtype and ONLY the aligned block changes — rows outside the
        block are untouched bytes."""
        import jax.numpy as jnp

        from nanodecoder_tpu.ops.cache_update import BLOCK, write_cache_block

        b, t, c = 2, 48, 128
        cache = jnp.asarray(rng_np.normal(size=(b, t, c)), jnp.bfloat16)
        slab = jnp.asarray(rng_np.normal(size=(b, BLOCK, c)).astype(np.float32))
        step = 19  # block [16, 24)
        got = np.asarray(write_cache_block(cache, slab, jnp.int32(step),
                                           interpret=True), np.float32)
        ref = np.asarray(self._ref(cache, slab, step), np.float32)
        np.testing.assert_array_equal(got, ref)
        # untouched rows are bit-identical to the input cache
        cache_np = np.asarray(cache, np.float32)
        np.testing.assert_array_equal(got[:, :16], cache_np[:, :16])
        np.testing.assert_array_equal(got[:, 24:], cache_np[:, 24:])

    def test_decode_loop_parity_interpret_vs_fallback(self, rng_np):
        """The lean decode step drives the kernel exactly as production
        does (stage + flush every step): a short greedy decode with the
        interpret-mode kernel must equal the fallback path token-for-
        token.  Guards the stage/flush protocol, not just one write."""
        import dataclasses as dc
        from unittest import mock

        import jax
        import jax.numpy as jnp

        from nanodecoder_tpu import ops
        from nanodecoder_tpu.config import tiny_test_config
        from nanodecoder_tpu.decode.greedy import greedy_decode
        from nanodecoder_tpu.models.model import encode, init_model
        from nanodecoder_tpu.ops import cache_update as cu

        cfg = dc.replace(tiny_test_config().model, lean_step=True)
        params = init_model(jax.random.PRNGKey(0), cfg)
        sig = jnp.asarray(rng_np.normal(size=(2, 256)).astype(np.float32))
        lens = jnp.asarray([256, 192], jnp.int32)
        memory, mem_len = encode(params, cfg, sig, lens)

        ref = greedy_decode(params, cfg, memory, mem_len)

        orig = cu.write_cache_block

        def interp(cache, slab, step, interpret=False):
            return orig(cache, slab, step, interpret=True)

        with mock.patch.object(cu, "write_cache_block", interp):
            got = greedy_decode(params, cfg, memory, mem_len)
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(ref.tokens))
        np.testing.assert_allclose(np.asarray(got.token_log_probs),
                                   np.asarray(ref.token_log_probs),
                                   atol=1e-5, rtol=1e-5)
