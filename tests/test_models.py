"""Model construction + shape tests (reference analog: onmt/tests/
test_models.py parameterizing tiny enc×dec combos, SURVEY.md §4) plus
the numerical tests the reference lacks: teacher-forced vs incremental
decode equivalence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanodecoder_tpu.config import tiny_test_config
from nanodecoder_tpu.models.model import (
    decode_step,
    decode_teacher_forced,
    encode,
    init_decode_state,
    init_model,
    param_count,
)
from nanodecoder_tpu.vocab import BOS_ID


def _cfg(encoder_type="transformer", decoder_type="transformer"):
    c = tiny_test_config().model
    return dataclasses.replace(c, encoder_type=encoder_type, decoder_type=decoder_type)


ENC_DEC = [
    ("transformer", "transformer"),
    ("transformer", "rnn"),
    ("lstm", "transformer"),
    ("lstm", "rnn"),
]


@pytest.mark.parametrize("enc,dec", ENC_DEC)
def test_forward_shapes(enc, dec, rng_np):
    cfg = _cfg(enc, dec)
    params = init_model(jax.random.PRNGKey(0), cfg)
    assert param_count(params) > 0
    b, s = 2, 256
    signal = jnp.asarray(rng_np.normal(size=(b, s)).astype(np.float32))
    lengths = jnp.array([256, 100], jnp.int32)
    memory, mem_len = encode(params, cfg, signal, lengths)
    ds = cfg.time_downsample
    assert memory.shape == (b, s // ds, cfg.d_model)
    assert int(mem_len[0]) == s // ds
    assert int(mem_len[1]) == int(np.ceil(100 / ds))
    # Padded encoder positions must be zeroed.
    assert float(jnp.abs(memory[1, int(mem_len[1]) :, :]).max()) == 0.0

    t = 7
    tgt_in = jnp.full((b, t), BOS_ID, jnp.int32)
    log_probs, attn = decode_teacher_forced(params, cfg, tgt_in, memory, mem_len)
    assert log_probs.shape == (b, t, cfg.vocab_size)
    # log_softmax rows sum to 1 in prob space
    np.testing.assert_allclose(
        np.exp(np.asarray(log_probs, np.float64)).sum(-1), 1.0, atol=1e-4
    )


@pytest.mark.parametrize("enc,dec", ENC_DEC)
def test_incremental_matches_teacher_forced(enc, dec, rng_np):
    """The single-step (KV cache) decode path must produce the same
    log-probs as the full teacher-forced pass — this is the correctness
    spine of the whole on-device decode loop."""
    cfg = _cfg(enc, dec)
    params = init_model(jax.random.PRNGKey(1), cfg)
    b, s, t = 2, 256, 6
    signal = jnp.asarray(rng_np.normal(size=(b, s)).astype(np.float32))
    lengths = jnp.array([256, 180], jnp.int32)
    memory, mem_len = encode(params, cfg, signal, lengths)

    tokens = jnp.asarray(rng_np.integers(4, 8, size=(b, t)), jnp.int32)
    tgt_in = jnp.concatenate([jnp.full((b, 1), BOS_ID, jnp.int32), tokens[:, :-1]], axis=1)

    full_lp, _ = decode_teacher_forced(params, cfg, tgt_in, memory, mem_len)

    state = init_decode_state(params, cfg, memory, mem_len)
    step_lps = []
    cur = tgt_in[:, 0]
    for i in range(t):
        lp, _attn, state = decode_step(params, cfg, cur, state)
        step_lps.append(lp)
        if i + 1 < t:
            cur = tgt_in[:, i + 1]
    step_lp = jnp.stack(step_lps, axis=1)
    np.testing.assert_allclose(
        np.asarray(step_lp), np.asarray(full_lp), atol=2e-4, rtol=1e-3
    )


def test_deterministic_init():
    cfg = _cfg()
    p1 = init_model(jax.random.PRNGKey(42), cfg)
    p2 = init_model(jax.random.PRNGKey(42), cfg)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_flows(rng_np):
    """Gradients reach every parameter (shape+grad test, SURVEY.md §4)."""
    cfg = _cfg()
    params = init_model(jax.random.PRNGKey(2), cfg)
    b, s, t = 2, 256, 5
    signal = jnp.asarray(rng_np.normal(size=(b, s)).astype(np.float32))
    lengths = jnp.full((b,), s, jnp.int32)
    tgt_in = jnp.asarray(rng_np.integers(4, 8, size=(b, t)), jnp.int32)

    def loss_fn(p):
        mem, ml = encode(p, cfg, signal, lengths)
        lp, _ = decode_teacher_forced(p, cfg, tgt_in, mem, ml)
        return -jnp.mean(lp)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = sum(bool(jnp.any(g != 0)) for _, g in flat)
    assert nonzero / len(flat) > 0.9  # essentially all params get gradient


def test_lean_encoder_matches_standard(rng_np):
    """Folded serving encoder (LN affines in the matmuls, fused QKV,
    pre-cast weights) == standard encoder in f32 eval mode."""
    from nanodecoder_tpu.models.encoder import (encoder_apply,
                                                encoder_apply_lean,
                                                fold_encoder_lean)

    cfg = _cfg()
    params = init_model(jax.random.PRNGKey(0), cfg)
    signal = jnp.asarray(rng_np.normal(size=(3, 256)), jnp.float32)
    lengths = jnp.asarray([256, 200, 97], jnp.int32)
    mem, ml = encoder_apply(params["encoder"], cfg, signal, lengths)
    lean = fold_encoder_lean(params["encoder"], cfg, jnp.float32)
    mem2, ml2 = encoder_apply_lean(lean, cfg, signal, lengths)
    np.testing.assert_array_equal(np.asarray(ml), np.asarray(ml2))
    np.testing.assert_allclose(np.asarray(mem), np.asarray(mem2),
                               atol=2e-5, rtol=1e-4)


def test_prepare_serving_params_end_to_end(rng_np):
    """decode via prepare_serving_params == decode via raw params (f32):
    the one-time serving fold must not change tokens."""
    from nanodecoder_tpu.decode.greedy import greedy_decode
    from nanodecoder_tpu.models.model import prepare_serving_params

    cfg = _cfg()
    params = init_model(jax.random.PRNGKey(0), cfg)
    signal = jnp.asarray(rng_np.normal(size=(2, 256)), jnp.float32)
    lengths = jnp.asarray([256, 180], jnp.int32)
    mem, ml = encode(params, cfg, signal, lengths)
    r1 = greedy_decode(params, cfg, mem, ml)
    sp = prepare_serving_params(params, cfg)
    mem2, ml2 = encode(sp, cfg, signal, lengths)
    r2 = greedy_decode(sp, cfg, mem2, ml2)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))
    np.testing.assert_array_equal(np.asarray(r1.lengths), np.asarray(r2.lengths))
