"""Decode-semantics tests: greedy + beam vs slow, obviously-correct
numpy oracles (SURVEY.md §4 consequence 2), including EOS, length
penalty, and tie-break behavior."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanodecoder_tpu.config import tiny_test_config
from nanodecoder_tpu.decode.beam import beam_decode
from nanodecoder_tpu.decode.greedy import greedy_decode
from nanodecoder_tpu.decode.penalties import length_penalty
from nanodecoder_tpu.models.model import decode_step, encode, init_decode_state, init_model
from nanodecoder_tpu.vocab import BOS_ID, EOS_ID, PAD_ID


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config().model
    params = init_model(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(7)
    b, s = 3, 256
    signal = jnp.asarray(rng.normal(size=(b, s)).astype(np.float32))
    lengths = jnp.array([256, 256, 120], jnp.int32)
    memory, mem_len = encode(params, cfg, signal, lengths)
    return cfg, params, memory, mem_len


# ---------------------------------------------------------------------------
# numpy oracles driving the same decode_step


def oracle_greedy(params, cfg, memory, mem_len, tmax):
    b = memory.shape[0]
    state = init_decode_state(params, cfg, memory, mem_len)
    cur = np.full((b,), BOS_ID, np.int32)
    toks = np.full((b, tmax), PAD_ID, np.int32)
    lps = np.zeros((b, tmax), np.float32)
    finished = np.zeros((b,), bool)
    lengths = np.full((b,), tmax, np.int32)
    for t in range(tmax):
        if finished.all():
            break
        lp, _a, state = decode_step(params, cfg, jnp.asarray(cur), state)
        lp = np.asarray(lp)
        nxt = lp.argmax(-1).astype(np.int32)
        chosen = lp[np.arange(b), nxt]
        nxt = np.where(finished, PAD_ID, nxt)
        chosen = np.where(finished, 0.0, chosen)
        toks[:, t] = nxt
        lps[:, t] = chosen
        newly = (~finished) & (nxt == EOS_ID)
        lengths = np.where(newly, t + 1, lengths)
        finished |= newly
        cur = nxt
    return toks, lengths, lps


def oracle_beam(params, cfg, dcfg, memory, mem_len):
    """Slow per-chunk beam search with the alive/finished semantics:
    2K candidates, alive excludes EOS, finished keeps top-K penalized
    (minus the coverage penalty when enabled).  Each result entry is
    (score, seq, length, token_lps) — token_lps the per-step chosen
    token log-prob along the hypothesis path (incl. the EOS slot)."""
    from nanodecoder_tpu.decode.penalties import coverage_penalty

    b = memory.shape[0]
    k, v, tmax = dcfg.beam_size, cfg.vocab_size, cfg.max_decode_len
    need_cov = dcfg.coverage_penalty != "none" and dcfg.beta != 0.0
    if need_cov and cfg.lean_step:
        # Mirror beam_decode: coverage needs materialized attention
        # probs, so the whole decode runs on the unfolded path.
        cfg = dataclasses.replace(cfg, lean_step=False)
    results = []
    for bi in range(b):
        mem_i = jnp.repeat(memory[bi : bi + 1], k, axis=0)
        len_i = jnp.repeat(mem_len[bi : bi + 1], k, axis=0)
        state = init_decode_state(params, cfg, mem_i, len_i)
        s = memory.shape[1]
        alive_seq = np.full((k, tmax), PAD_ID, np.int32)
        alive_lps = np.zeros((k, tmax), np.float32)
        alive_scores = np.array([0.0] + [-1e9] * (k - 1), np.float32)
        alive_cov = np.zeros((k, s), np.float32)
        fin = []  # list of (score, seq, length, token_lps)
        cur = np.full((k,), BOS_ID, np.int32)
        max_pen = float(length_penalty(tmax, dcfg.length_penalty, dcfg.alpha))
        for t in range(tmax):
            worst_fin = min([f[0] for f in fin], default=-1e9) if len(fin) >= k else -1e9
            if len(fin) >= k and worst_fin >= alive_scores[0] / max_pen:
                break
            if need_cov:
                lp, _a, attn, state = decode_step(params, cfg, jnp.asarray(cur),
                                                  state, return_attn=True)
                attn = np.asarray(attn)
            else:
                lp, _a, state = decode_step(params, cfg, jnp.asarray(cur), state)
                attn = np.zeros((k, s), np.float32)
            lp = np.asarray(lp)  # (k, v)
            cand = alive_scores[:, None] + lp
            flat = cand.reshape(-1)
            order = np.argsort(-flat, kind="stable")[: 2 * k]
            pen = float(length_penalty(t + 1, dcfg.length_penalty, dcfg.alpha))
            cov_step = alive_cov + attn
            new_alive = []
            for idx in order:
                o, tok = divmod(int(idx), v)
                seq = alive_seq[o].copy()
                seq[t] = tok
                lps = alive_lps[o].copy()
                lps[t] = lp[o, tok]
                if tok == EOS_ID:
                    cpen = float(np.asarray(coverage_penalty(
                        jnp.asarray(cov_step[o]), dcfg.coverage_penalty,
                        dcfg.beta))) if need_cov else 0.0
                    fin.append((float(flat[idx]) / pen - cpen, seq, t + 1, lps))
                elif len(new_alive) < k:
                    new_alive.append((float(flat[idx]), seq, lps, o, tok))
            fin = sorted(fin, key=lambda x: -x[0])[:k]
            alive_scores = np.array([s_ for s_, _, _, _, _ in new_alive], np.float32)
            alive_seq = np.stack([s_ for _, s_, _, _, _ in new_alive])
            alive_lps = np.stack([l_ for _, _, l_, _, _ in new_alive])
            origins = np.array([o for _, _, _, o, _ in new_alive])
            alive_cov = cov_step[origins]
            cur = np.array([tk for _, _, _, _, tk in new_alive], np.int32)
            from nanodecoder_tpu.models.model import reorder_decode_state

            state = reorder_decode_state(state, jnp.asarray(origins))
        if not fin:
            covp = (np.asarray(coverage_penalty(jnp.asarray(alive_cov),
                                                dcfg.coverage_penalty, dcfg.beta))
                    if need_cov else np.zeros((k,), np.float32))
            fin = [(float(alive_scores[j]) / max_pen - float(covp[j]),
                    alive_seq[j], tmax, alive_lps[j]) for j in range(k)]
            fin = sorted(fin, key=lambda x: -x[0])[:k]
        results.append(fin)
    return results


# ---------------------------------------------------------------------------


def test_greedy_matches_oracle(setup):
    cfg, params, memory, mem_len = setup
    res = greedy_decode(params, cfg, memory, mem_len)
    toks_o, len_o, lps_o = oracle_greedy(params, cfg, memory, mem_len, cfg.max_decode_len)
    np.testing.assert_array_equal(np.asarray(res.tokens), toks_o)
    np.testing.assert_array_equal(np.asarray(res.lengths), len_o)
    np.testing.assert_allclose(np.asarray(res.token_log_probs), lps_o, atol=1e-5)


@pytest.mark.parametrize("penalty,alpha,cov,beta", [
    ("none", 0.0, "none", 0.0),
    ("wu", 0.6, "none", 0.0),
    ("avg", 0.0, "none", 0.0),
    ("avg", 0.0, "wu", 0.2),
    ("none", 0.0, "summary", 0.1),
])
def test_beam_matches_oracle(setup, penalty, alpha, cov, beta):
    cfg, params, memory, mem_len = setup
    dcfg = dataclasses.replace(
        tiny_test_config().decode, mode="beam", beam_size=3,
        length_penalty=penalty, alpha=alpha, max_len=cfg.max_decode_len,
        coverage_penalty=cov, beta=beta,
    )
    res = beam_decode(params, cfg, dcfg, memory, mem_len)
    oracle = oracle_beam(params, cfg, dcfg, memory, mem_len)
    for bi in range(memory.shape[0]):
        got_scores = np.asarray(res.scores[bi])
        want = oracle[bi]
        # Compare the best hypothesis exactly (score, length, tokens,
        # per-token log-probs).
        assert abs(got_scores[0] - want[0][0]) < 1e-4, (got_scores, [w[0] for w in want])
        assert int(res.lengths[bi, 0]) == want[0][2]
        np.testing.assert_array_equal(np.asarray(res.tokens[bi, 0]), want[0][1])
        np.testing.assert_allclose(
            np.asarray(res.token_log_probs[bi, 0]), want[0][3], atol=1e-4)
        # The per-token lps must sum to the unpenalized cumulative score.
        n = want[0][2]
        if int(res.finished[bi, 0]):
            pen = float(length_penalty(n, dcfg.length_penalty, dcfg.alpha))
            if cov == "none":
                np.testing.assert_allclose(
                    np.asarray(res.token_log_probs[bi, 0]).sum(),
                    got_scores[0] * pen, atol=1e-3)


def test_beam_scores_sorted(setup):
    cfg, params, memory, mem_len = setup
    dcfg = dataclasses.replace(tiny_test_config().decode, mode="beam", beam_size=4)
    res = beam_decode(params, cfg, dcfg, memory, mem_len)
    sc = np.asarray(res.scores)
    assert (np.diff(sc, axis=1) <= 1e-6).all()


def test_beam1_at_least_as_good_as_greedy(setup):
    """With K=1 and no length penalty, the alive beam follows the greedy
    path until greedy's EOS, and that terminal hypothesis lands in the
    finished set — so beam's best score must be >= greedy's total score.
    (Note: beam K=1 is NOT identical to greedy under alive/finished
    semantics — the beam may keep an earlier-EOS hypothesis that scores
    better than the full greedy path.)"""
    cfg, params, memory, mem_len = setup
    g = greedy_decode(params, cfg, memory, mem_len)
    dcfg = dataclasses.replace(
        tiny_test_config().decode, mode="beam", beam_size=1, length_penalty="none"
    )
    bm = beam_decode(params, cfg, dcfg, memory, mem_len)
    for bi in range(memory.shape[0]):
        assert float(bm.scores[bi, 0]) >= float(g.scores[bi]) - 1e-4


def test_greedy_jit_cpu_matches_nonjit(setup):
    """f32 CPU parity gate: jitted vs eager greedy outputs are identical
    (SURVEY.md §7 R1 self-referential parity)."""
    cfg, params, memory, mem_len = setup
    eager = greedy_decode(params, cfg, memory, mem_len)
    jitted = jax.jit(lambda m, l: greedy_decode(params, cfg, m, l))(memory, mem_len)
    np.testing.assert_array_equal(np.asarray(eager.tokens), np.asarray(jitted.tokens))


def test_coverage_penalty_semantics():
    from nanodecoder_tpu.decode.penalties import coverage_penalty

    # Full coverage (all mass 1.0) => wu penalty 0
    full = jnp.ones((2, 8))
    np.testing.assert_allclose(np.asarray(coverage_penalty(full, "wu", 0.2)), 0.0,
                               atol=1e-6)
    # Under-covered positions are penalized
    partial = jnp.full((1, 8), 0.5)
    assert float(coverage_penalty(partial, "wu", 0.2)[0]) > 0
    # none => zeros
    assert float(coverage_penalty(partial, "none", 0.2)[0]) == 0.0


def test_translator_nbest(setup):
    cfg, params, memory, mem_len = setup
    import dataclasses as dc

    from nanodecoder_tpu.config import tiny_test_config
    from nanodecoder_tpu.decode.translator import Translator

    config = tiny_test_config()
    config = dc.replace(config, decode=dc.replace(config.decode, mode="beam",
                                                  beam_size=3, n_best=2))
    tr = Translator(params, config)
    rng = np.random.default_rng(5)
    chunks = rng.normal(size=(2, 256)).astype(np.float32)
    lens = np.full((2,), 256, np.int32)
    tok, tl, sc = tr.decode_nbest(chunks, lens)
    assert tok.shape[:2] == (2, 2)
    assert (np.diff(sc, axis=1) <= 1e-6).all()  # best-first


# ---------------------------------------------------------------------------
# random-sampling decode (reference random_sampling.py parity)


def test_restrict_topk_semantics():
    from nanodecoder_tpu.decode.sampling import restrict_log_probs

    lp = jax.nn.log_softmax(jnp.asarray([[0.1, 2.0, -1.0, 3.0, 0.5, -2.0, 1.0, 0.0]]))
    out = np.asarray(restrict_log_probs(lp, topk=3, topp=0.0))[0]
    kept = np.argsort(np.asarray(lp)[0])[-3:]
    masked = [i for i in range(8) if i not in kept]
    assert np.all(out[masked] < -1e8)
    # renormalized: kept probs sum to 1
    np.testing.assert_allclose(np.exp(out[kept]).sum(), 1.0, rtol=1e-5)
    # relative order preserved among kept
    base = np.asarray(lp)[0][kept]
    assert np.all(np.argsort(out[kept]) == np.argsort(base))


def test_restrict_topp_semantics():
    from nanodecoder_tpu.decode.sampling import restrict_log_probs

    probs = np.array([[0.5, 0.3, 0.1, 0.05, 0.03, 0.01, 0.005, 0.005]], np.float32)
    lp = jnp.log(jnp.asarray(probs))
    # p=0.75: {0.5} has mass 0.5 < 0.75, so token 1 is included; token 2
    # is excluded (prefix mass before it is 0.8 >= 0.75).
    out = np.asarray(restrict_log_probs(lp, topk=0, topp=0.75))[0]
    assert out[0] > -1e8 and out[1] > -1e8
    assert np.all(out[2:] < -1e8)
    np.testing.assert_allclose(np.exp(out[:2]).sum(), 1.0, rtol=1e-5)


def test_sample_topk1_equals_greedy(setup):
    """topk=1 sampling is argmax decoding regardless of the key."""
    import dataclasses as dc

    from nanodecoder_tpu.decode.sampling import sample_decode

    cfg, params, memory, mem_len = setup
    dcfg = dc.replace(tiny_test_config().decode, mode="sample", sampling_topk=1)
    g = greedy_decode(params, cfg, memory, mem_len)
    s = sample_decode(params, cfg, dcfg, memory, mem_len, jax.random.PRNGKey(42))
    np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(s.tokens))
    np.testing.assert_array_equal(np.asarray(g.lengths), np.asarray(s.lengths))


def test_sample_deterministic_per_key(setup):
    import dataclasses as dc

    from nanodecoder_tpu.decode.sampling import sample_decode

    cfg, params, memory, mem_len = setup
    dcfg = dc.replace(tiny_test_config().decode, mode="sample", temperature=1.5)
    a = sample_decode(params, cfg, dcfg, memory, mem_len, jax.random.PRNGKey(7))
    b = sample_decode(params, cfg, dcfg, memory, mem_len, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    c = sample_decode(params, cfg, dcfg, memory, mem_len, jax.random.PRNGKey(8))
    # An untrained tiny model at temp 1.5 is near-uniform over 8 tokens:
    # a different key virtually surely yields a different token matrix.
    assert not np.array_equal(np.asarray(a.tokens), np.asarray(c.tokens))


def test_sample_result_invariants(setup):
    import dataclasses as dc

    from nanodecoder_tpu.decode.sampling import sample_decode

    cfg, params, memory, mem_len = setup
    dcfg = dc.replace(tiny_test_config().decode, mode="sample",
                      temperature=0.8, sampling_topp=0.9, min_len=2)
    r = sample_decode(params, cfg, dcfg, memory, mem_len, jax.random.PRNGKey(0))
    toks = np.asarray(r.tokens)
    lens = np.asarray(r.lengths)
    lps = np.asarray(r.token_log_probs)
    for i in range(toks.shape[0]):
        L = int(lens[i])
        assert 1 <= L <= cfg.max_decode_len
        assert np.all(toks[i, L:] == PAD_ID)
        assert np.all(lps[i, L:] == 0.0)
        # min_len: no EOS in the first 2 positions
        assert not np.any(toks[i, :2] == EOS_ID)
        if L < cfg.max_decode_len:
            assert toks[i, L - 1] == EOS_ID
    np.testing.assert_allclose(np.asarray(r.scores), lps.sum(-1), rtol=1e-5)


def test_translator_sample_mode(setup):
    import dataclasses as dc

    from nanodecoder_tpu.decode.translator import Translator

    cfg, params, memory, mem_len = setup
    config = tiny_test_config()
    config = dc.replace(config, decode=dc.replace(
        config.decode, mode="sample", temperature=1.0, sampling_seed=3))
    tr = Translator(params, config)
    rng = np.random.default_rng(5)
    chunks = rng.normal(size=(6, 256)).astype(np.float32)
    lens = np.full((6,), 256, np.int32)
    tokens, tlens, lps, scores, pos = tr.decode_chunk_batch(chunks, lens)
    assert tokens.shape[0] == 6
    assert (tlens >= 1).all()
    # different batches use different fold_in keys but stay reproducible:
    tr2 = Translator(params, config)
    tokens2, *_ = tr2.decode_chunk_batch(chunks, lens)
    np.testing.assert_array_equal(tokens, tokens2)


class TestStagedDecode:
    """Staged cache growth (config.staged_decode) must be token-exact
    vs the single-stage loop — stages only resize buffers, never change
    step semantics."""

    def _setup(self, rng_np):
        import dataclasses as dc

        import jax
        import jax.numpy as jnp

        from nanodecoder_tpu.config import tiny_test_config
        from nanodecoder_tpu.models.model import encode, init_model

        cfg = tiny_test_config()
        m = dc.replace(cfg.model, lean_step=True, max_decode_len=48)
        params = init_model(jax.random.PRNGKey(0), m)
        sig = jnp.asarray(rng_np.normal(size=(3, 256)).astype(np.float32))
        lens = jnp.asarray([256, 200, 128], jnp.int32)
        memory, mem_len = encode(params, m, sig, lens)
        return cfg, m, params, memory, mem_len

    def test_stage_schedule(self):
        from nanodecoder_tpu.decode.greedy import decode_stage_lengths

        assert decode_stage_lengths(96) == [24, 48, 96]
        assert decode_stage_lengths(48) == [8, 24, 48]
        assert decode_stage_lengths(8) == [8]
        for t in (16, 64, 96, 320):
            assert all(x % 8 == 0 for x in decode_stage_lengths(t))
            assert decode_stage_lengths(t)[-1] == t

    def test_greedy_staged_exact(self, rng_np):
        import dataclasses as dc

        from nanodecoder_tpu.decode.greedy import greedy_decode

        _, m, params, memory, mem_len = self._setup(rng_np)
        base = greedy_decode(params, m, memory, mem_len)
        st = greedy_decode(params, dc.replace(m, staged_decode=True),
                           memory, mem_len)
        np.testing.assert_array_equal(np.asarray(base.tokens),
                                      np.asarray(st.tokens))
        np.testing.assert_allclose(np.asarray(base.token_log_probs),
                                   np.asarray(st.token_log_probs), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(base.attn_pos),
                                      np.asarray(st.attn_pos))

    def test_beam_staged_exact(self, rng_np):
        import dataclasses as dc

        from nanodecoder_tpu.decode.beam import beam_decode

        cfg, m, params, memory, mem_len = self._setup(rng_np)
        d = dc.replace(cfg.decode, beam_size=3)
        base = beam_decode(params, m, d, memory, mem_len)
        st = beam_decode(params, dc.replace(m, staged_decode=True), d,
                         memory, mem_len)
        np.testing.assert_array_equal(np.asarray(base.tokens),
                                      np.asarray(st.tokens))
        np.testing.assert_allclose(np.asarray(base.scores),
                                   np.asarray(st.scores), atol=1e-6)


class TestPathReorder:
    """Path-indirection beam reorder (DecodeConfig.path_reorder): the
    unpermuted write-time-frame cache read through the composed
    ancestry map must be TOKEN-EXACT vs the physical per-step cache
    permute — the indirection selects the identical K/V values."""

    def _setup(self, rng_np, tmax=48):
        import dataclasses as dc

        import jax
        import jax.numpy as jnp

        from nanodecoder_tpu.config import tiny_test_config
        from nanodecoder_tpu.models.model import encode, init_model

        cfg = tiny_test_config()
        m = dc.replace(cfg.model, lean_step=True, max_decode_len=tmax)
        params = init_model(jax.random.PRNGKey(0), m)
        sig = jnp.asarray(rng_np.normal(size=(4, 256)).astype(np.float32))
        lens = jnp.asarray([256, 200, 128, 64], jnp.int32)
        memory, mem_len = encode(params, m, sig, lens)
        return cfg, m, params, memory, mem_len

    @pytest.mark.parametrize("staged", [False, True])
    def test_beam_path_reorder_exact(self, rng_np, staged):
        import dataclasses as dc

        from nanodecoder_tpu.decode.beam import beam_decode

        cfg, m, params, memory, mem_len = self._setup(rng_np)
        if staged:
            m = dc.replace(m, staged_decode=True)
        d_phys = dc.replace(cfg.decode, beam_size=3, path_reorder=False)
        d_path = dc.replace(cfg.decode, beam_size=3, path_reorder=True)
        base = beam_decode(params, m, d_phys, memory, mem_len)
        got = beam_decode(params, m, d_path, memory, mem_len)
        np.testing.assert_array_equal(np.asarray(base.tokens),
                                      np.asarray(got.tokens))
        np.testing.assert_array_equal(np.asarray(base.lengths),
                                      np.asarray(got.lengths))
        np.testing.assert_allclose(np.asarray(base.scores),
                                   np.asarray(got.scores), atol=1e-6)
        np.testing.assert_allclose(np.asarray(base.token_log_probs),
                                   np.asarray(got.token_log_probs), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(base.attn_pos),
                                      np.asarray(got.attn_pos))


def test_stage_schedule_override_and_validation():
    from nanodecoder_tpu.decode.greedy import decode_stage_lengths

    assert decode_stage_lengths(96, (64, 96)) == [64, 96]
    assert decode_stage_lengths(96, (32, 64, 96)) == [32, 64, 96]
    with pytest.raises(ValueError):
        decode_stage_lengths(96, (64,))       # must end at tmax
    with pytest.raises(ValueError):
        decode_stage_lengths(96, (30, 96))    # multiples of 8


def test_custom_stage_schedule_token_exact(rng_np):
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from nanodecoder_tpu.config import tiny_test_config
    from nanodecoder_tpu.decode.greedy import greedy_decode
    from nanodecoder_tpu.models.model import encode, init_model

    cfg = tiny_test_config()
    m = dc.replace(cfg.model, lean_step=True, max_decode_len=48)
    params = init_model(jax.random.PRNGKey(0), m)
    sig = jnp.asarray(rng_np.normal(size=(3, 256)).astype(np.float32))
    lens = jnp.asarray([256, 200, 128], jnp.int32)
    memory, mem_len = encode(params, m, sig, lens)
    base = greedy_decode(params, m, memory, mem_len)
    st = greedy_decode(
        params, dc.replace(m, staged_decode=True, stage_schedule=(32, 48)),
        memory, mem_len)
    np.testing.assert_array_equal(np.asarray(base.tokens),
                                  np.asarray(st.tokens))


def test_beam_spill_warning():
    import dataclasses as dc
    import logging

    from nanodecoder_tpu.config import DecodeConfig
    from nanodecoder_tpu.decode.beam import warn_if_beam_spill

    records = []

    class Grab(logging.Handler):
        def emit(self, record):
            records.append(record)

    # The package root logger has propagate=False (utils.logging), so
    # attach directly to it rather than relying on caplog's root hook.
    grab = Grab(level=logging.WARNING)
    root = logging.getLogger("nanodecoder_tpu")
    root.addHandler(grab)
    try:
        d = DecodeConfig(mode="beam", beam_size=5, batch_chunks=512)
        warn_if_beam_spill(d)
        assert any("spill wall" in r.getMessage() for r in records)
        records.clear()
        warn_if_beam_spill(dc.replace(d, batch_chunks_beam=256))
        assert not records
    finally:
        root.removeHandler(grab)


def test_effective_batch_chunks_per_mode():
    """Per-mode operating-point resolution: beam prefers
    batch_chunks_beam, the engine prefers batch_chunks_engine (its
    link-bound sweet spot is smaller than raw decode's — measured
    round 5), and 0 means 'use the mode default'."""
    import dataclasses as dc

    from nanodecoder_tpu.config import DecodeConfig

    d = DecodeConfig(batch_chunks=640, batch_chunks_beam=256,
                     batch_chunks_engine=512)
    assert d.effective_batch_chunks() == 640
    assert d.effective_batch_chunks(engine=True) == 512
    b = dc.replace(d, mode="beam")
    assert b.effective_batch_chunks() == 256
    # engine override wins over the beam batch too (the engine decodes
    # in the configured mode but batches for the link)
    assert b.effective_batch_chunks(engine=True) == 512
    # 0 = fall back to the mode default
    z = dc.replace(d, batch_chunks_engine=0)
    assert z.effective_batch_chunks(engine=True) == 640
    zb = dc.replace(d, mode="beam", batch_chunks_beam=0,
                    batch_chunks_engine=0)
    assert zb.effective_batch_chunks() == 640
    assert zb.effective_batch_chunks(engine=True) == 640
