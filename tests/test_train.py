"""Training-layer tests: loss semantics, schedules, one real train step,
loss-goes-down smoke (SURVEY.md §4 — rigor the reference lacks)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanodecoder_tpu.config import tiny_test_config
from nanodecoder_tpu.models.model import init_model
from nanodecoder_tpu.train.data import SimSpec, simulate_read, synthetic_batches
from nanodecoder_tpu.train.loss import label_smoothed_nll, loss_and_metrics
from nanodecoder_tpu.train.optim import build_optimizer, noam_schedule
from nanodecoder_tpu.train.trainer import TrainState, make_train_step
from nanodecoder_tpu.vocab import PAD_ID


class TestLoss:
    def test_nll_no_smoothing_matches_manual(self, rng_np):
        b, t, v = 2, 5, 8
        logits = jnp.asarray(rng_np.normal(size=(b, t, v)).astype(np.float32))
        lp = jax.nn.log_softmax(logits)
        tgt = jnp.asarray(rng_np.integers(4, 8, size=(b, t)), jnp.int32)
        loss_sum, n_tok, n_corr = label_smoothed_nll(lp, tgt, smoothing=0.0)
        manual = -np.take_along_axis(np.asarray(lp), np.asarray(tgt)[..., None], -1).sum()
        np.testing.assert_allclose(float(loss_sum), manual, rtol=1e-5)
        assert int(n_tok) == b * t

    def test_pad_ignored(self, rng_np):
        b, t, v = 1, 4, 8
        lp = jax.nn.log_softmax(jnp.asarray(rng_np.normal(size=(b, t, v)), jnp.float32))
        tgt = jnp.array([[4, 5, PAD_ID, PAD_ID]], jnp.int32)
        loss_sum, n_tok, _ = label_smoothed_nll(lp, tgt, smoothing=0.1)
        assert int(n_tok) == 2
        # Padding rows must not contribute: recompute with different pad logits
        lp2 = lp.at[:, 2:, :].add(5.0)
        lp2 = jax.nn.log_softmax(lp2)  # renormalize — rows 2,3 differ
        loss_sum2, _, _ = label_smoothed_nll(lp2, tgt, smoothing=0.1)
        # only rows 0,1 identical => loss equal
        np.testing.assert_allclose(float(loss_sum), float(loss_sum2), rtol=1e-5)

    def test_smoothing_increases_gold_loss_on_confident(self):
        v = 8
        lp = jax.nn.log_softmax(jnp.full((1, 1, v), -10.0).at[0, 0, 4].set(10.0))
        tgt = jnp.array([[4]], jnp.int32)
        l0, _, _ = label_smoothed_nll(lp, tgt, smoothing=0.0)
        l1, _, _ = label_smoothed_nll(lp, tgt, smoothing=0.1)
        assert float(l1) > float(l0)


class TestOptim:
    def test_noam_shape(self):
        sched = noam_schedule(d_model=256, warmup_steps=100, scale=2.0)
        lrs = [float(sched(s)) for s in range(0, 300, 10)]
        peak = int(np.argmax(lrs)) * 10
        assert 80 <= peak <= 120  # peak near warmup boundary
        assert lrs[-1] < max(lrs)

    def test_build_all(self):
        cfg = tiny_test_config().train
        for name in ("adam", "adamw", "sgd"):
            opt, _ = build_optimizer(dataclasses.replace(cfg, optimizer=name), 64)
            assert opt is not None
        with pytest.raises(ValueError):
            build_optimizer(dataclasses.replace(cfg, optimizer="bogus"), 64)


class TestSimulator:
    def test_signal_length_scales_with_bases(self):
        spec = SimSpec()
        rng = np.random.default_rng(0)
        seq, sig = simulate_read(rng, 100, spec)
        assert len(seq) == 100
        assert 100 * 4 < sig.shape[0] < 100 * 20

    def test_deterministic_levels(self):
        assert np.array_equal(SimSpec().level_table(), SimSpec().level_table())

    def test_batches_shapes(self, tiny_config):
        it = synthetic_batches(tiny_config, seed=0)
        b = next(it)
        a, bs = tiny_config.train.accum_steps, tiny_config.train.batch_size
        assert b["signal"].shape == (a, bs, tiny_config.signal.chunk_len)
        assert b["tgt_in"].shape == (a, bs, tiny_config.model.max_decode_len)
        assert (b["tgt_in"][..., 0] == 1).all()  # BOS

    def test_prefetch_preserves_stream(self, tiny_config):
        """prefetch_batches must reproduce the source stream exactly
        (deterministic training) and shut its producer down cleanly."""
        from nanodecoder_tpu.train.data import prefetch_batches

        direct = synthetic_batches(tiny_config, seed=0)
        want = [next(direct) for _ in range(3)]
        got_iter = prefetch_batches(synthetic_batches(tiny_config, seed=0), depth=2)
        got = [next(got_iter) for _ in range(3)]
        for w, g in zip(want, got):
            for k in w:
                assert np.array_equal(w[k], g[k]), k
        got_iter.close()  # triggers the finally-stop path

    def test_prefetch_finite_source(self, tiny_config):
        from nanodecoder_tpu.train.data import prefetch_batches, synthetic_valid_batches

        src = synthetic_valid_batches(tiny_config, n_batches=2)
        out = list(prefetch_batches(iter(src), depth=1))
        assert len(out) == 2

    def test_interleave_batches_shapes(self, tiny_config):
        from nanodecoder_tpu.train.data import interleave_batches

        it = interleave_batches(tiny_config, seeds=(0, 1), depth=2)
        b = next(it)
        a, bs = tiny_config.train.accum_steps, tiny_config.train.batch_size
        assert b["signal"].shape == (a, bs, tiny_config.signal.chunk_len)
        it.close()

    def test_prefetch_propagates_source_error(self, tiny_config):
        """A producer exception must re-raise in the consumer, not be
        masked as clean exhaustion (ADVICE r1: a masked error surfaced
        as bare StopIteration and skipped the final checkpoint save)."""
        from nanodecoder_tpu.train.data import prefetch_batches

        def bad_source():
            yield next(synthetic_batches(tiny_config, seed=0))
            raise ValueError("simulated ingest failure")

        it = prefetch_batches(bad_source(), depth=2)
        next(it)  # first batch OK
        with pytest.raises(ValueError, match="simulated ingest failure"):
            next(it)

    def test_interleave_propagates_worker_error(self, tiny_config, monkeypatch):
        """A dead worker must fail the consumer instead of hanging the
        blocking q.get() forever (ADVICE r1 liveness finding)."""
        import nanodecoder_tpu.train.data as data_mod

        def exploding(config, spec=None, seed=0, accum_axis=True):
            raise RuntimeError("worker blew up")
            yield  # pragma: no cover

        monkeypatch.setattr(data_mod, "synthetic_batches", exploding)
        it = data_mod.interleave_batches(tiny_config, seeds=(0,), depth=1)
        with pytest.raises(RuntimeError, match="worker blew up"):
            next(it)


class TestTrainStep:
    def test_loss_decreases(self, tiny_config):
        """~30 steps on the synthetic task must reduce loss — the
        end-to-end learn-signal smoke test."""
        cfg = tiny_config
        params = init_model(jax.random.PRNGKey(0), cfg.model)
        optimizer, _ = build_optimizer(
            dataclasses.replace(cfg.train, lr_schedule="constant", learning_rate=1e-3,
                                warmup_steps=1),
            cfg.model.d_model,
        )
        state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(cfg, optimizer), donate_argnums=(0,))
        it = synthetic_batches(cfg, seed=0)
        losses = []
        rng = jax.random.PRNGKey(0)
        for i in range(30):
            batch = next(it)
            rng, r = jax.random.split(rng)
            state, metrics = step(state, batch, r)
            losses.append(float(metrics["xent_sum"]) / max(int(metrics["n_tokens"]), 1))
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.98, losses

    def test_accum_matches_single_batch_gradient(self, tiny_config):
        """Gradient accumulation over micro-batches with UNEQUAL real
        token counts must equal the single-big-batch gradient (VERDICT
        r1 item 8: mean-of-means mis-weighted unequal micro-batches)."""
        cfg = dataclasses.replace(
            tiny_config,
            model=dataclasses.replace(tiny_config.model, dropout=0.0),
            train=dataclasses.replace(
                tiny_config.train, optimizer="sgd", lr_schedule="constant",
                learning_rate=0.1, warmup_steps=1, grad_clip=0.0,
                guided_attention_weight=0.0, accum_steps=2),
        )
        params = init_model(jax.random.PRNGKey(0), cfg.model)
        it = synthetic_batches(cfg, seed=3, accum_axis=False)
        mb1 = next(it)
        mb2 = next(it)
        # Make micro-batch 2's targets much shorter than micro-batch 1's
        # so the real-token counts differ strongly.
        for k in ("tgt_in", "tgt_out"):
            mb2[k] = mb2[k].copy()
            mb2[k][:, 4:] = PAD_ID
        n1 = int((mb1["tgt_out"] != PAD_ID).sum())
        n2 = int((mb2["tgt_out"] != PAD_ID).sum())
        assert n1 != n2

        accum_batch = {k: np.stack([mb1[k], mb2[k]]) for k in mb1}
        big_batch = {k: np.concatenate([mb1[k], mb2[k]])[None] for k in mb1}

        def run(config, batch):
            optimizer, _ = build_optimizer(config.train, config.model.d_model)
            state = TrainState(params, optimizer.init(params),
                               jnp.zeros((), jnp.int32))
            step = jax.jit(make_train_step(config, optimizer))
            new_state, _ = step(state, batch, jax.random.PRNGKey(7))
            return new_state.params

        p_accum = run(cfg, accum_batch)
        cfg_single = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, accum_steps=1,
                                           batch_size=cfg.train.batch_size * 2))
        p_single = run(cfg_single, big_batch)
        flat_a = jax.tree_util.tree_leaves(p_accum)
        flat_s = jax.tree_util.tree_leaves(p_single)
        for a, s in zip(flat_a, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(s),
                                       rtol=2e-4, atol=2e-5)


class TestEarlyStopping:
    def test_stops_after_patience(self):
        from nanodecoder_tpu.train.earlystopping import EarlyStopping
        from nanodecoder_tpu.utils.statistics import Statistics

        es = EarlyStopping(patience=2, metric="xent")

        def stats(x):
            s = Statistics()
            s.update(loss=x * 10, n_tokens=10, n_correct=5)
            return s

        assert not es.update(stats(1.0))   # improves (inf -> 1.0)
        assert not es.update(stats(0.5))   # improves
        assert not es.update(stats(0.6))   # bad 1
        assert es.update(stats(0.7))       # bad 2 -> stop
        assert es.stopped

    def test_accuracy_direction(self):
        from nanodecoder_tpu.train.earlystopping import EarlyStopping

        es = EarlyStopping(patience=1, metric="accuracy")
        assert es.improved(0.5)
        es.best = 0.5
        assert not es.improved(0.4)
        assert es.improved(0.6)


class TestGuidedAttention:
    def test_diagonal_attn_scores_lower(self):
        from nanodecoder_tpu.train.loss import guided_attention_loss

        b, h, t, s = 1, 2, 8, 16
        tl = jnp.array([8], jnp.int32)
        el = jnp.array([16], jnp.int32)
        # Perfectly diagonal attention: token i -> position 2i
        diag = np.zeros((b, h, t, s), np.float32)
        for i in range(t):
            diag[0, :, i, 2 * i] = 1.0
        # Anti-diagonal (worst case)
        anti = np.zeros_like(diag)
        for i in range(t):
            anti[0, :, i, s - 1 - 2 * i] = 1.0
        l_diag = float(guided_attention_loss(jnp.asarray(diag), tl, el))
        l_anti = float(guided_attention_loss(jnp.asarray(anti), tl, el))
        assert l_diag < 0.2 < l_anti

    def test_train_step_with_ga(self, tiny_config):
        import dataclasses as dc

        from nanodecoder_tpu.train.optim import build_optimizer
        from nanodecoder_tpu.train.trainer import TrainState, make_train_step
        from nanodecoder_tpu.train.data import synthetic_batches

        cfg = dc.replace(tiny_config, train=dc.replace(
            tiny_config.train, guided_attention_weight=0.3))
        params = init_model(jax.random.PRNGKey(0), cfg.model)
        opt, _ = build_optimizer(cfg.train, cfg.model.d_model)
        state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(cfg, opt))
        batch = next(synthetic_batches(cfg, seed=0))
        state2, m = step(state, batch, jax.random.PRNGKey(1))
        assert int(m["n_tokens"]) > 0


def test_report_manager_tensorboard(tmp_path):
    """Optional TensorBoard sink writes event files alongside JSONL."""
    pytest.importorskip("torch.utils.tensorboard")
    from nanodecoder_tpu.utils.report import ReportManager
    from nanodecoder_tpu.utils.statistics import Statistics

    rm = ReportManager(report_every=1, metrics_path=str(tmp_path / "m.jsonl"),
                       tensorboard_dir=str(tmp_path / "tb"))
    st = Statistics()
    st.update(loss=10.0, n_tokens=20, n_correct=5)
    rm.report_training(1, st, lr=0.1)
    rm.close()
    import os
    events = [f for f in os.listdir(tmp_path / "tb") if "tfevents" in f]
    assert events, "no event file written"
    assert (tmp_path / "m.jsonl").read_text().count('"kind": "train"') == 1
