"""Weight-importer tests: synthetic OpenNMT-style torch state_dicts ->
our pytree, with numerical equivalence checks on every layout
translation (linear/conv/LSTM transposes).  torch (CPU) is only a test
dependency (SURVEY.md §5.4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nanodecoder_tpu.config import tiny_test_config
from nanodecoder_tpu.models import modules as nn
from nanodecoder_tpu.models.encoder import lstm_cell
from nanodecoder_tpu.models.importer import (
    _conv,
    _lstm_cell_from_torch,
    _t,
    import_state_dict,
)
from nanodecoder_tpu.models.model import init_model


def test_linear_transpose_equivalence(rng_np):
    lin = torch.nn.Linear(16, 24)
    x = rng_np.normal(size=(4, 16)).astype(np.float32)
    want = lin(torch.from_numpy(x)).detach().numpy()
    p = {"w": _t(lin.weight.detach().numpy()),
         "b": np.asarray(lin.bias.detach().numpy())}
    got = np.asarray(nn.dense({"w": jnp.asarray(p["w"]), "b": jnp.asarray(p["b"])},
                              jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv1d_transpose_equivalence(rng_np):
    """torch Conv1d (NCW, weight (out,in,k), pad k//2) == our NWC conv
    with SAME padding, for odd kernels + stride 2."""
    conv = torch.nn.Conv1d(3, 8, kernel_size=5, stride=2, padding=2)
    x = rng_np.normal(size=(2, 3, 32)).astype(np.float32)  # NCW
    want = conv(torch.from_numpy(x)).detach().numpy()  # (2, 8, 16)
    w = _conv(conv.weight.detach().numpy())  # (k, in, out)
    x_nwc = jnp.asarray(np.transpose(x, (0, 2, 1)))
    got = jax.lax.conv_general_dilated(
        x_nwc, jnp.asarray(w), window_strides=(2,), padding=((2, 2),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    got = got + jnp.asarray(conv.bias.detach().numpy())
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 2, 1)), want, atol=1e-5
    )


def test_lstm_cell_equivalence(rng_np):
    """torch nn.LSTM (1 layer, fwd) == our lstm_cell scanned over time."""
    lstm = torch.nn.LSTM(input_size=12, hidden_size=10, num_layers=1,
                         batch_first=False)
    sd = {f"cell.{k}": v.detach().numpy() for k, v in lstm.state_dict().items()}
    cell = {k: jnp.asarray(v) for k, v in _lstm_cell_from_torch(sd, "cell").items()}
    x = rng_np.normal(size=(7, 3, 12)).astype(np.float32)  # (T, B, in)
    want, _ = lstm(torch.from_numpy(x))
    want = want.detach().numpy()  # (T, B, H)
    h = jnp.zeros((3, 10))
    c = jnp.zeros((3, 10))
    outs = []
    for t in range(7):
        h, c = lstm_cell(cell, jnp.asarray(x[t]), h, c)
        outs.append(np.asarray(h))
    np.testing.assert_allclose(np.stack(outs), want, atol=1e-5)


def _rand_t(rng, *shape):
    return torch.from_numpy(rng.normal(size=shape).astype(np.float32))


def _make_opennmt_state_dict(cfg, rng):
    """Synthetic state_dict with the expected OpenNMT-py naming and
    torch layout conventions for our transformer-transformer config."""
    sd = {}
    d, h = cfg.d_model, cfg.enc_ffn_dim

    def mha(prefix):
        for part in ("linear_query", "linear_keys", "linear_values", "final_linear"):
            sd[f"{prefix}.{part}.weight"] = _rand_t(rng, d, d)
            sd[f"{prefix}.{part}.bias"] = _rand_t(rng, d)

    def ln(prefix):
        sd[f"{prefix}.weight"] = _rand_t(rng, d)
        sd[f"{prefix}.bias"] = _rand_t(rng, d)

    def ffn(prefix, ffn_dim):
        sd[f"{prefix}.w_1.weight"] = _rand_t(rng, ffn_dim, d)
        sd[f"{prefix}.w_1.bias"] = _rand_t(rng, ffn_dim)
        sd[f"{prefix}.w_2.weight"] = _rand_t(rng, d, ffn_dim)
        sd[f"{prefix}.w_2.bias"] = _rand_t(rng, d)
        ln(f"{prefix}.layer_norm")

    # conv front-end
    in_ch = 1
    for i, (ch, k) in enumerate(zip(cfg.conv_channels, cfg.conv_kernels)):
        sd[f"encoder.frontend.convs.{i}.weight"] = _rand_t(rng, ch, in_ch, k)
        sd[f"encoder.frontend.convs.{i}.bias"] = _rand_t(rng, ch)
        in_ch = ch
    sd["encoder.frontend.proj.weight"] = _rand_t(rng, d, in_ch)
    sd["encoder.frontend.proj.bias"] = _rand_t(rng, d)
    ln("encoder.frontend.ln")
    # encoder body
    for i in range(cfg.enc_layers):
        mha(f"encoder.transformer.{i}.self_attn")
        ln(f"encoder.transformer.{i}.layer_norm")
        ffn(f"encoder.transformer.{i}.feed_forward", cfg.enc_ffn_dim)
    ln("encoder.layer_norm")
    # decoder
    for i in range(cfg.dec_layers):
        lp = f"decoder.transformer_layers.{i}"
        mha(f"{lp}.self_attn")
        mha(f"{lp}.context_attn")
        ln(f"{lp}.layer_norm_1")
        ln(f"{lp}.layer_norm_2")
        ffn(f"{lp}.feed_forward", cfg.dec_ffn_dim)
    ln("decoder.layer_norm")
    sd["decoder.embeddings.weight"] = _rand_t(rng, cfg.vocab_size, d)
    sd["generator.weight"] = _rand_t(rng, cfg.vocab_size, d)
    sd["generator.bias"] = _rand_t(rng, cfg.vocab_size)
    return sd


def test_full_import_structure_and_shapes(rng_np):
    cfg = tiny_test_config().model
    sd = _make_opennmt_state_dict(cfg, rng_np)
    imported = import_state_dict(sd, cfg)
    native = init_model(jax.random.PRNGKey(0), cfg)
    # Identical tree structure...
    assert (jax.tree_util.tree_structure(imported)
            == jax.tree_util.tree_structure(native))
    # ...and identical leaf shapes.
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(imported),
        jax.tree_util.tree_leaves_with_path(native),
    ):
        assert np.asarray(a).shape == np.asarray(b).shape, kp
    # Imported params must run end-to-end.
    from nanodecoder_tpu.models.model import decode_teacher_forced, encode

    params = jax.tree_util.tree_map(jnp.asarray, imported)
    sig = jnp.asarray(rng_np.normal(size=(2, 128)).astype(np.float32))
    lens = jnp.full((2,), 128, jnp.int32)
    mem, ml = encode(params, cfg, sig, lens)
    lp, _ = decode_teacher_forced(
        params, cfg, jnp.ones((2, 5), jnp.int32), mem, ml
    )
    assert np.isfinite(np.asarray(lp)).all()


def test_load_torch_checkpoint_roundtrip(tmp_path, rng_np):
    """Save a reference-shaped .pt ({'model': ..., 'generator': ...})
    and load it through the public entry point."""
    from nanodecoder_tpu.models.importer import load_torch_checkpoint

    cfg = tiny_test_config().model
    sd = _make_opennmt_state_dict(cfg, rng_np)
    gen = {"0.weight": sd.pop("generator.weight"),
           "0.bias": sd.pop("generator.bias")}
    path = str(tmp_path / "ref.pt")
    torch.save({"model": sd, "generator": gen, "opt": None}, path)
    params = load_torch_checkpoint(path, cfg)
    assert params["generator"]["w"].shape == (cfg.d_model, cfg.vocab_size)
