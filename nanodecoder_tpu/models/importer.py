"""One-way PyTorch -> JAX weight importer.

Reference analog (SURVEY.md §5.4): the reference saves `.pt` dicts of
{model, generator, vocab, opts, optim}; exact-match basecalling against
the reference requires loading its trained weights into our pytree.
The reference checkpoint itself is unavailable this round (empty
mount, SURVEY.md §0), so the mapping below targets the *expected*
OpenNMT-py v0.x state_dict naming for a transformer enc/dec pair and a
biLSTM path, and is exercised by tests that build a synthetic torch
state_dict with the same naming (tests/test_importer.py).  When the
real checkpoint appears, only `KEY_RULES` should need correction.

Layout conventions translated:
  torch nn.Linear.weight is (out, in)  -> ours is (in, out): transpose.
  torch nn.Conv1d.weight is (out, in, k) -> ours is (k, in, out) (NWC).
  torch nn.LSTM gate order is i, f, g, o — ours matches; torch packs
    weight_ih_l0 (4H, in) / weight_hh_l0 (4H, H) -> transpose to
    (in, 4H) / (H, 4H); bias_ih + bias_hh fold into one bias.
  torch nn.LayerNorm weight/bias -> scale/bias unchanged.
  nn.Embedding.weight -> table unchanged.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import numpy as np

from nanodecoder_tpu.config import ModelConfig


def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32).T


def _conv(x) -> np.ndarray:
    # (out, in, k) -> (k, in, out)
    return np.transpose(np.asarray(x, dtype=np.float32), (2, 1, 0))


def _arr(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _lstm_cell_from_torch(sd: Mapping[str, Any], prefix: str) -> dict[str, np.ndarray]:
    wx = _t(sd[f"{prefix}.weight_ih_l0"])
    wh = _t(sd[f"{prefix}.weight_hh_l0"])
    b = _arr(sd[f"{prefix}.bias_ih_l0"]) + _arr(sd[f"{prefix}.bias_hh_l0"])
    return {"wx": wx, "wh": wh, "b": b}


def _mha_from_torch(sd: Mapping[str, Any], prefix: str) -> dict[str, Any]:
    """OpenNMT MultiHeadedAttention: linear_query/linear_keys/
    linear_values/final_linear."""
    return {
        "q": {"w": _t(sd[f"{prefix}.linear_query.weight"]),
              "b": _arr(sd[f"{prefix}.linear_query.bias"])},
        "k": {"w": _t(sd[f"{prefix}.linear_keys.weight"]),
              "b": _arr(sd[f"{prefix}.linear_keys.bias"])},
        "v": {"w": _t(sd[f"{prefix}.linear_values.weight"]),
              "b": _arr(sd[f"{prefix}.linear_values.bias"])},
        "o": {"w": _t(sd[f"{prefix}.final_linear.weight"]),
              "b": _arr(sd[f"{prefix}.final_linear.bias"])},
    }


def _ln_from_torch(sd: Mapping[str, Any], prefix: str) -> dict[str, np.ndarray]:
    return {"scale": _arr(sd[f"{prefix}.weight"]), "bias": _arr(sd[f"{prefix}.bias"])}


def _ffn_from_torch(sd: Mapping[str, Any], prefix: str) -> dict[str, Any]:
    """OpenNMT PositionwiseFeedForward: w_1 (d->ffn), w_2 (ffn->d)."""
    return {
        "in": {"w": _t(sd[f"{prefix}.w_1.weight"]), "b": _arr(sd[f"{prefix}.w_1.bias"])},
        "out": {"w": _t(sd[f"{prefix}.w_2.weight"]), "b": _arr(sd[f"{prefix}.w_2.bias"])},
    }


def import_transformer_decoder(sd: Mapping[str, Any], cfg: ModelConfig,
                               prefix: str = "decoder") -> dict[str, Any]:
    """OpenNMT TransformerDecoder: transformer_layers.N.{self_attn,
    context_attn, feed_forward, layer_norm_1, layer_norm_2}; the FFN
    carries its own pre-norm as feed_forward.layer_norm."""
    layers = []
    for i in range(cfg.dec_layers):
        lp = f"{prefix}.transformer_layers.{i}"
        layers.append(
            {
                "ln1": _ln_from_torch(sd, f"{lp}.layer_norm_1"),
                "self_attn": _mha_from_torch(sd, f"{lp}.self_attn"),
                "ln2": _ln_from_torch(sd, f"{lp}.layer_norm_2"),
                "cross_attn": _mha_from_torch(sd, f"{lp}.context_attn"),
                "ln3": _ln_from_torch(sd, f"{lp}.feed_forward.layer_norm"),
                "ffn": _ffn_from_torch(sd, f"{lp}.feed_forward"),
            }
        )
    return {"layers": layers, "ln_out": _ln_from_torch(sd, f"{prefix}.layer_norm")}


def import_transformer_encoder(sd: Mapping[str, Any], cfg: ModelConfig,
                               prefix: str = "encoder") -> dict[str, Any]:
    layers = []
    for i in range(cfg.enc_layers):
        lp = f"{prefix}.transformer.{i}"
        layers.append(
            {
                "ln1": _ln_from_torch(sd, f"{lp}.layer_norm"),
                "attn": _mha_from_torch(sd, f"{lp}.self_attn"),
                "ln2": _ln_from_torch(sd, f"{lp}.feed_forward.layer_norm"),
                "ffn": _ffn_from_torch(sd, f"{lp}.feed_forward"),
            }
        )
    return {"layers": layers, "ln_out": _ln_from_torch(sd, f"{prefix}.layer_norm")}


def import_conv_frontend(sd: Mapping[str, Any], cfg: ModelConfig,
                         prefix: str = "encoder.frontend") -> dict[str, Any]:
    convs = []
    for i in range(len(cfg.conv_channels)):
        convs.append(
            {
                "w": _conv(sd[f"{prefix}.convs.{i}.weight"]),
                "b": _arr(sd[f"{prefix}.convs.{i}.bias"]),
            }
        )
    return {
        "convs": convs,
        "proj": {"w": _t(sd[f"{prefix}.proj.weight"]),
                 "b": _arr(sd[f"{prefix}.proj.bias"])},
        "ln": _ln_from_torch(sd, f"{prefix}.ln"),
    }


def import_state_dict(sd: Mapping[str, Any], cfg: ModelConfig) -> dict[str, Any]:
    """Full model import from a torch state_dict-like mapping (tensor
    values may be torch tensors or numpy arrays)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    params: dict[str, Any] = {
        "encoder": {
            "frontend": import_conv_frontend(sd, cfg),
        },
        "tgt_embed": {"table": _arr(sd["decoder.embeddings.weight"])},
        "generator": {"w": _t(sd["generator.weight"]),
                      "b": _arr(sd["generator.bias"])},
    }
    if cfg.encoder_type == "transformer":
        params["encoder"]["body"] = import_transformer_encoder(sd, cfg)
    else:
        layers = []
        for i in range(cfg.enc_layers):
            lp = f"encoder.rnn.{i}"
            layers.append(
                {
                    "fwd": _lstm_cell_from_torch(sd, f"{lp}.fwd"),
                    "bwd": _lstm_cell_from_torch(sd, f"{lp}.bwd"),
                    "proj": {"w": _t(sd[f"{lp}.proj.weight"]),
                             "b": _arr(sd[f"{lp}.proj.bias"])},
                }
            )
        params["encoder"]["body"] = {
            "layers": layers,
            "ln_out": _ln_from_torch(sd, "encoder.layer_norm"),
        }
    if cfg.decoder_type == "transformer":
        params["decoder"] = import_transformer_decoder(sd, cfg)
    else:
        raise NotImplementedError(
            "RNN-decoder import pends the real reference layout (SURVEY.md R3)"
        )
    return params


def load_torch_checkpoint(path: str, cfg: ModelConfig) -> dict[str, Any]:
    """Load a reference-style .pt checkpoint: {'model': state_dict,
    'generator': state_dict, ...} (SURVEY.md §2.1 'Checkpoint saver')."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = dict(ckpt["model"]) if "model" in ckpt else dict(ckpt)
    if "generator" in ckpt:  # generator saved separately in the reference
        for k, v in ckpt["generator"].items():
            # OpenNMT generator: 0.weight/0.bias of nn.Sequential(Linear, LogSoftmax)
            name = k.replace("0.weight", "weight").replace("0.bias", "bias")
            sd[f"generator.{name}"] = v
    return import_state_dict(sd, cfg)
