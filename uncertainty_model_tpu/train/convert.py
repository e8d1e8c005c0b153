"""PyTorch -> flax weight conversion.

Maps a reference ``state_dict`` (reference train/train.py:18-48 checkpoint
format) onto this framework's variable tree, for (a) migrating trained
reference checkpoints and (b) whole-model golden parity tests.

Layout transforms: conv OIHW -> HWIO; linear (out,in) -> (in,out); the
discriminator's flatten feeds the linear head in NCHW order in torch but
NHWC here, so its kernel rows are permuted accordingly.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np


def _conv(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    w = np.asarray(sd[f"{prefix}.weight"])
    out = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))
    return out


def _dense(sd: Mapping[str, np.ndarray], prefix: str, bias: bool = True) -> dict:
    w = np.asarray(sd[f"{prefix}.weight"])
    out = {"kernel": jnp.asarray(w.T)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))
    return out


def _bn(sd: Mapping[str, np.ndarray], prefix: str) -> tuple[dict, dict]:
    params = {
        "scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
    }
    stats = {
        "mean": jnp.asarray(np.asarray(sd[f"{prefix}.running_mean"])),
        "var": jnp.asarray(np.asarray(sd[f"{prefix}.running_var"])),
    }
    return params, stats


def _convert_encoder_stage(sd, prefix: str, params: dict, stats: dict, num_nodes: int):
    """One EncoderStage: torch ``{prefix}.layers.0`` = GraphBlock,
    ``{prefix}.layers.1`` = EfficientAttention."""
    graph_p, graph_s = {}, {}
    for j in range(num_nodes):
        tp = f"{prefix}.layers.0.node_blocks.{j}"
        node_p, node_s = {}, {}
        if f"{tp}.mean_weight" in sd:
            node_p["mean_weight"] = jnp.asarray(np.asarray(sd[f"{tp}.mean_weight"]))
        bn_p, bn_s = _bn(sd, f"{tp}.convolution.layers.1")
        node_p["conv_block"] = {"conv": _conv(sd, f"{tp}.convolution.layers.0"), "bn": bn_p}
        node_s["conv_block"] = {"bn": bn_s}
        graph_p[f"node_{j}"] = node_p
        graph_s[f"node_{j}"] = node_s

    attn = {
        name: _conv(sd, f"{prefix}.layers.1.{name}")
        for name in ("keys", "queries", "values", "reprojection")
    }
    params["graph"] = graph_p
    params["attention"] = attn
    stats["graph"] = graph_s


def _convert_conv_elu(sd, prefix: str, batch_norm: bool) -> tuple[dict, dict]:
    """Decoder ConvELUBlock: ``{prefix}.layers.0`` = ConvLayer,
    ``{prefix}.layers.1`` = BatchNorm (when enabled)."""
    p = {"conv_layer": {"conv": _conv(sd, f"{prefix}.layers.0.layers.0")}}
    s = {}
    if batch_norm:
        bn_p, bn_s = _bn(sd, f"{prefix}.layers.1")
        p["bn"] = bn_p
        s["bn"] = bn_s
    return p, s


def convert_model_state_dict(sd: Mapping[str, np.ndarray], decoder_layers: list[dict],
                             num_nodes: int = 5) -> dict:
    """Convert a RandomlyConnectedModel state_dict to flax variables."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    enc_p, enc_s = {}, {}
    num_stages = len({k.split(".")[2] for k in sd if k.startswith("encoder.layers.")})
    for i in range(num_stages):
        stage_p, stage_s = {}, {}
        _convert_encoder_stage(sd, f"encoder.layers.{i}", stage_p, stage_s, num_nodes)
        enc_p[f"stage_{i}"] = stage_p
        enc_s[f"stage_{i}"] = stage_s

    dec_p, dec_s = {}, {}
    for i, cfg in enumerate(decoder_layers):
        tp = f"decoder.layers.{i}"
        stage_p, stage_s = {}, {}
        bn = cfg.get("batch_norm", True)

        p, s = _convert_conv_elu(sd, f"{tp}.upsample.0", bn)
        stage_p["upsample_conv"], stage_s["upsample_conv"] = p, s

        p, s = _convert_conv_elu(sd, f"{tp}.squeeze_excite.0", True)
        stage_p["se_conv"], stage_s["se_conv"] = p, s

        if cfg.get("fc", True):
            stage_p["se"] = {
                "fc1": _dense(sd, f"{tp}.squeeze_excite.1.excite.0", bias=False),
                "fc2": _dense(sd, f"{tp}.squeeze_excite.1.excite.2", bias=False),
            }
        else:
            stage_p["se"] = {
                "conv1": _conv(sd, f"{tp}.squeeze_excite.1.excite.0"),
                "conv2": _conv(sd, f"{tp}.squeeze_excite.1.excite.2"),
            }

        p, s = _convert_conv_elu(sd, f"{tp}.iconv", bn)
        stage_p["iconv"], stage_s["iconv"] = p, s

        if cfg.get("calculate_disp", True):
            stage_p["disp"] = {"conv": _conv(sd, f"{tp}.disp.layers.0")}

        dec_p[f"stage_{i}"] = stage_p
        dec_s[f"stage_{i}"] = stage_s

    return {
        "params": {"encoder": enc_p, "decoder": dec_p},
        "batch_stats": {"encoder": enc_s, "decoder": dec_s},
    }


def convert_discriminator_state_dict(
    sd: Mapping[str, np.ndarray],
    num_layers: int = 4,
    num_nodes: int = 5,
    final_feature_hw: tuple[int, int] = (8, 16),
) -> dict:
    """Convert a RandomDiscriminator state_dict to flax variables.

    ``final_feature_hw`` is the (H, W) of the final-conv output that the
    linear head flattens (8x16 for 256x512 inputs after 5 stride-2 stages).
    """
    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    params, stats = {}, {}
    for i in range(num_layers):
        stage_p, stage_s = {}, {}
        _convert_encoder_stage(sd, f"layers.{i}", stage_p, stage_s, num_nodes)
        params[f"stage_{i}"] = stage_p
        stats[f"stage_{i}"] = stage_s

    conv_p, conv_s = {}, {}
    _convert_encoder_stage(sd, "conv", conv_p, conv_s, num_nodes)
    params["final_conv"] = conv_p
    stats["final_conv"] = conv_s

    # Linear head: torch flattens NCHW; we flatten NHWC -> permute rows.
    w = np.asarray(sd["linear.weight"])  # (1, C*H*W) in c-major (C, H, W)
    h, wdt = final_feature_hw
    c = w.shape[1] // (h * wdt)
    w_nhwc = w.reshape(-1, c, h, wdt).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    params["linear"] = {
        "kernel": jnp.asarray(w_nhwc.T),
        "bias": jnp.asarray(np.asarray(sd["linear.bias"])),
    }

    return {"params": params, "batch_stats": stats}
