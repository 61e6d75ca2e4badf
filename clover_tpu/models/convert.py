"""Torch/HF state-dict -> flax pytree converters.

The reference pulls pretrained weights from three places (SURVEY.md §5.4):
HF ``bert-base-uncased`` for the text tower + fusion + MLM head
(bert_from_hugface.py:13-15, cross_transformer.py:24-29, mlm_itm_head.py:33-35)
and a Video-Swin ``.pth`` for the backbone (swin_transformer_3d.py:130-211).
These converters map those checkpoints onto clover_tpu's parameter trees.

All functions take a flat ``{name: numpy array}`` dict (call ``.numpy()`` /
``np.asarray`` on torch tensors first) and return nested flax params.
Linear kernels are transposed (torch stores (out, in), flax (in, out)).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

Array = Any


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _linear(sd: Mapping[str, Array], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping[str, Array], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _embed(sd: Mapping[str, Array], prefix: str) -> Dict[str, np.ndarray]:
    return {"embedding": np.asarray(sd[f"{prefix}.weight"])}


# --------------------------------------------------------------------- BERT


def convert_bert_embeddings(sd: Mapping[str, Array], prefix: str) -> Dict:
    return {
        "word_embeddings": _embed(sd, f"{prefix}.word_embeddings"),
        "position_embeddings": _embed(sd, f"{prefix}.position_embeddings"),
        "token_type_embeddings": _embed(sd, f"{prefix}.token_type_embeddings"),
        "norm": _layernorm(sd, f"{prefix}.LayerNorm"),
    }


def convert_bert_encoder(sd: Mapping[str, Array], prefix: str, num_layers: int) -> Dict:
    layers = {}
    for i in range(num_layers):
        p = f"{prefix}.layer.{i}"
        layers[f"layer_{i}"] = {
            "attention": {
                "query": _linear(sd, f"{p}.attention.self.query"),
                "key": _linear(sd, f"{p}.attention.self.key"),
                "value": _linear(sd, f"{p}.attention.self.value"),
            },
            "attention_output": _linear(sd, f"{p}.attention.output.dense"),
            "attention_norm": _layernorm(sd, f"{p}.attention.output.LayerNorm"),
            "intermediate": _linear(sd, f"{p}.intermediate.dense"),
            "output": _linear(sd, f"{p}.output.dense"),
            "output_norm": _layernorm(sd, f"{p}.output.LayerNorm"),
        }
    return layers


def convert_hf_bert(sd: Mapping[str, Array], num_layers: int = 12,
                    prefix: str = "") -> Dict:
    """HF BertModel state dict -> BertTextEncoder params."""
    if prefix and not prefix.endswith("."):
        prefix += "."
    return {
        "embeddings": convert_bert_embeddings(sd, f"{prefix}embeddings"),
        "encoder": convert_bert_encoder(sd, f"{prefix}encoder", num_layers),
    }


def convert_mlm_head(sd: Mapping[str, Array], prefix: str = "cls.predictions") -> Dict:
    """HF BertForMaskedLM cls head -> MLMHead params (decoder kept tied)."""
    decoder = _linear(sd, f"{prefix}.decoder")
    if "bias" not in decoder:
        # HF ties decoder.bias to cls.predictions.bias
        decoder["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return {
        "transform": {
            "dense": _linear(sd, f"{prefix}.transform.dense"),
            "norm": _layernorm(sd, f"{prefix}.transform.LayerNorm"),
        },
        "decoder": decoder,
    }


def convert_fusion_from_hf(sd: Mapping[str, Array], num_layers: int = 3,
                           bert_prefix: str = "bert") -> Dict:
    """HF BertForPreTraining -> the BERT-initialized part of the fusion tower.

    Returns params for 'embeddings' and 'encoder'; the fusion-specific
    params (positions, token types, visual_norm, fc_in, cls tokens) keep
    their fresh initialization (they are new in the reference too,
    cross_transformer.py:32-51).
    """
    return {
        "embeddings": convert_bert_embeddings(sd, f"{bert_prefix}.embeddings"),
        "encoder": convert_bert_encoder(sd, f"{bert_prefix}.encoder", num_layers),
    }


# --------------------------------------------------------------------- Swin


def inflate_swin2d(sd: Mapping[str, Array], temporal_patch: int,
                   temporal_window: int) -> Dict[str, np.ndarray]:
    """Inflate an *image* Swin checkpoint to the 3D layout, then convert.

    Reference inflate_weights (swin_transformer_3d.py:130-181):
    - patch-embed conv (Co,Ci,ph,pw) -> center-repeat over pd and / pd;
    - relative_position_bias_table ((2wh-1)(2ww-1), nH) tiled (2wd-1)x
      along rows (with optional bicubic resize on spatial mismatch, which
      we require to already match);
    - relative_position_index / attn_mask dropped (recomputed here).
    Returns a 3D-layout torch-style state dict for convert_swin3d.
    """
    out: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        val = np.asarray(val)
        if "relative_position_index" in key or "attn_mask" in key:
            continue
        if key == "patch_embed.proj.weight":
            # (Co, Ci, ph, pw) -> (Co, Ci, pd, ph, pw) / pd
            val = np.repeat(val[:, :, None], temporal_patch, axis=2)
            val = val / temporal_patch
        elif "relative_position_bias_table" in key:
            val = np.tile(val, (2 * temporal_window - 1, 1))
        out[key] = val
    return out


def convert_swin3d(sd: Mapping[str, Array], depths, patch_equals_stride: bool = True,
                   prefix: str = "backbone.") -> Dict:
    """Video-Swin torch state dict -> SwinTransformer3D params.

    Torch Conv3d patch-embed weight (C_out, C_in, pd, ph, pw) becomes the
    space-to-depth Dense kernel (pd*ph*pw*C_in, C_out) matching
    PatchEmbed3D's (d, h, w, c)-major flattening.
    """
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}
    params: Dict[str, Any] = {}

    conv_w = np.asarray(sd["patch_embed.proj.weight"])  # (Co, Ci, pd, ph, pw)
    if patch_equals_stride:
        # (Co, Ci, pd, ph, pw) -> (pd, ph, pw, Ci, Co) -> (pd*ph*pw*Ci, Co)
        kernel = conv_w.transpose(2, 3, 4, 1, 0).reshape(-1, conv_w.shape[0])
    else:
        kernel = conv_w.transpose(2, 3, 4, 1, 0)  # DHWIO for lax.conv
    patch_embed: Dict[str, Any] = {
        "proj": {"kernel": np.ascontiguousarray(kernel),
                 "bias": np.asarray(sd["patch_embed.proj.bias"])},
    }
    if "patch_embed.norm.weight" in sd:
        patch_embed["norm"] = _layernorm(sd, "patch_embed.norm")
    params["patch_embed"] = patch_embed

    if "mask_token" in sd:
        # torch (1, C, 1, 1, 1) -> ours (1, 1, 1, 1, C)
        params["mask_token"] = np.asarray(sd["mask_token"]).reshape(1, 1, 1, 1, -1)

    for i_stage, depth in enumerate(depths):
        for i_blk in range(depth):
            p = f"layers.{i_stage}.blocks.{i_blk}"
            params[f"stage_{i_stage}_block_{i_blk}"] = {
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "norm2": _layernorm(sd, f"{p}.norm2"),
                "attn": {
                    "qkv": _linear(sd, f"{p}.attn.qkv"),
                    "proj": _linear(sd, f"{p}.attn.proj"),
                    "relative_position_bias_table": np.asarray(
                        sd[f"{p}.attn.relative_position_bias_table"]),
                },
                "mlp": {
                    "fc1": _linear(sd, f"{p}.mlp.fc1"),
                    "fc2": _linear(sd, f"{p}.mlp.fc2"),
                },
            }
        if f"layers.{i_stage}.downsample.norm.weight" in sd:
            params[f"stage_{i_stage}_downsample"] = {
                "norm": _layernorm(sd, f"layers.{i_stage}.downsample.norm"),
                "reduction": _linear(sd, f"layers.{i_stage}.downsample.reduction"),
            }
    params["norm"] = _layernorm(sd, "norm")
    return params
