"""Projection / readout heads.

Each head reproduces the behavior of its reference counterpart:
- NCEHeadForMM      — mmaction/models/heads/ssl_head.py:8-139
- NCEHeadForVision  — ssl_head.py:142-221 (see divergence note below)
- NCEHeadForText    — ssl_head.py:224-297
- MLMHead           — mmaction/models/heads/mlm_itm_head.py:10-52
- ITMHead           — mlm_itm_head.py:55-97
- QAMCHead          — mmaction/models/heads/qa_head.py:7-39
- QAOEHead          — qa_head.py:42-87

Divergence (intentional): the reference NCEHeadForVision unconditionally
does ``img.mean(dim=1)`` (ssl_head.py:211) yet CloverPretrain feeds it the
2-D CLS feature ``t_last_hidden_state[:, 0]``
(multimodal_transformer_pretrain.py:148-149), which crashes in torch
(verified: Linear gets a (B,) tensor). We implement the evident intent:
token-mean only for 3-D inputs, identity for 2-D.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from clover_tpu.models.bert import BertConfig, BertPredictionTransform
from clover_tpu.models.layers import ProjectorNorm, dense, layer_norm, xavier_uniform_init

Dtype = Any

SEP_TOKEN_ID = 102
MASK_TOKEN_ID = 103


def _proj_dense(features: int, dtype, name: str) -> nn.Dense:
    # heads use xavier-uniform init (reference ssl_head.py:79-88)
    return dense(features, dtype=dtype, kernel_init=xavier_uniform_init, name=name)


class NCEHeadForMM(nn.Module):
    """Dual-tower contrastive head: video pool+MLP / text agg+MLP."""

    visual_in_channels: int = 1024
    text_in_channels: int = 768
    img_hidden_dim: int = 1536
    vts_embed_dim: int = 768
    text_agg_type: str = "cls"      # 'cls' | 'avg' | 'max'
    use_ln: bool = True             # projector norm: LN (all live configs) vs BN
    text_bn: bool = False
    dropout_ratio: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.vis_dropout = nn.Dropout(self.dropout_ratio)
        self.img_fc1 = _proj_dense(self.img_hidden_dim, self.dtype, "img_fc1")
        self.img_norm1 = ProjectorNorm(self.img_hidden_dim, use_ln=self.use_ln,
                                       dtype=self.dtype)
        self.img_fc2 = _proj_dense(self.vts_embed_dim, self.dtype, "img_fc2")
        self.img_norm2 = ProjectorNorm(self.vts_embed_dim, use_ln=self.use_ln,
                                       dtype=self.dtype)
        self.text_fc1 = _proj_dense(self.text_in_channels, self.dtype, "text_fc1")
        if self.text_bn:
            self.text_norm = ProjectorNorm(self.text_in_channels, use_ln=False,
                                           dtype=self.dtype)
        self.text_fc2 = _proj_dense(self.vts_embed_dim, self.dtype, "text_fc2")

    def __call__(self, visual_feat, text_feat, text_mask=None, token_ids=None,
                 *, deterministic: bool = True):
        v = self.forward_vision(visual_feat, deterministic=deterministic)
        t = self.forward_text(text_feat, text_mask, token_ids,
                              deterministic=deterministic)
        return v, t

    def forward_vision(self, visual_feat: jax.Array, *, deterministic: bool = True):
        """(B, T, H, W, C) channels-last features -> (B, vts_embed_dim)."""
        img = jnp.mean(visual_feat, axis=(1, 2, 3))  # global avg pool (B, C)
        img = self.vis_dropout(img, deterministic=deterministic)
        img = self.img_fc1(img)
        img = self.img_norm1(img, deterministic=deterministic)
        img = nn.gelu(img, approximate=False)
        img = self.img_fc2(img)
        img = self.img_norm2(img, deterministic=deterministic)
        return img

    def forward_text(self, text_feat: jax.Array, text_mask=None, token_ids=None,
                     *, deterministic: bool = True):
        """(B, S, D) hidden states -> (B, vts_embed_dim)."""
        if self.text_agg_type == "cls":
            text = text_feat[:, 0]
        elif self.text_agg_type in ("avg", "max"):
            # exclude CLS (position 0), SEP, and padding (ssl_head.py:120-135)
            mask = jnp.where(token_ids == SEP_TOKEN_ID, 0, text_mask)
            text = text_feat[:, 1:]
            mask = mask[:, 1:].astype(text.dtype)[..., None]
            masked = text * mask
            if self.text_agg_type == "avg":
                text = masked.sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1e-6)
            else:
                text = jnp.max(masked, axis=1)
        else:
            raise ValueError(f"unknown text_agg_type {self.text_agg_type!r}")

        text = self.text_fc1(text)
        if self.text_bn:
            text = self.text_norm(text, deterministic=deterministic)
        text = nn.gelu(text, approximate=False)
        text = self.text_fc2(text)
        return text


class NCEHeadForVision(nn.Module):
    """Projects the fused masked-video reconstruction feature."""

    visual_in_channels: int = 768
    hidden_dim: int = 768
    vts_embed_dim: int = 768
    use_ln: bool = True
    dropout_ratio: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jax.Array, *, deterministic: bool = True):
        if feat.ndim == 3:
            feat = feat.mean(axis=1)
        feat = nn.Dropout(self.dropout_ratio, deterministic=deterministic)(feat)
        feat = _proj_dense(self.hidden_dim * 2, self.dtype, "fc1")(feat)
        feat = ProjectorNorm(self.hidden_dim * 2, use_ln=self.use_ln,
                             dtype=self.dtype, name="norm1")(
            feat, deterministic=deterministic)
        feat = nn.gelu(feat, approximate=False)
        feat = _proj_dense(self.vts_embed_dim, self.dtype, "fc2")(feat)
        feat = ProjectorNorm(self.vts_embed_dim, use_ln=self.use_ln,
                             dtype=self.dtype, name="norm2")(
            feat, deterministic=deterministic)
        return feat


class NCEHeadForText(nn.Module):
    """Projects the fused masked-word reconstruction feature."""

    cross_in_channels: int = 768
    vts_embed_dim: int = 768
    text_bn: bool = False
    dropout_ratio: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jax.Array, *, deterministic: bool = True):
        feat = _proj_dense(self.cross_in_channels, self.dtype, "fc1")(feat)
        if self.text_bn:
            feat = ProjectorNorm(self.cross_in_channels, use_ln=False,
                                 dtype=self.dtype, name="norm")(
                feat, deterministic=deterministic)
        feat = nn.gelu(feat, approximate=False)
        feat = nn.Dropout(self.dropout_ratio, deterministic=deterministic)(feat)
        return _proj_dense(self.vts_embed_dim, self.dtype, "fc2")(feat)


class MLMHead(nn.Module):
    """BERT LM head: transform + vocab decoder (weights converted from HF;
    the decoder kernel is stored separately but initialized tied)."""

    bert_config: BertConfig = BertConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jax.Array) -> jax.Array:
        x = BertPredictionTransform(self.bert_config, dtype=self.dtype,
                                    name="transform")(hidden_states)
        logits = dense(self.bert_config.vocab_size, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(stddev=0.02),
                       name="decoder")(x)
        return logits


class ITMHead(nn.Module):
    """2-way image-text-match head: dropout->dense->tanh->dense(2)."""

    hidden_dim: int = 768
    dropout_ratio: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cls_feature: jax.Array, *, deterministic: bool = True):
        x = nn.Dropout(self.dropout_ratio, deterministic=deterministic)(cls_feature)
        x = _proj_dense(self.hidden_dim, self.dtype, "fc1")(x)
        x = jnp.tanh(x)
        return _proj_dense(2, self.dtype, "fc2")(x)


class QAMCHead(nn.Module):
    """Multiple-choice scorer: dense(256)->LN->GELU->dense(1)."""

    hidden_dim: int = 768
    dropout_ratio: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        x = nn.Dropout(self.dropout_ratio, deterministic=deterministic)(x)
        x = _proj_dense(256, self.dtype, "fc1")(x)
        x = layer_norm(dtype=self.dtype, name="norm")(x)
        x = nn.gelu(x, approximate=False)
        return _proj_dense(1, self.dtype, "fc2")(x)


class QAOEHead(nn.Module):
    """Open-ended answer classifier: dense(D/2)->LN->GELU->dense(num_labels)."""

    hidden_dim: int = 768
    num_labels: int = 1000
    dropout_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        x = nn.Dropout(self.dropout_ratio, deterministic=deterministic)(x)
        x = _proj_dense(self.hidden_dim // 2, self.dtype, "fc1")(x)
        x = layer_norm(dtype=self.dtype, name="norm")(x)
        x = nn.gelu(x, approximate=False)
        return _proj_dense(self.num_labels, self.dtype, "fc2")(x)
