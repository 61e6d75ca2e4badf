"""BERT text encoder in flax, weight-layout compatible with HuggingFace.

Rebuilds the behavior of the reference text tower — a thin wrapper over HF
``BertModel`` (mmaction/models/backbones/bert_from_hugface.py:7-32) — and the
encoder/embedding internals the fusion transformer reuses
(cross_transformer.py:26-29): ``BertEmbeddings`` with a
``past_key_values_length`` position offset, post-LN encoder layers, and the
additive extended attention mask. Parameter tree is a 1:1 rename of the HF
state dict so pretrained weights convert exactly (SURVEY.md §5.4).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clover_tpu.models.layers import dense, layer_norm

Dtype = Any

# Additive mask fill value for padded keys. transformers==4.6.1 (the
# reference pin, install.sh:34) uses -10000.0.
ATTENTION_MASK_FILL = -10000.0


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1


def extend_attention_mask(mask: jax.Array, dtype: Dtype = jnp.float32) -> jax.Array:
    """(B, S) 1/0 mask -> (B, 1, 1, S) additive mask (HF semantics)."""
    mask = mask.astype(dtype)
    return ((1.0 - mask) * ATTENTION_MASK_FILL)[:, None, None, :]


class BertEmbeddings(nn.Module):
    """Token + absolute-position + token-type embeddings with LN.

    ``position_offset`` reproduces HF ``past_key_values_length`` used by the
    fusion transformer's ``word_pos_start`` option (cross_transformer.py:74-76).
    """

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        token_type_ids: Optional[jax.Array] = None,
        position_offset: int = 0,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.config
        embed_init = nn.initializers.normal(stddev=0.02)
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, embedding_init=embed_init,
                        param_dtype=jnp.float32, name="word_embeddings")
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       embedding_init=embed_init, param_dtype=jnp.float32,
                       name="position_embeddings")
        tok_type = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                            embedding_init=embed_init, param_dtype=jnp.float32,
                            name="token_type_embeddings")

        seq_len = input_ids.shape[-1]
        position_ids = jnp.arange(position_offset, position_offset + seq_len)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        x = word(input_ids) + pos(position_ids)[None, :, :] + tok_type(token_type_ids)
        x = layer_norm(eps=cfg.layer_norm_eps, dtype=self.dtype, name="norm")(
            x, deterministic)
        x = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(x)
        return x.astype(self.dtype)

    def word_embedding_table(self) -> jax.Array:
        """Expose the tied word-embedding matrix for the MLM decoder."""
        return self.variables["params"]["word_embeddings"]["embedding"]


class BertSelfAttention(nn.Module):
    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, *, deterministic: bool = True):
        cfg = self.config
        n_heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // n_heads

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], n_heads, head_dim)

        init = nn.initializers.normal(stddev=0.02)
        q = split_heads(dense(cfg.hidden_size, dtype=self.dtype, kernel_init=init, name="query")(x))
        k = split_heads(dense(cfg.hidden_size, dtype=self.dtype, kernel_init=init, name="key")(x))
        v = split_heads(dense(cfg.hidden_size, dtype=self.dtype, kernel_init=init, name="value")(x))

        scale = 1.0 / float(np.sqrt(head_dim))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * jnp.asarray(
            scale, self.dtype)
        if attn_bias is not None:
            logits = logits + attn_bias.astype(logits.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.attention_dropout, deterministic=deterministic)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return out.reshape(x.shape[0], x.shape[1], cfg.hidden_size)


import os as _os

# fuse the post-LN MLP half LN(x + fc2(gelu(fc1(x)))) into one Pallas
# kernel on deterministic (fwd-only) passes; CLOVER_BERT_MLP=xla opts out
_BERT_FUSED_MLP = _os.environ.get("CLOVER_BERT_MLP", "pallas") != "xla"
# TRAIN-pass fused MLP (dropout rides as a mask arg; see
# fused_mlp_postln_dropout). '1' = every tower; 'auto' = only layers
# with >= _FUSED_TRAIN_MIN_ROWS tokens (the r4 all-towers A/B measured
# 62.6 vs 64.2 clips/s — the B*L=480-row text towers are too small to
# amortize the kernel's VMEM staging vs XLA's free fusion; the fusion
# towers run ~7.6x more rows per layer). '0' disables (default until the
# auto-gate A/B lands).
_BERT_FUSED_MLP_TRAIN = _os.environ.get("CLOVER_BERT_MLP_TRAIN", "0")
_FUSED_TRAIN_MIN_ROWS = 2048


class BertLayer(nn.Module):
    """Post-LN transformer layer matching HF BertLayer structure."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, *, deterministic: bool = True):
        cfg = self.config
        init = nn.initializers.normal(stddev=0.02)
        attn = BertSelfAttention(cfg, dtype=self.dtype, name="attention")(
            x, attn_bias, deterministic=deterministic)
        attn = dense(cfg.hidden_size, dtype=self.dtype, kernel_init=init,
                     name="attention_output")(attn)
        attn = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(attn)
        x = layer_norm(eps=cfg.layer_norm_eps, dtype=self.dtype,
                       name="attention_norm")(x + attn, deterministic)

        ft = _BERT_FUSED_MLP_TRAIN
        use_fused_train = (not deterministic and _BERT_FUSED_MLP
                           and (ft in ("1", True)
                                or (ft == "auto" and x.shape[0] * x.shape[1]
                                    >= _FUSED_TRAIN_MIN_ROWS)))
        if (deterministic and _BERT_FUSED_MLP) or use_fused_train:
            from clover_tpu.models.layers import DenseParams, LayerNormParams
            from clover_tpu.ops.mlp_block import (fused_mlp_postln,
                                                  fused_mlp_postln_dropout)

            # declare the three submodules' params at their canonical
            # paths (checkpoint-identical to the nn.Dense path, pinned by
            # tests) without dummy compute or scope internals
            C = cfg.hidden_size
            k_i, b_i = DenseParams(C, cfg.intermediate_size,
                                   kernel_init=init, name="intermediate")()
            k_o, b_o = DenseParams(cfg.intermediate_size, C,
                                   kernel_init=init, name="output")()
            scale, bias = LayerNormParams(C, name="output_norm")()
            x2 = x.reshape(-1, C)
            if deterministic or cfg.hidden_dropout == 0.0:
                out = fused_mlp_postln(x2, scale, bias, k_i, b_i, k_o, b_o,
                                       cfg.layer_norm_eps)
            else:
                # hidden dropout rides the kernel as a precomputed
                # {0, 1/keep} mask from the rbg stream (CLOVER_BERT_MLP_
                # TRAIN; same placement as nn.Dropout in the path below)
                keep = 1.0 - cfg.hidden_dropout
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep,
                    x2.shape).astype(jnp.float32) / keep
                out = fused_mlp_postln_dropout(
                    x2, scale, bias, k_i, b_i, k_o, b_o, mask,
                    cfg.layer_norm_eps)
            return out.reshape(x.shape)

        inter = dense(cfg.intermediate_size, dtype=self.dtype, kernel_init=init,
                      name="intermediate")
        out_d = dense(cfg.hidden_size, dtype=self.dtype, kernel_init=init,
                      name="output")
        out_norm = layer_norm(eps=cfg.layer_norm_eps, dtype=self.dtype,
                              name="output_norm")
        h = nn.gelu(inter(x), approximate=False)
        h = out_d(h)
        h = nn.Dropout(cfg.hidden_dropout, deterministic=deterministic)(h)
        return out_norm(x + h, deterministic)


class BertEncoder(nn.Module):
    """Stack of post-LN layers. Depth is configurable so the fusion tower can
    reuse the first N pretrained layers (cross_transformer.py:24-29)."""

    config: BertConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, attn_bias, *, deterministic: bool = True):
        layer_cls = nn.remat(BertLayer) if self.remat else BertLayer
        for i in range(self.config.num_hidden_layers):
            x = layer_cls(self.config, dtype=self.dtype, name=f"layer_{i}")(
                x, attn_bias, deterministic=deterministic)
        return x


class BertTextEncoder(nn.Module):
    """Full text tower: embeddings + encoder -> last hidden state.

    Equivalent of ``BertFromPretrained.forward(token_ids, input_mask)``
    (bert_from_hugface.py:24-32); returns the (B, S, D) hidden states.
    """

    config: BertConfig = BertConfig()
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        token_type_ids: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        x = BertEmbeddings(self.config, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic)
        bias = extend_attention_mask(attention_mask, jnp.float32)
        x = BertEncoder(self.config, dtype=self.dtype, remat=self.remat,
                        name="encoder")(x, bias, deterministic=deterministic)
        return x


class BertPredictionTransform(nn.Module):
    """dense -> gelu -> LN transform of the MLM head (mlm_itm_head.py:10-22)."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = dense(self.config.hidden_size, dtype=self.dtype,
                  kernel_init=nn.initializers.normal(stddev=0.02), name="dense")(x)
        x = nn.gelu(x, approximate=False)
        return layer_norm(eps=self.config.layer_norm_eps, dtype=self.dtype, name="norm")(x)
