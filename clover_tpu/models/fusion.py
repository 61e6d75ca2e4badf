"""Cross-modal fusion transformer (video tokens + text) in flax.

Behavior of the reference CrossModalTransformerFromPretrained
(mmaction/models/backbones/cross_transformer.py:11-141): a BERT-initialized
encoder (first N layers) consuming

    [ visual tokens (+spatial/temporal pos, type 0) | (all-CLS) | text (type 1) ]

with a VIOLET-style extra LayerNorm on the visual stream, and split outputs
for the text / visual / CLS segments. The fusion tower owns its own copy of
the BERT embeddings + encoder (the reference loads a second BertForPreTraining,
cross_transformer.py:26-29), so parameters are independent of the text tower.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from clover_tpu.models.bert import (
    BertConfig,
    BertEmbeddings,
    BertEncoder,
    extend_attention_mask,
)
from clover_tpu.models.layers import dense, layer_norm, trunc_normal_init

Dtype = Any


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    bert: BertConfig = BertConfig(num_hidden_layers=3)
    img_in_size: int = 1024
    hidden_size: int = 768
    num_frames: int = 4          # latent frames (T after patch stride)
    spatial_tokens: int = 49     # 7*7
    token_types: int = 2
    word_pos_start: bool = False
    use_text_cls: bool = True    # True -> no extra all-CLS token (flagship cfg)
    use_prompt: bool = False
    num_prompt_tokens: int = 4


class CrossModalTransformer(nn.Module):
    config: FusionConfig = FusionConfig()
    dtype: Dtype = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.embeddings = BertEmbeddings(cfg.bert, dtype=self.dtype)
        self.encoder = BertEncoder(cfg.bert, dtype=self.dtype, remat=self.remat)
        self.token_type_embeddings = nn.Embed(
            cfg.token_types, cfg.hidden_size,
            embedding_init=nn.initializers.normal(stddev=0.02),
            param_dtype=jnp.float32)
        # learned visual positions: (1, 1, S, D) spatial + (1, T, 1, D) temporal
        normal02 = nn.initializers.normal(stddev=0.02)
        self.vis_space_pos = self.param(
            "vis_space_pos", normal02, (1, 1, cfg.spatial_tokens, cfg.hidden_size),
            jnp.float32)
        self.vis_tempor_pos = self.param(
            "vis_tempor_pos", normal02, (1, cfg.num_frames, 1, cfg.hidden_size),
            jnp.float32)
        self.visual_norm = layer_norm(dtype=self.dtype, name="visual_norm")
        if cfg.img_in_size != cfg.hidden_size:
            self.fc_in = dense(cfg.hidden_size, dtype=self.dtype, name="fc_in")
        if not cfg.use_text_cls:
            self.all_cls_token = self.param(
                "all_cls_token", trunc_normal_init, (1, 1, cfg.hidden_size),
                jnp.float32)
            if cfg.use_prompt:
                self.prompt_token = self.param(
                    "prompt_token", trunc_normal_init,
                    (1, cfg.num_prompt_tokens, cfg.hidden_size), jnp.float32)

    def _embed_text(self, text_input_ids, position_offset, deterministic):
        return self.embeddings(
            text_input_ids, position_offset=position_offset,
            deterministic=deterministic)

    def __call__(
        self,
        visual_token: jax.Array,                    # (B, T, S, D_img)
        text_input_mask: jax.Array,                 # (B*, S_t)
        text_input_ids: Optional[jax.Array] = None,
        text_input_embeds: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        cfg = self.config
        if cfg.img_in_size != cfg.hidden_size:
            visual_token = self.fc_in(visual_token)
        B, T, S, D = visual_token.shape

        pos_offset = T * S + 1 if cfg.word_pos_start else 0
        if text_input_embeds is None:
            text_emb = self._embed_text(text_input_ids, pos_offset, deterministic)
        else:
            text_emb = text_input_embeds.astype(self.dtype)
        if text_emb.shape[0] != B:
            # candidate-expanded text (B*n, seq, D) -> (B, n*seq, D)
            # (reference cross_transformer.py:79-82)
            text_emb = text_emb.reshape(B, -1, text_emb.shape[-1])
            text_input_mask = text_input_mask.reshape(B, -1)

        type_table = self.token_type_embeddings
        text_emb = text_emb + type_table(
            jnp.ones(text_emb.shape[:-1], dtype=jnp.int32)).astype(text_emb.dtype)

        visual_token = visual_token + (
            self.vis_space_pos + self.vis_tempor_pos[:, :T]).astype(visual_token.dtype)
        visual_token = visual_token.reshape(B, T * S, D)
        visual_token = visual_token + type_table(
            jnp.zeros((B, T * S), dtype=jnp.int32)).astype(visual_token.dtype)
        visual_token = self.visual_norm(visual_token, deterministic)

        if not cfg.use_text_cls:
            extra = [jnp.broadcast_to(self.all_cls_token.astype(visual_token.dtype),
                                      (B, 1, D))]
            if cfg.use_prompt:
                extra.insert(0, jnp.broadcast_to(
                    self.prompt_token.astype(visual_token.dtype),
                    (B, cfg.num_prompt_tokens, D)))
            visual_token = jnp.concatenate([visual_token] + extra, axis=1)
        v_seq_len = visual_token.shape[1]

        feats = jnp.concatenate([visual_token, text_emb], axis=1)
        mask = jnp.concatenate(
            [jnp.ones((B, v_seq_len), dtype=text_input_mask.dtype), text_input_mask],
            axis=1)
        bias = extend_attention_mask(mask, jnp.float32)
        hidden = self.encoder(feats, bias, deterministic=deterministic)

        out = {
            "last_hidden_state": hidden,
            "t_last_hidden_state": hidden[:, v_seq_len:],
            "v_last_hidden_state": hidden[:, : T * S],
        }
        if not cfg.use_text_cls:
            out["cls_last_hidden_state"] = hidden[:, v_seq_len - 1 : v_seq_len]
        return out

    def forward_text(
        self,
        text_input_ids: jax.Array,
        text_input_mask: jax.Array,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        """Text-only pass through the fusion encoder
        (reference cross_transformer.py:126-141)."""
        cfg = self.config
        pos_offset = (
            cfg.num_frames * cfg.spatial_tokens + 1 if cfg.word_pos_start else 0)
        text_emb = self._embed_text(text_input_ids, pos_offset, deterministic)
        text_emb = text_emb + self.token_type_embeddings(
            jnp.ones(text_emb.shape[:-1], dtype=jnp.int32)).astype(text_emb.dtype)
        bias = extend_attention_mask(text_input_mask, jnp.float32)
        return self.encoder(text_emb, bias, deterministic=deterministic)
