"""CloverPretrain: the tri-modal pretraining model as one flax module.

Reproduces the reference pretraining graph
(mmaction/models/recognizers/multimodal_transformer_pretrain.py:77-173):
2 Swin passes (clean + SimMIM-masked) + 2 BERT passes (clean + MLM-masked)
+ 2 fusion passes, emitting every embedding the losses need. Losses
themselves live in clover_tpu.losses and are applied in the train step, so
the module stays a pure feature extractor and the whole step is one jit
compile unit (SURVEY.md §7.1).

Batch layout (channels-last, static shapes):
  imgs         (B, T, H, W, 3) float
  token_ids    (B, S)  MLM-masked token ids
  input_mask   (B, S)  1/0 attention mask
  mlm_label    (B, S)  original ids at masked positions, -100 elsewhere
  v_token_mask (B, mh, mw) blockwise video mask
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from clover_tpu.models.bert import BertConfig, BertTextEncoder
from clover_tpu.models.fusion import CrossModalTransformer, FusionConfig
from clover_tpu.models.heads import MLMHead, NCEHeadForMM, NCEHeadForText, NCEHeadForVision
from clover_tpu.models.swin3d import SwinConfig, SwinTransformer3D

Dtype = Any
IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    swin: SwinConfig = SwinConfig(mask_token=True)
    text_bert: BertConfig = BertConfig()
    fusion: FusionConfig = FusionConfig()
    vts_embed_dim: int = 768
    text_agg_type: str = "cls"
    use_mlm: bool = True
    use_cmask: bool = True          # reference use_Cmask
    symmetry_rank: bool = True
    scale_pixels: bool = False      # reference from_scratch imgs/255
    # batch the clean+masked tower passes into single 2B calls (numerically
    # identical — LN/attention are per-sample; the SimMIM mixing with an
    # all-zero mask is the identity). Halves kernel launches and doubles
    # the MXU batch; the sequential path is kept for A/B and goldens.
    batch_passes: bool = True
    # with batch_passes, run the Swin patch embed ONCE on B and duplicate
    # the embedded tokens into the 2B encode batch — the clean and masked
    # passes see identical pixels and only diverge at the SimMIM mask
    # mixing, which happens after the embed (exact, not an approximation)
    share_embed: bool = True


class CloverPretrain(nn.Module):
    config: PretrainConfig = PretrainConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.backbone = SwinTransformer3D(cfg.swin, dtype=self.dtype)
        self.text_backbone = BertTextEncoder(cfg.text_bert, dtype=self.dtype)
        self.multimodal_backbone = CrossModalTransformer(cfg.fusion, dtype=self.dtype)
        self.ssl_head = NCEHeadForMM(
            visual_in_channels=cfg.swin.num_features,
            text_in_channels=cfg.text_bert.hidden_size,
            img_hidden_dim=cfg.fusion.hidden_size * 2,
            vts_embed_dim=cfg.vts_embed_dim,
            text_agg_type=cfg.text_agg_type,
            dropout_ratio=0.0,
            dtype=self.dtype,
        )
        if cfg.use_mlm:
            self.mlm_head = MLMHead(cfg.text_bert, dtype=self.dtype)
        self.mlm_ssl_V_head = NCEHeadForVision(
            hidden_dim=cfg.fusion.hidden_size, vts_embed_dim=cfg.vts_embed_dim,
            dtype=self.dtype)
        if cfg.symmetry_rank:
            self.mlm_ssl_T_head = NCEHeadForText(
                cross_in_channels=cfg.fusion.hidden_size,
                vts_embed_dim=cfg.vts_embed_dim, dtype=self.dtype)

    def _visual_tokens(self, feat: jax.Array) -> jax.Array:
        """(B, T, H, W, C) -> (B, T, H*W, C) fusion token layout."""
        B, T, H, W, C = feat.shape
        return feat.reshape(B, T, H * W, C)

    def __call__(self, batch: Dict[str, jax.Array], *, train: bool = True):
        return self.forward_train(batch, train=train)

    def forward_train(
        self, batch: Dict[str, jax.Array], *, train: bool = True
    ) -> Dict[str, jax.Array]:
        cfg = self.config
        det = not train
        # collapse any leading clip/candidate dims (reference :81-88)
        imgs = batch["imgs"].reshape((-1,) + batch["imgs"].shape[-4:])
        imgs = imgs.astype(self.dtype)
        if cfg.scale_pixels:
            imgs = imgs / 255.0
        token_ids = batch["token_ids"].reshape((-1,) + batch["token_ids"].shape[-1:])
        input_mask = batch["input_mask"].reshape((-1,) + batch["input_mask"].shape[-1:])
        mlm_label = batch["mlm_label"].reshape((-1,) + batch["mlm_label"].shape[-1:])

        # restore original ids at masked positions -> the clean text
        # (reference multimodal_transformer_pretrain.py:97)
        input_ssl_ids = jnp.where(mlm_label == IGNORE_INDEX, token_ids, mlm_label)

        v_token_mask = batch["v_token_mask"].reshape(
            (-1,) + batch["v_token_mask"].shape[-2:])

        if cfg.batch_passes:
            # ONE 2B Swin pass: [clean; masked] with an all-zero mask for
            # the clean half (identity under the SimMIM mixing)
            both_mask = jnp.concatenate(
                [jnp.zeros_like(v_token_mask), v_token_mask], axis=0)
            if cfg.share_embed:
                # embed once on B; the passes only diverge at the mask mixing
                tokens = self.backbone(imgs, deterministic=det, mode="embed")
                both_tokens = jnp.concatenate([tokens, tokens], axis=0)
                both_feat, _ = self.backbone(both_tokens, both_mask,
                                             deterministic=det, mode="encode")
            else:
                both_imgs = jnp.concatenate([imgs, imgs], axis=0)
                both_feat, _ = self.backbone(both_imgs, both_mask,
                                             deterministic=det)
            B = imgs.shape[0]
            visual_feat, visual_feat_masked = both_feat[:B], both_feat[B:]
            # ONE 2B BERT pass: [clean; masked] text
            both_ids = jnp.concatenate([input_ssl_ids, token_ids], axis=0)
            both_imask = jnp.concatenate([input_mask, input_mask], axis=0)
            both_text = self.text_backbone(both_ids, both_imask,
                                           deterministic=det)
            text_no_mask, text_with_mask = both_text[:B], both_text[B:]
        else:
            visual_feat = self.backbone(imgs, deterministic=det)      # clean V
            text_no_mask = self.text_backbone(
                input_ssl_ids, input_mask, deterministic=det)         # clean T
            text_with_mask = self.text_backbone(
                token_ids, input_mask, deterministic=det)             # masked T
            visual_feat_masked, _ = self.backbone(
                imgs, v_token_mask, deterministic=det)                # masked V

        visual_emb, text_emb = self.ssl_head(
            visual_feat, text_no_mask, input_mask, input_ssl_ids,
            deterministic=det)

        if cfg.batch_passes:
            # ONE 2B fusion pass: [masked video + clean text;
            #                      clean video + masked text]
            both_tokens = jnp.concatenate(
                [self._visual_tokens(visual_feat_masked),
                 self._visual_tokens(visual_feat)], axis=0)
            both_fused = self.multimodal_backbone(
                both_tokens,
                jnp.concatenate([input_mask, input_mask], axis=0),
                text_input_embeds=jnp.concatenate(
                    [text_no_mask, text_with_mask], axis=0),
                deterministic=det)
            B = imgs.shape[0]
            v_fusion = {k: v[:B] for k, v in both_fused.items()}
            t_fusion = {k: v[B:] for k, v in both_fused.items()}
        else:
            # fusion pass 1: masked video + clean text  (reference :117)
            v_fusion = self.multimodal_backbone(
                self._visual_tokens(visual_feat_masked), input_mask,
                text_input_embeds=text_no_mask, deterministic=det)
            # fusion pass 2: clean video + masked text  (reference :119)
            t_fusion = self.multimodal_backbone(
                self._visual_tokens(visual_feat), input_mask,
                text_input_embeds=text_with_mask, deterministic=det)

        out: Dict[str, jax.Array] = {
            "visual_emb": visual_emb,
            "text_emb": text_emb,
        }
        if cfg.use_mlm:
            out["mlm_logits"] = self.mlm_head(t_fusion["t_last_hidden_state"])

        # V-branch reconstruction embedding: text-CLS of the masked-video
        # fusion output (reference :148-149)
        out["mask_visual_recon_emb"] = self.mlm_ssl_V_head(
            v_fusion["t_last_hidden_state"][:, 0], deterministic=det)
        if cfg.use_cmask:
            out["mask_word_emb"] = self.ssl_head.forward_text(
                text_with_mask, input_mask, token_ids, deterministic=det)

        if cfg.symmetry_rank:
            out["mask_word_recon_emb"] = self.mlm_ssl_T_head(
                t_fusion["t_last_hidden_state"][:, 0], deterministic=det)
            if cfg.use_cmask:
                out["mask_visual_emb"] = self.ssl_head.forward_vision(
                    visual_feat_masked, deterministic=det)
        return out

    def forward_test(
        self,
        imgs: jax.Array,
        token_ids: jax.Array,
        input_mask: jax.Array,
        bias_cache=None,   # swin_bias_cache(params) — eval-time constants
    ):
        """Dual-tower retrieval embeddings (separate_test path, reference
        :194-218) with multi-clip mean pooling."""
        cfg = self.config
        imgs = imgs.reshape((-1,) + imgs.shape[-4:])
        token_ids = token_ids.reshape((-1,) + token_ids.shape[-1:])
        input_mask = input_mask.reshape((-1,) + input_mask.shape[-1:])
        if cfg.scale_pixels:
            imgs = imgs / 255.0
        visual_feat = self.backbone(imgs.astype(self.dtype), deterministic=True,
                                    bias_cache=bias_cache)
        B_text = token_ids.shape[0]
        if visual_feat.shape[0] != B_text:
            clip_shape = (B_text, -1) + visual_feat.shape[1:]
            visual_feat = visual_feat.reshape(clip_shape).mean(axis=1)
        text_hidden = self.text_backbone(token_ids, input_mask, deterministic=True)
        return self.ssl_head(visual_feat, text_hidden, input_mask, token_ids,
                             deterministic=True)
