"""CloverFinetune: task-switched finetuning model (retrieval / QA / FIB).

Reproduces the reference finetune graph
(mmaction/models/recognizers/multimodal_transformer_finetune.py:59-197):
- task='retrieval'  -> dual-tower embeddings through the NCE head
- task='video_qa'/'FIB' -> fusion + one of three readouts:
    answer_mask: hidden state at the (single) [MASK] token
    answer_cls : fused CLS (all-CLS token if present, else text CLS),
                 optionally through the ITM head
    default    : all-CLS through the ITM head
  then the QA head (MC: per-candidate score; OE: class logits).

Static-shape note: the reference gathers [MASK] positions with a dynamic
``torch.where(token_ids == 103)`` (:100-101). The answer_mask pipelines
insert exactly one [MASK] per sample ("The answer is [MASK]",
datasets/pipelines/loading.py:470-476), so we use argmax + take_along_axis,
which is jit-compatible and equivalent for that invariant.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from clover_tpu.models.bert import BertConfig, BertTextEncoder
from clover_tpu.models.fusion import CrossModalTransformer, FusionConfig
from clover_tpu.models.heads import (
    ITMHead,
    MASK_TOKEN_ID,
    NCEHeadForMM,
    QAMCHead,
    QAOEHead,
)
from clover_tpu.models.swin3d import SwinConfig, SwinTransformer3D

Dtype = Any


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    swin: SwinConfig = SwinConfig()
    text_bert: BertConfig = BertConfig()
    fusion: FusionConfig = FusionConfig()
    task: str = "retrieval"          # 'retrieval' | 'video_qa' | 'FIB'
    vts_embed_dim: int = 768
    text_agg_type: str = "cls"
    answer_mask: bool = False
    answer_cls: bool = False
    use_itm_head: bool = False
    qa_head: Optional[str] = None    # None | 'mc' | 'oe'
    num_labels: int = 0              # OE answer vocabulary size
    scale_pixels: bool = False


class CloverFinetune(nn.Module):
    config: FinetuneConfig = FinetuneConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.backbone = SwinTransformer3D(cfg.swin, dtype=self.dtype)
        self.text_backbone = BertTextEncoder(cfg.text_bert, dtype=self.dtype)
        if cfg.task == "retrieval":
            self.ssl_head = NCEHeadForMM(
                visual_in_channels=cfg.swin.num_features,
                text_in_channels=cfg.text_bert.hidden_size,
                img_hidden_dim=cfg.fusion.hidden_size * 2,
                vts_embed_dim=cfg.vts_embed_dim,
                text_agg_type=cfg.text_agg_type,
                dropout_ratio=0.0,
                dtype=self.dtype,
            )
            if cfg.use_itm_head:
                # itm-head full-fusion retrieval eval (reference forward_test
                # non-separate branch, multimodal_transformer_pretrain.py:220-225)
                self.itm_head = ITMHead(cfg.fusion.hidden_size, dtype=self.dtype)
        elif cfg.task in ("video_qa", "FIB"):
            if cfg.use_itm_head:
                self.itm_head = ITMHead(cfg.fusion.hidden_size, dtype=self.dtype)
            if cfg.qa_head == "mc":
                self.qa_head = QAMCHead(cfg.fusion.hidden_size, dtype=self.dtype)
            elif cfg.qa_head == "oe":
                self.qa_head = QAOEHead(cfg.fusion.hidden_size,
                                        num_labels=cfg.num_labels, dtype=self.dtype)
        else:
            raise ValueError(f"unknown task {cfg.task!r}")
        # the fusion tower exists for QA/FIB tasks and for itm-style eval
        if cfg.task in ("video_qa", "FIB") or cfg.use_itm_head:
            self.multimodal_backbone = CrossModalTransformer(cfg.fusion,
                                                             dtype=self.dtype)

    # ------------------------------------------------------------------ #

    def _visual_feat(self, imgs: jax.Array, n_text: int, det: bool,
                     bias_cache=None) -> jax.Array:
        cfg = self.config
        if cfg.scale_pixels:
            imgs = imgs / 255.0
        feat = self.backbone(imgs.astype(self.dtype), deterministic=det,
                             bias_cache=bias_cache)
        if feat.shape[0] != n_text:
            # multi-clip inputs: mean-pool clip features (reference :73-75)
            feat = feat.reshape((n_text, -1) + feat.shape[1:]).mean(axis=1)
        return feat

    def _qa_logits(
        self,
        visual_feat: jax.Array,
        token_ids: jax.Array,
        input_mask: jax.Array,
        det: bool,
        test_mode: bool = False,
    ) -> jax.Array:
        """Fusion + readout + QA head -> (B, num_choices) scores."""
        cfg = self.config
        B, T, H, W, C = visual_feat.shape
        tokens = visual_feat.reshape(B, T, H * W, C)
        if cfg.qa_head == "oe":
            num_choices = cfg.num_labels
            tokens_all = tokens
        else:
            num_choices = token_ids.shape[0] // B
            # candidate expansion (reference :94-95): each video repeated
            # num_choices times, candidate-major within a video
            tokens_all = jnp.repeat(tokens, num_choices, axis=0)

        text_hidden = self.text_backbone(token_ids, input_mask, deterministic=det)
        output = self.multimodal_backbone(
            tokens_all, input_mask, text_input_embeds=text_hidden,
            deterministic=det)

        if cfg.answer_mask:
            # single [MASK] per sample (see module docstring)
            mask_pos = jnp.argmax(token_ids == MASK_TOKEN_ID, axis=1)
            readout = jnp.take_along_axis(
                output["t_last_hidden_state"], mask_pos[:, None, None], axis=1
            )[:, 0]
        elif cfg.answer_cls:
            if "cls_last_hidden_state" in output:
                readout = output["cls_last_hidden_state"][:, 0]
            else:
                readout = output["t_last_hidden_state"][:, 0]
            if cfg.use_itm_head:
                readout = self.itm_head(readout, deterministic=det)
        else:
            readout = self.itm_head(output["last_hidden_state"][:, 0],
                                    deterministic=det)

        if cfg.qa_head is not None:
            return self.qa_head(readout, deterministic=det).reshape(-1, num_choices)
        # ITM-score readout. Train uses the raw "match" logit (reference
        # :118); test applies softmax first (:187) — the softmax matters
        # for cross-candidate ranking (P(match) is monotone in l1-l0, not
        # in l1 alone).
        if test_mode:
            readout = jax.nn.softmax(readout.astype(jnp.float32), axis=-1)
        return readout[:, 1].reshape(-1, num_choices)

    # ------------------------------------------------------------------ #

    def __call__(self, batch: Dict[str, jax.Array], *, train: bool = True):
        return self.forward_train(batch, train=train)

    def forward_train(self, batch: Dict[str, jax.Array], *, train: bool = True):
        """Returns the tensors the task loss consumes:
        retrieval -> (visual_emb, text_emb); qa -> (B, num_choices) logits.

        Batch layout mirrors the reference collate contract (:61-69):
          imgs       (B, N_clips, T, H, W, 3) — flattened for the backbone,
                     clip features mean-pooled back to B
          token_ids  (B, n_cand, S) — flattened to (B*n_cand, S)
        """
        cfg = self.config
        det = not train
        B = batch["imgs"].shape[0]
        imgs = batch["imgs"].reshape((-1,) + batch["imgs"].shape[-4:])
        token_ids = batch["token_ids"].reshape(
            (-1,) + batch["token_ids"].shape[-1:])
        input_mask = batch["input_mask"].reshape(
            (-1,) + batch["input_mask"].shape[-1:])
        visual_feat = self._visual_feat(imgs, B, det)
        if cfg.task == "retrieval":
            text_hidden = self.text_backbone(token_ids, input_mask,
                                             deterministic=det)
            return self.ssl_head(visual_feat, text_hidden, input_mask, token_ids,
                                 deterministic=det)
        return self._qa_logits(visual_feat, token_ids, input_mask, det)

    def encode_visual(self, imgs: jax.Array, n_videos: int,
                      bias_cache=None) -> jax.Array:
        """Backbone features for the itm eval's cached-token protocol.

        Returns (n_videos, T, H*W, C) fusion-layout tokens. The reference's
        itm t2v eval re-runs the full model per (video, text) pair; caching
        the Swin tokens once per video and re-running only the fusion tower
        is numerically identical and O(V) instead of O(V*T) backbone passes.
        """
        imgs = imgs.reshape((-1,) + imgs.shape[-4:])
        feat = self._visual_feat(imgs, n_videos, True, bias_cache)
        B, T, H, W, C = feat.shape
        return feat.reshape(B, T, H * W, C)

    def forward_video(self, imgs: jax.Array, bias_cache=None) -> jax.Array:
        """Video tower only: (B[, n_clips], T, H, W, 3) -> (B, D) retrieval
        embedding (serving entry point; multi-clip inputs average after the
        backbone exactly like forward_test's clip handling)."""
        B = imgs.shape[0]
        imgs = imgs.reshape((-1,) + imgs.shape[-4:])
        visual_feat = self._visual_feat(imgs, B, True, bias_cache)
        return self.ssl_head.forward_vision(visual_feat, deterministic=True)

    def forward_text(self, token_ids: jax.Array,
                     input_mask: jax.Array) -> jax.Array:
        """Text tower only: (B, L) ids/mask -> (B, D) retrieval embedding
        (serving entry point)."""
        text_hidden = self.text_backbone(token_ids, input_mask,
                                         deterministic=True)
        return self.ssl_head.forward_text(text_hidden, input_mask, token_ids,
                                          deterministic=True)

    def itm_pair_score(
        self,
        visual_tokens: jax.Array,   # (B, T, S, C) cached backbone tokens
        token_ids: jax.Array,       # (B, L)
        input_mask: jax.Array,      # (B, L)
    ) -> jax.Array:
        """Fused match probability for aligned (video, text) pairs.

        Reference non-separate forward_test
        (multimodal_transformer_pretrain.py:220-225): full fusion pass,
        first-position CLS -> ITM head -> softmax; score = P(match).
        """
        text_hidden = self.text_backbone(token_ids, input_mask,
                                         deterministic=True)
        output = self.multimodal_backbone(
            visual_tokens, input_mask, text_input_embeds=text_hidden,
            deterministic=True)
        cls = output["last_hidden_state"][:, 0]
        logits = self.itm_head(cls, deterministic=True)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 1]

    def forward_test(
        self,
        imgs: jax.Array,
        token_ids: jax.Array,
        input_mask: jax.Array,
        bias_cache=None,   # swin_bias_cache(params) — eval-time constants
    ):
        cfg = self.config
        B = imgs.shape[0]
        imgs = imgs.reshape((-1,) + imgs.shape[-4:])
        token_ids = token_ids.reshape((-1,) + token_ids.shape[-1:])
        input_mask = input_mask.reshape((-1,) + input_mask.shape[-1:])
        visual_feat = self._visual_feat(imgs, B, True, bias_cache)
        if cfg.task == "retrieval":
            text_hidden = self.text_backbone(token_ids, input_mask,
                                             deterministic=True)
            return self.ssl_head(visual_feat, text_hidden, input_mask, token_ids,
                                 deterministic=True)
        return self._qa_logits(visual_feat, token_ids, input_mask, True,
                               test_mode=True)
