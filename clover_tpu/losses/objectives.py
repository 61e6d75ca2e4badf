"""Task objectives: map model outputs -> {loss_name: scalar} dicts.

Key names and composition mirror the reference train graphs so logs are
comparable:
- pretrain: mlm_loss + nce_loss + rank_t_tm_loss (+ v_nce_loss +
  rank_v_vm_loss under symmetry_rank)
  (multimodal_transformer_pretrain.py:127-169)
- finetune retrieval: retrieval_nce_loss
  (multimodal_transformer_finetune.py:82-86)
- finetune qa: qa_loss (:114-123)

``total_loss`` sums every entry ending in '_loss' plus the nce terms —
the reference sums every value in the losses dict (base.py _parse_losses).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from clover_tpu.losses.classification import cross_entropy, masked_lm_focal_loss
from clover_tpu.losses.contrastive import exclusive_nce_with_ranking, norm_softmax_loss


@dataclasses.dataclass(frozen=True)
class PretrainLossConfig:
    nce_temperature: float = 0.05
    use_rank: bool = True
    use_rank_ttm: bool = True
    margin_ttm: float = 5.0
    mlm_focal_gamma: float = 2.0
    symmetry_rank: bool = True
    use_mlm: bool = True


def pretrain_losses(
    outputs: Dict[str, jax.Array],
    mlm_label: jax.Array,
    cfg: PretrainLossConfig = PretrainLossConfig(),
) -> Dict[str, jax.Array]:
    losses: Dict[str, jax.Array] = {}
    if cfg.use_mlm and "mlm_logits" in outputs:
        mlm_label = mlm_label.reshape((-1,) + mlm_label.shape[-1:])
        losses["mlm_loss"] = masked_lm_focal_loss(
            outputs["mlm_logits"], mlm_label, gamma=cfg.mlm_focal_gamma)

    # V -> [T, T_mask, T_recon] branch (reference :147-152)
    cvt = exclusive_nce_with_ranking(
        outputs["visual_emb"],
        outputs["text_emb"],
        outputs["mask_word_emb"],
        outputs["mask_visual_recon_emb"],
        temperature=cfg.nce_temperature,
        use_rank=cfg.use_rank,
        use_rank_ttm=cfg.use_rank_ttm,
        margin_ttm=cfg.margin_ttm,
    )
    losses.update(cvt)

    # symmetric T -> [V, V_mask, V_recon] branch (reference :155-169)
    if cfg.symmetry_rank:
        ctv = exclusive_nce_with_ranking(
            outputs["text_emb"],
            outputs["visual_emb"],
            outputs["mask_visual_emb"],
            outputs["mask_word_recon_emb"],
            temperature=cfg.nce_temperature,
            use_rank=cfg.use_rank,
            use_rank_ttm=cfg.use_rank_ttm,
            margin_ttm=cfg.margin_ttm,
        )
        losses["v_nce_loss"] = ctv.pop("nce_loss")
        if "rank_t_tm_loss" in ctv:
            losses["rank_v_vm_loss"] = ctv.pop("rank_t_tm_loss")
    return losses


def retrieval_loss(visual_emb, text_emb, temperature: float = 0.05,
                   cos_sim: bool = True) -> Dict[str, jax.Array]:
    return {
        "retrieval_nce_loss": norm_softmax_loss(
            visual_emb, text_emb, temperature=temperature, cos_sim=cos_sim)
    }


def qa_loss(logits, labels) -> Dict[str, jax.Array]:
    return {"qa_loss": cross_entropy(logits, labels.reshape(-1))}


def total_loss(losses: Dict[str, jax.Array]) -> jax.Array:
    """Sum all loss terms (reference _parse_losses, recognizers/base.py:270-283)."""
    return sum(jnp.asarray(v) for v in losses.values())
