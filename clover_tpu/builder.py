"""Config -> object builders (the registry layer).

The reference wires everything through mmcv registries + type strings
(models/builder.py:8-86, datasets/builder.py). Here a small explicit
factory covers the same config-driven polymorphism with typed dataclass
configs underneath.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from clover_tpu.config import Config
from clover_tpu.data.datasets import (
    MCRetrievalDataset,
    VideoQADataset,
    VideoTextDataset,
    make_synthetic_retrieval_dataset,
)
from clover_tpu.data.loader import DataLoader
from clover_tpu.data.tokenization import BertTokenizer, build_test_vocab
from clover_tpu.losses.objectives import PretrainLossConfig
from clover_tpu.models import (
    BertConfig,
    CloverFinetune,
    CloverPretrain,
    FinetuneConfig,
    FusionConfig,
    PretrainConfig,
    SwinConfig,
)

DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}

SWIN_VARIANTS = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "small": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "large": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}


def _filter_fields(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: _tuplify(v) for k, v in d.items() if k in names}


def _tuplify(v):
    return tuple(v) if isinstance(v, list) else v


def build_swin_config(cfg: Dict[str, Any]) -> SwinConfig:
    cfg = dict(cfg)
    variant = cfg.pop("variant", None)
    base = dict(SWIN_VARIANTS[variant]) if variant else {}
    base.update(cfg)
    return SwinConfig(**_filter_fields(SwinConfig, base))


def build_bert_config(cfg: Optional[Dict[str, Any]] = None) -> BertConfig:
    return BertConfig(**_filter_fields(BertConfig, dict(cfg or {})))


def build_fusion_config(cfg: Dict[str, Any], text_bert: BertConfig) -> FusionConfig:
    cfg = dict(cfg)
    n_layers = cfg.pop("num_hidden_layers", 3)
    bert = dataclasses.replace(text_bert, num_hidden_layers=n_layers)
    fields = _filter_fields(FusionConfig, cfg)
    fields.pop("bert", None)
    return FusionConfig(bert=bert, **fields)


def build_model(model_cfg: Dict[str, Any]):
    """-> (flax module, model dataclass config)."""
    cfg = dict(model_cfg)
    mtype = cfg.pop("type")
    dtype = DTYPES[cfg.pop("dtype", "bfloat16")]
    swin = build_swin_config(cfg.pop("swin", {}))
    if swin.use_checkpoint:
        # remat recipes: the MLP z-stash backward (CLOVER_MLP_STASH, default
        # on since r5) is pure extra traffic under remat and its residency
        # HBM-OOMs memory-tight shapes (BASELINE.md r5) — default it off
        # whenever the swin config remats; explicit env still wins.
        import os

        os.environ.setdefault("CLOVER_MLP_STASH", "0")
    text_bert = build_bert_config(cfg.pop("text_bert", {}))
    fusion = build_fusion_config(cfg.pop("fusion", {}), text_bert)

    if mtype == "CloverPretrain":
        mc = PretrainConfig(
            swin=swin, text_bert=text_bert, fusion=fusion,
            **_filter_fields(PretrainConfig, cfg))
        return CloverPretrain(mc, dtype=dtype), mc
    if mtype == "CloverFinetune":
        mc = FinetuneConfig(
            swin=swin, text_bert=text_bert, fusion=fusion,
            **_filter_fields(FinetuneConfig, cfg))
        return CloverFinetune(mc, dtype=dtype), mc
    raise ValueError(f"unknown model type {mtype!r}")


def build_tokenizer(cfg: Optional[Dict[str, Any]]) -> BertTokenizer:
    cfg = dict(cfg or {})
    if cfg.get("vocab_file"):
        if cfg.get("native", False):
            from clover_tpu.data.wordpiece_native import (
                NativeBertTokenizer,
                native_available,
            )

            if native_available():
                return NativeBertTokenizer(
                    cfg["vocab_file"], lower_case=cfg.get("lower_case", True))
        return BertTokenizer.from_vocab_file(
            cfg["vocab_file"], lower_case=cfg.get("lower_case", True))
    if cfg.get("synthetic", False):
        words = cfg.get("words") or (
            "a the person dog cat runs jumps sits eats red blue fast slow "
            "ball park street man woman child plays walks big small happy"
        ).split()
        return BertTokenizer(build_test_vocab(words))
    raise ValueError("tokenizer config needs vocab_file or synthetic=True")


def build_dataset(ds_cfg: Dict[str, Any], tokenizer: Optional[BertTokenizer]):
    cfg = dict(ds_cfg)
    dtype_ = cfg.pop("type")
    if dtype_ == "SyntheticRetrievalDataset":
        return make_synthetic_retrieval_dataset(**cfg)
    if dtype_ == "VideoTextDataset":
        return VideoTextDataset(tokenizer=tokenizer, **cfg)
    if dtype_ == "VideoQADataset":
        return VideoQADataset(tokenizer=tokenizer, **cfg)
    if dtype_ == "MCRetrievalDataset":
        return MCRetrievalDataset(tokenizer=tokenizer, **cfg)
    if dtype_ == "ActionVideoDataset":
        from clover_tpu.data.datasets import ActionVideoDataset

        names_file = cfg.pop("class_names_file", None)
        if names_file and not cfg.get("class_names"):
            with open(names_file) as f:
                # UCF101 classInd.txt style: "1 ApplyEyeMakeup" or bare names
                cfg["class_names"] = [
                    line.split(maxsplit=1)[-1].strip()
                    for line in f if line.strip()
                ]
        return ActionVideoDataset(tokenizer=tokenizer, **cfg)
    raise ValueError(f"unknown dataset type {dtype_!r}")


def build_loader(dataset, loader_cfg: Dict[str, Any], test: bool = False,
                 seed: int = 0) -> DataLoader:
    cfg = dict(loader_cfg)
    return DataLoader(
        dataset,
        batch_size=cfg.get("batch_size", 8),
        shuffle=not test,
        num_workers=cfg.get("num_workers", 4),
        drop_last=not test,
        seed=seed,
        prefetch=cfg.get("prefetch", 2),
        worker_type=cfg.get("worker_type", "thread"),
        host_s2d=cfg.get("host_s2d"),
    )


def build_pretrain_loss_config(cfg: Config) -> PretrainLossConfig:
    model = cfg.get("model", {})
    ssl = model.get("ssl_loss", {})
    return PretrainLossConfig(
        nce_temperature=ssl.get("temperature", 0.05),
        use_rank=ssl.get("use_rank", True),
        use_rank_ttm=ssl.get("use_rank_ttm", True),
        margin_ttm=ssl.get("margin_ttm", 5.0),
        mlm_focal_gamma=model.get("mlm_loss", {}).get("gamma", 2.0),
        symmetry_rank=model.get("symmetry_rank", True),
        use_mlm=model.get("use_mlm", True),
    )
