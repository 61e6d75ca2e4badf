"""Every shipped experiment config must compose and build a model.

Guards against config rot across the full `configs/exp/` suite (the 12
reference experiments + synthetic debug configs): _base_ chains resolve,
model sections build real flax modules, optimizer/schedule/eval sections
carry the expected keys. Model *construction* only — no init/compile (a
full Swin-B init takes minutes on CPU) and no data access.
"""

import glob
import os

import pytest

from clover_tpu.builder import build_model
from clover_tpu.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "exp")
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.py")))


def test_suite_is_complete():
    names = {os.path.basename(p) for p in CONFIGS}
    # the 12 reference experiments (SURVEY.md §0) + pretraining
    for required in [
        "pretrain_webvid_cc3m.py",
        "finetune_msrvtt_retrieval.py", "finetune_msvd_retrieval.py",
        "finetune_lsmdc_retrieval.py", "finetune_didemo_retrieval.py",
        "finetune_msrvttQA.py", "finetune_msvdQA.py",
        "finetune_tgif_frameQA.py", "finetune_lsmdc_fib.py",
        "finetune_tgif_action_mc.py", "finetune_tgif_transition_mc.py",
        "test_msrvtt_mc.py", "test_lsmdc_mc.py",
        "finetune_msrvtt_mc.py", "finetune_lsmdc_mc.py",
        "test_ucf101_zeroshot.py",
    ]:
        assert required in names, required


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p)[:-3]
                                               for p in CONFIGS])
def test_config_composes_and_model_builds(path):
    cfg = load_config(path)
    assert "model" in cfg and "data" in cfg
    model, model_cfg = build_model(cfg.model)
    assert cfg.model.type in type(model).__name__
    assert model_cfg.swin.embed_dim > 0
    # training-relevant sections are well-formed where present
    if "optimizer" in cfg:
        assert cfg.optimizer.get("lr", 0) > 0
    if "evaluation" in cfg:
        assert cfg.evaluation.get("interval", 1) >= 1
    # every dataset section names a backend + annotation source
    data = cfg.data
    splits = [data[k] for k in ("train", "val", "test") if k in data]
    assert splits
    for split in splits:
        entries = split if isinstance(split, list) else [split]
        for ds in entries:
            assert "type" in ds
            assert ("ann_file" in ds or "records" in ds
                    or "Synthetic" in ds["type"])
