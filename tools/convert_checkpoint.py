#!/usr/bin/env python
"""Convert pretrained torch / HuggingFace checkpoints into a clover_tpu
parameter checkpoint (the reference's init-time weight surgery as an
offline tool — SURVEY.md §5.4).

Sources:
  --swin path.pth        Video-Swin 3D torch checkpoint (state_dict or
                         {'state_dict': ...}); --inflate-2d for image Swin
  --bert path_or_dir     HF BertModel/BertForPreTraining/BertForMaskedLM
                         torch .bin / .pth state dict (local file; no hub
                         download — zero egress)
Output:
  --out DIR              orbax checkpoint directory holding
                         {'params': {...}} mergeable by tools/train.py's
                         load_from (tower subtrees: backbone,
                         text_backbone, multimodal_backbone, mlm_head)

Example:
  python tools/convert_checkpoint.py \
      --swin swin_base_patch244_window877_kinetics400_22k.pth \
      --bert bert-base-uncased/pytorch_model.bin \
      --depths 2 2 18 2 --fusion-layers 3 --out /ckpts/clover_init
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_torch_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return {k: np.asarray(v) for k, v in obj.items() if hasattr(v, "shape")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--swin", default=None)
    ap.add_argument("--inflate-2d", action="store_true",
                    help="source is an image Swin; inflate temporally")
    ap.add_argument("--bert", default=None)
    ap.add_argument("--depths", type=int, nargs="+", default=[2, 2, 18, 2])
    ap.add_argument("--temporal-patch", type=int, default=2)
    ap.add_argument("--temporal-window", type=int, default=8)
    ap.add_argument("--bert-layers", type=int, default=12)
    ap.add_argument("--fusion-layers", type=int, default=3)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from clover_tpu.models.convert import (
        convert_fusion_from_hf,
        convert_hf_bert,
        convert_mlm_head,
        convert_swin3d,
        inflate_swin2d,
    )

    params = {}
    if args.swin:
        sd = load_torch_state_dict(args.swin)
        if args.inflate_2d:
            sd = inflate_swin2d(sd, args.temporal_patch, args.temporal_window)
        params["backbone"] = convert_swin3d(sd, tuple(args.depths))
        print(f"converted swin: {args.swin}")
    if args.bert:
        sd = load_torch_state_dict(args.bert)
        # strip the BertForPreTraining/MaskedLM 'bert.' prefix when present
        bert_sd = {
            (k[5:] if k.startswith("bert.") else k): v for k, v in sd.items()
        }
        params["text_backbone"] = convert_hf_bert(bert_sd, args.bert_layers)
        params["multimodal_backbone"] = convert_fusion_from_hf(
            sd if any(k.startswith("bert.") for k in sd) else
            {f"bert.{k}": v for k, v in sd.items()},
            num_layers=args.fusion_layers)
        if any(k.startswith("cls.predictions") for k in sd):
            params["mlm_head"] = convert_mlm_head(sd)
            print("converted MLM head (tied decoder)")
        print(f"converted bert: {args.bert}")

    if not params:
        raise SystemExit("nothing to convert: pass --swin and/or --bert")

    import orbax.checkpoint as ocp

    out = os.path.abspath(args.out)
    path = os.path.join(out, "step_0000000000")
    os.makedirs(out, exist_ok=True)
    ocp.PyTreeCheckpointer().save(path, {"step": np.int32(0), "params": params})
    import json

    with open(os.path.join(out, "meta_0000000000.json"), "w") as f:
        json.dump({"step": 0, "source_swin": args.swin,
                   "source_bert": args.bert}, f)
    print(f"saved converted params to {path}")


if __name__ == "__main__":
    main()
