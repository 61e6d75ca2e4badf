#!/usr/bin/env python
"""One-shot dress rehearsal of real-weight conversion (end-to-end).

Real Clover weights = Kinetics-pretrained image/video Swin-B + HF
bert-base-uncased (reference bert_from_hugface.py:13-15,
swin_transformer_3d.py:130-181). Neither is downloadable in this image,
so this tool rehearses the ENTIRE pipeline with synthetic weights at the
TRUE production shapes:

  1. torch: random image-Swin-B 2D state dict (the official 2D key
     schema: patch_embed.proj 4x4 conv, 169-row relative-position bias
     tables, layers.{i}.{blocks,downsample}) + HF
     BertForPreTraining(bert-base) state dict -> two .pth files
  2. tools/convert_checkpoint.py --swin --inflate-2d --bert -> orbax dir
     (exercises the 2D->3D inflation rules: center-repeat/pd conv
     inflation, (2wd-1)x bias-table tiling)
  3. parity gates (in-process):
     - converted text tower vs HF torch at (B, 30), 12 layers x 768
     - inflated patch embed vs torch Conv3d on the same clip
     - converted MLM head (tied decoder) vs HF cls.predictions
  4. tools/test.py configs/exp/rehearsal_retrieval_fullsize.py
     --load-from <converted> --cpu: full-size retrieval eval end-to-end
     -> R@K metrics

With real checkpoints the only change is the two paths in step 1/2 (plus
model.swin.gelu='erf' for strict activation parity; TODO.md). Run:

  python tools/dress_rehearsal.py --work /tmp/rehearsal
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("USE_TF", "0")

import numpy as np


def synth_swin2d_base_state_dict():
    """Random image-Swin-B state dict in the official 2D key schema
    (swin_base_patch4_window7_224: embed 128, depths 2/2/18/2, heads
    4/8/16/32, window 7, 169-row relative-position bias tables)."""
    import torch

    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    E, depths, heads = 128, (2, 2, 18, 2), (4, 8, 16, 32)
    sd = {
        "patch_embed.proj.weight": t(E, 3, 4, 4),
        "patch_embed.proj.bias": t(E),
        "patch_embed.norm.weight": torch.ones(E),
        "patch_embed.norm.bias": torch.zeros(E),
    }
    for i, d in enumerate(depths):
        C, nH = E * 2 ** i, heads[i]
        for j in range(d):
            p = f"layers.{i}.blocks.{j}"
            sd[f"{p}.norm1.weight"] = torch.ones(C)
            sd[f"{p}.norm1.bias"] = torch.zeros(C)
            sd[f"{p}.attn.qkv.weight"] = t(3 * C, C)
            sd[f"{p}.attn.qkv.bias"] = t(3 * C)
            sd[f"{p}.attn.proj.weight"] = t(C, C)
            sd[f"{p}.attn.proj.bias"] = t(C)
            sd[f"{p}.attn.relative_position_bias_table"] = t(13 * 13, nH)
            sd[f"{p}.attn.relative_position_index"] = torch.zeros(
                49, 49, dtype=torch.long)  # dropped by the converter
            sd[f"{p}.norm2.weight"] = torch.ones(C)
            sd[f"{p}.norm2.bias"] = torch.zeros(C)
            sd[f"{p}.mlp.fc1.weight"] = t(4 * C, C)
            sd[f"{p}.mlp.fc1.bias"] = t(4 * C)
            sd[f"{p}.mlp.fc2.weight"] = t(C, 4 * C)
            sd[f"{p}.mlp.fc2.bias"] = t(C)
        if i < len(depths) - 1:
            sd[f"layers.{i}.downsample.norm.weight"] = torch.ones(4 * C)
            sd[f"layers.{i}.downsample.norm.bias"] = torch.zeros(4 * C)
            sd[f"layers.{i}.downsample.reduction.weight"] = t(2 * C, 4 * C)
    sd["norm.weight"] = torch.ones(E * 8)
    sd["norm.bias"] = torch.zeros(E * 8)
    return sd


def check_text_tower(hf_model, converted_params):
    """Converted 12x768 text tower vs HF torch on the same token batch."""
    import torch

    import jax.numpy as jnp

    from clover_tpu.models.bert import BertConfig, BertTextEncoder

    rng = np.random.default_rng(0)
    ids = rng.integers(1000, 30000, size=(2, 30))
    mask = np.ones((2, 30), dtype=np.int64)
    mask[1, 20:] = 0
    with torch.no_grad():
        ref = hf_model.bert(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    cfg = BertConfig(hidden_dropout=0.0, attention_dropout=0.0)
    out = BertTextEncoder(cfg).apply(
        {"params": converted_params}, jnp.asarray(ids), jnp.asarray(mask),
        deterministic=True)
    err = float(np.max(np.abs(np.asarray(out) - ref)))
    assert err < 2e-4, f"text tower max abs err {err}"
    return err


def check_patch_embed(swin2d_sd, converted_backbone):
    """Inflated patch embed: jax Dense (space-to-depth layout) vs torch
    Conv3d with the reference's center-repeat/pd inflation on one clip."""
    import torch

    w2d = swin2d_sd["patch_embed.proj.weight"]            # (128, 3, 4, 4)
    w3d = (w2d.unsqueeze(2).repeat(1, 1, 2, 1, 1) / 2.0)  # (128, 3, 2, 4, 4)
    b = swin2d_sd["patch_embed.proj.bias"]
    clip = torch.randn(1, 3, 4, 8, 8, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref = torch.nn.functional.conv3d(
            clip, w3d, b, stride=(2, 4, 4)).permute(0, 2, 3, 4, 1).numpy()

    from clover_tpu.ops.preprocess import space_to_depth_host

    x = clip.permute(0, 2, 3, 4, 1).numpy()               # (1, 4, 8, 8, 3)
    cols = space_to_depth_host(x, (2, 4, 4))              # (1, 2, 2, 2, 96)
    kernel = np.asarray(converted_backbone["patch_embed"]["proj"]["kernel"])
    bias = np.asarray(converted_backbone["patch_embed"]["proj"]["bias"])
    out = cols @ kernel + bias
    err = float(np.max(np.abs(out - ref)))
    assert err < 1e-5, f"patch embed max abs err {err}"
    return err


def check_mlm_head(hf_model, converted_params):
    """Converted MLM head (tied decoder) vs HF cls.predictions."""
    import torch

    import jax.numpy as jnp

    from clover_tpu.models.heads import MLMHead

    rng = np.random.default_rng(2)
    h = rng.normal(size=(2, 5, 768)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = hf_model.cls.predictions(torch.tensor(h)).numpy()
    out = MLMHead().apply({"params": converted_params}, jnp.asarray(h))
    err = float(np.max(np.abs(np.asarray(out) - ref)))
    assert err < 2e-4, f"mlm head max abs err {err}"
    return err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/clover_rehearsal")
    ap.add_argument("--skip-eval", action="store_true",
                    help="stop after conversion + parity gates (skip the "
                         "full-size tools/test.py eval)")
    args = ap.parse_args()
    os.makedirs(args.work, exist_ok=True)

    import torch
    import transformers

    t0 = time.time()
    # ---- 1. synthetic full-shape torch checkpoints ----------------------
    swin_sd = synth_swin2d_base_state_dict()
    swin_pth = os.path.join(args.work, "swin_base_patch4_window7_2d.pth")
    torch.save({"model": swin_sd}, swin_pth)   # timm-release wrapping

    hf_cfg = transformers.BertConfig(hidden_dropout_prob=0.0,
                                     attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.BertForPreTraining(hf_cfg)
    hf.eval()
    bert_pth = os.path.join(args.work, "bert_base_uncased.pth")
    torch.save(hf.state_dict(), bert_pth)
    print(f"[1/4] wrote true-shape .pth checkpoints ({time.time()-t0:.0f}s)")

    # ---- 2. convert (the exact real-weights command) ---------------------
    out_dir = os.path.join(args.work, "converted")
    if os.path.isdir(out_dir):
        import shutil

        shutil.rmtree(out_dir)  # orbax refuses to overwrite
    cmd = [sys.executable, os.path.join(REPO, "tools", "convert_checkpoint.py"),
           "--swin", swin_pth, "--inflate-2d", "--bert", bert_pth,
           "--depths", "2", "2", "18", "2", "--fusion-layers", "3",
           "--out", out_dir]
    r = subprocess.run(cmd, capture_output=True, text=True,
                       env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stderr[-3000:]
    print(f"[2/4] converted -> {out_dir} ({time.time()-t0:.0f}s)")

    # ---- 3. parity gates -------------------------------------------------
    import jax

    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    payload = ocp.PyTreeCheckpointer().restore(
        os.path.join(out_dir, "step_0000000000"))
    params = payload["params"]
    errs = {
        "text_tower": check_text_tower(hf, params["text_backbone"]),
        "patch_embed": check_patch_embed(swin_sd, params["backbone"]),
        "mlm_head": check_mlm_head(hf, params["mlm_head"]),
    }
    print(f"[3/4] parity gates pass: "
          + ", ".join(f"{k} err={v:.2e}" for k, v in errs.items())
          + f" ({time.time()-t0:.0f}s)")

    # ---- 4. full-size eval through the CLI -------------------------------
    if args.skip_eval:
        print("PASS (eval skipped)")
        return
    cmd = [sys.executable, os.path.join(REPO, "tools", "test.py"),
           os.path.join(REPO, "configs", "exp",
                        "rehearsal_retrieval_fullsize.py"),
           "--load-from", out_dir, "--cpu"]
    r = subprocess.run(cmd, capture_output=True, text=True,
                       env=dict(os.environ, USE_TF="0"))
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    for k in ("Recall@1", "Recall@5", "Recall@10", "MR"):
        assert k in metrics and np.isfinite(metrics[k]), metrics
    print(f"[4/4] full-size eval metrics: {metrics} ({time.time()-t0:.0f}s)")
    print("PASS — real-weight conversion is a config change away "
          "(swap the two .pth paths; gelu='erf' for strict parity)")


if __name__ == "__main__":
    main()
