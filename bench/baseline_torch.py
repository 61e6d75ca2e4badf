#!/usr/bin/env python
"""Locally-measured PyTorch reference throughput (eager torch, CPU).

The actual reference stack (mmaction2 + mmcv + Decord, CUDA) cannot run in
this image (mmcv not installed, no GPU), and it publishes no numbers
(BASELINE.md). This script measures a compute-equivalent eager-PyTorch
implementation of the same eval workload — Video Swin-B (3D shifted-window
attention, written independently against the architecture spec) + HF
BertModel-base text tower — on the host CPU, producing the
"measured PyTorch ref clips/sec/chip" row of BASELINE.md.

Run: USE_TF=0 python bench/baseline_torch.py [--frames 8 --batch 4 --iters 3]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch
import torch.nn as nn


class WindowAttention3D(nn.Module):
    def __init__(self, dim, window, heads):
        super().__init__()
        self.window = window
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        n = window[0] * window[1] * window[2]
        table = (2 * window[0] - 1) * (2 * window[1] - 1) * (2 * window[2] - 1)
        self.bias_table = nn.Parameter(torch.zeros(table, heads))
        self.register_buffer("bias_idx", torch.zeros(n, n, dtype=torch.long))

    def forward(self, x, mask=None):
        Bn, N, C = x.shape
        qkv = self.qkv(x).reshape(Bn, N, 3, self.heads, C // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn + self.bias_table[self.bias_idx].permute(2, 0, 1)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(Bn // nW, nW, self.heads, N, N) + mask[None, :, None]
            attn = attn.view(Bn, self.heads, N, N)
        x = (attn.softmax(-1) @ v).transpose(1, 2).reshape(Bn, N, C)
        return self.proj(x)


class SwinBlock3D(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window = window
        self.shift = shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention3D(dim, window, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential(
            nn.Linear(dim, 4 * dim), nn.GELU(), nn.Linear(4 * dim, dim))

    def forward(self, x):
        # x: (B, D, H, W, C); window assumed to divide (after clamp by caller)
        B, D, H, W, C = x.shape
        wd, wh, ww = self.window
        shortcut = x
        x = self.norm1(x)
        if any(self.shift):
            x = torch.roll(x, shifts=tuple(-s for s in self.shift), dims=(1, 2, 3))
        x = x.view(B, D // wd, wd, H // wh, wh, W // ww, ww, C)
        x = x.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wd * wh * ww, C)
        x = self.attn(x)
        x = x.view(B, D // wd, H // wh, W // ww, wd, wh, ww, C)
        x = x.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, D, H, W, C)
        if any(self.shift):
            x = torch.roll(x, shifts=self.shift, dims=(1, 2, 3))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class VideoSwinB(nn.Module):
    """Swin-B scale: embed 128, depths (2,2,18,2), heads (4,8,16,32)."""

    def __init__(self, frames=8):
        super().__init__()
        self.patch = nn.Conv3d(3, 128, kernel_size=(2, 4, 4), stride=(2, 4, 4))
        self.norm0 = nn.LayerNorm(128)
        depths = (2, 2, 18, 2)
        heads = (4, 8, 16, 32)
        latent_t = frames // 2
        self.stages = nn.ModuleList()
        self.merges = nn.ModuleList()
        dims = [128 * 2 ** i for i in range(4)]
        sizes = [(latent_t, 56, 56), (latent_t, 28, 28), (latent_t, 14, 14),
                 (latent_t, 7, 7)]
        for i, (dim, depth) in enumerate(zip(dims, depths)):
            wt = min(8, sizes[i][0])
            wsp = min(7, sizes[i][1])
            window = (wt, wsp, wsp)
            blocks = nn.ModuleList()
            for b in range(depth):
                shift = ((0, 0, 0) if b % 2 == 0 else
                         tuple(w // 2 for w in window))
                # zero temporal shift when window == extent (clamped)
                if window[0] >= sizes[i][0]:
                    shift = (0, shift[1], shift[2])
                blocks.append(SwinBlock3D(dim, heads[i], window, shift))
            self.stages.append(blocks)
            if i < 3:
                self.merges.append(nn.Sequential(
                    nn.LayerNorm(4 * dim), nn.Linear(4 * dim, 2 * dim, bias=False)))
        self.norm = nn.LayerNorm(dims[-1])

    def forward(self, x):
        # x: (B, 3, T, H, W)
        x = self.patch(x)
        x = x.permute(0, 2, 3, 4, 1)  # B D H W C
        x = self.norm0(x)
        for i, blocks in enumerate(self.stages):
            for blk in blocks:
                x = blk(x)
            if i < 3:
                B, D, H, W, C = x.shape
                x = torch.cat(
                    [x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
                     x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]], dim=-1)
                x = self.merges[i](x)
        return self.norm(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)

    import transformers

    bert_cfg = transformers.BertConfig()
    text = transformers.BertModel(bert_cfg, add_pooling_layer=False).eval()
    video = VideoSwinB(args.frames).eval()
    img_proj = nn.Sequential(nn.Linear(1024, 1536), nn.LayerNorm(1536),
                             nn.GELU(), nn.Linear(1536, 768), nn.LayerNorm(768))
    txt_proj = nn.Sequential(nn.Linear(768, 768), nn.GELU(), nn.Linear(768, 768))

    rng = np.random.default_rng(0)
    imgs = torch.tensor(rng.normal(size=(
        args.batch, 3, args.frames, 224, 224)).astype(np.float32))
    ids = torch.tensor(rng.integers(0, 30522, size=(args.batch, 30)))
    mask = torch.ones(args.batch, 30, dtype=torch.long)

    def step():
        with torch.no_grad():
            feat = video(imgs)
            v = img_proj(feat.mean(dim=(1, 2, 3)))
            t = txt_proj(text(input_ids=ids, attention_mask=mask
                              ).last_hidden_state[:, 0])
        return v, t

    step()  # warmup
    t0 = time.time()
    for _ in range(args.iters):
        step()
    dt = time.time() - t0
    clips_per_sec = args.batch * args.iters / dt
    print(json.dumps({
        "metric": "torch_cpu_eval_clips_per_sec",
        "value": clips_per_sec,
        "batch": args.batch,
        "frames": args.frames,
        "iters": args.iters,
        "seconds": dt,
        "torch_threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
