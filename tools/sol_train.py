#!/usr/bin/env python
"""Speed-of-light analysis of a compiled train/eval step (VERDICT r2 #1).

Parses the optimized TPU HLO text of one step, inventories every GEMM
(XLA lowers 2-D dots to `convolution` ops, including inside fusion
bodies), and prices each against the MXU: dense time at the dtype rate,
and padded time with operand dims rounded up to the 128-lane / 8-sublane
tile grid (the padding the MXU actually pays). Pallas custom-calls are
priced analytically from the kernel shape registry below.

Usage:
  python tools/sol_train.py /tmp/train_step_hlo.txt [--peak-bf16 197e12]

Output: per-source-line GEMM table (dense SOL, padded SOL, dtype), the
padded-vs-dense structural loss, and a floor summary to compare against
the measured step time. HBM floor comes from the executable's
cost_analysis (pass --bytes N) when available.
"""

from __future__ import annotations

import argparse
import collections
import re

# v5e per-chip peaks (public spec): 197 TFLOP/s bf16; HBM ~819 GB/s.
# f32-OPERAND GEMMs: under jax/XLA DEFAULT matmul precision the MXU runs
# them as ONE bf16 pass (operands truncated) — measured here: explicitly
# casting the 2.42 TF/step of f32-operand MLP-bwd dots to bf16 changed
# throughput by 0.0% (BASELINE.md r3). Price them at the bf16 rate;
# --f32-divisor 4 models HIGHEST-precision (multi-pass) instead.
PEAK_BF16 = 197e12
F32_DIVISOR = 1.0
HBM_BPS = 819e9


def _pad(v: int, to: int) -> int:
    return -(-v // to) * to


def parse_gemms(path: str):
    defrx = re.compile(
        r"^\s*(%\S+) = ((?:bf16|f32|f16|s32|u32|pred|s8)\[[0-9,]*\])")
    shape = {}
    with open(path) as f:
        for line in f:
            m = defrx.match(line)
            if m:
                shape[m.group(1)] = m.group(2)
    convrx = re.compile(
        r"^\s*(%\S+) = (bf16|f32)\[([0-9,]*)\]\{[^}]*\} convolution\("
        r"(%\S+), (%\S+)\)(?:.*?source_file=\"([^\"]*)\" source_line=(\d+))?")
    rows = []
    with open(path) as f:
        for line in f:
            m = convrx.match(line)
            if not m:
                continue
            name, odt, oshp, aop, bop, sf, sl = m.groups()
            a, b = shape.get(aop), shape.get(bop)
            if not a or not b:
                continue
            adt, bdt = a.split("[")[0], b.split("[")[0]
            ash = [int(v) for v in a.split("[")[1][:-1].split(",") if v]
            o = [int(v) for v in oshp.split(",") if v]
            if len(o) != 2 or len(ash) != 2:
                continue
            M, N = o
            K = ash[1] if ash[0] == M else ash[0]
            src = f"{(sf or '?').split('/')[-1]}:{sl}" if sf else "?"
            rows.append((M, K, N, adt, bdt, src))
    return rows


def gemm_times(M, K, N, adt, bdt, f32_divisor=1.0):
    """(dense_s, padded_s): MXU time at the operand-dtype rate."""
    rate = (PEAK_BF16 if (adt != "f32" and bdt != "f32")
            else PEAK_BF16 / f32_divisor)
    dense = 2.0 * M * K * N / rate
    padded = 2.0 * _pad(M, 8) * _pad(K, 128) * _pad(N, 128) / rate
    return dense, padded


# pallas window-attention kernels: per-(stage, pass) dot inventory.
# Logical dims per stage of Swin-B at T x 224^2: rows =
# streams*B*T'*H'*W' (pretrain: 2 streams fwd+bwd; eval: 1 stream fwd
# only), nH heads, hd=32, N window tokens (196 at T'=4; (8,7,7)-window
# 392 at T' >= 8), region lanes nr=8 -> QK-type contraction hd+nr=40.
def attn_dots(B=16, T2=4, streams=2, fwd_only=False,
              stages=((128, 4, 56, 2), (256, 8, 28, 2),
                      (512, 16, 14, 18), (1024, 32, 7, 2))):
    out = []
    for C, nH, S, depth in stages:
        rows = streams * B * T2 * S * S
        N = min(T2, 8) * 49 if S >= 7 else T2 * S * S
        hd, nr = 32, 8
        W = rows // N
        # fwd: QK^T (contraction hd+nr lanes), PV (contraction N, [v|1])
        fwd = [(W * N, hd + nr, N), (W * N, N, hd + 1)]
        # bwd (p32 form): recompute QK^T, dv = p^T g, dp = g v^T,
        # dq = dS k, dk = dS^T q  (per head)
        bwd = [] if fwd_only else [
            (W * N, hd + nr, N), (N * W, N, hd), (W * N, hd, N),
            (W * N, N, hd + nr), (W * N, N, hd + nr)]
        for (M, K, Nn) in fwd + bwd:
            for _ in range(nH * depth):
                out.append((M, K, Nn, "bf16", "bf16", f"attn-s{C}"))
    return out


def mlp_dots(B=16, T2=4, streams=2,
             stages=((128, 4, 56, 2), (256, 8, 28, 2),
                     (512, 16, 14, 18), (1024, 32, 7, 2))):
    """Swin MLP halves when they run as pallas kernels (fused_mlp default:
    fc1 + gelu + fc2 in VMEM) — their GEMMs never appear in the HLO.
    Forward only (the explicit bwd runs as XLA GEMMs, which parse)."""
    out = []
    for C, nH, S, depth in stages:
        rows = streams * B * T2 * S * S
        for _ in range(depth):
            out.append((rows, C, 4 * C, "bf16", "bf16", f"mlp-s{C}"))
            out.append((rows, 4 * C, C, "bf16", "bf16", f"mlp-s{C}"))
    return out


def attn_block_dots(B=16, T2=4, streams=1,
                    stages=((128, 4, 56, 2), (256, 8, 28, 2),
                            (512, 16, 14, 18), (1024, 32, 7, 2))):
    """qkv + proj GEMMs when the fused attn-block half kernel is active
    (auto gate N >= 384, i.e. 32-frame shapes) — in-kernel, not in HLO."""
    out = []
    for C, nH, S, depth in stages:
        rows = streams * B * T2 * S * S
        for _ in range(depth):
            out.append((rows, C, 3 * C, "bf16", "bf16", f"qkvproj-s{C}"))
            out.append((rows, C, C, "bf16", "bf16", f"qkvproj-s{C}"))
    return out


def attn_vpu_floor(B=16, T2=4, streams=2, fwd_only=False,
                   stages=((128, 4, 56, 2), (256, 8, 28, 2),
                           (512, 16, 14, 18), (1024, 32, 7, 2)),
                   vpu_ops_per_sec=3.8e12):
    """Softmax VPU floor: logits live at lane-padded width. Per element:
    fwd ~10 f32 VPU ops (shifted exp ~7 + cast + bias add), bwd ~14
    (exp recompute + p32 normalize + dlog fused mul-sub + casts)."""
    total = 0.0
    for C, nH, S, depth in stages:
        rows = streams * B * T2 * S * S
        N = min(T2, 8) * 49 if S >= 7 else T2 * S * S
        elems = rows * _pad(N, 128) * nH * depth
        total += elems * (10 + (0 if fwd_only else 14)) / vpu_ops_per_sec
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hlo")
    ap.add_argument("--bytes", type=float, default=None,
                    help="total HBM bytes/step (from cost_analysis)")
    ap.add_argument("--measured-ms", type=float, default=None)
    ap.add_argument("--attn-batch", type=int, default=16)
    ap.add_argument("--attn-t2", type=int, default=4,
                    help="temporal tokens T/2 (4 for 8-frame, 16 for 32)")
    ap.add_argument("--streams", type=int, default=2,
                    help="Swin streams (2 pretrain, 1 eval/finetune)")
    ap.add_argument("--fwd-only", action="store_true",
                    help="eval step: price only forward attention dots")
    ap.add_argument("--mlp-pallas", action="store_true",
                    help="add the fused-MLP kernels' in-VMEM GEMMs "
                         "(forward) to the inventory")
    ap.add_argument("--attn-block-fused", action="store_true",
                    help="add the fused attn-block half's in-kernel "
                         "qkv/proj GEMMs (N >= 384 shapes)")
    ap.add_argument("--f32-divisor", type=float, default=1.0)
    ap.add_argument("--remat-stages", default=None,
                    help="comma-separated Swin stage ids that run under "
                         "remat (e.g. '0,1' for the 32-frame recipe): "
                         "their PALLAS fwd kernels re-execute in the "
                         "backward, which the analytic inventory must "
                         "count once more (their XLA recompute GEMMs "
                         "already appear in the HLO; kernel dots do not)")
    args = ap.parse_args()

    all_stages = ((128, 4, 56, 2), (256, 8, 28, 2),
                  (512, 16, 14, 18), (1024, 32, 7, 2))
    rows = parse_gemms(args.hlo) + attn_dots(
        B=args.attn_batch, T2=args.attn_t2, streams=args.streams,
        fwd_only=args.fwd_only)
    if args.mlp_pallas:
        rows += mlp_dots(B=args.attn_batch, T2=args.attn_t2,
                         streams=args.streams)
    if args.remat_stages:
        remat = tuple(all_stages[int(s)]
                      for s in args.remat_stages.split(","))
        rows += attn_dots(B=args.attn_batch, T2=args.attn_t2,
                          streams=args.streams, fwd_only=True, stages=remat)
        if args.mlp_pallas:
            rows += mlp_dots(B=args.attn_batch, T2=args.attn_t2,
                             streams=args.streams, stages=remat)
    if args.attn_block_fused:
        rows += attn_block_dots(B=args.attn_batch, T2=args.attn_t2,
                                streams=args.streams)
    per_src = collections.defaultdict(lambda: [0.0, 0.0, 0])
    tot_d = tot_p = 0.0
    for M, K, N, adt, bdt, src in rows:
        d, p = gemm_times(M, K, N, adt, bdt, args.f32_divisor)
        key = (src, "f32" if "f32" in (adt, bdt) else "bf16")
        per_src[key][0] += d
        per_src[key][1] += p
        per_src[key][2] += 1
        tot_d += d
        tot_p += p
    print(f"{'source':<38} {'dt':<5} {'#':>5} {'dense ms':>9} "
          f"{'padded ms':>10} {'pad x':>6}")
    for (src, dt), (d, p, n) in sorted(per_src.items(),
                                       key=lambda kv: -kv[1][1]):
        print(f"{src:<38} {dt:<5} {n:>5} {d * 1e3:>9.2f} {p * 1e3:>10.2f} "
              f"{p / max(d, 1e-12):>6.2f}")
    vpu = attn_vpu_floor(B=args.attn_batch, T2=args.attn_t2,
                         streams=args.streams, fwd_only=args.fwd_only)
    if args.remat_stages:
        vpu += attn_vpu_floor(B=args.attn_batch, T2=args.attn_t2,
                              streams=args.streams, fwd_only=True,
                              stages=remat)
    print(f"\nGEMM floor: dense {tot_d * 1e3:.1f} ms, "
          f"padded {tot_p * 1e3:.1f} ms "
          f"(structural padding {tot_p / tot_d:.2f}x)")
    print(f"attention softmax VPU floor: ~{vpu * 1e3:.1f} ms "
          f"(overlaps MXU only partially inside a kernel)")
    print(f"padded GEMM + softmax VPU: {(tot_p + vpu) * 1e3:.1f} ms")
    if args.bytes:
        print(f"HBM floor: {args.bytes / HBM_BPS * 1e3:.1f} ms")
    if args.measured_ms:
        print(f"measured step: {args.measured_ms:.1f} ms -> "
              f"{100 * tot_p * 1e3 / args.measured_ms:.0f}% of padded GEMM "
              f"floor, {100 * tot_d * 1e3 / args.measured_ms:.0f}% of dense")


if __name__ == "__main__":
    main()
