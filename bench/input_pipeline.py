#!/usr/bin/env python
"""Host input-pipeline throughput micro-benchmark.

Measures clips/sec the host loader sustains (decode + canonical resize +
tokenize + mask + collate, thread-prefetched) so device feed rate can be
compared against device compute (bench.py). On production TPU VMs with
many host cores this scales with workers; this image has a single core.

Run: python bench/input_pipeline.py [--backend synthetic|opencv]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clover_tpu.data import DataLoader, make_synthetic_retrieval_dataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-videos", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--canonical", type=int, default=256)
    args = ap.parse_args()

    ds = make_synthetic_retrieval_dataset(
        n_videos=args.n_videos, num_frames=args.frames,
        canonical_size=args.canonical, mlm=True, video_mask=True)
    loader = DataLoader(ds, batch_size=args.batch, num_workers=args.workers)

    # warm epoch
    for _ in loader.epoch(0):
        pass
    t0 = time.time()
    n = 0
    for batch in loader.epoch(1):
        n += batch["imgs"].shape[0]
    dt = time.time() - t0
    print(json.dumps({
        "metric": "host_pipeline_clips_per_sec",
        "value": round(n / dt, 2),
        "clips": n,
        "seconds": round(dt, 3),
        "workers": args.workers,
        "frames": args.frames,
        "canonical": args.canonical,
    }))


if __name__ == "__main__":
    main()
