#!/usr/bin/env python
"""Build a decode-free packed clip cache (data/clip_cache.py) from an
annotation file + decode backend.

The one-time decode cost this tool pays is what the reference paid EVERY
epoch per worker (Decord decode in the loader, loading.py:1499-1621);
afterwards the training/eval loader's per-clip host cost is a memcpy.

Examples:
  # eval pack: 8 frames, short-side resize + center crop to 224^2
  python tools/build_clip_cache.py --ann msrvtt_test.jsonl --data-root /data \
      --backend ffmpeg --out /cache/msrvtt_eval8 --frames 8 --size 224

  # train pack: 32 packed frames at short-side 256 (TSN sampling at load
  # time picks 8/16/32 of them; device RandomResizedCrop keeps its freedom)
  python tools/build_clip_cache.py --ann webvid_train.jsonl --data-root /data \
      --backend ffmpeg --out /cache/webvid_train32 --frames 32 --size 256 \
      --resize short_side
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from clover_tpu.data.clip_cache import build_clip_cache  # noqa: E402
from clover_tpu.data.datasets import load_annotations  # noqa: E402
from clover_tpu.data.decode import get_backend  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ann", required=True, help="annotation file (jsonl/txt/pkl)")
    ap.add_argument("--data-root", default="", help="prefix joined to filenames")
    ap.add_argument("--backend", default="opencv",
                    help="source decode backend (opencv/ffmpeg/synthetic/...)")
    ap.add_argument("--backend-arg", action="append", default=[],
                    help="key=value kwargs for the source backend")
    ap.add_argument("--out", required=True, help="output pack stem (writes .bin/.json)")
    ap.add_argument("--frames", type=int, default=8, help="frames per packed clip")
    ap.add_argument("--size", type=int, default=224, help="short-side / square size")
    ap.add_argument("--resize", default="center",
                    choices=["center", "short_side", "none"])
    ap.add_argument("--limit", type=int, default=0, help="pack only the first N")
    ap.add_argument("--log-every", type=int, default=200)
    args = ap.parse_args()

    kwargs = {}
    for kv in args.backend_arg:
        key, val = kv.split("=", 1)
        kwargs[key] = int(val) if val.isdigit() else val
    backend = get_backend(args.backend, **kwargs)

    records = load_annotations(args.ann)
    keys = []
    seen = set()
    for rec in records:
        fn = rec["filename"]
        if fn not in seen:
            seen.add(fn)
            keys.append(fn)
    if args.limit:
        keys = keys[: args.limit]

    t0 = time.time()
    cache = build_clip_cache(
        args.out, keys, backend, num_frames=args.frames, size=args.size,
        data_prefix=args.data_root, resize=args.resize,
        log_every=args.log_every)
    dt = time.time() - t0
    rec_bytes = cache.frames * cache.height * cache.width * 3
    print(f"packed {len(cache)} clips in {dt:.1f}s "
          f"({rec_bytes / 2**20:.2f} MiB/clip, "
          f"{len(cache) * rec_bytes / 2**30:.2f} GiB total) -> {args.out}.bin")


if __name__ == "__main__":
    main()
