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


def _make_real_videos(n: int, frames: int, size: int, tmpdir: str):
    """Synthesize MJPG .avi clips + jsonl annotations so the REAL decode
    path (cv2.VideoCapture inside VideoTextDataset) is measurable without
    downloading data."""
    import json as _json

    import cv2
    import numpy as np

    rng = np.random.default_rng(0)
    ann_path = os.path.join(tmpdir, "ann.jsonl")
    with open(ann_path, "w") as f:
        for i in range(n):
            path = os.path.join(tmpdir, f"v{i:04d}.avi")
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                                12.0, (size, size))
            assert w.isOpened()
            for _ in range(frames * 4):
                w.write(rng.integers(0, 256, (size, size, 3), np.uint8))
            w.release()
            f.write(_json.dumps({"filename": os.path.basename(path),
                                 "text": f"synthetic clip number {i}"}) + "\n")
    return ann_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-videos", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--worker-type", default="thread",
                    choices=["thread", "process"])
    ap.add_argument("--canonical", type=int, default=256)
    ap.add_argument("--real-video", action="store_true",
                    help="generate MJPG .avi files and decode them with "
                    "the OpenCV backend instead of the synthetic backend")
    ap.add_argument("--video-size", type=int, default=320,
                    help="encoded frame size for --real-video")
    ap.add_argument("--video-backend", default="opencv",
                    choices=["opencv", "ffmpeg"],
                    help="decode backend for --real-video (ffmpeg = the "
                    "native csrc/video_decoder.cc batch decoder; honours "
                    "--target-short-side for reduced-resolution decode)")
    ap.add_argument("--rawframes", action="store_true",
                    help="generate JPEG frame-cache directories and decode "
                    "with RawFrameBackend (the reference RawFrameDecode "
                    "cache recipe)")
    ap.add_argument("--target-short-side", type=int, default=None,
                    help="enable reduced-resolution JPEG decode in the "
                    "rawframes path (decode at 1/2..1/8 scale, short side "
                    "kept >= this)")
    args = ap.parse_args()

    if args.rawframes:
        import tempfile

        import cv2
        import numpy as np

        from clover_tpu.data.datasets import VideoTextDataset
        from clover_tpu.data.tokenization import BertTokenizer, build_test_vocab

        tmpdir = tempfile.mkdtemp(prefix="clover_rawbench_")
        rng = np.random.default_rng(0)
        import json as _json

        ann = os.path.join(tmpdir, "ann.jsonl")
        h, w = args.video_size, args.video_size * 4 // 3
        with open(ann, "w") as f:
            for i in range(args.n_videos):
                d = os.path.join(tmpdir, f"v{i:04d}")
                os.makedirs(d)
                # smooth content compresses like real video, not noise
                base = cv2.GaussianBlur(
                    rng.integers(0, 256, (h, w, 3), np.uint8), (0, 0), 9)
                for j in range(args.frames * 4):
                    cv2.imwrite(os.path.join(d, f"img_{j + 1:05d}.jpg"),
                                np.roll(base, j * 5, axis=1),
                                [cv2.IMWRITE_JPEG_QUALITY, 87])
                f.write(_json.dumps({"filename": f"v{i:04d}",
                                     "text": f"synthetic clip number {i}"}) + "\n")
        tok = BertTokenizer(build_test_vocab(
            ["synthetic", "clip", "number"] + [str(i) for i in range(10)]))
        ds = VideoTextDataset(
            ann_file=ann, data_prefix=tmpdir, tokenizer=tok,
            backend="rawframes",
            backend_kwargs={"target_short_side": args.target_short_side},
            num_frames=args.frames, canonical_size=args.canonical,
            max_length=12, mlm=True, video_mask=True)
    elif args.real_video:
        import tempfile

        from clover_tpu.data.datasets import VideoTextDataset
        from clover_tpu.data.tokenization import BertTokenizer, build_test_vocab

        tmpdir = tempfile.mkdtemp(prefix="clover_vidbench_")
        ann = _make_real_videos(args.n_videos, args.frames, args.video_size,
                                tmpdir)
        tok = BertTokenizer(build_test_vocab(
            ["synthetic", "clip", "number"] + [str(i) for i in range(10)]))
        bk_kwargs = {}
        if args.video_backend == "ffmpeg" and args.target_short_side:
            bk_kwargs["target_short_side"] = args.target_short_side
        ds = VideoTextDataset(
            ann_file=ann, data_prefix=tmpdir, tokenizer=tok,
            backend=args.video_backend, backend_kwargs=bk_kwargs,
            num_frames=args.frames,
            canonical_size=args.canonical, max_length=12,
            mlm=True, video_mask=True)
    else:
        ds = make_synthetic_retrieval_dataset(
            n_videos=args.n_videos, num_frames=args.frames,
            canonical_size=args.canonical, mlm=True, video_mask=True)
    loader = DataLoader(ds, batch_size=args.batch, num_workers=args.workers,
                        worker_type=args.worker_type)

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
        "worker_type": args.worker_type,
        "frames": args.frames,
        "canonical": args.canonical,
        "backend": ("rawframes" + (f"-reduced{args.target_short_side}"
                                   if args.target_short_side else "")
                    if args.rawframes else
                    f"{args.video_backend}-mjpg"
                    + (f"-reduced{args.target_short_side}"
                       if args.video_backend == "ffmpeg"
                       and args.target_short_side else "")
                    if args.real_video else "synthetic"),
    }))


if __name__ == "__main__":
    main()
