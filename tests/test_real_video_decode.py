"""Real encoded-video decode path (the reference's hot path was Decord;
ours is OpenCV behind the same interface). Writes an actual compressed
.avi with cv2.VideoWriter and drives backend + dataset end to end."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from clover_tpu.data.datasets import VideoTextDataset
from clover_tpu.data.decode import OpenCVVideoBackend
from clover_tpu.data.tokenization import BertTokenizer, build_test_vocab


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    """24-frame MJPG video; each frame is a solid gray level = 10*idx, so
    decoded content identifies which frame was read (lossy-codec safe)."""
    d = tmp_path_factory.mktemp("vids")
    path = str(d / "clip.avi")
    h, w, n = 64, 80, 24
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                             12.0, (w, h))
    assert writer.isOpened(), "MJPG VideoWriter unavailable"
    for i in range(n):
        frame = np.full((h, w, 3), i * 10, np.uint8)
        writer.write(frame)
    writer.release()
    assert os.path.getsize(path) > 0
    return path, n


def test_opencv_backend_decodes_requested_frames(tiny_video):
    path, n = tiny_video
    backend = OpenCVVideoBackend()
    assert backend.num_frames(path) == n
    # unsorted + duplicate indices exercise the seek/sort logic
    inds = [5, 0, 17, 5, 23]
    frames = backend.decode(path, inds)
    assert frames.shape == (len(inds), 64, 80, 3)
    assert frames.dtype == np.uint8
    for got, idx in zip(frames, inds):
        level = float(got.mean())
        assert abs(level - idx * 10) < 6, (idx, level)


def test_dataset_end_to_end_with_real_video(tiny_video, tmp_path):
    path, n = tiny_video
    ann = tmp_path / "ann.jsonl"
    ann.write_text(json.dumps(
        {"filename": os.path.basename(path), "text": "a gray test clip"})
        + "\n")
    tok = BertTokenizer(build_test_vocab(["a", "gray", "test", "clip"]))
    ds = VideoTextDataset(
        ann_file=str(ann), data_prefix=os.path.dirname(path),
        tokenizer=tok, backend="opencv", num_frames=4, canonical_size=32,
        max_length=8, test_mode=True, test_num_frames=4,
        test_canonical_size=32)
    sample = ds[0]
    frames = sample["imgs"][0]
    assert frames.shape == (4, 32, 32, 3)
    assert frames.dtype == np.uint8
    # centered TSN sampling over 24 frames -> levels rise monotonically
    levels = frames.reshape(4, -1).mean(axis=1)
    assert (np.diff(levels) > 0).all(), levels


def test_rawframe_backend_reduced_decode(tmp_path):
    """target_short_side: JPEG decoded at DCT-domain reduced scale; level
    chosen so the short side stays >= target, content matches a downscale
    of the full decode."""
    import cv2

    from clover_tpu.data.decode import RawFrameBackend

    d = tmp_path / "v0"
    d.mkdir()
    rng = np.random.default_rng(0)
    base = cv2.GaussianBlur(rng.integers(0, 256, (480, 640, 3), np.uint8),
                            (0, 0), 9)
    for j in range(4):
        cv2.imwrite(str(d / f"img_{j + 1:05d}.jpg"), np.roll(base, j, axis=1),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])

    full = RawFrameBackend().decode(str(d), [0, 2])
    assert full.shape == (2, 480, 640, 3)
    red = RawFrameBackend(target_short_side=224).decode(str(d), [0, 2])
    # 480/2 = 240 >= 224; 480/4 = 120 < 224 -> level 2
    assert red.shape == (2, 240, 320, 3)
    down = np.stack([cv2.resize(f, (320, 240)) for f in full])
    diff = np.abs(down.astype(np.int16) - red.astype(np.int16)).mean()
    assert diff < 12.0, diff
    # target larger than the frame: no reduction
    big = RawFrameBackend(target_short_side=480).decode(str(d), [0])
    assert big.shape == (1, 480, 640, 3)
