"""Native FFmpeg batch decoder (csrc/video_decoder.cc) — parity with the
OpenCV backend and seek-pattern correctness.

The reference decodes with Decord's C++ VideoReader
(mmaction/datasets/pipelines/loading.py:1499-1621); FFmpegVideoBackend is
its equivalent here. Golden is the independent OpenCV sequential-read
backend (itself ffmpeg underneath, so intra-coded MJPEG must match
bit-exactly; inter-coded MPEG-4 gets a small tolerance for decoder
version differences).
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from clover_tpu.data import video_native
from clover_tpu.data.decode import DecodeError, get_backend

pytestmark = pytest.mark.skipif(
    not video_native.native_available(),
    reason="native video decoder unavailable (no g++/FFmpeg dev libs)")


def _write_video(path, n_frames, fourcc, size=(160, 120), seed=0):
    rng = np.random.default_rng(seed)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), 12.0, size)
    assert w.isOpened()
    for _ in range(n_frames):
        w.write(rng.integers(0, 256, (size[1], size[0], 3), np.uint8))
    w.release()
    return path


@pytest.fixture(scope="module")
def mjpg_video(tmp_path_factory):
    d = tmp_path_factory.mktemp("vids")
    return _write_video(str(d / "v.avi"), 40, "MJPG")


@pytest.fixture(scope="module")
def mp4v_video(tmp_path_factory):
    # inter-coded (P-frames + keyframe GOPs) — exercises seek + flush
    d = tmp_path_factory.mktemp("vids_mp4")
    return _write_video(str(d / "v.mp4"), 60, "mp4v", seed=1)


def test_mjpg_bit_exact_vs_opencv(mjpg_video):
    ff = get_backend("ffmpeg")
    ocv = get_backend("opencv")
    assert ff.num_frames(mjpg_video) == ocv.num_frames(mjpg_video) == 40
    idx = [0, 5, 5, 3, 39, 12]  # duplicates + unsorted + last frame
    a = ff.decode(mjpg_video, idx)
    b = ocv.decode(mjpg_video, idx)
    assert a.shape == b.shape == (6, 120, 160, 3)
    np.testing.assert_array_equal(a, b)


def test_seek_heavy_access_mp4v(mp4v_video):
    ff = get_backend("ffmpeg")
    ocv = get_backend("opencv")
    assert ff.num_frames(mp4v_video) == 60
    # descending + far jumps force backward keyframe seeks mid-GOP
    idx = [55, 2, 30, 30, 59, 0, 17]
    a = ff.decode(mp4v_video, idx).astype(np.int32)
    b = ocv.decode(mp4v_video, idx).astype(np.int32)
    assert int(np.abs(a - b).max()) <= 2  # decoder-version tolerance
    # repeated decode on the cached reader is deterministic
    np.testing.assert_array_equal(a, ff.decode(mp4v_video, idx))


def test_reduced_resolution_decode(mjpg_video):
    ff = get_backend("ffmpeg", target_short_side=64)
    out = ff.decode(mjpg_video, [0, 1])
    assert out.shape[1] == 64  # short side lands at the target
    assert out.shape[2] == int(160 * 64 / 120 + 0.5) // 2 * 2  # aspect kept
    # never upsample: target above native keeps native dims
    ff2 = get_backend("ffmpeg", target_short_side=512)
    assert ff2.decode(mjpg_video, [0]).shape[1:3] == (120, 160)


def test_out_of_range_index_raises(mjpg_video):
    ff = get_backend("ffmpeg")
    with pytest.raises(DecodeError):
        ff.decode(mjpg_video, [40])


def test_reader_cache_reuse_and_eviction(tmp_path, mjpg_video):
    ff = get_backend("ffmpeg", cache_readers=1)
    p2 = _write_video(str(tmp_path / "w.avi"), 8, "MJPG", seed=2)
    a0 = ff.decode(mjpg_video, [3])
    ff.decode(p2, [0])  # evicts the first reader
    assert len(ff._readers) == 1
    np.testing.assert_array_equal(a0, ff.decode(mjpg_video, [3]))


def test_dataset_integration(tmp_path, mjpg_video):
    """The ffmpeg backend plugs into VideoTextDataset like any other."""
    import json

    from clover_tpu.data.datasets import VideoTextDataset
    from clover_tpu.data.tokenization import BertTokenizer, build_test_vocab

    ann = tmp_path / "ann.jsonl"
    with open(ann, "w") as f:
        f.write(json.dumps({"filename": os.path.basename(mjpg_video),
                            "text": "a test clip"}) + "\n")
    tok = BertTokenizer(build_test_vocab(["a", "test", "clip"]))
    ds = VideoTextDataset(
        ann_file=str(ann), data_prefix=os.path.dirname(mjpg_video),
        tokenizer=tok, backend="ffmpeg", num_frames=4, canonical_size=32,
        max_length=8, test_mode=True, test_num_frames=4,
        test_canonical_size=32)
    frames = ds[0]["imgs"][0]
    assert frames.shape == (4, 32, 32, 3)
    assert frames.dtype == np.uint8
