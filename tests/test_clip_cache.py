"""Packed clip cache (data/clip_cache.py): round-trip, dataset drop-in,
worker pickling, and the loader-throughput contract (decode-free fetch)."""

import json
import os
import pickle
import subprocess
import sys
import time

import numpy as np
import pytest

from clover_tpu.data.clip_cache import (
    ClipCache,
    ClipCacheWriter,
    PackedClipBackend,
    build_clip_cache,
)
from clover_tpu.data.decode import SyntheticVideoBackend, get_backend


@pytest.fixture()
def tiny_pack(tmp_path):
    stem = str(tmp_path / "pack")
    rng = np.random.default_rng(0)
    clips = {f"vids/v{i:03d}.mp4": rng.integers(0, 256, size=(4, 8, 8, 3),
                                                dtype=np.uint8)
             for i in range(5)}
    with ClipCacheWriter(stem, 4, 8, 8) as w:
        for key, clip in clips.items():
            w.append(key, clip)
    return stem, clips


def test_roundtrip_and_frame_slicing(tiny_pack):
    stem, clips = tiny_pack
    cache = ClipCache(stem)
    assert len(cache) == 5
    for key, clip in clips.items():
        np.testing.assert_array_equal(cache.get(key), clip)
        np.testing.assert_array_equal(cache.get(key, [3, 0]), clip[[3, 0]])


def test_backend_interface_and_prefix_matching(tiny_pack):
    stem, clips = tiny_pack
    backend = get_backend("packed", path=stem + ".json")
    key = "vids/v002.mp4"
    assert backend.num_frames(key) == 4
    # absolute prefixed path resolves to the relative key
    np.testing.assert_array_equal(
        backend.decode(os.path.join("/data/root", key), [1, 2]),
        clips[key][[1, 2]])
    with pytest.raises(KeyError):
        backend.decode("vids/missing.mp4", [0])


def test_shape_mismatch_rejected(tmp_path):
    with ClipCacheWriter(str(tmp_path / "p"), 2, 4, 4) as w:
        with pytest.raises(ValueError):
            w.append("a", np.zeros((2, 4, 5, 3), np.uint8))
        w.append("a", np.zeros((2, 4, 4, 3), np.uint8))


def test_pickle_for_process_workers(tiny_pack):
    stem, clips = tiny_pack
    backend = PackedClipBackend(stem)
    backend.decode("vids/v000.mp4", [0])        # force the mmap open
    clone = pickle.loads(pickle.dumps(backend))  # mmap must not be pickled
    np.testing.assert_array_equal(clone.decode("vids/v001.mp4", [2]),
                                  clips["vids/v001.mp4"][[2]])


def test_build_clip_cache_matches_source(tmp_path):
    """Packed frames == source decode + canonical resize at eval indices."""
    from clover_tpu.data.sampling import sample_frame_indices
    from clover_tpu.ops.preprocess import canonical_host_resize

    src = SyntheticVideoBackend(height=40, width=56, length=12)
    keys = ["a.mp4", "b.mp4"]
    cache = build_clip_cache(str(tmp_path / "p"), keys, src,
                             num_frames=4, size=32)
    for key in keys:
        inds = sample_frame_indices(12, clip_len=1, num_clips=4, test_mode=True)
        expect = canonical_host_resize(src.decode(key, inds), 32)
        np.testing.assert_array_equal(cache.get(key), expect)


def test_dataset_drop_in(tmp_path):
    """VideoTextDataset(backend='packed') serves identical eval samples to
    the source-decode path when the pack holds the same eval frames."""
    from clover_tpu.data.datasets import VideoTextDataset
    from clover_tpu.data.tokenization import BertTokenizer, build_test_vocab

    tok = BertTokenizer(build_test_vocab("caption video clip".split()))
    ann = tmp_path / "ann.jsonl"
    keys = [f"v{i}.mp4" for i in range(4)]
    with open(ann, "w") as f:
        for i, key in enumerate(keys):
            f.write(json.dumps({"filename": key, "text": f"caption {i}"}) + "\n")

    common = dict(ann_file=str(ann), tokenizer=tok, num_frames=4,
                  test_num_frames=4, canonical_size=32,
                  test_canonical_size=32, test_mode=True)
    src_ds = VideoTextDataset(backend="synthetic",
                              backend_kwargs={"height": 40, "width": 56,
                                              "length": 12}, **common)
    build_clip_cache(str(tmp_path / "p"), keys,
                     SyntheticVideoBackend(height=40, width=56, length=12),
                     num_frames=12, size=32)
    pack_ds = VideoTextDataset(backend="packed",
                               backend_kwargs={"path": str(tmp_path / "p")},
                               **common)
    for i in range(len(src_ds)):
        a, b = src_ds[i], pack_ds[i]
        np.testing.assert_array_equal(a["imgs"], b["imgs"])
        np.testing.assert_array_equal(a["token_ids"], b["token_ids"])


def test_cli_builds_pack(tmp_path):
    ann = tmp_path / "ann.txt"
    ann.write_text("x.mp4\ny.mp4\n")
    out = str(tmp_path / "cli_pack")
    res = subprocess.run(
        [sys.executable, "tools/build_clip_cache.py", "--ann", str(ann),
         "--backend", "synthetic", "--backend-arg", "length=8",
         "--out", out, "--frames", "4", "--size", "16"],
        capture_output=True, text=True, cwd=os.getcwd())
    assert res.returncode == 0, res.stderr
    cache = ClipCache(out)
    assert len(cache) == 2 and cache.get("x.mp4").shape == (4, 16, 16, 3)


def test_decode_free_fetch_is_fast(tiny_pack, tmp_path):
    """The contract that makes the cache worth existing: per-clip fetch is
    memcpy-bound. 1000 fetches of a 1.5 KiB record must finish far inside
    any decode budget (~ms each); bound generously for CI noise."""
    stem, _ = tiny_pack
    backend = PackedClipBackend(stem)
    backend.decode("vids/v000.mp4", [0, 1, 2, 3])  # open mmap
    t0 = time.perf_counter()
    for i in range(1000):
        backend.decode(f"vids/v{i % 5:03d}.mp4", [0, 1, 2, 3])
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"1000 packed fetches took {dt:.2f}s"


# ---- layout='s2d' packs (pre-transposed patch-embed records) -----------


def test_s2d_pack_roundtrip_matches_host_s2d(tmp_path):
    """s2d records == space_to_depth_host(resized source clip) — the pack
    pays the exact transform the host_s2d collate would have."""
    from clover_tpu.data.sampling import sample_frame_indices
    from clover_tpu.ops.preprocess import canonical_host_resize, space_to_depth_host

    src = SyntheticVideoBackend(height=40, width=56, length=12)
    keys = ["a.mp4", "b.mp4"]
    cache = build_clip_cache(str(tmp_path / "p"), keys, src,
                             num_frames=4, size=32, s2d_patch=(2, 4, 4))
    assert cache.layout == "s2d" and cache.patch == (2, 4, 4)
    assert cache.record_shape == (2, 8, 8, 96)
    for key in keys:
        inds = sample_frame_indices(12, clip_len=1, num_clips=4,
                                    test_mode=True)
        expect = space_to_depth_host(
            canonical_host_resize(src.decode(key, inds), 32), (2, 4, 4))
        np.testing.assert_array_equal(cache.get(key), expect)


def test_s2d_pack_rejects_frame_sampling(tmp_path):
    src = SyntheticVideoBackend(height=40, width=56, length=12)
    cache = build_clip_cache(str(tmp_path / "p"), ["a.mp4"], src,
                             num_frames=4, size=32, s2d_patch=(2, 4, 4))
    np.testing.assert_array_equal(cache.get("a.mp4", [0, 1, 2, 3]),
                                  cache.get("a.mp4"))   # identity is fine
    with pytest.raises(ValueError, match="frame sampling"):
        cache.get("a.mp4", [0, 2])


def test_get_is_zero_copy_view(tiny_pack):
    stem, clips = tiny_pack
    cache = ClipCache(stem)
    rec = cache.get("vids/v001.mp4")
    assert isinstance(rec.base, np.memmap) or isinstance(rec, np.memmap)
    assert not rec.flags.writeable
    owned = cache.get("vids/v001.mp4", copy=True)
    assert owned.base is None and owned.flags.writeable
    np.testing.assert_array_equal(rec, owned)


def test_s2d_dataset_collate_equals_host_s2d_path(tmp_path):
    """VideoTextDataset(s2d pack) through the loader collate produces the
    SAME batches as the decode path through the host_s2d collate — the
    transform just moved from load time to build time."""
    from clover_tpu.data.datasets import VideoTextDataset
    from clover_tpu.data.loader import make_s2d_collate, default_collate
    from clover_tpu.data.tokenization import BertTokenizer, build_test_vocab

    tok = BertTokenizer(build_test_vocab("caption video clip".split()))
    ann = tmp_path / "ann.jsonl"
    keys = [f"v{i}.mp4" for i in range(4)]
    with open(ann, "w") as f:
        for i, key in enumerate(keys):
            f.write(json.dumps({"filename": key, "text": f"caption {i}"}) + "\n")

    common = dict(ann_file=str(ann), tokenizer=tok, num_frames=4,
                  test_num_frames=4, canonical_size=32,
                  test_canonical_size=32, test_mode=True)
    src_ds = VideoTextDataset(backend="synthetic",
                              backend_kwargs={"height": 40, "width": 56,
                                              "length": 12}, **common)
    build_clip_cache(str(tmp_path / "p"), keys,
                     SyntheticVideoBackend(height=40, width=56, length=12),
                     num_frames=4, size=32, s2d_patch=(2, 4, 4))
    pack_ds = VideoTextDataset(backend="packed",
                               backend_kwargs={"path": str(tmp_path / "p")},
                               **common)
    collate = make_s2d_collate((2, 4, 4), default_collate)
    a = collate([src_ds[i] for i in range(4)])
    b = collate([pack_ds[i] for i in range(4)])
    np.testing.assert_array_equal(a["imgs"], b["imgs"])
    np.testing.assert_array_equal(a["token_ids"], b["token_ids"])


def test_s2d_pack_rejects_train_mode(tmp_path):
    from clover_tpu.data.datasets import VideoTextDataset
    from clover_tpu.data.tokenization import BertTokenizer, build_test_vocab

    tok = BertTokenizer(build_test_vocab("caption".split()))
    ann = tmp_path / "ann.jsonl"
    ann.write_text(json.dumps({"filename": "v0.mp4", "text": "caption"}) + "\n")
    build_clip_cache(str(tmp_path / "p"), ["v0.mp4"],
                     SyntheticVideoBackend(height=40, width=56, length=12),
                     num_frames=4, size=32, s2d_patch=(2, 4, 4))
    ds = VideoTextDataset(ann_file=str(ann), tokenizer=tok, num_frames=4,
                          canonical_size=32, backend="packed",
                          backend_kwargs={"path": str(tmp_path / "p")},
                          test_mode=False)
    with pytest.raises(ValueError, match="eval-only"):
        ds[0]


def test_v1_packs_still_read(tmp_path, tiny_pack):
    """Version-1 metadata (no layout/patch fields) parses as thwc."""
    stem, clips = tiny_pack
    with open(stem + ".json") as f:
        meta = json.load(f)
    meta.pop("layout"); meta.pop("patch"); meta["version"] = 1
    with open(stem + ".json", "w") as f:
        json.dump(meta, f)
    cache = ClipCache(stem)
    assert cache.layout == "thwc"
    np.testing.assert_array_equal(cache.get("vids/v003.mp4"),
                                  clips["vids/v003.mp4"])


# ---- pooled (buffer-reusing) collate ------------------------------------


def test_pooled_collate_values_and_reuse():
    from clover_tpu.data.loader import make_pooled_collate, default_collate

    collate = make_pooled_collate(depth=3)
    rng = np.random.default_rng(0)
    batches = [[{"imgs": rng.integers(0, 255, (4, 8, 8, 3), dtype=np.uint8),
                 "ids": np.arange(5, dtype=np.int32) + b}
                for _ in range(2)] for b in range(7)]
    seen_ptrs = set()
    for b, samples in enumerate(batches):
        out = collate(samples)
        ref = default_collate(samples)
        np.testing.assert_array_equal(out["imgs"], ref["imgs"])
        np.testing.assert_array_equal(out["ids"], ref["ids"])
        seen_ptrs.add(out["imgs"].ctypes.data)
    assert len(seen_ptrs) == 3   # ring of exactly `depth` buffers


def test_loader_reuse_buffers_end_to_end(tiny_pack):
    from clover_tpu.data.loader import DataLoader

    stem, clips = tiny_pack

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            backend = PackedClipBackend(stem)
            return {"imgs": backend.decode(f"vids/v{i:03d}.mp4",
                                           [0, 1, 2, 3])}

    loader = DataLoader(DS(), batch_size=2, shuffle=False, drop_last=True,
                        num_workers=2, prefetch=1, reuse_buffers=4)
    got = list(loader.epoch(0))
    assert len(got) == 2
    for b, batch in enumerate(got):
        for j in range(2):
            np.testing.assert_array_equal(
                batch["imgs"][j], clips[f"vids/v{2 * b + j:03d}.mp4"])

    with pytest.raises(ValueError, match="reuse_buffers"):
        DataLoader(DS(), batch_size=2, prefetch=2, reuse_buffers=3)
