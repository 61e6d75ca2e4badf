"""Data-layer tests: tokenizer, masking engines, sampling, datasets, loader."""

import os

import numpy as np
import pytest

from clover_tpu.data import (
    BertTokenizer,
    DataLoader,
    MaskingGenerator,
    RandomMaskGenerator,
    ShardedSampler,
    build_test_vocab,
    make_synthetic_retrieval_dataset,
    sample_frame_indices,
)
from clover_tpu.data.text_masking import (
    IGNORE_INDEX,
    content_word_mask,
    hf_style_mask,
    whole_word_mask,
)
from clover_tpu.data.tokenization import basic_tokenize, wordpiece_tokenize


@pytest.fixture(scope="module")
def tok():
    return BertTokenizer(build_test_vocab(
        "the a dog cat runs jumps quickly park happy".split()))


def test_basic_tokenize():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("Café") == ["cafe"]  # accent strip
    assert basic_tokenize("don't stop") == ["don", "'", "t", "stop"]


def test_wordpiece_greedy(tok):
    # 'dog' is whole-word in vocab
    assert wordpiece_tokenize("dog", tok.vocab) == ["dog"]
    # unseen word decomposes into char pieces from the test vocab
    pieces = wordpiece_tokenize("dogs", tok.vocab)
    assert pieces[0] == "dog" or pieces[0] == "d"
    assert all(p in tok.vocab for p in pieces)


def test_encode_shapes_and_specials(tok):
    enc = tok.encode("the dog runs", max_length=10)
    assert enc["token_ids"].shape == (10,)
    assert enc["token_ids"][0] == tok.cls_id
    n = int(enc["input_mask"].sum())
    assert enc["token_ids"][n - 1] == tok.sep_id
    assert np.all(enc["token_ids"][n:] == tok.pad_id)
    # truncation
    enc2 = tok.encode("the dog runs " * 20, max_length=8)
    assert int(enc2["input_mask"].sum()) == 8
    assert enc2["token_ids"][7] == tok.sep_id


def test_encode_pair_segments(tok):
    enc = tok.encode("the dog", max_length=12, second_text="runs quickly")
    ids, seg = enc["token_ids"], enc["segment_ids"]
    sep_positions = np.where(ids == tok.sep_id)[0]
    assert len(sep_positions) == 2
    assert seg[sep_positions[0]] == 0
    assert seg[sep_positions[1]] == 1


def test_decode_roundtrip(tok):
    enc = tok.encode("the happy dog jumps", max_length=16)
    n = int(enc["input_mask"].sum())
    assert tok.decode(enc["token_ids"][:n]) == "the happy dog jumps"


def test_hf_style_mask(tok):
    rng = np.random.default_rng(0)
    enc = tok.encode("the dog runs quickly in the park", max_length=20)
    masked, label = hf_style_mask(enc["token_ids"], tok, rng, mlm_probability=0.5)
    changed = label != IGNORE_INDEX
    assert changed.any()
    # labels hold original ids; unmasked positions untouched
    np.testing.assert_array_equal(masked[~changed], enc["token_ids"][~changed])
    np.testing.assert_array_equal(label[changed], enc["token_ids"][changed])
    # specials never masked
    assert label[0] == IGNORE_INDEX
    n = int(enc["input_mask"].sum())
    assert label[n - 1] == IGNORE_INDEX and np.all(label[n:] == IGNORE_INDEX)


def test_whole_word_mask_groups(tok):
    rng = np.random.default_rng(1)
    # 'dogs' splits into pieces; whole-word masking must mask all-or-none
    enc = tok.encode("dogs runs", max_length=16)
    for _ in range(20):
        masked, label = whole_word_mask(enc["token_ids"], tok, rng,
                                        mlm_probability=0.4)
        # find the piece group for 'dogs'
        toks = [tok.inv_vocab[int(i)] for i in enc["token_ids"]]
        group = [i for i, t in enumerate(toks)
                 if t.startswith("##") or t in ("dog", "d")]
        # contiguous group positions: masked together or not at all
        flags = [label[i] != IGNORE_INDEX for i in group]
        assert all(flags) or not any(flags)


def test_content_word_mask_prefers_content(tok):
    rng = np.random.default_rng(2)
    enc = tok.encode("the dog", max_length=10)
    hit_content = 0
    for _ in range(20):
        masked, label = content_word_mask(enc["token_ids"], tok, rng,
                                          mlm_probability=0.2)
        pos = np.where(label != IGNORE_INDEX)[0]
        assert len(pos) >= 1
        if all(tok.inv_vocab[int(enc["token_ids"][p])] != "the" for p in pos):
            hit_content += 1
    assert hit_content == 20  # 'dog' always preferred over stop word 'the'


def test_sample_frames_train_and_test():
    rng = np.random.default_rng(0)
    inds = sample_frame_indices(100, num_clips=8, test_mode=False, rng=rng)
    assert inds.shape == (8,)
    assert np.all((inds >= 0) & (inds < 100))
    assert np.all(np.diff(inds) > 0)  # segment-ordered
    test_inds = sample_frame_indices(100, num_clips=8, test_mode=True)
    expected = (np.arange(8) * 12.5 + 6.25).astype(np.int64)
    np.testing.assert_array_equal(test_inds, expected)
    # short video: loops indices into range
    short = sample_frame_indices(3, num_clips=8, test_mode=True)
    assert np.all(short < 3)


def test_masking_generators():
    rng = np.random.default_rng(0)
    gen = MaskingGenerator((7, 7), num_masking_patches=10)
    m = gen(rng)
    assert m.shape == (7, 7)
    assert m.sum() == 10
    rnd = RandomMaskGenerator((7, 7), 10)
    m2 = rnd(rng)
    assert m2.sum() == 10


def test_sharded_sampler_partitions():
    s = [ShardedSampler(103, rank=r, world_size=4, seed=7, batch_size=2)
         for r in range(4)]
    idx = [x.indices(epoch=3) for x in s]
    # equal lengths, union covers dataset, deterministic
    assert len({len(i) for i in idx}) == 1
    all_idx = np.concatenate(idx)
    assert set(all_idx.tolist()) == set(range(103))
    np.testing.assert_array_equal(idx[0], s[0].indices(epoch=3))
    assert not np.array_equal(s[0].indices(0), s[0].indices(1))  # reshuffles


def test_synthetic_dataset_and_loader():
    ds = make_synthetic_retrieval_dataset(n_videos=10, num_frames=4,
                                          mlm=True, video_mask=True)
    sample = ds[0]
    assert sample["imgs"].shape == (1, 4, 64, 64, 3)
    assert sample["imgs"].dtype == np.uint8
    assert sample["token_ids"].shape == (16,)
    assert sample["v_token_mask"].shape == (7, 7)
    assert (sample["mlm_label"] != IGNORE_INDEX).any()
    # determinism
    np.testing.assert_array_equal(ds[3]["imgs"], ds[3]["imgs"])

    loader = DataLoader(ds, batch_size=4, num_workers=2, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 2  # 10 // 4 with drop_last
    b = batches[0]
    assert b["imgs"].shape == (4, 1, 4, 64, 64, 3)
    assert b["token_ids"].shape == (4, 16)
    assert b["crop_boxes"].shape == (4, 4)
    # same epoch same data
    again = list(DataLoader(ds, batch_size=4, num_workers=2, seed=0).epoch(0))
    np.testing.assert_array_equal(b["imgs"], again[0]["imgs"])


def test_pos_tagger_caption_selections():
    """The tagger's picks on sample captions must match the reference's
    scene-graph noun + verb-phrase selections (loading.py:226-288)."""
    from clover_tpu.data.pos_tagger import content_word_indices, tag_words

    words = "a man is playing a guitar on the street".split()
    picked = {words[i] for i in content_word_indices(words)}
    # nouns + verb phrase ('is playing' — AUX before VERB is in the span)
    assert picked == {"man", "guitar", "street", "is", "playing"}

    words2 = "the small dog quickly runs through the green park".split()
    picked2 = {words2[i] for i in content_word_indices(words2)}
    # adjectives are NEVER selected (reference attr list stays empty)
    assert picked2 == {"dog", "quickly", "runs", "park"}

    words3 = "two women cut vegetables in a kitchen".split()
    picked3 = {words3[i] for i in content_word_indices(words3)}
    assert picked3 == {"women", "vegetables", "kitchen", "cut"}

    tags = tag_words("she opened the wooden door".split())
    assert tags == ["PRON", "VERB", "DET", "ADJ", "NOUN"]


def test_pos_content_word_mask_selects_content(tok):
    from clover_tpu.data.text_masking import pos_content_word_mask

    rng = np.random.default_rng(5)
    enc = tok.encode("the dog runs quickly in the park", max_length=20)
    stop_ids = {int(i) for i in enc["token_ids"]
                if tok.inv_vocab.get(int(i), "") in ("the", "in")}
    for _ in range(20):
        _, label = pos_content_word_mask(enc["token_ids"], tok, rng,
                                         mlm_probability=0.5)
        pos = np.where(label != IGNORE_INDEX)[0]
        assert len(pos) >= 1
        # only noun/verb-phrase words ever masked — never 'the'/'in'
        assert all(int(label[p]) not in stop_ids for p in pos)


def test_pos_content_word_mask_whole_word_fallback(tok):
    """Captions with zero content words fall back to whole-word masking
    (documented divergence: the reference would mask nothing)."""
    from clover_tpu.data.text_masking import pos_content_word_mask

    rng = np.random.default_rng(6)
    enc = tok.encode("the the the", max_length=10)
    _, label = pos_content_word_mask(enc["token_ids"], tok, rng,
                                     mlm_probability=0.5)
    assert (label != IGNORE_INDEX).any()


def test_synthetic_backend_cross_process_deterministic():
    """Synthetic content must not depend on Python's per-process hash salt
    (the round-1 flake: abs(hash(path)) made every pytest run train on
    different videos). Pin: a subprocess with a different PYTHONHASHSEED
    produces bit-identical frames."""
    import subprocess
    import sys

    from clover_tpu.data.decode import SyntheticVideoBackend

    b = SyntheticVideoBackend(height=16, width=24, length=4)
    here = b.decode("synthetic_video_3.mp4", [0, 2])
    code = (
        "import numpy as np;"
        "from clover_tpu.data.decode import SyntheticVideoBackend;"
        "b = SyntheticVideoBackend(height=16, width=24, length=4);"
        "f = b.decode('synthetic_video_3.mp4', [0, 2]);"
        "print(int(f.sum()), f.shape)"
    )
    env = dict(os.environ, PYTHONHASHSEED="12345", JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.split()[0] == str(int(here.sum()))


def test_test_mode_expands_captions():
    ds = make_synthetic_retrieval_dataset(n_videos=5, captions_per_video=3,
                                          test_mode=True)
    assert len(ds) == 15
    s = ds[7]
    assert s["video_index"] == 7 // 3
    assert len(ds.text_video_ids) == 5


def test_mc_retrieval_dataset_train_and_test_modes(tok):
    """test_mode expands all options per video; train mode pairs each
    video with its CORRECT option (reference finetune_msrvtt_mc.py trains
    the retrieval towers on the MC split)."""
    from clover_tpu.data.datasets import MCRetrievalDataset

    records = [
        {"filename": f"v{i}.mp4",
         "options": [f"option {j} video {i}" for j in range(5)],
         "answer_idx": (i * 2) % 5}
        for i in range(3)
    ]
    common = dict(tokenizer=tok, backend="synthetic",
                  backend_kwargs={"height": 32, "width": 32},
                  num_frames=2, canonical_size=32, test_canonical_size=32,
                  max_length=12)
    test_ds = MCRetrievalDataset(records=[dict(r) for r in records], **common)
    assert len(test_ds) == 15 and list(test_ds.labels) == [0, 2, 4]
    train_ds = MCRetrievalDataset(records=[dict(r) for r in records],
                                  test_mode=False, **common)
    assert len(train_ds) == 3
    for i, rec in enumerate(train_ds.records):
        assert rec["text"] == records[i]["options"][records[i]["answer_idx"]]
    s = train_ds[1]
    assert s["token_ids"].shape == (12,)
    assert s["imgs"].shape[:2] == (1, 2)  # (n_clips, T, H, W, 3)

    # a train-mode record without answer_idx must be a hard error (silent
    # default-0 would train on a distractor caption)
    broken = [dict(r) for r in records]
    del broken[1]["answer_idx"]
    with pytest.raises(KeyError):
        MCRetrievalDataset(records=broken, test_mode=False, **common)


def test_videoqa_mc_without_question(tok):
    """LSMDC-MC: candidates are captions, no question — each option is
    encoded alone (reference loading.py:399-401 tokenizes the candidate
    list directly)."""
    from clover_tpu.data.datasets import VideoQADataset

    records = [{"filename": "v0.mp4",
                "options": ["the dog runs", "a cat jumps", "the park",
                            "a happy dog", "cat runs quickly"],
                "answer_idx": 3}]
    ds = VideoQADataset(records=records, tokenizer=tok, backend="synthetic",
                        backend_kwargs={"height": 32, "width": 32},
                        num_frames=2, canonical_size=32, max_length=10,
                        mode="mc")
    s = ds[0]
    assert s["token_ids"].shape == (5, 10) and int(s["label"]) == 3
    # option-only encode: exactly one [SEP], segment ids all zero
    row = s["token_ids"][0]
    assert int((row == tok.sep_id).sum()) == 1
    assert int(s["segment_ids"][0].max()) == 0


def test_process_pool_loader_matches_thread_loader():
    """worker_type='process' yields identical batches (fork-inherited
    dataset, deterministic per-index rng)."""
    from clover_tpu.data.datasets import make_synthetic_retrieval_dataset
    from clover_tpu.data.loader import DataLoader

    ds = make_synthetic_retrieval_dataset(n_videos=8, num_frames=2,
                                          canonical_size=32)
    t_loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                          seed=3, worker_type="thread")
    p_loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                          seed=3, worker_type="process")
    try:
        for tb, pb in zip(t_loader.epoch(1), p_loader.epoch(1)):
            assert set(tb) == set(pb)
            for k in tb:
                np.testing.assert_array_equal(tb[k], pb[k])
    finally:
        p_loader.close()


def test_s2d_collate_layout_and_roundtrip():
    """make_s2d_collate emits the embed_impl='host_s2d' layout: features
    ordered (dt, dy, dx, c), detectable by shape[-1] != 3, and exactly the
    space-to-depth of the stacked frames."""
    from clover_tpu.data.loader import default_collate, make_s2d_collate
    from clover_tpu.ops.preprocess import space_to_depth_host

    rng = np.random.default_rng(0)
    samples = [
        {"imgs": rng.integers(0, 256, (1, 4, 8, 8, 3), dtype=np.uint8),
         "index": np.int32(i)}
        for i in range(3)
    ]
    collate = make_s2d_collate(patch=(2, 4, 4))
    batch = collate(samples)
    assert batch["imgs"].shape == (3, 1, 2, 2, 2, 96)
    stacked = default_collate(samples)["imgs"]
    np.testing.assert_array_equal(batch["imgs"],
                                  space_to_depth_host(stacked, (2, 4, 4)))
    np.testing.assert_array_equal(batch["index"], np.arange(3))
    # manual order check on one patch: feature k = ((dt*ph + dy)*pw + dx)*3 + c
    v = batch["imgs"][0, 0, 0, 0, 0]
    assert v[5] == stacked[0, 0, 0, 0, 1, 2]     # dt=0, dy=0, dx=1, c=2
    assert v[48] == stacked[0, 0, 1, 0, 0, 0]    # dt=1, dy=0, dx=0, c=0
