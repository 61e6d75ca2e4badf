"""Annotation builders: public formats -> jsonl records -> datasets."""

import json
import subprocess
import sys

import numpy as np
import pytest

from clover_tpu.data import annotations as A
from clover_tpu.data.datasets import load_annotations


def test_msrvtt_retrieval_train_split(tmp_path):
    data = {
        "videos": [
            {"video_id": "video0", "split": "train"},
            {"video_id": "video1", "split": "train"},
            {"video_id": "video2", "split": "test"},
        ],
        "sentences": [
            {"video_id": "video0", "caption": "a dog runs"},
            {"video_id": "video0", "caption": "the dog is running"},
            {"video_id": "video1", "caption": "a cat sits"},
            {"video_id": "video2", "caption": "test caption"},
        ],
    }
    dj = tmp_path / "MSRVTT_data.json"
    dj.write_text(json.dumps(data))
    recs = A.build_msrvtt_retrieval(str(dj), split="train")
    assert len(recs) == 2
    assert recs[0] == {"filename": "video0.mp4",
                       "text": ["a dog runs", "the dog is running"]}
    assert recs[1]["text"] == "a cat sits"


def test_msrvtt_retrieval_jsfusion_pinned_caption(tmp_path):
    data = {"videos": [], "sentences": [
        {"video_id": "video2", "caption": "ignored"},
    ]}
    dj = tmp_path / "d.json"
    dj.write_text(json.dumps(data))
    csv_f = tmp_path / "MSRVTT_JSFUSION_test.csv"
    csv_f.write_text("key,vid_key,video_id,sentence\n"
                     "k1,v2,video2,a pinned caption\n")
    recs = A.build_msrvtt_retrieval(str(dj), str(csv_f))
    assert recs == [{"filename": "video2.mp4", "text": "a pinned caption"}]


def test_msrvtt_mc(tmp_path):
    f = tmp_path / "mc_test.csv"
    f.write_text("video_id,a1,a2,a3,a4,a5,answer\n"
                 "video1,w1,w2,w3,w4,w5,3\n"
                 "video2,x1,x2,x3,x4,x5,1\n")
    recs = A.build_msrvtt_mc(str(f))
    # min answer is 1 -> treated as 1-based
    assert recs[0]["answer_idx"] == 2
    assert recs[1]["answer_idx"] == 0
    assert recs[0]["options"] == ["w1", "w2", "w3", "w4", "w5"]


def test_msvd_retrieval_with_split_and_alias(tmp_path):
    caps = tmp_path / "AllVideoDescriptions.txt"
    caps.write_text(
        "#header\n"
        "ytid_1 a man plays guitar\n"
        "ytid_1 someone strums a guitar\n"
        "ytid_2 a cat jumps\n")
    name_map = tmp_path / "youtube_mapping.txt"
    name_map.write_text("ytid_1 vid1\nytid_2 vid2\n")
    split = tmp_path / "train_list.txt"
    split.write_text("vid1\n")
    recs = A.build_msvd_retrieval(str(caps), str(split), str(name_map))
    assert len(recs) == 1
    assert recs[0]["filename"] == "vid1.avi"
    assert len(recs[0]["text"]) == 2


def test_didemo_paragraph_grouping(tmp_path):
    items = [
        {"video": "abc.mov", "description": "First moment."},
        {"video": "abc.mov", "description": "Second moment."},
        {"video": "xyz", "description": "Only moment."},
    ]
    f = tmp_path / "train_data.json"
    f.write_text(json.dumps(items))
    recs = A.build_didemo_retrieval(str(f))
    assert recs[0] == {"filename": "abc.mp4",
                       "text": ["First moment.", "Second moment."]}
    assert recs[1]["text"] == ["Only moment."]


def test_lsmdc_retrieval_and_mc_and_fib(tmp_path):
    annos = tmp_path / "LSMDC16_annos_training.csv"
    annos.write_text("clip_0001\t1.0\t2.0\t1.1\t2.1\tSomeone walks away.\n"
                     "clip_0002\t3.0\t4.0\t3.1\t4.1\tA door closes.\n")
    recs = A.build_lsmdc_retrieval(str(annos))
    assert recs[0] == {"filename": "clip_0001.avi",
                       "text": "Someone walks away."}

    mc = tmp_path / "mc_test.csv"
    mc.write_text("clip_1\t0\t1\tcorrect one\td1\td2\td3\td4\n")
    mrecs = A.build_lsmdc_mc(str(mc))
    assert mrecs[0]["options"][0] == "correct one"
    assert mrecs[0]["answer_idx"] == 0

    fib = tmp_path / "fib.csv"
    fib.write_text("clip_9\tSomeone opens the _____ slowly.\tDoor\n")
    frecs = A.build_lsmdc_fib(str(fib))
    assert frecs[0]["question"] == "Someone opens the _____ slowly."
    assert frecs[0]["answer"] == "door"


def test_tgif_action_and_frameqa(tmp_path):
    act = tmp_path / "Train_action_question.csv"
    act.write_text("gif_name\tquestion\ta1\ta2\ta3\ta4\ta5\tanswer\n"
                   "g1\twhat does the man do\trun\tjump\tsit\teat\twave\t1\n")
    recs = A.build_tgif_qa(str(act), "action")
    assert recs[0]["filename"] == "g1.gif"
    assert recs[0]["options"] == ["run", "jump", "sit", "eat", "wave"]
    assert recs[0]["answer_idx"] == 1

    fqa = tmp_path / "Train_frameqa_question.csv"
    fqa.write_text("gif_name\tquestion\tanswer\n"
                   "g2\twhat color is the cat\tBlack\n")
    recs = A.build_tgif_qa(str(fqa), "frameqa")
    assert recs[0]["answer"] == "black"


def test_videoqa_json_with_mapping(tmp_path):
    qa = tmp_path / "train_qa.json"
    qa.write_text(json.dumps([
        {"question": "who runs", "answer": "Dog", "video_id": 3},
        {"question": "who sits", "answer": "cat", "video_id": 7},
    ]))
    mapping = tmp_path / "youtube_mapping.txt"
    mapping.write_text("yt_aaa vid3\n")
    recs = A.build_videoqa_json(str(qa), str(mapping), ext=".avi")
    assert recs[0]["filename"] == "yt_aaa.avi"
    assert recs[0]["answer"] == "dog"
    assert recs[1]["filename"] == "video7.avi"   # falls back to prefix+id


def test_answer_vocab_topk_and_roundtrip(tmp_path):
    recs = ([{"answer": "dog"}] * 5 + [{"answer": "cat"}] * 3
            + [{"answer": "bird"}] * 1)
    vocab = A.build_answer_vocab(recs, vocab_size=2)
    assert vocab == {"dog": 0, "cat": 1}
    out = tmp_path / "vocab.json"
    A.save_answer_vocab(vocab, str(out))
    assert A.load_answer_vocab(str(out)) == vocab


def test_jsonl_roundtrip_into_dataset_loader(tmp_path):
    recs = [{"filename": "a.mp4", "text": "hello world"},
            {"filename": "b.mp4", "text": ["one", "two"]}]
    out = tmp_path / "anns.jsonl"
    A.write_jsonl(recs, str(out))
    loaded = load_annotations(str(out))
    assert loaded == recs


def test_cli_smoke(tmp_path):
    annos = tmp_path / "l.csv"
    annos.write_text("c1\t0\t1\t0\t1\tSomeone waves.\n")
    out = tmp_path / "out.jsonl"
    r = subprocess.run(
        [sys.executable, "tools/build_annotations.py", "lsmdc",
         "--annos-csv", str(annos), "--out", str(out)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert "wrote 1 records" in r.stdout
    assert load_annotations(str(out))[0]["text"] == "Someone waves."
