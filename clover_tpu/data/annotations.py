"""Annotation builders: public dataset releases -> clover_tpu jsonl records.

The reference consumes pre-built ``.pkl`` annotation lists whose schema is
only visible from its loaders (``mmaction/datasets/video_dataset.py``:
MsrvttVideoDataset:107-140 expects {filename, text}, VideoQADataset:276-303
expects {vid_name, q, answers, answer_idx, ...}); the pkl files themselves
were distributed out-of-band. These builders produce the same information
straight from each dataset's *public* annotation release, normalized to the
record schema of :mod:`clover_tpu.data.datasets`:

- retrieval:  ``{"filename", "text": str | list[str]}``
- open-ended QA: ``{"filename", "question", "answer"}``
- multiple-choice QA: ``{"filename", "question", "options", "answer_idx"}``
- MC-as-retrieval: ``{"filename", "options", "answer_idx"}``

Everything is pure-python (csv/json/tsv parsing); the CLI lives in
``tools/build_annotations.py``. Writers emit jsonl (one record per line),
which ``load_annotations`` already reads.
"""

from __future__ import annotations

import csv
import json
import os
from collections import Counter, OrderedDict
from typing import Any, Dict, Iterable, List, Optional, Sequence


Record = Dict[str, Any]


def write_jsonl(records: Iterable[Record], out_path: str) -> int:
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for rec in records:
            f.write(json.dumps(rec, ensure_ascii=False) + "\n")
            n += 1
    return n


def _read_csv(path: str, delimiter: Optional[str] = None) -> List[Dict[str, str]]:
    with open(path, encoding="utf-8") as f:
        sample = f.read(4096)
        f.seek(0)
        if delimiter is None:
            delimiter = "\t" if "\t" in sample.split("\n")[0] else ","
        return list(csv.DictReader(f, delimiter=delimiter))


# --------------------------------------------------------------------- MSRVTT
def build_msrvtt_retrieval(
    data_json: str,
    split_csv: Optional[str] = None,
    split: str = "train",
    ext: str = ".mp4",
) -> List[Record]:
    """MSRVTT retrieval from the public ``MSRVTT_data.json`` release.

    ``MSRVTT_data.json`` carries ``videos`` (video_id, split) and
    ``sentences`` (video_id, caption). ``split_csv`` optionally restricts to
    an explicit id list (e.g. ``MSRVTT_train.9k.csv`` for the 9k train split
    or ``MSRVTT_JSFUSION_test.csv`` for 1k-A, both with a ``video_id``
    column). For 1k-A test the JSFUSION csv also pins ONE caption per video
    (column ``sentence``), which we honor — that is the standard protocol.
    """
    with open(data_json, encoding="utf-8") as f:
        data = json.load(f)

    if split_csv is not None:
        rows = _read_csv(split_csv)
        id_set = [r["video_id"] for r in rows]
        pinned = {
            r["video_id"]: r["sentence"] for r in rows if r.get("sentence")
        }
        if pinned and len(pinned) == len(id_set):
            return [
                {"filename": vid + ext, "text": pinned[vid]} for vid in id_set
            ]
        id_filter = set(id_set)
    else:
        id_filter = {
            v["video_id"] for v in data.get("videos", [])
            if v.get("split", split).startswith(split)
        }

    caps: "OrderedDict[str, List[str]]" = OrderedDict()
    for sent in data["sentences"]:
        vid = sent["video_id"]
        if vid in id_filter:
            caps.setdefault(vid, []).append(sent["caption"])
    return [
        {"filename": vid + ext, "text": texts if len(texts) > 1 else texts[0]}
        for vid, texts in caps.items()
    ]


def build_msrvtt_mc(mc_csv: str, ext: str = ".mp4") -> List[Record]:
    """MSRVTT-MC (JSFUSION multiple-choice) from ``mc_test.csv``.

    Columns: ``vid_key``/``video_id``, candidate captions ``a1..a5``, and the
    1-based ``answer`` index (some releases ship 0-based ``answer``; detected
    from the value range).
    """
    rows = _read_csv(mc_csv)
    opt_keys = [k for k in rows[0] if k.lower() in
                ("a1", "a2", "a3", "a4", "a5", "option1", "option2",
                 "option3", "option4", "option5")]
    opt_keys.sort()
    answers = [int(r["answer"]) for r in rows]
    base = 1 if min(answers) == 1 else 0
    records = []
    for r, ans in zip(rows, answers):
        vid = r.get("video_id") or r.get("vid_key")
        records.append({
            "filename": vid + ext,
            "options": [r[k] for k in opt_keys],
            "answer_idx": ans - base,
        })
    return records


# ----------------------------------------------------------------------- MSVD
def build_msvd_retrieval(
    captions_txt: str,
    split_list: Optional[str] = None,
    name_map: Optional[str] = None,
    ext: str = ".avi",
) -> List[Record]:
    """MSVD retrieval from the public caption dump.

    ``captions_txt`` lines are ``<video_id> <caption>`` (the widely-used
    ``AllVideoDescriptions.txt`` / ``sents_*.txt`` format; a header block of
    lines without spaces is skipped). ``split_list`` is one id per line
    (train/val/test lists). ``name_map`` optionally maps youtube clip ids to
    ``vid%d`` style names (``<youtube_id> <alias>`` per line).
    """
    alias = {}
    if name_map:
        with open(name_map, encoding="utf-8") as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    alias[parts[0]] = parts[1]
    keep = None
    if split_list:
        with open(split_list, encoding="utf-8") as f:
            keep = {line.strip() for line in f if line.strip()}
    caps: "OrderedDict[str, List[str]]" = OrderedDict()
    with open(captions_txt, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or " " not in line:
                continue
            vid, caption = line.split(" ", 1)
            vid = alias.get(vid, vid)
            if keep is not None and vid not in keep:
                continue
            caps.setdefault(vid, []).append(caption.strip())
    return [
        {"filename": vid + ext, "text": texts if len(texts) > 1 else texts[0]}
        for vid, texts in caps.items()
    ]


# --------------------------------------------------------------------- DiDeMo
def build_didemo_retrieval(split_json: str, ext: str = ".mp4") -> List[Record]:
    """DiDeMo paragraph retrieval from the public LocalizingMoments jsons.

    ``train_data.json``/``val_data.json``/``test_data.json`` are lists of
    {``description``, ``video``, ...} with multiple moment descriptions per
    video. Paragraph-retrieval protocol concatenates a video's descriptions
    in annotation order (reference handles this with the tokenizer's
    ``temporal_cat`` flag, loading.py:404-410; here the record keeps the
    caption list and the dataset's ``paragraph=True`` joins them).
    """
    with open(split_json, encoding="utf-8") as f:
        items = json.load(f)
    caps: "OrderedDict[str, List[str]]" = OrderedDict()
    for item in items:
        vid = os.path.splitext(str(item["video"]))[0]
        caps.setdefault(vid, []).append(item["description"].strip())
    return [{"filename": vid + ext, "text": texts} for vid, texts in caps.items()]


# ---------------------------------------------------------------------- LSMDC
_LSMDC_COLS = ("clip_id", "start_aligned", "end_aligned", "start", "end",
               "sentence")


def build_lsmdc_retrieval(annos_csv: str, ext: str = ".avi") -> List[Record]:
    """LSMDC retrieval from ``LSMDC16_annos_*.csv`` (headerless TSV:
    clip_id, aligned/extracted timestamps, sentence — 6 columns)."""
    records = []
    with open(annos_csv, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                continue
            clip_id, sentence = parts[0], parts[-1].strip()
            if not sentence:
                continue
            records.append({"filename": clip_id + ext, "text": sentence})
    return records


def build_lsmdc_mc(mc_csv: str, ext: str = ".avi") -> List[Record]:
    """LSMDC multiple-choice from the MC test TSV: clip_id, [timestamps,]
    correct sentence followed by 4 distractors (the correct answer is always
    column -5 == index 0 of options in the public release)."""
    records = []
    with open(mc_csv, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 6:
                continue
            clip_id = parts[0]
            options = [p.strip() for p in parts[-5:]]
            records.append({
                "filename": clip_id + ext,
                "options": options,
                "answer_idx": 0,
            })
    return records


def build_lsmdc_fib(fib_csv: str, ext: str = ".avi") -> List[Record]:
    """LSMDC fill-in-the-blank: headerless TSV ``clip_id \\t sentence-with-
    _____ \\t answer-word [\\t key]``. The blank marker becomes the QA
    question; answers feed the OE vocab."""
    records = []
    with open(fib_csv, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 3:
                continue
            clip_id, sentence, answer = parts[0], parts[1], parts[2]
            records.append({
                "filename": clip_id + ext,
                "question": sentence.strip(),
                "answer": answer.strip().lower(),
            })
    return records


# ----------------------------------------------------------------- TGIF / QA
def build_tgif_qa(
    question_csv: str,
    task: str = "action",
) -> List[Record]:
    """TGIF-QA from the public TSVs (``Train_action_question.csv`` etc.).

    action/transition: columns gif_name, question, a1..a5, answer (index).
    frameqa: columns gif_name, question, answer (free-form word).
    """
    rows = _read_csv(question_csv, delimiter="\t")
    records: List[Record] = []
    if task in ("action", "transition"):
        for r in rows:
            options = [r[k] for k in ("a1", "a2", "a3", "a4", "a5") if k in r]
            records.append({
                "filename": r["gif_name"] + ".gif",
                "question": r["question"],
                "options": options,
                "answer_idx": int(r["answer"]),
            })
    elif task == "frameqa":
        for r in rows:
            records.append({
                "filename": r["gif_name"] + ".gif",
                "question": r["question"],
                "answer": str(r["answer"]).strip().lower(),
            })
    else:
        raise ValueError(f"unknown TGIF task {task!r}")
    return records


def build_videoqa_json(
    qa_json: str,
    id_to_name: Optional[str] = None,
    prefix: str = "video",
    ext: str = ".mp4",
) -> List[Record]:
    """MSRVTT-QA / MSVD-QA from the xudejing/video-question-answering jsons.

    ``train_qa.json`` is a list of {question, answer, video_id}. MSRVTT names
    its files ``video<id>.mp4``; MSVD needs ``id_to_name`` (``youtube_mapping
    .txt``: "<youtube_id> vid<1-based-id>" per line) to map numeric ids back
    to clip filenames.
    """
    with open(qa_json, encoding="utf-8") as f:
        items = json.load(f)
    mapping = {}
    if id_to_name:
        with open(id_to_name, encoding="utf-8") as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    # "vid42" -> numeric id 42 maps to youtube clip name
                    num = parts[1].replace("vid", "")
                    if num.isdigit():
                        mapping[int(num)] = parts[0]
    records = []
    for item in items:
        vid = int(item["video_id"])
        name = mapping.get(vid, f"{prefix}{vid}")
        records.append({
            "filename": name + ext,
            "question": item["question"],
            "answer": str(item["answer"]).strip().lower(),
        })
    return records


# ----------------------------------------------------------- answer vocab
def build_answer_vocab(
    records: Sequence[Record],
    vocab_size: int = 1000,
) -> Dict[str, int]:
    """Top-K most frequent train answers -> contiguous label ids.

    Mirrors the protocol behind the reference's fixed-size OE heads
    (QA_OE_Head num_labels=1000 for MSVD-QA:
    configs/exp_local/finetune_msvdQA.py:56-61); out-of-vocab answers map to
    label 0 at dataset time (datasets.py VideoQADataset).
    """
    counts = Counter(
        str(rec["answer"]).strip().lower()
        for rec in records if rec.get("answer") is not None
    )
    vocab = {}
    for ans, _ in counts.most_common(vocab_size):
        vocab[ans] = len(vocab)
    return vocab


def save_answer_vocab(vocab: Dict[str, int], out_path: str) -> None:
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False, indent=0)


def load_answer_vocab(path: str) -> Dict[str, int]:
    with open(path, encoding="utf-8") as f:
        return {str(k): int(v) for k, v in json.load(f).items()}
