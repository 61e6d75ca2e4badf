"""Retrieval / QA / classification metrics as pure numpy functions.

Metric definitions match the reference exactly (semantics, not code):
- video-text retrieval recall: mmaction/core/evaluation/accuracy.py:430-464
  (L2-normalize both towers, scores = text @ video.T, rank of the diagonal;
  R@1/5/10 as percentages, MedR = median rank + 1,
  Recall@all = R@1 + R@5 + R@10 - MedR, the best-checkpoint key);
- varied (multi-caption) retrieval: accuracy.py:465-523;
- MC retrieval accuracy: accuracy.py:396-427 (minus its debug dumps);
- zero-shot action recognition: accuracy.py:526-542;
- open-ended QA accuracy: mmaction/datasets/video_dataset.py:332-343;
- top-k accuracy / mean class accuracy: accuracy.py (classification family).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def l2_normalize(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Row-normalize, mapping zero rows to themselves (reference normalize_fn)."""
    norm = np.atleast_1d(np.linalg.norm(x, ord=2, axis=axis))
    norm[norm == 0] = 1
    return x / np.expand_dims(norm, axis=axis)


def retrieval_recall(
    video_embd: Optional[np.ndarray] = None,
    text_embd: Optional[np.ndarray] = None,
    input_scores: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Text→video retrieval R@1/5/10, MedR and Recall@all.

    ``scores[i, j]`` is the similarity of text i to video j; ground truth is
    the diagonal (one caption per video, aligned order).
    """
    if input_scores is not None:
        scores = np.asarray(input_scores)
    else:
        text_norm = l2_normalize(np.asarray(text_embd, dtype=np.float64))
        video_norm = l2_normalize(np.asarray(video_embd, dtype=np.float64))
        scores = text_norm @ video_norm.T
    ranking = np.argsort(-scores, axis=1)
    gt = np.arange(len(scores))
    ind = np.where(ranking == gt[:, None])[1]
    metrics = {
        "Recall@1": float(np.sum(ind == 0)) / len(ind) * 100,
        "Recall@5": float(np.sum(ind < 5)) / len(ind) * 100,
        "Recall@10": float(np.sum(ind < 10)) / len(ind) * 100,
        "MR": float(np.median(ind) + 1),
    }
    metrics["Recall@all"] = (
        metrics["Recall@1"] + metrics["Recall@5"] + metrics["Recall@10"] - metrics["MR"]
    )
    return metrics


def retrieval_recall_varied(
    video_embd: np.ndarray,
    text_embd: np.ndarray,
    text_video_ids: Sequence[Sequence],
) -> Dict[str, float]:
    """Retrieval recall when each video has a variable number of captions.

    ``text_video_ids[i]`` lists the caption identifiers belonging to video i;
    captions appear in ``text_embd`` grouped in the same order. Every caption
    is an independent query whose ground truth is its video's index.
    """
    text_norm = l2_normalize(np.asarray(text_embd, dtype=np.float64))
    video_norm = l2_normalize(np.asarray(video_embd, dtype=np.float64))
    scores = text_norm @ video_norm.T
    ranking = np.argsort(-scores, axis=1)
    gt = np.concatenate(
        [np.full(len(captions), vid) for vid, captions in enumerate(text_video_ids)]
    )
    ind = np.where(ranking == gt[:, None])[1]
    return {
        "Recall@1": float(np.sum(ind == 0)) / len(ind) * 100,
        "Recall@5": float(np.sum(ind < 5)) / len(ind) * 100,
        "Recall@10": float(np.sum(ind < 10)) / len(ind) * 100,
        "MR": float(np.median(ind) + 1),
    }


def itm_t2v_recall(
    scores: np.ndarray,
    gt_video: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Text→video recall from fused ITM match scores.

    ``scores[t, v]`` is the ITM score of text t against video v; ground
    truth is ``gt_video[t]`` (diagonal when omitted). Same rank bookkeeping
    as the reference's recall_for_itm_t2v_retrieval
    (mmaction/datasets/video_dataset.py:206-238): per-text rank of the true
    video under descending score, R@K percentages, median rank, and
    Recall@all = R@1 + R@5 + R@10 − MR.
    """
    scores = np.asarray(scores)
    gt = (np.arange(len(scores)) if gt_video is None
          else np.asarray(gt_video).reshape(-1))
    ranking = np.argsort(-scores, axis=1)
    ind = np.where(ranking == gt[:, None])[1]
    metrics = {
        "Recall@1": float(np.sum(ind == 0)) / len(ind) * 100,
        "Recall@5": float(np.sum(ind < 5)) / len(ind) * 100,
        "Recall@10": float(np.sum(ind < 10)) / len(ind) * 100,
        "MR": float(np.median(ind) + 1),
    }
    metrics["Recall@all"] = (
        metrics["Recall@1"] + metrics["Recall@5"] + metrics["Recall@10"]
        - metrics["MR"]
    )
    return metrics


def multiple_choice_retrieval_acc(
    video_embd: np.ndarray,
    text_embd: np.ndarray,
    labels: np.ndarray,
) -> Dict[str, float]:
    """Multiple-choice accuracy via retrieval scores (MSRVTT-MC / LSMDC-MC).

    ``text_embd`` holds ``num_choices`` candidate embeddings per video,
    flattened video-major; the score of choice c for video v is
    ``video_embd[v] · text_embd[v * C + c]``.
    """
    video_embd = np.asarray(video_embd, dtype=np.float64)
    text_embd = np.asarray(text_embd, dtype=np.float64)
    n_videos = video_embd.shape[0]
    scores = video_embd @ text_embd.T  # (V, V*C)
    num_choices = scores.shape[1] // n_videos
    scores = scores.reshape(n_videos, n_videos, num_choices)
    own_choice_scores = np.diagonal(scores, axis1=0, axis2=1).T  # (V, C)
    pred = np.argmax(own_choice_scores, axis=-1)
    return {"acc": float(np.mean(pred == np.asarray(labels)))}


def zeroshot_action_recognition_acc(
    video_embd: np.ndarray,
    text_embd: np.ndarray,
    labels: np.ndarray,
) -> Dict[str, float]:
    """Zero-shot action recognition: nearest class-name embedding.

    ``labels`` are 1-indexed class ids (reference convention: UCF101
    annotation labels start at 1, accuracy.py:538 compares argmax+1).
    """
    video_norm = l2_normalize(np.asarray(video_embd, dtype=np.float64))
    text_norm = l2_normalize(np.asarray(text_embd, dtype=np.float64))
    scores = video_norm @ text_norm.T
    top1 = np.argsort(-scores, axis=1)[:, 0]
    labels = np.asarray(labels)[: len(top1)]
    return {"top-1 acc": float(np.sum(top1 + 1 == labels)) / len(top1) * 100}


def qa_accuracy(scores: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
    """Open-ended / multiple-choice QA accuracy: argmax over answer scores."""
    pred = np.argmax(np.asarray(scores), axis=-1)
    return {"acc": float(np.mean(pred == np.asarray(labels).reshape(-1)))}


def top_k_accuracy(
    scores: Sequence[np.ndarray], labels: Sequence[int], topk: Sequence[int] = (1,)
) -> List[float]:
    """Top-k accuracy over per-sample class-score vectors."""
    res = []
    labels = np.asarray(labels)[:, np.newaxis]
    scores = np.asarray(scores)
    for k in topk:
        max_k_preds = np.argsort(scores, axis=1)[:, -k:][:, ::-1]
        match = np.logical_or.reduce(max_k_preds == labels, axis=1)
        res.append(float(match.sum()) / match.shape[0])
    return res


def mean_average_precision(scores: np.ndarray, labels: np.ndarray) -> float:
    """Multi-label mAP: mean over classes of average precision
    (reference accuracy.py classification family).

    scores (N, C) real-valued; labels (N, C) binary ground truth.
    Classes with no positives are skipped.
    """
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    aps = []
    for c in range(scores.shape[1]):
        gt = labels[:, c]
        if gt.sum() == 0:
            continue
        order = np.argsort(-scores[:, c])
        gt_sorted = gt[order]
        cum_pos = np.cumsum(gt_sorted)
        precision = cum_pos / (np.arange(len(gt_sorted)) + 1)
        aps.append(float(np.sum(precision * gt_sorted) / gt.sum()))
    return float(np.mean(aps)) if aps else float("nan")


def precision_recall_at_threshold(
    scores: np.ndarray, labels: np.ndarray, threshold: float = 0.5
) -> Dict[str, float]:
    """Micro precision/recall of multi-label predictions at a score cut."""
    pred = np.asarray(scores) >= threshold
    labels = np.asarray(labels).astype(bool)
    tp = np.logical_and(pred, labels).sum()
    return {
        "precision": float(tp / max(pred.sum(), 1)),
        "recall": float(tp / max(labels.sum(), 1)),
    }


def mean_class_accuracy(scores: Sequence[np.ndarray], labels: Sequence[int]) -> float:
    """Mean of per-class recalls."""
    pred = np.argmax(np.asarray(scores), axis=1)
    labels = np.asarray(labels)
    accs = []
    for cls in np.unique(labels):
        mask = labels == cls
        accs.append(np.mean(pred[mask] == cls))
    return float(np.mean(accs))
