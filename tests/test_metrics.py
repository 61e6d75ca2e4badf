import numpy as np
import pytest

from clover_tpu.evaluation import (
    l2_normalize,
    mean_class_accuracy,
    multiple_choice_retrieval_acc,
    qa_accuracy,
    retrieval_recall,
    retrieval_recall_varied,
    top_k_accuracy,
    zeroshot_action_recognition_acc,
)


def test_retrieval_recall_perfect():
    emb = np.eye(16)
    m = retrieval_recall(video_embd=emb, text_embd=emb)
    assert m["Recall@1"] == 100.0
    assert m["Recall@5"] == 100.0
    assert m["Recall@10"] == 100.0
    assert m["MR"] == 1.0
    assert m["Recall@all"] == 299.0


def test_retrieval_recall_known_ranks():
    # text i matches video (i+1) % 4 except text 0 which matches video 0.
    # Build scores directly so ranks are deterministic.
    scores = np.array(
        [
            [3.0, 2.0, 1.0, 0.0],  # gt 0 at rank 0
            [0.0, 1.0, 3.0, 2.0],  # gt 1 at rank 2
            [0.0, 3.0, 2.0, 1.0],  # gt 2 at rank 1
            [3.0, 2.0, 1.0, 0.0],  # gt 3 at rank 3
        ]
    )
    m = retrieval_recall(input_scores=scores)
    assert m["Recall@1"] == pytest.approx(25.0)
    assert m["Recall@5"] == pytest.approx(100.0)
    assert m["MR"] == pytest.approx(np.median([0, 2, 1, 3]) + 1)
    assert m["Recall@all"] == pytest.approx(
        m["Recall@1"] + m["Recall@5"] + m["Recall@10"] - m["MR"]
    )


def test_retrieval_recall_normalization_invariance(rng):
    v = rng.normal(size=(32, 8))
    t = v + 0.01 * rng.normal(size=(32, 8))
    m1 = retrieval_recall(video_embd=v, text_embd=t)
    m2 = retrieval_recall(video_embd=v * 7.5, text_embd=t * 0.3)
    assert m1 == m2


def test_retrieval_recall_varied():
    videos = np.eye(4)
    # video 0 has 2 captions, others 1
    texts = np.stack([videos[0], videos[0], videos[1], videos[2], videos[3]])
    tid = [["a", "b"], ["c"], ["d"], ["e"]]
    m = retrieval_recall_varied(videos, texts, tid)
    assert m["Recall@1"] == 100.0


def test_multiple_choice_retrieval():
    videos = np.eye(3)
    # 2 choices per video; correct answer is choice index [1, 0, 1]
    texts = np.stack(
        [np.zeros(3), videos[0], videos[1], np.zeros(3), np.zeros(3), videos[2]]
    )
    m = multiple_choice_retrieval_acc(videos, texts, labels=np.array([1, 0, 1]))
    assert m["acc"] == 1.0
    m = multiple_choice_retrieval_acc(videos, texts, labels=np.array([0, 0, 1]))
    assert m["acc"] == pytest.approx(2 / 3)


def test_zeroshot_action_recognition():
    classes = np.eye(5)
    videos = classes[[0, 3, 2]]
    labels = np.array([1, 4, 3])  # 1-indexed
    m = zeroshot_action_recognition_acc(videos, classes, labels)
    assert m["top-1 acc"] == 100.0


def test_qa_accuracy():
    scores = np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    assert qa_accuracy(scores, np.array([1, 0, 0]))["acc"] == pytest.approx(2 / 3)


def test_top_k_and_mean_class():
    scores = np.array([[0.9, 0.1, 0.0], [0.1, 0.8, 0.1], [0.5, 0.4, 0.1]])
    labels = [0, 1, 2]
    top1, top2 = top_k_accuracy(scores, labels, topk=(1, 2))
    assert top1 == pytest.approx(2 / 3)
    assert top2 == pytest.approx(2 / 3)
    assert mean_class_accuracy(scores, labels) == pytest.approx(2 / 3)


def test_l2_normalize_zero_rows():
    x = np.zeros((2, 3))
    x[1] = [3.0, 4.0, 0.0]
    out = l2_normalize(x)
    assert np.all(out[0] == 0)
    assert np.linalg.norm(out[1]) == pytest.approx(1.0)
