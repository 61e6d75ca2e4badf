"""Distributed evaluation loops.

Equivalent of the reference's multi_gpu_test_* functions + evaluate
dispatch (core/hooks/my_eval_hook.py:20-401, SURVEY.md §3.4):

- run forward_test over the test loader, collecting per-entry embeddings
  (retrieval) or score vectors (QA) plus their dataset indices;
- de-duplicate sampler-padded entries by index (the reference's
  np.unique dedup, my_eval_hook.py:92-98) and re-sort;
- reduce video embeddings per video (multi-caption datasets) and compute
  the dataset's metric.

Under pjit the per-batch forward is already global on a single host's
devices; across hosts each process evaluates its own (padded,
rank-strided) shard and host results are all-gathered with
jax.experimental.multihost_utils before the index dedup, which also
removes the sampler padding (reference collect_results_gpu + np.unique,
my_eval_hook.py:78-98).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pad_rows(a: np.ndarray, max_n: int) -> np.ndarray:
    """Zero-pad the leading dim of ``a`` up to ``max_n`` rows."""
    if a.shape[0] == max_n:
        return a
    pad = np.zeros((max_n - a.shape[0],) + a.shape[1:], a.dtype)
    return np.concatenate([a, pad], axis=0)


def _strip_rank_padding(stacked: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """(world, max_n, ...) stacked padded shards -> concatenation of each
    rank's first counts[r] real rows (the reference's varied-gather unpad,
    gather_loss.py:52-59)."""
    return np.concatenate(
        [stacked[r, : int(counts[r])] for r in range(len(counts))], axis=0)


def _host_gather(*arrays):
    """Concatenate per-process eval results across hosts (ragged-safe).

    Identity in single-process runs. Multi-host: a pad+count protocol —
    processes exchange their row counts, zero-pad to the max, all-gather,
    and strip each rank's padding — so per-process result counts may
    differ (the reference's VariedShapeGatherLoss contract,
    gather_loss.py:25-70, applied to eval collection). The ShardedSampler's
    pad-to-divisible protocol makes counts equal in practice; this path no
    longer depends on that.
    """
    if jax.process_count() == 1:
        return arrays if len(arrays) > 1 else arrays[0]
    from jax.experimental import multihost_utils

    n_local = int(np.asarray(arrays[0]).shape[0])
    counts = np.asarray(
        multihost_utils.process_allgather(np.asarray(n_local)))
    max_n = int(counts.max())
    out = []
    for a in arrays:
        a = np.asarray(a)
        assert a.shape[0] == n_local, (
            f"all gathered arrays must share the leading dim "
            f"({a.shape[0]} != {n_local})")
        stacked = np.asarray(
            multihost_utils.process_allgather(_pad_rows(a, max_n)))
        out.append(_strip_rank_padding(stacked, counts))
    return out if len(out) > 1 else out[0]

from clover_tpu.evaluation.metrics import (
    itm_t2v_recall,
    l2_normalize,
    qa_accuracy,
    retrieval_recall,
    retrieval_recall_varied,
)
from clover_tpu.ops.preprocess import eval_preprocess



def _prep_batch(batch, params, bias_cache, out_size, dtype):
    """Shared per-batch prep: materialize a lazy bias cache and preprocess
    frames. host_s2d batches (loader make_s2d_collate; detected by
    imgs.shape[-1] != 3) pass through raw — normalization folds into the
    patch embed (SwinConfig.fold_normalize) and the cast happens in the
    model. Returns (imgs, bias_cache)."""
    raw = batch["imgs"]
    s2d = raw.shape[-1] != 3
    if callable(bias_cache):   # lazy builder (swin3d.bias_cache_builder)
        if s2d:
            bias_cache = bias_cache(params, tuple(raw.shape[2:5]), s2d=True)
        else:
            bias_cache = bias_cache(params, (raw.shape[2], out_size, out_size))
    if s2d:
        return jnp.asarray(raw), bias_cache
    imgs = eval_preprocess(
        jnp.asarray(raw.reshape((-1,) + raw.shape[2:])),
        out_size=out_size, dtype=dtype)
    return imgs.reshape((-1, raw.shape[1]) + imgs.shape[1:]), bias_cache


def _dedup_sort(indices: np.ndarray, *arrays):
    """Drop sampler-padding duplicates, return arrays sorted by index."""
    _, first = np.unique(indices, return_index=True)
    order = first[np.argsort(indices[first])]
    return [a[order] for a in arrays]


def run_retrieval_eval(
    eval_step: Callable,
    params,
    dataset,
    loader_iter,
    out_size: int = 224,
    dtype=jnp.float32,
    bias_cache=None,
) -> Dict[str, float]:
    """Dual-tower retrieval eval -> R@K metrics.

    ``eval_step(params, imgs, token_ids, input_mask) -> (v_emb, t_emb)``.
    ``bias_cache``: optional swin_bias_cache(params) pytree — precomputed
    relative-position biases (eval-time constants), forwarded to the step.
    """
    v_list: List[np.ndarray] = []
    t_list: List[np.ndarray] = []
    idx_list: List[np.ndarray] = []
    vid_list: List[np.ndarray] = []
    for batch in loader_iter:
        imgs, bias_cache = _prep_batch(batch, params, bias_cache,
                                       out_size, dtype)
        v, t = eval_step(params, imgs, jnp.asarray(batch["token_ids"]),
                         jnp.asarray(batch["input_mask"]), bias_cache)
        v_list.append(np.asarray(v, np.float32))
        t_list.append(np.asarray(t, np.float32))
        idx_list.append(np.asarray(batch["index"]))
        vid_list.append(np.asarray(batch["video_index"]))

    v = np.concatenate(v_list)
    t = np.concatenate(t_list)
    idx = np.concatenate(idx_list)
    vids = np.concatenate(vid_list)
    v, t, idx, vids = _host_gather(v, t, idx, vids)
    v, t, vids = _dedup_sort(idx, v, t, vids)

    captions_per_video = [len(ids) for ids in dataset.text_video_ids]
    if all(c == 1 for c in captions_per_video):
        return retrieval_recall(video_embd=v, text_embd=t)
    # varied: one video embedding per video (first entry), every caption a query
    _, first = np.unique(vids, return_index=True)
    video_embd = v[np.sort(first)]
    return retrieval_recall_varied(video_embd, t, dataset.text_video_ids)


def run_itm_retrieval_eval(
    embed_step: Callable,
    score_step: Callable,
    params,
    dataset,
    loader_iter,
    out_size: int = 224,
    dtype=jnp.float32,
    top_k: Optional[int] = None,
    pair_batch: int = 32,
    bias_cache=None,
) -> Dict[str, float]:
    """Full-fusion ITM text→video retrieval (reference non-separate test).

    Reference protocol (multimodal_transformer_pretrain.py:220-225 +
    recall_for_itm_t2v_retrieval, video_dataset.py:206-238): every
    (text, video) pair is scored by the fusion transformer's ITM head and
    texts rank videos by that score. The reference re-runs the whole model
    per pair; here backbone tokens are cached once per video (`embed_step`
    also returns the dual-tower embeddings) and only the fusion tower runs
    per pair (`score_step`) — numerically identical, O(V) backbone passes.

    ``top_k`` optionally restricts fusion scoring to each text's top-K
    tower-similarity candidates (the standard retrieve-and-rerank
    protocol); non-candidates rank below all scored pairs. None = exact
    reference behavior (score all pairs).

    ``embed_step(params, imgs, token_ids, input_mask)
        -> (visual_tokens (B,T,S,C), v_emb, t_emb)``
    ``score_step(params, visual_tokens, token_ids, input_mask) -> (B,)``
    """
    tok_list, v_list, t_list = [], [], []
    ids_list, mask_list, idx_list, vid_list = [], [], [], []
    for batch in loader_iter:
        imgs, bias_cache = _prep_batch(batch, params, bias_cache,
                                       out_size, dtype)
        tokens, v, t = embed_step(
            params, imgs, jnp.asarray(batch["token_ids"]),
            jnp.asarray(batch["input_mask"]), bias_cache)
        tok_list.append(np.asarray(tokens, np.float32))
        v_list.append(np.asarray(v, np.float32))
        t_list.append(np.asarray(t, np.float32))
        ids_list.append(np.asarray(batch["token_ids"]))
        mask_list.append(np.asarray(batch["input_mask"]))
        idx_list.append(np.asarray(batch["index"]))
        vid_list.append(np.asarray(batch["video_index"]))

    tokens = np.concatenate(tok_list)
    v = np.concatenate(v_list)
    t = np.concatenate(t_list)
    ids = np.concatenate(ids_list).reshape(len(t), -1)
    masks = np.concatenate(mask_list).reshape(len(t), -1)
    idx = np.concatenate(idx_list)
    vids = np.concatenate(vid_list)
    tokens, v, t, ids, masks, idx, vids = _host_gather(
        tokens, v, t, ids, masks, idx, vids)
    tokens, v, t, ids, masks, vids = _dedup_sort(
        idx, tokens, v, t, ids, masks, vids)

    # one backbone-token set + tower embedding per video
    _, first = np.unique(vids, return_index=True)
    first = np.sort(first)
    video_tokens = tokens[first]
    video_emb = v[first]
    n_text, n_video = len(t), len(video_tokens)
    gt_video = vids  # text i's true video index

    # candidate selection by tower similarity
    sims = l2_normalize(t.astype(np.float64)) @ l2_normalize(
        video_emb.astype(np.float64)).T
    if top_k is None or top_k >= n_video:
        cand = np.broadcast_to(np.arange(n_video), (n_text, n_video)).copy()
    else:
        cand = np.argsort(-sims, axis=1)[:, :top_k]

    # batched fusion scoring over the (text, candidate-video) pair list
    pairs_t = np.repeat(np.arange(n_text), cand.shape[1])
    pairs_v = cand.reshape(-1)
    scores = np.full((n_text, n_video), -np.inf, np.float32)
    n_pairs = len(pairs_t)
    for start in range(0, n_pairs, pair_batch):
        sel = slice(start, min(start + pair_batch, n_pairs))
        ti, vi = pairs_t[sel], pairs_v[sel]
        pad = pair_batch - len(ti)   # keep the jit shape static
        ti_p = np.concatenate([ti, np.zeros(pad, ti.dtype)])
        vi_p = np.concatenate([vi, np.zeros(pad, vi.dtype)])
        s = score_step(
            params,
            jnp.asarray(video_tokens[vi_p]),
            jnp.asarray(ids[ti_p]),
            jnp.asarray(masks[ti_p]))
        scores[ti, vi] = np.asarray(s, np.float32)[: len(ti)]
    return itm_t2v_recall(scores, gt_video)


def run_mc_retrieval_eval(
    eval_step: Callable,
    params,
    dataset,
    loader_iter,
    out_size: int = 224,
    dtype=jnp.float32,
    bias_cache=None,
) -> Dict[str, float]:
    """Multiple-choice-as-retrieval: score candidates by tower similarity."""
    from clover_tpu.evaluation.metrics import multiple_choice_retrieval_acc

    v_list, t_list, idx_list, vid_list = [], [], [], []
    for batch in loader_iter:
        imgs, bias_cache = _prep_batch(batch, params, bias_cache,
                                       out_size, dtype)
        v, t = eval_step(params, imgs, jnp.asarray(batch["token_ids"]),
                         jnp.asarray(batch["input_mask"]), bias_cache)
        v_list.append(np.asarray(v, np.float32))
        t_list.append(np.asarray(t, np.float32))
        idx_list.append(np.asarray(batch["index"]))
        vid_list.append(np.asarray(batch["video_index"]))
    v = np.concatenate(v_list)
    t = np.concatenate(t_list)
    idx = np.concatenate(idx_list)
    vids = np.concatenate(vid_list)
    v, t, idx, vids = _host_gather(v, t, idx, vids)
    v, t, vids = _dedup_sort(idx, v, t, vids)
    _, first = np.unique(vids, return_index=True)
    video_embd = v[np.sort(first)]
    return multiple_choice_retrieval_acc(video_embd, t, dataset.labels)


def run_zeroshot_action_eval(
    eval_step: Callable,
    params,
    dataset,
    loader_iter,
    class_text_embd: np.ndarray,
    out_size: int = 224,
    dtype=jnp.float32,
    bias_cache=None,
) -> Dict[str, float]:
    """Zero-shot action recognition: video embeddings vs class-name text
    embeddings (reference UCF101VideoDataset ->
    recall_for_zeroshot_action_recognition, video_dataset.py:443-513)."""
    from clover_tpu.evaluation.metrics import zeroshot_action_recognition_acc

    v_list, lbl_list, idx_list = [], [], []
    for batch in loader_iter:
        imgs, bias_cache = _prep_batch(batch, params, bias_cache,
                                       out_size, dtype)
        v, _ = eval_step(params, imgs, jnp.asarray(batch["token_ids"]),
                         jnp.asarray(batch["input_mask"]), bias_cache)
        v_list.append(np.asarray(v, np.float32))
        lbl_list.append(np.asarray(batch["label"]))
        idx_list.append(np.asarray(batch["index"]))
    v = np.concatenate(v_list)
    labels = np.concatenate(lbl_list)
    idx = np.concatenate(idx_list)
    v, labels, idx = _host_gather(v, labels, idx)
    v, labels = _dedup_sort(idx, v, labels)
    return zeroshot_action_recognition_acc(v, class_text_embd, labels)


def run_qa_eval(
    eval_step: Callable,
    params,
    dataset,
    loader_iter,
    out_size: int = 224,
    dtype=jnp.float32,
    bias_cache=None,
) -> Dict[str, float]:
    """QA eval: argmax accuracy over per-candidate scores."""
    scores: List[np.ndarray] = []
    labels: List[np.ndarray] = []
    idx_list: List[np.ndarray] = []
    for batch in loader_iter:
        imgs, bias_cache = _prep_batch(batch, params, bias_cache,
                                       out_size, dtype)
        s = eval_step(params, imgs, jnp.asarray(batch["token_ids"]),
                      jnp.asarray(batch["input_mask"]), bias_cache)
        scores.append(np.asarray(s, np.float32))
        labels.append(np.asarray(batch["label"]))
        idx_list.append(np.asarray(batch["index"]))
    s = np.concatenate(scores)
    y = np.concatenate(labels)
    idx = np.concatenate(idx_list)
    s, y, idx = _host_gather(s, y, idx)
    s, y = _dedup_sort(idx, s, y)
    return qa_accuracy(s, y)
