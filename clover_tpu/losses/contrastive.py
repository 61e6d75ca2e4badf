"""Contrastive losses: in-batch InfoNCE and Clover's exclusive-NCE + ranking.

Pure fp32 functions over the *global* batch. Under pjit/GSPMD data
parallelism the batch axis is sharded and XLA inserts the collectives for
the B x B similarity matrices — the gradient routing is exactly the
reference's differentiable all-gather (GatherLoss: all_gather forward,
slice-local-shard backward, mmaction/models/utils/gather_loss.py:5-23),
because that is what autodiff of a globally-computed loss does. For
shard_map-style explicit parallelism use
clover_tpu.parallel.all_gather_with_grad first.

Reference semantics: mmaction/models/losses/contrastive_loss.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def cos_norm(a: Optional[jax.Array], eps: float = 1e-8) -> Optional[jax.Array]:
    """Row L2-normalization with the reference's max(norm, eps) guard
    (contrastive_loss.py:20-25)."""
    if a is None:
        return None
    norm = jnp.linalg.norm(a, axis=-1, keepdims=True)
    return a / jnp.maximum(norm, eps)


def sim_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    return cos_norm(a, eps) @ cos_norm(b, eps).T


def _diag_logsoftmax_mean(x: jax.Array) -> jax.Array:
    return jnp.mean(jnp.diag(jax.nn.log_softmax(x, axis=1)))


def norm_softmax_loss(
    video_embd: Optional[jax.Array] = None,
    text_embd: Optional[jax.Array] = None,
    sim_mat: Optional[jax.Array] = None,
    temperature: float = 0.07,
    cos_sim: bool = False,
) -> jax.Array:
    """Symmetric in-batch InfoNCE (reference NormSoftmaxLoss, :28-68)."""
    if sim_mat is None:
        video_embd = video_embd.astype(jnp.float32)
        text_embd = text_embd.astype(jnp.float32)
        if cos_sim:
            x = sim_matrix(video_embd, text_embd) / temperature
        else:
            # F.normalize semantics (eps clamp at 1e-12)
            v = video_embd / jnp.maximum(
                jnp.linalg.norm(video_embd, axis=-1, keepdims=True), 1e-12)
            t = text_embd / jnp.maximum(
                jnp.linalg.norm(text_embd, axis=-1, keepdims=True), 1e-12)
            x = (v @ t.T) / temperature
    else:
        x = sim_mat.astype(jnp.float32)
    return -_diag_logsoftmax_mean(x) - _diag_logsoftmax_mean(x.T)


def norm_softmax_loss_sharded(
    v_local: jax.Array,
    t_local: jax.Array,
    axis_name: str,
    temperature: float = 0.07,
) -> jax.Array:
    """NormSoftmaxLoss inside shard_map: local-query rows vs gathered keys.

    Decomposes the global symmetric InfoNCE into per-device contributions
    (each device scores only its own B_local queries against all B keys) and
    psums. Unlike gather-then-full-loss, parameter gradients under
    shard_map's replicated-input transpose (an automatic psum over the mesh
    axis) come out exactly equal to the single-device global loss — and each
    device does B_local x B work instead of B x B.
    """
    vl = cos_norm(v_local.astype(jnp.float32))
    tl = cos_norm(t_local.astype(jnp.float32))
    v_all = jax.lax.all_gather(vl, axis_name, axis=0, tiled=True)
    t_all = jax.lax.all_gather(tl, axis_name, axis=0, tiled=True)
    n_local = vl.shape[0]
    B = v_all.shape[0]
    gidx = jax.lax.axis_index(axis_name) * n_local + jnp.arange(n_local)

    rows_v2t = jax.nn.log_softmax(vl @ t_all.T / temperature, axis=1)
    rows_t2v = jax.nn.log_softmax(tl @ v_all.T / temperature, axis=1)
    diag_v2t = jnp.take_along_axis(rows_v2t, gidx[:, None], axis=1)[:, 0]
    diag_t2v = jnp.take_along_axis(rows_t2v, gidx[:, None], axis=1)[:, 0]
    local = -(jnp.sum(diag_v2t) + jnp.sum(diag_t2v))
    return jax.lax.psum(local, axis_name) / B


def norm_softmax_loss_sharded_varied(
    v_local: jax.Array,
    t_local: jax.Array,
    n_valid: jax.Array,
    axis_name: str,
    temperature: float = 0.07,
) -> jax.Array:
    """NormSoftmaxLoss inside shard_map with per-device *ragged* batches.

    The reference's VariedShapeGatherLoss path (gather_loss.py:25-70 feeding
    NormSoftmaxLoss): per-rank batch sizes may differ. Local shards arrive
    padded to a common static ``max_n`` with ``n_valid`` real rows; padded
    keys are masked out of every softmax and padded queries contribute
    nothing. Equal to the single-device loss over the concatenated valid
    rows (pinned by tests/test_multihost_gather.py).
    """
    from clover_tpu.parallel.collectives import all_gather_varied

    vl = cos_norm(v_local.astype(jnp.float32))
    tl = cos_norm(t_local.astype(jnp.float32))
    v_all, key_mask = all_gather_varied(vl, n_valid, axis_name)
    t_all, _ = all_gather_varied(tl, n_valid, axis_name)
    max_n = vl.shape[0]
    local_valid = jnp.arange(max_n) < n_valid
    gidx = jax.lax.axis_index(axis_name) * max_n + jnp.arange(max_n)
    # psum, not sum(key_mask): psum output is statically known to be
    # replicated (all_gather's is not tracked as such by shard_map's vma
    # check), so the loss value can carry an out_spec of P()
    n_total = jax.lax.psum(jnp.asarray(n_valid, jnp.float32), axis_name)

    def masked_diag_sum(queries, keys):
        logits = queries @ keys.T / temperature
        logits = jnp.where(key_mask[None, :], logits, -1e9)
        rows = jax.nn.log_softmax(logits, axis=1)
        diag = jnp.take_along_axis(rows, gidx[:, None], axis=1)[:, 0]
        return jnp.sum(jnp.where(local_valid, diag, 0.0))

    local = -(masked_diag_sum(vl, t_all) + masked_diag_sum(tl, v_all))
    return jax.lax.psum(local, axis_name) / n_total


def margin_ranking_loss(x1: jax.Array, x2: jax.Array, margin: float) -> jax.Array:
    """mean(max(0, margin - (x1 - x2))) — torch MarginRankingLoss with y=1."""
    return jnp.mean(jnp.maximum(0.0, margin - (x1 - x2)))


def _suppress_diag(sim: jax.Array) -> jax.Array:
    """Set the diagonal to -10000 (reference diag_embed trick, :130-132)."""
    eye = jnp.eye(sim.shape[0], dtype=bool)
    return jnp.where(eye, -10000.0, sim)


def exclusive_nce_with_ranking(
    video_embd: jax.Array,
    text_embd: jax.Array,
    text_mask_embd: Optional[jax.Array] = None,
    text_recon_embd: Optional[jax.Array] = None,
    temperature: float = 0.05,
    use_rank: bool = True,
    use_rank_ttm: bool = True,
    margin_ttm: float = 5.0,
) -> Dict[str, jax.Array]:
    """Clover's tri-modal exclusive-NCE with margin ranking.

    Positives for video i are {T_i, T_mask_i, T_recon_i}. For each positive
    block, the *other two blocks'* diagonals are suppressed from the negative
    pool (exclusive-NCE, reference :127-141); t2v treats all 3B texts as
    queries over B videos (:144-150); the ranking term forces
    sim(V,T) > sim(V,T_mask) + margin (:154-159).

    Returns {'nce_loss', 'rank_t_tm_loss'?} exactly like the reference.
    """
    v = cos_norm(video_embd.astype(jnp.float32))
    t = cos_norm(text_embd.astype(jnp.float32))
    tm = cos_norm(None if text_mask_embd is None else text_mask_embd.astype(jnp.float32))
    tr = cos_norm(None if text_recon_embd is None else text_recon_embd.astype(jnp.float32))

    sim_vt = (v @ t.T) / temperature
    sim_vtm = (v @ tm.T) / temperature
    sim_vtr = (v @ tr.T) / temperature

    vt_diag = jnp.diag(sim_vt)
    vtm_diag = jnp.diag(sim_vtm)

    B = sim_vt.shape[0]
    v2t_forvt = jnp.concatenate(
        [sim_vt, _suppress_diag(sim_vtm), _suppress_diag(sim_vtr)], axis=1)
    v2t_forvtm = jnp.concatenate(
        [_suppress_diag(sim_vt), sim_vtm, _suppress_diag(sim_vtr)], axis=1)
    v2t_forvtr = jnp.concatenate(
        [_suppress_diag(sim_vt), _suppress_diag(sim_vtm), sim_vtr], axis=1)

    vt_logsm = jax.nn.log_softmax(v2t_forvt, axis=1)[:, :B]
    vtm_logsm = jax.nn.log_softmax(v2t_forvtm, axis=1)[:, B : 2 * B]
    vtr_logsm = jax.nn.log_softmax(v2t_forvtr, axis=1)[:, 2 * B : 3 * B]
    loss_v = -jnp.mean(jnp.diag(vt_logsm) + jnp.diag(vtm_logsm) + jnp.diag(vtr_logsm))

    t2v = jnp.concatenate([sim_vt, sim_vtm, sim_vtr], axis=1).T  # (3B, B)
    t2v_logsm = jax.nn.log_softmax(t2v, axis=1).reshape(3, B, B)
    t2v_diag = jnp.diagonal(t2v_logsm, axis1=1, axis2=2)  # (3, B)
    loss_t = -jnp.mean(jnp.mean(t2v_diag, axis=1))

    losses = {"nce_loss": loss_v + loss_t}
    if use_rank and use_rank_ttm:
        losses["rank_t_tm_loss"] = margin_ranking_loss(vt_diag, vtm_diag, margin_ttm)
    return losses
