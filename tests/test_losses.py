"""Loss-function golden tests.

Expected values are computed with independent numpy implementations that
follow the mathematical definitions (per-element loops where feasible), not
the vectorized code paths under test.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from clover_tpu.losses import (
    bce_with_logits,
    cross_entropy,
    exclusive_nce_with_ranking,
    label_smoothing_cross_entropy,
    margin_ranking_loss,
    masked_lm_focal_loss,
    norm_softmax_loss,
    softmax_focal_multiclass,
)


def np_log_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=axis, keepdims=True))


def test_cross_entropy_matches_manual():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(5, 7))
    labels = rng.integers(0, 7, size=5)
    expected = float(np.mean([-np_log_softmax(logits[i])[labels[i]] for i in range(5)]))
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(expected, rel=1e-6)


def test_cross_entropy_soft_labels():
    logits = np.array([[2.0, 0.0], [0.0, 2.0]])
    soft = np.array([[0.7, 0.3], [0.5, 0.5]])
    lsm = np_log_softmax(logits)
    expected = float(np.mean([-np.sum(soft[i] * lsm[i]) for i in range(2)]))
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(soft)))
    assert got == pytest.approx(expected, rel=1e-6)


def test_focal_reduces_easy_examples():
    logits = np.array([[10.0, 0.0], [0.5, 0.0]])
    labels = np.array([0, 0])
    focal = float(softmax_focal_multiclass(jnp.asarray(logits), jnp.asarray(labels)))
    ce = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert focal < ce
    # gamma=0 reduces to CE
    focal0 = float(softmax_focal_multiclass(jnp.asarray(logits), jnp.asarray(labels),
                                            gamma=0.0))
    assert focal0 == pytest.approx(ce, rel=1e-6)


def test_masked_lm_focal_only_counts_masked():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 4, 9)).astype(np.float32)
    labels = np.full((2, 4), -100)
    labels[0, 1] = 3
    labels[1, 2] = 7
    got = float(masked_lm_focal_loss(jnp.asarray(logits), jnp.asarray(labels)))
    # manual: mean of focal over the two masked positions
    vals = []
    for (b, s), lab in [((0, 1), 3), ((1, 2), 7)]:
        lsm = np_log_softmax(logits[b, s])
        ce = -lsm[lab]
        vals.append((1 - np.exp(-ce)) ** 2 * ce)
    assert got == pytest.approx(float(np.mean(vals)), rel=1e-5)
    # all-ignored labels must not NaN
    allmask = np.full((2, 4), -100)
    assert float(masked_lm_focal_loss(jnp.asarray(logits), jnp.asarray(allmask))) == 0.0


def test_bce_with_logits():
    logits = np.array([0.5, -1.0, 2.0])
    labels = np.array([1.0, 0.0, 1.0])
    p = 1 / (1 + np.exp(-logits))
    expected = float(np.mean(-(labels * np.log(p) + (1 - labels) * np.log(1 - p))))
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(expected, rel=1e-6)


def test_label_smoothing():
    logits = np.array([[2.0, 0.0, -1.0]])
    labels = np.array([0])
    eps = 0.1
    lsm = np_log_softmax(logits[0])
    soft = np.array([1 - eps, 0, 0]) + eps / 3
    expected = float(-np.sum(soft * lsm))
    got = float(label_smoothing_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                              epsilon=eps))
    assert got == pytest.approx(expected, rel=1e-6)


def test_margin_ranking():
    x1 = jnp.asarray([3.0, 1.0])
    x2 = jnp.asarray([1.0, 2.0])
    # max(0, 5 - (3-1)) = 3 ; max(0, 5 - (1-2)) = 6 -> mean 4.5
    assert float(margin_ranking_loss(x1, x2, 5.0)) == pytest.approx(4.5)


def test_norm_softmax_loss_perfect_alignment_low():
    rng = np.random.default_rng(2)
    v = rng.normal(size=(8, 16))
    good = float(norm_softmax_loss(jnp.asarray(v), jnp.asarray(v), temperature=0.05))
    t_bad = rng.normal(size=(8, 16))
    bad = float(norm_softmax_loss(jnp.asarray(v), jnp.asarray(t_bad), temperature=0.05))
    assert good < bad
    # cos_sim path equals normalize-then-dot path
    c = float(norm_softmax_loss(jnp.asarray(v), jnp.asarray(t_bad), temperature=0.05,
                                cos_sim=True))
    assert c == pytest.approx(bad, rel=1e-5)


def _manual_exclusive_nce(v, t, tm, tr, temp):
    """Loop-based independent implementation of the exclusive-NCE definition."""

    def cn(a):
        return a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-8)

    v, t, tm, tr = cn(v), cn(t), cn(tm), cn(tr)
    B = v.shape[0]
    s = {"t": v @ t.T / temp, "m": v @ tm.T / temp, "r": v @ tr.T / temp}
    loss_v = 0.0
    for which in ("t", "m", "r"):
        for i in range(B):
            # negatives: all of row i across the 3 blocks, except the OTHER
            # two blocks' diagonal entries are replaced by -10000
            row = []
            for blk in ("t", "m", "r"):
                r = s[blk][i].copy()
                if blk != which:
                    r[i] = -10000.0
                row.append(r)
            row = np.concatenate(row)
            pos_idx = {"t": i, "m": B + i, "r": 2 * B + i}[which]
            loss_v += -np_log_softmax(row)[pos_idx]
    loss_v /= B

    loss_t = 0.0
    for which in ("t", "m", "r"):
        for i in range(B):
            col = s[which][:, i]  # this text vs all videos
            loss_t += -np_log_softmax(col)[i]
    loss_t /= 3 * B
    return loss_v + loss_t


def test_exclusive_nce_matches_manual():
    rng = np.random.default_rng(3)
    B, D = 6, 12
    v, t, tm, tr = (rng.normal(size=(B, D)) for _ in range(4))
    out = exclusive_nce_with_ranking(
        jnp.asarray(v), jnp.asarray(t), jnp.asarray(tm), jnp.asarray(tr),
        temperature=0.05)
    expected = _manual_exclusive_nce(v, t, tm, tr, 0.05)
    assert float(out["nce_loss"]) == pytest.approx(expected, rel=1e-5)
    assert "rank_t_tm_loss" in out


def test_exclusive_nce_rank_term():
    rng = np.random.default_rng(4)
    B, D = 4, 8
    v = rng.normal(size=(B, D))
    t = v.copy()              # sim(V,T) diag = 1/temp
    tm = -v                   # sim(V,Tm) diag = -1/temp
    tr = rng.normal(size=(B, D))
    out = exclusive_nce_with_ranking(
        jnp.asarray(v), jnp.asarray(t), jnp.asarray(tm), jnp.asarray(tr),
        temperature=0.05, margin_ttm=5.0)
    # vt_diag - vtm_diag = 40 >> margin 5 -> rank loss 0
    assert float(out["rank_t_tm_loss"]) == pytest.approx(0.0, abs=1e-5)
    out2 = exclusive_nce_with_ranking(
        jnp.asarray(v), jnp.asarray(tm), jnp.asarray(t), jnp.asarray(tr),
        temperature=0.05, margin_ttm=5.0)
    # now reversed: vt_diag - vtm_diag = -40 -> max(0, 5+40) = 45
    assert float(out2["rank_t_tm_loss"]) == pytest.approx(45.0, rel=1e-4)
