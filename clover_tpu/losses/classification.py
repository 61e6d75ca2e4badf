"""Cross-entropy family + focal losses as pure functions.

Reference semantics:
- CrossEntropyLoss (hard/soft labels): mmaction/models/losses/cross_entropy_loss.py:9-110
- BCELossWithLogits: cross_entropy_loss.py:111-138
- LabelSmoothing / SoftTarget CE: cross_entropy_loss.py:139-220
- SoftmaxFocalLossMultiClass (gamma=2 MLM loss): focal_loss.py:49-72

The masked variants replace the reference's dynamic boolean indexing
(multimodal_transformer_pretrain.py:137-139) with a static-shape masked
mean — identical value, jit-compatible.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Hard-label CE. labels: int (N,) or soft (N, C)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if labels.ndim == logits.ndim:  # soft labels
        loss = -(labels * logp)
        if class_weight is not None:
            loss = loss * class_weight
        return jnp.mean(jnp.sum(loss, axis=-1))
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        w = class_weight[labels]
        return jnp.sum(nll * w) / jnp.sum(w)
    return jnp.mean(nll)


def bce_with_logits(logits: jax.Array, labels: jax.Array,
                    pos_weight: Optional[jax.Array] = None) -> jax.Array:
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_1mp = jax.nn.log_sigmoid(-logits)
    pos = -labels * log_p
    if pos_weight is not None:
        pos = pos * pos_weight
    return jnp.mean(pos - (1.0 - labels) * log_1mp)


def label_smoothing_cross_entropy(logits: jax.Array, labels: jax.Array,
                                  epsilon: float = 0.1) -> jax.Array:
    n_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, n_classes)
    soft = onehot * (1.0 - epsilon) + epsilon / n_classes
    return cross_entropy(logits, soft)


def softmax_focal_multiclass(logits: jax.Array, labels: jax.Array,
                             gamma: float = 2.0) -> jax.Array:
    """(1 - p_t)^gamma * CE, mean-reduced (reference focal_loss.py:60-72)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    pt = jnp.exp(-ce)
    return jnp.mean((1.0 - pt) ** gamma * ce)


def masked_lm_focal_loss(logits: jax.Array, mlm_labels: jax.Array,
                         gamma: float = 2.0) -> jax.Array:
    """Focal CE over the masked positions only.

    logits (B, S, V); mlm_labels (B, S) with IGNORE_INDEX at unmasked
    positions. Equals selecting masked rows then mean-reducing
    (reference multimodal_transformer_pretrain.py:136-140).
    """
    logits = logits.astype(jnp.float32)
    valid = mlm_labels != IGNORE_INDEX
    safe = jnp.where(valid, mlm_labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    pt = jnp.exp(-ce)
    focal = (1.0 - pt) ** gamma * ce
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, focal, 0.0)) / n_valid


def masked_lm_cross_entropy(logits: jax.Array, mlm_labels: jax.Array) -> jax.Array:
    """Plain CE over masked positions (mlm_loss=None fallback, reference :142)."""
    return masked_lm_focal_loss(logits, mlm_labels, gamma=0.0)
