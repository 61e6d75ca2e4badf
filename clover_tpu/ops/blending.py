"""Batch blending augmentations: mixup / cutmix (device-side).

Reference: mmaction/datasets/blending_utils.py:59-147 + datasets/mixup.py
(registered, hooked via train_cfg.blending in BaseRecognizer:110-115).
Device-side jax ops: blend a clip batch and produce soft labels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _one_hot(labels: jax.Array, num_classes: int) -> jax.Array:
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def mixup(
    rng: jax.Array,
    imgs: jax.Array,            # (B, T, H, W, C) float
    labels: jax.Array,          # (B,) int
    num_classes: int,
    alpha: float = 0.2,
) -> Tuple[jax.Array, jax.Array]:
    """Convex-combine each clip with a random partner; soft labels."""
    B = imgs.shape[0]
    k1, k2 = jax.random.split(rng)
    lam = jax.random.beta(k1, alpha, alpha)
    perm = jax.random.permutation(k2, B)
    mixed = lam * imgs + (1.0 - lam) * imgs[perm]
    y = _one_hot(labels, num_classes)
    soft = lam * y + (1.0 - lam) * y[perm]
    return mixed, soft


def cutmix(
    rng: jax.Array,
    imgs: jax.Array,
    labels: jax.Array,
    num_classes: int,
    alpha: float = 0.2,
) -> Tuple[jax.Array, jax.Array]:
    """Paste a random spatial box from a partner clip; area-weighted labels."""
    B, T, H, W, C = imgs.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    lam = jax.random.beta(k1, alpha, alpha)
    cut_ratio = jnp.sqrt(1.0 - lam)
    ch = (cut_ratio * H).astype(jnp.int32)
    cw = (cut_ratio * W).astype(jnp.int32)
    cy = jax.random.randint(k2, (), 0, H)
    cx = jax.random.randint(k3, (), 0, W)
    y0 = jnp.clip(cy - ch // 2, 0, H)
    y1 = jnp.clip(cy + ch // 2, 0, H)
    x0 = jnp.clip(cx - cw // 2, 0, W)
    x1 = jnp.clip(cx + cw // 2, 0, W)
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    box = ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1))
    box = box[None, None, :, :, None].astype(imgs.dtype)
    perm = jax.random.permutation(k4, B)
    mixed = imgs * (1.0 - box) + imgs[perm] * box
    area = ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / float(H * W)
    y = _one_hot(labels, num_classes)
    soft = (1.0 - area) * y + area * y[perm]
    return mixed, soft
