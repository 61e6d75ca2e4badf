"""Gradient saliency over video inputs (the reference gradcam_utils role).

The reference ships a GradCAM helper built on torch backward hooks
(mmaction/utils/gradcam_utils.py, exposed via forward_gradcam). In jax the
same diagnostic is a one-liner over the functional model; this utility
packages it: per-frame saliency maps of a retrieval score or class logit.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def video_saliency(
    score_fn: Callable[[jax.Array], jax.Array],
    imgs: jax.Array,
    normalize: bool = True,
) -> jax.Array:
    """|d score / d pixel| reduced over channels -> (B, T, H, W).

    ``score_fn(imgs) -> (B,) scores`` (e.g. the diagonal video-text
    similarity, or a class logit). ``imgs`` is the preprocessed clip batch.
    """
    grads = jax.grad(lambda x: jnp.sum(score_fn(x)))(imgs)
    sal = jnp.abs(grads).sum(axis=-1)
    if normalize:
        flat = sal.reshape(sal.shape[0], -1)
        lo = flat.min(axis=1)[:, None, None, None]
        hi = flat.max(axis=1)[:, None, None, None]
        sal = (sal - lo) / jnp.maximum(hi - lo, 1e-8)
    return sal


def retrieval_saliency(model, params, imgs, token_ids, input_mask):
    """Saliency of the matched-pair similarity for the retrieval model."""

    def score(x):
        v, t = model.apply({"params": params}, x, token_ids, input_mask,
                           method="forward_test")
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        return jnp.sum(v * t, axis=-1)

    return video_saliency(score, imgs)
