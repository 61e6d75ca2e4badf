"""Collectives with the reference's gradient semantics.

The reference's distributed-negatives primitive is a differentiable
all-gather: forward gathers embeddings from every rank, backward hands each
rank the gradient slice of its own shard
(mmaction/models/utils/gather_loss.py:5-23). In JAX, ``jax.lax.all_gather``
*already has exactly this VJP* (its transpose is psum-scatter, which for a
tiled gather sums each device's contribution to the local slice — the DDP
sum over ranks included). These wrappers just name the pattern and keep the
shard_map call sites readable; under plain pjit/GSPMD no explicit gather is
needed at all (compute the loss on the global batch and let XLA partition).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def all_gather_with_grad(x: jax.Array, axis_name: str) -> jax.Array:
    """Concatenate shards along the leading dim; grad flows to the local shard.

    Equivalent of GatherLoss.apply (gather_loss.py:5-23) for equal per-device
    batches inside shard_map/pmap.
    """
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def all_gather_varied(x_padded: jax.Array, n_valid: jax.Array,
                      axis_name: str):
    """Differentiable gather of per-device *ragged* batches.

    TPU-native equivalent of the reference's VariedShapeGatherLoss
    (gather_loss.py:25-70): there, ranks first exchange their batch sizes,
    pad to the max, all_gather, then unpad-concatenate, and the backward
    slices out each rank's own gradient shard. XLA requires static shapes,
    so instead of compacting the gathered result we keep the padding and
    return a validity mask — downstream losses mask invalid keys/queries
    (see losses.contrastive.norm_softmax_loss_sharded_varied), which is
    numerically identical to compaction.

    Args:
      x_padded: (max_n, ...) local shard padded to the common static max.
      n_valid: scalar int — how many leading rows of ``x_padded`` are real.
      axis_name: mesh axis to gather over.

    Returns:
      (gathered, valid_mask): (world*max_n, ...) concatenation of all padded
      shards, and a (world*max_n,) bool mask of real rows. Gradients flow to
      each device's own padded shard (all_gather's VJP), exactly the
      reference's backward slice rule.
    """
    gathered = jax.lax.all_gather(x_padded, axis_name, axis=0, tiled=True)
    counts = jax.lax.all_gather(
        jnp.asarray(n_valid, jnp.int32), axis_name, axis=0)
    max_n = x_padded.shape[0]
    mask = (jnp.arange(max_n)[None, :] < counts[:, None]).reshape(-1)
    return gathered, mask


def psum_scalar(x: jax.Array, axis_name: str) -> jax.Array:
    """Sum a scalar log metric across the mesh axis (reference
    _parse_losses dist.all_reduce, recognizers/base.py:283-286)."""
    return jax.lax.psum(x, axis_name)


def pmean_scalar(x: jax.Array, axis_name: str) -> jax.Array:
    return jax.lax.pmean(x, axis_name)
