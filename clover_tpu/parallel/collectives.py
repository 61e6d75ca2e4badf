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


def psum_scalar(x: jax.Array, axis_name: str) -> jax.Array:
    """Sum a scalar log metric across the mesh axis (reference
    _parse_losses dist.all_reduce, recognizers/base.py:283-286)."""
    return jax.lax.psum(x, axis_name)


def pmean_scalar(x: jax.Array, axis_name: str) -> jax.Array:
    return jax.lax.pmean(x, axis_name)
