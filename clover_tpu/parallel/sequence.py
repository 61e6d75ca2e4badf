"""Sequence-parallel (spatially sharded) shifted-window attention support.

New capability beyond the reference (which has no sequence parallelism,
SURVEY.md §2.5/§5.7): shard the H (row) axis of video features across a
mesh axis. Plain-window attention is then fully local when the shard
height is a multiple of the window height; the *shifted* windows need only
the cyclic roll to cross shards, implemented here as a ring halo exchange
(`ppermute`) instead of an all-gather — O(shift) rows of traffic per
device instead of O(H).

Use inside shard_map:

    x_local = ...                        # (B, D, H/n, W, C) shard
    x_rolled = distributed_roll(x_local, -shift_h, axis_name='sp', axis=2)
    ... local window attention ...
    out = distributed_roll(out, shift_h, axis_name='sp', axis=2)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def distributed_roll(x: jax.Array, shift: int, axis_name: str,
                     axis: int = 0) -> jax.Array:
    """Cyclic roll of a sharded axis: jnp.roll over the GLOBAL array.

    ``x`` is the local shard; the global array is the concatenation of
    shards along ``axis`` in mesh order. |shift| must be <= the local
    shard length. Positive shift moves content toward higher indices
    (jnp.roll semantics).
    """
    n = jax.lax.axis_size(axis_name)
    length = x.shape[axis]
    if shift == 0 or n == 1:
        return jnp.roll(x, shift, axis)
    s = shift % (length * n)
    if s == 0:
        return x
    if s > length * n // 2 and length * n - s <= length:
        s = s - length * n  # shorter path in the other direction
    if abs(s) > length:
        raise ValueError(
            f"|shift| ({abs(s)}) must be <= local shard length ({length})")

    def take(arr, sl):
        idx = [slice(None)] * arr.ndim
        idx[axis] = sl
        return arr[tuple(idx)]

    if s > 0:
        # global roll down: each shard receives the last s rows of its left
        # neighbor and keeps its own first (length - s)
        halo = take(x, slice(length - s, None))
        recv = jax.lax.ppermute(
            halo, axis_name, [(i, (i + 1) % n) for i in range(n)])
        return jnp.concatenate([recv, take(x, slice(0, length - s))], axis)
    s = -s
    halo = take(x, slice(0, s))
    recv = jax.lax.ppermute(
        halo, axis_name, [(i, (i - 1) % n) for i in range(n)])
    return jnp.concatenate([take(x, slice(s, None)), recv], axis)


def sp_window_attention_shift(x_local: jax.Array, shift_h: int,
                              axis_name: str, h_axis: int = 2):
    """Pre/post roll pair for sequence-sharded SW-MSA: returns (shifted
    shard, inverse fn)."""
    shifted = distributed_roll(x_local, -shift_h, axis_name, h_axis)

    def unshift(y):
        return distributed_roll(y, shift_h, axis_name, h_axis)

    return shifted, unshift
