"""Sequence-parallel primitives: distributed roll == global roll, and
H-sharded shifted-window attention == single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from clover_tpu.models.swin3d import (
    shift_attn_mask,
    window_partition,
    window_reverse,
)
from clover_tpu.parallel.mesh import make_mesh
from clover_tpu.parallel.sequence import distributed_roll


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh(axis_sizes=(8,), axis_names=("sp",))


@pytest.mark.parametrize("shift", [1, 3, -2, 0, 8])
def test_distributed_roll_matches_global(mesh, shift, rng):
    H = 64  # 8 rows per device
    x = jnp.asarray(rng.normal(size=(H, 5)).astype(np.float32))

    rolled = jax.jit(
        jax.shard_map(
            lambda xl: distributed_roll(xl, shift, "sp", axis=0),
            mesh=mesh, in_specs=P("sp"), out_specs=P("sp"),
        )
    )(x)
    np.testing.assert_array_equal(np.asarray(rolled),
                                  np.asarray(jnp.roll(x, shift, 0)))


def test_distributed_roll_multidim(mesh, rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    rolled = jax.jit(
        jax.shard_map(
            lambda xl: distributed_roll(xl, -3, "sp", axis=1),
            mesh=mesh, in_specs=P(None, "sp"), out_specs=P(None, "sp"),
        )
    )(x)
    np.testing.assert_array_equal(np.asarray(rolled),
                                  np.asarray(jnp.roll(x, -3, 1)))


def test_sp_shifted_window_attention_matches_global(mesh, rng):
    """Full SW-MSA math with the H axis sharded over 8 devices.

    Global (B, D, H, W, C) = (1, 2, 64, 8, 4); window (2, 8, 8), shift
    (1, 4, 4): each H shard of 8 rows holds exactly one window row, so the
    shifted pass crosses shard boundaries only through the roll.
    """
    B, D, H, W, C = 1, 2, 64, 8, 4
    window = (2, 8, 8)
    shift = (1, 4, 4)
    N = window[0] * window[1] * window[2]
    x = jnp.asarray(rng.normal(size=(B, D, H, W, C)).astype(np.float32))

    mask_np = shift_attn_mask((D, H, W), window, shift)  # (nW, N, N)
    nW = mask_np.shape[0]

    def masked_attention(wins, mask):
        # wins (B*nWl, N, C); mask (nWl, N, N)
        sims = jnp.einsum("bnc,bmc->bnm", wins, wins)
        nWl = mask.shape[0]
        sims = sims.reshape(-1, nWl, N, N) + mask[None]
        probs = jax.nn.softmax(sims.reshape(-1, N, N), axis=-1)
        return jnp.einsum("bnm,bmc->bnc", probs, wins)

    def global_swmsa(x):
        xs = jnp.roll(x, (-shift[0], -shift[1], -shift[2]), (1, 2, 3))
        wins = window_partition(xs, window)
        out = masked_attention(wins, jnp.asarray(mask_np))
        out = window_reverse(out, window, B, D, H, W)
        return jnp.roll(out, shift, (1, 2, 3))

    ref = global_swmsa(x)

    # global windows enumerate (d, h, w) d-major; shard sp owns h-window sp
    masks_grid = mask_np.reshape(
        D // window[0], H // window[1], W // window[2], N, N)

    def local_swmsa(x_local):
        sp = jax.lax.axis_index("sp")
        xs = distributed_roll(x_local, -shift[1], "sp", axis=2)
        xs = jnp.roll(xs, (-shift[0], -shift[2]), (1, 3))
        wins = window_partition(xs, window)
        m_local = jax.lax.dynamic_index_in_dim(
            jnp.asarray(masks_grid), sp, axis=1, keepdims=False)
        out = masked_attention(wins, m_local.reshape(-1, N, N))
        out = window_reverse(out, window, B, D, window[1], W)
        out = jnp.roll(out, (shift[0], shift[2]), (1, 3))
        return distributed_roll(out, shift[1], "sp", axis=2)

    out = jax.jit(
        jax.shard_map(local_swmsa, mesh=mesh,
                      in_specs=P(None, None, "sp"),
                      out_specs=P(None, None, "sp"))
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
