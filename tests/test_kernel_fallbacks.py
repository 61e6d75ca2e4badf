"""Kernel infeasible-shape fallbacks must not crash (long-context windows)."""

import numpy as np

import jax.numpy as jnp

from clover_tpu.ops.window_attention import (
    _pick_window_block,
    fused_window_attention,
)


def test_pick_window_block_infeasible_returns_zero():
    # 32-frame stage-2-like: nH=16, N=392 -> bias alone ~9.8 MB
    assert _pick_window_block(64, 16, 392, 32, 2, 8) == 0


def test_v2_falls_back_on_big_windows(rng):
    Bn, nH, N, hd = 4, 16, 392, 32
    q, k, v = (jnp.asarray(rng.normal(size=(Bn, nH, N, hd)).astype(np.float32))
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    out = fused_window_attention(q, k, v, bias, None, 0.18)
    assert out.shape == (Bn, nH, N, hd)
    assert np.all(np.isfinite(np.asarray(out)))
