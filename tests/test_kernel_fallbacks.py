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


def test_bwd_fallback_fp32_recompute(monkeypatch, rng):
    """When the fwd flat kernel is feasible but the bwd kernel is not,
    the vjp fallback must recompute with fp32 logits — the math the
    executed (kernel) forward actually did — not the bf16-logit XLA
    reference (ADVICE r1: per-shape fwd/bwd numerics divergence)."""
    import jax

    import clover_tpu.ops.window_attention as WA

    monkeypatch.setattr(WA, "_BWD_KERNEL", False)  # force the vjp fallback
    Bn, nH, N, hd = 8, 2, 49, 16
    C = nH * hd
    qkv = jnp.asarray(
        rng.normal(size=(Bn, N, 3 * C)).astype(np.float32)).astype(jnp.bfloat16)
    bias = jnp.asarray(
        rng.normal(size=(nH, N, N)).astype(np.float32)).astype(jnp.bfloat16)
    # precondition: this shape takes the kernel forward
    assert WA._pick_window_block_flat(Bn, nH, N, hd, 2, None) > 0

    # fixed cotangent isolates the vjp rule from forward-output rounding
    ct = jnp.asarray(
        rng.normal(size=(Bn, N, C)).astype(np.float32)).astype(jnp.bfloat16)
    _, vjp_k = jax.vjp(
        lambda a, b: WA.flat_window_attention(a, b, None, 0.18, nH), qkv, bias)
    _, vjp_32 = jax.vjp(lambda a, b: WA._xla_flat_reference(
        a, b, None, 0.18, nH, fp32_logits=True), qkv, bias)
    _, vjp_16 = jax.vjp(lambda a, b: WA._xla_flat_reference(
        a, b, None, 0.18, nH, fp32_logits=False), qkv, bias)
    g, g32, g16 = vjp_k(ct), vjp_32(ct), vjp_16(ct)
    for a, b in zip(g, g32):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    # ...and the pin is meaningful: bf16-logit grads differ on this shape
    assert any(
        not np.array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))
        for a, b in zip(g32, g16))


def test_v2_falls_back_on_big_windows(rng):
    Bn, nH, N, hd = 4, 16, 392, 32
    q, k, v = (jnp.asarray(rng.normal(size=(Bn, nH, N, hd)).astype(np.float32))
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    out = fused_window_attention(q, k, v, bias, None, 0.18)
    assert out.shape == (Bn, nH, N, hd)
    assert np.all(np.isfinite(np.asarray(out)))
