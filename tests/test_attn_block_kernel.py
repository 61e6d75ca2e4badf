"""Fused window-attention half-block: kernel + SwinBlock integration parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clover_tpu.ops.attn_block as AB
from clover_tpu.models.swin3d import SwinConfig, SwinTransformer3D


def _args(rng, Bn, N, C, nH, nW=None, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(Bn, N, C)) * 0.5, dtype)
    ls = jnp.asarray(rng.normal(size=C).astype(np.float32))
    lb = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)).astype(np.float32) * 0.05)
    bqkv = jnp.asarray(rng.normal(size=3 * C).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32) * 0.2)
    mask = None
    if nW:
        m = np.where(rng.random((nW, N, N)) < 0.2, -100.0, 0.0)
        mask = jnp.asarray(m.astype(np.float32))
    wp = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.05)
    bp = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    return x, ls, lb, wqkv, bqkv, bias, mask, wp, bp


@pytest.mark.parametrize("Bn,N,C,nH,nW", [
    (8, 8, 64, 2, None),
    (8, 8, 64, 2, 4),        # shifted: per-window mask
    (4, 12, 96, 3, 2),       # N not 8-aligned, hd=32
])
def test_kernel_matches_reference(Bn, N, C, nH, nW, monkeypatch):
    monkeypatch.setattr(AB, "_FORCE_PALLAS", True)
    rng = np.random.default_rng(0)
    args = _args(rng, Bn, N, C, nH, nW)
    got = AB.fused_window_attn_block(*args, None, 0.125)
    ref = AB._xla_reference(*args, 0.125, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_kernel_grads_match_reference(monkeypatch):
    monkeypatch.setattr(AB, "_FORCE_PALLAS", True)
    rng = np.random.default_rng(1)
    args = _args(rng, 4, 8, 32, 2, 2)

    def loss_fused(*a):
        return jnp.sum(AB.fused_window_attn_block(*a, None, 0.2) ** 2)

    def loss_ref(*a):
        return jnp.sum(AB._xla_reference(*a, 0.2, 1e-5) ** 2)

    idx = [0, 1, 3, 5, 7]    # x, ln_scale, wqkv, bias, wproj
    g1 = jax.grad(loss_fused, argnums=idx)(*args)
    g2 = jax.grad(loss_ref, argnums=idx)(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_swin_fused_block_parity():
    """attention_impl='fused_block' (+fused_mlp) == default XLA Swin."""
    cfg = SwinConfig(patch_size=(1, 2, 2), stride=(1, 2, 2), embed_dim=16,
                     depths=(2, 2), num_heads=(2, 4), window_size=(2, 2, 2),
                     drop_path_rate=0.0)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 2, 8, 8, 3)),
                    jnp.float32)
    model = SwinTransformer3D(cfg)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)

    fused = SwinTransformer3D(dataclasses.replace(
        cfg, attention_impl="fused_block", fused_mlp=True))
    params_f = fused.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree_util.tree_structure(params_f)
            == jax.tree_util.tree_structure(params))
    out = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_swin_fused_block_grads_flow():
    cfg = SwinConfig(patch_size=(1, 2, 2), stride=(1, 2, 2), embed_dim=8,
                     depths=(2,), num_heads=(2,), window_size=(2, 2, 2),
                     drop_path_rate=0.0, attention_impl="fused_block")
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 2, 4, 4, 3)),
                    jnp.float32)
    model = SwinTransformer3D(cfg)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    grads = jax.grad(
        lambda p: jnp.sum(model.apply({"params": p}, x) ** 2))(params)
    blk = grads["stage_0_block_0"]
    for path in (("norm1", "scale"), ("attn", "qkv", "kernel"),
                 ("attn", "proj", "kernel"),
                 ("attn", "relative_position_bias_table")):
        leaf = blk
        for k in path:
            leaf = leaf[k]
        arr = np.asarray(leaf)
        assert np.all(np.isfinite(arr)) and np.abs(arr).max() > 0, path


@pytest.mark.slow
def test_window_resident_fused_half_matches_unfused(monkeypatch):
    """CLOVER_FUSED_ATTN routes the window-resident path through the fused
    half-block; outputs must match the unfused resident path at bf16
    tolerance and the param tree must be unchanged (checkpoint-compatible)."""
    import clover_tpu.models.swin3d as s3

    cfg = SwinConfig(patch_size=(2, 4, 4), embed_dim=32, depths=(2, 2),
                     num_heads=(2, 4), window_size=(2, 7, 7),
                     attention_impl="pallas_flat", window_resident=True)
    model = SwinTransformer3D(cfg, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 28, 28, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(params, x)

    monkeypatch.setattr(s3, "_FUSED_ATTN_MODE", "1")
    monkeypatch.setattr(AB, "_FORCE_PALLAS", True)   # interpret kernel on CPU
    out = model.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.05)
    assert (jax.tree_util.tree_structure(model.init(jax.random.PRNGKey(0), x))
            == jax.tree_util.tree_structure(params))


@pytest.mark.parametrize("Bn,N,C,nH,nW", [
    (8, 8, 64, 4, None),
    (8, 8, 64, 4, 4),        # shifted: per-window mask
    (4, 12, 96, 3, 2),       # nH=3 -> G=1 (non-power-of-two heads)
])
def test_grouped_kernel_matches_reference(Bn, N, C, nH, nW):
    """Head-group-tiled fused half-block (grid over groups, fp32 out
    accumulator) vs the XLA reference, interpret mode."""
    rng = np.random.default_rng(0)
    args = _args(rng, Bn, N, C, nH, nW, dtype=jnp.bfloat16)
    out = AB._forward_grouped(*args, None, 0.125, 1e-5)
    assert out is not None
    ref = AB._xla_reference(*args, 0.125, 1e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0.05)


def test_forward_falls_back_to_grouped(monkeypatch):
    """When the all-heads budget is too small for _pick_w, _forward must
    route through the grouped kernel (not the XLA reference)."""
    monkeypatch.setattr(AB, "_FORCE_PALLAS", True)
    calls = {}
    orig = AB._forward_grouped

    def spy(*a, **k):
        calls["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(AB, "_forward_grouped", spy)
    monkeypatch.setattr(AB, "_pick_w", lambda *a, **k: 0)
    rng = np.random.default_rng(1)
    args = _args(rng, 8, 8, 64, 4, None, dtype=jnp.bfloat16)
    out = AB.fused_window_attn_block(*args, None, 0.125)
    ref = AB._xla_reference(*args, 0.125, 1e-5)
    assert calls.get("hit")
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0.05)


def test_row_scale_droppath_grads(monkeypatch):
    """The DropPath row scale must scale the branch (not the residual) and
    carry correct gradients through the composed backward."""
    monkeypatch.setattr(AB, "_FORCE_PALLAS", True)
    rng = np.random.default_rng(5)
    args = _args(rng, 8, 8, 64, 2, None)
    rs = jnp.asarray(np.array([1.25, 0.0, 1.25, 1.25, 0.0, 1.25, 1.25, 1.25],
                              np.float32))

    out = AB.fused_window_attn_block(*args, rs, 0.125)
    ref = AB._xla_reference(*args, 0.125, 1e-5, rs)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=1e-4)
    # zero-scale windows pass the residual through untouched
    np.testing.assert_allclose(np.asarray(out[1], np.float32),
                               np.asarray(args[0][1], np.float32), atol=1e-6)

    g = jax.grad(lambda r: jnp.sum(
        AB.fused_window_attn_block(*args, r, 0.125) ** 2))(rs)
    g_ref = jax.grad(lambda r: jnp.sum(
        AB._xla_reference(*args, 0.125, 1e-5, r) ** 2))(rs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
