"""Swin3D backbone tests: window math goldens, mask correctness, shapes.

Golden values come from independent loop-based numpy implementations, not
from the vectorized code under test.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clover_tpu.models.swin3d import (
    SwinConfig,
    SwinTransformer3D,
    WindowAttention3D,
    effective_window,
    relative_position_index,
    shift_attn_mask,
    window_partition,
    window_reverse,
)


def test_effective_window_clamps():
    # T latent 4 < window 8 -> clamp + zero temporal shift (reference case:
    # 8-frame train clips, swin window (8,7,7))
    win, shift = effective_window((4, 56, 56), (8, 7, 7), (4, 3, 3))
    assert win == (4, 7, 7)
    assert shift == (0, 3, 3)
    assert effective_window((16, 7, 7), (8, 7, 7)) == (8, 7, 7)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 6, 5)).astype(np.float32))
    win = (2, 3, 3)
    parts = window_partition(x, win)
    assert parts.shape == (2 * 2 * 2 * 2, 18, 5)
    back = window_reverse(parts, win, 2, 4, 6, 6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_manual():
    # full == effective window (2, 2, 2): check against direct definition
    idx = relative_position_index((2, 2, 2), (2, 2, 2))
    pos = [(d, h, w) for d in range(2) for h in range(2) for w in range(2)]
    for i, p in enumerate(pos):
        for j, q in enumerate(pos):
            rd, rh, rw = p[0] - q[0] + 1, p[1] - q[1] + 1, p[2] - q[2] + 1
            expected = rd * 9 + rh * 3 + rw
            assert idx[i, j] == expected
    # uniqueness of the zero-relative position
    assert idx[0, 0] == idx[3, 3] == idx[7, 7]


def test_relative_position_index_clamped_equals_slice():
    """Direct construction for a temporally clamped window must equal the
    reference's [:N,:N] slice of the full-window index (swin :382)."""
    full = (4, 3, 3)
    eff = (2, 3, 3)
    full_idx = relative_position_index(full, full)
    eff_idx = relative_position_index(full, eff)
    N = 2 * 3 * 3
    np.testing.assert_array_equal(eff_idx, full_idx[:N, :N])


def test_shift_mask_blocks_cross_region_attention():
    window, shift = (2, 2, 2), (1, 1, 1)
    size = (4, 4, 4)
    mask = shift_attn_mask(size, window, shift)
    nW = (4 // 2) ** 3
    N = 8
    assert mask.shape == (nW, N, N)
    assert set(np.unique(mask)) <= {0.0, -100.0}
    # diagonal always allowed
    assert np.all(np.diagonal(mask, axis1=1, axis2=2) == 0.0)

    # brute-force check: tokens attend iff they share a contiguity region.
    # Regions partition *rolled* coordinates: c < size-win holds only
    # unwrapped content; [size-win, size-sh) original high coords;
    # [size-sh, size) wrapped-around low coords.
    D, H, W = size

    def region(c, dim_size, win, sh):
        if c < dim_size - win:
            return 0
        if c < dim_size - sh:
            return 1
        return 2

    # reconstruct region ids per rolled position, then window-partition
    ids = np.zeros(size, dtype=np.int64)
    for d in range(D):
        for h in range(H):
            for w in range(W):
                ids[d, h, w] = (
                    region(d, D, window[0], shift[0]) * 9
                    + region(h, H, window[1], shift[1]) * 3
                    + region(w, W, window[2], shift[2])
                )
    wins = ids.reshape(2, 2, 2, 2, 2, 2).transpose(0, 2, 4, 1, 3, 5).reshape(nW, N)
    for wi in range(nW):
        for a in range(N):
            for b in range(N):
                allowed = wins[wi, a] == wins[wi, b]
                assert (mask[wi, a, b] == 0.0) == allowed


def test_shift_mask_none_without_shift():
    assert shift_attn_mask((4, 4, 4), (2, 2, 2), (0, 0, 0)) is None


def test_window_attention_golden(rng):
    """WindowAttention3D vs loop-based numpy attention with the same params."""
    dim, heads, win = 8, 2, (2, 2, 2)
    N = 8
    model = WindowAttention3D(dim, win, heads, qkv_bias=True)
    x = jnp.asarray(rng.normal(size=(3, N, dim)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, win)["params"]
    out = model.apply({"params": params}, x, win)

    qkv_k = np.asarray(params["qkv"]["kernel"])
    qkv_b = np.asarray(params["qkv"]["bias"])
    proj_k = np.asarray(params["proj"]["kernel"])
    proj_b = np.asarray(params["proj"]["bias"])
    table = np.asarray(params["relative_position_bias_table"])
    idx = relative_position_index(win, win)

    xn = np.asarray(x)
    expected = np.zeros_like(xn)
    hd = dim // heads
    scale = hd ** -0.5
    for b in range(3):
        qkv = xn[b] @ qkv_k + qkv_b  # (N, 3*dim)
        q, k, v = qkv[:, :dim], qkv[:, dim:2 * dim], qkv[:, 2 * dim:]
        heads_out = []
        for h in range(heads):
            qs = q[:, h * hd:(h + 1) * hd] * scale
            ks = k[:, h * hd:(h + 1) * hd]
            vs = v[:, h * hd:(h + 1) * hd]
            logits = qs @ ks.T + table[idx, h]
            p = np.exp(logits - logits.max(-1, keepdims=True))
            p = p / p.sum(-1, keepdims=True)
            heads_out.append(p @ vs)
        expected[b] = np.concatenate(heads_out, axis=-1) @ proj_k + proj_b
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_cfg():
    return SwinConfig(
        patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8,
        depths=(2, 2), num_heads=(2, 4), window_size=(2, 2, 2),
        drop_path_rate=0.0, mask_token=True)


def test_swin_forward_shapes(tiny_cfg, rng):
    model = SwinTransformer3D(tiny_cfg)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    # T: 4/2=2; H,W: 16/4=4 then one merge -> 2; C: 8*2=16
    assert out.shape == (2, 2, 2, 2, 16)


def test_swin_mask_token_mixing(tiny_cfg, rng):
    model = SwinTransformer3D(tiny_cfg)
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    assert "mask_token" in params
    # all-ones mask replaces every token; all-zeros must equal unmasked pass
    zero_mask = jnp.zeros((1, 4, 4), dtype=jnp.int32)
    out_masked, w = model.apply({"params": params}, x, zero_mask)
    out_plain = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_plain),
                               atol=1e-6)
    assert float(jnp.sum(w)) == 0.0
    one_mask = jnp.ones((1, 4, 4), dtype=jnp.int32)
    out_all, w_all = model.apply({"params": params}, x, one_mask)
    assert float(jnp.mean(w_all)) == 1.0
    assert not np.allclose(np.asarray(out_all), np.asarray(out_plain))


def test_swin_temporal_clamp_runs(tiny_cfg, rng):
    """Input shorter than the temporal window (the live train-config case)."""
    cfg = SwinConfig(patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8,
                     depths=(2,), num_heads=(2,), window_size=(8, 2, 2),
                     drop_path_rate=0.0)
    model = SwinTransformer3D(cfg)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 2, 2, 2, 8)


@pytest.mark.slow
def test_window_resident_matches_spatial(tiny_cfg, rng):
    """Window-resident stages (partition once per stage, permute only for
    shifted blocks) must be numerically identical to the spatial path —
    outputs AND grads, in both permutation modes."""
    import dataclasses

    import clover_tpu.models.swin3d as S

    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 3)).astype(np.float32))
    m_res = SwinTransformer3D(dataclasses.replace(tiny_cfg, mask_token=False))
    m_sp = SwinTransformer3D(dataclasses.replace(
        tiny_cfg, mask_token=False, window_resident=False))
    params = m_sp.init(jax.random.PRNGKey(0), x)["params"]
    # identical param trees: checkpoints are layout-independent
    assert (jax.tree_util.tree_structure(
        m_res.init(jax.random.PRNGKey(0), x)["params"])
        == jax.tree_util.tree_structure(params))

    out_sp = m_sp.apply({"params": params}, x)
    for mode in ("compose", "take"):
        orig = S._WIN_PERM_MODE
        S._WIN_PERM_MODE = mode
        try:
            out_res = m_res.apply({"params": params}, x)
        finally:
            S._WIN_PERM_MODE = orig
        np.testing.assert_allclose(np.asarray(out_res), np.asarray(out_sp),
                                   atol=1e-5, err_msg=mode)

    def loss(m, p):
        return jnp.sum(m.apply({"params": p}, x) ** 2)

    g_sp = jax.grad(lambda p: loss(m_sp, p))(params)
    g_res = jax.grad(lambda p: loss(m_res, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_res),
                    jax.tree_util.tree_leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_window_resident_fallback_on_padding(rng):
    """Stages whose dims don't divide the window silently use the spatial
    (padding) path — outputs still match a window_resident=False model."""
    import dataclasses

    cfg = SwinConfig(patch_size=(1, 2, 2), stride=(1, 2, 2), embed_dim=8,
                     depths=(2,), num_heads=(2,), window_size=(2, 2, 2),
                     drop_path_rate=0.0)
    x = jnp.asarray(rng.normal(size=(1, 3, 6, 6, 3)).astype(np.float32))
    m1 = SwinTransformer3D(cfg)  # D=3 doesn't divide wd=2 -> fallback
    m0 = SwinTransformer3D(dataclasses.replace(cfg, window_resident=False))
    params = m0.init(jax.random.PRNGKey(0), x)["params"]
    np.testing.assert_allclose(
        np.asarray(m1.apply({"params": params}, x)),
        np.asarray(m0.apply({"params": params}, x)), atol=1e-6)


def test_bias_cache_matches_gather(tiny_cfg, rng):
    """forward with swin_bias_cache(params) == forward with per-step
    gathers (the cache is an exact apply-time constant, swin3d.py)."""
    from clover_tpu.models.swin3d import bias_cache_builder, swin_bias_cache

    model = SwinTransformer3D(tiny_cfg)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    cache = swin_bias_cache(params, tiny_cfg, (4, 16, 16))
    assert set(cache) == {f"stage_{i}_block_{j}"
                          for i in range(2) for j in range(2)}
    ref = model.apply({"params": params}, x)
    out = model.apply({"params": params}, x, bias_cache=cache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # builder form (eval loops): full param tree + lazy shape
    build = bias_cache_builder(tiny_cfg)
    cache2 = build({"backbone": params}, (4, 16, 16))
    out2 = model.apply({"params": params}, x, bias_cache=cache2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fold_normalize_matches_normalized_input(rng):
    """PatchEmbed with fold_normalize on pixel-scale input == the default
    embed on (x-mean)/std input, for both embed lowerings (exact folding
    of the per-channel affine into the projection)."""
    from clover_tpu.models.swin3d import PatchEmbed3D
    from clover_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

    pixels = rng.integers(0, 256, size=(2, 4, 16, 16, 3)).astype(np.float32)
    normed = (pixels - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32)
    for impl in ("conv", "s2d"):
        cfg = SwinConfig(patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8,
                         depths=(2,), num_heads=(2,), patch_norm=False,
                         embed_impl=impl)
        cfg_fold = dataclasses.replace(cfg, fold_normalize=True)
        m = PatchEmbed3D(cfg)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(normed))["params"]
        ref = m.apply({"params": params}, jnp.asarray(normed))
        out = PatchEmbed3D(cfg_fold).apply({"params": params},
                                           jnp.asarray(pixels))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_host_s2d_embed_matches_conv(rng):
    """space_to_depth_host + embed_impl='host_s2d' == the conv embed on the
    same pixels (one GEMM, loader-side transpose; checkpoint-identical)."""
    from clover_tpu.models.swin3d import PatchEmbed3D
    from clover_tpu.ops.preprocess import space_to_depth_host

    pixels = rng.integers(0, 256, size=(2, 4, 16, 16, 3)).astype(np.uint8)
    base = SwinConfig(patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8,
                      depths=(2,), num_heads=(2,), patch_norm=False,
                      fold_normalize=True, embed_impl="conv")
    m = PatchEmbed3D(base)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.asarray(pixels.astype(np.float32)))["params"]
    ref = m.apply({"params": params}, jnp.asarray(pixels.astype(np.float32)))
    s2d = space_to_depth_host(pixels)
    cfg2 = dataclasses.replace(base, embed_impl="host_s2d")
    out = PatchEmbed3D(cfg2).apply({"params": params},
                                   jnp.asarray(s2d.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bias_from_table_matmul_matches_gather():
    """The einsum form of the relative-position bias (one-hot factors,
    swin3d.bias_from_table) is BIT-IDENTICAL to the reference row-gather
    (swin_transformer_3d.py:380-384): every output element sums exactly
    one table entry against 1.0 factors."""
    import numpy as np

    import jax.numpy as jnp

    import clover_tpu.models.swin3d as s3d

    rng = np.random.default_rng(0)
    for full, eff, nH in (((8, 7, 7), (4, 7, 7), 16),
                          ((8, 7, 7), (8, 7, 7), 4),
                          ((2, 7, 7), (1, 7, 7), 8)):
        table_len = int(np.prod([2 * w - 1 for w in full]))
        table = jnp.asarray(
            rng.normal(size=(table_len, nH)).astype(np.float32))
        N = int(np.prod(eff))
        rp = s3d.relative_position_index(full, eff)
        ref = np.asarray(table)[rp.reshape(-1)].reshape(
            N, N, nH).transpose(2, 0, 1)
        out = np.asarray(s3d.bias_from_table(table, full, eff, nH))
        np.testing.assert_array_equal(out, ref)
