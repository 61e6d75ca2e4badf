"""Pallas fused window attention: parity vs XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clover_tpu.models.swin3d import SwinConfig, SwinTransformer3D, WindowAttention3D
from clover_tpu.ops.window_attention import fused_window_attention


def _xla_reference(q, k, v, bias, mask, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    logits = logits + bias[None]
    if mask is not None:
        nW = mask.shape[0]
        Bn, nH, N, _ = logits.shape
        logits = (logits.reshape(Bn // nW, nW, nH, N, N)
                  + mask[None, :, None]).reshape(Bn, nH, N, N)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@pytest.mark.parametrize("with_mask", [False, True])
def test_kernel_matches_xla(rng, with_mask):
    Bn, nH, N, hd = 8, 2, 12, 16   # Bn = 2 clips x 4 windows
    q, k, v = (jnp.asarray(rng.normal(size=(Bn, nH, N, hd)).astype(np.float32))
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    mask = None
    if with_mask:
        m = np.where(rng.random((4, N, N)) < 0.3, -100.0, 0.0)
        mask = jnp.asarray(m.astype(np.float32))
    scale = hd ** -0.5
    out = fused_window_attention(q, k, v, bias, mask, scale)
    ref = _xla_reference(q, k, v, bias, mask, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_gradients_match_xla(rng):
    Bn, nH, N, hd = 4, 2, 8, 8
    q, k, v = (jnp.asarray(rng.normal(size=(Bn, nH, N, hd)).astype(np.float32))
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.random((2, N, N)) < 0.3, -100.0, 0.0).astype(np.float32))
    scale = hd ** -0.5

    def loss_fused(q, k, v, bias, mask):
        return jnp.sum(fused_window_attention(q, k, v, bias, mask, scale) ** 2)

    def loss_ref(q, k, v, bias, mask):
        return jnp.sum(_xla_reference(q, k, v, bias, mask, scale) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias, mask)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias, mask)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("with_mask", [False, True])
def test_flat_kernel_matches_xla(rng, with_mask):
    """flat v5 kernel (head slicing in VMEM from the un-relayouted qkv)."""
    from clover_tpu.ops.window_attention import flat_window_attention

    Bn, nH, N, hd = 8, 2, 12, 16
    C = nH * hd
    qkv = jnp.asarray(rng.normal(size=(Bn, N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    mask = None
    if with_mask:
        m = np.where(rng.random((4, N, N)) < 0.3, -100.0, 0.0)
        mask = jnp.asarray(m.astype(np.float32))
    scale = hd ** -0.5
    out = flat_window_attention(qkv, bias, mask, scale, nH)
    # reference: relayout to heads and use the einsum math
    x = qkv.reshape(Bn, N, 3, nH, hd)
    q, k, v = (x[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    ref = _xla_reference(q, k, v, bias, mask, scale)
    ref = ref.transpose(0, 2, 1, 3).reshape(Bn, N, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flat_kernel_masked_block_smaller_than_nW(rng, monkeypatch):
    """Regression: BlockSpec index maps take BLOCK indices, not element
    offsets — with a window block W smaller than the window count nW the
    old map read the wrong (even out-of-bounds) mask blocks, NaN on TPU."""
    import clover_tpu.ops.window_attention as wa

    Bn, nH, N, hd, nW = 32, 2, 12, 16, 8
    C = nH * hd
    qkv = jnp.asarray(rng.normal(size=(Bn, N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.random((nW, N, N)) < 0.3, -100.0, 0.0).astype(np.float32))
    scale = hd ** -0.5
    ref = wa._xla_flat_reference(qkv, bias, mask, scale, nH)
    for W in (nW, 4, 2):        # W == nW and W < nW block shapes
        monkeypatch.setattr(wa, "_pick_window_block_flat",
                            lambda *a, **k: W)
        out = wa.flat_window_attention(qkv, bias, mask, scale, nH)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, err_msg=f"W={W}")
    # and the v2/v4 layouts with W < nW
    x = qkv.reshape(Bn, N, 3, nH, hd)
    q, k, v = (x[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    ref4 = _xla_reference(q, k, v, bias, mask, scale)
    monkeypatch.setattr(wa, "_pick_window_block", lambda *a, **k: 4)
    monkeypatch.setattr(wa, "_pick_window_block_v4", lambda *a, **k: 4)
    for version in ("v2", "v4"):
        out4 = wa._forward_v2(q, k, v, bias, mask, scale, version=version)
        np.testing.assert_allclose(np.asarray(out4), np.asarray(ref4),
                                   atol=2e-5, err_msg=version)


@pytest.mark.parametrize("with_mask", [False, True])
def test_long_flash_kernel_matches_xla(rng, with_mask, monkeypatch):
    """v6 flash kernel: key-tiled running softmax, incl. a partial last
    tile (N=150 vs Tk=128) and the flat-dispatch route for N > gate."""
    import clover_tpu.ops.window_attention as wa

    Bn, nH, N, hd = 4, 2, 150, 16
    C = nH * hd
    qkv = jnp.asarray(rng.normal(size=(Bn, N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    mask = None
    if with_mask:
        m = np.where(rng.random((2, N, N)) < 0.3, -100.0, 0.0)
        mask = jnp.asarray(m.astype(np.float32))
    scale = hd ** -0.5
    ref = wa._xla_flat_reference(qkv, bias, mask, scale, nH)

    out = wa._forward_long_from_flat(qkv, bias, mask, scale, nH)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # v7: flat-qkv key-tiled flash (v5 layout + running softmax)
    out7 = wa._forward_flat_flash(qkv, bias, mask, scale, nH)
    assert out7 is not None
    np.testing.assert_allclose(np.asarray(out7), np.asarray(ref), atol=2e-5)

    # dispatch: N above the short-kernel gate routes to the selected
    # long-window kernel when the opt-in is enabled
    monkeypatch.setattr(wa, "_FLAT_MAX_N", 64)
    for impl in ("v6", "v7"):
        monkeypatch.setattr(wa, "_LONG_IMPL", impl)
        out2 = wa.flat_window_attention(qkv, bias, mask, scale, nH)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                                   atol=2e-5, err_msg=impl)


def test_flat_kernel_gradients_match_xla(rng):
    from clover_tpu.ops.window_attention import flat_window_attention

    Bn, nH, N, hd = 4, 2, 8, 8
    C = nH * hd
    qkv = jnp.asarray(rng.normal(size=(Bn, N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.random((2, N, N)) < 0.3, -100.0, 0.0).astype(np.float32))
    scale = hd ** -0.5

    def loss_fused(qkv, bias, mask):
        return jnp.sum(flat_window_attention(qkv, bias, mask, scale, nH) ** 2)

    def loss_ref(qkv, bias, mask):
        x = qkv.reshape(Bn, N, 3, nH, hd)
        q, k, v = (x[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        out = _xla_reference(q, k, v, bias, mask, scale)
        return jnp.sum(out.transpose(0, 2, 1, 3).reshape(Bn, N, C) ** 2)

    # default path: fused bwd kernel for dqkv/dbias (mask grads are
    # intentionally zero there — masks are trace-time constants)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias, mask)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, bias, mask)
    for gf, gr in zip(g_fused, g_ref[:2]):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)

    # XLA-recompute fallback covers all three grads incl. the mask
    import clover_tpu.ops.window_attention as wa
    orig = wa._BWD_KERNEL
    wa._BWD_KERNEL = False
    try:
        g_xla = jax.grad(loss_fused, argnums=(0, 1, 2))(qkv, bias, mask)
    finally:
        wa._BWD_KERNEL = orig
    for gf, gr in zip(g_xla, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("impl", ["pallas", "pallas_fused", "pallas_flat"])
def test_swin_backbone_pallas_matches_xla(rng, impl):
    """Full backbone parity between attention_impl settings."""
    import dataclasses

    cfg_xla = SwinConfig(patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8,
                         depths=(2,), num_heads=(2,), window_size=(2, 2, 2),
                         drop_path_rate=0.0)
    cfg_pl = dataclasses.replace(cfg_xla, attention_impl=impl)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 3)).astype(np.float32))
    params = SwinTransformer3D(cfg_xla).init(jax.random.PRNGKey(0), x)["params"]
    out_xla = SwinTransformer3D(cfg_xla).apply({"params": params}, x)
    out_pl = SwinTransformer3D(cfg_pl).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("impl", ["pallas", "pallas_fused", "pallas_flat"])
def test_swin_backbone_pallas_grads_match_xla(rng, impl):
    import dataclasses

    cfg_xla = SwinConfig(patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8,
                         depths=(2,), num_heads=(2,), window_size=(2, 2, 2),
                         drop_path_rate=0.0)
    cfg_pl = dataclasses.replace(cfg_xla, attention_impl=impl)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 3)).astype(np.float32))
    params = SwinTransformer3D(cfg_xla).init(jax.random.PRNGKey(0), x)["params"]

    def loss(cfg):
        def f(p):
            return jnp.sum(SwinTransformer3D(cfg).apply({"params": p}, x) ** 2)

        return jax.grad(f)(params)

    g_xla = loss(cfg_xla)
    g_pl = loss(cfg_pl)
    for a, b in zip(jax.tree_util.tree_leaves(g_pl),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("with_mask", [False, True])
def test_grouped_kernel_matches_xla(rng, with_mask):
    """Head-group-tiled flat kernel: forced on by making the all-heads
    picker infeasible; numerics must match the XLA reference."""
    import clover_tpu.ops.window_attention as wa

    Bn, nH, N, hd = 8, 4, 12, 16
    C = nH * hd
    qkv = jnp.asarray(rng.normal(size=(Bn, N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    mask = None
    if with_mask:
        m = np.where(rng.random((4, N, N)) < 0.3, -100.0, 0.0)
        mask = jnp.asarray(m.astype(np.float32))
    scale = hd ** -0.5
    out = wa._forward_flat_grouped(qkv, bias, mask, scale, nH)
    assert out is not None
    ref = wa._xla_flat_reference(qkv, bias, mask, scale, nH)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # picker must split heads: G < nH possible and exact tiling holds
    W, G = wa._pick_group_block_flat(Bn, nH, N, hd, 4, None)
    assert W > 0 and nH % G == 0


def test_grouped_kernel_32frame_stage_shapes(rng):
    """The exact 32-frame eval shapes that fell back to XLA in round 1
    (stage 2: nH=16, stage 3: nH=32 at N=392) must take the grouped
    kernel and match the reference. Uses bf16 like the real eval."""
    import clover_tpu.ops.window_attention as wa

    for Bn, nH, hd, nW in ((8, 16, 32, 4), (4, 32, 32, 1)):
        N = 392
        C = nH * hd
        # all-heads picker must be infeasible, grouped feasible
        assert wa._pick_window_block_flat(Bn, nH, N, hd, 2, nW) == 0
        W, G = wa._pick_group_block_flat(Bn, nH, N, hd, 2, nW)
        assert W > 0, (Bn, nH)
        assert G * hd == 128  # lane-exact stripes
        qkv = jnp.asarray(
            rng.normal(size=(Bn, N, 3 * C)).astype(np.float32) * 0.3
        ).astype(jnp.bfloat16)
        bias = jnp.asarray(
            rng.normal(size=(nH, N, N)).astype(np.float32)).astype(jnp.bfloat16)
        mask = jnp.asarray(np.where(
            rng.random((nW, N, N)) < 0.3, -100.0, 0.0).astype(np.float32))
        scale = hd ** -0.5
        out = wa._forward_flat_grouped(qkv, bias, mask.astype(jnp.bfloat16),
                                       scale, nH)
        assert out is not None
        ref = wa._xla_flat_reference(qkv, bias, mask.astype(jnp.bfloat16),
                                     scale, nH)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=3e-2, rtol=3e-2)


def test_flat_bwd_grouped_matches_xla(rng):
    """Head-grouped fused backward (_backward_flat_grouped) == XLA vjp on a
    shape whose all-heads bwd working set is VMEM-infeasible (the Swin-B
    stage-3 case the r2 train profile showed falling back to per-head XLA
    scatter chains)."""
    import clover_tpu.ops.window_attention as wa

    Bn, nH, N, hd = 4, 8, 8, 8
    C = nH * hd
    qkv = jnp.asarray(rng.normal(size=(Bn, N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.random((2, N, N)) < 0.3, -100.0, 0.0).astype(np.float32))
    scale = hd ** -0.5
    g = jnp.asarray(rng.normal(size=(Bn, N, C)).astype(np.float32))

    def ref_grads(mask_arg):
        def loss(qkv, bias):
            x = qkv.reshape(Bn, N, 3, nH, hd)
            q, k, v = (x[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            out = _xla_reference(q, k, v, bias, mask_arg, scale)
            out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
            return jnp.sum(out * g)

        return jax.grad(loss, argnums=(0, 1))(qkv, bias)

    for mask_arg in (None, mask):
        out = wa._backward_flat_grouped(qkv, bias, mask_arg, scale, nH, g)
        assert out is not None, "grouped bwd should be feasible here"
        dqkv, dbias = out
        dqkv_ref, dbias_ref = ref_grads(mask_arg)
        np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dqkv_ref),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dbias), np.asarray(dbias_ref),
                                   atol=1e-4, rtol=1e-4)


# ------------------------------------------------------------ region lanes
# Shift mask as region one-hot q/k lanes (CLOVER_WA_MASK_LANES): the mask
# rides the QK^T matmul inside the hd->128 lane padding instead of a
# (W, N, N) additive pass. Softmax-equivalent (+100 on-region vs -100
# off-region differ by a per-row constant).


def _real_geometry():
    """A real shifted-window geometry so lanes and mask agree exactly."""
    from clover_tpu.models.swin3d import shift_attn_mask, shift_region_lanes

    size, win, shift = (4, 6, 6), (2, 3, 3), (1, 1, 1)
    mask = shift_attn_mask(size, win, shift)        # (8, 18, 18)
    lanes = shift_region_lanes(size, win, shift)    # (8, 18, nr)
    return jnp.asarray(mask), jnp.asarray(lanes)


def test_region_lanes_reconstruct_mask():
    from clover_tpu.models.swin3d import shift_attn_mask, shift_region_lanes
    from clover_tpu.ops.window_attention import lanes_to_additive

    for size, win, shift in [((4, 6, 6), (2, 3, 3), (1, 1, 1)),
                             ((2, 8, 8), (2, 4, 4), (0, 2, 2)),
                             ((8, 7, 7), (8, 7, 7), (4, 3, 3)),
                             ((8, 14, 14), (8, 7, 7), (4, 3, 3))]:
        mask = shift_attn_mask(size, win, shift)
        lanes = shift_region_lanes(size, win, shift)
        assert lanes.shape[:2] == mask.shape[:2]
        assert lanes.shape[-1] <= 8, "per-window regions bounded by 2^3"
        add = np.asarray(lanes_to_additive(jnp.asarray(lanes)))
        np.testing.assert_allclose(add, mask, atol=1e-6)


def test_flat_kernel_lanes_matches_additive(rng, monkeypatch):
    """flat + grouped forward kernels with lanes vs the additive-mask
    fp32-logit reference."""
    import clover_tpu.ops.window_attention as wa

    mask, lanes = _real_geometry()
    nW, N = mask.shape[:2]
    nH, hd = 2, 16
    C = nH * hd
    Bn = 2 * nW
    qkv = jnp.asarray(rng.normal(size=(Bn, N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    scale = hd ** -0.5
    ref = wa._xla_flat_reference(qkv, bias, mask, scale, nH, fp32_logits=True)

    out = wa.flat_window_attention(qkv, bias, lanes, scale, nH)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    # force the grouped kernel (the 32-frame stages 2-3 shape class)
    monkeypatch.setattr(wa, "_pick_window_block_flat", lambda *a, **k: 0)
    out_g = wa.flat_window_attention(qkv, bias, lanes, scale, nH)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref), atol=1e-4)

    # XLA fallback route (lanes -> additive conversion)
    ref_l = wa._xla_flat_reference(qkv, bias, lanes, scale, nH)
    ref_m = wa._xla_flat_reference(qkv, bias, mask, scale, nH)
    np.testing.assert_allclose(np.asarray(ref_l), np.asarray(ref_m),
                               atol=1e-4)


def test_flat_kernel_lanes_grads_match(rng, monkeypatch):
    """bwd kernels (flat + grouped) with lanes vs additive-mask autodiff."""
    import clover_tpu.ops.window_attention as wa

    mask, lanes = _real_geometry()
    nW, N = mask.shape[:2]
    nH, hd = 2, 16
    C = nH * hd
    Bn = 2 * nW
    qkv = jnp.asarray(rng.normal(size=(Bn, N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    scale = hd ** -0.5
    g = jnp.asarray(rng.normal(size=(Bn, N, C)).astype(np.float32))

    def loss_ref(qkv, bias):
        out = wa._xla_flat_reference(qkv, bias, mask, scale, nH,
                                     fp32_logits=True)
        return jnp.sum(out * g)

    dqkv_ref, dbias_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)

    def loss_lanes(qkv, bias):
        return jnp.sum(wa.flat_window_attention(qkv, bias, lanes, scale, nH)
                       * g)

    for force_grouped in (False, True):
        if force_grouped:
            monkeypatch.setattr(wa, "_pick_window_block_bwd",
                                lambda *a, **k: 0)
        dqkv, dbias = jax.grad(loss_lanes, argnums=(0, 1))(qkv, bias)
        np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dqkv_ref),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"grouped={force_grouped}")
        np.testing.assert_allclose(np.asarray(dbias), np.asarray(dbias_ref),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"grouped={force_grouped}")


def test_attn_block_lanes_matches_additive(rng, monkeypatch):
    """fused half-block (attn_block) with lanes vs additive reference,
    flat and grouped grids."""
    import clover_tpu.ops.attn_block as AB

    monkeypatch.setattr(AB, "_FORCE_PALLAS", True)
    mask, lanes = _real_geometry()
    nW, N = mask.shape[:2]
    nH, hd = 2, 16
    C = nH * hd
    Bn = 2 * nW
    x = jnp.asarray(rng.normal(size=(Bn, N, C)).astype(np.float32) * 0.5)
    ls = jnp.asarray(rng.normal(size=C).astype(np.float32))
    lb = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)).astype(np.float32) * 0.05)
    bqkv = jnp.asarray(rng.normal(size=3 * C).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32) * 0.2)
    wp = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.05)
    bp = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    scale = hd ** -0.5

    ref = AB._xla_reference(x, ls, lb, wqkv, bqkv, bias, mask, wp, bp,
                            scale, 1e-5)
    got = AB.fused_window_attn_block(x, ls, lb, wqkv, bqkv, bias, lanes,
                                     wp, bp, None, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    monkeypatch.setattr(AB, "_pick_w", lambda *a, **k: 0)
    got_g = AB.fused_window_attn_block(x, ls, lb, wqkv, bqkv, bias, lanes,
                                       wp, bp, None, scale)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_no_max_static_shift_softmax(rng, monkeypatch):
    """Static-shift softmax (skip row max): exp(x-s)/sum == exp(x-m)/sum in
    real arithmetic — outputs must match the rowmax path to rounding, for
    lanes, additive-mask, and unmasked kernels."""
    import clover_tpu.ops.window_attention as wa

    mask, lanes = _real_geometry()
    nW, N = mask.shape[:2]
    nH, hd = 2, 16
    C = nH * hd
    Bn = 2 * nW
    qkv = jnp.asarray(rng.normal(size=(Bn, N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    scale = hd ** -0.5
    for m in (None, mask, lanes):
        exact = wa.flat_window_attention(qkv, bias, m, scale, nH, False)
        for mode in (True, "clamp"):
            fast = wa.flat_window_attention(qkv, bias, m, scale, nH, mode)
            np.testing.assert_allclose(
                np.asarray(fast), np.asarray(exact), atol=2e-5,
                err_msg=f"mask={'None' if m is None else m.shape} "
                        f"mode={mode}")

    # clamped mode must stay FINITE on logits far past the eval
    # bounded-logit contract (the bare shift would overflow exp -> NaN)
    big = wa.flat_window_attention(200.0 * qkv, bias, None, scale, nH,
                                   "clamp")
    assert np.isfinite(np.asarray(big)).all()

    # 'auto' mode gates on deterministic: eval passes use the bare static
    # shift; TRAINING passes use the clamped shift (overflow-safe for any
    # logits — see _NO_MAX_MODE)
    monkeypatch.setattr(wa, "_NO_MAX_MODE", "auto")
    assert wa.no_max_enabled(True) is True
    assert wa.no_max_enabled(False) == "clamp"
    monkeypatch.setattr(wa, "_NO_MAX_MODE", "0")
    assert not wa.no_max_enabled(True)
    monkeypatch.setattr(wa, "_NO_MAX_MODE", "1")
    assert wa.no_max_enabled(False) is True


def test_region_lanes_degenerate_window_falls_back_to_additive(rng):
    """nr == N would be shape-ambiguous with the additive form; the
    builder must return the additive mask, and a backbone with such tiny
    windows must still match the XLA path."""
    from clover_tpu.models.swin3d import shift_attn_mask, shift_region_lanes

    size, win, shift = (4, 4, 4), (2, 2, 2), (1, 1, 1)
    lanes = shift_region_lanes(size, win, shift)
    mask = shift_attn_mask(size, win, shift)
    assert lanes.shape == mask.shape          # additive fallback
    np.testing.assert_allclose(lanes, mask)

    import dataclasses

    cfg_flat = SwinConfig(patch_size=(1, 2, 2), stride=(1, 2, 2),
                          embed_dim=8, depths=(2,), num_heads=(2,),
                          window_size=(2, 2, 2), drop_path_rate=0.0,
                          attention_impl="pallas_flat")
    cfg_xla = dataclasses.replace(cfg_flat, attention_impl="xla")
    x = jnp.asarray(rng.normal(size=(1, 3, 4, 8, 8)).astype(np.float32))
    m_flat, m_xla = SwinTransformer3D(cfg_flat), SwinTransformer3D(cfg_xla)
    p = m_flat.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(m_flat.apply(p, x)),
                               np.asarray(m_xla.apply(p, x)),
                               atol=5e-4)


# ------------------------------------------------------------------ flat2
# 2-D flat-in/flat-out kernel: removes the (Bn, N, C) re-tiling around the
# qkv/proj GEMMs when N % 8 != 0 (the 8-frame eval reshape tail).


@pytest.mark.parametrize("mask_form", ["none", "additive", "lanes"])
def test_flat2_kernel_matches_xla(rng, mask_form):
    import clover_tpu.ops.window_attention as wa

    Bn, nH, N, hd, nW = 8, 2, 12, 16, 4        # N % 8 != 0 on purpose
    C = nH * hd
    qkv = jnp.asarray(rng.normal(size=(Bn, N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    if mask_form == "none":
        mask = None
    elif mask_form == "additive":
        mask = jnp.asarray(np.where(rng.random((nW, N, N)) < 0.3,
                                    -100.0, 0.0).astype(np.float32))
    else:
        lanes = np.zeros((nW, N, 3), np.float32)
        regions = rng.integers(0, 3, size=(nW, N))
        lanes[np.arange(nW)[:, None], np.arange(N)[None], regions] = 10.0
        mask = jnp.asarray(lanes)
    scale = hd ** -0.5
    out2 = wa.flat2_window_attention(qkv.reshape(Bn * N, 3 * C), bias, mask,
                                     scale, nH, N)
    assert out2.shape == (Bn * N, C)
    ref_mask = wa.lanes_to_additive(mask) if mask_form == "lanes" else mask
    ref = wa._xla_flat_reference(qkv, bias, ref_mask, scale, nH)
    np.testing.assert_allclose(np.asarray(out2).reshape(Bn, N, C),
                               np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("mask_form", ["none", "additive", "lanes"])
@pytest.mark.parametrize("native_bwd", [True, False])
def test_flat2_kernel_gradients_match_xla(rng, mask_form, native_bwd,
                                          monkeypatch):
    """Gradients through the NATIVE 2-D backward kernel (native_bwd=True)
    and the reshape-pair 3-D fallback must both match the XLA vjp."""
    import clover_tpu.ops.window_attention as wa

    Bn, nH, N, hd, nW = 8, 2, 12, 8, 4
    C = nH * hd
    if not native_bwd:
        monkeypatch.setattr(wa, "_flat2_bwd_feasible", lambda *a, **k: False)
    qkv = jnp.asarray(rng.normal(size=(Bn * N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    if mask_form == "none":
        mask = None
    elif mask_form == "additive":
        mask = jnp.asarray(np.where(rng.random((nW, N, N)) < 0.3,
                                    -100.0, 0.0).astype(np.float32))
    else:
        lanes = np.zeros((nW, N, 3), np.float32)
        regions = rng.integers(0, 3, size=(nW, N))
        lanes[np.arange(nW)[:, None], np.arange(N)[None], regions] = 10.0
        mask = jnp.asarray(lanes)
    ref_mask = wa.lanes_to_additive(mask) if mask_form == "lanes" else mask
    scale = hd ** -0.5

    def loss2(qkv, bias):
        return jnp.sum(
            wa.flat2_window_attention(qkv, bias, mask, scale, nH, N) ** 2)

    def loss_ref(qkv3, bias):
        return jnp.sum(
            wa._xla_flat_reference(qkv3, bias, ref_mask, scale, nH) ** 2)

    g2 = jax.grad(loss2, argnums=(0, 1))(qkv, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1))(qkv.reshape(Bn, N, 3 * C), bias)
    np.testing.assert_allclose(np.asarray(g2[0]).reshape(Bn, N, 3 * C),
                               np.asarray(gr[0]), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(gr[1]),
                               atol=1e-4, rtol=1e-4)


def test_flat2_infeasible_falls_back(rng, monkeypatch):
    """When no 2-D block fits, flat2 must reshape and defer to the 3-D
    path (same values)."""
    import clover_tpu.ops.window_attention as wa

    Bn, nH, N, hd = 4, 2, 12, 16
    C = nH * hd
    qkv = jnp.asarray(rng.normal(size=(Bn * N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    scale = hd ** -0.5
    ref = wa.flat2_window_attention(qkv, bias, None, scale, nH, N)
    monkeypatch.setattr(wa, "_flat2_feasible", lambda *a, **k: False)
    out = wa.flat2_window_attention(qkv, bias, None, scale, nH, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_resident_block_flat2_matches_xla_and_params(rng):
    """Window-resident Swin block with N % 8 != 0 routes attention through
    the 2-D branch; outputs must match the XLA impl and the param tree must
    be checkpoint-identical."""
    import dataclasses

    from clover_tpu.models.swin3d import SwinConfig, SwinTransformer3D

    # window (1, 3, 3) -> N = 9 (not sublane-aligned), resident stages
    cfg_flat = SwinConfig(patch_size=(1, 2, 2), stride=(1, 2, 2),
                          embed_dim=8, depths=(2,), num_heads=(2,),
                          window_size=(1, 3, 3), drop_path_rate=0.0,
                          attention_impl="pallas_flat")
    cfg_xla = dataclasses.replace(cfg_flat, attention_impl="xla")
    x = jnp.asarray(rng.normal(size=(2, 3, 2, 6, 6)).astype(np.float32))
    m_flat, m_xla = SwinTransformer3D(cfg_flat), SwinTransformer3D(cfg_xla)
    p_flat = m_flat.init(jax.random.PRNGKey(0), x)
    p_xla = m_xla.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(p_flat)
            == jax.tree_util.tree_structure(p_xla))
    for a, b in zip(jax.tree_util.tree_leaves(p_flat),
                    jax.tree_util.tree_leaves(p_xla)):
        assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(m_flat.apply(p_flat, x)),
                               np.asarray(m_xla.apply(p_flat, x)),
                               atol=5e-4)


def test_resident_block_flat2_train_grads_match_xla(rng, monkeypatch):
    """TRAINING through the resident flat2 branch (native 2-D bwd kernel):
    parameter gradients must match the XLA attention impl. Pins the
    swin3d gate that routes non-deterministic passes to flat2 only when
    the opt-in knob is set AND flat2_bwd_available holds."""
    import dataclasses

    import clover_tpu.ops.window_attention as wa
    from clover_tpu.models.swin3d import SwinConfig, SwinTransformer3D

    monkeypatch.setattr(wa, "_FLAT2_TRAIN", True)  # CLOVER_WA_FLAT2_TRAIN=1

    cfg_flat = SwinConfig(patch_size=(1, 2, 2), stride=(1, 2, 2),
                          embed_dim=8, depths=(2,), num_heads=(2,),
                          window_size=(1, 3, 3), drop_path_rate=0.0,
                          attention_impl="pallas_flat")
    cfg_xla = dataclasses.replace(cfg_flat, attention_impl="xla")
    x = jnp.asarray(rng.normal(size=(2, 3, 2, 6, 6)).astype(np.float32))
    m_flat, m_xla = SwinTransformer3D(cfg_flat), SwinTransformer3D(cfg_xla)
    p = m_flat.init(jax.random.PRNGKey(0), x)

    def loss(model):
        def f(params):
            out = model.apply(params, x, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(7)})
            return jnp.sum(out ** 2)
        return f

    g_flat = jax.grad(loss(m_flat))(p)
    g_xla = jax.grad(loss(m_xla))(p)
    flat_leaves, treedef = jax.tree_util.tree_flatten(g_flat)
    xla_leaves = treedef.flatten_up_to(g_xla)
    for a, b in zip(flat_leaves, xla_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("no_max", [True, "clamp"])
def test_flat_kernel_gradients_no_max_modes(rng, no_max):
    """The fused bwd kernels mirror the forward's static-shift / clamp
    softmax (r3 delta-trick core, _bwd_softmax_core): gradients through
    flat_window_attention(no_max=...) equal the true-row-max gradients —
    the shift is a per-row constant, so the softmax (and its vjp) is the
    same function. Covers the bare mask-less path (shift 30) and the
    region-lanes path (shift 130)."""
    from clover_tpu.ops.window_attention import flat_window_attention

    Bn, nH, N, hd = 4, 2, 8, 8
    C = nH * hd
    qkv = jnp.asarray(rng.normal(size=(Bn, N, 3 * C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
    regions = rng.integers(0, 3, size=(2, N))
    lanes = np.zeros((2, N, 8), np.float32)
    for w in range(2):
        for n in range(N):
            lanes[w, n, regions[w, n]] = 10.0
    lanes = jnp.asarray(lanes)
    scale = hd ** -0.5

    def loss(qkv, bias, mask, nm):
        return jnp.sum(
            flat_window_attention(qkv, bias, mask, scale, nH, no_max=nm) ** 2)

    for mask in (None, lanes):
        g = jax.grad(loss, argnums=(0, 1))(qkv, bias, mask, no_max)
        g_ref = jax.grad(loss, argnums=(0, 1))(qkv, bias, mask, False)
        for a, b in zip(g, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


def test_flat2_grouped_bwd_matches_3d(rng):
    """The grouped WINDOW-BATCHED 2-D backward (r3: 3-D scratch
    normalization + W-batched dots) matches the 3-D fused bwd on dqkv and
    dbias, with and without region lanes."""
    import clover_tpu.ops.window_attention as wa

    for (Bn, nH, N, hd, use_lanes) in ((8, 4, 12, 32, False),
                                       (8, 4, 12, 32, True),
                                       (4, 8, 20, 32, False)):
        C = nH * hd
        qkv = jnp.asarray(rng.normal(size=(Bn * N, 3 * C)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(Bn * N, C)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
        mask = None
        if use_lanes:
            nW = 4
            lanes = np.zeros((nW, N, 8), np.float32)
            for w in range(nW):
                lanes[w, np.arange(N), rng.integers(0, 3, N)] = 10.0
            mask = jnp.asarray(lanes)
        out = wa._backward_flat2_grouped(qkv, bias, mask, 0.3, nH, N, g)
        assert out is not None, "grouped 2-D bwd did not fire"
        dq1, db1 = out
        dqr, dbr = wa._backward_flat(qkv.reshape(Bn, N, 3 * C), bias, mask,
                                     0.3, nH, g.reshape(Bn, N, C))
        np.testing.assert_allclose(
            np.asarray(dq1).reshape(Bn, N, 3 * C), np.asarray(dqr),
            rtol=3e-5, atol=3e-5)
        np.testing.assert_allclose(np.asarray(db1), np.asarray(dbr),
                                   rtol=3e-5, atol=3e-5)


class TestLogitDebugDiagnostic:
    """CLOVER_WA_DEBUG=1 logit-bound diagnostic: the clamp-mode softmax
    distorts silently past static_shift + 80 (window_attention._NO_MAX
    contract); the debug flag must surface max shifted logit per path tag
    and warn the moment the half-width is exceeded."""

    def _mk(self, rng, Bn=4, nH=2, N=12, hd=16, qscale=1.0):
        C = nH * hd
        qkv = rng.normal(size=(Bn, N, 3 * C)).astype(np.float32)
        qkv[:, :, :C] *= qscale
        bias = rng.normal(size=(nH, N, N)).astype(np.float32)
        return jnp.asarray(qkv), jnp.asarray(bias)

    def test_bounded_records_no_warning(self, rng, monkeypatch):
        import warnings

        import clover_tpu.ops.window_attention as wa

        monkeypatch.setattr(wa, "_WA_DEBUG", True)
        wa.reset_logit_debug()
        qkv, bias = self._mk(rng)
        with warnings.catch_warnings():
            warnings.simplefilter("error")   # any warning -> failure
            out = wa.flat_window_attention(qkv, bias, None, 0.25, 2,
                                           no_max="clamp")
            np.asarray(out)
            jax.effects_barrier()
        tag = "flat:nH2,N12"
        assert tag in wa.LOGIT_DEBUG_WORST
        # value == max(q.kT.scale + bias) - 30, computed independently
        q = np.asarray(qkv[:, :, :32]).reshape(4, 12, 2, 16)
        k = np.asarray(qkv[:, :, 32:64]).reshape(4, 12, 2, 16)
        logits = np.einsum("bnhd,bmhd->bhnm", q * 0.25, k) + np.asarray(bias)
        assert wa.LOGIT_DEBUG_WORST[tag] == pytest.approx(
            logits.max() - 30.0, abs=1e-3)
        assert wa.LOGIT_DEBUG_WORST[tag] < wa.CLAMP_HALF_WIDTH

    def test_diverged_logits_warn(self, rng, monkeypatch):
        import clover_tpu.ops.window_attention as wa

        monkeypatch.setattr(wa, "_WA_DEBUG", True)
        wa.reset_logit_debug()
        qkv, bias = self._mk(rng, qscale=200.0)   # drives logits past +110
        with pytest.warns(RuntimeWarning, match="DISTORTING"):
            out = wa.flat_window_attention(qkv, bias, None, 0.25, 2,
                                           no_max="clamp")
            np.asarray(out)
            jax.effects_barrier()
        assert wa.LOGIT_DEBUG_WORST["flat:nH2,N12"] > wa.CLAMP_HALF_WIDTH

    def test_lanes_and_additive_frames_agree(self, rng, monkeypatch):
        """The lanes kernels run logits+100·δ with shift 130; the check
        uses the additive frame with shift 30 — the recorded shifted arg
        must be identical for both mask forms."""
        import clover_tpu.ops.window_attention as wa

        monkeypatch.setattr(wa, "_WA_DEBUG", True)
        wa.reset_logit_debug()
        qkv, bias = self._mk(rng)
        nW, N = 4, 12
        onehot = (rng.random((nW, N, 2)) < 0.5).astype(np.float32)
        onehot[..., 1] = 1.0 - onehot[..., 0]
        lanes = jnp.asarray(10.0 * onehot)
        additive = wa.lanes_to_additive(lanes)
        wa.debug_logit_check(qkv, bias, lanes, 0.25, 2, tag="lanes")
        wa.debug_logit_check(qkv, bias, additive, 0.25, 2, tag="additive")
        jax.effects_barrier()
        assert wa.LOGIT_DEBUG_WORST["lanes"] == pytest.approx(
            wa.LOGIT_DEBUG_WORST["additive"], abs=1e-3)

    def test_fused_block_path_instrumented(self, rng, monkeypatch):
        """The training hot path (attn_block fused half) must emit the
        diagnostic too — it recomputes LN+qkv in XLA under the flag."""
        import clover_tpu.ops.attn_block as ab
        import clover_tpu.ops.window_attention as wa

        monkeypatch.setattr(wa, "_WA_DEBUG", True)
        wa.reset_logit_debug()
        Bn, N, C, nH = 4, 12, 32, 2
        x = jnp.asarray(rng.normal(size=(Bn, N, C)).astype(np.float32))
        ln_s = jnp.ones((C,), jnp.float32)
        ln_b = jnp.zeros((C,), jnp.float32)
        wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)).astype(np.float32) * .1)
        bqkv = jnp.zeros((3 * C,), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(nH, N, N)).astype(np.float32))
        wproj = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * .1)
        bproj = jnp.zeros((C,), jnp.float32)
        out = ab.fused_window_attn_block(x, ln_s, ln_b, wqkv, bqkv, bias,
                                         None, wproj, bproj, None,
                                         C ** -0.5, 1e-5, no_max="clamp")
        np.asarray(out)
        jax.effects_barrier()
        assert f"fused_block:nH{nH},N{N}" in wa.LOGIT_DEBUG_WORST

    def test_off_by_default(self, rng):
        import clover_tpu.ops.window_attention as wa

        wa.reset_logit_debug()
        qkv, bias = self._mk(rng)
        out = wa.flat_window_attention(qkv, bias, None, 0.25, 2,
                                       no_max="clamp")
        np.asarray(out)
        jax.effects_barrier()
        assert wa.LOGIT_DEBUG_WORST == {}
