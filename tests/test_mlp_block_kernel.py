"""Fused LN+MLP+residual kernel: parity vs the unfused flax block."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clover_tpu.ops.mlp_block as MB
from clover_tpu.models.swin3d import SwinConfig, SwinTransformer3D


@pytest.mark.parametrize("rows,C,H,dtype", [
    (64, 128, 512, jnp.float32),
    (40, 96, 384, jnp.float32),      # rows not a block multiple
    (32, 256, 1024, jnp.bfloat16),
])
def test_kernel_matches_reference(rows, C, H, dtype, monkeypatch):
    monkeypatch.setattr(MB, "_FORCE_PALLAS", True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, C)) * 0.5, dtype)
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    got = MB.fused_ln_mlp_residual(x, scale, bias, w1, b1, w2, b2)
    ref = MB._xla_reference(x, scale, bias, w1, b1, w2, b2, None, 1e-5)
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_kernel_chunked_hidden(monkeypatch):
    """Hidden-dim tiling (n_chunks > 1) accumulates correctly."""
    monkeypatch.setattr(MB, "_FORCE_PALLAS", True)
    monkeypatch.setattr(MB, "_pick_tiles", lambda rows, C, H, i, budget=0: (16, H // 4))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(48, 64)).astype(np.float32))
    args = [jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
            for s in [64, 64, (64, 256), 256, (256, 64), 64]]
    got = MB.fused_ln_mlp_residual(x, *args)
    ref = MB._xla_reference(x, *args, None, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_swin_block_fused_mlp_parity():
    """SwinTransformer3D(fused_mlp=True) == default, same param tree."""
    cfg = SwinConfig(patch_size=(1, 2, 2), stride=(1, 2, 2), embed_dim=16,
                     depths=(1, 1), num_heads=(2, 2), window_size=(2, 2, 2),
                     drop_path_rate=0.0)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 2, 8, 8, 3)),
                    jnp.float32)
    model = SwinTransformer3D(cfg)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)

    fused = SwinTransformer3D(dataclasses.replace(cfg, fused_mlp=True))
    params_f = fused.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree_util.tree_structure(params_f)
            == jax.tree_util.tree_structure(params))
    out = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_swin_block_fused_mlp_grads():
    cfg = SwinConfig(patch_size=(1, 2, 2), stride=(1, 2, 2), embed_dim=8,
                     depths=(1,), num_heads=(2,), window_size=(2, 2, 2),
                     drop_path_rate=0.0, fused_mlp=True)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 2, 4, 4, 3)),
                    jnp.float32)
    model = SwinTransformer3D(cfg)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    blk = grads["stage_0_block_0"]
    assert float(np.abs(np.asarray(blk["mlp"]["fc1"]["kernel"])).max()) > 0
    assert float(np.abs(np.asarray(blk["norm2"]["scale"])).max()) > 0


@pytest.mark.parametrize("rows,C,H,dtype", [
    (64, 128, 512, jnp.float32),
    (40, 96, 384, jnp.float32),
    (32, 256, 1024, jnp.bfloat16),
])
def test_postln_kernel_matches_reference(rows, C, H, dtype, monkeypatch):
    monkeypatch.setattr(MB, "_FORCE_PALLAS", True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, C)) * 0.5, dtype)
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    got = MB.fused_mlp_postln(x, scale, bias, w1, b1, w2, b2, 1e-12)
    ref = MB._xla_reference_postln(x, scale, bias, w1, b1, w2, b2, 1e-12)
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_postln_kernel_chunked_and_grads(monkeypatch):
    monkeypatch.setattr(MB, "_FORCE_PALLAS", True)
    monkeypatch.setattr(MB, "_pick_tiles",
                        lambda rows, C, H, i, budget=0: (16, H // 4))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(48, 64)).astype(np.float32))
    args = [jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
            for s in [64, 64, (64, 256), 256, (256, 64), 64]]
    got = MB.fused_mlp_postln(x, *args, 1e-12)
    ref = MB._xla_reference_postln(x, *args, 1e-12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    g1 = jax.grad(lambda a: jnp.sum(MB.fused_mlp_postln(a, *args, 1e-12) ** 2))(x)
    g2 = jax.grad(lambda a: jnp.sum(
        MB._xla_reference_postln(a, *args, 1e-12) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_bert_layer_fused_matches_unfused(monkeypatch):
    """BertLayer with the fused post-LN MLP kernel == the unfused graph."""
    import clover_tpu.models.bert as bert_mod
    from clover_tpu.models.bert import BertConfig, BertLayer

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     hidden_dropout=0.0, attention_dropout=0.0)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 6, 32)).astype(np.float32))
    layer = BertLayer(cfg)
    params = layer.init(jax.random.PRNGKey(0), x, None)["params"]

    monkeypatch.setattr(bert_mod, "_BERT_FUSED_MLP", True)
    out_fused = layer.apply({"params": params}, x, None, deterministic=True)
    monkeypatch.setattr(bert_mod, "_BERT_FUSED_MLP", False)
    out_ref = layer.apply({"params": params}, x, None, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    # param tree identical whichever path init took
    p2 = layer.init(jax.random.PRNGKey(0), x, None)["params"]
    assert (jax.tree_util.tree_structure(p2)
            == jax.tree_util.tree_structure(params))


@pytest.mark.parametrize("with_rs,ragged", [(False, False), (True, False),
                                            (False, True), (True, True)])
def test_bwd_kernels_match_xla_grads(with_rs, ragged, monkeypatch):
    """Fused backward (dx kernel + weight-grad kernel) vs jax.vjp of the
    XLA reference, incl. partial row blocks and hidden chunking."""
    monkeypatch.setattr(MB, "_FORCE_PALLAS", True)
    monkeypatch.setattr(MB, "_BWD_KERNEL", True)
    monkeypatch.setattr(MB, "_pick_tiles_bwd",
                        lambda rows, C, H, i: (16, H // 4))
    rng = np.random.default_rng(3)
    rows = 44 if ragged else 48          # 44 % 16 != 0 -> masked tail rows
    C, H = 64, 256
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    rs = (jnp.asarray((rng.random(rows) > 0.3).astype(np.float32) / 0.7)
          if with_rs else None)
    g = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32))

    args = (x, scale, bias, w1, b1, w2, b2)

    def loss_fused(*a):
        return jnp.vdot(MB.fused_ln_mlp_residual(*a, rs), g)

    def loss_ref(*a):
        return jnp.vdot(MB._xla_reference(*a, rs, 1e-5), g)

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ["dx", "dscale", "dbias", "dw1", "db1", "dw2", "db2"]
    for n, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)
    if with_rs:
        grs_f = jax.grad(
            lambda r: jnp.vdot(MB.fused_ln_mlp_residual(*args, r), g))(rs)
        grs_r = jax.grad(
            lambda r: jnp.vdot(MB._xla_reference(*args, r, 1e-5), g))(rs)
        np.testing.assert_allclose(np.asarray(grs_f), np.asarray(grs_r),
                                   rtol=2e-4, atol=2e-4, err_msg="drs")


@pytest.mark.parametrize("mode", ["erf", "tanh"])
@pytest.mark.parametrize("with_rs", [False, True])
def test_explicit_backward_matches_f32_vjp(mode, with_rs):
    """The default bf16-operand backward (_xla_backward, r3 — replaces the
    jax.vjp whose dh/dW2 dots compiled as f32 GEMMs) must match the
    f32-cotangent vjp to bf16-rounding tolerance, for both gelu modes,
    with and without the DropPath row scale."""
    rng = np.random.default_rng(7)
    rows, C, H = 52, 64, 256
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    rs = (jnp.asarray((rng.random(rows) > 0.3).astype(np.float32) / 0.7)
          if with_rs else None)
    g = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32))

    got = MB._xla_backward(x, scale, bias, w1, b1, w2, b2, rs, 1e-5, mode, g)

    if with_rs:
        _, vjp = jax.vjp(lambda *a: MB._xla_reference(*a, 1e-5, mode),
                         x, scale, bias, w1, b1, w2, b2, rs)
        ref = vjp(g)
    else:
        _, vjp = jax.vjp(lambda *a: MB._xla_reference(*a, None, 1e-5, mode),
                         x, scale, bias, w1, b1, w2, b2)
        ref = vjp(g) + (None,)
    names = ["dx", "dscale", "dbias", "dw1", "db1", "dw2", "db2", "drs"]
    for n, a, b in zip(names, got, ref):
        if b is None:
            assert a is None, n
            continue
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        den = max(1.0, float(np.max(np.abs(b))))
        np.testing.assert_allclose(a / den, b / den, rtol=0, atol=4e-3,
                                   err_msg=n)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_explicit_postln_backward_matches_f32_vjp(dtype, monkeypatch):
    """The post-LN (BERT/fusion) explicit bf16-operand backward must match
    the f32-cotangent vjp to bf16-rounding tolerance (same contract as the
    pre-LN _xla_backward test above). bf16 inputs exercise the astype(dt)
    casts this backward exists for (f32 makes them no-ops); tolerance is
    per-dtype (bf16 measures ~0.6% normalized — rounding, not math).
    Pins the exact-recompute branch (knob-off); the now-default bf16-HBM
    branch is covered at its own tolerance by test_bwd_hbm_bf16_knob_parity."""
    monkeypatch.setattr(MB, "_BWD_HBM_BF16", False)
    rng = np.random.default_rng(11)
    rows, C, H = 48, 64, 256
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32)).astype(dtype)
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32)).astype(dtype)

    got = MB._xla_backward_postln(x, scale, bias, w1, b1, w2, b2, 1e-12, g)
    _, vjp = jax.vjp(lambda *a: MB._xla_reference_postln(*a, 1e-12),
                     x, scale, bias, w1, b1, w2, b2)
    ref = vjp(g)
    names = ["dx", "dscale", "dbias", "dw1", "db1", "dw2", "db2"]
    atol = 4e-3 if dtype == jnp.float32 else 1.2e-2
    for n, a, b in zip(names, got, ref):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        den = max(1.0, float(np.max(np.abs(b))))
        np.testing.assert_allclose(a / den, b / den, rtol=0, atol=atol,
                                   err_msg=n)


def test_postln_explicit_backward_is_default_vjp():
    """fused_mlp_postln's grad path goes through _xla_backward_postln by
    default: no f32-operand dots in the lowered grad HLO (postln analog of
    test_explicit_backward_is_default_vjp)."""
    rng = np.random.default_rng(13)
    rows, C, H = 32, 64, 128
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(jnp.bfloat16))
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.zeros(C, np.float32)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.1)
    b1 = jnp.zeros(H, np.float32)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b2 = jnp.zeros(C, np.float32)

    def loss(w1_, w2_):
        return jnp.sum(MB.fused_mlp_postln(
            x, scale, bias, w1_, b1, w2_, b2).astype(jnp.float32))

    txt = jax.jit(jax.grad(loss, argnums=(0, 1))).lower(w1, w2).as_text()
    import re
    dots = re.findall(r"stablehlo\.dot_general[^\n]*: \(([^)]*)\)", txt)
    assert dots, "no dot_general found in lowered grad HLO"
    for operands in dots:
        lhs, rhs = operands.split(",")[0], operands.split(",")[1]
        assert "tensor<f32" not in lhs and "tensor<f32" not in rhs, (
            f"f32-operand dot in lowered grad HLO: ({operands})")


@pytest.mark.parametrize("postln", [False, True])
def test_bwd_hbm_bf16_knob_parity(postln, monkeypatch):
    """CLOVER_MLP_BWD_HBM=bf16 (env-read at import; CI never exercises the
    True branch without this) must stay within bf16-rounding tolerance of
    the f32-cotangent vjp on bf16 inputs — including the post-LN case where
    the rounded zpre shifts the recomputed LN statistics (so dscale/dbias/dx
    also carry the rounding; see _xla_backward_postln docstring)."""
    monkeypatch.setattr(MB, "_BWD_HBM_BF16", True)
    rng = np.random.default_rng(17)
    rows, C, H = 40, 64, 256
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32)).astype(dt)
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32)).astype(dt)

    if postln:
        got = MB._xla_backward_postln(x, scale, bias, w1, b1, w2, b2,
                                      1e-12, g)
        _, vjp = jax.vjp(lambda *a: MB._xla_reference_postln(*a, 1e-12),
                         x, scale, bias, w1, b1, w2, b2)
        ref = vjp(g)
    else:
        got = MB._xla_backward(x, scale, bias, w1, b1, w2, b2, None, 1e-5,
                               "erf", g)[:7]
        _, vjp = jax.vjp(lambda *a: MB._xla_reference(*a, None, 1e-5, "erf"),
                         x, scale, bias, w1, b1, w2, b2)
        ref = vjp(g)
    names = ["dx", "dscale", "dbias", "dw1", "db1", "dw2", "db2"]
    for n, a, b in zip(names, got, ref):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        den = max(1.0, float(np.max(np.abs(b))))
        np.testing.assert_allclose(a / den, b / den, rtol=0, atol=1.5e-2,
                                   err_msg=n)


def test_explicit_backward_is_default_vjp():
    """fused_ln_mlp_residual's grad path goes through _xla_backward by
    default (no f32-operand GEMMs in the lowered HLO)."""
    rng = np.random.default_rng(9)
    rows, C, H = 32, 64, 128
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(jnp.bfloat16))
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.zeros(C, np.float32)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.1)
    b1 = jnp.zeros(H, np.float32)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b2 = jnp.zeros(C, np.float32)

    def loss(w1_, w2_):
        return jnp.sum(MB.fused_ln_mlp_residual(
            x, scale, bias, w1_, b1, w2_, b2).astype(jnp.float32))

    txt = jax.jit(jax.grad(loss, argnums=(0, 1))).lower(w1, w2).as_text()
    # every dot's lhs AND rhs must be bf16 (f32 accumulate output allowed)
    import re
    dots = re.findall(r"stablehlo\.dot_general[^\n]*: \(([^)]*)\)", txt)
    assert dots, "no dot_general found in lowered grad HLO"
    for operands in dots:
        lhs, rhs = operands.split(",")[0], operands.split(",")[1]
        assert "tensor<f32" not in lhs and "tensor<f32" not in rhs, (
            f"f32-operand dot in lowered grad HLO: ({operands})")


@pytest.mark.parametrize("mode", ["erf", "tanh"])
@pytest.mark.parametrize("with_rs,ragged", [(False, False), (True, True)])
def test_onepass_bwd_matches_xla_grads(mode, with_rs, ragged, monkeypatch):
    """One-pass fused backward (full-H resident, grid over row blocks)
    vs the explicit XLA backward, incl. masked tail rows and DropPath."""
    monkeypatch.setattr(MB, "_FORCE_PALLAS", True)
    monkeypatch.setattr(MB, "_BWD_ONEPASS", "auto")
    monkeypatch.setattr(MB, "_pick_rows_onepass", lambda rows, C, H, i: 16)
    rng = np.random.default_rng(11)
    rows = 44 if ragged else 48
    C, H = 64, 256
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    rs = (jnp.asarray((rng.random(rows) > 0.3).astype(np.float32) / 0.7)
          if with_rs else None)
    g = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32))

    got = MB._backward_onepass(x, scale, bias, w1, b1, w2, b2, rs, 1e-5,
                               mode, g)
    assert got is not None
    ref = MB._xla_backward(x, scale, bias, w1, b1, w2, b2, rs, 1e-5, mode, g)
    names = ["dx", "dscale", "dbias", "dw1", "db1", "dw2", "db2", "drs"]
    for n, a, b in zip(names, got, ref):
        if b is None:
            assert a is None, n
            continue
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_postln_dropout_matches_reference(dtype, monkeypatch):
    """fused_mlp_postln_dropout (kernel, interpret on CPU) == the XLA
    reference with the same mask, for f32 and bf16 operands."""
    monkeypatch.setattr(MB, "_FORCE_PALLAS", True)
    rng = np.random.default_rng(21)
    rows, C, H = 48, 64, 256
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32)).astype(dtype)
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    m = jnp.asarray((rng.random((rows, C)) > 0.1).astype(np.float32) / 0.9)

    got = MB.fused_mlp_postln_dropout(x, scale, bias, w1, b1, w2, b2, m)
    ref = MB._xla_reference_postln_mask(x, scale, bias, w1, b1, w2, b2,
                                        m, 1e-12)
    atol = 2e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=atol)


def test_postln_dropout_equals_unfused_bertlayer_math():
    """With the same mask, the dropout-kernel math == the unfused flax
    path (dense -> gelu -> dense -> mask-mul -> residual -> LN)."""
    rng = np.random.default_rng(23)
    rows, C, H = 32, 64, 128
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.1)
    b1 = jnp.zeros(H, np.float32)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    keep = 0.9
    m = jnp.asarray((rng.random((rows, C)) > (1 - keep)).astype(np.float32)
                    / keep)

    got = MB.fused_mlp_postln_dropout(x, scale, bias, w1, b1, w2, b2, m)

    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    y = (h @ w2 + b2) * m                      # nn.Dropout placement
    z = x + y
    mean = z.mean(-1, keepdims=True)
    var = ((z - mean) ** 2).mean(-1, keepdims=True)
    ref = (z - mean) * jax.lax.rsqrt(var + 1e-12) * scale + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_postln_dropout_backward_matches_f32_vjp(dtype, monkeypatch):
    # Exact-recompute branch pinned (knob-off); the default bf16-HBM branch
    # has its own tolerance in test_bwd_hbm_bf16_knob_parity.
    monkeypatch.setattr(MB, "_BWD_HBM_BF16", False)
    rng = np.random.default_rng(29)
    rows, C, H = 40, 64, 256
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32)).astype(dtype)
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    m = jnp.asarray((rng.random((rows, C)) > 0.1).astype(np.float32) / 0.9)
    g = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32)).astype(dtype)

    got = MB._xla_backward_postln_mask(x, scale, bias, w1, b1, w2, b2, m,
                                       1e-12, g)
    _, vjp = jax.vjp(lambda *a: MB._xla_reference_postln_mask(*a, 1e-12),
                     x, scale, bias, w1, b1, w2, b2, m)
    ref = vjp(g)
    names = ["dx", "dscale", "dbias", "dw1", "db1", "dw2", "db2", "dm"]
    atol = 4e-3 if dtype == jnp.float32 else 1.2e-2
    for n, a, b in zip(names, got, ref):
        if n == "dm":
            continue   # mask grad is zero by contract (trace constant)
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        den = max(1.0, float(np.max(np.abs(b))))
        np.testing.assert_allclose(a / den, b / den, rtol=0, atol=atol,
                                   err_msg=n)


def test_bertlayer_fused_train_matches_unfused(monkeypatch):
    """CLOVER_BERT_MLP_TRAIN: a training BertLayer forward with the fused
    dropout kernel matches the unfused flax path EXACTLY when dropout=0,
    and param trees are identical either way."""
    import clover_tpu.models.bert as bert_mod
    from clover_tpu.models.bert import BertConfig, BertLayer

    cfg = BertConfig(hidden_size=32, num_attention_heads=2,
                     intermediate_size=64, num_hidden_layers=1,
                     hidden_dropout=0.0, attention_dropout=0.0)
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
    attn_bias = jnp.zeros((2, 1, 1, 10), jnp.float32)

    layer = BertLayer(cfg)
    params = layer.init(jax.random.PRNGKey(0), x, attn_bias)

    monkeypatch.setattr(bert_mod, "_BERT_FUSED_MLP_TRAIN", True)
    out_fused = layer.apply(params, x, attn_bias, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
    monkeypatch.setattr(bert_mod, "_BERT_FUSED_MLP_TRAIN", False)
    out_unfused = layer.apply(params, x, attn_bias, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_unfused), atol=2e-5)


def test_bertlayer_fused_train_dropout_stats(monkeypatch):
    """With dropout>0 the fused train path produces a mask of the right
    rate and scale (mean preserved, ~p zeros on the mlp residual)."""
    import clover_tpu.models.bert as bert_mod
    from clover_tpu.models.bert import BertConfig, BertLayer

    cfg = BertConfig(hidden_size=64, num_attention_heads=2,
                     intermediate_size=128, num_hidden_layers=1,
                     hidden_dropout=0.5, attention_dropout=0.0)
    rng = np.random.default_rng(37)
    x = jnp.asarray(rng.normal(size=(4, 16, 64)).astype(np.float32))
    attn_bias = jnp.zeros((4, 1, 1, 16), jnp.float32)
    layer = BertLayer(cfg)
    params = layer.init(jax.random.PRNGKey(0), x, attn_bias)

    monkeypatch.setattr(bert_mod, "_BERT_FUSED_MLP_TRAIN", True)
    outs = [np.asarray(layer.apply(params, x, attn_bias,
                                   deterministic=False,
                                   rngs={"dropout": jax.random.PRNGKey(s)}))
            for s in range(8)]
    det = np.asarray(layer.apply(params, x, attn_bias, deterministic=True))
    # dropout must change the output per seed, and average toward the
    # deterministic output (unbiased 1/keep scaling)
    assert not np.allclose(outs[0], outs[1])
    err_one = np.abs(outs[0] - det).mean()
    err_avg = np.abs(np.mean(outs, axis=0) - det).mean()
    assert err_avg < err_one * 0.6


def test_bertlayer_fused_train_auto_row_gate(monkeypatch):
    """CLOVER_BERT_MLP_TRAIN=auto takes the fused dropout kernel only for
    layers with >= _FUSED_TRAIN_MIN_ROWS tokens (fusion towers), leaving
    small text-tower layers on the unfused flax path (the r4 all-towers
    A/B measured the small shapes to lose — bert.py gate comment)."""
    import clover_tpu.models.bert as bert_mod
    import clover_tpu.ops.mlp_block as MBmod
    from clover_tpu.models.bert import BertConfig, BertLayer

    calls = []
    real = MBmod.fused_mlp_postln_dropout

    def spy(*a, **k):
        calls.append(a[0].shape)
        return real(*a, **k)

    monkeypatch.setattr(MBmod, "fused_mlp_postln_dropout", spy)
    monkeypatch.setattr(bert_mod, "_BERT_FUSED_MLP_TRAIN", "auto")
    monkeypatch.setattr(bert_mod, "_FUSED_TRAIN_MIN_ROWS", 64)

    cfg = BertConfig(hidden_size=32, num_attention_heads=2,
                     intermediate_size=64, num_hidden_layers=1,
                     hidden_dropout=0.1, attention_dropout=0.0)
    rng = np.random.default_rng(41)
    layer = BertLayer(cfg)

    # 4*32 = 128 rows >= 64 -> fused
    x_big = jnp.asarray(rng.normal(size=(4, 32, 32)).astype(np.float32))
    bias_big = jnp.zeros((4, 1, 1, 32), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x_big, bias_big)
    layer.apply(params, x_big, bias_big, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)})
    assert calls == [(128, 32)]

    # 2*10 = 20 rows < 64 -> unfused flax path (no new spy call)
    x_small = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
    bias_small = jnp.zeros((2, 1, 1, 10), jnp.float32)
    layer.apply(params, x_small, bias_small, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)})
    assert calls == [(128, 32)]


@pytest.mark.parametrize("mode", ["erf", "tanh"])
@pytest.mark.parametrize("with_rs", [False, True])
@pytest.mark.parametrize("kernel", [False, True])
def test_stash_backward_matches_f32_vjp(mode, with_rs, kernel, monkeypatch):
    """CLOVER_MLP_STASH: the forward emits z (bf16) + LN stats and the
    backward consumes them instead of recomputing LN+fc1 (VERDICT r4
    item 1). Grads must match the f32-cotangent vjp of the XLA reference
    to the same bf16-order tolerance as the recompute backward — with
    the stash coming from the pallas kernel (interpret) AND from the XLA
    fallback, chunked hidden, ragged rows, both gelu modes, +- DropPath."""
    if kernel:
        monkeypatch.setattr(MB, "_FORCE_PALLAS", True)
        monkeypatch.setattr(
            MB, "_pick_tiles",
            lambda rows, C, H, i, budget=None, mask=False, stash=False:
            (16, H // 4))
    monkeypatch.setattr(MB, "_STASH", True)
    rng = np.random.default_rng(11)
    rows, C, H = 44, 64, 256                  # 44 % 16 != 0 -> ragged tail
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    rs = (jnp.asarray((rng.random(rows) > 0.3).astype(np.float32) / 0.7)
          if with_rs else None)
    g = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32))
    args = (x, scale, bias, w1, b1, w2, b2)

    def loss_fused(*a):
        return jnp.vdot(MB.fused_ln_mlp_residual(*a, rs, 1e-5, mode), g)

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    if with_rs:
        _, vjp = jax.vjp(lambda *a: MB._xla_reference(*a, 1e-5, mode),
                         x, scale, bias, w1, b1, w2, b2, rs)
        ref = vjp(g)
    else:
        _, vjp = jax.vjp(lambda *a: MB._xla_reference(*a, None, 1e-5, mode),
                         x, scale, bias, w1, b1, w2, b2)
        ref = vjp(g)
    names = ["dx", "dscale", "dbias", "dw1", "db1", "dw2", "db2"]
    for n, a, b in zip(names, gf, ref[:7]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        den = max(1.0, float(np.max(np.abs(b))))
        np.testing.assert_allclose(a / den, b / den, rtol=0, atol=5e-3,
                                   err_msg=n)
    if with_rs:
        grs = jax.grad(
            lambda r: jnp.vdot(
                MB.fused_ln_mlp_residual(*args, r, 1e-5, mode), g))(rs)
        den = max(1.0, float(np.max(np.abs(np.asarray(ref[7])))))
        np.testing.assert_allclose(np.asarray(grs) / den,
                                   np.asarray(ref[7]) / den,
                                   rtol=0, atol=5e-3, err_msg="drs")


def test_stash_forward_unchanged(monkeypatch):
    """Stash mode must not change the primal forward (the extra outputs
    ride along; out itself is bit-identical in interpret mode)."""
    monkeypatch.setattr(MB, "_FORCE_PALLAS", True)
    monkeypatch.setattr(
        MB, "_pick_tiles",
        lambda rows, C, H, i, budget=None, mask=False, stash=False:
        (16, H // 2))
    rng = np.random.default_rng(5)
    rows, C, H = 48, 64, 256
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    plain = MB._forward(x, scale, bias, w1, b1, w2, b2, None, 1e-5, "erf")
    out, (z, mean, inv) = MB._forward(x, scale, bias, w1, b1, w2, b2, None,
                                      1e-5, "erf", want_stash=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(out))
    # stashed z must equal the fc1 pre-activation; stats must match LN's
    x32 = np.asarray(x, np.float32)
    m = x32.mean(-1, keepdims=True)
    v = ((x32 - m) ** 2).mean(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(mean), m, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(inv), 1 / np.sqrt(v + 1e-5),
                               rtol=1e-6, atol=0)
    xn = (x32 - m) / np.sqrt(v + 1e-5) * np.asarray(scale) + np.asarray(bias)
    z_ref = xn @ np.asarray(w1) + np.asarray(b1)
    np.testing.assert_allclose(np.asarray(z, np.float32), z_ref,
                               rtol=2e-2, atol=2e-2)
