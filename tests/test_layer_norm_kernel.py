"""Fused LayerNorm: kernel parity vs flax nn.LayerNorm + gradient parity."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clover_tpu.ops.layer_norm as LN
from clover_tpu.models.layers import FusedLayerNorm


@pytest.mark.parametrize("shape,dtype", [
    ((4, 7, 128), jnp.float32),
    ((3, 5, 6, 96), jnp.float32),      # C not lane-aligned
    ((16, 384), jnp.bfloat16),
    ((9, 257), jnp.float32),           # odd rows + odd C
])
def test_kernel_matches_flax(shape, dtype, monkeypatch):
    monkeypatch.setattr(LN, "_FORCE_PALLAS", True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape) * 2 + 0.3, dtype)
    scale = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))

    got = LN.fused_layer_norm(x, scale, bias, 1e-5)
    ref_mod = nn.LayerNorm(epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32)
    ref = ref_mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)
    assert got.dtype == dtype


def test_gradients_match_flax(monkeypatch):
    monkeypatch.setattr(LN, "_FORCE_PALLAS", True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(6, 64)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=64).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=64).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(jnp.sin(LN.fused_layer_norm(x, s, b, 1e-5)))

    ref_mod = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32)

    def loss_ref(x, s, b):
        y = ref_mod.apply({"params": {"scale": s, "bias": b}}, x)
        return jnp.sum(jnp.sin(y))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_module_param_compat_with_nn_layer_norm():
    """FusedLayerNorm params are interchangeable with nn.LayerNorm's."""
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 32)),
                    jnp.float32)
    mod = FusedLayerNorm()
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params) == {"scale", "bias"}
    assert params["scale"].shape == (32,)
    ref = nn.LayerNorm(param_dtype=jnp.float32).apply({"params": params}, x)
    got = mod.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
