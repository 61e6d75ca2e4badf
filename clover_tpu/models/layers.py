"""Shared flax building blocks: MLP, stochastic depth, initializers.

All modules follow the project dtype policy: parameters in float32,
compute in ``dtype`` (bfloat16 on TPU by default at the call sites).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# timm trunc_normal_(std=.02) equivalent (used throughout the reference
# Swin backbone, swin_transformer_3d.py:192 and fusion tokens,
# cross_transformer.py:33).
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)
xavier_uniform_init = nn.initializers.xavier_uniform()


def dense(features: int, *, use_bias: bool = True, dtype: Dtype = jnp.float32,
          kernel_init: Callable = trunc_normal_init, name: Optional[str] = None) -> nn.Dense:
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init,
        bias_init=nn.initializers.zeros,
        name=name,
    )


class FusedLayerNorm(nn.Module):
    """nn.LayerNorm drop-in backed by the fused Pallas kernel on TPU.

    Same parameter names/shapes ('scale', 'bias', fp32) and the same
    fp32-stats semantics, so checkpoints are interchangeable. On non-TPU
    backends the op falls back to an identical XLA implementation.
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, fwd_only: bool = False) -> jax.Array:
        del fwd_only  # forced-kernel variant; arg kept for call-site compat
        from clover_tpu.ops.layer_norm import fused_layer_norm

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return fused_layer_norm(x.astype(self.dtype), scale, bias,
                                self.epsilon)


import os as _os

# 'auto' (default): call sites that know they are on a forward-only path
# (deterministic eval) pass fwd_only=True and get the fused Pallas kernel
# (+1.3% eval, 442.7 vs 437.2); everything else keeps XLA, which fuses
# the normalize-apply into consumers and wins in training (31.5 vs 32.0
# with the kernel's custom-vjp recompute). 'pallas'/'xla' force one impl
# everywhere (CLOVER_LN env).
_LN_IMPL = _os.environ.get("CLOVER_LN", "auto")


class LayerNormAuto(nn.Module):
    """LayerNorm whose impl is chosen per call: ``fwd_only=True`` routes to
    the fused Pallas kernel (TPU), else XLA math. Parameter layout and fp32
    stats match nn.LayerNorm exactly (parity-tested in
    tests/test_layer_norm_kernel.py), so checkpoints are interchangeable
    with either forced impl."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, fwd_only: bool = False) -> jax.Array:
        from clover_tpu.ops.layer_norm import _xla_layer_norm, fused_layer_norm

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        use_kernel = {"pallas": True, "xla": False}.get(_LN_IMPL, fwd_only)
        if use_kernel:
            return fused_layer_norm(x.astype(self.dtype), scale, bias,
                                    self.epsilon)
        return _xla_layer_norm(x.astype(self.dtype), scale, bias, self.epsilon)


def layer_norm(*, eps: float = 1e-5, dtype: Dtype = jnp.float32,
               name: Optional[str] = None):
    # Norm statistics always in fp32 (reference patch_norm_fp32 behavior).
    if _LN_IMPL == "pallas":
        return FusedLayerNorm(epsilon=eps, dtype=dtype, name=name)
    return LayerNormAuto(epsilon=eps, dtype=dtype, name=name)


class DenseParams(nn.Module):
    """Declares nn.Dense-compatible params (kernel/bias, fp32) at the
    canonical child path WITHOUT running the layer.

    Used by fused-kernel paths that consume raw param values: declaring
    through a child module keeps the param tree identical to the nn.Dense
    path (checkpoint/TP-sharding compatible) while avoiding the fragile
    dummy-call + scope.get_variable pattern (which relies on XLA DCE and
    Flax scope internals that can break under lifted transforms)."""

    in_features: int
    features: int
    kernel_init: Callable = trunc_normal_init
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (self.in_features, self.features), jnp.float32)
        if not self.use_bias:
            return k, None
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class LayerNormParams(nn.Module):
    """Declares LayerNorm scale/bias (fp32) at the canonical child path
    without running the norm — see DenseParams."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


class MlpParams(nn.Module):
    """Declares Mlp's fc1/fc2 params at the canonical child paths without
    running the layers — see DenseParams."""

    in_features: int
    hidden_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        k1, b1 = DenseParams(self.in_features, self.hidden_features,
                             name="fc1")()
        k2, b2 = DenseParams(self.hidden_features, self.out_features,
                             name="fc2")()
        return k1, b1, k2, b2


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> GELU -> drop -> fc2 -> drop.

    Reference: swin_transformer_3d.py:250-268.
    """

    hidden_features: int
    out_features: int
    drop_rate: float = 0.0
    # tanh-approximate gelu (must match the fused-kernel mode so the
    # fused/unfused paths stay numerically interchangeable)
    approx_gelu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=self.approx_gelu)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        x = dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath equivalent)."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep_prob = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, p=keep_prob, shape=shape)
        return jnp.where(mask, x / keep_prob, jnp.zeros_like(x))


class ProjectorNorm(nn.Module):
    """LayerNorm / BatchNorm1d switch used by the contrastive projector heads.

    The reference heads pick ``nn.BatchNorm1d`` vs ``nn.LayerNorm`` by an
    ``ln`` flag (ssl_head.py:52,55). All live Clover configs use ``ln=True``;
    BatchNorm is kept for completeness (running stats live in the
    ``batch_stats`` collection and need ``mutable=['batch_stats']`` in train).
    """

    features: int
    use_ln: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        if self.use_ln:
            return layer_norm(dtype=self.dtype, name="norm")(x)
        return nn.BatchNorm(
            use_running_average=deterministic,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="norm",
        )(x)
