"""Fused LayerNorm (Pallas TPU kernel).

Profiling the eval step (BASELINE.md) shows ~12-18% of device time in
`convert_reduce_fusion` ops — the fp32 mean/variance reductions XLA emits
for every channels-last LayerNorm, each of which re-reads the full
activation tensor from HBM before the (separately fused) normalize pass
reads it again. This kernel computes stats + normalize + affine in one
VMEM-resident pass: one HBM read and one write per LN site.

Forward is Pallas (TPU only — XLA reference elsewhere); backward is the
jax.vjp of the XLA reference (recompute), keeping training numerics
identical to flax nn.LayerNorm while the forward pass (and therefore the
whole eval path) takes the fused kernel.

Numerics match nn.LayerNorm: stats in fp32 over the last axis, eps inside
rsqrt, output cast back to the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)                     # (R, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = xc * inv * scale_ref[:] + bias_ref[:]            # (1, C) broadcasts
    out_ref[:] = y.astype(out_ref.dtype)


def _pick_rows(rows: int, C: int, itemsize: int,
               budget: int = 4 * 2 ** 20) -> int:
    """Largest 8-aligned row block whose in+out+f32 temps fit the budget
    (Mosaic double-buffers grid blocks, so stay well under 16 MB)."""
    per_row = C * (2 * itemsize + 4)
    r = max(8, min(2048, budget // max(per_row, 1)))
    return max(r - r % 8, 8)


def _xla_layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype)


_FORCE_PALLAS = False   # tests: exercise the kernel in interpret mode on CPU


def _forward(x, scale, bias, eps):
    if not _on_tpu() and not _FORCE_PALLAS:
        return _xla_layer_norm(x, scale, bias, eps)
    orig_shape = x.shape
    C = orig_shape[-1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, C)
    R = _pick_rows(rows, C, x.dtype.itemsize)
    grid = (pl.cdiv(rows, R),)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * C,
            bytes_accessed=2 * rows * C * x.dtype.itemsize,
            transcendentals=rows,
        ),
        interpret=not _on_tpu(),
    )(x2, scale.astype(jnp.float32).reshape(1, C),
      bias.astype(jnp.float32).reshape(1, C))
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the last axis, stats in fp32 (nn.LayerNorm semantics)."""
    return _forward(x, scale, bias, eps)


def _fwd(x, scale, bias, eps):
    return _forward(x, scale, bias, eps), (x, scale, bias)


def _bwd(eps, residuals, g):
    x, scale, bias = residuals
    _, vjp = jax.vjp(lambda a, s, b: _xla_layer_norm(a, s, b, eps),
                     x, scale.astype(jnp.float32), bias.astype(jnp.float32))
    dx, dscale, dbias = vjp(g)
    return dx, dscale.astype(scale.dtype), dbias.astype(bias.dtype)


fused_layer_norm.defvjp(_fwd, _bwd)
