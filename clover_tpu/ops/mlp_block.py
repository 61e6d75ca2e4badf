"""Fused transformer-MLP half-block (Pallas TPU kernel).

Computes ``out = x + (gelu(LN(x) @ W1 + b1) @ W2 + b2)`` — the second half
of every Swin/BERT block — in one pass over the activations. The XLA
lowering of this region costs ~8 HBM tensor passes (LN stats read,
normalize+fc1 read/write of the 4C hidden, gelu+fc2 read/write, residual
read/read/write); the kernel keeps the 4C hidden entirely in VMEM, so HBM
traffic drops to: read x, read weights once (blocks with a constant index
map stay resident across grid steps), write out.

The hidden dim is tiled (grid minor axis) with an fp32 VMEM accumulator,
so stage-4 Swin (C=1024, 4C=4096 — 16 MB of weights) still fits. Backward
is the jax.vjp of the XLA reference (recompute), as elsewhere in ops/.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


_FORCE_PALLAS = False   # tests: run the kernel in interpret mode on CPU


def _erf(z):
    """Abramowitz–Stegun 7.1.26 rational erf (|error| <= 1.5e-7) — Mosaic
    has no erf/erfc primitive."""
    s = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            acc_ref, *, eps: float, n_chunks: int, rs_ref=None):
    j = pl.program_id(1)
    x = x_ref[:].astype(jnp.float32)                       # (R, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps) * s_ref[:] + b_ref[:]
    h = jnp.dot(xn.astype(x_ref.dtype), w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[:]
    # exact gelu via the rational erf (Mosaic lacks erf/erfc primitives)
    h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    y = jnp.dot(h.astype(x_ref.dtype), w2_ref[:],
                preferred_element_type=jnp.float32)        # (R, C)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = y

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + y

    @pl.when(j == n_chunks - 1)
    def _():
        mlp_out = acc_ref[:] + b2_ref[:]
        if rs_ref is not None:
            # per-row branch scale (DropPath: keep_mask / keep_prob)
            mlp_out = mlp_out * rs_ref[:]
        out_ref[:] = (x + mlp_out).astype(out_ref.dtype)


def _kernel_scaled(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   rs_ref, out_ref, acc_ref, *, eps, n_chunks):
    _kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            acc_ref, eps=eps, n_chunks=n_chunks, rs_ref=rs_ref)


import os as _os

_TILE_OVERRIDE = _os.environ.get("CLOVER_MLP_TILES")  # "R,Hc" experiment knob
# swept on the eval workload: 6 MB -> 423, 10 -> 423, 14 -> 434 clips/s
# (bigger row blocks; same plateau shape as the attention kernel's budget)
_MLP_VMEM_BUDGET = int(_os.environ.get("CLOVER_MLP_VMEM_MB", "14")) * 2 ** 20


def _pick_tiles(rows: int, C: int, H: int, itemsize: int,
                budget: int = None):
    """(R, Hc): row block and hidden chunk fitting VMEM (weights are
    double-buffered by Mosaic; activations live once per step).

    Prefers the combination with the largest row block (MXU pipelining
    over M), breaking ties toward larger hidden chunks (fewer passes)."""
    if budget is None:
        budget = _MLP_VMEM_BUDGET
    if _TILE_OVERRIDE:
        r, hc = (int(v) for v in _TILE_OVERRIDE.split(","))
        return r, min(hc, H)
    best = (0, 0)
    for Hc in (H, 2048, 1024, 512, 256):
        if Hc > H or H % Hc:
            continue
        for R in (1024, 512, 256, 128, 64, 32, 16, 8):
            weights = 2 * (C * Hc + Hc * C) * itemsize     # w1+w2, 2 buffers
            act = (R * C * itemsize            # x block
                   + 2 * R * C * 4             # x fp32 + acc fp32
                   + R * Hc * 4                # hidden fp32
                   + R * C * itemsize)         # out
            if weights + act <= budget:
                if R > best[0] or (R == best[0] and Hc > best[1]):
                    best = (R, Hc)
                break
    return best


def _kernel_postln(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   out_ref, acc_ref, *, eps: float, n_chunks: int):
    """Post-LN (BERT) order: out = LN(x + fc2(gelu(fc1(x)))).

    Same hidden-chunk accumulation as the pre-LN kernel; the LayerNorm
    moves to the final chunk, where the full C row of x + mlp is in VMEM.
    """
    j = pl.program_id(1)
    x = x_ref[:].astype(jnp.float32)                       # (R, C)
    h = jnp.dot(x_ref[:], w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[:]
    h = 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))
    y = jnp.dot(h.astype(x_ref.dtype), w2_ref[:],
                preferred_element_type=jnp.float32)        # (R, C)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = y

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + y

    @pl.when(j == n_chunks - 1)
    def _():
        z = x + acc_ref[:] + b2_ref[:]
        mean = jnp.mean(z, axis=-1, keepdims=True)
        zc = z - mean
        var = jnp.mean(zc * zc, axis=-1, keepdims=True)
        out = zc * jax.lax.rsqrt(var + eps) * s_ref[:] + b_ref[:]
        out_ref[:] = out.astype(out_ref.dtype)


def _xla_reference_postln(x, scale, bias, w1, b1, w2, b2, eps):
    h = jnp.dot(x, w1.astype(x.dtype),
                preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=False)
    y = jnp.dot(h.astype(x.dtype), w2.astype(x.dtype),
                preferred_element_type=jnp.float32) + b2
    z = x.astype(jnp.float32) + y
    mean = jnp.mean(z, axis=-1, keepdims=True)
    zc = z - mean
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    out = zc * jax.lax.rsqrt(var + eps) * scale + bias
    return out.astype(x.dtype)


def _forward_postln(x, scale, bias, w1, b1, w2, b2, eps):
    if not _on_tpu() and not _FORCE_PALLAS:
        return _xla_reference_postln(x, scale, bias, w1, b1, w2, b2, eps)
    rows, C = x.shape
    H = w1.shape[1]
    R, Hc = _pick_tiles(rows, C, H, x.dtype.itemsize)
    if R == 0:
        return _xla_reference_postln(x, scale, bias, w1, b1, w2, b2, eps)
    n_chunks = H // Hc
    f32 = jnp.float32
    in_specs = [
        pl.BlockSpec((R, C), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, Hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((Hc, C), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, scale.astype(f32).reshape(1, C), bias.astype(f32).reshape(1, C),
            w1.astype(x.dtype), b1.astype(f32).reshape(1, H),
            w2.astype(x.dtype), b2.astype(f32).reshape(1, C)]
    return pl.pallas_call(
        functools.partial(_kernel_postln, eps=eps, n_chunks=n_chunks),
        grid=(pl.cdiv(rows, R), n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, C), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((R, C), f32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * C * H,
            bytes_accessed=(2 * rows * C + 2 * C * H) * x.dtype.itemsize,
            transcendentals=rows * H,
        ),
        interpret=not _on_tpu(),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_mlp_postln(x, scale, bias, w1, b1, w2, b2, eps: float = 1e-12):
    """LN(x + fc2(gelu(fc1(x)))) over 2-D x (rows, C) — the BERT post-LN
    MLP half (bert.py BertLayer; HF BertIntermediate+BertOutput)."""
    return _forward_postln(x, scale, bias, w1, b1, w2, b2, eps)


def _fwd_postln(x, scale, bias, w1, b1, w2, b2, eps):
    return _forward_postln(x, scale, bias, w1, b1, w2, b2, eps), (
        x, scale, bias, w1, b1, w2, b2)


def _bwd_postln(eps, residuals, g):
    x, scale, bias, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(lambda *a: _xla_reference_postln(*a, eps),
                     x, scale, bias, w1, b1, w2, b2)
    return vjp(g)


fused_mlp_postln.defvjp(_fwd_postln, _bwd_postln)


def _xla_reference(x, scale, bias, w1, b1, w2, b2, row_scale, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps) * scale + bias
    h = jnp.dot(xn.astype(x.dtype), w1.astype(x.dtype),
                preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=False)
    y = jnp.dot(h.astype(x.dtype), w2.astype(x.dtype),
                preferred_element_type=jnp.float32) + b2
    if row_scale is not None:
        y = y * row_scale.astype(jnp.float32).reshape(-1, 1)
    return (x32 + y).astype(x.dtype)


def _forward(x, scale, bias, w1, b1, w2, b2, row_scale, eps):
    if not _on_tpu() and not _FORCE_PALLAS:
        return _xla_reference(x, scale, bias, w1, b1, w2, b2, row_scale, eps)
    rows, C = x.shape
    H = w1.shape[1]
    R, Hc = _pick_tiles(rows, C, H, x.dtype.itemsize)
    if R == 0:
        return _xla_reference(x, scale, bias, w1, b1, w2, b2, row_scale, eps)
    n_chunks = H // Hc
    f32 = jnp.float32
    in_specs = [
        pl.BlockSpec((R, C), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, Hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((Hc, C), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, scale.astype(f32).reshape(1, C), bias.astype(f32).reshape(1, C),
            w1.astype(x.dtype), b1.astype(f32).reshape(1, H),
            w2.astype(x.dtype), b2.astype(f32).reshape(1, C)]
    kern = functools.partial(_kernel, eps=eps, n_chunks=n_chunks)
    if row_scale is not None:
        in_specs.append(pl.BlockSpec((R, 1), lambda i, j: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(row_scale.astype(f32).reshape(rows, 1))
        kern = functools.partial(_kernel_scaled, eps=eps, n_chunks=n_chunks)
    out = pl.pallas_call(
        kern,
        grid=(pl.cdiv(rows, R), n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, C), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((R, C), f32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * C * H,
            bytes_accessed=(2 * rows * C + 2 * C * H) * x.dtype.itemsize,
            transcendentals=rows * H,
        ),
        interpret=not _on_tpu(),
    )(*args)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_ln_mlp_residual(x, scale, bias, w1, b1, w2, b2, row_scale=None,
                          eps: float = 1e-5):
    """x + row_scale * MLP(LN(x)) over 2-D x (rows, C); row_scale is the
    optional per-row DropPath factor (keep/keep_prob), None = 1."""
    return _forward(x, scale, bias, w1, b1, w2, b2, row_scale, eps)


def _fwd(x, scale, bias, w1, b1, w2, b2, row_scale, eps):
    return _forward(x, scale, bias, w1, b1, w2, b2, row_scale, eps), (
        x, scale, bias, w1, b1, w2, b2, row_scale)


def _bwd(eps, residuals, g):
    x, scale, bias, w1, b1, w2, b2, row_scale = residuals
    if row_scale is None:
        _, vjp = jax.vjp(
            lambda *a: _xla_reference(*a, None, eps),
            x, scale, bias, w1, b1, w2, b2)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, eps),
        x, scale, bias, w1, b1, w2, b2, row_scale)
    return vjp(g)


fused_ln_mlp_residual.defvjp(_fwd, _bwd)
