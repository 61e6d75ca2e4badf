"""Fused transformer-MLP half-block (Pallas TPU kernel).

Computes ``out = x + (gelu(LN(x) @ W1 + b1) @ W2 + b2)`` — the second half
of every Swin/BERT block — in one pass over the activations. The XLA
lowering of this region costs ~8 HBM tensor passes (LN stats read,
normalize+fc1 read/write of the 4C hidden, gelu+fc2 read/write, residual
read/read/write); the kernel keeps the 4C hidden entirely in VMEM, so HBM
traffic drops to: read x, read weights once (blocks with a constant index
map stay resident across grid steps), write out.

The hidden dim is tiled (grid minor axis) with an fp32 VMEM accumulator,
so stage-4 Swin (C=1024, 4C=4096 — 16 MB of weights) still fits. Backward:
explicit bf16-operand recompute by default under remat / CLOVER_MLP_STASH=0,
or (r5 default) the z-stash backward — the forward emits the pre-gelu
hidden + LN stats and the backward skips the LN+fc1 recompute GEMM.
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


# gelu activation mode. The rational erf costs ~16 VPU ops incl. a divide
# and an exp per element on the (R, 4C) hidden — the kernel's largest VPU
# pass; 'tanh' (the original-BERT approximation, ~8 ops, one tanh,
# |err| <= 5e-4 abs — far below bf16 activation noise) measured +5.5% on
# 32-frame eval (BASELINE.md 2026-08-17). Ops take gelu='auto'|'erf'|'tanh';
# 'auto' resolves to this env default. Swin passes its config's choice
# (default tanh — documented divergence from the reference's erf); BERT
# forces erf to preserve exact HF parity.
_GELU_MODE = __import__("os").environ.get("CLOVER_MLP_GELU", "erf")


def _gelu(h, mode: str):
    if mode == "tanh":
        return 0.5 * h * (1.0 + jnp.tanh(
            0.7978845608028654 * (h + 0.044715 * h * h * h)))
    return 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))


def _resolve_gelu(mode: str) -> str:
    return _GELU_MODE if mode == "auto" else mode


def _kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            acc_ref, *, eps: float, n_chunks: int, gelu_mode: str = "erf",
            rs_ref=None, z_ref=None, mean_ref=None, inv_ref=None):
    j = pl.program_id(1)
    x = x_ref[:].astype(jnp.float32)                       # (R, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xn = xc * inv * s_ref[:] + b_ref[:]
    h = jnp.dot(xn.astype(x_ref.dtype), w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[:]
    if z_ref is not None:
        # stash mode (CLOVER_MLP_STASH): emit the pre-gelu hidden chunk +
        # LN stats so the backward skips the LN+fc1 recompute GEMM
        z_ref[:] = h.astype(z_ref.dtype)
    h = _gelu(h, gelu_mode)
    y = jnp.dot(h.astype(x_ref.dtype), w2_ref[:],
                preferred_element_type=jnp.float32)        # (R, C)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = y
        if mean_ref is not None:
            mean_ref[:] = mean
            inv_ref[:] = inv

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
                   rs_ref, out_ref, acc_ref, *, eps, n_chunks,
                   gelu_mode="erf"):
    _kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            acc_ref, eps=eps, n_chunks=n_chunks, gelu_mode=gelu_mode,
            rs_ref=rs_ref)


def _kernel_stash(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  out_ref, z_ref, mean_ref, inv_ref, acc_ref, *, eps,
                  n_chunks, gelu_mode="erf"):
    _kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            acc_ref, eps=eps, n_chunks=n_chunks, gelu_mode=gelu_mode,
            z_ref=z_ref, mean_ref=mean_ref, inv_ref=inv_ref)


def _kernel_stash_scaled(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                         rs_ref, out_ref, z_ref, mean_ref, inv_ref, acc_ref,
                         *, eps, n_chunks, gelu_mode="erf"):
    _kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            acc_ref, eps=eps, n_chunks=n_chunks, gelu_mode=gelu_mode,
            rs_ref=rs_ref, z_ref=z_ref, mean_ref=mean_ref, inv_ref=inv_ref)


import os as _os

_TILE_OVERRIDE = _os.environ.get("CLOVER_MLP_TILES")  # "R,Hc" experiment knob
# swept on the eval workload: 6 MB -> 423, 10 -> 423, 14 -> 434 clips/s
# (bigger row blocks; same plateau shape as the attention kernel's budget)
_MLP_VMEM_BUDGET = int(_os.environ.get("CLOVER_MLP_VMEM_MB", "14")) * 2 ** 20


def _pick_tiles(rows: int, C: int, H: int, itemsize: int,
                budget: int = None, mask: bool = False, stash: bool = False):
    """(R, Hc): row block and hidden chunk fitting VMEM (weights are
    double-buffered by Mosaic; activations live once per step).

    Prefers the combination with the largest row block (MXU pipelining
    over M), breaking ties toward larger hidden chunks (fewer passes).
    ``mask``: the dropout-mask variant streams an extra (R, C) f32 block
    (compile-OOMs by ~1 MB at BERT shapes if uncounted — r4).
    ``stash``: the z-stash variant writes an extra (R, Hc) hidden output
    block (double-buffered)."""
    if budget is None:
        budget = _MLP_VMEM_BUDGET
    if stash or mask:
        # 25% headroom like _pick_tiles_bwd: Mosaic's true reservation ran
        # ~18% above even the double-buffered model at the edge picks —
        # stash: 17.38M/16M at (512,1024) stage 2; mask: the dropout
        # variant at (1024,512)x(25088,512,2048) overflows once the mask
        # is a real operand (the r4 audit's constant-ones mask was folded
        # away, hiding it — r5 audit fix)
        budget = budget * 3 // 4
    if _TILE_OVERRIDE:
        r, hc = (int(v) for v in _TILE_OVERRIDE.split(","))
        return r, min(hc, H)
    best = (0, 0)
    for Hc in (H, 2048, 1024, 512, 256):
        if Hc > H or H % Hc:
            continue
        for R in (1024, 512, 256, 128, 64, 32, 16, 8):
            weights = 2 * (C * Hc + Hc * C) * itemsize     # w1+w2, 2 buffers
            if stash:
                # The stash variant's z output pushes the kernel against the
                # 16 MB scoped-VMEM limit, where the tuned non-stash formula's
                # slack (it counts streamed x/out blocks once, not double-
                # buffered) stops being safe — a (512, 1024) pick compile-
                # OOM'd at 17.38M on the real chip (2026-08-21). Count every
                # grid-streamed block at 2 buffers plus the f32 temps.
                act = (2 * R * C * itemsize          # x, 2 buffers
                       + 2 * R * C * itemsize        # out, 2 buffers
                       + 2 * R * Hc * itemsize       # z out, 2 buffers
                       + 2 * 2 * R * 128 * 4         # mean+inv, lane-padded
                       + R * C * 4                   # x fp32
                       + R * Hc * 4                  # hidden fp32
                       + R * C * 4                   # y fp32
                       + R * C * 4)                  # acc scratch
            else:
                act = (R * C * itemsize            # x block
                       + 2 * R * C * 4             # x fp32 + acc fp32
                       + R * Hc * 4                # hidden fp32
                       + R * C * itemsize          # out
                       + (2 * R * C * 4 if mask else 0))  # mask f32, 2 bufs
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
    h = _gelu(h, "erf")    # BERT post-LN path keeps exact HF numerics
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


def _xla_backward_postln(x, scale, bias, w1, b1, w2, b2, eps, g):
    """Explicit recompute backward for the post-LN half with bf16 GEMM
    operands (the jax.vjp of ``_xla_reference_postln`` feeds the f32 LN
    cotangent straight into the w2-transpose dots — f32-operand GEMMs at
    the BERT/fusion-tower shapes; same fix as ``_xla_backward`` for the
    pre-LN Swin half). gelu' uses the A&S rational erf (|err|<=1.5e-7).
    Parity-tested against the f32-cotangent vjp.

    Note on CLOVER_MLP_BWD_HBM=bf16: unlike the pre-LN backward (whose LN
    stats come from x before any rounded intermediate), here the knob's
    bf16 round-trip of zpre perturbs h, y, z and hence the RECOMPUTED
    LayerNorm statistics — with the knob on, ALL grads (including
    dscale/dbias/dx) carry the rounding (measured ~0.2-0.6% normalized,
    still bf16-order; pinned by the knob-on parity test)."""
    dt = x.dtype
    f32 = jnp.float32
    w1_bf, w2_bf = w1.astype(dt), w2.astype(dt)
    zpre = jnp.dot(x, w1_bf, preferred_element_type=f32) + b1
    if _BWD_HBM_BF16:
        zpre = zpre.astype(dt).astype(f32)
    h = jax.nn.gelu(zpre, approximate=False)
    h_bf = h.astype(dt)
    y = jnp.dot(h_bf, w2_bf, preferred_element_type=f32) + b2
    z = x.astype(f32) + y
    mean = jnp.mean(z, axis=-1, keepdims=True)
    zc = z - mean
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    zn = zc * inv

    g32 = g.astype(f32)
    dscale = jnp.sum(g32 * zn, axis=0)
    dbias = jnp.sum(g32, axis=0)
    dzn = g32 * scale
    dz = inv * (dzn - jnp.mean(dzn, axis=-1, keepdims=True)
                - zn * jnp.mean(dzn * zn, axis=-1, keepdims=True))
    dz_bf = dz.astype(dt)
    dh = jax.lax.dot_general(dz_bf, w2_bf, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    if _BWD_HBM_BF16:
        dh = dh.astype(dt).astype(f32)
    dzpre = dh * _gelu_grad(zpre, "erf")
    dzpre_bf = dzpre.astype(dt)
    dx2 = jax.lax.dot_general(dzpre_bf, w1_bf, (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dw1 = jax.lax.dot_general(x, dzpre_bf, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    db1 = (jnp.sum(dzpre_bf.astype(f32), axis=0) if _BWD_HBM_BF16
           else jnp.sum(dzpre, axis=0))
    dw2 = jax.lax.dot_general(h_bf, dz_bf, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    db2 = jnp.sum(dz, axis=0)
    dx = (dz + dx2).astype(dt)
    return (dx, dscale.astype(scale.dtype), dbias.astype(bias.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


def _bwd_postln(eps, residuals, g):
    x, scale, bias, w1, b1, w2, b2 = residuals
    if not _BWD_F32:
        return _xla_backward_postln(x, scale, bias, w1, b1, w2, b2, eps, g)
    _, vjp = jax.vjp(lambda *a: _xla_reference_postln(*a, eps),
                     x, scale, bias, w1, b1, w2, b2)
    return vjp(g)


fused_mlp_postln.defvjp(_fwd_postln, _bwd_postln)


# ---- post-LN MLP WITH hidden dropout (BERT/fusion TRAIN path) -----------
# out = LN(x + drop_mask * (fc2(gelu(fc1(x))) + b2)); drop_mask is the
# precomputed {0, 1/keep} f32 mask (caller generates it from the rbg
# dropout stream — mask-bit generation is ~free post-r3, BASELINE.md).
# Matches flax nn.Dropout's placement in the unfused BertLayer exactly;
# lets the fused kernel run on TRAINING passes too (VERDICT r3 #3: the
# BERT/fusion region sat ~10 ms above its floor, dominated by many small
# ops the eval path fuses away).


def _kernel_postln_mask(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        m_ref, out_ref, acc_ref, *, eps: float,
                        n_chunks: int):
    j = pl.program_id(1)
    x = x_ref[:].astype(jnp.float32)
    h = jnp.dot(x_ref[:], w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[:]
    h = _gelu(h, "erf")
    y = jnp.dot(h.astype(x_ref.dtype), w2_ref[:],
                preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = y

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + y

    @pl.when(j == n_chunks - 1)
    def _():
        z = x + (acc_ref[:] + b2_ref[:]) * m_ref[:]
        mean = jnp.mean(z, axis=-1, keepdims=True)
        zc = z - mean
        var = jnp.mean(zc * zc, axis=-1, keepdims=True)
        out = zc * jax.lax.rsqrt(var + eps) * s_ref[:] + b_ref[:]
        out_ref[:] = out.astype(out_ref.dtype)


def _xla_reference_postln_mask(x, scale, bias, w1, b1, w2, b2, m, eps):
    h = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=False)
    y = jnp.dot(h.astype(x.dtype), w2.astype(x.dtype),
                preferred_element_type=jnp.float32) + b2
    z = x.astype(jnp.float32) + y * m
    mean = jnp.mean(z, axis=-1, keepdims=True)
    zc = z - mean
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    out = zc * jax.lax.rsqrt(var + eps) * scale + bias
    return out.astype(x.dtype)


def _forward_postln_mask(x, scale, bias, w1, b1, w2, b2, m, eps):
    if not _on_tpu() and not _FORCE_PALLAS:
        return _xla_reference_postln_mask(x, scale, bias, w1, b1, w2, b2,
                                          m, eps)
    rows, C = x.shape
    H = w1.shape[1]
    R, Hc = _pick_tiles(rows, C, H, x.dtype.itemsize, mask=True)
    if R == 0:
        return _xla_reference_postln_mask(x, scale, bias, w1, b1, w2, b2,
                                          m, eps)
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
        pl.BlockSpec((R, C), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, scale.astype(f32).reshape(1, C), bias.astype(f32).reshape(1, C),
            w1.astype(x.dtype), b1.astype(f32).reshape(1, H),
            w2.astype(x.dtype), b2.astype(f32).reshape(1, C),
            m.astype(f32)]
    return pl.pallas_call(
        functools.partial(_kernel_postln_mask, eps=eps, n_chunks=n_chunks),
        grid=(pl.cdiv(rows, R), n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, C), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((R, C), f32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * C * H,
            bytes_accessed=(2 * rows * C + 2 * C * H) * x.dtype.itemsize
            + rows * C * 4,
            transcendentals=rows * H,
        ),
        interpret=not _on_tpu(),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_mlp_postln_dropout(x, scale, bias, w1, b1, w2, b2, drop_mask,
                             eps: float = 1e-12):
    """LN(x + drop_mask * (fc2(gelu(fc1(x))) + b2)) — the BertLayer MLP
    half with its hidden dropout, for TRAINING passes. drop_mask (rows, C)
    f32 in {0, 1/keep}; its gradient is ZERO by contract (dropout masks
    are never trainable)."""
    return _forward_postln_mask(x, scale, bias, w1, b1, w2, b2, drop_mask,
                                eps)


def _fwd_postln_mask(x, scale, bias, w1, b1, w2, b2, m, eps):
    return (_forward_postln_mask(x, scale, bias, w1, b1, w2, b2, m, eps),
            (x, scale, bias, w1, b1, w2, b2, m))


def _xla_backward_postln_mask(x, scale, bias, w1, b1, w2, b2, m, eps, g):
    """_xla_backward_postln with the dropout mask threaded through:
    z = x + (fc2(h)+b2)*m, so dy = dz*m and db2 = sum(dz*m). Shares the
    bf16-GEMM-operand convention and the CLOVER_MLP_BWD_HBM knob
    semantics (the knob's zpre rounding shifts the recomputed LN stats —
    see _xla_backward_postln)."""
    dt = x.dtype
    f32 = jnp.float32
    w1_bf, w2_bf = w1.astype(dt), w2.astype(dt)
    zpre = jnp.dot(x, w1_bf, preferred_element_type=f32) + b1
    if _BWD_HBM_BF16:
        zpre = zpre.astype(dt).astype(f32)
    h = jax.nn.gelu(zpre, approximate=False)
    h_bf = h.astype(dt)
    y = jnp.dot(h_bf, w2_bf, preferred_element_type=f32) + b2
    m32 = m.astype(f32)
    z = x.astype(f32) + y * m32
    mean = jnp.mean(z, axis=-1, keepdims=True)
    zc = z - mean
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    zn = zc * inv

    g32 = g.astype(f32)
    dscale = jnp.sum(g32 * zn, axis=0)
    dbias = jnp.sum(g32, axis=0)
    dzn = g32 * scale
    dz = inv * (dzn - jnp.mean(dzn, axis=-1, keepdims=True)
                - zn * jnp.mean(dzn * zn, axis=-1, keepdims=True))
    dy = dz * m32
    dy_bf = dy.astype(dt)
    dh = jax.lax.dot_general(dy_bf, w2_bf, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    if _BWD_HBM_BF16:
        dh = dh.astype(dt).astype(f32)
    dzpre = dh * _gelu_grad(zpre, "erf")
    dzpre_bf = dzpre.astype(dt)
    dx2 = jax.lax.dot_general(dzpre_bf, w1_bf, (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dw1 = jax.lax.dot_general(x, dzpre_bf, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    db1 = (jnp.sum(dzpre_bf.astype(f32), axis=0) if _BWD_HBM_BF16
           else jnp.sum(dzpre, axis=0))
    dw2 = jax.lax.dot_general(h_bf, dy_bf, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    db2 = jnp.sum(dy, axis=0)
    dx = (dz + dx2).astype(dt)
    return (dx, dscale.astype(scale.dtype), dbias.astype(bias.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            jnp.zeros_like(m))    # dropout masks are trace constants


def _bwd_postln_mask(eps, residuals, g):
    x, scale, bias, w1, b1, w2, b2, m = residuals
    if not _BWD_F32:
        return _xla_backward_postln_mask(x, scale, bias, w1, b1, w2, b2,
                                         m, eps, g)
    _, vjp = jax.vjp(lambda *a: _xla_reference_postln_mask(*a, eps),
                     x, scale, bias, w1, b1, w2, b2, m)
    return vjp(g)


fused_mlp_postln_dropout.defvjp(_fwd_postln_mask, _bwd_postln_mask)


def _xla_reference(x, scale, bias, w1, b1, w2, b2, row_scale, eps,
                   gelu_mode="erf", want_stash=False):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xn = xc * inv * scale + bias
    z = jnp.dot(xn.astype(x.dtype), w1.astype(x.dtype),
                preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(z, approximate=(gelu_mode == "tanh"))
    y = jnp.dot(h.astype(x.dtype), w2.astype(x.dtype),
                preferred_element_type=jnp.float32) + b2
    if row_scale is not None:
        y = y * row_scale.astype(jnp.float32).reshape(-1, 1)
    out = (x32 + y).astype(x.dtype)
    if want_stash:
        return out, (z.astype(x.dtype), mean, inv)
    return out


def _forward(x, scale, bias, w1, b1, w2, b2, row_scale, eps,
             gelu_mode="erf", want_stash=False):
    if not _on_tpu() and not _FORCE_PALLAS:
        return _xla_reference(x, scale, bias, w1, b1, w2, b2, row_scale, eps,
                              gelu_mode, want_stash)
    rows, C = x.shape
    H = w1.shape[1]
    # pass stash= only when set (tests monkeypatch _pick_tiles with the
    # positional signature)
    R, Hc = (_pick_tiles(rows, C, H, x.dtype.itemsize, stash=True)
             if want_stash else _pick_tiles(rows, C, H, x.dtype.itemsize))
    if R == 0:
        return _xla_reference(x, scale, bias, w1, b1, w2, b2, row_scale, eps,
                              gelu_mode, want_stash)
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
    kern_kw = dict(eps=eps, n_chunks=n_chunks, gelu_mode=gelu_mode)
    if row_scale is not None:
        in_specs.append(pl.BlockSpec((R, 1), lambda i, j: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(row_scale.astype(f32).reshape(rows, 1))
        kern = functools.partial(
            _kernel_stash_scaled if want_stash else _kernel_scaled, **kern_kw)
    else:
        kern = functools.partial(
            _kernel_stash if want_stash else _kernel, **kern_kw)
    out_specs = pl.BlockSpec((R, C), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, C), x.dtype)
    if want_stash:
        rvec = pl.BlockSpec((R, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
        out_specs = (out_specs,
                     pl.BlockSpec((R, Hc), lambda i, j: (i, j),
                                  memory_space=pltpu.VMEM),
                     rvec, rvec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((rows, H), x.dtype),
                     jax.ShapeDtypeStruct((rows, 1), f32),
                     jax.ShapeDtypeStruct((rows, 1), f32))
    out = pl.pallas_call(
        kern,
        grid=(pl.cdiv(rows, R), n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((R, C), f32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * C * H,
            bytes_accessed=(2 * rows * C + 2 * C * H) * x.dtype.itemsize
            + (rows * H * x.dtype.itemsize if want_stash else 0),
            transcendentals=rows * H,
        ),
        interpret=not _on_tpu(),
    )(*args)
    if want_stash:
        return out[0], (out[1], out[2], out[3])
    return out


# ----------------------------------------------------------- fused backward
# Same playbook as the attention bwd kernel (window_attention.py): the XLA
# vjp of this block recomputes and MATERIALIZES the 4C hidden in HBM (as
# well as fp32 LN stats vectors per site). Two kernels split the backward
# by accumulation direction — row-indexed grads (dx, and the reductions
# dscale/dbias/db2/drow_scale which accumulate into constant-index blocks)
# iterate hidden chunks innermost; weight grads (dW1/db1/dW2) iterate row
# blocks innermost so their j-indexed output blocks stay resident. Both
# recompute LN + hidden in VMEM; nothing 4C-wide ever touches HBM.


def _erf_grad(z):
    """d/dz gelu(z) = Phi(z) + z * phi(z), with Phi via the rational erf."""
    phi = jnp.exp(-0.5 * z * z) * 0.3989422804014327       # 1/sqrt(2*pi)
    Phi = 0.5 * (1.0 + _erf(z * 0.7071067811865476))
    return Phi + z * phi


def _recompute(x_ref, s_ref, b_ref, w1_ref, b1_ref, eps):
    """Shared VMEM recompute: LN stats, y (fc1 input), z, h, dgelu."""
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xn_raw = xc * inv
    y = xn_raw * s_ref[:] + b_ref[:]
    y_bf = y.astype(x_ref.dtype)
    z = jnp.dot(y_bf, w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[:]
    h = 0.5 * z * (1.0 + _erf(z * 0.7071067811865476))
    return x, inv, xn_raw, y_bf, z, h


def _kernel_bwd_dx(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   g_ref, dx_ref, ds_ref, db_ref, db2_ref, out_extra,
                   dy_ref, mlp_ref, *, eps, n_chunks, n_rows, has_rs,
                   rs_ref=None, drs_ref=None):
    i, j = pl.program_id(0), pl.program_id(1)
    R = x_ref.shape[0]

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    @pl.when(j == 0)
    def _():
        dy_ref[:] = jnp.zeros_like(dy_ref)
        if has_rs:
            mlp_ref[:] = jnp.zeros_like(mlp_ref)

    x, inv, xn_raw, y_bf, z, h = _recompute(x_ref, s_ref, b_ref, w1_ref,
                                            b1_ref, eps)
    rmask = (jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
             + i * R) < n_rows
    g32 = jnp.where(rmask, g_ref[:].astype(jnp.float32), 0.0)
    # re-mask after the rs product: tail-row rs garbage can be NaN/inf
    gy = jnp.where(rmask, g32 * rs_ref[:], 0.0) if has_rs else g32
    gy_bf = gy.astype(x_ref.dtype)
    dh = jax.lax.dot_general(
        gy_bf, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (R, Hc)
    dz = dh * _erf_grad(z)
    dy_ref[:] = dy_ref[:] + jax.lax.dot_general(
        dz.astype(x_ref.dtype), w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (R, C)
    if has_rs:
        mlp_ref[:] = mlp_ref[:] + jnp.dot(
            h.astype(x_ref.dtype), w2_ref[:],
            preferred_element_type=jnp.float32)

    @pl.when(j == n_chunks - 1)
    def _():
        dy = jnp.where(rmask, dy_ref[:], 0.0)
        dyt = dy * s_ref[:]
        m1 = jnp.mean(dyt, axis=-1, keepdims=True)
        m2 = jnp.mean(dyt * xn_raw, axis=-1, keepdims=True)
        dx = inv * (dyt - m1 - xn_raw * m2) + g32
        dx_ref[:] = dx.astype(dx_ref.dtype)
        # mask the product, not just dy: garbage tail rows make xn_raw
        # NaN and 0 * NaN would poison the reduction
        ds_ref[:] = ds_ref[:] + jnp.sum(
            jnp.where(rmask, dy * xn_raw, 0.0), axis=0, keepdims=True)
        db_ref[:] = db_ref[:] + jnp.sum(dy, axis=0, keepdims=True)
        db2_ref[:] = db2_ref[:] + jnp.sum(gy, axis=0, keepdims=True)
        if has_rs:
            mlp_out = mlp_ref[:] + b2_ref[:]
            drs_ref[:] = jnp.sum(g32 * mlp_out, axis=-1, keepdims=True)


def _kernel_bwd_dx_rs(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      g_ref, rs_ref, dx_ref, ds_ref, db_ref, db2_ref,
                      drs_ref, dy_ref, mlp_ref, *, eps, n_chunks, n_rows):
    _kernel_bwd_dx(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   g_ref, dx_ref, ds_ref, db_ref, db2_ref, None,
                   dy_ref, mlp_ref, eps=eps, n_chunks=n_chunks,
                   n_rows=n_rows, has_rs=True, rs_ref=rs_ref,
                   drs_ref=drs_ref)


def _kernel_bwd_dx_nors(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        g_ref, dx_ref, ds_ref, db_ref, db2_ref,
                        dy_ref, *, eps, n_chunks, n_rows):
    _kernel_bwd_dx(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   g_ref, dx_ref, ds_ref, db_ref, db2_ref, None,
                   dy_ref, None, eps=eps, n_chunks=n_chunks,
                   n_rows=n_rows, has_rs=False)


def _kernel_bwd_dw(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, g_ref,
                   dw1_ref, db1_ref, dw2_ref, *, eps, n_i, n_rows,
                   rs_ref=None):
    j, i = pl.program_id(0), pl.program_id(1)
    R = x_ref.shape[0]

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)

    x, inv, xn_raw, y_bf, z, h = _recompute(x_ref, s_ref, b_ref, w1_ref,
                                            b1_ref, eps)
    rmask = (jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
             + i * R) < n_rows
    g32 = jnp.where(rmask, g_ref[:].astype(jnp.float32), 0.0)
    gy = (jnp.where(rmask, g32 * rs_ref[:], 0.0)
          if rs_ref is not None else g32)
    gy_bf = gy.astype(x_ref.dtype)
    dh = jax.lax.dot_general(
        gy_bf, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dz = jnp.where(rmask, dh * _erf_grad(z), 0.0)
    dz_bf = dz.astype(x_ref.dtype)
    y_masked = jnp.where(rmask, y_bf.astype(jnp.float32), 0.0).astype(
        x_ref.dtype)
    dw1_ref[:] = dw1_ref[:] + jax.lax.dot_general(
        y_masked, dz_bf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (C, Hc)
    db1_ref[:] = db1_ref[:] + jnp.sum(dz, axis=0, keepdims=True)
    h_masked = jnp.where(rmask, h, 0.0).astype(x_ref.dtype)
    dw2_ref[:] = dw2_ref[:] + jax.lax.dot_general(
        h_masked, gy_bf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (Hc, C)


def _kernel_bwd_dw_rs(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, g_ref,
                      rs_ref, dw1_ref, db1_ref, dw2_ref, *, eps, n_i,
                      n_rows):
    _kernel_bwd_dw(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, g_ref,
                   dw1_ref, db1_ref, dw2_ref, eps=eps, n_i=n_i,
                   n_rows=n_rows, rs_ref=rs_ref)


def _pick_tiles_bwd(rows: int, C: int, H: int, itemsize: int):
    """(R, Hc) for the bwd kernels' larger live set: double-buffered x/g/dx
    blocks, f32 dy+mlp scratch and LN temps, weight chunks x2 buffers, and
    (kernel B) the resident f32 dW1/dW2 blocks."""
    best = (0, 0)
    # R capped at 512: R=1024 measured a 564 s Mosaic compile (C=128) and a
    # compiler crash (C=256); R<=512 compiles in seconds. Budget keeps 25%
    # headroom — the C=256/R=1024 crash sat exactly at the naive estimate.
    budget = _MLP_VMEM_BUDGET * 3 // 4
    for Hc in (H, 2048, 1024, 512, 256, 128):
        if Hc > H or H % Hc:
            continue
        for R in (512, 256, 128, 64, 32, 16, 8):
            weights = 4 * C * Hc * itemsize        # w1+w2 chunks, 2 buffers
            wgrads = 2 * C * Hc * 4                # resident dW1+dW2 (f32)
            act = (R * C * (6 * itemsize + 20)     # x,g,dx x2buf + f32 temps
                   + 2 * R * Hc * 4)               # hidden-chunk f32 temps
            if weights + wgrads + act <= budget:
                if R > best[0] or (R == best[0] and Hc > best[1]):
                    best = (R, Hc)
                break
    return best


# default OFF: measured SLOWER than the XLA-recompute vjp on the train
# step (remat 38.4 vs 40.4 clips/s, no-remat 42.4 vs 45.3) — the dx and
# dW kernels each recompute LN+fc1 in VMEM, duplicating MXU work that
# XLA's single fused recompute doesn't pay, and unlike attention there is
# no layout win to offset it (MLP grads are already layout-clean). Kept
# as an opt-in measured experiment (CLOVER_MLP_BWD=1), parity-tested.
_BWD_KERNEL = _os.environ.get("CLOVER_MLP_BWD", "0") == "1"


# ---------------------------------------------------- one-pass fused backward
# r3 retry of the bwd kernel with the duplication removed: ONE kernel,
# grid over row blocks only, the FULL hidden dim resident. LN+fc1+gelu
# recompute once per row block (same MXU count as the XLA vjp), dW1/dW2
# accumulate into constant-index f32 output blocks across the grid, and
# every (rows, H) intermediate plus all nine reductions (db1/db2/dscale/
# dbias/LN stats/drs) stay in VMEM — the HBM round trips of z/h/dz and
# the separate column-sum reduce fusions of the XLA path disappear.
# Requires 2*C*H*(itemsize + 4) resident weights+grads; Swin stages 0-2
# fit a 16 MB VMEM, stage 3 (C=1024, H=4096 -> 48 MB) falls back to the
# XLA backward.


def _kernel_bwd_onepass(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        g_ref, dx_ref, ds_ref, db_ref, dw1_ref, db1_ref,
                        dw2_ref, db2_ref, out_extra, *, eps, n_rows,
                        gelu_mode, rs_ref=None, drs_ref=None):
    i = pl.program_id(0)
    R = x_ref.shape[0]

    @pl.when(i == 0)
    def _():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xn_raw = xc * inv
    y_bf = (xn_raw * s_ref[:] + b_ref[:]).astype(x_ref.dtype)
    z = jnp.dot(y_bf, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h = _gelu(z, gelu_mode)

    rmask = (jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
             + i * R) < n_rows
    g32 = jnp.where(rmask, g_ref[:].astype(jnp.float32), 0.0)
    # re-mask after the rs product: tail-row rs garbage can be NaN/inf
    gy = jnp.where(rmask, g32 * rs_ref[:], 0.0) if rs_ref is not None else g32
    gy_bf = gy.astype(x_ref.dtype)
    dh = jax.lax.dot_general(gy_bf, w2_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # mask the product: tail-row z is garbage and 0 * NaN would poison
    # the dW1/db1 reductions
    dz = jnp.where(rmask, dh * _gelu_grad(z, gelu_mode), 0.0)
    dz_bf = dz.astype(x_ref.dtype)
    dy = jax.lax.dot_general(dz_bf, w1_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)

    y_masked = jnp.where(rmask, y_bf.astype(jnp.float32), 0.0).astype(
        x_ref.dtype)
    dw1_ref[:] = dw1_ref[:] + jax.lax.dot_general(
        y_masked, dz_bf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[:] = db1_ref[:] + jnp.sum(dz, axis=0, keepdims=True)
    h_masked = jnp.where(rmask, h, 0.0).astype(x_ref.dtype)
    dw2_ref[:] = dw2_ref[:] + jax.lax.dot_general(
        h_masked, gy_bf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[:] = db2_ref[:] + jnp.sum(gy, axis=0, keepdims=True)

    dy = jnp.where(rmask, dy, 0.0)
    dyt = dy * s_ref[:]
    m1 = jnp.mean(dyt, axis=-1, keepdims=True)
    m2 = jnp.mean(dyt * xn_raw, axis=-1, keepdims=True)
    dx = inv * (dyt - m1 - xn_raw * m2) + g32
    dx_ref[:] = dx.astype(dx_ref.dtype)
    ds_ref[:] = ds_ref[:] + jnp.sum(
        jnp.where(rmask, dy * xn_raw, 0.0), axis=0, keepdims=True)
    db_ref[:] = db_ref[:] + jnp.sum(dy, axis=0, keepdims=True)
    if rs_ref is not None:
        mlp_out = jnp.dot(h_masked, w2_ref[:],
                          preferred_element_type=jnp.float32) + b2_ref[:]
        drs_ref[:] = jnp.sum(g32 * mlp_out, axis=-1, keepdims=True)


def _kernel_bwd_onepass_rs(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
                           b2_ref, g_ref, rs_ref, dx_ref, ds_ref, db_ref,
                           dw1_ref, db1_ref, dw2_ref, db2_ref, drs_ref, *,
                           eps, n_rows, gelu_mode):
    _kernel_bwd_onepass(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        g_ref, dx_ref, ds_ref, db_ref, dw1_ref, db1_ref,
                        dw2_ref, db2_ref, None, eps=eps, n_rows=n_rows,
                        gelu_mode=gelu_mode, rs_ref=rs_ref, drs_ref=drs_ref)


def _pick_rows_onepass(rows: int, C: int, H: int, itemsize: int) -> int:
    """Row block for the one-pass backward: full-H weights (single
    buffer, constant index maps) + resident f32 dW1/dW2 + the row block's
    f32 hidden temps (z, dh) and bf16 casts."""
    budget = _MLP_VMEM_BUDGET
    fixed = 2 * C * H * itemsize + 2 * C * H * 4     # w1+w2, dW1+dW2
    for R in (256, 128, 64, 32, 16, 8):
        act = (R * C * (6 * itemsize + 20)   # x,g,dx x2buf + f32 row temps
               + R * H * (8 + 2 * itemsize))  # z+dh f32, h/dz bf16 casts
        if fixed + act <= budget:
            return R
    return 0


# one-pass backward: default OFF — measured 54.3 vs 60.2 clips/s on the
# B=16 pretrain step (2026-08-19). Removing the pair's duplicate
# recompute was not enough: the full-H resident dW1/dW2 leave only
# R=32-row blocks at stage 2 (12.6 MB of weights+grads in VMEM), and the
# dW accumulation chains serialize 784 sequential programs against the
# MXU, where the XLA backward's separate dots schedule freely against
# the rest of the graph. Kept as an opt-in measured experiment
# (CLOVER_MLP_BWD1=auto), parity-tested for both gelu modes.
_BWD_ONEPASS = _os.environ.get("CLOVER_MLP_BWD1", "0")


def _backward_onepass(x, scale, bias, w1, b1, w2, b2, row_scale, eps,
                      gelu_mode, g):
    if _BWD_ONEPASS == "0" or (not _on_tpu() and not _FORCE_PALLAS):
        return None
    rows, C = x.shape
    H = w1.shape[1]
    R = _pick_rows_onepass(rows, C, H, x.dtype.itemsize)
    if R == 0:
        return None
    n_i = pl.cdiv(rows, R)
    f32 = jnp.float32
    dt = x.dtype
    has_rs = row_scale is not None

    row_spec = pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vecC = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vecH = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    rs_spec = pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    args = [x, scale.astype(f32).reshape(1, C), bias.astype(f32).reshape(1, C),
            w1.astype(dt), b1.astype(f32).reshape(1, H),
            w2.astype(dt), b2.astype(f32).reshape(1, C), g.astype(dt)]
    in_specs = [row_spec, vecC, vecC, w1_spec, vecH, w2_spec, vecC, row_spec]
    out_specs = [row_spec, vecC, vecC, w1_spec, vecH, w2_spec, vecC]
    out_shapes = [jax.ShapeDtypeStruct((rows, C), dt),
                  jax.ShapeDtypeStruct((1, C), f32),
                  jax.ShapeDtypeStruct((1, C), f32),
                  jax.ShapeDtypeStruct((C, H), f32),
                  jax.ShapeDtypeStruct((1, H), f32),
                  jax.ShapeDtypeStruct((H, C), f32),
                  jax.ShapeDtypeStruct((1, C), f32)]
    kwargs = dict(eps=eps, n_rows=rows, gelu_mode=gelu_mode)
    if has_rs:
        args.append(row_scale.astype(f32).reshape(rows, 1))
        in_specs.append(rs_spec)
        out_specs.append(rs_spec)
        out_shapes.append(jax.ShapeDtypeStruct((rows, 1), f32))
        kern = functools.partial(_kernel_bwd_onepass_rs, **kwargs)
    else:
        kern = functools.partial(_kernel_bwd_onepass, out_extra=None, **kwargs)
    outs = pl.pallas_call(
        kern,
        grid=(n_i,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        cost_estimate=pl.CostEstimate(
            flops=(12 if has_rs else 10) * rows * C * H,
            bytes_accessed=(3 * rows * C + 2 * C * H) * x.dtype.itemsize
            + 2 * C * H * 4,
            transcendentals=2 * rows * H),
        interpret=not _on_tpu(),
    )(*args)
    dx, dscale, dbias, dw1, db1, dw2, db2 = outs[:7]
    result = (dx, dscale.reshape(C).astype(scale.dtype),
              dbias.reshape(C).astype(bias.dtype),
              dw1.astype(w1.dtype), db1.reshape(H).astype(b1.dtype),
              dw2.astype(w2.dtype), db2.reshape(C).astype(b2.dtype))
    if has_rs:
        drs = outs[7].reshape(row_scale.shape).astype(row_scale.dtype)
        return result + (drs,)
    return result + (None,)


def _backward_pallas(x, scale, bias, w1, b1, w2, b2, row_scale, eps, g):
    """(dx, dscale, dbias, dw1, db1, dw2, db2[, drs]) or None."""
    if not _on_tpu() and not _FORCE_PALLAS:
        return None
    rows, C = x.shape
    H = w1.shape[1]
    R, Hc = _pick_tiles_bwd(rows, C, H, x.dtype.itemsize)
    if R == 0:
        return None
    n_i, n_j = pl.cdiv(rows, R), H // Hc
    f32 = jnp.float32
    dt = x.dtype
    has_rs = row_scale is not None

    x_spec_i = pl.BlockSpec((R, C), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    vecC = pl.BlockSpec((1, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((C, Hc), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
    b1_spec = pl.BlockSpec((1, Hc), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((Hc, C), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)
    rs_spec = pl.BlockSpec((R, 1), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    args = [x, scale.astype(f32).reshape(1, C), bias.astype(f32).reshape(1, C),
            w1.astype(dt), b1.astype(f32).reshape(1, H),
            w2.astype(dt), b2.astype(f32).reshape(1, C),
            g.astype(dt)]
    in_specs = [x_spec_i, vecC, vecC, w1_spec, b1_spec, w2_spec, vecC,
                x_spec_i]
    out_specs = [x_spec_i, vecC, vecC, vecC]
    out_shapes = [jax.ShapeDtypeStruct((rows, C), dt),
                  jax.ShapeDtypeStruct((1, C), f32),
                  jax.ShapeDtypeStruct((1, C), f32),
                  jax.ShapeDtypeStruct((1, C), f32)]
    scratch = [pltpu.VMEM((R, C), f32)]
    kwargs = dict(eps=eps, n_chunks=n_j, n_rows=rows)
    if has_rs:
        rs32 = row_scale.astype(f32).reshape(rows, 1)
        args.append(rs32)
        in_specs.append(rs_spec)
        out_specs.append(rs_spec)
        out_shapes.append(jax.ShapeDtypeStruct((rows, 1), f32))
        scratch.append(pltpu.VMEM((R, C), f32))
        kern_a = functools.partial(_kernel_bwd_dx_rs, **kwargs)
    else:
        kern_a = functools.partial(_kernel_bwd_dx_nors, **kwargs)
    outs_a = pl.pallas_call(
        kern_a,
        grid=(n_i, n_j),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * C * H,
            bytes_accessed=(3 * rows * C + 2 * C * H) * x.dtype.itemsize,
            transcendentals=2 * rows * H),
        interpret=not _on_tpu(),
    )(*args)

    # kernel B: weight grads, row blocks innermost
    x_spec_b = pl.BlockSpec((R, C), lambda j, i: (i, 0),
                            memory_space=pltpu.VMEM)
    vecC_b = pl.BlockSpec((1, C), lambda j, i: (0, 0),
                          memory_space=pltpu.VMEM)
    w1_spec_b = pl.BlockSpec((C, Hc), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM)
    b1_spec_b = pl.BlockSpec((1, Hc), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM)
    w2_spec_b = pl.BlockSpec((Hc, C), lambda j, i: (j, 0),
                             memory_space=pltpu.VMEM)
    rs_spec_b = pl.BlockSpec((R, 1), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM)
    args_b = args[:6] + [args[7]]          # x, s, b, w1, b1, w2, g
    in_specs_b = [x_spec_b, vecC_b, vecC_b, w1_spec_b, b1_spec_b, w2_spec_b,
                  x_spec_b]
    kwargs_b = dict(eps=eps, n_i=n_i, n_rows=rows)
    if has_rs:
        args_b.append(rs32)
        in_specs_b.append(rs_spec_b)
        kern_b = functools.partial(_kernel_bwd_dw_rs, **kwargs_b)
    else:
        kern_b = functools.partial(_kernel_bwd_dw, **kwargs_b)
    dw1, db1, dw2 = pl.pallas_call(
        kern_b,
        grid=(n_j, n_i),
        in_specs=in_specs_b,
        out_specs=(w1_spec_b, b1_spec_b, w2_spec_b),
        out_shape=(jax.ShapeDtypeStruct((C, H), f32),
                   jax.ShapeDtypeStruct((1, H), f32),
                   jax.ShapeDtypeStruct((H, C), f32)),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * C * H,
            bytes_accessed=(2 * rows * C + 2 * C * H) * x.dtype.itemsize,
            transcendentals=2 * rows * H),
        interpret=not _on_tpu(),
    )(*args_b)

    dx, dscale, dbias, db2 = outs_a[:4]
    result = (dx, dscale.reshape(C).astype(scale.dtype),
              dbias.reshape(C).astype(bias.dtype),
              dw1.astype(w1.dtype), db1.reshape(H).astype(b1.dtype),
              dw2.astype(w2.dtype), db2.reshape(C).astype(b2.dtype))
    if has_rs:
        drs = outs_a[4].reshape(row_scale.shape).astype(row_scale.dtype)
        return result + (drs,)
    return result + (None,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_ln_mlp_residual(x, scale, bias, w1, b1, w2, b2, row_scale=None,
                          eps: float = 1e-5, gelu: str = "auto"):
    """x + row_scale * MLP(LN(x)) over 2-D x (rows, C); row_scale is the
    optional per-row DropPath factor (keep/keep_prob), None = 1.
    gelu: 'erf' (exact), 'tanh' (original-BERT approximation), or 'auto'
    (the CLOVER_MLP_GELU env default)."""
    return _forward(x, scale, bias, w1, b1, w2, b2, row_scale, eps,
                    _resolve_gelu(gelu))


def _fwd(x, scale, bias, w1, b1, w2, b2, row_scale, eps, gelu):
    mode = _resolve_gelu(gelu)
    if _stash_enabled():
        out, stash = _forward(x, scale, bias, w1, b1, w2, b2, row_scale, eps,
                              mode, want_stash=True)
        return out, (x, scale, bias, w1, b1, w2, b2, row_scale, stash)
    return _forward(x, scale, bias, w1, b1, w2, b2, row_scale, eps,
                    mode), (
        x, scale, bias, w1, b1, w2, b2, row_scale, None)


def _gelu_grad(z, mode: str):
    """d gelu(z)/dz for both activation modes (f32 in/out)."""
    if mode == "tanh":
        c = 0.7978845608028654
        u = c * (z + 0.044715 * z * z * z)
        t = jnp.tanh(u)
        return 0.5 * (1.0 + t) + 0.5 * z * (1.0 - t * t) * c * (
            1.0 + 0.134145 * z * z)
    return _erf_grad(z)


# A/B escape hatch: CLOVER_MLP_BWD_F32=1 restores the jax.vjp backward
# whose dot transposes consume the f32 cotangent directly (see below).
_BWD_F32 = _os.environ.get("CLOVER_MLP_BWD_F32", "0") == "1"

# HBM dtype for the backward's (rows, 4C) recompute crossings (z, dh, dz).
# The r3 train trace shows them materializing as f32 fusion roots
# (f32[25088,2048] conv_add per stage-2 block = 205 MB each, written once
# and read by two consumer GEMM fusions); 'bf16' casts them at the fusion
# root so half the bytes cross HBM. Extra bf16 rounding on z before
# gelu/gelu' is the same order as the bf16 dot-input rounding the forward
# already carries (knob-on parity pinned at 1.5e-2 normalized in
# tests/test_mlp_block_kernel.py). Default ON since r4: pretrain train
# 61.94 -> 64.20 clips/s alone, 65.62 composed with the barrier below
# (B=16, v5e). CLOVER_MLP_BWD_HBM=f32 restores exact-recompute crossings.
_BWD_HBM_BF16 = _os.environ.get("CLOVER_MLP_BWD_HBM", "bf16") != "f32"

# Stash the forward's pre-gelu hidden (bf16) + LN stats as extra fwd-kernel
# outputs and consume them in the backward instead of recomputing
# LN+fc1 — removes the fc1 recompute GEMM (~1.3 TF/step on the B=16
# pretrain step) and the LN-stats reduces from the backward at the cost
# of an extra (rows, 4C) bf16 HBM write+read (+~3.2 GB step residency at
# B=16 — fits; hbm_audit has headroom). Numerics: z crosses HBM as bf16,
# the SAME rounding class as CLOVER_MLP_BWD_HBM=bf16 (and slightly
# *closer* to the true forward, since the stashed z is the forward
# kernel's f32 accumulation, not a recomputed GEMM). Meaningless under
# remat (the fwd re-runs anyway); intended for the no-remat recipes.
# VERDICT r4 item 1's untried lever. Measured on the B=16 8-frame pretrain
# step (2026-08-21): 66.20 -> 68.03 clips/s (+2.8%, runs 67.8/67.9/68.0)
# — DEFAULT ON since r5. CLOVER_MLP_STASH=0 restores the recompute
# backward: set it for remat recipes (the fwd re-runs in the backward, so
# the stash is pure extra traffic) and memory-tight shapes (the 32f B=8
# remat-0,1 recipe HBM-OOMs with stash on: 16.15G/15.75G — bench and
# tools/train.py default it off whenever remat is enabled). Read at
# TRACE time so launchers can set the env after import; tests override
# the module attribute _STASH directly (None = defer to env).
_STASH = None


def _stash_enabled() -> bool:
    if _STASH is not None:
        return _STASH
    return _os.environ.get("CLOVER_MLP_STASH", "1") == "1"

# Materialize the incoming cotangent (and x) row-major before the
# backward math. The r4 train trace shows XLA fusing the upstream
# window-permutation into EVERY bwd consumer — the db/dscale reduces read
# an 8-D (32,1,4,2,7,2,7,C) f32 layout at ~110 GB/s (~0.47 ms each, ~9
# ms/step total). An optimization_barrier forces one clean row-major
# materialization instead of N permuted passes; numerically an identity.
# Default ON since r4: 61.94 -> 63.36 alone, 65.62 composed with the
# bf16-HBM knob (B=16, v5e). CLOVER_MLP_BWD_BARRIER=0 disables.
_BWD_BARRIER = _os.environ.get("CLOVER_MLP_BWD_BARRIER", "1") == "1"


def _xla_backward(x, scale, bias, w1, b1, w2, b2, row_scale, eps, mode, g):
    """Explicit recompute backward with bf16 GEMM operands throughout.

    jax.vjp of ``_xla_reference`` feeds the f32 cotangent straight into
    the w2-transpose dots: on the r3 pretrain HLO, ``dh = gy @ w2.T`` and
    ``dW2 = h.T @ gy`` compiled as f32-operand GEMMs — 2.42 TF/step at
    the MXU's fp32 rate (several x slower than bf16). This backward is
    the same math with every dot in (bf16, bf16) -> f32-accumulate form,
    the repo-wide precision convention (attention bwd kernels cast g the
    same way). The extra bf16 rounding on the cotangent is of the same
    order as the rounding the forward's bf16 dot inputs already carry;
    grads parity-tested against the f32-cotangent vjp in
    tests/test_mlp_block_kernel.py.
    """
    dt = x.dtype
    f32 = jnp.float32
    if _BWD_BARRIER:
        x, g = jax.lax.optimization_barrier((x, g))
    x32 = x.astype(f32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xn_raw = xc * inv
    y_bf = (xn_raw * scale + bias).astype(dt)
    w1_bf, w2_bf = w1.astype(dt), w2.astype(dt)
    z = jnp.dot(y_bf, w1_bf, preferred_element_type=f32) + b1
    if _BWD_HBM_BF16:
        # round-trip through dt at the fusion root: the (rows, H) GEMM
        # result crosses HBM as bf16; consumers re-expand in-fusion
        z = z.astype(dt).astype(f32)
    h = _gelu(z, mode)
    h_bf = h.astype(dt)

    g32 = g.astype(f32)
    rs = (None if row_scale is None
          else row_scale.astype(f32).reshape(-1, 1))
    gy = g32 * rs if rs is not None else g32
    gy_bf = gy.astype(dt)
    dh = jax.lax.dot_general(gy_bf, w2_bf, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    if _BWD_HBM_BF16:
        dh = dh.astype(dt).astype(f32)
    dz = dh * _gelu_grad(z, mode)
    dz_bf = dz.astype(dt)
    dy = jax.lax.dot_general(dz_bf, w1_bf, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dw1 = jax.lax.dot_general(y_bf, dz_bf, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    db1 = (jnp.sum(dz_bf.astype(f32), axis=0) if _BWD_HBM_BF16
           else jnp.sum(dz, axis=0))
    dw2 = jax.lax.dot_general(h_bf, gy_bf, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    db2 = jnp.sum(gy, axis=0)

    dyt = dy * scale
    m1 = jnp.mean(dyt, axis=-1, keepdims=True)
    m2 = jnp.mean(dyt * xn_raw, axis=-1, keepdims=True)
    dx = inv * (dyt - m1 - xn_raw * m2) + g32
    dscale = jnp.sum(dy * xn_raw, axis=0)
    dbias = jnp.sum(dy, axis=0)
    out = (dx.astype(dt), dscale.astype(scale.dtype),
           dbias.astype(bias.dtype), dw1.astype(w1.dtype),
           db1.astype(b1.dtype), dw2.astype(w2.dtype), db2.astype(b2.dtype))
    if rs is None:
        return out + (None,)
    mlp_out = jnp.dot(h_bf, w2_bf, preferred_element_type=f32) + b2
    drs = jnp.sum(g32 * mlp_out, axis=-1).reshape(row_scale.shape)
    return out + (drs.astype(row_scale.dtype),)


def _xla_backward_stash(x, scale, bias, w1, b1, w2, b2, row_scale, stash,
                        eps, mode, g):
    """``_xla_backward`` with the forward's stashed z (bf16) + LN stats:
    no fc1 recompute GEMM, no LN-stats reduces (xn_raw is one fused
    multiply-add pass over x). Shares the bf16-operand convention and the
    CLOVER_MLP_BWD_HBM semantics for the dh crossing (z itself is already
    a bf16 crossing by construction)."""
    z_bf, mean, inv = stash
    dt = x.dtype
    f32 = jnp.float32
    if _BWD_BARRIER:
        x, g, z_bf = jax.lax.optimization_barrier((x, g, z_bf))
    x32 = x.astype(f32)
    xn_raw = (x32 - mean) * inv
    y_bf = (xn_raw * scale + bias).astype(dt)
    w1_bf, w2_bf = w1.astype(dt), w2.astype(dt)
    z = z_bf.astype(f32)
    h = _gelu(z, mode)
    h_bf = h.astype(dt)

    g32 = g.astype(f32)
    rs = (None if row_scale is None
          else row_scale.astype(f32).reshape(-1, 1))
    gy = g32 * rs if rs is not None else g32
    gy_bf = gy.astype(dt)
    dh = jax.lax.dot_general(gy_bf, w2_bf, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    if _BWD_HBM_BF16:
        dh = dh.astype(dt).astype(f32)
    dz = dh * _gelu_grad(z, mode)
    dz_bf = dz.astype(dt)
    dy = jax.lax.dot_general(dz_bf, w1_bf, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dw1 = jax.lax.dot_general(y_bf, dz_bf, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    db1 = (jnp.sum(dz_bf.astype(f32), axis=0) if _BWD_HBM_BF16
           else jnp.sum(dz, axis=0))
    dw2 = jax.lax.dot_general(h_bf, gy_bf, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    db2 = jnp.sum(gy, axis=0)

    dyt = dy * scale
    m1 = jnp.mean(dyt, axis=-1, keepdims=True)
    m2 = jnp.mean(dyt * xn_raw, axis=-1, keepdims=True)
    dx = inv * (dyt - m1 - xn_raw * m2) + g32
    dscale = jnp.sum(dy * xn_raw, axis=0)
    dbias = jnp.sum(dy, axis=0)
    out = (dx.astype(dt), dscale.astype(scale.dtype),
           dbias.astype(bias.dtype), dw1.astype(w1.dtype),
           db1.astype(b1.dtype), dw2.astype(w2.dtype), db2.astype(b2.dtype))
    if rs is None:
        return out + (None,)
    mlp_out = jnp.dot(h_bf, w2_bf, preferred_element_type=f32) + b2
    drs = jnp.sum(g32 * mlp_out, axis=-1).reshape(row_scale.shape)
    return out + (drs.astype(row_scale.dtype),)


def _bwd(eps, gelu, residuals, g):
    x, scale, bias, w1, b1, w2, b2, row_scale, stash = residuals
    mode = _resolve_gelu(gelu)
    if stash is not None:
        return _xla_backward_stash(x, scale, bias, w1, b1, w2, b2,
                                   row_scale, stash, eps, mode, g)
    out = _backward_onepass(x, scale, bias, w1, b1, w2, b2, row_scale,
                            eps, mode, g)
    if out is not None:
        return out
    if _BWD_KERNEL and mode == "erf":
        # the opt-in bwd kernel pair hardcodes the erf gradient
        out = _backward_pallas(x, scale, bias, w1, b1, w2, b2, row_scale,
                               eps, g)
        if out is not None:
            return out
    if not _BWD_F32:
        return _xla_backward(x, scale, bias, w1, b1, w2, b2, row_scale,
                             eps, mode, g)
    if row_scale is None:
        _, vjp = jax.vjp(
            lambda *a: _xla_reference(*a, None, eps, mode),
            x, scale, bias, w1, b1, w2, b2)
        return vjp(g) + (None,)
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, eps, mode),
        x, scale, bias, w1, b1, w2, b2, row_scale)
    return vjp(g)


fused_ln_mlp_residual.defvjp(_fwd, _bwd)
