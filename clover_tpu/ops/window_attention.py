"""Fused 3D shifted-window attention (Pallas TPU kernel).

The hot op of the Swin backbone (SURVEY.md §7.3 #2). The XLA path
materializes the (Bn, nH, N, N) logits tensor in HBM twice (write after
QK^T+bias+mask, read for softmax·V) — at stage 1 of Swin-B that is
hundreds of MB per step. This kernel keeps the whole
QK^T -> +bias -> +shift-mask -> softmax -> ·V chain for one (window, head)
in VMEM.

Forward is a Pallas kernel; backward (custom VJP) recomputes with plain
XLA einsums — still saving the forward HBM traffic and activation memory.
A fully fused backward kernel is a later optimization.

Layout: q, k, v (Bn, nH, N, hd); bias (nH, N, N) fp32; mask (nW, N, N)
fp32 or None with Bn % nW == 0 (windows of one clip are contiguous).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)          # (N, hd)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)       # (N, N)
    logits = logits + bias_ref[0]
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _attn_kernel_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *,
                        scale: float):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = logits + bias_ref[0] + mask_ref[0]
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _interpret() -> bool:
    # Mosaic only exists on TPU; interpret mode keeps CPU tests/goldens honest
    return jax.default_backend() != "tpu"


def _pick_window_block(Bn: int, nH: int, N: int, hd: int, itemsize: int,
                       nW: Optional[int], budget: int = 4 * 2 ** 20) -> int:
    """Largest per-program window count fitting the VMEM budget.

    Per program: qkv blocks (3*W*nH*N*hd*itemsize), bias (nH*N*N*4),
    mask (W*N*N*4), logits+probs scratch (~2*N*N*4 live per head step).
    Must divide Bn; with a mask must also divide nW. The budget is set
    well under the 16 MB VMEM because Mosaic double-buffers grid blocks
    (empirically: 10 MB estimates OOM the compiler, 4 MB is safe).
    """
    for w in (16, 8, 4, 2, 1):
        if Bn % w:
            continue
        if nW is not None and (w > nW or nW % w):
            continue
        need = (3 * w * nH * N * hd * itemsize + nH * N * N * 4
                + (w * N * N * 4 if nW is not None else 0)
                + 2 * w * N * N * 4          # logits + probs live per head step
                + w * nH * N * hd * itemsize)
        if need <= budget:
            return w
    return 0  # infeasible even at w=1 (e.g. the bias table alone is too big)


def _attn_kernel_v2(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale, nH):
    """All heads of a W-window block per program; batched MXU dots."""
    for h in range(nH):
        q = q_ref[:, h].astype(jnp.float32)       # (W, N, hd)
        k = k_ref[:, h].astype(jnp.float32)
        v = v_ref[:, h].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q * scale, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # (W, N, N)
        logits = logits + bias_ref[h][None]
        probs = jax.nn.softmax(logits, axis=-1)
        out = jax.lax.dot_general(
            probs, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, h] = out.astype(out_ref.dtype)


def _attn_kernel_v2_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *,
                           scale, nH):
    for h in range(nH):
        q = q_ref[:, h].astype(jnp.float32)
        k = k_ref[:, h].astype(jnp.float32)
        v = v_ref[:, h].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q * scale, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        logits = logits + bias_ref[h][None] + mask_ref[:]
        probs = jax.nn.softmax(logits, axis=-1)
        out = jax.lax.dot_general(
            probs, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, h] = out.astype(out_ref.dtype)


def _pick_window_block_v4(Bn: int, nH: int, N: int, hd: int, itemsize: int,
                          nW: Optional[int], budget: int = 4 * 2 ** 20) -> int:
    """v4 live set: ALL heads' f32 logits+probs at once plus f32 qkv copies
    (the price of the single batched dot)."""
    for w in (16, 8, 4, 2, 1):
        if Bn % w:
            continue
        if nW is not None and (w > nW or nW % w):
            continue
        need = (3 * w * nH * N * hd * (itemsize + 4)   # qkv blocks + f32 copies
                + nH * N * N * 4                        # bias
                + (w * N * N * 4 if nW is not None else 0)
                + 2 * w * nH * N * N * 4                # logits + probs (all heads)
                + w * nH * N * hd * (itemsize + 4))     # out + f32 out
        if need <= budget:
            return w
    return 0


def _attn_kernel_v4(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale, nH):
    """v2 I/O layout, but ONE batched dot over (W*nH) instead of a python
    head loop — fewer, larger MXU dispatches; (N, hd) tiles unchanged so
    the (W, nH) -> (W*nH) collapse is layout-trivial for Mosaic."""
    W, _, N, hd = q_ref.shape
    q = q_ref[:].reshape(W * nH, N, hd).astype(jnp.float32)
    k = k_ref[:].reshape(W * nH, N, hd).astype(jnp.float32)
    v = v_ref[:].reshape(W * nH, N, hd).astype(jnp.float32)
    logits = jax.lax.dot_general(
        q * scale, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (W*nH, N, N)
    logits = logits.reshape(W, nH, N, N) + bias_ref[:][None]
    probs = jax.nn.softmax(logits, axis=-1).reshape(W * nH, N, N)
    out = jax.lax.dot_general(
        probs, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[:] = out.reshape(W, nH, N, hd).astype(out_ref.dtype)


def _attn_kernel_v4_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref,
                           *, scale, nH):
    W, _, N, hd = q_ref.shape
    q = q_ref[:].reshape(W * nH, N, hd).astype(jnp.float32)
    k = k_ref[:].reshape(W * nH, N, hd).astype(jnp.float32)
    v = v_ref[:].reshape(W * nH, N, hd).astype(jnp.float32)
    logits = jax.lax.dot_general(
        q * scale, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    logits = (logits.reshape(W, nH, N, N) + bias_ref[:][None]
              + mask_ref[:][:, None])
    probs = jax.nn.softmax(logits, axis=-1).reshape(W * nH, N, N)
    out = jax.lax.dot_general(
        probs, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[:] = out.reshape(W, nH, N, hd).astype(out_ref.dtype)


def _xla_attention(q, k, v, bias, mask, scale):
    probs = _xla_probs(q, k, bias, mask, scale)
    return jnp.einsum("bhqk,bhkd->bhqd", probs,
                      v.astype(jnp.float32)).astype(q.dtype)


def _forward_v2(q, k, v, bias, mask, scale, version="v2"):
    Bn, nH, N, hd = q.shape
    nW = None if mask is None else mask.shape[0]
    if version == "v4":
        W = _pick_window_block_v4(Bn, nH, N, hd, q.dtype.itemsize, nW)
    else:
        W = _pick_window_block(Bn, nH, N, hd, q.dtype.itemsize, nW)
    if W == 0:
        # per-head working set exceeds VMEM (long-context windows, e.g.
        # 32-frame eval: bias alone is nH*392^2*4 bytes); flash-style
        # key tiling is the follow-up — fall back to XLA
        return _xla_attention(q, k, v, bias, mask, scale)
    if version == "v4":
        kern, kern_masked = _attn_kernel_v4, _attn_kernel_v4_masked
    else:
        kern, kern_masked = _attn_kernel_v2, _attn_kernel_v2_masked
    qkv_spec = pl.BlockSpec((W, nH, N, hd), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nH, N, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * 2 * Bn * nH * N * N * hd,
        bytes_accessed=4 * Bn * nH * N * hd * q.dtype.itemsize + nH * N * N * 4,
        transcendentals=Bn * nH * N * N,
    )
    if mask is None:
        return pl.pallas_call(
            functools.partial(kern, scale=scale, nH=nH),
            grid=(Bn // W,),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=qkv_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            cost_estimate=cost,
            interpret=_interpret(),
        )(q, k, v, bias)
    # index_map returns BLOCK indices (element offset = index * block dim):
    # block j of W windows covers masks [j*W, (j+1)*W), and window-block i
    # starts at window i*W whose mask offset is (i*W) % nW -> block i % (nW//W)
    mask_spec = pl.BlockSpec((W, N, N), lambda i: (i % (nW // W), 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kern_masked, scale=scale, nH=nH),
        grid=(Bn // W,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=cost,
        interpret=_interpret(),
    )(q, k, v, bias, mask)


def _forward(q, k, v, bias, mask, scale):
    Bn, nH, N, hd = q.shape
    qkv_spec = pl.BlockSpec((1, 1, N, hd), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, N, N), lambda b, h: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, N, hd), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * 2 * Bn * nH * N * N * hd,
        bytes_accessed=(3 * Bn * nH * N * hd + Bn * nH * N * hd) * q.dtype.itemsize
        + nH * N * N * 4,
        transcendentals=Bn * nH * N * N,
    )
    if mask is None:
        return pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale),
            grid=(Bn, nH),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            cost_estimate=cost,
            interpret=_interpret(),
        )(q, k, v, bias)
    nW = mask.shape[0]
    mask_spec = pl.BlockSpec((1, N, N), lambda b, h: (b % nW, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_masked, scale=scale),
        grid=(Bn, nH),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=cost,
        interpret=_interpret(),
    )(q, k, v, bias, mask)


def _xla_probs(q, k, bias, mask, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    logits = logits + bias[None]
    if mask is not None:
        nW = mask.shape[0]
        Bn, nH, N, _ = logits.shape
        logits = logits.reshape(Bn // nW, nW, nH, N, N) + mask[None, :, None]
        logits = logits.reshape(Bn, nH, N, N)
    return jax.nn.softmax(logits, axis=-1)


# ------------------------------------------------------------------ v3
# Fully fused path: windows are indexed straight out of the (B, D, H, W, ...)
# feature layout by BlockSpec index maps, so the 8-D window_partition /
# window_reverse transposes (measured ~19% of eval step time as XLA copies)
# never materialize. qkv/proj matmuls stay in XLA (big MXU shapes).


def _attn_kernel_v3(qkv_ref, bias_ref, out_ref, *, scale, nH):
    # qkv_ref block: (1, wd, wh, ww, 3, nH, hd); Mosaic tiling requires the
    # block's LAST TWO dims be full/aligned, so (nH, hd) stay whole and the
    # head loop lives inside.
    blk = qkv_ref[0]                              # (wd, wh, ww, 3, nH, hd)
    wd, wh, ww, _, _, hd = blk.shape
    N = wd * wh * ww
    qkv = blk.reshape(N, 3, nH, hd).astype(jnp.float32)
    for h in range(nH):
        q, k, v = qkv[:, 0, h], qkv[:, 1, h], qkv[:, 2, h]
        logits = jax.lax.dot_general(
            q * scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        logits = logits + bias_ref[h]
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
        out_ref[0, :, :, :, h, :] = out.reshape(wd, wh, ww, hd).astype(
            out_ref.dtype)


def _attn_kernel_v3_masked(qkv_ref, bias_ref, mask_ref, out_ref, *, scale, nH):
    blk = qkv_ref[0]
    wd, wh, ww, _, _, hd = blk.shape
    N = wd * wh * ww
    qkv = blk.reshape(N, 3, nH, hd).astype(jnp.float32)
    mask = mask_ref[0, 0, 0]
    for h in range(nH):
        q, k, v = qkv[:, 0, h], qkv[:, 1, h], qkv[:, 2, h]
        logits = jax.lax.dot_general(
            q * scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        logits = logits + bias_ref[h] + mask
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
        out_ref[0, :, :, :, h, :] = out.reshape(wd, wh, ww, hd).astype(
            out_ref.dtype)


def _v3_feasible(nH, N, C, itemsize, budget: int = 8 * 2 ** 20) -> bool:
    need = (2 * 3 * N * C * itemsize     # double-buffered qkv block
            + nH * N * N * 4             # bias (all heads resident)
            + 2 * N * N * 4              # logits + probs
            + 2 * N * C * itemsize       # out block
            + 2 * N * N * 4)             # mask block
    return need <= budget


def fused_partition_window_attention(qkv, bias, mask, window, scale):
    """Window attention straight on the spatial layout.

    qkv    (B, Dp, Hp, Wp, 3, nH, hd)  — padded and (if shifted) pre-rolled
    bias   (nH, N, N) fp32
    mask   (nWd, nWh, nWw, N, N) fp32 or None
    window (wd, wh, ww); Dp/Hp/Wp divisible by it.
    Returns (B, Dp, Hp, Wp, nH, hd).

    STATUS: compiles in interpret mode (CPU) and is numerically exact, but
    real-TPU Mosaic rejects the in-kernel (wd,wh,ww,...)->(N,...) collapse
    for 7-wide windows ("infer-vector-layout: unsupported shape cast") —
    the 7x7 window is misaligned with the 8x128 vector tiles, which is the
    same reason the XLA path pays relayout copies. On TPU this routes to
    the XLA reference; revisit with an 8x8-padded window layout.
    """
    B, Dp, Hp, Wp, _, nH, hd = qkv.shape
    wd, wh, ww = window
    N = wd * wh * ww
    mosaic_ok = (ww % 8 == 0) or _interpret()
    if not mosaic_ok or not _v3_feasible(nH, N, nH * hd, qkv.dtype.itemsize):
        return _xla_spatial_reference(qkv, bias, mask, window, scale)
    grid = (B, Dp // wd, Hp // wh, Wp // ww)
    qkv_spec = pl.BlockSpec(
        (1, wd, wh, ww, 3, nH, hd),
        lambda b, i, j, k: (b, i, j, k, 0, 0, 0),
        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nH, N, N), lambda b, i, j, k: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, wd, wh, ww, nH, hd),
        lambda b, i, j, k: (b, i, j, k, 0, 0),
        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, Dp, Hp, Wp, nH, hd), qkv.dtype)
    cost = pl.CostEstimate(
        flops=2 * 2 * B * (Dp // wd) * (Hp // wh) * (Wp // ww) * nH * N * N * hd,
        bytes_accessed=2 * qkv.size * qkv.dtype.itemsize,
        transcendentals=B * nH * N * N * (Dp // wd) * (Hp // wh) * (Wp // ww),
    )
    if mask is None:
        return pl.pallas_call(
            functools.partial(_attn_kernel_v3, scale=scale, nH=nH),
            grid=grid,
            in_specs=[qkv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv, bias)
    mask_spec = pl.BlockSpec(
        (1, 1, 1, N, N), lambda b, i, j, k: (i, j, k, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_v3_masked, scale=scale, nH=nH),
        grid=grid,
        in_specs=[qkv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=_interpret(),
    )(qkv, bias, mask)


def _xla_spatial_reference(qkv, bias, mask, window, scale):
    """XLA math for fused_partition_window_attention (bwd recompute + tests)."""
    B, Dp, Hp, Wp, _, nH, hd = qkv.shape
    wd, wh, ww = window
    N = wd * wh * ww
    x = qkv.reshape(B, Dp // wd, wd, Hp // wh, wh, Wp // ww, ww, 3, nH, hd)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7, 8, 9)      # B,gd,gh,gw,wd,wh,ww,3,nH,hd
    x = x.reshape(-1, N, 3, nH, hd)
    q = x[:, :, 0].transpose(0, 2, 1, 3)               # (Bn, nH, N, hd)
    k = x[:, :, 1].transpose(0, 2, 1, 3)
    v = x[:, :, 2].transpose(0, 2, 1, 3)
    flat_mask = None if mask is None else mask.reshape(-1, N, N)
    out = _xla_attention(q, k, v, bias, flat_mask, scale)  # (Bn, nH, N, hd)
    out = out.transpose(0, 2, 1, 3).reshape(
        B, Dp // wd, Hp // wh, Wp // ww, wd, wh, ww, nH, hd)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7, 8)
    return out.reshape(B, Dp, Hp, Wp, nH, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def spatial_window_attention(qkv, bias, mask, window, scale):
    """Differentiable wrapper over fused_partition_window_attention."""
    return fused_partition_window_attention(qkv, bias, mask, window, scale)


def _spatial_fwd(qkv, bias, mask, window, scale):
    return (fused_partition_window_attention(qkv, bias, mask, window, scale),
            (qkv, bias, mask))


def _spatial_bwd(window, scale, residuals, g):
    qkv, bias, mask = residuals
    if mask is None:
        _, vjp = jax.vjp(
            lambda a, b: _xla_spatial_reference(a, b, None, window, scale),
            qkv, bias)
        dq, db = vjp(g)
        return dq, db, None
    _, vjp = jax.vjp(
        lambda a, b, m: _xla_spatial_reference(a, b, m, window, scale),
        qkv, bias, mask)
    return vjp(g)


spatial_window_attention.defvjp(_spatial_fwd, _spatial_bwd)


# ---------------------------------------------------------------- flat v5
# Lessons from v1-v4 (BASELINE.md kernel log): (a) they lost to XLA because
# they cast q/k/v to fp32 BEFORE the dots — fp32 MXU throughput is ~8x below
# bf16-with-fp32-accumulate (the winning fused-MLP kernel feeds bf16); (b)
# the (Bn, N, 3C) -> (Bn, nH, N, hd) head relayout they required is itself
# ~10% of step time (why 'xla_headloop' beat 'xla'). v5 fixes both: it takes
# the flat qkv STRAIGHT from the dense output, slices heads in VMEM at
# static lane offsets (python-unrolled head loop, no HBM relayout), keeps
# dots in the input dtype with fp32 accumulation, and fuses bias+mask+softmax
# so the (Bn, nH, N, N) logits never touch HBM. bias/mask ride in the
# compute dtype (the XLA paths also add them in bf16) so the all-heads bias
# block fits VMEM up to stage 4 of Swin-B.



def _mask_block_need(w: int, Np_s: int, Np_l: int, hd: int, itemsize: int,
                     nW, nr, *, f32_copy: bool = True) -> int:
    """VMEM bytes for the shift-mask blocks of one program: region lanes
    ((W, N, nr) x2 + the two (W, N, hd+nr) concat temporaries) when nr is
    set, else the classic additive (W, N, N) block x2 (+ its f32 copy on
    forward paths). Shared by every picker so the estimates stay in
    lockstep (divergence here caused a real scoped-vmem compile OOM)."""
    if nr is not None:
        return (2 * w * Np_s * _pad_to(nr, 128) * itemsize
                + 2 * w * Np_s * _pad_to(hd + nr, 128) * itemsize)
    if nW is not None:
        return (2 * w * Np_s * Np_l * itemsize
                + (w * Np_s * Np_l * 4 if f32_copy else 0))
    return 0


import os as _os

# bf16 exp experiment: the (W, N, N) exp is the kernel's largest VPU pass;
# packed-bf16 VPU ops run 2 lanes/cycle. After the max subtraction the
# argument is in (-inf, 0] and exp in [0, 1], where bf16's 8-bit mantissa
# bounds the per-weight relative error at ~0.4% — the probs are cast to
# bf16 for the pv dot anyway, so only the normalizer loses precision
# (summed in fp32).
_EXP_BF16 = _os.environ.get("CLOVER_WA_EXP_BF16", "0") != "0"


def _vmem_softmax(logits, out_dtype):
    """Softmax over the last axis with reciprocal-multiply normalization:
    the VPU divide on the full (W, N, N) block is multi-cycle per element;
    reciprocal on the (W, N, 1) denominator + a 1-cycle multiply is
    measurably cheaper at N=392 (BASELINE.md kernel log)."""
    m = jnp.max(logits, axis=-1, keepdims=True)
    if _EXP_BF16:
        e = jnp.exp((logits - m).astype(jnp.bfloat16))
        r = jax.lax.reciprocal(
            jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32))
        return (e * r.astype(jnp.bfloat16)).astype(out_dtype)
    e = jnp.exp(logits - m)
    r = jax.lax.reciprocal(jnp.sum(e, axis=-1, keepdims=True))
    return (e * r).astype(out_dtype)


# Fused-sum softmax·V: the kernels' VPU bottleneck is the per-logit softmax
# passes over the (W, N, N) block (the 32-frame profile put the attention
# kernels at ~17-31% MXU — VPU-bound). The row normalizer can ride the PV
# matmul for free: append a ones column to v so o[:, :, hd] accumulates
# sum(e) inside the SAME dot (hd=32 output lanes pad to 128 anyway — the
# extra column costs zero MXU time), then normalize the (N, hd) output
# instead of the (N, N) probs. Cuts the N^2 VPU passes from
# max/exp/sum/normalize (~4 reads + 2 writes) to max/exp (~2 reads + 1
# write). Numerics: e is cast to the compute dtype before the dot exactly
# like the normalized probs were, and the division happens in fp32 on the
# fp32 dot accumulator — same rounding count as the normalize-first order
# (parity-tested vs the XLA reference).
_FUSED_SUM = _os.environ.get("CLOVER_WA_FUSED_SUM", "1") != "0"

# Static-shift softmax (CLOVER_WA_NO_MAX, default 'auto'): skip the
# row-max reduce pass and compute exp(logits - static_shift) with a shift
# chosen per kernel call (130 when +100 region lanes ride the logits, 30
# otherwise). exp(x-s)/sum(exp(x-s)) == exp(x-m)/sum(exp(x-m)) exactly in
# real arithmetic — only fp rounding of the common scale differs. SAFE
# ONLY under a bounded-logit assumption |q·kᵀ·scale + bias| <= ~55: exp
# underflows at arg ~ -88 (an all-underflow row gives 0/0 = NaN) and
# overflows at ~ +88; the true row max has neither failure mode. 'auto'
# therefore uses the bare static shift on DETERMINISTIC (eval) passes —
# trained checkpoints have bounded logits — and the CLAMPED static shift
# on training passes: clamping the shifted argument to [-80, 80] makes
# exp overflow/underflow impossible for ANY logits (one extra fused VPU
# min; values only distort if a logit exceeds shift+80, i.e. a diverged
# model — they can never NaN), capturing the forced-shift training win
# (54.5 -> 55.9 clips/s) without its blow-up risk. '1' forces the bare
# shift everywhere (the historical forced mode), '0' disables (true
# row-max everywhere). Measured: 8-frame eval 520 -> 591 clips/s
# (+13.7%), 32-frame 138.4 -> 143.5 (+3.7%), train +2.4% forced.
_NO_MAX_MODE = _os.environ.get("CLOVER_WA_NO_MAX", "auto")


def no_max_enabled(deterministic: bool):
    """Static-shift softmax mode for this pass: False (true row-max),
    True (bare static shift — eval bounded-logit contract), or "clamp"
    (static shift + two-sided clamp — training-safe)."""
    if _NO_MAX_MODE == "auto":
        return True if deterministic else "clamp"
    if _NO_MAX_MODE == "0":
        return False
    return True


# ---- CLOVER_WA_DEBUG=1: logit-bound diagnostic for the static-shift ----
# softmax modes. Clamp-mode training passes distort SILENTLY once any
# logit drifts past static_shift + CLAMP_HALF_WIDTH (the forward clamps,
# the bwd recomputes the same clamped softmax — no NaN, no signal); the
# bare-shift eval mode relies on the bounded-logit contract outright.
# With the flag on, every instrumented attention entry recomputes
# max(logits) - static_shift in XLA (an extra QK^T — debug-only cost) and
# reports it host-side via jax.debug.callback: LOGIT_DEBUG_WORST keeps
# the worst value per (path, nH, N) tag for trainers/tests to read, and a
# warning fires the moment the safe half-width is exceeded. Instrumented
# paths: flat / flat2 kernels (eval + their train fallbacks) and the
# fused attn-block half (the training hot path, ops/attn_block.py).
# NOTE: jax.debug.callback needs host send/recv, which the axon TPU
# relay in this image does NOT support (UNIMPLEMENTED at dispatch) —
# use the flag on directly-attached TPU/CPU hosts only (r5).
_WA_DEBUG = _os.environ.get("CLOVER_WA_DEBUG", "0") == "1"
CLAMP_HALF_WIDTH = 80.0
LOGIT_DEBUG_WORST: dict = {}


def logit_debug_enabled() -> bool:
    return _WA_DEBUG


def reset_logit_debug() -> None:
    LOGIT_DEBUG_WORST.clear()


def _logit_debug_record(tag, max_arg) -> None:
    """Host-side sink for the debug callback (tag -> worst shifted arg)."""
    m = float(max_arg)
    worst = LOGIT_DEBUG_WORST.get(tag)
    if worst is None or m > worst:
        LOGIT_DEBUG_WORST[tag] = m
    if m > CLAMP_HALF_WIDTH:
        import warnings

        warnings.warn(
            f"static-shift softmax out of bounds at {tag}: max shifted "
            f"logit {m:.1f} > {CLAMP_HALF_WIDTH:.0f}. Clamp-mode passes "
            f"are now DISTORTING attention (bare-shift eval passes may "
            f"overflow); the model has likely diverged.", RuntimeWarning,
            stacklevel=2)


def debug_logit_check(qkv, bias, mask, scale, num_heads, tag: str) -> None:
    """Recompute max(q·kᵀ·scale + bias (+mask)) - static_shift in XLA and
    report it host-side. qkv is the flat (Bn, N, 3C) packed projection;
    mask may be additive (nW, N, N) or region-lanes (nW, N, nr). The
    shifted arg is computed in the ADDITIVE frame with shift 30 — the
    lanes kernels' +100·δ logits with shift 130 produce identical shifted
    args, so one frame covers both. No-op unless CLOVER_WA_DEBUG=1."""
    if not _WA_DEBUG:
        return
    Bn, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    f32 = jnp.float32
    q = qkv[:, :, :C].reshape(Bn, N, num_heads, hd).astype(f32)
    k = qkv[:, :, C:2 * C].reshape(Bn, N, num_heads, hd).astype(f32)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * f32(scale), k)
    logits = logits + bias[None].astype(f32)
    if mask is not None:
        add = lanes_to_additive(mask.astype(f32)) if _is_lanes(mask) \
            else mask.astype(f32)
        nW = add.shape[0]
        logits = (logits.reshape(Bn // nW, nW, num_heads, N, N)
                  + add[None, :, None]).reshape(Bn, num_heads, N, N)
    max_arg = jnp.max(logits) - f32(30.0)
    jax.debug.callback(_logit_debug_record, tag, max_arg)

# Region-lanes shift mask: mask = -100*(1 - delta_same_region) and
# delta = R·Rᵀ for a per-window region one-hot R (<= 8 columns). Appending
# the 0/10-valued R columns to the q and k head slices inside the hd -> 128
# lane padding makes the mask ride the SAME QK^T matmul (logits += 100·δ,
# softmax-equivalent up to a per-row constant) at zero MXU cost — the
# (W, N, N) mask add pass and the (nW, N, N) mask VMEM block disappear.
# CONVENTION: a mask argument of shape (nW, N, nr) with nr != N is the
# lanes form (swin3d.shift_region_lanes); (nW, N, N) is the additive form.
# Only fp32-logit paths may consume lanes (+100 on LIVE logits costs
# ~0.5 ulp in bf16; the -100 form only perturbs suppressed entries).
_MASK_LANES = _os.environ.get("CLOVER_WA_MASK_LANES", "1") != "0"


def mask_lanes_enabled() -> bool:
    """Callers (swin3d) build the shift mask in region-lanes form for the
    fp32-logit kernel paths when this is on (CLOVER_WA_MASK_LANES)."""
    return _MASK_LANES


def _is_lanes(mask) -> bool:
    return mask is not None and mask.shape[-1] != mask.shape[-2]


def lanes_to_additive(lanes):
    """(nW, N, nr) 0/10 region lanes -> the classic (nW, N, N) additive
    0/-100 mask (exactly shift_attn_mask's values), for XLA fallbacks."""
    return jnp.einsum("wnr,wmr->wnm", lanes, lanes) - 100.0


def _softmax_pv(logits, v, out_dtype, static_shift=None, clamp_hi=False):
    """(softmax(logits, -1) · v) for logits (W, N, N) f32, v (W, N, hd)
    compute-dtype. Returns (W, N, hd) in out_dtype. static_shift: with
    CLOVER_WA_NO_MAX, subtract this constant instead of the row max
    (see _NO_MAX for the bounded-logit contract). clamp_hi: also clamp
    the shifted argument at +80 so exp cannot overflow — what makes the
    static shift safe on TRAINING passes, where logits can drift past the
    eval bounded-logit contract (values distort only when a logit exceeds
    shift+80, i.e. a diverged model; they can never NaN)."""
    hd = v.shape[-1]
    if not _FUSED_SUM or hd % 128 == 0:
        # full lane tiles: the ones column would add a whole extra tile
        probs = _vmem_softmax(logits, v.dtype)
        o = jax.lax.dot_general(
            probs, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return o.astype(out_dtype)
    if static_shift is not None:
        # low-side clamp: if a whole row's live logits drifted below the
        # exp underflow point the row would sum to 0 -> 0/0 NaN; clamping
        # at -80 turns that tail case into near-uniform attention instead
        # (e^-80 ~ 2e-35 is normal in bf16 and far below any live weight,
        # and for lanes blocks the off-region entries stay >= e^50-fold
        # suppressed unless the row max itself is ~-50). The high side is
        # covered by the shift (see _NO_MAX_MODE contract) on eval passes,
        # by the clamp_hi bound on training passes. One VPU max per logit,
        # fused into the exp pass — measured free.
        arg = jnp.maximum(logits - jnp.float32(static_shift),
                          jnp.float32(-80.0))
        if clamp_hi:
            arg = jnp.minimum(arg, jnp.float32(80.0))
    else:
        m = jnp.max(logits, axis=-1, keepdims=True)
        arg = logits - m
    if _EXP_BF16 and v.dtype == jnp.bfloat16:
        # packed-bf16 exp runs 2 lanes/cycle; after the shift the argument
        # is <= 0 where bf16's relative error on exp is ~0.4%/weight
        e = jnp.exp(arg.astype(jnp.bfloat16))
    else:
        e = jnp.exp(arg).astype(v.dtype)
    v1 = jnp.concatenate(
        [v, jnp.ones(v.shape[:-1] + (1,), v.dtype)], axis=-1)
    o = jax.lax.dot_general(
        e, v1, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (W, N, hd+1) f32
    return (o[:, :, :hd]
            * jax.lax.reciprocal(o[:, :, hd:])).astype(out_dtype)


_BWD_DELTA = _os.environ.get("CLOVER_WA_BWD_DELTA", "0") == "1"


def _bwd_softmax_core(logits, v, g_h, dt, no_max, lanes):
    """Delta-trick softmax backward shared by every fused bwd kernel (r3).

    Replaces the materialize-p32 form (max/sub/exp/sum/normalize/cast +
    dp·p multiply + row reduce + dlog ≈ 9 N² VPU passes) with the
    flash-attention backward identity sum_k(dp·p)[q] = g[q]·out[q]:

      e   = exp(logits - shift)            # static shift/clamp matches the
                                           # forward (same softmax values)
      oa  = e_b · [v | 1]                  # unnormalized out + row sum s,
                                           # riding ONE (hd+1)-lane dot
      D   = rowsum(g ⊙ oa[:hd]) / s        # the (N, hd) delta reduce
      dv  = e_bᵀ · (g / s)                 # 1/s folded into a row scale
      dlog = e ⊙ ((dp − D) / s)

    N² VPU passes drop to ~5 (exp incl. fused shift-clamp, e cast, fused
    dlog mul-sub, dlog cast) for one extra (N, hd+1)-lane MXU dot — free
    at hd=32 where output lanes pad to 128 anyway. The stage-2 train
    profile showed the bwd kernels at 4.2x their forwards on 2.5x the
    flops — these passes were the gap.

    Exactness: with ``no_max`` the recompute uses the SAME static
    shift/clamp as the forward kernel, so p matches the forward's softmax
    bit-for-bit up to fp rounding of the shared scale; with no_max=False
    the true row max is used (mathematically the same softmax either way).

    The delta form is opt-in (CLOVER_WA_BWD_DELTA=1): it MEASURED SLOWER
    end-to-end (52.1 vs 55.3 clips/s pretrain train, 2026-08-19) — see
    the inline note. The shipped default keeps the p32 form with the
    static-shift recompute.

    logits (..., Nq, Nk) f32; v (..., Nk, hd), g_h (..., Nq, hd) in dt.
    Returns (dv f32 (..., Nk, hd), dlog f32 (..., Nq, Nk), dlog_b dt);
    works batched (W, ...) or unbatched (flat2's per-window 2-D slices).
    """
    nb = logits.ndim - 2
    bd = tuple(range(nb))
    hd = v.shape[-1]
    if no_max:
        shift = 130.0 if lanes else 30.0
        arg = jnp.maximum(logits - jnp.float32(shift), jnp.float32(-80.0))
        if no_max == "clamp":
            arg = jnp.minimum(arg, jnp.float32(80.0))
    else:
        arg = logits - jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(arg)
    if not _BWD_DELTA or hd % 128 == 0:
        # p32 form — MEASURED FASTER than the delta form below on the
        # pretrain train step (55.3 vs 52.1 clips/s, 2026-08-19), matching
        # the r2 finding that the r-factored softmax vjp lost ~5%: these
        # kernels are MXU/dependency-bound at train shapes, and the delta
        # form's extra dot + row-broadcast chain (e -> oa -> 1/s -> gp ->
        # dv) serializes against the MXU where the p32 form's dv consumed
        # a VPU-only input. The static shift above still applies (pure
        # reduce removal). hd % 128 == 0 also lands here (the ones column
        # would cost a whole extra lane tile — _softmax_pv's gate).
        p32 = e * jax.lax.reciprocal(jnp.sum(e, axis=-1, keepdims=True))
        p = p32.astype(dt)
        dv = jax.lax.dot_general(p, g_h, (((nb,), (nb,)), (bd, bd)),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(g_h, v, (((nb + 1,), (nb + 1,)), (bd, bd)),
                                 preferred_element_type=jnp.float32)
        dlog = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
        return dv, dlog, dlog.astype(dt)
    e_b = e.astype(dt)
    v1 = jnp.concatenate([v, jnp.ones(v.shape[:-1] + (1,), dt)], axis=-1)
    oa = jax.lax.dot_general(e_b, v1, (((nb + 1,), (nb,)), (bd, bd)),
                             preferred_element_type=jnp.float32)
    inv = jax.lax.reciprocal(oa[..., hd:])                 # 1/s (..., Nq, 1)
    g32 = g_h.astype(jnp.float32)
    D = jnp.sum(g32 * oa[..., :hd], axis=-1, keepdims=True) * inv
    gp = (g32 * inv).astype(dt)
    dv = jax.lax.dot_general(e_b, gp, (((nb,), (nb,)), (bd, bd)),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(g_h, v, (((nb + 1,), (nb + 1,)), (bd, bd)),
                             preferred_element_type=jnp.float32)
    dlog = e * ((dp - D) * inv)
    return dv, dlog, dlog.astype(dt)


def _attn_kernel_flat(qkv_ref, bias_ref, out_ref, *, scale, nH, hd,
                      no_max=False):
    C = nH * hd
    sc = qkv_ref.dtype.type(scale)
    for h in range(nH):                              # static offsets
        # scale on the (W, N, hd) q slice, not the (W, N, N) f32 logits:
        # N/hd-fold fewer VPU elements; one extra bf16 rounding on q, the
        # same order as the quantization the bf16 dot inputs already carry
        q = qkv_ref[:, :, h * hd:(h + 1) * hd] * sc  # (W, N, hd) input dtype
        k = qkv_ref[:, :, C + h * hd:C + (h + 1) * hd]
        v = qkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # (W, N, N) f32 acc
        logits = logits + bias_ref[h][None].astype(jnp.float32)
        out = _softmax_pv(logits, v, out_ref.dtype,
                          static_shift=30.0 if no_max else None,
                          clamp_hi=no_max == "clamp")
        out_ref[:, :, h * hd:(h + 1) * hd] = out


def _attn_kernel_flat_masked(qkv_ref, bias_ref, mask_ref, out_ref, *,
                             scale, nH, hd, no_max=False):
    C = nH * hd
    sc = qkv_ref.dtype.type(scale)
    for h in range(nH):
        q = qkv_ref[:, :, h * hd:(h + 1) * hd] * sc
        k = qkv_ref[:, :, C + h * hd:C + (h + 1) * hd]
        v = qkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        logits = (logits + bias_ref[h][None].astype(jnp.float32)
                  + mask_ref[:].astype(jnp.float32))
        out = _softmax_pv(logits, v, out_ref.dtype,
                          static_shift=30.0 if no_max else None,
                          clamp_hi=no_max == "clamp")
        out_ref[:, :, h * hd:(h + 1) * hd] = out


def _attn_kernel_flat_lanes(qkv_ref, bias_ref, r_ref, out_ref, *,
                            scale, nH, hd, no_max=False):
    """Flat kernel, shift mask as region lanes: r_ref (W, N, nr) carries
    0/10 one-hots; concatenating them onto the q and k head slices makes
    the QK^T dot emit logits + 100·same-region — the mask add pass and its
    (W, N, N) block are gone (the extra columns live in the hd -> 128 lane
    padding the MXU pays for anyway)."""
    C = nH * hd
    sc = qkv_ref.dtype.type(scale)
    r = r_ref[:]                                     # (W, N, nr)
    for h in range(nH):
        q = jnp.concatenate(
            [qkv_ref[:, :, h * hd:(h + 1) * hd] * sc, r], axis=-1)
        k = jnp.concatenate(
            [qkv_ref[:, :, C + h * hd:C + (h + 1) * hd], r], axis=-1)
        v = qkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        logits = logits + bias_ref[h][None].astype(jnp.float32)
        out = _softmax_pv(logits, v, out_ref.dtype,
                          static_shift=130.0 if no_max else None,
                          clamp_hi=no_max == "clamp")
        out_ref[:, :, h * hd:(h + 1) * hd] = out


def _attn_kernel_flat_grouped(q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                              scale, G, hd, no_max=False):
    """Head-GROUP tile of the flat kernel: this program sees only G heads'
    q/k/v lane slices and bias rows, so the VMEM-resident bias shrinks
    nH/G-fold — what lets 32-frame stages 2-3 (nH=16/32, N=392) run fused
    instead of falling back to XLA (TODO r1 / VERDICT item 3)."""
    sc = q_ref.dtype.type(scale)
    for h in range(G):                               # static offsets
        q = q_ref[:, :, h * hd:(h + 1) * hd] * sc
        k = k_ref[:, :, h * hd:(h + 1) * hd]
        v = v_ref[:, :, h * hd:(h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        logits = logits + bias_ref[h][None].astype(jnp.float32)
        out = _softmax_pv(logits, v, out_ref.dtype,
                          static_shift=30.0 if no_max else None,
                          clamp_hi=no_max == "clamp")
        out_ref[:, :, h * hd:(h + 1) * hd] = out


def _attn_kernel_flat_grouped_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref,
                                     out_ref, *, scale, G, hd, no_max=False):
    sc = q_ref.dtype.type(scale)
    for h in range(G):
        q = q_ref[:, :, h * hd:(h + 1) * hd] * sc
        k = k_ref[:, :, h * hd:(h + 1) * hd]
        v = v_ref[:, :, h * hd:(h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        logits = (logits + bias_ref[h][None].astype(jnp.float32)
                  + mask_ref[:].astype(jnp.float32))
        out = _softmax_pv(logits, v, out_ref.dtype,
                          static_shift=30.0 if no_max else None,
                          clamp_hi=no_max == "clamp")
        out_ref[:, :, h * hd:(h + 1) * hd] = out


def _attn_kernel_flat_grouped_lanes(q_ref, k_ref, v_ref, bias_ref, r_ref,
                                    out_ref, *, scale, G, hd, no_max=False):
    """Grouped kernel with the shift mask as region lanes (see
    _attn_kernel_flat_lanes)."""
    sc = q_ref.dtype.type(scale)
    r = r_ref[:]
    for h in range(G):
        q = jnp.concatenate(
            [q_ref[:, :, h * hd:(h + 1) * hd] * sc, r], axis=-1)
        k = jnp.concatenate(
            [k_ref[:, :, h * hd:(h + 1) * hd], r], axis=-1)
        v = v_ref[:, :, h * hd:(h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        logits = logits + bias_ref[h][None].astype(jnp.float32)
        out = _softmax_pv(logits, v, out_ref.dtype,
                          static_shift=130.0 if no_max else None,
                          clamp_hi=no_max == "clamp")
        out_ref[:, :, h * hd:(h + 1) * hd] = out


def _pad_to(n: int, to: int) -> int:
    return -(-n // to) * to


import os as _os

# measured on the eval workload (BASELINE.md): 7 MB -> 392 clips/s,
# 12 -> 420, 14-16 -> 425.5 (plateau; estimates are conservative enough
# that even 16 compiles) — default to the plateau's low edge
_FLAT_VMEM_BUDGET = int(_os.environ.get("CLOVER_WA_VMEM_MB", "14")) * 2 ** 20
# long-context gate. History: with the masked-BlockSpec indexing bug the
# kernel measured 41 clips/s vs 58 XLA at N=392 and faulted at 14 MB, so
# it was gated to N<=256; after the fix the SAME kernel measures 62 (7 MB)
# and 87 clips/s (14 MB) vs 57.9 XLA at 32-frame eval — +50%. The gate now
# only bounds pathological window sizes; stages whose all-heads bias
# cannot fit VMEM (W=0) still fall back per-shape automatically.
_FLAT_MAX_N = int(_os.environ.get("CLOVER_WA_MAX_N", "512"))


def _pick_window_block_flat(Bn: int, nH: int, N: int, hd: int, itemsize: int,
                            nW: Optional[int],
                            nr: Optional[int] = None) -> int:
    """Per-program VMEM with tile padding: double-buffered qkv/out/mask
    blocks, resident all-heads bias (dtype), one head's fp32 logits +
    dtype probs live at a time. ``nr``: the shift mask rides as (W, N, nr)
    region lanes instead of a (W, N, N) additive block (plus two
    (W, N, hd+nr) concat temporaries, minus the mask f32 copy)."""
    C = nH * hd
    Np_s, Np_l = _pad_to(N, 8), _pad_to(N, 128)
    for w in (64, 32, 16, 8, 4, 2, 1):
        if Bn % w:
            continue
        if nW is not None and (w > nW or nW % w):
            continue
        mask_need = _mask_block_need(w, Np_s, Np_l, hd, itemsize, nW, nr)
        need = (2 * w * Np_s * _pad_to(3 * C, 128) * itemsize   # qkv x2
                + 2 * w * Np_s * _pad_to(C, 128) * itemsize     # out x2
                + 2 * nH * Np_s * Np_l * itemsize               # bias x2
                + mask_need
                + w * Np_s * Np_l * (4 + itemsize)              # logits+probs
                + Np_s * Np_l * 4)                              # bias f32 copy
        if need <= _FLAT_VMEM_BUDGET:
            return w
    return 0


_GROUPED_ON = _os.environ.get("CLOVER_WA_GROUPED", "1") != "0"


def _pick_group_block_flat(Bn: int, nH: int, N: int, hd: int, itemsize: int,
                           nW, nr: Optional[int] = None):
    """(W, G) for the head-grouped kernel, or (0, 0) if infeasible.

    Prefers G*hd = 128 (full lane tiles on the q/k/v slices) and the
    largest batch-window block W that fits the VMEM budget. ``nr``: mask
    rides as region lanes (see _pick_window_block_flat)."""
    Np_s, Np_l = _pad_to(N, 8), _pad_to(N, 128)
    groups = [g for g in (8, 4, 2, 1)
              if nH % g == 0 and g * hd <= 512]
    groups.sort(key=lambda g: (abs(g * hd - 128), -g))
    for G in groups:
        gl = _pad_to(G * hd, 128)
        for w in (32, 16, 8, 4, 2, 1):
            if Bn % w:
                continue
            if nW is not None and (w > nW or nW % w):
                continue
            mask_need = _mask_block_need(w, Np_s, Np_l, hd, itemsize,
                                         nW, nr)
            need = (3 * 2 * w * Np_s * gl * itemsize        # q,k,v x2
                    + 2 * w * Np_s * gl * itemsize          # out x2
                    + 2 * G * Np_s * Np_l * itemsize        # bias x2
                    + mask_need
                    + w * Np_s * Np_l * (4 + itemsize)      # logits+probs
                    + Np_s * Np_l * 4)                      # bias f32 copy
            if need <= _FLAT_VMEM_BUDGET:
                return w, G
    return 0, 0


def _forward_flat_grouped(qkv, bias, mask, scale, num_heads, no_max=False):
    """Head-group-tiled flat kernel: grid (Bn//W, nH//G); q/k/v are three
    lane-sliced BlockSpec views of the SAME flat qkv array (contiguous
    G*hd-column stripes at offsets 0 / C / 2C), so no relayout happens in
    HBM. Returns None when no (W, G) fits the VMEM budget."""
    Bn, N, threeC = qkv.shape
    C = threeC // 3
    hd = C // num_heads
    if not _GROUPED_ON or hd % 8:
        return None
    nW = None if mask is None else mask.shape[0]
    lanes = _is_lanes(mask)
    nr = mask.shape[-1] if lanes else None
    W, G = _pick_group_block_flat(Bn, num_heads, N, hd, qkv.dtype.itemsize,
                                  nW, nr)
    if W == 0:
        return None
    nG = num_heads // G
    gw = G * hd
    # column-block index units are the block's last dim (gw): the k stripe
    # for group g starts at element C + g*gw = block index nG + g
    q_spec = pl.BlockSpec((W, N, gw), lambda i, g: (i, 0, g),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((W, N, gw), lambda i, g: (i, 0, nG + g),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((W, N, gw), lambda i, g: (i, 0, 2 * nG + g),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((G, N, N), lambda i, g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((W, N, gw), lambda i, g: (i, 0, g),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * 2 * Bn * num_heads * N * N * hd,
        bytes_accessed=2 * qkv.size * qkv.dtype.itemsize
        + num_heads * N * N * qkv.dtype.itemsize,
        transcendentals=Bn * num_heads * N * N,
    )
    kwargs = dict(scale=scale, G=G, hd=hd, no_max=no_max)
    if mask is None:
        return pl.pallas_call(
            functools.partial(_attn_kernel_flat_grouped, **kwargs),
            grid=(Bn // W, nG),
            in_specs=[q_spec, k_spec, v_spec, bias_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Bn, N, C), qkv.dtype),
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv, qkv, qkv, bias.astype(qkv.dtype))
    # BLOCK index semantics: i % (nW // W), NOT (i*W) % nW (see _forward_v2)
    if lanes:
        r_spec = pl.BlockSpec((W, N, nr), lambda i, g: (i % (nW // W), 0, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_attn_kernel_flat_grouped_lanes, **kwargs),
            grid=(Bn // W, nG),
            in_specs=[q_spec, k_spec, v_spec, bias_spec, r_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Bn, N, C), qkv.dtype),
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv, qkv, qkv, bias.astype(qkv.dtype), mask.astype(qkv.dtype))
    mask_spec = pl.BlockSpec((W, N, N), lambda i, g: (i % (nW // W), 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_flat_grouped_masked, **kwargs),
        grid=(Bn // W, nG),
        in_specs=[q_spec, k_spec, v_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Bn, N, C), qkv.dtype),
        cost_estimate=cost,
        interpret=_interpret(),
    )(qkv, qkv, qkv, bias.astype(qkv.dtype), mask.astype(qkv.dtype))


def _forward_flat(qkv, bias, mask, scale, num_heads, no_max=False):
    """qkv (Bn, N, 3C) -> (Bn, N, C); bias (nH, N, N); mask (nW, N, N)|None.
    bias/mask are cast to qkv.dtype for the VMEM-resident blocks."""
    if no_max and _WA_DEBUG:
        debug_logit_check(qkv, bias, mask, scale, num_heads,
                          tag=f"flat:nH{num_heads},N{qkv.shape[1]}")
    Bn, N, threeC = qkv.shape
    C = threeC // 3
    hd = C // num_heads
    nW = None if mask is None else mask.shape[0]
    lanes = _is_lanes(mask)
    nr = mask.shape[-1] if lanes else None
    W = (_pick_window_block_flat(Bn, num_heads, N, hd, qkv.dtype.itemsize,
                                 nW, nr)
         if N <= _FLAT_MAX_N else 0)
    if W == 0:
        # all-heads bias block busts VMEM (32-frame stages 2-3): tile the
        # grid over head GROUPS before giving up on the fused path
        out = _forward_flat_grouped(qkv, bias, mask, scale, num_heads,
                                    no_max=no_max)
        if out is not None:
            return out
        if not lanes:  # flash variants take the additive mask only
            if _LONG_IMPL == "v7":
                out = _forward_flat_flash(qkv, bias, mask, scale, num_heads)
                if out is not None:
                    return out
            elif _LONG_IMPL in ("1", "v6"):
                out = _forward_long_from_flat(qkv, bias, mask, scale,
                                              num_heads)
                if out is not None:
                    return out
        return _xla_flat_reference(qkv, bias, mask, scale, num_heads)
    qkv_spec = pl.BlockSpec((W, N, 3 * C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads, N, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((W, N, C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * 2 * Bn * num_heads * N * N * hd,
        bytes_accessed=2 * qkv.size * qkv.dtype.itemsize
        + num_heads * N * N * qkv.dtype.itemsize,
        transcendentals=Bn * num_heads * N * N,
    )
    kwargs = dict(scale=scale, nH=num_heads, hd=hd, no_max=no_max)
    if mask is None:
        return pl.pallas_call(
            functools.partial(_attn_kernel_flat, **kwargs),
            grid=(Bn // W,),
            in_specs=[qkv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Bn, N, C), qkv.dtype),
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv, bias.astype(qkv.dtype))
    # BLOCK index semantics (element offset = index * block dim); see the
    # same-named comment in _forward_v2 — i % (nW // W), NOT (i*W) % nW
    if lanes:
        r_spec = pl.BlockSpec((W, N, nr), lambda i: (i % (nW // W), 0, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_attn_kernel_flat_lanes, **kwargs),
            grid=(Bn // W,),
            in_specs=[qkv_spec, bias_spec, r_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Bn, N, C), qkv.dtype),
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv, bias.astype(qkv.dtype), mask.astype(qkv.dtype))
    mask_spec = pl.BlockSpec((W, N, N), lambda i: (i % (nW // W), 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_flat_masked, **kwargs),
        grid=(Bn // W,),
        in_specs=[qkv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Bn, N, C), qkv.dtype),
        cost_estimate=cost,
        interpret=_interpret(),
    )(qkv, bias.astype(qkv.dtype), mask.astype(qkv.dtype))


# ------------------------------------------------------------- flat2 (2-D)
# Flat-IN/flat-OUT variant: the qkv GEMM emits (Bn*N, 3C) row-major and the
# proj GEMM consumes (Bn*N, C) row-major. Re-tiling those to the (Bn, N, C)
# window layout is REAL data movement whenever N % 8 != 0 (each (N, C)
# slice pads to 8 sublanes: N=196 -> 200, so rows shift) — the 8-frame eval
# profile put that reshape bucket at ~17% of the step (~0.96 ms per qkv
# reshape at stage 0, TODO round-3 lead).
#
# Design: W WINDOWS PER PROGRAM with W*N sublane-aligned (W = 8/gcd(N,8)),
# so the 2-D qkv/out BlockSpecs satisfy Mosaic's tiling rule (block dims
# must be a multiple of (8, 128) or equal the array dim — a bare (N, 3C)
# block with N=196 is rejected on real TPU). Each program statically
# slices its W windows out of the (W*N, 3C) block; odd-w slices start at
# a non-8-aligned sublane offset, which is normalized to offset 0 via a
# VMEM scratch roundtrip (a supported relayout; Mosaic REJECTS
# tpu.concatenate — the region-lanes q‖r and the fused-sum v‖1 — on
# operands with mismatched sublane offsets, so the slice cannot be used
# directly). That VPU copy replaces the HBM re-tiling this path exists
# to remove. Per-head q/k/v are plain LANE slices of the normalized
# window slice (views). Rejected alternative, measured worse: per-head
# (W*N, hd) -> (W, N, hd) VMEM reshapes lower to quarter-utilized
# 32-lane VPU shuffles (bench 514 vs 592 clips/s).


def _flat2_W(N: int) -> int:
    """Smallest W with W*N sublane-aligned."""
    import math
    return 8 // math.gcd(N, 8)


def _flat2_window(qkv_ref, scratch_ref, w, N):
    """(N, 3C) slice of window w, sublane-offset-normalized via scratch
    when the row offset is not 8-aligned."""
    if (w * N) % 8 == 0:
        return qkv_ref[w * N:(w + 1) * N, :]
    scratch_ref[...] = qkv_ref[w * N:(w + 1) * N, :]
    return scratch_ref[...]


def _attn_kernel_flat2(qkv_ref, bias_ref, out_ref, scratch_ref, *,
                       scale, nH, hd, W, N, no_max=False):
    C = nH * hd
    sc = qkv_ref.dtype.type(scale)
    for w in range(W):                               # static row offsets
        qkv_w = _flat2_window(qkv_ref, scratch_ref, w, N)
        for h in range(nH):                          # static lane offsets
            q = qkv_w[:, h * hd:(h + 1) * hd] * sc   # (N, hd)
            k = qkv_w[:, C + h * hd:C + (h + 1) * hd]
            v = qkv_w[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (N, N) f32 acc
            logits = logits + bias_ref[h].astype(jnp.float32)
            out = _softmax_pv(logits[None], v[None], out_ref.dtype,
                              static_shift=30.0 if no_max else None,
                              clamp_hi=no_max == "clamp")
            out_ref[w * N:(w + 1) * N, h * hd:(h + 1) * hd] = out[0]


def _attn_kernel_flat2_masked(qkv_ref, bias_ref, mask_ref, out_ref,
                              scratch_ref, *, scale, nH, hd, W, N,
                              no_max=False):
    C = nH * hd
    sc = qkv_ref.dtype.type(scale)
    for w in range(W):
        qkv_w = _flat2_window(qkv_ref, scratch_ref, w, N)
        m = mask_ref[w].astype(jnp.float32)          # (N, N)
        for h in range(nH):
            q = qkv_w[:, h * hd:(h + 1) * hd] * sc
            k = qkv_w[:, C + h * hd:C + (h + 1) * hd]
            v = qkv_w[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = logits + bias_ref[h].astype(jnp.float32) + m
            out = _softmax_pv(logits[None], v[None], out_ref.dtype,
                              static_shift=30.0 if no_max else None,
                              clamp_hi=no_max == "clamp")
            out_ref[w * N:(w + 1) * N, h * hd:(h + 1) * hd] = out[0]


def _attn_kernel_flat2_lanes(qkv_ref, bias_ref, r_ref, out_ref,
                             scratch_ref, *, scale, nH, hd, W, N,
                             no_max=False):
    """Flat 2-D kernel, shift mask as region lanes (see
    _attn_kernel_flat_lanes); r_ref block is (W, N, nr) — its [w] rows
    are offset 0, matching the normalized qkv slice for the concat."""
    C = nH * hd
    sc = qkv_ref.dtype.type(scale)
    for w in range(W):
        qkv_w = _flat2_window(qkv_ref, scratch_ref, w, N)
        r = r_ref[w]                                 # (N, nr)
        for h in range(nH):
            q = jnp.concatenate(
                [qkv_w[:, h * hd:(h + 1) * hd] * sc, r], axis=-1)
            k = jnp.concatenate(
                [qkv_w[:, C + h * hd:C + (h + 1) * hd], r], axis=-1)
            v = qkv_w[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = logits + bias_ref[h].astype(jnp.float32)
            out = _softmax_pv(logits[None], v[None], out_ref.dtype,
                              static_shift=130.0 if no_max else None,
                              clamp_hi=no_max == "clamp")
            out_ref[w * N:(w + 1) * N, h * hd:(h + 1) * hd] = out[0]


def _flat2_feasible(nH: int, N: int, hd: int, itemsize: int,
                    nr: Optional[int] = None) -> bool:
    """Per-program VMEM for the W-window kernel: double-buffered
    (W*N, 3C)/(W*N, C) blocks, resident all-heads bias, one window's
    shifted (N, 3C) slice + one head's fp32 logits/probs live at a time."""
    C = nH * hd
    W = _flat2_W(N)
    Np_s, Np_l = _pad_to(N, 8), _pad_to(N, 128)
    mask_need = _mask_block_need(W, Np_s, Np_l, hd, itemsize,
                                 1 if nr is None else None, nr)
    need = (2 * W * N * _pad_to(3 * C, 128) * itemsize      # qkv x2
            + 2 * W * N * _pad_to(C, 128) * itemsize        # out x2
            + 2 * nH * Np_s * Np_l * itemsize               # bias x2
            + mask_need
            + Np_s * _pad_to(3 * C, 128) * itemsize         # shifted slice
            + Np_s * Np_l * (4 + itemsize)                  # logits+probs
            + Np_s * Np_l * 4)                              # mask/bias f32
    return need <= _FLAT_VMEM_BUDGET


def _forward_flat2(qkv2, bias, mask, scale, num_heads, N, no_max=False):
    """qkv2 (Bn*N, 3C) -> (Bn*N, C) or None if infeasible.
    bias (nH, N, N); mask (nW, N, N) additive or (nW, N, nr) lanes."""
    if no_max and _WA_DEBUG:
        debug_logit_check(qkv2.reshape(-1, N, qkv2.shape[-1]), bias, mask,
                          scale, num_heads,
                          tag=f"flat2:nH{num_heads},N{N}")
    M, threeC = qkv2.shape
    C = threeC // 3
    hd = C // num_heads
    Bn = M // N
    W = _flat2_W(N)
    nW = None if mask is None else mask.shape[0]
    lanes = _is_lanes(mask)
    nr = mask.shape[-1] if lanes else None
    if (not _FLAT2_ON or N > _FLAT_MAX_N or Bn % W
            or (nW is not None and nW % W)
            or not _flat2_feasible(num_heads, N, hd,
                                   qkv2.dtype.itemsize, nr)):
        return None
    qkv_spec = pl.BlockSpec((W * N, 3 * C), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads, N, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((W * N, C), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * 2 * Bn * num_heads * N * N * hd,
        bytes_accessed=2 * qkv2.size * qkv2.dtype.itemsize
        + num_heads * N * N * qkv2.dtype.itemsize,
        transcendentals=Bn * num_heads * N * N,
    )
    kwargs = dict(scale=scale, nH=num_heads, hd=hd, W=W, N=N,
                  no_max=no_max)
    scratch = [pltpu.VMEM((N, 3 * C), qkv2.dtype)]
    if mask is None:
        return pl.pallas_call(
            functools.partial(_attn_kernel_flat2, **kwargs),
            grid=(Bn // W,),
            in_specs=[qkv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((M, C), qkv2.dtype),
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv2, bias.astype(qkv2.dtype))
    # BLOCK index semantics (element offset = index * block dim):
    # program i covers windows i*W..i*W+W-1, whose mask rows start at
    # (i*W) % nW — a multiple of W since nW % W == 0 — block i % (nW//W)
    if lanes:
        r_spec = pl.BlockSpec((W, N, nr), lambda i: (i % (nW // W), 0, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_attn_kernel_flat2_lanes, **kwargs),
            grid=(Bn // W,),
            in_specs=[qkv_spec, bias_spec, r_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((M, C), qkv2.dtype),
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv2, bias.astype(qkv2.dtype), mask.astype(qkv2.dtype))
    mask_spec = pl.BlockSpec((W, N, N), lambda i: (i % (nW // W), 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_flat2_masked, **kwargs),
        grid=(Bn // W,),
        in_specs=[qkv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((M, C), qkv2.dtype),
        scratch_shapes=scratch,
        cost_estimate=cost,
        interpret=_interpret(),
    )(qkv2, bias.astype(qkv2.dtype), mask.astype(qkv2.dtype))


# ----------------------------------------------------------- long/flash v6
# Key-tiled flash variant for long windows (N=392 at 32-frame eval) where
# v5's all-keys blocks don't fit VMEM: iterate 128-wide key tiles with a
# running max / denominator / accumulator (standard flash recurrence), so
# per-program live memory is O(N * Tk) instead of O(nH * N * N). Uses the
# (Bn, nH, N, hd) head layout — the one relayout is far cheaper than the
# (Bn, nH, N, N) logits HBM traffic it saves at this N.
#
# MEASURED SLOWER at this workload: 32.6 vs 57.9 clips/s (32-frame eval)
# against the XLA head-loop fallback — hd=32 pads to 128 lanes in every
# per-head q/k/v/acc block (4x fetch+compute waste) and the running-softmax
# VPU work repeats per key tile; XLA's batched dots win at N=392. Kept as
# an opt-in (CLOVER_WA_LONG=1) measured experiment / starting point for a
# head-packed variant; see BASELINE.md.

_LONG_TK = 128
# long-window kernel selector: "0" (default) = XLA head-loop fallback;
# "v6"/"1" = per-head flash (measured slower, see below); "v7" = flat-qkv
# flash (v5 layout + key tiling)
_LONG_IMPL = _os.environ.get("CLOVER_WA_LONG", "0")


def _attn_kernel_long(q_ref, k_ref, v_ref, bias_ref, out_ref,
                      m_ref, l_ref, acc_ref, *, scale, n_k, n_valid,
                      mask_ref=None):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:, 0]                                   # (W, N, hd) input dtype
    k = k_ref[:, 0]                                   # (W, Tk, hd)
    v = v_ref[:, 0]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale   # (W, N, Tk) f32
    logits = logits + bias_ref[0][None].astype(jnp.float32)
    if mask_ref is not None:
        logits = logits + mask_ref[:].astype(jnp.float32)
    # mask out-of-range key columns of the last (partial) tile
    Tk = logits.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2) + j * Tk
    logits = jnp.where(col < n_valid, logits, -1e30)

    m_prev = m_ref[:]                                 # (W, N) f32
    l_prev = l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new[:, :, None])           # (W, N, Tk) f32
    l_ref[:] = l_prev * corr + jnp.sum(p, axis=-1)
    m_ref[:] = m_new
    pv = jax.lax.dot_general(
        p.astype(q_ref.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # (W, N, hd)
    acc_ref[:] = acc_ref[:] * corr[:, :, None] + pv

    @pl.when(j == n_k - 1)
    def _():
        out_ref[:, 0] = (acc_ref[:] / l_ref[:][:, :, None]).astype(
            out_ref.dtype)


def _attn_kernel_long_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref,
                             m_ref, l_ref, acc_ref, *, scale, n_k, n_valid):
    _attn_kernel_long(q_ref, k_ref, v_ref, bias_ref, out_ref,
                      m_ref, l_ref, acc_ref, scale=scale, n_k=n_k,
                      n_valid=n_valid, mask_ref=mask_ref)


def _pick_window_block_long(Bn: int, N: int, hd: int, itemsize: int,
                            nW: Optional[int]) -> int:
    Np_s = _pad_to(N, 8)
    hd_l = _pad_to(hd, 128)
    Tk = _LONG_TK
    for w in (16, 8, 4, 2, 1):
        if Bn % w:
            continue
        if nW is not None and (w > nW or nW % w):
            continue
        need = (2 * w * Np_s * hd_l * itemsize          # q x2
                + 2 * 2 * w * Tk * hd_l * itemsize      # k, v x2
                + 2 * Np_s * Tk * itemsize              # bias tile x2
                + (2 * w * Np_s * Tk * itemsize if nW is not None else 0)
                + 2 * w * Np_s * hd_l * itemsize        # out x2
                + w * Np_s * hd_l * 4                   # acc f32
                + 2 * _pad_to(w, 8) * _pad_to(N, 128) * 4   # m, l f32
                + 2 * w * Np_s * Tk * 4)                # logits + p f32
        if need <= _FLAT_VMEM_BUDGET:
            return w
    return 0


def _forward_long(q, k, v, bias, mask, scale):
    """Flash window attention: q,k,v (Bn, nH, N, hd); bias (nH, N, N);
    mask (nW, N, N) or None. Returns (Bn, nH, N, hd)."""
    Bn, nH, N, hd = q.shape
    nW = None if mask is None else mask.shape[0]
    Tk = _LONG_TK
    n_k = -(-N // Tk)
    Nk = n_k * Tk
    W = _pick_window_block_long(Bn, N, hd, q.dtype.itemsize, nW)
    if W == 0:
        return None
    if Nk != N:
        # pad the KEY axis so Tk tiles the arrays; padded keys are masked
        # by the n_valid iota check in-kernel
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Nk - N), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Nk - N), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, Nk - N)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, 0), (0, Nk - N)))
    dt = q.dtype
    grid = (Bn // W, nH, n_k)
    q_spec = pl.BlockSpec((W, 1, N, hd), lambda i, h, j: (i, h, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((W, 1, Tk, hd), lambda i, h, j: (i, h, j, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, N, Tk), lambda i, h, j: (h, 0, j),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((W, 1, N, hd), lambda i, h, j: (i, h, 0, 0),
                            memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((W, N), jnp.float32),      # m
               pltpu.VMEM((W, N), jnp.float32),      # l
               pltpu.VMEM((W, N, hd), jnp.float32)]  # acc
    cost = pl.CostEstimate(
        flops=2 * 2 * Bn * nH * N * Nk * hd,
        bytes_accessed=4 * q.size * q.dtype.itemsize,
        transcendentals=Bn * nH * N * Nk,
    )
    if mask is None:
        return pl.pallas_call(
            functools.partial(_attn_kernel_long, scale=scale, n_k=n_k,
                              n_valid=N),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, dt),
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=_interpret(),
        )(q, k, v, bias.astype(dt))
    mask_spec = pl.BlockSpec((W, N, Tk), lambda i, h, j: (i % (nW // W), 0, j),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_long_masked, scale=scale, n_k=n_k,
                          n_valid=N),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, dt),
        scratch_shapes=scratch,
        cost_estimate=cost,
        interpret=_interpret(),
    )(q, k, v, bias.astype(dt), mask.astype(dt))


def _forward_long_from_flat(qkv, bias, mask, scale, num_heads):
    """Relayout flat qkv to heads and run the flash kernel; None if
    infeasible (caller falls back to XLA)."""
    Bn, N, threeC = qkv.shape
    C = threeC // 3
    hd = C // num_heads
    x = qkv.reshape(Bn, N, 3, num_heads, hd)
    q = x[:, :, 0].transpose(0, 2, 1, 3)
    k = x[:, :, 1].transpose(0, 2, 1, 3)
    v = x[:, :, 2].transpose(0, 2, 1, 3)
    out = _forward_long(q, k, v, bias, mask, scale)
    if out is None:
        return None
    return out.transpose(0, 2, 1, 3).reshape(Bn, N, C)


# ------------------------------------------------------------- flat-flash v7
# Long-window kernel combining v5's layout with v6's key tiling: qkv stays
# in the un-relayouted (Bn, N, 3C) form (no hd->128 lane-padding waste — the
# reason v6 lost), heads are sliced at static lane offsets, and the key axis
# is tiled by passing the SAME qkv array through a second, key-tiled
# BlockSpec. Per-head flash state (running max / denom / fp32 out) lives in
# VMEM scratch across the key-tile grid axis.


def _attn_kernel_flat_flash(qkv_q_ref, qkv_kv_ref, bias_ref, out_ref,
                            m_ref, l_ref, acc_ref, *, scale, nH, hd,
                            n_k, n_valid, mask_ref=None):
    C = nH * hd
    j = pl.program_id(1)
    Tk = qkv_kv_ref.shape[1]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for h in range(nH):
        q = qkv_q_ref[:, :, h * hd:(h + 1) * hd]            # (W, N, hd)
        k = qkv_kv_ref[:, :, C + h * hd:C + (h + 1) * hd]   # (W, Tk, hd)
        v = qkv_kv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale     # (W, N, Tk) f32
        logits = logits + bias_ref[h][None].astype(jnp.float32)
        if mask_ref is not None:
            logits = logits + mask_ref[:].astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2) + j * Tk
        logits = jnp.where(col < n_valid, logits, -1e30)

        m_prev = m_ref[h]                                   # (W, N) f32
        l_prev = l_ref[h]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new[:, :, None])
        l_ref[h] = l_prev * corr + jnp.sum(p, axis=-1)
        m_ref[h] = m_new
        pv = jax.lax.dot_general(
            p.astype(qkv_q_ref.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # (W, N, hd)
        acc_ref[h] = acc_ref[h] * corr[:, :, None] + pv

    @pl.when(j == n_k - 1)
    def _():
        for h in range(nH):
            out_ref[:, :, h * hd:(h + 1) * hd] = (
                acc_ref[h] / l_ref[h][:, :, None]).astype(out_ref.dtype)


def _attn_kernel_flat_flash_masked(qkv_q_ref, qkv_kv_ref, bias_ref, mask_ref,
                                   out_ref, m_ref, l_ref, acc_ref, *,
                                   scale, nH, hd, n_k, n_valid):
    _attn_kernel_flat_flash(qkv_q_ref, qkv_kv_ref, bias_ref, out_ref,
                            m_ref, l_ref, acc_ref, scale=scale, nH=nH, hd=hd,
                            n_k=n_k, n_valid=n_valid, mask_ref=mask_ref)


def _pick_window_block_flash(Bn: int, nH: int, N: int, hd: int,
                             itemsize: int, nW: Optional[int]) -> int:
    C = nH * hd
    Tk = _LONG_TK
    Np_s, Np_l = _pad_to(N, 8), _pad_to(N, 128)
    for w in (16, 8, 4, 2, 1):
        if Bn % w:
            continue
        if nW is not None and (w > nW or nW % w):
            continue
        need = (2 * w * Np_s * _pad_to(3 * C, 128) * itemsize  # q view x2
                + 2 * w * Tk * _pad_to(3 * C, 128) * itemsize  # kv tile x2
                + 2 * nH * Np_s * Tk * itemsize                # bias tile x2
                + (2 * w * Np_s * Tk * itemsize if nW is not None else 0)
                + 2 * w * Np_s * _pad_to(C, 128) * itemsize    # out x2
                + nH * w * Np_s * _pad_to(hd, 128) * 4         # acc f32
                + 2 * nH * _pad_to(w, 8) * Np_l * 4            # m, l f32
                + w * Np_s * Tk * (4 + itemsize))              # logits + p
        if need <= _FLAT_VMEM_BUDGET:
            return w
    return 0


def _forward_flat_flash(qkv, bias, mask, scale, num_heads):
    """Key-tiled flash attention on flat (Bn, N, 3C) qkv. None if
    infeasible."""
    Bn, N, threeC = qkv.shape
    C = threeC // 3
    hd = C // num_heads
    nW = None if mask is None else mask.shape[0]
    Tk = _LONG_TK
    n_k = -(-N // Tk)
    Nk = n_k * Tk
    W = _pick_window_block_flash(Bn, num_heads, N, hd, qkv.dtype.itemsize, nW)
    if W == 0:
        return None
    dt = qkv.dtype
    qkv_keys = qkv
    bias_t = bias.astype(dt)
    mask_t = None if mask is None else mask.astype(dt)
    if Nk != N:
        # pad the key/row axis for Tk tiling; padded keys masked in-kernel
        qkv_keys = jnp.pad(qkv, ((0, 0), (0, Nk - N), (0, 0)))
        bias_t = jnp.pad(bias_t, ((0, 0), (0, 0), (0, Nk - N)))
        if mask_t is not None:
            mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, Nk - N)))
    grid = (Bn // W, n_k)
    q_spec = pl.BlockSpec((W, N, 3 * C), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    # kv block indexes (window block i, key tile j) into the row-padded copy
    kv_spec = pl.BlockSpec((W, Tk, 3 * C), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads, N, Tk), lambda i, j: (0, 0, j),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((W, N, C), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((num_heads, W, N), jnp.float32),   # m
               pltpu.VMEM((num_heads, W, N), jnp.float32),   # l
               pltpu.VMEM((num_heads, W, N, hd), jnp.float32)]  # acc
    cost = pl.CostEstimate(
        flops=2 * 2 * Bn * num_heads * N * Nk * hd,
        bytes_accessed=3 * qkv.size * qkv.dtype.itemsize,
        transcendentals=Bn * num_heads * N * Nk,
    )
    kwargs = dict(scale=scale, nH=num_heads, hd=hd, n_k=n_k, n_valid=N)
    if mask_t is None:
        return pl.pallas_call(
            functools.partial(_attn_kernel_flat_flash, **kwargs),
            grid=grid,
            in_specs=[q_spec, kv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Bn, N, C), dt),
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv, qkv_keys, bias_t)
    mask_spec = pl.BlockSpec((W, N, Tk),
                             lambda i, j: (i % (nW // W), 0, j),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_flat_flash_masked, **kwargs),
        grid=grid,
        in_specs=[q_spec, kv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Bn, N, C), dt),
        scratch_shapes=scratch,
        cost_estimate=cost,
        interpret=_interpret(),
    )(qkv, qkv_keys, bias_t, mask_t)


def _xla_flat_reference(qkv, bias, mask, scale, num_heads,
                        fp32_logits: bool = False):
    """XLA math for the flat kernel (bwd recompute, CPU path, fallback).

    With ``fp32_logits=False`` matches 'xla_headloop' exactly, including
    logits staying in the input dtype: materializing fp32 logits in HBM
    was measured SLOWER (36.5 vs 57.8 clips/s at 32-frame eval — double
    the traffic of the step's dominant tensor), the same anti-optimization
    BASELINE.md records for the batched-einsum path.

    ``fp32_logits=True`` reproduces the Pallas kernel's numerics instead
    (fp32 logit accumulation in VMEM, never rounded to bf16 before the
    softmax) — used by _flat_bwd's recompute when the forward ran the
    kernel but the bwd kernel is shape-infeasible, so gradients correspond
    to the math the executed forward actually did."""
    if _is_lanes(mask):
        # region-lanes form: expand back to the classic additive mask
        # (softmax-equivalent to the kernels' +100·δ up to a row constant,
        # and bf16-safe: -100 only perturbs suppressed entries)
        mask = lanes_to_additive(mask)
    Bn, N, threeC = qkv.shape
    C = threeC // 3
    hd = C // num_heads
    acc = jnp.float32 if fp32_logits else None
    outs = []
    for h in range(num_heads):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, C + h * hd:C + (h + 1) * hd]
        v = qkv[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        logits = jnp.einsum("bqd,bkd->bqk", q * scale, k,
                            preferred_element_type=acc)
        logits = logits + bias[h][None].astype(logits.dtype)
        if mask is not None:
            nW = mask.shape[0]
            logits = (logits.reshape(Bn // nW, nW, N, N)
                      + mask[None].astype(logits.dtype))
            logits = logits.reshape(Bn, N, N)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        probs = probs.astype(qkv.dtype)
        outs.append(jnp.einsum("bqk,bkd->bqd", probs, v))
    return jnp.concatenate(outs, axis=-1)


# ------------------------------------------------------------- bwd kernel
# The train-step profile showed 46% of device time in copy/relayout ops,
# dominated by the attention backward: XLA autodiff of the per-head-sliced
# math materializes every head's dq/dk/dv in transposed layouts and
# scatters them back into (Bn, N, 3C). This kernel recomputes
# logits/probs in VMEM (flash-style recompute) and emits dqkv directly in
# the flat layout; dbias accumulates into a VMEM-resident fp32 block
# across the window-block grid. Shift-mask gradients are intentionally
# zero — masks are trace-time constants in this model (swin3d.py
# shift_attn_mask), never trainable.


def _attn_kernel_flat_bwd(qkv_ref, bias_ref, g_ref, dqkv_ref, dbias_ref, *,
                          scale, nH, hd, n_i, mask_ref=None, r_ref=None,
                          no_max=False):
    C = nH * hd
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    sc = qkv_ref.dtype.type(scale)
    r = None if r_ref is None else r_ref[:]          # region lanes (W, N, nr)
    for h in range(nH):
        # qs = q*scale in bf16: logits = qs·k needs no (W,N,N) scale pass,
        # and dk = dlogᵀ·q·scale = dlogᵀ·qs absorbs its scale too (dq keeps
        # an explicit one). Same single-rounding argument as the fwd kernel.
        qs = qkv_ref[:, :, h * hd:(h + 1) * hd] * sc         # (W, N, hd)
        k = qkv_ref[:, :, C + h * hd:C + (h + 1) * hd]
        v = qkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        if r is not None:
            # shift mask rides the recompute dot as region lanes (see
            # _attn_kernel_flat_lanes); dq/dk below contract the REAL
            # k/qs — the lanes are constants with zero gradient
            logits = jax.lax.dot_general(
                jnp.concatenate([qs, r], axis=-1),
                jnp.concatenate([k, r], axis=-1),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # (W, Nq, Nk)
        else:
            logits = jax.lax.dot_general(
                qs, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # (W, Nq, Nk)
        logits = logits + bias_ref[h][None].astype(jnp.float32)
        if mask_ref is not None:
            logits = logits + mask_ref[:].astype(jnp.float32)
        g_h = g_ref[:, :, h * hd:(h + 1) * hd]               # (W, Nq, hd)
        dv, dlog, dlog_b = _bwd_softmax_core(
            logits, v, g_h, qkv_ref.dtype, no_max, r is not None)
        dq = jax.lax.dot_general(
            dlog_b, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale      # (W, Nq, hd)
        dk = jax.lax.dot_general(
            dlog_b, qs, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (W, Nk, hd)
        dqkv_ref[:, :, h * hd:(h + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, C + h * hd:C + (h + 1) * hd] = dk.astype(
            dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd] = dv.astype(
            dqkv_ref.dtype)
        dbias_ref[h] += jnp.sum(dlog, axis=0)


def _attn_kernel_flat_bwd_masked(qkv_ref, bias_ref, g_ref, mask_ref,
                                 dqkv_ref, dbias_ref, *, scale, nH, hd, n_i,
                                 no_max=False):
    _attn_kernel_flat_bwd(qkv_ref, bias_ref, g_ref, dqkv_ref, dbias_ref,
                          scale=scale, nH=nH, hd=hd, n_i=n_i,
                          mask_ref=mask_ref, no_max=no_max)


def _attn_kernel_flat_bwd_lanes(qkv_ref, bias_ref, g_ref, r_ref,
                                dqkv_ref, dbias_ref, *, scale, nH, hd, n_i,
                                no_max=False):
    _attn_kernel_flat_bwd(qkv_ref, bias_ref, g_ref, dqkv_ref, dbias_ref,
                          scale=scale, nH=nH, hd=hd, n_i=n_i, r_ref=r_ref,
                          no_max=no_max)


def _attn_kernel_flat_bwd_grouped(q_ref, k_ref, v_ref, bias_ref, g_ref,
                                  dq_ref, dk_ref, dv_ref, dbias_ref, *,
                                  scale, G, hd, n_i, mask_ref=None,
                                  r_ref=None, no_max=False):
    """Head-GROUP-tiled flat attention backward: grid (nG, Bn//W), i fastest
    so the group's dbias block stays VMEM-resident across the whole window
    sweep. q/k/v/g and dq/dk/dv are lane-sliced BlockSpec views of the flat
    arrays (no HBM relayout), exactly like the grouped forward. What lets
    VMEM-busting shapes (Swin-B stage 3: nH=32, C=1024) run a fused
    backward instead of the XLA per-head vjp whose pad+add scatter chains
    dominated the train profile."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    sc = q_ref.dtype.type(scale)
    r = None if r_ref is None else r_ref[:]          # region lanes (W, N, nr)
    for h in range(G):
        qs = q_ref[:, :, h * hd:(h + 1) * hd] * sc           # (W, N, hd)
        k = k_ref[:, :, h * hd:(h + 1) * hd]
        v = v_ref[:, :, h * hd:(h + 1) * hd]
        if r is not None:
            # lanes ride the recompute dot; dq/dk contract the real k/qs
            logits = jax.lax.dot_general(
                jnp.concatenate([qs, r], axis=-1),
                jnp.concatenate([k, r], axis=-1),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # (W, Nq, Nk)
        else:
            logits = jax.lax.dot_general(
                qs, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # (W, Nq, Nk)
        logits = logits + bias_ref[h][None].astype(jnp.float32)
        if mask_ref is not None:
            logits = logits + mask_ref[:].astype(jnp.float32)
        g_h = g_ref[:, :, h * hd:(h + 1) * hd]               # (W, Nq, hd)
        dv, dlog, dlog_b = _bwd_softmax_core(
            logits, v, g_h, q_ref.dtype, no_max, r is not None)
        dq = jax.lax.dot_general(
            dlog_b, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            dlog_b, qs, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dq_ref[:, :, h * hd:(h + 1) * hd] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, h * hd:(h + 1) * hd] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, h * hd:(h + 1) * hd] = dv.astype(dv_ref.dtype)
        dbias_ref[h] += jnp.sum(dlog, axis=0)


def _attn_kernel_flat_bwd_grouped_masked(q_ref, k_ref, v_ref, bias_ref, g_ref,
                                         mask_ref, dq_ref, dk_ref, dv_ref,
                                         dbias_ref, *, scale, G, hd, n_i,
                                         no_max=False):
    _attn_kernel_flat_bwd_grouped(q_ref, k_ref, v_ref, bias_ref, g_ref,
                                  dq_ref, dk_ref, dv_ref, dbias_ref,
                                  scale=scale, G=G, hd=hd, n_i=n_i,
                                  mask_ref=mask_ref, no_max=no_max)


def _attn_kernel_flat_bwd_grouped_lanes(q_ref, k_ref, v_ref, bias_ref, g_ref,
                                        r_ref, dq_ref, dk_ref, dv_ref,
                                        dbias_ref, *, scale, G, hd, n_i,
                                        no_max=False):
    _attn_kernel_flat_bwd_grouped(q_ref, k_ref, v_ref, bias_ref, g_ref,
                                  dq_ref, dk_ref, dv_ref, dbias_ref,
                                  scale=scale, G=G, hd=hd, n_i=n_i,
                                  r_ref=r_ref, no_max=no_max)


def _pick_group_block_bwd(Bn: int, nH: int, N: int, hd: int,
                          itemsize: int, nW, nr: Optional[int] = None):
    """(W, G) for the grouped bwd kernel, or (0, 0). ``nr``: shift mask as
    region lanes (see _pick_window_block_flat)."""
    Np_s, Np_l = _pad_to(N, 8), _pad_to(N, 128)
    groups = [g for g in (8, 4, 2, 1) if nH % g == 0 and g * hd <= 512]
    groups.sort(key=lambda g: (abs(g * hd - 128), -g))
    for G in groups:
        gl = _pad_to(G * hd, 128)
        for w in (16, 8, 4, 2, 1):
            if Bn % w:
                continue
            if nW is not None and (w > nW or nW % w):
                continue
            mask_need = _mask_block_need(w, Np_s, Np_l, hd, itemsize,
                                         nW, nr)
            need = (4 * 2 * w * Np_s * gl * itemsize        # q,k,v,g x2
                    + 3 * 2 * w * Np_s * gl * itemsize      # dq,dk,dv x2
                    + G * Np_s * Np_l * 4                   # dbias resident
                    + 2 * G * Np_s * Np_l * itemsize        # bias x2
                    + mask_need
                    + 3 * w * Np_s * Np_l * 4               # e/dp/dlog f32
                    # p + dlog_b bf16 casts: omitting these under-counted
                    # the Mosaic stack — (W=2, G=4) at Swin-B stage 2
                    # N=392 estimated 14.0 MB but hit 16.69 MB scoped vmem
                    # (16 MB compiler limit) on 32-frame train
                    + 2 * w * Np_s * Np_l * itemsize)
            if need <= _FLAT_VMEM_BUDGET:
                return w, G
    return 0, 0


def _backward_flat_grouped(qkv, bias, mask, scale, num_heads, g,
                           no_max=False):
    """Grouped-grid fused bwd: (dqkv, dbias) or None if infeasible."""
    Bn, N, threeC = qkv.shape
    C = threeC // 3
    hd = C // num_heads
    if not _GROUPED_ON or hd % 8:
        return None
    nW = None if mask is None else mask.shape[0]
    lanes = _is_lanes(mask)
    nr = mask.shape[-1] if lanes else None
    W, G = _pick_group_block_bwd(Bn, num_heads, N, hd, qkv.dtype.itemsize,
                                 nW, nr)
    if W == 0:
        return None
    nG = num_heads // G
    gw = G * hd
    dt = qkv.dtype
    # lane-sliced views of the flat qkv (block column index units = gw)
    q_spec = pl.BlockSpec((W, N, gw), lambda gi, i: (i, 0, gi),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((W, N, gw), lambda gi, i: (i, 0, nG + gi),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((W, N, gw), lambda gi, i: (i, 0, 2 * nG + gi),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((W, N, gw), lambda gi, i: (i, 0, gi),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((G, N, N), lambda gi, i: (gi, 0, 0),
                             memory_space=pltpu.VMEM)
    dbias_spec = pl.BlockSpec((G, N, N), lambda gi, i: (gi, 0, 0),
                              memory_space=pltpu.VMEM)
    out_shapes = (jax.ShapeDtypeStruct((Bn, N, C), dt),    # dq
                  jax.ShapeDtypeStruct((Bn, N, C), dt),    # dk
                  jax.ShapeDtypeStruct((Bn, N, C), dt),    # dv
                  jax.ShapeDtypeStruct((num_heads, N, N), jnp.float32))
    cost = pl.CostEstimate(
        flops=5 * 2 * Bn * num_heads * N * N * hd,
        bytes_accessed=4 * qkv.size * qkv.dtype.itemsize,
        transcendentals=Bn * num_heads * N * N,
    )
    kwargs = dict(scale=scale, G=G, hd=hd, n_i=Bn // W, no_max=no_max)
    if mask is None:
        dq, dk, dv, dbias = pl.pallas_call(
            functools.partial(_attn_kernel_flat_bwd_grouped, **kwargs),
            grid=(nG, Bn // W),
            in_specs=[q_spec, k_spec, v_spec, bias_spec, g_spec],
            out_specs=(q_spec, q_spec, q_spec, dbias_spec),
            out_shape=out_shapes,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv, qkv, qkv, bias.astype(dt), g)
    elif lanes:
        r_spec = pl.BlockSpec((W, N, nr), lambda gi, i: (i % (nW // W), 0, 0),
                              memory_space=pltpu.VMEM)
        dq, dk, dv, dbias = pl.pallas_call(
            functools.partial(_attn_kernel_flat_bwd_grouped_lanes, **kwargs),
            grid=(nG, Bn // W),
            in_specs=[q_spec, k_spec, v_spec, bias_spec, g_spec, r_spec],
            out_specs=(q_spec, q_spec, q_spec, dbias_spec),
            out_shape=out_shapes,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv, qkv, qkv, bias.astype(dt), g, mask.astype(dt))
    else:
        mask_spec = pl.BlockSpec((W, N, N), lambda gi, i: (i % (nW // W), 0, 0),
                                 memory_space=pltpu.VMEM)
        dq, dk, dv, dbias = pl.pallas_call(
            functools.partial(_attn_kernel_flat_bwd_grouped_masked, **kwargs),
            grid=(nG, Bn // W),
            in_specs=[q_spec, k_spec, v_spec, bias_spec, g_spec, mask_spec],
            out_specs=(q_spec, q_spec, q_spec, dbias_spec),
            out_shape=out_shapes,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv, qkv, qkv, bias.astype(dt), g, mask.astype(dt))
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return dqkv, dbias


def _pick_window_block_bwd(Bn: int, nH: int, N: int, hd: int,
                           itemsize: int, nW: Optional[int],
                           nr: Optional[int] = None) -> int:
    C = nH * hd
    Np_s, Np_l = _pad_to(N, 8), _pad_to(N, 128)
    for w in (16, 8, 4, 2, 1):
        if Bn % w:
            continue
        if nW is not None and (w > nW or nW % w):
            continue
        mask_need = _mask_block_need(w, Np_s, Np_l, hd, itemsize, nW, nr,
                                     f32_copy=False)
        need = (2 * w * Np_s * _pad_to(3 * C, 128) * itemsize   # qkv x2
                + 2 * w * Np_s * _pad_to(C, 128) * itemsize     # g x2
                + 2 * w * Np_s * _pad_to(3 * C, 128) * itemsize  # dqkv x2
                + nH * Np_s * Np_l * 4                          # dbias res.
                + 2 * nH * Np_s * Np_l * itemsize               # bias x2
                + mask_need
                + 3 * w * Np_s * Np_l * 4       # logits/p32 + dp + dlog f32
                # p + dlog_b bf16 casts, same undercount the grouped
                # picker hit (scoped-vmem OOM at the 16 MB limit)
                + 2 * w * Np_s * Np_l * itemsize)
        if need <= _FLAT_VMEM_BUDGET:
            return w
    return 0


_BWD_KERNEL = _os.environ.get("CLOVER_WA_BWD", "1") == "1"
# Lanes in the BACKWARD kernels are gated to short windows: at N=392 the
# grouped bwd's scoped-vmem stack is already at the 16 MB compiler limit
# and the lanes concat temporaries push it 708 KB over (Mosaic OOM at
# Swin-B stage 2, 32-frame train). Long-window bwd converts lanes back to
# the additive mask (one trace-time einsum) — the proven-compiling
# pre-lanes kernel. Forward keeps lanes at every N.
_BWD_LANES_MAX_N = int(_os.environ.get("CLOVER_WA_BWD_LANES_MAX_N", "256"))


def _backward_flat(qkv, bias, mask, scale, num_heads, g, no_max=False):
    """Fused bwd: (dqkv, dbias) or None if infeasible."""
    Bn, N, threeC = qkv.shape
    C = threeC // 3
    hd = C // num_heads
    if _is_lanes(mask) and N > _BWD_LANES_MAX_N:
        mask = lanes_to_additive(mask)
    nW = None if mask is None else mask.shape[0]
    lanes = _is_lanes(mask)
    nr = mask.shape[-1] if lanes else None
    if N > _FLAT_MAX_N:
        return None
    W = _pick_window_block_bwd(Bn, num_heads, N, hd, qkv.dtype.itemsize,
                               nW, nr)
    if W == 0:
        # all-heads working set busts VMEM (Swin-B stage 3: nH=32, C=1024,
        # and stages 2-3 at 32 frames): tile over head groups before
        # falling back to the XLA vjp, whose per-head pad+add scatter
        # chains dominated the r2 train profile (~5 ms/step at stage 3)
        return _backward_flat_grouped(qkv, bias, mask, scale, num_heads, g,
                                      no_max=no_max)
    dt = qkv.dtype
    qkv_spec = pl.BlockSpec((W, N, 3 * C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads, N, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((W, N, C), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    dbias_spec = pl.BlockSpec((num_heads, N, N), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out_shapes = (jax.ShapeDtypeStruct((Bn, N, 3 * C), dt),
                  jax.ShapeDtypeStruct((num_heads, N, N), jnp.float32))
    cost = pl.CostEstimate(
        flops=5 * 2 * Bn * num_heads * N * N * hd,
        bytes_accessed=4 * qkv.size * qkv.dtype.itemsize,
        transcendentals=Bn * num_heads * N * N,
    )
    kwargs = dict(scale=scale, nH=num_heads, hd=hd, n_i=Bn // W,
                  no_max=no_max)
    if mask is None:
        return pl.pallas_call(
            functools.partial(_attn_kernel_flat_bwd, **kwargs),
            grid=(Bn // W,),
            in_specs=[qkv_spec, bias_spec, g_spec],
            out_specs=(qkv_spec, dbias_spec),
            out_shape=out_shapes,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv, bias.astype(dt), g)
    if lanes:
        r_spec = pl.BlockSpec((W, N, nr), lambda i: (i % (nW // W), 0, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_attn_kernel_flat_bwd_lanes, **kwargs),
            grid=(Bn // W,),
            in_specs=[qkv_spec, bias_spec, g_spec, r_spec],
            out_specs=(qkv_spec, dbias_spec),
            out_shape=out_shapes,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv, bias.astype(dt), g, mask.astype(dt))
    mask_spec = pl.BlockSpec((W, N, N), lambda i: (i % (nW // W), 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_flat_bwd_masked, **kwargs),
        grid=(Bn // W,),
        in_specs=[qkv_spec, bias_spec, g_spec, mask_spec],
        out_specs=(qkv_spec, dbias_spec),
        out_shape=out_shapes,
        cost_estimate=cost,
        interpret=_interpret(),
    )(qkv, bias.astype(dt), g, mask.astype(dt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flat_window_attention(qkv, bias, mask, scale, num_heads, no_max=False):
    """softmax(q·kᵀ·scale + bias (+mask)) · v from FLAT qkv (Bn, N, 3C).

    Head slicing happens in VMEM; logits never touch HBM; dots run in the
    input dtype with fp32 accumulation (matching 'xla_headloop' numerics).
    Returns (Bn, N, C) in qkv.dtype.

    ``mask`` accepts two forms, distinguished by shape: (nW, N, N) is the
    classic additive mask; (nW, N, nr) with nr != N is the region-LANES
    form (swin3d.shift_region_lanes) whose 0/10 columns ride the QK^T dot
    inside the lane padding — softmax-equivalent, and faster on the kernel
    path (no (W, N, N) mask add pass / block).

    CONTRACT — ``mask`` gradient is always ZERO on the kernel path: shift
    masks are trace-time constants in this model (swin3d.shift_attn_mask),
    never trainable. Do NOT pass a learned mask through this op and expect
    gradients; use the XLA reference path (CLOVER_ATTN=xla) if you need
    mask differentiability.
    """
    return _forward_flat(qkv, bias, mask, scale, num_heads, no_max=no_max)


def _flat_fwd(qkv, bias, mask, scale, num_heads, no_max=False):
    return (_forward_flat(qkv, bias, mask, scale, num_heads, no_max=no_max),
            (qkv, bias, mask))


def _flat_bwd(scale, num_heads, no_max, residuals, g):
    # the kernel recompute mirrors the forward's softmax mode exactly
    # (same static shift / clamp via no_max — see _bwd_softmax_core);
    # the XLA fallback below keeps the true row max (mathematically the
    # same softmax, so gradients are exact either way)
    qkv, bias, mask = residuals
    if _BWD_KERNEL:
        out = _backward_flat(qkv, bias, mask, scale, num_heads,
                             g.astype(qkv.dtype), no_max=no_max)
        if out is not None:
            dqkv, dbias = out
            dbias = dbias.astype(bias.dtype)
            # shift masks are trace-time constants (never trainable) —
            # their gradient is intentionally zero here
            dmask = None if mask is None else jnp.zeros_like(mask)
            return dqkv, dbias, dmask
    # recompute-based fallback: match the numerics the forward actually
    # ran — fp32 in-VMEM logits when the flat kernel was shape-feasible,
    # input-dtype logits when the forward itself fell back to XLA
    # (pinned by test_kernel_fallbacks.py::test_bwd_fallback_fp32_recompute)
    Bn, N, threeC = qkv.shape
    C = threeC // 3
    hd = C // num_heads
    nW = None if mask is None else mask.shape[0]
    nr = mask.shape[-1] if _is_lanes(mask) else None
    fwd_used_kernel = (
        N <= _FLAT_MAX_N
        and (_pick_window_block_flat(
                 Bn, num_heads, N, hd, qkv.dtype.itemsize, nW, nr) > 0
             or (_GROUPED_ON and hd % 8 == 0
                 and _pick_group_block_flat(
                     Bn, num_heads, N, hd, qkv.dtype.itemsize, nW, nr)[0] > 0)))
    if mask is None:
        _, vjp = jax.vjp(
            lambda a, b: _xla_flat_reference(a, b, None, scale, num_heads,
                                             fp32_logits=fwd_used_kernel),
            qkv, bias)
        dq, db = vjp(g)
        return dq, db, None
    _, vjp = jax.vjp(
        lambda a, b, m: _xla_flat_reference(a, b, m, scale, num_heads,
                                            fp32_logits=fwd_used_kernel),
        qkv, bias, mask)
    return vjp(g)


flat_window_attention.defvjp(_flat_fwd, _flat_bwd)


_FLAT2_ON = _os.environ.get("CLOVER_WA_FLAT2", "1") != "0"


# ------------------------------------------------------- flat2 backward
# Native 2-D backward for the flat2 kernel: takes g (Bn*N, C) row-major
# and emits dqkv (Bn*N, 3C) row-major, recomputing logits/probs in VMEM
# per window exactly like _attn_kernel_flat_bwd. Why it exists: the first
# flat2 training attempt reused the 3-D bwd machinery through a
# (Bn*N, 3C) <-> (Bn, N, 3C) reshape pair, and that relayout (real data
# movement at N % 8 != 0) made training LOSE (50.3 vs 52.8 clips/s at
# B=8) even though the flat2 forward wins +10% — so flat2 was gated
# eval-only. With a 2-D-in/2-D-out bwd both halves of the block keep the
# row-major layout end to end and training can take the flat2 path too.


def _attn_kernel_flat2_bwd(qkv_ref, bias_ref, g_ref, dqkv_ref, dbias_ref,
                           scratch_ref, gscratch_ref, *, scale, nH, hd,
                           W, N, mask_ref=None, r_ref=None, no_max=False):
    C = nH * hd
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    sc = qkv_ref.dtype.type(scale)
    for w in range(W):                                # static row offsets
        qkv_w = _flat2_window(qkv_ref, scratch_ref, w, N)
        g_w = _flat2_window(g_ref, gscratch_ref, w, N)
        m = (None if mask_ref is None
             else mask_ref[w].astype(jnp.float32))    # (N, N)
        r = None if r_ref is None else r_ref[w]       # (N, nr), offset 0
        for h in range(nH):                           # static lane offsets
            # qs = q*scale in bf16; dk = dlogᵀ·qs absorbs the scale (same
            # single-rounding argument as _attn_kernel_flat_bwd)
            qs = qkv_w[:, h * hd:(h + 1) * hd] * sc            # (N, hd)
            k = qkv_w[:, C + h * hd:C + (h + 1) * hd]
            v = qkv_w[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
            if r is not None:
                # shift mask rides the recompute dot as region lanes;
                # dq/dk below contract the REAL k/qs (lanes are constants)
                logits = jax.lax.dot_general(
                    jnp.concatenate([qs, r], axis=-1),
                    jnp.concatenate([k, r], axis=-1),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (Nq, Nk)
            else:
                logits = jax.lax.dot_general(
                    qs, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (Nq, Nk)
            logits = logits + bias_ref[h].astype(jnp.float32)
            if m is not None:
                logits = logits + m
            g_h = g_w[:, h * hd:(h + 1) * hd]                  # (Nq, hd)
            dv, dlog, dlog_b = _bwd_softmax_core(
                logits, v, g_h, qkv_ref.dtype, no_max, r is not None)
            dq = jax.lax.dot_general(
                dlog_b, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale    # (Nq, hd)
            dk = jax.lax.dot_general(
                dlog_b, qs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (Nk, hd)
            lo = w * N
            dqkv_ref[lo:lo + N, h * hd:(h + 1) * hd] = dq.astype(
                dqkv_ref.dtype)
            dqkv_ref[lo:lo + N, C + h * hd:C + (h + 1) * hd] = dk.astype(
                dqkv_ref.dtype)
            dqkv_ref[lo:lo + N, 2 * C + h * hd:2 * C + (h + 1) * hd] = (
                dv.astype(dqkv_ref.dtype))
            dbias_ref[h] += dlog


def _attn_kernel_flat2_bwd_masked(qkv_ref, bias_ref, g_ref, mask_ref,
                                  dqkv_ref, dbias_ref, scratch_ref,
                                  gscratch_ref, **kw):
    _attn_kernel_flat2_bwd(qkv_ref, bias_ref, g_ref, dqkv_ref, dbias_ref,
                           scratch_ref, gscratch_ref, mask_ref=mask_ref,
                           **kw)


def _attn_kernel_flat2_bwd_lanes(qkv_ref, bias_ref, g_ref, r_ref,
                                 dqkv_ref, dbias_ref, scratch_ref,
                                 gscratch_ref, **kw):
    _attn_kernel_flat2_bwd(qkv_ref, bias_ref, g_ref, dqkv_ref, dbias_ref,
                           scratch_ref, gscratch_ref, r_ref=r_ref, **kw)


def _flat2_bwd_feasible(nH: int, N: int, hd: int, itemsize: int,
                        nr: Optional[int] = None) -> bool:
    """Per-program VMEM for the 2-D bwd: double-buffered qkv/g/dqkv
    blocks, resident fp32 dbias + all-heads bias, two normalization
    scratches, one head's fp32 logits/dp/dlog (+ bf16 casts) live."""
    C = nH * hd
    W = _flat2_W(N)
    Np_s, Np_l = _pad_to(N, 8), _pad_to(N, 128)
    mask_need = _mask_block_need(W, Np_s, Np_l, hd, itemsize,
                                 1 if nr is None else None, nr,
                                 f32_copy=False)
    need = (2 * W * N * _pad_to(3 * C, 128) * itemsize      # qkv x2
            + 2 * W * N * _pad_to(C, 128) * itemsize        # g x2
            + 2 * W * N * _pad_to(3 * C, 128) * itemsize    # dqkv x2
            + nH * Np_s * Np_l * 4                          # dbias resident
            + 2 * nH * Np_s * Np_l * itemsize               # bias x2
            + mask_need
            + Np_s * _pad_to(3 * C, 128) * itemsize         # qkv scratch
            + Np_s * _pad_to(C, 128) * itemsize             # g scratch
            + 3 * Np_s * Np_l * 4                           # logits/dp/dlog
            + 2 * Np_s * Np_l * itemsize                    # p/dlog_b casts
            + 2 * Np_s * Np_l * 4)    # per-window f32 mask + per-head f32
                                      # bias cast temps (same convention as
                                      # _flat2_feasible's 'mask/bias f32'
                                      # term — estimator divergence caused
                                      # a real scoped-vmem OOM before)
    return need <= _FLAT_VMEM_BUDGET


def _attn_kernel_flat2_bwd_grouped(q_ref, k_ref, v_ref, bias_ref, g_ref,
                                   dq_ref, dk_ref, dv_ref, dbias_ref,
                                   q3_ref, k3_ref, v3_ref, g3_ref,
                                   dq3_ref, dk3_ref, dv3_ref, *,
                                   scale, G, hd, W, N,
                                   mask_ref=None, r_ref=None,
                                   no_max=False):
    """Head-grouped, WINDOW-BATCHED 2-D backward (r3).

    The first flat2 bwd ran its five dots per head as UNBATCHED (N, ·)
    2-D ops per window and measured 51.8 vs 54.5 clips/s — per-window
    dots lose the (W, N, ·) batched-MXU pipelining of the 3-D grouped
    bwd. Here the W windows are normalized into 3-D VMEM scratches once
    per program (the same sublane-offset-normalizing copy the flat2
    forward already pays per window), the dots run W-BATCHED exactly
    like the 3-D grouped kernel, and dq/dk/dv write back through 3-D
    scratches — so training keeps the row-major 2-D HBM layout (no
    (Bn*N, 3C) <-> (Bn, N, 3C) relayout around the GEMMs) without giving
    up the batched dots. Grid (nG, Bn//W), i fastest: the group's dbias
    stays VMEM-resident across the window sweep."""
    gw = G * hd
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    # 2-D lane-sliced blocks (W*N, gw) -> 3-D (W, N, gw) scratches; odd
    # w*N offsets are normalized by the copy (Mosaic-supported relayout)
    for w in range(W):
        q3_ref[w] = q_ref[w * N:(w + 1) * N, :]
        k3_ref[w] = k_ref[w * N:(w + 1) * N, :]
        v3_ref[w] = v_ref[w * N:(w + 1) * N, :]
        g3_ref[w] = g_ref[w * N:(w + 1) * N, :]

    sc = q_ref.dtype.type(scale)
    r = None if r_ref is None else r_ref[:]          # (W, N, nr), 3-D block
    for h in range(G):
        qs = q3_ref[:, :, h * hd:(h + 1) * hd] * sc          # (W, N, hd)
        k = k3_ref[:, :, h * hd:(h + 1) * hd]
        v = v3_ref[:, :, h * hd:(h + 1) * hd]
        if r is not None:
            logits = jax.lax.dot_general(
                jnp.concatenate([qs, r], axis=-1),
                jnp.concatenate([k, r], axis=-1),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # (W, Nq, Nk)
        else:
            logits = jax.lax.dot_general(
                qs, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        logits = logits + bias_ref[h][None].astype(jnp.float32)
        if mask_ref is not None:
            logits = logits + mask_ref[:].astype(jnp.float32)
        g_h = g3_ref[:, :, h * hd:(h + 1) * hd]              # (W, Nq, hd)
        dv, dlog, dlog_b = _bwd_softmax_core(
            logits, v, g_h, q_ref.dtype, no_max, r is not None)
        dq = jax.lax.dot_general(
            dlog_b, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            dlog_b, qs, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dq3_ref[:, :, h * hd:(h + 1) * hd] = dq.astype(dq3_ref.dtype)
        dk3_ref[:, :, h * hd:(h + 1) * hd] = dk.astype(dk3_ref.dtype)
        dv3_ref[:, :, h * hd:(h + 1) * hd] = dv.astype(dv3_ref.dtype)
        dbias_ref[h] += jnp.sum(dlog, axis=0)

    for w in range(W):
        dq_ref[w * N:(w + 1) * N, :] = dq3_ref[w]
        dk_ref[w * N:(w + 1) * N, :] = dk3_ref[w]
        dv_ref[w * N:(w + 1) * N, :] = dv3_ref[w]


def _attn_kernel_flat2_bwd_grouped_masked(q_ref, k_ref, v_ref, bias_ref,
                                          g_ref, mask_ref, dq_ref, dk_ref,
                                          dv_ref, dbias_ref, *scratches,
                                          **kw):
    _attn_kernel_flat2_bwd_grouped(q_ref, k_ref, v_ref, bias_ref, g_ref,
                                   dq_ref, dk_ref, dv_ref, dbias_ref,
                                   *scratches, mask_ref=mask_ref, **kw)


def _attn_kernel_flat2_bwd_grouped_lanes(q_ref, k_ref, v_ref, bias_ref,
                                         g_ref, r_ref, dq_ref, dk_ref,
                                         dv_ref, dbias_ref, *scratches,
                                         **kw):
    _attn_kernel_flat2_bwd_grouped(q_ref, k_ref, v_ref, bias_ref, g_ref,
                                   dq_ref, dk_ref, dv_ref, dbias_ref,
                                   *scratches, r_ref=r_ref, **kw)


def _pick_flat2_bwd_grouped(Bn: int, nH: int, N: int, hd: int,
                            itemsize: int, nW: Optional[int],
                            nr: Optional[int] = None):
    """(W, G) for the grouped window-batched 2-D bwd, or (0, 0). W must be
    a multiple of _flat2_W(N) so every 2-D block is sublane-aligned."""
    Wmin = _flat2_W(N)
    Np_s, Np_l = _pad_to(N, 8), _pad_to(N, 128)
    # 2-D lane-sliced blocks: Mosaic requires the block's lane dim to be a
    # 128-multiple (it is a strict sub-block of the (M, 3C) array, so the
    # "equal to the array dim" escape never applies) — G*hd must tile
    groups = [g for g in (8, 4, 2, 1)
              if nH % g == 0 and g * hd <= 512 and (g * hd) % 128 == 0]
    groups.sort(key=lambda g: (abs(g * hd - 128), -g))
    for G in groups:
        gwp = _pad_to(G * hd, 128)
        for w in (16, 8, 4, 2, 1):
            if w % Wmin or Bn % w:
                continue
            if nW is not None and (w > nW or nW % w):
                continue
            mask_need = _mask_block_need(w, Np_s, Np_l, hd, itemsize,
                                         nW, nr)
            need = (4 * 2 * w * N * gwp * itemsize      # q,k,v,g blocks x2
                    + 3 * 2 * w * N * gwp * itemsize    # dq,dk,dv x2
                    + 7 * w * Np_s * gwp * itemsize     # 3-D scratches
                    + G * Np_s * Np_l * 4               # dbias resident
                    + 2 * G * Np_s * Np_l * itemsize    # bias x2
                    + mask_need
                    + 3 * w * Np_s * Np_l * 4           # e/dp/dlog f32
                    + 2 * w * Np_s * Np_l * itemsize    # casts
                    + 2 * Np_s * Np_l * 4)              # mask/bias f32 temps
            if need <= _FLAT_VMEM_BUDGET:
                return w, G
    return 0, 0


def _backward_flat2_grouped(qkv2, bias, mask, scale, num_heads, N, g2,
                            no_max=False):
    """Grouped window-batched 2-D bwd: (dqkv2, dbias) or None."""
    M, threeC = qkv2.shape
    C = threeC // 3
    hd = C // num_heads
    Bn = M // N
    if hd % 8:
        return None
    nW = None if mask is None else mask.shape[0]
    lanes = _is_lanes(mask)
    nr = mask.shape[-1] if lanes else None
    W, G = _pick_flat2_bwd_grouped(Bn, num_heads, N, hd,
                                   qkv2.dtype.itemsize, nW, nr)
    if W == 0:
        return None
    nG = num_heads // G
    gw = G * hd
    dt = qkv2.dtype
    q_spec = pl.BlockSpec((W * N, gw), lambda gi, i: (i, gi),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((W * N, gw), lambda gi, i: (i, nG + gi),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((W * N, gw), lambda gi, i: (i, 2 * nG + gi),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((W * N, gw), lambda gi, i: (i, gi),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((G, N, N), lambda gi, i: (gi, 0, 0),
                             memory_space=pltpu.VMEM)
    dbias_spec = pl.BlockSpec((G, N, N), lambda gi, i: (gi, 0, 0),
                              memory_space=pltpu.VMEM)
    out_shapes = (jax.ShapeDtypeStruct((M, C), dt),      # dq
                  jax.ShapeDtypeStruct((M, C), dt),      # dk
                  jax.ShapeDtypeStruct((M, C), dt),      # dv
                  jax.ShapeDtypeStruct((num_heads, N, N), jnp.float32))
    scratch = [pltpu.VMEM((W, N, gw), dt) for _ in range(7)]
    cost = pl.CostEstimate(
        flops=5 * 2 * Bn * num_heads * N * N * hd,
        bytes_accessed=4 * qkv2.size * qkv2.dtype.itemsize,
        transcendentals=Bn * num_heads * N * N,
    )
    kwargs = dict(scale=scale, G=G, hd=hd, W=W, N=N, no_max=no_max)
    if mask is None:
        dq, dk, dv, dbias = pl.pallas_call(
            functools.partial(_attn_kernel_flat2_bwd_grouped, **kwargs),
            grid=(nG, Bn // W),
            in_specs=[q_spec, k_spec, v_spec, bias_spec, g_spec],
            out_specs=(q_spec, q_spec, q_spec, dbias_spec),
            out_shape=out_shapes,
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv2, qkv2, qkv2, bias.astype(dt), g2)
    elif lanes:
        r_spec = pl.BlockSpec((W, N, nr), lambda gi, i: (i % (nW // W), 0, 0),
                              memory_space=pltpu.VMEM)
        dq, dk, dv, dbias = pl.pallas_call(
            functools.partial(_attn_kernel_flat2_bwd_grouped_lanes, **kwargs),
            grid=(nG, Bn // W),
            in_specs=[q_spec, k_spec, v_spec, bias_spec, g_spec, r_spec],
            out_specs=(q_spec, q_spec, q_spec, dbias_spec),
            out_shape=out_shapes,
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv2, qkv2, qkv2, bias.astype(dt), g2, mask.astype(dt))
    else:
        mask_spec = pl.BlockSpec((W, N, N), lambda gi, i: (i % (nW // W), 0, 0),
                                 memory_space=pltpu.VMEM)
        dq, dk, dv, dbias = pl.pallas_call(
            functools.partial(_attn_kernel_flat2_bwd_grouped_masked, **kwargs),
            grid=(nG, Bn // W),
            in_specs=[q_spec, k_spec, v_spec, bias_spec, g_spec, mask_spec],
            out_specs=(q_spec, q_spec, q_spec, dbias_spec),
            out_shape=out_shapes,
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv2, qkv2, qkv2, bias.astype(dt), g2, mask.astype(dt))
    dqkv2 = jnp.concatenate([dq, dk, dv], axis=-1)
    return dqkv2, dbias


def _backward_flat2(qkv2, bias, mask, scale, num_heads, N, g2,
                    no_max=False):
    """2-D fused bwd: (dqkv2, dbias) or None if infeasible.

    Tries the GROUPED window-batched kernel first (W-batched dots — the
    r3 fix for the unbatched variant's measured loss), then the all-heads
    per-window kernel, then None (caller falls back to the 3-D path)."""
    M, threeC = qkv2.shape
    C = threeC // 3
    hd = C // num_heads
    Bn = M // N
    W = _flat2_W(N)
    if _is_lanes(mask) and N > _BWD_LANES_MAX_N:
        mask = lanes_to_additive(mask)
    nW = None if mask is None else mask.shape[0]
    lanes = _is_lanes(mask)
    nr = mask.shape[-1] if lanes else None
    if (not _FLAT2_ON or not _BWD_KERNEL or N > _FLAT_MAX_N or Bn % W
            or (nW is not None and nW % W)):
        return None
    out = _backward_flat2_grouped(qkv2, bias, mask, scale, num_heads, N,
                                  g2, no_max=no_max)
    if out is not None:
        return out
    if not _flat2_bwd_feasible(num_heads, N, hd, qkv2.dtype.itemsize, nr):
        return None
    dt = qkv2.dtype
    qkv_spec = pl.BlockSpec((W * N, 3 * C), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads, N, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((W * N, C), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    dbias_spec = pl.BlockSpec((num_heads, N, N), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out_shapes = (jax.ShapeDtypeStruct((M, 3 * C), dt),
                  jax.ShapeDtypeStruct((num_heads, N, N), jnp.float32))
    cost = pl.CostEstimate(
        flops=5 * 2 * Bn * num_heads * N * N * hd,
        bytes_accessed=4 * qkv2.size * qkv2.dtype.itemsize,
        transcendentals=Bn * num_heads * N * N,
    )
    kwargs = dict(scale=scale, nH=num_heads, hd=hd, W=W, N=N,
                  no_max=no_max)
    scratch = [pltpu.VMEM((N, 3 * C), dt), pltpu.VMEM((N, C), dt)]
    if mask is None:
        return pl.pallas_call(
            functools.partial(_attn_kernel_flat2_bwd, **kwargs),
            grid=(Bn // W,),
            in_specs=[qkv_spec, bias_spec, g_spec],
            out_specs=(qkv_spec, dbias_spec),
            out_shape=out_shapes,
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv2, bias.astype(dt), g2)
    if lanes:
        r_spec = pl.BlockSpec((W, N, nr), lambda i: (i % (nW // W), 0, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_attn_kernel_flat2_bwd_lanes, **kwargs),
            grid=(Bn // W,),
            in_specs=[qkv_spec, bias_spec, g_spec, r_spec],
            out_specs=(qkv_spec, dbias_spec),
            out_shape=out_shapes,
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=_interpret(),
        )(qkv2, bias.astype(dt), g2, mask.astype(dt))
    mask_spec = pl.BlockSpec((W, N, N), lambda i: (i % (nW // W), 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_flat2_bwd_masked, **kwargs),
        grid=(Bn // W,),
        in_specs=[qkv_spec, bias_spec, g_spec, mask_spec],
        out_specs=(qkv_spec, dbias_spec),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        cost_estimate=cost,
        interpret=_interpret(),
    )(qkv2, bias.astype(dt), g2, mask.astype(dt))


# Train-path flat2 (CLOVER_WA_FLAT2_TRAIN, default ON since r3): the
# GROUPED WINDOW-BATCHED 2-D backward (3-D scratch normalization +
# W-batched dots, _attn_kernel_flat2_bwd_grouped) measured pretrain train
# 56.9 -> 59.9 clips/s (+5.3%, B=16) — training now keeps the row-major
# 2-D layout end to end, killing the (Bn*N, 3C) <-> (Bn, N, 3C) HBM
# relayout pairs around every stage-0/1/2 qkv/proj GEMM (~10.6 ms/iter in
# the r3 profile). History: the reshape-pair bwd lost (50.3 vs 52.8 at
# B=8) and the first per-window UNBATCHED 2-D bwd lost (51.8 vs 54.5) —
# batching the dots was the missing piece. '0' restores the 3-D path.
_FLAT2_TRAIN = _os.environ.get("CLOVER_WA_FLAT2_TRAIN", "1") != "0"


def flat2_train_enabled() -> bool:
    """Should TRAINING passes route N % 8 != 0 attention through flat2?
    Default ON (r3, +5.3% train — see _FLAT2_TRAIN note); the knob keeps
    the A/B one env var."""
    return _FLAT2_TRAIN


def flat2_bwd_available(Bn: int, N: int, num_heads: int, C: int,
                        itemsize: int, nW: Optional[int],
                        nr: Optional[int] = None) -> bool:
    """Static feasibility of the NATIVE 2-D backward. Training callers
    (swin3d) take the flat2 path only when this holds — otherwise the bwd
    would fall back to the 3-D machinery through a reshape pair whose
    relayout makes training slower than the 3-D path (measured)."""
    W = _flat2_W(N)
    if nr is not None and N > _BWD_LANES_MAX_N:
        nr = None          # bwd converts lanes back to the additive mask
        nW = nW if nW is not None else 1
    hd = C // num_heads
    return (_FLAT2_ON and _BWD_KERNEL and N <= _FLAT_MAX_N and Bn % W == 0
            and (nW is None or nW % W == 0)
            and (_pick_flat2_bwd_grouped(Bn, num_heads, N, hd, itemsize,
                                         nW, nr)[0] > 0
                 or _flat2_bwd_feasible(num_heads, N, hd, itemsize, nr)))


def flat2_available(Bn: int, N: int, num_heads: int, C: int,
                    itemsize: int, nW: Optional[int],
                    nr: Optional[int] = None) -> bool:
    """Static (trace-time) feasibility of the 2-D kernel path."""
    W = _flat2_W(N)
    return (_FLAT2_ON and N <= _FLAT_MAX_N and Bn % W == 0
            and (nW is None or nW % W == 0)
            and _flat2_feasible(num_heads, N, C // num_heads, itemsize, nr))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flat2_window_attention(qkv2, bias, mask, scale, num_heads, N,
                           no_max=False):
    """2-D flat-in/flat-out window attention: qkv2 (Bn*N, 3C) -> (Bn*N, C).

    Same math and mask forms as flat_window_attention (whose docstring,
    incl. the ZERO-mask-gradient contract, applies verbatim); the window
    axis exists only inside the kernel, so the surrounding qkv/proj GEMMs
    stay row-major 2-D with no HBM re-tiling (the N % 8 != 0 relayout this
    op exists to remove). Falls back to the 3-D kernel / XLA reference
    when no 2-D block is VMEM-feasible.
    """
    out = _forward_flat2(qkv2, bias, mask, scale, num_heads, N,
                         no_max=no_max)
    if out is not None:
        return out
    M, threeC = qkv2.shape
    out3 = _forward_flat(qkv2.reshape(M // N, N, threeC), bias, mask, scale,
                         num_heads, no_max=no_max)
    return out3.reshape(M, threeC // 3)


def _flat2_fwd(qkv2, bias, mask, scale, num_heads, N, no_max=False):
    return (flat2_window_attention(qkv2, bias, mask, scale, num_heads, N,
                                   no_max=no_max),
            (qkv2, bias, mask))


def _flat2_bwd(scale, num_heads, N, no_max, residuals, g):
    qkv2, bias, mask = residuals
    # native 2-D bwd first: keeps g/dqkv row-major (the reshape fallback
    # below is a real relayout at N % 8 != 0 that loses in training)
    out = _backward_flat2(qkv2, bias, mask, scale, num_heads, N,
                          g.astype(qkv2.dtype), no_max=no_max)
    if out is not None:
        dqkv2, dbias = out
        dbias = dbias.astype(bias.dtype)
        # shift masks are trace-time constants — zero grad (flat contract)
        dmask = None if mask is None else jnp.zeros_like(mask)
        return dqkv2, dbias, dmask
    # fallback: reuse the 3-D fused bwd machinery through a reshape pair;
    # _flat_bwd's match-the-forward-numerics logic applies because the 2-D
    # and 3-D kernels share the same in-VMEM fp32-logit math (and the 3-D
    # pickers are at least as permissive as the 2-D one, so "some kernel
    # ran" is decided identically).
    M, threeC = qkv2.shape
    dqkv3, dbias, dmask = _flat_bwd(
        scale, num_heads, no_max,
        (qkv2.reshape(M // N, N, threeC), bias, mask),
        g.reshape(M // N, N, threeC // 3))
    return dqkv3.reshape(M, threeC), dbias, dmask


flat2_window_attention.defvjp(_flat2_fwd, _flat2_bwd)


import os

_KERNEL_VERSION = os.environ.get("CLOVER_WA_KERNEL", "v2")


def _dispatch(q, k, v, bias, mask, scale):
    if _KERNEL_VERSION == "v1":
        return _forward(q, k, v, bias, mask, scale)
    return _forward_v2(q, k, v, bias, mask, scale, version=_KERNEL_VERSION)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_window_attention(q, k, v, bias, mask, scale):
    """softmax(q·kᵀ·scale + bias (+mask)) · v, fused in VMEM.

    q,k,v (Bn,nH,N,hd); bias (nH,N,N); mask (nW,N,N)|None. Returns
    (Bn,nH,N,hd) in q.dtype.
    """
    return _dispatch(q, k, v, bias, mask, scale)


def _fwd(q, k, v, bias, mask, scale):
    return _dispatch(q, k, v, bias, mask, scale), (q, k, v, bias, mask)


def _bwd(scale, residuals, g):
    q, k, v, bias, mask = residuals
    probs = _xla_probs(q, k, bias, mask, scale)          # (Bn,nH,N,N) f32
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", probs, g32)
    dprobs = jnp.einsum("bhqd,bhkd->bhqk", g32, v32)
    # softmax vjp: p * (dp - sum(dp * p))
    dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", dlogits, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", dlogits, q.astype(jnp.float32)) * scale
    dbias = jnp.sum(dlogits, axis=0)
    if mask is None:
        dmask = None
    else:
        nW = mask.shape[0]
        Bn, nH, N, _ = dlogits.shape
        dmask = dlogits.reshape(Bn // nW, nW, nH, N, N).sum(axis=(0, 2))
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias, dmask)


fused_window_attention.defvjp(_fwd, _bwd)
