"""Fused window-attention half-block (Pallas TPU kernel).

Computes, over pre-partitioned windows x (Bn, N, C):

    out = x + (softmax(LN(x)Wq · (LN(x)Wk)^T * scale + bias (+ mask)) · LN(x)Wv) Wproj + bproj

i.e. the entire first half of a Swin block — LN1, the fused qkv projection,
multi-head windowed attention with relative-position bias and shift mask,
the output projection, and the residual — in one pass. The XLA lowering
round-trips the 3C qkv tensor, the head-layout copy, the (Bn, nH, N, N)
logits and the attention output through HBM (~10 C-passes); here
everything after the x read stays in VMEM.

Exactness: LN is per-token and window partition / cyclic roll are
permutations, so LN-after-partition and residual-in-partitioned-layout are
identical to the unfused order. The caller gates on "no spatial padding"
(live configs never pad) and inactive dropout/drop-path.

Weights (constant index maps) stay VMEM-resident across grid steps; heads
are looped in-kernel with lane-sliced q/k/v so only one head's (N, N)
logits are live at a time. Backward = jax.vjp of the XLA reference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clover_tpu.ops.window_attention import (_is_lanes, _mask_block_need,
                                             _softmax_pv)


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


_FORCE_PALLAS = False   # tests: interpret mode on CPU


def _kernel(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
            wp_ref, bp_ref, out_ref, attn_ref, *,
            eps: float, scale: float, nH: int, mask_ref=None, rs_ref=None,
            lanes: bool = False, no_max: bool = False):
    """v2 (bf16-dot protocol, like window_attention.py's flat v5): every
    dot is batched over the whole (W, ...) block and feeds the MXU the
    input dtype with fp32 accumulation; the per-window python loop of v1
    (small unbatched dots, fp32 MXU inputs — the measured 8x penalty) is
    gone. One head's fp32 logits live at a time; bias rides VMEM-resident
    in the compute dtype. rs_ref: optional (W, 1, 1) per-window DropPath
    branch scale. lanes: mask_ref is (W, N, nr) region one-hots riding the
    QK^T dot instead of a (W, N, N) additive block (see
    window_attention._attn_kernel_flat_lanes)."""
    W, N, C = x_ref.shape
    hd = C // nH
    x = x_ref[:].astype(jnp.float32)                      # (W, N, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps) * s_ref[0] + b_ref[0]).astype(
        x_ref.dtype)
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[0]
    qkv = qkv.astype(x_ref.dtype)                         # (W, N, 3C)
    sc = x_ref.dtype.type(scale)
    r = mask_ref[:] if (lanes and mask_ref is not None) else None
    for h in range(nH):                                   # static offsets
        q = qkv[:, :, h * hd:(h + 1) * hd] * sc
        k = qkv[:, :, C + h * hd:C + (h + 1) * hd]
        v = qkv[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        if r is not None:
            q = jnp.concatenate([q, r], axis=-1)
            k = jnp.concatenate([k, r], axis=-1)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (W, N, N) f32
        logits = logits + bias_ref[h][None].astype(jnp.float32)
        if mask_ref is not None and not lanes:
            logits = logits + mask_ref[:].astype(jnp.float32)
        attn_ref[:, :, h * hd:(h + 1) * hd] = _softmax_pv(
            logits, v, attn_ref.dtype,
            static_shift=None if not no_max
            else (130.0 if (lanes and mask_ref is not None) else 30.0),
            clamp_hi=no_max == "clamp")
    y = jax.lax.dot_general(
        attn_ref[:], wp_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bp_ref[0]
    if rs_ref is not None:
        y = y * rs_ref[:]
    out_ref[:] = (x + y).astype(out_ref.dtype)


def _kernel_masked(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
                   mask_ref, wp_ref, bp_ref, out_ref, attn_ref, *,
                   eps, scale, nH, lanes=False, no_max=False):
    _kernel(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
            wp_ref, bp_ref, out_ref, attn_ref,
            eps=eps, scale=scale, nH=nH, mask_ref=mask_ref, lanes=lanes,
            no_max=no_max)


def _kernel_rs(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
               wp_ref, bp_ref, rs_ref, out_ref, attn_ref, *,
               eps, scale, nH, no_max=False):
    _kernel(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
            wp_ref, bp_ref, out_ref, attn_ref,
            eps=eps, scale=scale, nH=nH, rs_ref=rs_ref, no_max=no_max)


def _kernel_masked_rs(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
                      mask_ref, wp_ref, bp_ref, rs_ref, out_ref, attn_ref, *,
                      eps, scale, nH, lanes=False, no_max=False):
    _kernel(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
            wp_ref, bp_ref, out_ref, attn_ref,
            eps=eps, scale=scale, nH=nH, mask_ref=mask_ref, rs_ref=rs_ref,
            lanes=lanes, no_max=no_max)


def _pad_to(n: int, to: int) -> int:
    return -(-n // to) * to


import os as _os

def _env_stage_table(name: str, default: int) -> dict:
    """Parse a knob that may be global ("20") or per-stage keyed by head
    count ("20,nh16:16,nh32:24" — nH identifies the Swin stage and is an
    argument of every picker). The 32-frame eval profile shows stage 2
    (nH=16, 18 blocks) is half the device time, so its kernel parameters
    deserve their own tuning point."""
    raw = _os.environ.get(name, str(default))
    table = {}
    try:
        for part in raw.split(","):
            part = part.strip()
            if not part:
                continue
            if ":" in part:
                k, v = part.split(":", 1)
                k = k.strip().lower()
                if k.startswith("nh"):
                    k = k[2:]
                table[int(k)] = int(v)
            else:
                table[None] = int(part)
    except ValueError as e:
        raise ValueError(
            f"malformed {name}={raw!r} (expected e.g. '20' or "
            f"'20,nh16:16'): {e}") from None
    table.setdefault(None, default)
    return table


_BLOCK_VMEM_TABLE = _env_stage_table("CLOVER_AB_VMEM_MB", 20)
# head-group width preference for the grouped fused block: the picker
# sorts G by |G*hd - target| (measured at the 32-frame eval shape:
# target 192 -> G=8 at stages 2-3; sweep knob)
_GW_TABLE = _env_stage_table("CLOVER_AB_GW_TARGET", 192)


def _block_vmem_budget(nH: int) -> int:
    return _BLOCK_VMEM_TABLE.get(nH, _BLOCK_VMEM_TABLE[None]) * 2 ** 20


def _gw_target(nH: int) -> int:
    return _GW_TABLE.get(nH, _GW_TABLE[None])


def _pick_w(Bn: int, nH: int, N: int, C: int, itemsize: int,
            nW: Optional[int], budget: int = None,
            nr: Optional[int] = None) -> int:
    """Largest per-program window-block W under the VMEM budget, with tile
    padding. Weights and the all-heads bias (compute dtype) stay resident
    (constant index maps); one head's fp32 logits + dtype probs live at a
    time; the fp32 qkv accumulator is the largest per-block temporary.
    ``nr``: mask rides as (W, N, nr) region lanes + two (W, N, hd+nr)
    concat temporaries instead of the (W, N, N) additive block."""
    if budget is None:
        budget = _block_vmem_budget(nH)
    hd = C // nH
    Np_s, Np_l = _pad_to(N, 8), _pad_to(N, 128)
    Cp = _pad_to(C, 128)
    C3p = _pad_to(3 * C, 128)
    weights = 2 * (C * C3p + Cp * Cp) * itemsize          # qkv+proj, 2 buffers
    table = 2 * nH * Np_s * Np_l * itemsize + Np_s * Np_l * 4
    if weights + table > budget:
        return 0
    for w in (16, 8, 4, 2, 1):
        if Bn % w:
            continue
        if nW is not None and (w > nW or nW % w):
            continue
        mask_need = _mask_block_need(w, Np_s, Np_l, hd, itemsize, nW, nr)
        act = (2 * w * Np_s * Cp * itemsize * 2     # x in + out, 2 buffers
               + w * Np_s * Cp * 4                  # x fp32
               + w * Np_s * Cp * itemsize           # xn
               + w * Np_s * C3p * (4 + itemsize)    # qkv fp32 + cast
               + w * Np_s * Np_l * (4 + itemsize)   # logits + probs (1 head)
               + w * Np_s * Cp * itemsize           # attn scratch
               # _softmax_pv / epilogue temps the estimate previously
               # omitted: the fused-sum [v|1] concat (lane-padded), its
               # (hd+1 -> 128)-lane f32 dot accumulator, the f32 y of the
               # proj dot, and the per-head f32 bias cast. Omitting these
               # let mask=None at (Bn=2048, nH=4, N=196) pick W=16, which
               # Mosaic measured at 16.88M scoped vmem vs the 16M limit
               # (the forced-CLOVER_FUSED_ATTN=1 OOM, VERDICT r2 item 6).
               + w * Np_s * 128 * itemsize          # v1 concat
               + w * Np_s * 128 * 4                 # o f32 accumulator
               + w * Np_s * Cp * 4                  # y f32 (proj dot)
               + Np_s * Np_l * 4                    # bias f32 (1 head)
               + mask_need)
        if weights + table + act <= budget:
            return w
    return 0


def _kernel_grouped(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
                    wp_ref, bp_ref, out_ref, xn_ref, attn_ref, acc_ref, *,
                    eps: float, scale: float, G: int, hd: int, nG: int,
                    mask_ref=None, rs_ref=None, lanes: bool = False,
                    no_max: bool = False):
    """Head-group-tiled fused half-block: grid (Bn//W, nG), g fastest.

    Per (i, g) program: the group's 3·gw-column stripe of the qkv
    projection, G heads of attention, and the group's gw-row stripe of the
    output projection, accumulated into an fp32 VMEM scratch across g
    steps (the out block's index map ignores g, so it is revisited). LN
    runs once at g == 0 and is cached in VMEM — what lets stages whose
    all-heads bias cannot fit (Swin-B stages 2-3 at N=392) still run the
    whole half-block in one fused pass."""
    g = pl.program_id(1)
    gw = G * hd

    @pl.when(g == 0)
    def _():
        x = x_ref[:].astype(jnp.float32)              # (W, N, C)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xn_ref[:] = (xc * jax.lax.rsqrt(var + eps) * s_ref[0]
                     + b_ref[0]).astype(xn_ref.dtype)

    qkv = jax.lax.dot_general(
        xn_ref[:], wqkv_ref[0], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[0]
    qkv = qkv.astype(x_ref.dtype)                     # (W, N, 3·gw)
    sc = x_ref.dtype.type(scale)
    r = mask_ref[:] if (lanes and mask_ref is not None) else None
    for h in range(G):                                # static offsets
        q = qkv[:, :, h * hd:(h + 1) * hd] * sc
        k = qkv[:, :, gw + h * hd:gw + (h + 1) * hd]
        v = qkv[:, :, 2 * gw + h * hd:2 * gw + (h + 1) * hd]
        if r is not None:
            q = jnp.concatenate([q, r], axis=-1)
            k = jnp.concatenate([k, r], axis=-1)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        logits = logits + bias_ref[h][None].astype(jnp.float32)
        if mask_ref is not None and not lanes:
            logits = logits + mask_ref[:].astype(jnp.float32)
        attn_ref[:, :, h * hd:(h + 1) * hd] = _softmax_pv(
            logits, v, attn_ref.dtype,
            static_shift=None if not no_max
            else (130.0 if (lanes and mask_ref is not None) else 30.0),
            clamp_hi=no_max == "clamp")
    y = jax.lax.dot_general(
        attn_ref[:], wp_ref[0], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (W, N, C) partial

    @pl.when(g == 0)
    def _():
        acc_ref[:] = y

    @pl.when(g > 0)
    def _():
        acc_ref[:] = acc_ref[:] + y

    @pl.when(g == nG - 1)
    def _():
        branch = acc_ref[:] + bp_ref[0]
        if rs_ref is not None:
            branch = branch * rs_ref[:]
        out_ref[:] = (x_ref[:].astype(jnp.float32)
                      + branch).astype(out_ref.dtype)


def _kernel_grouped_masked(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
                           mask_ref, wp_ref, bp_ref, out_ref, xn_ref,
                           attn_ref, acc_ref, *, eps, scale, G, hd, nG,
                           lanes=False, no_max=False):
    _kernel_grouped(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
                    wp_ref, bp_ref, out_ref, xn_ref, attn_ref, acc_ref,
                    eps=eps, scale=scale, G=G, hd=hd, nG=nG,
                    mask_ref=mask_ref, lanes=lanes, no_max=no_max)


def _kernel_grouped_rs(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
                       wp_ref, bp_ref, rs_ref, out_ref, xn_ref,
                       attn_ref, acc_ref, *, eps, scale, G, hd, nG,
                       no_max=False):
    _kernel_grouped(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
                    wp_ref, bp_ref, out_ref, xn_ref, attn_ref, acc_ref,
                    eps=eps, scale=scale, G=G, hd=hd, nG=nG, rs_ref=rs_ref,
                    no_max=no_max)


def _kernel_grouped_masked_rs(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref,
                              bias_ref, mask_ref, wp_ref, bp_ref, rs_ref,
                              out_ref, xn_ref, attn_ref, acc_ref, *,
                              eps, scale, G, hd, nG, lanes=False,
                              no_max=False):
    _kernel_grouped(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, bias_ref,
                    wp_ref, bp_ref, out_ref, xn_ref, attn_ref, acc_ref,
                    eps=eps, scale=scale, G=G, hd=hd, nG=nG,
                    mask_ref=mask_ref, rs_ref=rs_ref, lanes=lanes,
                    no_max=no_max)


def _pick_wg(Bn: int, nH: int, N: int, C: int, itemsize: int,
             nW: Optional[int], budget: int = None,
             nr: Optional[int] = None):
    """(W, G) for the grouped fused half-block, or (0, 0).

    Prefers gw = G*hd in [128, 256] (full lane tiles with the least
    acc-revisit overhead), then the largest W under the budget. ``nr``:
    mask rides as region lanes (see _pick_w)."""
    if budget is None:
        budget = _block_vmem_budget(nH)
    hd = C // nH
    Np_s, Np_l = _pad_to(N, 8), _pad_to(N, 128)
    Cp = _pad_to(C, 128)
    groups = [g for g in (16, 8, 4, 2, 1) if nH % g == 0 and g < nH]
    groups.sort(key=lambda g: (abs(g * hd - _gw_target(nH)), -g))
    for G in groups:
        gw = G * hd
        g3p = _pad_to(3 * gw, 128)
        gwp = _pad_to(gw, 128)
        weights = 2 * (C * g3p + gwp * Cp) * itemsize
        table = 2 * G * Np_s * Np_l * itemsize + Np_s * Np_l * 4
        if weights + table > budget:
            continue
        for w in (8, 4, 2, 1):
            if Bn % w:
                continue
            if nW is not None and (w > nW or nW % w):
                continue
            mask_need = _mask_block_need(w, Np_s, Np_l, hd, itemsize,
                                         nW, nr)
            act = (2 * w * Np_s * Cp * itemsize * 2     # x in + out, 2 buf
                   + w * Np_s * Cp * 4                  # x fp32 (g==0 / last)
                   + w * Np_s * Cp * (itemsize + 4)     # xn + acc scratch
                   + w * Np_s * g3p * (4 + itemsize)    # qkv fp32 + cast
                   + w * Np_s * Np_l * (4 + itemsize)   # logits + probs
                   + w * Np_s * gwp * itemsize          # attn scratch
                   + mask_need)
            if weights + table + act <= budget:
                return w, G
    return 0, 0


def _forward_grouped(x, ln_scale, ln_bias, wqkv, bqkv, bias, mask,
                     wproj, bproj, row_scale, scale, eps, no_max=False):
    """Grouped-grid path; returns None when no (W, G) fits."""
    Bn, N, C = x.shape
    nH = bias.shape[0]
    hd = C // nH
    nW = None if mask is None else mask.shape[0]
    lanes = _is_lanes(mask)
    nr = mask.shape[-1] if lanes else None
    W, G = _pick_wg(Bn, nH, N, C, x.dtype.itemsize, nW, nr=nr)
    if W == 0:
        return None
    nG = nH // G
    gw = G * hd
    f32 = jnp.float32
    # regroup the projections so each g block is contiguous:
    # wqkv (C, 3C) -> (nG, C, 3*gw) with [q|k|v] stripes per group
    wqkv_g = wqkv.reshape(C, 3, nG, gw).transpose(2, 0, 1, 3).reshape(
        nG, C, 3 * gw).astype(x.dtype)
    # (nG, 1, 3*gw): Mosaic requires the last TWO block dims divisible by
    # (8, 128) or equal to the array dims — a (1, 3gw) block over a
    # (nG, 3gw) array violates the sublane rule when nG > 1
    bqkv_g = bqkv.reshape(3, nG, gw).transpose(1, 0, 2).reshape(
        nG, 1, 3 * gw).astype(f32)
    wproj_g = wproj.reshape(nG, gw, C).astype(x.dtype)
    x_spec = pl.BlockSpec((W, N, C), lambda i, g: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda i, g: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    gsel = lambda shape: pl.BlockSpec(
        shape, lambda i, g: (g,) + tuple(0 for _ in shape[1:]),
        memory_space=pltpu.VMEM)
    common_in = [
        x_spec,
        const2((1, C)), const2((1, C)),
        gsel((1, C, 3 * gw)), gsel((1, 1, 3 * gw)),
        gsel((G, N, N)),                      # block index over nH dim
    ]
    tail_in = [gsel((1, gw, C)), const2((1, C))]
    args = [x, ln_scale.astype(f32).reshape(1, C),
            ln_bias.astype(f32).reshape(1, C),
            wqkv_g, bqkv_g, bias.astype(x.dtype)]
    scratch = [pltpu.VMEM((W, N, C), x.dtype),      # xn cache
               pltpu.VMEM((W, N, gw), x.dtype),     # attn
               pltpu.VMEM((W, N, C), jnp.float32)]  # acc
    cost = pl.CostEstimate(
        flops=2 * Bn * N * (3 * C * C + 2 * N * C + C * C),
        bytes_accessed=2 * Bn * N * C * x.dtype.itemsize,
        transcendentals=Bn * nH * N * N,
    )
    kwargs = dict(eps=eps, scale=scale, G=G, hd=hd, nG=nG, no_max=no_max)
    tail_args = [wproj_g, bproj.astype(f32).reshape(1, C)]
    if row_scale is not None:
        tail_in.append(pl.BlockSpec((W, 1, 1), lambda i, g: (i, 0, 0),
                                    memory_space=pltpu.VMEM))
        tail_args.append(row_scale.astype(f32).reshape(Bn, 1, 1))
    if mask is None:
        kern = _kernel_grouped_rs if row_scale is not None else _kernel_grouped
        return pl.pallas_call(
            functools.partial(kern, **kwargs),
            grid=(Bn // W, nG),
            in_specs=common_in + tail_in,
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=not _is_tpu(),
        )(*args, *tail_args)
    mask_spec = pl.BlockSpec((W, N, nr if lanes else N),
                             lambda i, g: (i % (nW // W), 0, 0),
                             memory_space=pltpu.VMEM)
    kwargs["lanes"] = lanes
    kern = (_kernel_grouped_masked_rs if row_scale is not None
            else _kernel_grouped_masked)
    return pl.pallas_call(
        functools.partial(kern, **kwargs),
        grid=(Bn // W, nG),
        in_specs=common_in + [mask_spec] + tail_in,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=scratch,
        cost_estimate=cost,
        interpret=not _is_tpu(),
    )(*args, mask.astype(x.dtype), *tail_args)


def _xla_reference(x, ln_scale, ln_bias, wqkv, bqkv, bias, mask,
                   wproj, bproj, scale, eps, row_scale=None):
    if _is_lanes(mask):
        # region-lanes form -> classic additive mask (see window_attention)
        from clover_tpu.ops.window_attention import lanes_to_additive

        mask = lanes_to_additive(mask.astype(jnp.float32))
    Bn, N, C = x.shape
    nH = bias.shape[0]
    hd = C // nH
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias).astype(x.dtype)
    qkv = (jnp.dot(xn, wqkv.astype(x.dtype),
                   preferred_element_type=jnp.float32) + bqkv)
    qkv = qkv.reshape(Bn, N, 3, nH, hd)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3).astype(jnp.float32)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3).astype(jnp.float32)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3).astype(jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k) + bias[None]
    if mask is not None:
        nW = mask.shape[0]
        logits = logits.reshape(Bn // nW, nW, nH, N, N) + mask[None, :, None]
        logits = logits.reshape(Bn, nH, N, N)
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bqhd", probs,
                   v).reshape(Bn, N, C).astype(x.dtype)
    y = jnp.dot(o, wproj.astype(x.dtype),
                preferred_element_type=jnp.float32) + bproj
    if row_scale is not None:
        y = y * row_scale.astype(jnp.float32).reshape(Bn, 1, 1)
    return (x32 + y).astype(x.dtype)


def _forward(x, ln_scale, ln_bias, wqkv, bqkv, bias, mask, wproj, bproj,
             row_scale, scale, eps, no_max=False):
    Bn, N, C = x.shape
    nH = bias.shape[0]
    if no_max:
        from clover_tpu.ops.window_attention import (debug_logit_check,
                                                     logit_debug_enabled)

        if logit_debug_enabled():
            # the kernel never materializes qkv in XLA — recompute LN +
            # the qkv GEMM here (debug-only cost) for the bound check
            f32 = jnp.float32
            x32 = x.astype(f32)
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
            xn = ((x32 - mu) * jax.lax.rsqrt(var + eps) * ln_scale
                  + ln_bias).astype(x.dtype)
            qkv_dbg = (jnp.dot(xn.reshape(-1, C), wqkv.astype(x.dtype),
                               preferred_element_type=f32)
                       + bqkv).astype(x.dtype).reshape(Bn, N, 3 * C)
            debug_logit_check(qkv_dbg, bias, mask, scale, nH,
                              tag=f"fused_block:nH{nH},N{N}")
    use_pallas = _is_tpu() or _FORCE_PALLAS
    nW = None if mask is None else mask.shape[0]
    lanes = _is_lanes(mask)
    nr = mask.shape[-1] if lanes else None
    W = _pick_w(Bn, nH, N, C, x.dtype.itemsize, nW, nr=nr) if use_pallas else 0
    if W == 0:
        if use_pallas:
            # all-heads bias busts VMEM (Swin-B stages 2-3 at N=392):
            # tile the grid over head groups before giving up
            out = _forward_grouped(x, ln_scale, ln_bias, wqkv, bqkv, bias,
                                   mask, wproj, bproj, row_scale, scale, eps,
                                   no_max=no_max)
            if out is not None:
                return out
        return _xla_reference(x, ln_scale, ln_bias, wqkv, bqkv, bias, mask,
                              wproj, bproj, scale, eps, row_scale)
    f32 = jnp.float32
    x_spec = pl.BlockSpec((W, N, C), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                        memory_space=pltpu.VMEM)
    common_in = [
        x_spec,
        const2((1, C)), const2((1, C)),
        const2((C, 3 * C)), const2((1, 3 * C)),
        const2((nH, N, N)),
    ]
    tail_in = [const2((C, C)), const2((1, C))]
    args = [x, ln_scale.astype(f32).reshape(1, C),
            ln_bias.astype(f32).reshape(1, C),
            wqkv.astype(x.dtype), bqkv.astype(f32).reshape(1, 3 * C),
            bias.astype(x.dtype)]
    cost = pl.CostEstimate(
        flops=2 * Bn * N * (3 * C * C + 2 * N * C + C * C),
        bytes_accessed=2 * Bn * N * C * x.dtype.itemsize,
        transcendentals=Bn * nH * N * N,
    )
    tail_args = [wproj.astype(x.dtype), bproj.astype(f32).reshape(1, C)]
    if row_scale is not None:
        tail_in.append(pl.BlockSpec((W, 1, 1), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM))
        tail_args.append(row_scale.astype(f32).reshape(Bn, 1, 1))
    if mask is None:
        kern = _kernel_rs if row_scale is not None else _kernel
        return pl.pallas_call(
            functools.partial(kern, eps=eps, scale=scale, nH=nH,
                              no_max=no_max),
            grid=(Bn // W,),
            in_specs=common_in + tail_in,
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[pltpu.VMEM((W, N, C), x.dtype)],
            cost_estimate=cost,
            interpret=not _is_tpu(),
        )(*args, *tail_args)
    # BLOCK index semantics (element offset = index * block dim):
    # i % (nW // W), NOT (i*W) % nW — see window_attention._forward_v2
    mask_spec = pl.BlockSpec((W, N, nr if lanes else N),
                             lambda i: (i % (nW // W), 0, 0),
                             memory_space=pltpu.VMEM)
    kern = _kernel_masked_rs if row_scale is not None else _kernel_masked
    return pl.pallas_call(
        functools.partial(kern, eps=eps, scale=scale, nH=nH, lanes=lanes,
                          no_max=no_max),
        grid=(Bn // W,),
        in_specs=common_in + [mask_spec] + tail_in,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((W, N, C), x.dtype)],
        cost_estimate=cost,
        interpret=not _is_tpu(),
    )(*args, mask.astype(x.dtype), *tail_args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def fused_window_attn_block(x, ln_scale, ln_bias, wqkv, bqkv, bias, mask,
                            wproj, bproj, row_scale=None,
                            scale: float = 1.0, eps: float = 1e-5,
                            no_max: bool = False):
    """x + row_scale * proj(window_attention(LN(x))) over partitioned
    windows (Bn, N, C); row_scale is the optional per-window DropPath
    factor (keep/keep_prob), None = 1. See module docstring."""
    return _forward(x, ln_scale, ln_bias, wqkv, bqkv, bias, mask, wproj,
                    bproj, row_scale, scale, eps, no_max=no_max)


def _fwd(x, ln_scale, ln_bias, wqkv, bqkv, bias, mask, wproj, bproj,
         row_scale, scale, eps, no_max=False):
    out = _forward(x, ln_scale, ln_bias, wqkv, bqkv, bias, mask, wproj,
                   bproj, row_scale, scale, eps, no_max=no_max)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, bias, mask, wproj, bproj,
                 row_scale)


def _composed_reference(x, ln_scale, ln_bias, wqkv, bqkv, bias, mask,
                        wproj, bproj, scale, eps, row_scale=None):
    """Same math as the fused kernel, expressed through ops whose own
    custom vjps carry fused backward kernels: the recompute-based vjp of
    THIS function runs the flat attention bwd Pallas kernel on TPU instead
    of XLA's einsum chain (the r1 trace showed that chain spending 46% of
    bwd device time in relayout copies). Off-TPU every piece falls back to
    equivalent XLA math. Mask grads are zero on the kernel path (shift
    masks are trace-time constants — see flat_window_attention's
    contract)."""
    from clover_tpu.ops.window_attention import flat_window_attention

    Bn, N, C = x.shape
    nH = bias.shape[0]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias).astype(x.dtype)
    qkv = (jnp.dot(xn.reshape(-1, C), wqkv.astype(x.dtype),
                   preferred_element_type=jnp.float32) + bqkv)
    qkv = qkv.astype(x.dtype).reshape(Bn, N, 3 * C)
    attn = flat_window_attention(
        qkv, bias, None if mask is None else mask.astype(jnp.float32),
        scale, nH)
    y = (jnp.dot(attn.reshape(-1, C), wproj.astype(x.dtype),
                 preferred_element_type=jnp.float32)
         + bproj).reshape(Bn, N, C)
    if row_scale is not None:
        y = y * row_scale.astype(jnp.float32).reshape(Bn, 1, 1)
    return (x32 + y).astype(x.dtype)


def _bwd(scale, eps, no_max, residuals, g):
    # recompute uses the true row max — same softmax, exact gradients
    (x, ln_scale, ln_bias, wqkv, bqkv, bias, mask, wproj, bproj,
     row_scale) = residuals
    diff = [x, ln_scale, ln_bias, wqkv, bqkv, bias]
    if mask is not None:
        diff.append(mask)
    diff += [wproj, bproj]
    if row_scale is not None:
        diff.append(row_scale)

    def ref(*a):
        a = list(a)
        xx, ls, lb, wq, bq, bi = a[:6]
        i = 6
        m = a[i] if mask is not None else None
        i += mask is not None
        wp, bp = a[i], a[i + 1]
        rs = a[i + 2] if row_scale is not None else None
        return _composed_reference(xx, ls, lb, wq, bq, bi, m, wp, bp,
                                   scale, eps, rs)

    _, vjp = jax.vjp(ref, *diff)
    grads = list(vjp(g))
    i = 6
    dmask = grads[i] if mask is not None else None
    i += mask is not None
    dwp, dbp = grads[i], grads[i + 1]
    drs = grads[i + 2] if row_scale is not None else None
    return (*grads[:6], dmask, dwp, dbp, drs)


fused_window_attn_block.defvjp(_fwd, _bwd)
