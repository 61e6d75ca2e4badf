"""Video Swin Transformer (3D shifted-window attention) in flax, TPU-first.

Re-implements the behavior of the reference SwinTransformer3D
(mmaction/models/backbones/swin_transformer_3d.py:18-688) with a design
chosen for XLA/TPU rather than translated from torch:

- canonical layout is channels-last (B, T, H, W, C) end to end — the
  reference's NCDHW permute round-trips (swin_transformer_3d.py:634,645)
  disappear;
- the patch embedding (reference: Conv3d stride==kernel, :665) lowers to a
  space-to-depth reshape + one MXU matmul when kernel == stride;
- the shifted-window attention masks (reference: lru_cached compute_mask,
  :548-562) and relative-position-bias indices (:344-358) are computed with
  numpy at trace time — under jit they are free constants;
- window clamping (reference get_window_size, :302-315) is resolved
  statically per input shape; the relative-position index is built directly
  for the effective window (equivalent to the reference's [:N,:N] slice for
  temporal clamping, the only clamping the live configs hit);
- gradient checkpointing (reference :494-503) maps to nn.remat per block;
- the SimMIM mask-token mixing for the masked-video branch mirrors
  swin_transformer_3d.py:109-112,222-230.
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clover_tpu.models.layers import DropPath, Mlp, dense, layer_norm, trunc_normal_init

Dtype = Any
Tuple3 = Tuple[int, int, int]


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: Tuple3 = (2, 4, 4)
    stride: Tuple3 = (2, 4, 4)
    in_chans: int = 3
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: Tuple3 = (8, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    mask_token: bool = False
    # gradient checkpointing: True = every block (reference :494-503);
    # a tuple of stage ids remats only those stages — selective remat
    # keeps the memory win where activations are large (early stages)
    # without recomputing the 18-block stage 3
    use_checkpoint: Any = False
    # 'auto' (default) -> 'pallas_flat' everywhere (falls back to
    # 'xla_headloop' for training only if the fused bwd kernel is disabled
    # via CLOVER_WA_BWD=0).
    # 'pallas_flat': fused VMEM kernels on the un-relayouted qkv — bf16
    # MXU dots with fp32 accumulation, head slicing at static lane
    # offsets, logits never touch HBM, and a matching fused backward that
    # emits dqkv/dbias directly in the flat layout (the XLA attention bwd
    # was 46% of train-step device time in relayout copies). Measured:
    # eval 423-438 vs 368-371 headloop (+15%); train 40.4 vs 31.8 (+27%).
    # XLA fallback off-TPU and for long windows (N>256, measured slower).
    # 'xla_headloop': per-head lane slices of the flat qkv, no relayout
    # copy (+10% over 'xla'). 'xla': batched einsum reference.
    # 'pallas'/'fused_block': earlier fp32-dot kernels, slower (they fed
    # the MXU fp32 — see BASELINE.md kernel log / docs/KERNELS.md).
    attention_impl: str = "auto"
    # 'conv' (default): XLA conv lowering of the patch embed — avoids the
    # tiny-trailing-dim space-to-depth transposes (+4% eval). 's2d':
    # space-to-depth + matmul. Identical Dense param layout either way.
    embed_impl: str = "conv"
    # keep activations window-partitioned across each whole stage:
    # unshifted blocks run with zero layout ops, shifted blocks pay one
    # permutation each way, partition/reverse happen once per stage
    # (automatically off for stages whose dims don't divide the window,
    # or when sequence-parallel act_sharding is set). Numerics identical
    # (pinned by tests/test_swin.py).
    window_resident: bool = True
    # sequence parallelism (capability beyond the DP-only reference,
    # SURVEY.md §5.7): per-dim mesh-axis names for the (B, D, H, W, C)
    # block activations, e.g. ('data', None, 'sp', None, None) shards the
    # spatial rows; GSPMD turns the shifted-window jnp.roll into a ring
    # halo exchange (collective-permute), the same O(shift) traffic as
    # parallel/sequence.py:distributed_roll. Requires running under
    # jax.set_mesh with the named axes; silently inactive otherwise.
    act_sharding: Optional[Tuple[Optional[str], ...]] = None
    # fuse each block's LN2+MLP+residual (incl. the DropPath row scale)
    # into one Pallas kernel — the 4C hidden never touches HBM; measured
    # +15.6% eval throughput on v5e. Param tree unchanged; numerically
    # parity-tested vs the unfused graph; XLA fallback off-TPU and when
    # in-MLP dropout is active (drop>0, unused by live configs).
    fused_mlp: bool = True
    # fold the ImageNet mean/std normalization into the patch-embed
    # projection weights: the model then takes PIXEL-SCALE input (uint8
    # cast to compute dtype; eval_preprocess(normalize=False)) and the
    # (2wi+b) affine rides for free inside the embed GEMM — the
    # (B, T, 224, 224, 3) normalized intermediate never exists in HBM.
    # Exact: normalize is per-input-channel affine and the projection is
    # linear, so W' = W/std_c, b' = b - sum(W * mean_c/std_c). Off by
    # default (the input contract changes); bench/eval enable it.
    fold_normalize: bool = False
    # gelu flavor for the MLP halves: 'tanh' (original-BERT approximation,
    # |err| <= 5e-4 abs — far below bf16 activation noise) measured +5.5%
    # on 32-frame eval (the rational-erf emulation is the MLP kernel's
    # largest VPU pass; Mosaic has no erf primitive). INTENTIONAL
    # DIVERGENCE from the reference's exact-erf nn.GELU
    # (swin_transformer_3d.py:250-268) — set 'erf' for strict parity.
    gelu: str = "tanh"

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    @classmethod
    def tiny(cls, **kw) -> "SwinConfig":
        return cls(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), **kw)

    @classmethod
    def base(cls, **kw) -> "SwinConfig":
        return cls(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), **kw)


def effective_window(
    x_size: Tuple3, window: Tuple3, shift: Optional[Tuple3] = None
):
    """Clamp window dims to the input size; clamped dims get zero shift.

    Static-shape equivalent of reference get_window_size (:302-315).
    """
    win = list(window)
    sh = list(shift) if shift is not None else None
    for i in range(3):
        if x_size[i] <= window[i]:
            win[i] = x_size[i]
            if sh is not None:
                sh[i] = 0
    if sh is None:
        return tuple(win)
    return tuple(win), tuple(sh)


@functools.lru_cache(maxsize=None)
def relative_position_index(full_window: Tuple3, eff_window: Tuple3) -> np.ndarray:
    """(N, N) index into the (2Wd-1)(2Wh-1)(2Ww-1)-row bias table.

    Built for the *effective* window but with the *full* window's offsets and
    strides, so the same parameter table serves every input length
    (reference :344-358 plus the [:N,:N] runtime slice at :382).
    """
    coords = np.stack(
        np.meshgrid(*[np.arange(w) for w in eff_window], indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # 3, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    for i in range(3):
        rel[:, :, i] += full_window[i] - 1
    rel[:, :, 0] *= (2 * full_window[1] - 1) * (2 * full_window[2] - 1)
    rel[:, :, 1] *= 2 * full_window[2] - 1
    return rel.sum(-1).astype(np.int32)


_BIAS_MATMUL = _os.environ.get("CLOVER_BIAS_MATMUL", "1") != "0"


@functools.lru_cache(maxsize=None)
def _rel_onehot_factors(full_window: Tuple3, eff_window: Tuple3):
    """Per-dim one-hot factors O[a, b, r] = 1[a - b + W - 1 == r]: the
    relative-position index is separable over (d, h, w), so the (N, N)
    table gather factorizes into three tiny dense contractions."""
    outs = []
    for w, W in zip(eff_window, full_window):
        a = np.arange(w)
        oh = np.zeros((w, w, 2 * W - 1), np.float32)
        oh[a[:, None], a[None, :], a[:, None] - a[None, :] + W - 1] = 1.0
        outs.append(oh)
    return tuple(outs)


def bias_from_table(bias_table: jax.Array, full_window: Tuple3,
                    eff_window: Tuple3, num_heads: int) -> jax.Array:
    """(table_len, nH) trainable table -> (nH, N, N) attention bias.

    Default: the reference's bias_table[rp_index] row-gather
    (swin_transformer_3d.py:380-384) expressed as an einsum against
    trace-time one-hot factors — bit-identical values (each output sums
    exactly one table entry; pinned by tests), but the BACKWARD becomes
    three dense MXU contractions instead of XLA's serial (N², table_len)
    scatter-add, which the r3 train profile measured at ~4.8 ms/iter for
    Swin-B stage 2 alone. CLOVER_BIAS_MATMUL=0 restores the gather (and
    its scatter-add vjp)."""
    N = int(np.prod(eff_window))
    if not _BIAS_MATMUL:
        rp_index = relative_position_index(tuple(full_window),
                                           tuple(eff_window))
        return bias_table[rp_index.reshape(-1)].reshape(
            N, N, num_heads).transpose(2, 0, 1)
    Od, Oh, Ow = (jnp.asarray(o) for o in _rel_onehot_factors(
        tuple(full_window), tuple(eff_window)))
    t3 = bias_table.reshape(
        tuple(2 * w - 1 for w in full_window) + (num_heads,))
    b = jnp.einsum("xyzn,abx,cdy,efz->nacebdf", t3, Od, Oh, Ow)
    return b.reshape(num_heads, N, N)


@functools.lru_cache(maxsize=None)
def _shift_region_ids(
    padded_size: Tuple3, window: Tuple3, shift: Tuple3
) -> Optional[np.ndarray]:
    """(nW, N) per-window region ids for the shifted-window mask.

    Same region-counting construction as reference compute_mask (:548-562),
    done in numpy at trace time.
    """
    if not any(s > 0 for s in shift):
        return None
    D, H, W = padded_size
    img_mask = np.zeros((D, H, W), dtype=np.int32)
    cnt = 0
    for d in (slice(-window[0]), slice(-window[0], -shift[0] or None),
              slice(-shift[0] or None, None)):
        for h in (slice(-window[1]), slice(-window[1], -shift[1] or None),
                  slice(-shift[1] or None, None)):
            for w in (slice(-window[2]), slice(-window[2], -shift[2] or None),
                      slice(-shift[2] or None, None)):
                img_mask[d, h, w] = cnt
                cnt += 1
    # partition into windows: (nW, N)
    return img_mask.reshape(
        D // window[0], window[0], H // window[1], window[1], W // window[2], window[2]
    ).transpose(0, 2, 4, 1, 3, 5).reshape(-1, window[0] * window[1] * window[2])


@functools.lru_cache(maxsize=None)
def shift_attn_mask(
    padded_size: Tuple3, window: Tuple3, shift: Tuple3
) -> Optional[np.ndarray]:
    """(nW, N, N) additive mask (0 / -100) for shifted-window attention
    (reference compute_mask :548-562)."""
    wins = _shift_region_ids(padded_size, window, shift)
    if wins is None:
        return None
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def shift_region_lanes(
    padded_size: Tuple3, window: Tuple3, shift: Tuple3
) -> Optional[np.ndarray]:
    """(nW, N, nr) sqrt(100)-scaled per-window region one-hots R.

    The shifted-window mask only tests region equality:
    mask = -100*(1 - delta_same_region) and delta = R_01 @ R_01^T. The
    attention kernels append these 0/10 columns to the q and k head slices
    inside their hd -> 128 lane padding, so logits pick up +100*delta from
    the SAME QK^T matmul at zero MXU cost — softmax-equivalent to the -100
    additive form (the +/-100 differ by a per-row constant) — and the
    (nW, N, N) mask add pass + VMEM block disappear. nr = max distinct
    regions in any window (<= 8 for a 3-axis shift). Only fp32-logit
    kernel paths may consume this form: +100 on the LIVE logits would cost
    ~0.5 ulp in bf16 (the -100 form only perturbs suppressed entries).
    Reference semantics: compute_mask (:548-562).
    """
    wins = _shift_region_ids(padded_size, window, shift)
    if wins is None:
        return None
    nW, N = wins.shape
    uniqs = [np.unique(w) for w in wins]
    nr = max(len(u) for u in uniqs)
    if nr >= N:
        # degenerate tiny windows (e.g. N=8 with 8 distinct regions): the
        # lanes form is shape-ambiguous with the additive (nW, N, N) mask
        # and saves nothing — return the additive form, which every
        # consumer accepts
        return shift_attn_mask(padded_size, window, shift)
    lanes = np.zeros((nW, N, nr), np.float32)
    for w, u in enumerate(uniqs):
        for j, rid in enumerate(u):
            lanes[w, :, j] = np.where(wins[w] == rid, 10.0, 0.0)
    return lanes


def _use_mask_lanes(impl: str, fused: bool = False) -> bool:
    """Shift mask in region-lanes form? Only the fp32-logit kernel paths
    (flat_window_attention, fused_window_attn_block) consume it; the XLA /
    headloop paths keep the additive mask (bf16 logits at +100 would lose
    ~0.5 ulp on live entries)."""
    from clover_tpu.ops.window_attention import mask_lanes_enabled

    return mask_lanes_enabled() and (fused or impl == "pallas_flat")


def embed_dims(cfg: SwinConfig, in_shape: Tuple3) -> Tuple3:
    """(T, H, W) video -> (D, H', W') token dims after the patch embed."""
    return tuple(-(-s // p) for s, p in zip(in_shape, cfg.patch_size))


def swin_bias_cache(params, cfg: SwinConfig, in_shape: Optional[Tuple3] = None,
                    token_dims: Optional[Tuple3] = None):
    """Precompute every block's (nH, N, N) relative-position bias.

    The per-block ``bias_table[rp_index]`` gather is a pure function of the
    parameters and the static input shape, but XLA re-executes it on every
    dispatch (and every lax.scan iteration): the 32-frame eval profile
    showed ~24 gathers x 0.25 ms = 6 ms/step — TPU row-gathers run at
    ~1 row/cycle, far under copy bandwidth. Computing the cache ONCE per
    checkpoint and passing it to ``SwinTransformer3D.__call__(...,
    bias_cache=...)`` removes that cost from the hot path.

    EVAL-ONLY by design: a cached bias is an input, so no gradient flows
    to the table — training paths must not pass a cache.

    params:   the backbone's param subtree (contains stage_i_block_j/attn/
              relative_position_bias_table)
    in_shape: (T, H, W) of the video fed to the backbone; pass
              token_dims=(D', H', W') instead when the post-embed token
              dims are known directly (host_s2d batches).
    Returns {block_name: (nH, N, N) float32}, suitable for jit.
    """
    dims = token_dims if token_dims is not None else embed_dims(cfg, in_shape)
    cache = {}
    for i_stage in range(len(cfg.depths)):
        window, _ = effective_window(dims, cfg.window_size, (0, 0, 0))
        N = int(np.prod(window))
        nH = cfg.num_heads[i_stage]
        rp_index = relative_position_index(cfg.window_size, tuple(window))
        idx = jnp.asarray(rp_index.reshape(-1))
        for i_blk in range(cfg.depths[i_stage]):
            name = f"stage_{i_stage}_block_{i_blk}"
            table = params[name]["attn"]["relative_position_bias_table"]
            cache[name] = (table.astype(jnp.float32)[idx]
                           .reshape(N, N, nH).transpose(2, 0, 1))
        if i_stage < len(cfg.depths) - 1:
            dims = (dims[0], -(-dims[1] // 2), -(-dims[2] // 2))
    return cache


def bias_cache_builder(cfg: SwinConfig):
    """Callable form for eval loops: ``build(params, in_shape)`` -> cache.

    ``params`` may be the full model tree (the 'backbone' subtree is
    auto-selected) or the backbone subtree itself. The eval loops accept
    this callable via their ``bias_cache`` argument and materialize it at
    the first batch, when the frame count is known."""

    def build(params, in_shape: Tuple3, s2d: bool = False):
        sub = params.get("backbone", params) if hasattr(params, "get") else params
        kw = {"token_dims": in_shape} if s2d else {"in_shape": in_shape}
        return jax.jit(lambda p: swin_bias_cache(p, cfg, **kw))(sub)

    return build


def constrain_activation(
    x: jax.Array, spec: Optional[Tuple[Optional[str], ...]]
) -> jax.Array:
    """with_sharding_constraint(x, P(*spec)) when a mesh context with the
    named axes is active; identity otherwise (single-device / tests)."""
    if spec is None:
        return x
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty:
        return x
    names = set(mesh.axis_names)
    used = tuple(s if (s in names) else None for s in spec)
    if not any(used):
        return x
    from jax.sharding import PartitionSpec as P

    return jax.lax.with_sharding_constraint(x, P(*used[: x.ndim]))


def window_partition(x: jax.Array, window: Tuple3) -> jax.Array:
    """(B, D, H, W, C) -> (B * nW, N, C)."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // window[0], window[0], H // window[1], window[1],
                  W // window[2], window[2], C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, window[0] * window[1] * window[2], C)


def window_reverse(windows: jax.Array, window: Tuple3, B: int, D: int, H: int, W: int) -> jax.Array:
    """(B * nW, N, C) -> (B, D, H, W, C)."""
    C = windows.shape[-1]
    x = windows.reshape(B, D // window[0], H // window[1], W // window[2],
                        window[0], window[1], window[2], C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, C)


@functools.lru_cache(maxsize=64)
def _window_shift_perm_np(dims: Tuple3, window: Tuple3, shift: Tuple3):
    """Token permutation unshifted-window-major -> shifted-window-major.

    Window-resident stages (see SwinBlock3D.resident_dims) keep activations
    partitioned as (B, nW*N, C); a shifted block needs tokens regrouped by
    the rolled grid. The composition partition∘roll∘reverse is one fixed
    permutation — precomputed here in numpy at trace time. Returns
    (perm, inv_perm) with x_shifted[:, i] = x[:, perm[i]].
    """
    D, H, W = dims
    wd, wh, ww = window

    def part(t):
        t = t.reshape(D // wd, wd, H // wh, wh, W // ww, ww)
        return t.transpose(0, 2, 4, 1, 3, 5).reshape(-1)

    tokens = np.arange(D * H * W).reshape(D, H, W)
    base = part(tokens)
    rolled = part(np.roll(tokens, (-shift[0], -shift[1], -shift[2]),
                          axis=(0, 1, 2)))
    inv_base = np.empty_like(base)
    inv_base[base] = np.arange(base.size)
    perm = inv_base[rolled]
    inv_perm = np.empty_like(perm)
    inv_perm[perm] = np.arange(perm.size)
    return perm.astype(np.int32), inv_perm.astype(np.int32)


_WIN_PERM_MODE = _os.environ.get("CLOVER_WIN_PERM", "auto")
# fully-fused attention half-block in the window-resident path:
# 'auto' (default) enables it only for large windows — measured A/B on TPU
# (BASELINE.md 2026-08-17): at N=392 (32-frame) fused wins 113.1 vs 104.4
# clips/s; at N=196 (8-frame) it loses 463 vs 484 (the standalone flat
# kernel + XLA GEMMs keep the MXU busier on small windows). '1'/'0' force.
_FUSED_ATTN_MODE = _os.environ.get("CLOVER_FUSED_ATTN", "auto")


def _fused_attn_enabled(N: int) -> bool:
    if _FUSED_ATTN_MODE == "auto":
        return N >= 384
    return _FUSED_ATTN_MODE != "0"


def _apply_window_perm(x: jax.Array, dims: Tuple3, window: Tuple3,
                       shift: Tuple3, inverse: bool) -> jax.Array:
    """Regroup window-major tokens for (or back from) a shifted block.

    'compose': reverse -> roll -> partition in XLA layout ops — the
    compiler collapses the chain into 1-2 copies. 'take': a single
    constant-index gather. 'auto' (default) picks by window token count:
    measured A/B on TPU (BASELINE.md 2026-08-17) — at N=392 (32-frame)
    take wins 96.6 vs 93.9; at N=196 (8-frame) compose wins 454.4 vs
    439.5 (the gather's row granularity beats the copy chain only once
    rows are lane-width multiples).
    """
    B, L, C = x.shape
    N = window[0] * window[1] * window[2]
    mode = _WIN_PERM_MODE
    if mode == "auto":
        mode = "take" if N % 128 == 0 or N >= 384 else "compose"
    if mode == "take":
        perm, inv = _window_shift_perm_np(tuple(dims), tuple(window),
                                          tuple(shift))
        return jnp.take(x, jnp.asarray(inv if inverse else perm), axis=1)
    D, H, W = dims
    s = tuple(shift)
    roll = s if inverse else (-s[0], -s[1], -s[2])
    xs = window_reverse(x.reshape(-1, N, C), window, B, D, H, W)
    xs = jnp.roll(xs, shift=roll, axis=(1, 2, 3))
    return window_partition(xs, window).reshape(B, L, C)


class WindowAttention3D(nn.Module):
    """W-MSA / SW-MSA over flattened 3D windows with relative position bias.

    Behavior of reference WindowAttention3D (:318-400); the bias table keeps
    the reference's flattened (L, nH) shape for exact weight conversion.
    """

    dim: int
    full_window: Tuple3
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    attention_impl: str = "xla"             # 'xla' | 'pallas'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                       # (B*nW, N, C)
        eff_window: Tuple3,
        attn_mask: Optional[jax.Array] = None,  # (nW, N, N) additive or None
        *,
        deterministic: bool = True,
        bias_override: Optional[jax.Array] = None,  # precomputed (nH, N, N)
    ) -> jax.Array:
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5
        N = int(np.prod(eff_window))

        table_len = int(np.prod([2 * w - 1 for w in self.full_window]))
        bias_table = self.param(
            "relative_position_bias_table", trunc_normal_init,
            (table_len, self.num_heads), jnp.float32)

        def make_bias():
            # eval-time callers pass the precomputed (nH, N, N) bias
            # (swin_bias_cache) to skip the per-step table row-gather
            if bias_override is not None:
                return bias_override
            return bias_from_table(bias_table, self.full_window,
                                   tuple(eff_window), self.num_heads)

        if x.ndim == 5:
            # fused spatial path (attention_impl='pallas_fused'): windows
            # are sliced by the kernel's BlockSpecs straight out of the
            # (B, Dp, Hp, Wp, C) layout — no partition/reverse transposes.
            from clover_tpu.ops.window_attention import spatial_window_attention

            B5, Dp, Hp, Wp, C5 = x.shape
            bias = make_bias()
            qkv5 = dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="qkv")(x)
            qkv5 = qkv5.reshape(B5, Dp, Hp, Wp, 3, self.num_heads, head_dim)
            out = spatial_window_attention(
                qkv5, bias,
                None if attn_mask is None else attn_mask.astype(jnp.float32),
                tuple(eff_window), scale)
            out = out.reshape(B5, Dp, Hp, Wp, C5)
            out = dense(self.dim, dtype=self.dtype, name="proj")(out)
            return nn.Dropout(self.proj_drop, deterministic=deterministic)(out)

        if x.ndim == 2:
            # flat-token path (window-resident callers, N % 8 != 0): x is
            # (Bn*N, C) row-major. The qkv GEMM, the flat2 attention kernel,
            # and the proj GEMM all consume/produce 2-D — none of the
            # (Bn, N, C) re-tiling copies the 3-D path pays when N is not
            # sublane-aligned (~17% of the 8-frame eval step; TODO r3 lead).
            from clover_tpu.ops.window_attention import (
                flat2_window_attention, no_max_enabled)

            M, C = x.shape
            bias = make_bias()
            qkv2 = dense(self.dim * 3, use_bias=self.qkv_bias,
                         dtype=self.dtype, name="qkv")(x)
            flat_mask = (None if attn_mask is None
                         else attn_mask.astype(jnp.float32))
            out2 = flat2_window_attention(qkv2, bias, flat_mask, scale,
                                          self.num_heads, N,
                                          no_max_enabled(deterministic))
            out2 = dense(self.dim, dtype=self.dtype, name="proj")(out2)
            return nn.Dropout(self.proj_drop,
                              deterministic=deterministic)(out2)

        Bn, N, C = x.shape

        # 2-D GEMM form: on a 3-D operand XLA lowers the projection as a
        # convolution whose preferred operand layout is batch-interleaved
        # ({2,0,1}), inserting a full HBM relayout copy of the activation
        # on each side (~0.6 ms each at 32-frame stage 0, trace 2026-08-17);
        # a (Bn*N, C) GEMM keeps row-major layouts end to end and the
        # reshape back is a free bitcast.
        qkv_flat = dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="qkv")(x.reshape(-1, C)).reshape(Bn, N, 3 * C)

        bias = make_bias()                                # (nH, N, N) fp32

        if self.attention_impl == "pallas_flat" and self.attn_drop == 0.0:
            # fused kernel on the UN-relayouted qkv: head slicing happens in
            # VMEM and the (Bn, nH, N, N) logits never touch HBM; falls back
            # to equivalent XLA math off-TPU / when VMEM-infeasible
            from clover_tpu.ops.window_attention import (
                flat_window_attention, no_max_enabled)

            if attn_mask is not None:
                nW = attn_mask.shape[0]
                flat_mask = attn_mask.astype(jnp.float32)
            else:
                flat_mask = None
            out = flat_window_attention(qkv_flat, bias, flat_mask, scale,
                                        self.num_heads,
                                        no_max_enabled(deterministic))
            out = dense(self.dim, dtype=self.dtype, name="proj")(
                out.reshape(-1, C)).reshape(Bn, N, C)
            return nn.Dropout(self.proj_drop, deterministic=deterministic)(out)

        if self.attention_impl == "xla_headloop" and self.attn_drop == 0.0:
            # per-head lane slices of the flat (Bn, N, 3C) qkv instead of
            # the 5-D head-layout reshape — avoids the qkv relayout copy
            hd = head_dim
            outs = []
            for h in range(self.num_heads):
                q_h = qkv_flat[:, :, h * hd:(h + 1) * hd]
                k_h = qkv_flat[:, :, C + h * hd:C + (h + 1) * hd]
                v_h = qkv_flat[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
                logits = jnp.einsum("bqd,bkd->bqk", q_h * scale, k_h)
                logits = logits + bias[h][None].astype(logits.dtype)
                if attn_mask is not None:
                    nW = attn_mask.shape[0]
                    logits = logits.reshape(Bn // nW, nW, N, N)
                    logits = logits + attn_mask[None].astype(logits.dtype)
                    logits = logits.reshape(Bn, N, N)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                probs = probs.astype(self.dtype)
                outs.append(jnp.einsum("bqk,bkd->bqd", probs, v_h))
            out = jnp.concatenate(outs, axis=-1)
            out = dense(self.dim, dtype=self.dtype, name="proj")(out)
            return nn.Dropout(self.proj_drop, deterministic=deterministic)(out)

        qkv = qkv_flat.reshape(Bn, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (Bn, N, nH, hd)

        if self.attention_impl == "pallas" and self.attn_drop == 0.0:
            from clover_tpu.ops.window_attention import fused_window_attention

            out = fused_window_attention(
                q.transpose(0, 2, 1, 3),                  # (Bn, nH, N, hd)
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                bias,
                None if attn_mask is None else attn_mask.astype(jnp.float32),
                scale)
            out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
        else:
            # NOTE: logits stay in compute dtype (bf16); producing fp32
            # logits off the MXU was measured SLOWER (176 vs 291 clips/s) —
            # the doubled HBM traffic of the (Bn,nH,N,N) tensor outweighs
            # the convert-to-fp32 pass before softmax.
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
            logits = logits + bias[None].astype(logits.dtype)
            if attn_mask is not None:
                nW = attn_mask.shape[0]
                logits = logits.reshape(Bn // nW, nW, self.num_heads, N, N)
                logits = logits + attn_mask[None, :, None].astype(logits.dtype)
                logits = logits.reshape(Bn, self.num_heads, N, N)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            probs = probs.astype(self.dtype)
            probs = nn.Dropout(self.attn_drop, deterministic=deterministic)(probs)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(Bn, N, C)

        out = dense(self.dim, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=deterministic)(out)


class _WindowAttentionParams(nn.Module):
    """Declares WindowAttention3D's params (qkv/proj/bias table) at the
    canonical child paths without running the module — the fused-block
    path consumes raw values (see layers.DenseParams)."""

    dim: int
    num_heads: int
    full_window: Tuple3
    qkv_bias: bool

    @nn.compact
    def __call__(self):
        from clover_tpu.models.layers import DenseParams

        k_qkv, b_qkv = DenseParams(self.dim, 3 * self.dim,
                                   use_bias=self.qkv_bias, name="qkv")()
        k_proj, b_proj = DenseParams(self.dim, self.dim, name="proj")()
        table_len = int(np.prod([2 * w - 1 for w in self.full_window]))
        table = self.param("relative_position_bias_table", trunc_normal_init,
                           (table_len, self.num_heads), jnp.float32)
        return k_qkv, b_qkv, k_proj, b_proj, table


class SwinBlock3D(nn.Module):
    """One Swin block: LN -> (shift, window, attn, unshift) -> LN -> MLP,
    both with residual + stochastic depth (reference :403-505)."""

    dim: int
    num_heads: int
    window_size: Tuple3
    shift_size: Tuple3
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    attention_impl: str = "xla"
    act_sharding: Optional[Tuple[Optional[str], ...]] = None
    fused_mlp: bool = False
    gelu: str = "erf"            # 'erf' | 'tanh' (see SwinConfig.gelu)
    # window-resident mode: set to the stage's (D, H, W) to have __call__
    # take/return (B, nW*N, C) tokens already partitioned into unshifted
    # windows. Unshifted blocks then run with ZERO layout ops (the r1
    # train-step trace showed ~10 ms/step of partition/reverse transposes);
    # shifted blocks pay one permutation in and one out. The stage loop
    # partitions once at entry and reverses once at exit.
    resident_dims: Optional[Tuple3] = None
    dtype: Dtype = jnp.float32

    def _resolve_impl(self, deterministic: bool) -> str:
        if self.attention_impl != "auto":
            return self.attention_impl
        if jax.default_backend() != "tpu":
            # off-TPU the kernels would only run in (slow) interpret mode;
            # the head-loop XLA math is numerically equivalent. Explicit
            # attention_impl='pallas_flat' still forces interpret kernels
            # (that is what the parity tests use).
            return "xla_headloop"
        from clover_tpu.ops.window_attention import _BWD_KERNEL

        # with the fused bwd kernel the flat kernel wins both ways (train
        # 40.4 vs 31.8 clips/s, eval +15%); without it (CLOVER_WA_BWD=0)
        # training falls back to the head-loop XLA math whose autodiff
        # avoids the custom-vjp recompute
        if deterministic or _BWD_KERNEL:
            return "pallas_flat"
        return "xla_headloop"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 bias_cache: Optional[jax.Array] = None) -> jax.Array:
        if self.resident_dims is not None:
            return self._window_resident_call(x, deterministic, bias_cache)
        impl = self._resolve_impl(deterministic)
        x = constrain_activation(x, self.act_sharding)
        B, D, H, W, C = x.shape
        window, shift = effective_window((D, H, W), self.window_size, self.shift_size)

        pad_d = (-D) % window[0]
        pad_h = (-H) % window[1]
        pad_w = (-W) % window[2]
        drops_now_off = deterministic or (
            self.drop == 0.0 and self.drop_path == 0.0)
        if (impl == "fused_block" and self.attn_drop == 0.0
                and drops_now_off and not (pad_d or pad_h or pad_w)):
            x = self._fused_attn_half(x, window, shift, deterministic)
            return self._mlp_half(x, deterministic)

        shortcut = x
        x = layer_norm(dtype=self.dtype, name="norm1")(x, deterministic)
        if pad_d or pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
        Dp, Hp, Wp = D + pad_d, H + pad_h, W + pad_w

        do_shift = any(s > 0 for s in shift)
        if do_shift:
            x = jnp.roll(x, shift=(-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
            make_mask = (shift_region_lanes
                         if self.attn_drop == 0.0 and _use_mask_lanes(impl)
                         else shift_attn_mask)
            mask_np = make_mask((Dp, Hp, Wp), window, shift)
            attn_mask = jnp.asarray(mask_np) if mask_np is not None else None
        else:
            attn_mask = None

        attn_module = WindowAttention3D(
            self.dim, self.window_size, self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, attn_drop=self.attn_drop, proj_drop=self.drop,
            attention_impl=impl, dtype=self.dtype, name="attn",
        )
        if impl == "pallas_fused" and self.attn_drop == 0.0:
            N = window[0] * window[1] * window[2]
            mask_grid = None
            if attn_mask is not None:
                mask_grid = attn_mask.reshape(
                    Dp // window[0], Hp // window[1], Wp // window[2], N, N)
            x = attn_module(x, window, mask_grid, deterministic=deterministic,
                            bias_override=bias_cache)
        else:
            x_windows = window_partition(x, window)
            attn_out = attn_module(
                x_windows, window, attn_mask, deterministic=deterministic,
                bias_override=bias_cache)
            x = window_reverse(attn_out, window, B, Dp, Hp, Wp)

        if do_shift:
            x = jnp.roll(x, shift=shift, axis=(1, 2, 3))
        if pad_d or pad_h or pad_w:
            x = x[:, :D, :H, :W, :]

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            x, deterministic=deterministic)
        return self._mlp_half(x, deterministic)

    def _window_resident_call(self, x: jax.Array, deterministic: bool,
                              bias_cache: Optional[jax.Array] = None
                              ) -> jax.Array:
        """x: (B, nW*N, C) tokens in unshifted window-major order.

        Same parameter structure as the spatial path (norm1/attn/
        drop_path1/norm2/mlp) — checkpoints are layout-independent.
        The caller (stage loop) guarantees dims divide the window, so no
        padding branch exists here.
        """
        dims = tuple(self.resident_dims)
        window, shift = effective_window(dims, self.window_size,
                                         self.shift_size)
        impl = self._resolve_impl(deterministic)
        B, L, C = x.shape
        N = window[0] * window[1] * window[2]
        do_shift = any(s > 0 for s in shift)
        # fully-fused half-block: LN1 + qkv + attention + proj + residual in
        # one kernel — no XLA GEMMs (and none of their layout copies) and no
        # HBM round-trip of the 3C qkv tensor. DropPath rides as a
        # per-window row scale; only in-proj dropout (drop>0, zero in every
        # live config) forces the unfused path.
        use_fused = (_fused_attn_enabled(N) and self.attn_drop == 0.0
                     and (deterministic or self.drop == 0.0)
                     and impl.startswith("pallas"))
        attn_mask = None
        if do_shift:
            x = _apply_window_perm(x, dims, window, shift, inverse=False)
            make_mask = (shift_region_lanes
                         if self.attn_drop == 0.0
                         and _use_mask_lanes(impl, fused=use_fused)
                         else shift_attn_mask)
            mask_np = make_mask(dims, window, shift)
            attn_mask = jnp.asarray(mask_np) if mask_np is not None else None

        if use_fused:
            row_scale = None
            if not deterministic and self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                rng = self.make_rng("dropout")
                mask_b = jax.random.bernoulli(rng, p=keep, shape=(B,))
                per_sample = mask_b.astype(jnp.float32) / keep
                row_scale = jnp.repeat(per_sample, L // N)  # (Bn,)
            x = self._fused_resident_half(x, window, attn_mask, N, row_scale,
                                          bias_cache, deterministic)
            x = self._mlp_half(x, deterministic)
            if do_shift:
                x = _apply_window_perm(x, dims, window, shift, inverse=True)
            return x

        shortcut = x
        xn = layer_norm(dtype=self.dtype, name="norm1")(x, deterministic)
        attn_module = WindowAttention3D(
            self.dim, self.window_size, self.num_heads,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            attention_impl=impl, dtype=self.dtype, name="attn",
        )
        use_flat2 = (impl == "pallas_flat" and self.attn_drop == 0.0
                     and N % 8)
        if use_flat2 and not deterministic:
            # training takes flat2 only when OPTED IN (CLOVER_WA_FLAT2_TRAIN
            # — measured 51.8 vs 54.5 clips/s, see window_attention's
            # _FLAT2_TRAIN note) AND the NATIVE 2-D backward is
            # shape-feasible: the reshape-pair bwd fallback relayouts
            # g/dqkv and loses even more (50.3 vs 52.8 at B=8)
            from clover_tpu.ops.window_attention import (
                flat2_bwd_available, flat2_train_enabled)

            nr_or_none = (attn_mask.shape[-1]
                          if attn_mask is not None
                          and attn_mask.shape[-1] != attn_mask.shape[-2]
                          else None)
            use_flat2 = flat2_train_enabled() and flat2_bwd_available(
                B * (L // N), N, self.num_heads, C,
                jnp.dtype(self.dtype).itemsize,
                None if attn_mask is None else attn_mask.shape[0],
                nr_or_none)
        if use_flat2:
            # flat2: (B*L, C) in / (B*L, C) out — both reshapes here are
            # free bitcasts (L = nW*N is sublane-aligned), unlike the
            # (Bn, N, C) re-tiling below
            attn_out = attn_module(xn.reshape(-1, C), window, attn_mask,
                                   deterministic=deterministic,
                                   bias_override=bias_cache)
        else:
            attn_out = attn_module(xn.reshape(-1, N, C), window, attn_mask,
                                   deterministic=deterministic,
                                   bias_override=bias_cache)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            attn_out.reshape(B, L, C), deterministic=deterministic)
        x = self._mlp_half(x, deterministic)
        if do_shift:
            x = _apply_window_perm(x, dims, window, shift, inverse=True)
        return x

    def _mlp_half(self, x: jax.Array, deterministic: bool) -> jax.Array:
        """Rank-agnostic: x may be spatial (B, D, H, W, C) or window-major
        (B, L, C); the MLP is per-token either way."""
        C = x.shape[-1]
        # the kernel covers DropPath via a per-row scale; only in-MLP
        # dropout (drop>0, zero in every live config) forces the XLA path
        fusable = self.fused_mlp and (deterministic or self.drop == 0.0)
        if fusable:
            from clover_tpu.models.layers import LayerNormParams, MlpParams
            from clover_tpu.ops.mlp_block import fused_ln_mlp_residual

            # declare norm2/mlp params at their canonical paths
            # (checkpoint-identical to the module path) without dummy
            # compute or scope internals
            scale, bias = LayerNormParams(C, name="norm2")()
            k1, b1, k2, b2 = MlpParams(
                C, int(self.dim * self.mlp_ratio), self.dim, name="mlp")()
            row_scale = None
            if not deterministic and self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, p=keep, shape=(x.shape[0],))
                per_sample = mask.astype(jnp.float32) / keep
                rows_per_sample = int(np.prod(x.shape[1:-1]))
                row_scale = jnp.repeat(per_sample, rows_per_sample)
            out = fused_ln_mlp_residual(
                x.reshape(-1, C), scale, bias, k1, b1, k2, b2, row_scale,
                1e-5, self.gelu)
            return out.reshape(x.shape)

        norm2 = layer_norm(dtype=self.dtype, name="norm2")
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, drop_rate=self.drop,
                  approx_gelu=(self.gelu == "tanh"),
                  dtype=self.dtype, name="mlp")
        h = norm2(x, deterministic)
        h = mlp(h, deterministic=deterministic)
        return x + DropPath(self.drop_path, name="drop_path2")(
            h, deterministic=deterministic)

    def _fused_resident_half(self, x: jax.Array, window, attn_mask,
                             N: int, row_scale=None,
                             bias_cache=None,
                             deterministic: bool = True) -> jax.Array:
        """Window-resident fused half-block: x (B, L, C) already window-major
        (and already permuted for shifted blocks); runs the whole
        LN1+attn+proj+residual in one Pallas kernel. Params declared at the
        canonical norm1/attn paths — checkpoint-identical to the unfused
        path."""
        from clover_tpu.ops.attn_block import fused_window_attn_block
        from clover_tpu.models.layers import LayerNormParams

        B, L, C = x.shape
        ln_scale, ln_bias = LayerNormParams(C, name="norm1")()
        k_qkv, b_qkv, k_proj, b_proj, bias_table = _WindowAttentionParams(
            self.dim, self.num_heads, tuple(self.window_size), self.qkv_bias,
            name="attn")()
        if bias_cache is not None:
            bias = bias_cache
        else:
            bias = bias_from_table(bias_table, tuple(self.window_size),
                                   tuple(window), self.num_heads)
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5
        qkv_bias_val = (b_qkv if self.qkv_bias
                        else jnp.zeros((3 * C,), jnp.float32))
        from clover_tpu.ops.window_attention import no_max_enabled

        y = fused_window_attn_block(
            x.reshape(-1, N, C), ln_scale, ln_bias, k_qkv, qkv_bias_val,
            bias, attn_mask, k_proj, b_proj, row_scale, scale, 1e-5,
            no_max_enabled(deterministic))
        return y.reshape(B, L, C)

    def _fused_attn_half(self, x: jax.Array, window, shift,
                         deterministic: bool) -> jax.Array:
        """x + proj(window_attn(LN1(x))) via the fused Pallas half-block.

        LN is per-token and roll/partition are permutations, so running
        LN inside the kernel after partitioning is exact; the residual is
        added in partitioned layout and permuted back (caller guarantees
        no spatial padding)."""
        from clover_tpu.ops.attn_block import fused_window_attn_block

        B, D, H, W_, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5
        N = window[0] * window[1] * window[2]

        # declare norm1/attn params at their canonical paths without dummy
        # compute or scope internals (see layers.DenseParams)
        from clover_tpu.models.layers import LayerNormParams

        ln_scale, ln_bias = LayerNormParams(C, name="norm1")()
        k_qkv, b_qkv, k_proj, b_proj, bias_table = _WindowAttentionParams(
            self.dim, self.num_heads, tuple(self.window_size), self.qkv_bias,
            name="attn")()
        p_norm = {"scale": ln_scale, "bias": ln_bias}
        p_attn = {"qkv": {"kernel": k_qkv, "bias": b_qkv},
                  "proj": {"kernel": k_proj, "bias": b_proj},
                  "relative_position_bias_table": bias_table}

        bias = bias_from_table(p_attn["relative_position_bias_table"],
                               tuple(self.window_size), tuple(window),
                               self.num_heads)

        do_shift = any(s > 0 for s in shift)
        if do_shift:
            x = jnp.roll(x, shift=(-shift[0], -shift[1], -shift[2]),
                         axis=(1, 2, 3))
            # fused_block routes to the lanes-aware attn_block kernel
            make_mask = (shift_region_lanes
                         if _use_mask_lanes("fused_block", fused=True)
                         else shift_attn_mask)
            mask_np = make_mask((D, H, W_), window, shift)
            mask = jnp.asarray(mask_np) if mask_np is not None else None
        else:
            mask = None

        x_windows = window_partition(x, window)            # pre-LN, (Bn, N, C)
        qkv_bias_val = (p_attn["qkv"]["bias"] if self.qkv_bias
                        else jnp.zeros((3 * C,), jnp.float32))
        from clover_tpu.ops.window_attention import no_max_enabled

        y = fused_window_attn_block(
            x_windows, p_norm["scale"], p_norm["bias"],
            p_attn["qkv"]["kernel"], qkv_bias_val, bias, mask,
            p_attn["proj"]["kernel"], p_attn["proj"]["bias"], None, scale,
            1e-5, no_max_enabled(deterministic))
        x = window_reverse(y, window, B, D, H, W_)
        if do_shift:
            x = jnp.roll(x, shift=shift, axis=(1, 2, 3))
        return x


class PatchMerging(nn.Module):
    """2x2 spatial space-to-depth + LN + linear 4C->2C (reference :508-544)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, fwd_only: bool = False) -> jax.Array:
        B, D, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2, :]
        x1 = x[:, :, 1::2, 0::2, :]
        x2 = x[:, :, 0::2, 1::2, :]
        x3 = x[:, :, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = layer_norm(dtype=self.dtype, name="norm")(x, fwd_only)
        return dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                     name="reduction")(x)


class PatchEmbed3D(nn.Module):
    """Video -> patch tokens.

    When kernel == stride (every live config) the Conv3d of the reference
    (:665) is computed as space-to-depth + one Dense: a single large matmul
    that maps straight onto the MXU. The parameter keeps Dense layout
    (pd*ph*pw*C_in, C_out); the converter reshapes torch's conv weight.
    """

    config: SwinConfig
    dtype: Dtype = jnp.float32

    def _fold_norm(self, kern_flat: jax.Array, bias: jax.Array, c_in: int):
        """Fold the per-channel (x - mean)/std input normalization into the
        projection (cfg.fold_normalize): the projection is linear in the
        input, so W' = W / std_c and b' = b - sum(W * mean_c / std_c) make
        proj(pixels) == proj_orig(normalized) exactly. Runs on the fp32
        params (a (96, E)-sized transform — negligible under jit)."""
        from clover_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        k = kern_flat.reshape(-1, c_in, kern_flat.shape[-1])
        k = k / std[None, :, None]
        b = bias - (k * mean[None, :, None]).sum(axis=(0, 1))
        return k.reshape(kern_flat.shape), b

    @nn.compact
    def __call__(self, x: jax.Array, fwd_only: bool = False) -> jax.Array:
        cfg = self.config
        pd, ph, pw = cfg.patch_size
        if cfg.fold_normalize and cfg.patch_size != cfg.stride:
            raise ValueError("fold_normalize requires kernel == stride")
        if cfg.embed_impl != "host_s2d":
            B, D, H, W, C = x.shape
            pad = ((-D) % pd, (-H) % ph, (-W) % pw)
            if any(pad):
                x = jnp.pad(x, ((0, 0), (0, pad[0]), (0, pad[1]),
                                (0, pad[2]), (0, 0)))
                D, H, W = D + pad[0], H + pad[1], W + pad[2]

        if cfg.embed_impl == "host_s2d":
            # input arrives ALREADY space-to-depth'd from the host loader
            # (data.loader host_s2d / preprocess.space_to_depth_host):
            # (B, D', H', W', pd*ph*pw*C). The embed is then one row-major
            # GEMM — no u8 relayout copy, no conv lowering, no device
            # transpose (the 32-frame profile showed ~8 ms/iter in that
            # chain). Input must be pixel-scale with fold_normalize, or
            # pre-normalized floats.
            from clover_tpu.models.layers import DenseParams

            K = pd * ph * pw * cfg.in_chans
            if x.shape[-1] != K:
                raise ValueError(
                    f"host_s2d expects s2d input with {K} features, got "
                    f"{x.shape[-1]} — use space_to_depth_host on the loader")
            kern_flat, bias = DenseParams(K, cfg.embed_dim, name="proj")()
            if cfg.fold_normalize:
                kern_flat, bias = self._fold_norm(kern_flat, bias, cfg.in_chans)
            x = (jnp.dot(x.astype(self.dtype), kern_flat.astype(self.dtype))
                 + bias.astype(self.dtype))
        elif cfg.patch_size == cfg.stride and cfg.embed_impl == "s2d":
            from clover_tpu.models.layers import DenseParams

            kern_flat, bias = DenseParams(
                pd * ph * pw * C, cfg.embed_dim, name="proj")()
            if cfg.fold_normalize:
                kern_flat, bias = self._fold_norm(kern_flat, bias, C)
            x = x.reshape(B, D // pd, pd, H // ph, ph, W // pw, pw, C)
            x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
            x = x.reshape(B, D // pd, H // ph, W // pw, pd * ph * pw * C)
            x = (jnp.dot(x.astype(self.dtype), kern_flat.astype(self.dtype))
                 + bias.astype(self.dtype))
        elif cfg.patch_size == cfg.stride:
            # conv lowering of the same projection (embed_impl='conv'):
            # identical Dense param layout — the (pd*ph*pw*C, E) kernel is
            # viewed as a DHWIO conv kernel, so checkpoints interchange
            from clover_tpu.models.layers import DenseParams

            kern_flat, bias = DenseParams(
                pd * ph * pw * C, cfg.embed_dim, name="proj")()
            if cfg.fold_normalize:
                kern_flat, bias = self._fold_norm(kern_flat, bias, C)
            kern = kern_flat.reshape(pd, ph, pw, C, cfg.embed_dim)
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kern.astype(self.dtype),
                window_strides=cfg.stride, padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            ) + bias.astype(self.dtype)
        else:
            x = nn.Conv(
                cfg.embed_dim, kernel_size=cfg.patch_size, strides=cfg.stride,
                padding="VALID", dtype=self.dtype, param_dtype=jnp.float32,
                name="proj",
            )(x)
        if cfg.patch_norm:
            x = layer_norm(dtype=self.dtype, name="norm")(x, fwd_only)
        return x


class SwinTransformer3D(nn.Module):
    """Full backbone: patch embed -> 4 stages -> final LN.

    __call__(video, token_mask=None):
      video:       (B, T, H, W, 3) channels-last
      token_mask:  (B, mh, mw) 0/1 blockwise mask for the masked-video branch
                   (reference mask-token mixing, :222-230) or None
    Returns (B, T', H', W', num_features) features, plus the broadcast mask
    weights when token_mask is given.

    ``mode`` splits the graph at the patch embedding so callers that run the
    same pixels through the backbone twice (the pretrain clean+masked video
    passes, reference multimodal_transformer_pretrain.py:91,114) can embed
    once and encode a 2B token batch:
      'full'   — embed + encode (default; the only mode other callers use)
      'embed'  — patch embed only, returns (B, T', H', W', embed_dim) tokens
      'encode' — input is already-embedded tokens; mask mixing onward
    """

    config: SwinConfig = SwinConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        token_mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        mode: str = "full",
        bias_cache=None,
    ):
        cfg = self.config
        if mode in ("full", "embed"):
            x = PatchEmbed3D(cfg, dtype=self.dtype, name="patch_embed")(
                x, deterministic)
            x = constrain_activation(x, cfg.act_sharding)
            if mode == "embed":
                return x
        else:
            x = constrain_activation(x, cfg.act_sharding)

        if cfg.mask_token:
            # created unconditionally so init without a mask still owns it
            mask_token = self.param(
                "mask_token", trunc_normal_init, (1, 1, 1, 1, cfg.embed_dim),
                jnp.float32)
        w = None
        if token_mask is not None:
            if not cfg.mask_token:
                raise ValueError("token_mask given but config.mask_token=False")
            B, D, H, W_, C = x.shape
            mh, mw = token_mask.shape[-2:]
            # broadcast (B, mh, mw) over time and over H//mh x W//mw blocks
            w = jnp.repeat(jnp.repeat(token_mask, H // mh, axis=-2), W_ // mw, axis=-1)
            w = jnp.broadcast_to(w[:, None, :, :, None], (B, D, H, W_, 1))
            w = w.astype(x.dtype)
            x = x * (1.0 - w) + mask_token.astype(x.dtype) * w

        x = nn.Dropout(cfg.drop_rate, deterministic=deterministic)(x)

        dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths)).tolist()
        block_idx = 0
        num_stages = len(cfg.depths)
        for i_stage in range(num_stages):
            dim = int(cfg.embed_dim * 2 ** i_stage)
            shift = tuple(s // 2 for s in cfg.window_size)
            # static_argnums=(2,): `deterministic` is a python bool, not a tracer
            remat_stage = (i_stage in cfg.use_checkpoint
                           if isinstance(cfg.use_checkpoint, (tuple, list))
                           else bool(cfg.use_checkpoint))
            block_cls = (nn.remat(SwinBlock3D, static_argnums=(2,))
                         if remat_stage else SwinBlock3D)
            # window-resident stage: partition once, run every block on
            # (B, nW*N, C) window-major tokens, reverse once at stage end
            dims = tuple(x.shape[1:4])
            stage_window, _ = effective_window(dims, cfg.window_size,
                                               (0, 0, 0))
            resident = (cfg.window_resident and cfg.act_sharding is None
                        and cfg.attention_impl not in ("fused_block",
                                                       "pallas_fused")
                        and all(d % w == 0
                                for d, w in zip(dims, stage_window)))
            if resident:
                B_ = x.shape[0]
                N_ = int(np.prod(stage_window))
                x = window_partition(x, stage_window).reshape(B_, -1, x.shape[-1])
            for i_blk in range(cfg.depths[i_stage]):
                blk_bias = (bias_cache.get(f"stage_{i_stage}_block_{i_blk}")
                            if bias_cache is not None else None)
                x = block_cls(
                    dim=dim,
                    num_heads=cfg.num_heads[i_stage],
                    window_size=cfg.window_size,
                    shift_size=(0, 0, 0) if i_blk % 2 == 0 else shift,
                    mlp_ratio=cfg.mlp_ratio,
                    qkv_bias=cfg.qkv_bias,
                    qk_scale=cfg.qk_scale,
                    drop=cfg.drop_rate,
                    attn_drop=cfg.attn_drop_rate,
                    drop_path=dpr[block_idx],
                    attention_impl=cfg.attention_impl,
                    act_sharding=cfg.act_sharding,
                    fused_mlp=cfg.fused_mlp,
                    gelu=cfg.gelu,
                    resident_dims=dims if resident else None,
                    dtype=self.dtype,
                    name=f"stage_{i_stage}_block_{i_blk}",
                )(x, deterministic, blk_bias)
                block_idx += 1
            if resident:
                x = window_reverse(x.reshape(-1, N_, x.shape[-1]),
                                   stage_window, B_, *dims)
            if i_stage < num_stages - 1:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"stage_{i_stage}_downsample")(
                                     x, deterministic)

        x = layer_norm(dtype=self.dtype, name="norm")(x, deterministic)
        if token_mask is not None:
            return x, w
        return x
