"""Fused on-device preprocessing (crop + resize + flip + normalize).

The reference runs its frame geometry on host CPU via mmcv/OpenCV
(Resize/RandomResizedCrop/CenterCrop/Flip/Normalize,
mmaction/datasets/pipelines/augmentations.py) per worker. TPU-first split
(SURVEY.md §2.4 "north star"):

- host: decode + one aspect-preserving short-side resize to a fixed
  canonical square (C++ inside cv2) so batch shapes are static;
- device: everything else fused into ONE jitted op — per-sample crop box
  applied with ``jax.image.scale_and_translate`` (dynamic geometry, static
  shapes), horizontal flip, mean/std normalization, dtype cast. uint8
  travels over PCIe; floats never leave the chip.

Normalization matches the reference's ImageNet stats; frames here are RGB
with RGB-ordered stats (the reference keeps BGR frames with BGR stats —
identical math, msrvtt_retrieval.py:12-13).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# RGB order
IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def canonical_host_resize(frames: np.ndarray, canonical: int) -> np.ndarray:
    """Aspect-preserving short-side resize + center crop to (canonical,
    canonical); uint8 in/out. Host-side (cv2), amortized per decode."""
    import cv2

    if frames.shape[-1] != 3:
        raise ValueError(
            f"frames {frames.shape} are already space-to-depth'd (s2d clip "
            "pack) — this path cannot resize them; use a thwc pack or the "
            "dataset's s2d fast path")
    if frames.shape[1] == canonical and frames.shape[2] == canonical:
        return frames  # already canonical (packed clip cache) — no-op
    out = np.empty((frames.shape[0], canonical, canonical, 3), dtype=np.uint8)
    for i, frame in enumerate(frames):
        h, w = frame.shape[:2]
        scale = canonical / min(h, w)
        nh, nw = max(canonical, int(round(h * scale))), max(canonical, int(round(w * scale)))
        resized = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_LINEAR)
        y0 = (nh - canonical) // 2
        x0 = (nw - canonical) // 2
        out[i] = resized[y0:y0 + canonical, x0:x0 + canonical]
    return out


def space_to_depth_host(frames: np.ndarray,
                        patch: Tuple[int, int, int] = (2, 4, 4)) -> np.ndarray:
    """Host-side space-to-depth for the patch embed (numpy, uint8-safe).

    (..., T, H, W, C) -> (..., T/pd, H/ph, W/pw, pd*ph*pw*C), feature order
    (dt, dy, dx, c) — exactly the layout PatchEmbed3D(embed_impl='host_s2d')
    consumes and the same flattening as its Dense kernel, so checkpoints
    are identical across embed_impl choices. Delivering frames in this
    layout moves the (tiny-trailing-dim) transpose off the device: the
    32-frame eval profile showed ~8 ms/iter in the u8 relayout + conv
    lowering chain that this removes.
    """
    pd, ph, pw = patch
    lead = frames.shape[:-4]
    T, H, W, C = frames.shape[-4:]
    x = frames.reshape(lead + (T // pd, pd, H // ph, ph, W // pw, pw, C))
    n = len(lead)
    perm = tuple(range(n)) + tuple(i + n for i in (0, 2, 4, 1, 3, 5, 6))
    x = np.ascontiguousarray(x.transpose(perm))
    return x.reshape(lead + (T // pd, H // ph, W // pw, pd * ph * pw * C))


def random_resized_crop_params(
    rng: np.random.Generator,
    size: int,
    area_range: Tuple[float, float] = (0.08, 1.0),
    aspect_range: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> np.ndarray:
    """Sample an (y0, x0, h, w) crop box in pixels inside a size x size frame
    (mmaction RandomResizedCrop semantics, augmentations.py)."""
    for _ in range(10):
        area = size * size * rng.uniform(*area_range)
        aspect = np.exp(rng.uniform(np.log(aspect_range[0]), np.log(aspect_range[1])))
        w = int(round(np.sqrt(area * aspect)))
        h = int(round(np.sqrt(area / aspect)))
        if 0 < w <= size and 0 < h <= size:
            y0 = rng.integers(0, size - h + 1)
            x0 = rng.integers(0, size - w + 1)
            return np.asarray([y0, x0, h, w], dtype=np.float32)
    # fallback: central max square
    return np.asarray([0, 0, size, size], dtype=np.float32)


def center_crop_params(size: int, crop: int) -> np.ndarray:
    off = (size - crop) / 2.0
    return np.asarray([off, off, crop, crop], dtype=np.float32)


def _process_clip(clip, box, flip, out_size, mean, std, method):
    """clip (T, S, S, 3) float32; box (4,); flip scalar bool."""
    T = clip.shape[0]
    y0, x0, h, w = box[0], box[1], box[2], box[3]
    scale = jnp.stack([out_size / h, out_size / w])
    translation = jnp.stack([-y0 * out_size / h, -x0 * out_size / w])
    resized = jax.image.scale_and_translate(
        clip, (T, out_size, out_size, 3), (1, 2), scale, translation,
        method=method, antialias=False)
    flipped = jnp.where(flip, resized[:, :, ::-1, :], resized)
    if mean is None:
        return flipped
    return (flipped - mean) / std


@functools.partial(jax.jit,
                   static_argnames=("out_size", "method", "dtype", "normalize"))
def preprocess_clips(
    frames_u8: jax.Array,          # (B, T, S, S, 3) uint8
    boxes: jax.Array,              # (B, 4) float32 (y0, x0, h, w) pixels
    flips: jax.Array,              # (B,) bool
    out_size: int = 224,
    method: str = "linear",
    dtype: Any = jnp.bfloat16,
    normalize: bool = True,
) -> jax.Array:
    """One fused device op: crop-resize + flip + normalize + cast.

    ``normalize=False`` emits pixel-scale values for models that fold the
    mean/std affine into the patch-embed projection
    (SwinConfig.fold_normalize) — exact same math, one less full-frame
    HBM pass."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) if normalize else None
    std = jnp.asarray(IMAGENET_STD, jnp.float32) if normalize else None
    clips = frames_u8.astype(jnp.float32)
    out = jax.vmap(
        lambda c, b, f: _process_clip(c, b, f, out_size, mean, std, method)
    )(clips, boxes, flips)
    return out.astype(dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "normalize"))
def _normalize_only(frames_u8: jax.Array, dtype: Any,
                    normalize: bool = True) -> jax.Array:
    if not normalize:
        # uint8 pixel values (0..255) are exactly representable in bf16
        return frames_u8.astype(dtype)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((frames_u8.astype(jnp.float32) - mean) / std).astype(dtype)


def eval_preprocess(frames_u8: jax.Array, out_size: int = 224,
                    dtype: Any = jnp.bfloat16,
                    normalize: bool = True) -> jax.Array:
    """Center-crop eval path: canonical square in, normalized out.

    When the canonical size already equals out_size the crop is the
    identity; skip scale_and_translate entirely (it lowers to a
    convolution — measured ~8% of eval step time)."""
    B = frames_u8.shape[0]
    S = frames_u8.shape[2]
    if S == out_size:
        return _normalize_only(frames_u8, dtype, normalize)
    boxes = jnp.broadcast_to(
        jnp.asarray(center_crop_params(S, min(S, out_size))), (B, 4))
    flips = jnp.zeros((B,), dtype=bool)
    return preprocess_clips(frames_u8, boxes, flips, out_size=out_size,
                            dtype=dtype, normalize=normalize)


def three_crop_preprocess(frames_u8: jax.Array, out_size: int = 224,
                          dtype: Any = jnp.bfloat16) -> jax.Array:
    """ThreeCrop multi-view eval (reference augmentations ThreeCrop :1814):
    left/top, center, right/bottom crops of the canonical square; returns
    (B*3, T, out, out, 3). Scores are clip-mean pooled downstream (the
    model's multi-clip path)."""
    B = frames_u8.shape[0]
    S = frames_u8.shape[2]
    crop = min(S, out_size)
    off = float(S - crop)
    positions = np.asarray(
        [[0.0, 0.0, crop, crop],
         [off / 2.0, off / 2.0, crop, crop],
         [off, off, crop, crop]], np.float32)
    boxes = jnp.asarray(np.tile(positions, (B, 1)))          # (B*3, 4)
    frames3 = jnp.repeat(frames_u8, 3, axis=0)
    flips = jnp.zeros((B * 3,), dtype=bool)
    return preprocess_clips(frames3, boxes, flips, out_size=out_size, dtype=dtype)


def color_jitter_params(rng: np.random.Generator, brightness: float = 0.4,
                        contrast: float = 0.4, saturation: float = 0.4) -> np.ndarray:
    """Per-sample (brightness, contrast, saturation) multipliers."""
    return np.asarray([
        rng.uniform(max(0, 1 - brightness), 1 + brightness),
        rng.uniform(max(0, 1 - contrast), 1 + contrast),
        rng.uniform(max(0, 1 - saturation), 1 + saturation),
    ], np.float32)


@jax.jit
def apply_color_jitter(frames: jax.Array, factors: jax.Array) -> jax.Array:
    """Device-side brightness/contrast/saturation on float RGB frames.

    frames (B, T, H, W, 3) in pixel scale (pre-normalization);
    factors (B, 3). The reference applies ColorJitter on host per frame
    (augmentations.py); here it is one fused VPU op.
    """
    b = factors[:, 0][:, None, None, None, None]
    c = factors[:, 1][:, None, None, None, None]
    s = factors[:, 2][:, None, None, None, None]
    x = frames * b
    mean = jnp.mean(x, axis=(2, 3, 4), keepdims=True)
    x = (x - mean) * c + mean
    gray = jnp.mean(x, axis=-1, keepdims=True)
    x = (x - gray) * s + gray
    return jnp.clip(x, 0.0, 255.0)
