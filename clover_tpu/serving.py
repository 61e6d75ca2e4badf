"""Production serving: AOT-exported retrieval towers as StableHLO artifacts.

The reference has no deployment story — inference means loading the torch
checkpoint into the full training framework (tools/test.py, config stack,
registries). TPU-native serving wants ahead-of-time compiled, weight-baked
artifacts that a lean runtime executes without the model code or the
Python framework; ``jax.export`` (StableHLO serialization) is the
XLA-ecosystem interchange for exactly that. Three artifacts per bundle:

  video_tower_b{B}  (B, T, S, S, 3) uint8 frames -> (B, D) f32 embedding
                    (on-device center-crop/normalize preprocessing included,
                    so the serving edge ships raw pixels)
  text_tower_b{B}   (B, L) int32 ids + (B, L) int32 mask -> (B, D) f32
  similarity        (Nt, D) x (Nv, D) -> (Nt, Nv) t2v scores — L2-normalize
                    both towers then text @ video.T, the exact retrieval
                    eval protocol (evaluation/metrics.py:44)

Design points:
- Static batch size per artifact (standard TPU serving practice — the
  Pallas kernels and XLA want static shapes; export one artifact per
  served batch size and pad at the edge). ``batch_sizes`` controls the set.
- Params and the precomputed relative-position bias cache are baked in as
  constants (a frozen graph). Tracing only captures arrays the tower
  actually uses, so the text artifact does not carry the Swin weights.
- ``embed_impl='host_s2d'`` (a loader-side layout optimization) is swapped
  for the on-device ``'s2d'`` equivalent at export: identical GEMM params
  and numerics, no host dependency inside the artifact.
- Artifacts are portable bytes: save/load round-trips through plain files
  plus a manifest.json describing shapes and target platforms.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.export as jex
import jax.numpy as jnp

_MANIFEST = "manifest.json"
_SUFFIX = ".stablehlo"


def _spec(shape: Tuple[int, ...], dtype) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(shape, dtype)


def similarity_fn(text_emb: jax.Array, video_emb: jax.Array) -> jax.Array:
    """t2v score matrix: L2-normalize both sides, text @ video.T
    (evaluation/metrics.py:36-44 — the protocol the R@K metrics rank)."""
    t = text_emb.astype(jnp.float32)
    v = video_emb.astype(jnp.float32)
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True).clip(1e-12)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-12)
    return t @ v.T


def export_retrieval_towers(
    model,
    params,
    *,
    batch_sizes: Sequence[int] = (1,),
    frames: int = 8,
    image_size: int = 224,
    text_len: int = 30,
    sim_candidates: int = 1000,
    platforms: Optional[Sequence[str]] = None,
    bake_params: bool = True,
) -> Dict[str, jex.Exported]:
    """Export a CloverFinetune retrieval model's serving surface.

    ``model`` must have task='retrieval'. Returns {name: Exported}; pass
    the result to :func:`save_bundle`. ``platforms=None`` exports for the
    current default backend; pass e.g. ``('tpu',)`` or ``('tpu', 'cpu')``
    to pin (cross-platform lowering is supported by jax.export).

    ``bake_params=False`` exports WEIGHTS-SEPARATE artifacts: the tower
    functions take (params, inputs) and the runtime supplies the weight
    pytree at call time (the standard split for large models — one
    artifact, hot-swappable checkpoints, and no weight bytes inside the
    compile payload; on this repo's relay-attached TPU the weight-baked
    module exceeds the remote-compile request limit, so the bench uses
    this mode — bench.py BENCH_MODE=serving). The similarity artifact is
    weight-free either way.
    """
    from clover_tpu.models.swin3d import swin_bias_cache
    from clover_tpu.ops.preprocess import eval_preprocess

    cfg = model.config
    if cfg.task != "retrieval":
        raise ValueError("export_retrieval_towers requires task='retrieval' "
                         f"(got {cfg.task!r})")
    swin_cfg = cfg.swin
    if swin_cfg.embed_impl == "host_s2d":
        # same GEMM parameters; the space-to-depth layout moves on device
        swin_cfg = dataclasses.replace(swin_cfg, embed_impl="s2d")
        model = type(model)(dataclasses.replace(cfg, swin=swin_cfg),
                            dtype=model.dtype)
    if "params" not in params:
        params = {"params": params}  # accept bare param trees
    # jitted: the cache build is ~24 per-block gathers that would each be
    # a separate dispatch otherwise (see swin3d.bias_cache_builder)
    bias_cache = jax.jit(lambda p: swin_bias_cache(
        p, swin_cfg, (frames, image_size, image_size)))(
        params["params"]["backbone"])

    def video_fn(p, bc, frames_u8):
        imgs = eval_preprocess(frames_u8, out_size=image_size,
                               dtype=model.dtype,
                               normalize=not swin_cfg.fold_normalize)
        return model.apply(p, imgs[:, None], bc,
                           method="forward_video").astype(jnp.float32)

    def text_fn(p, token_ids, input_mask):
        return model.apply(p, token_ids, input_mask,
                           method="forward_text").astype(jnp.float32)

    kw = {"platforms": tuple(platforms)} if platforms else {}
    exports: Dict[str, jex.Exported] = {}
    S = image_size
    spec_of = lambda tree: jax.tree_util.tree_map(
        lambda x: _spec(jnp.shape(x), jnp.asarray(x).dtype), tree)
    for B in batch_sizes:
        if bake_params:
            vfn = functools.partial(video_fn, params, bias_cache)
            tfn = functools.partial(text_fn, params)
            vargs = (_spec((B, frames, S, S, 3), jnp.uint8),)
            targs = (_spec((B, text_len), jnp.int32),
                     _spec((B, text_len), jnp.int32))
        else:
            vfn, tfn = video_fn, text_fn
            vargs = (spec_of(params), spec_of(bias_cache),
                     _spec((B, frames, S, S, 3), jnp.uint8))
            targs = (spec_of(params),
                     _spec((B, text_len), jnp.int32),
                     _spec((B, text_len), jnp.int32))
        exports[f"video_tower_b{B}"] = jex.export(jax.jit(vfn), **kw)(*vargs)
        exports[f"text_tower_b{B}"] = jex.export(jax.jit(tfn), **kw)(*targs)
    D = cfg.vts_embed_dim
    exports["similarity"] = jex.export(jax.jit(similarity_fn), **kw)(
        _spec((sim_candidates, D), jnp.float32),
        _spec((sim_candidates, D), jnp.float32))
    return exports


def save_bundle(exports: Dict[str, jex.Exported], out_dir: str) -> str:
    """Serialize each Exported to ``<out_dir>/<name>.stablehlo`` plus a
    manifest.json (shapes, dtypes, platforms, sizes). Returns out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = {}
    for name, exp in exports.items():
        data = exp.serialize()
        with open(os.path.join(out_dir, name + _SUFFIX), "wb") as f:
            f.write(data)
        manifest[name] = {
            "in_avals": [str(a) for a in exp.in_avals],
            "out_avals": [str(a) for a in exp.out_avals],
            "platforms": list(exp.platforms),
            "nbytes": len(data),
        }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


def load_bundle(bundle_dir: str) -> Dict[str, Any]:
    """Load every artifact in a bundle directory; returns {name: callable}.

    Each callable executes the deserialized StableHLO under jit — no model
    code, config, or checkpoint needed (weights are baked in)."""
    fns: Dict[str, Any] = {}
    for fname in sorted(os.listdir(bundle_dir)):
        if not fname.endswith(_SUFFIX):
            continue
        with open(os.path.join(bundle_dir, fname), "rb") as f:
            exp = jex.deserialize(f.read())
        fns[fname[: -len(_SUFFIX)]] = exp.call
    return fns
