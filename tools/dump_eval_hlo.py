#!/usr/bin/env python
"""Dump the compiled eval-step HLO + cost analysis for SOL pricing.

Builds the same retrieval eval step as bench.py (CloverFinetune forward_test,
host_s2d embed, fold_normalize, bias cache as an argument), compiles ONE
batch on the attached device, and writes the optimized HLO text for
tools/sol_train.py:

  python tools/dump_eval_hlo.py --frames 8 --batch 32 --out /tmp/eval8.hlo
  python tools/sol_train.py /tmp/eval8.hlo --streams 1 --fwd-only \
      --attn-batch 32 --attn-t2 4 --mlp-pallas [--attn-block-fused]

(--attn-block-fused only for 32-frame shapes, where the N>=384 auto gate
puts qkv/proj inside the fused half-block kernel.)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from clover_tpu.models import (
        BertConfig,
        CloverFinetune,
        FinetuneConfig,
        FusionConfig,
        SwinConfig,
    )
    from clover_tpu.models.swin3d import swin_bias_cache
    from clover_tpu.ops.preprocess import space_to_depth_host

    B, T, S, L = args.batch, args.frames, 224, 30
    cfg = FinetuneConfig(
        swin=SwinConfig.base(embed_impl="host_s2d", fold_normalize=True),
        text_bert=BertConfig(),
        fusion=FusionConfig(bert=BertConfig(num_hidden_layers=3),
                            img_in_size=1024, num_frames=T // 2,
                            spatial_tokens=49),
        task="retrieval",
    )
    model = CloverFinetune(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    frames = space_to_depth_host(rng.integers(
        0, 256, size=(B, T, S, S, 3), dtype=np.uint8))
    frames = jnp.asarray(frames)
    tokens = jnp.asarray(rng.integers(0, 30522, size=(B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)

    params = jax.jit(
        lambda k, imgs, tok: model.init(k, imgs[:, None], tok, mask,
                                        method="forward_test")
    )(jax.random.PRNGKey(0), frames, tokens)
    jax.block_until_ready(params)
    bias_cache = jax.jit(lambda p: swin_bias_cache(
        p["params"]["backbone"], cfg.swin, (T, S, S)))(params)

    def step(params, imgs, tok, mask, bias_cache):
        v, t = model.apply(params, imgs[:, None], tok, mask, bias_cache,
                           method="forward_test")
        return v, t

    compiled = jax.jit(step).lower(params, frames, tokens, mask,
                                   bias_cache).compile()
    out = args.out or f"/tmp/eval{T}_B{B}.hlo"
    with open(out, "w") as f:
        f.write(compiled.as_text())
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    print(json.dumps({
        "hlo": out,
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
