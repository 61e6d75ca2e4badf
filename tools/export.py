#!/usr/bin/env python
"""Export a retrieval checkpoint as an AOT-compiled serving bundle.

Produces weight-baked StableHLO artifacts (clover_tpu/serving.py) that a
lean runtime loads WITHOUT the framework, the config stack, or the
checkpoint — the deployment story the reference never had (its inference
path is tools/test.py inside the full training framework).

  python tools/export.py configs/exp/finetune_msrvtt_retrieval.py \
      --ckpt-dir work/msrvtt/ckpts --out /tmp/bundle \
      --batch-sizes 1,8,32 --platform tpu

Smoke-load:  python -c "from clover_tpu.serving import load_bundle; \
                        fns = load_bundle('/tmp/bundle'); print(fns)"
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--out", required=True, help="bundle output directory")
    ap.add_argument("--ckpt-dir", default=None,
                    help="orbax checkpoint dir (omit: random init, smoke only)")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--batch-sizes", default="1,8",
                    help="comma list; one artifact per batch size")
    ap.add_argument("--frames", type=int, default=None,
                    help="clip length (default: the config's test split "
                         "test_num_frames/num_frames, else 8)")
    ap.add_argument("--text-len", type=int, default=30)
    ap.add_argument("--sim-candidates", type=int, default=1000)
    ap.add_argument("--platform", default=None,
                    help="comma list, e.g. 'tpu' or 'tpu,cpu' "
                         "(default: current backend)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend for tracing/lowering")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    return ap.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from clover_tpu.builder import build_model
    from clover_tpu.config import load_config, parse_cfg_options
    from clover_tpu.serving import export_retrieval_towers, save_bundle
    from clover_tpu.utils.logging import get_logger

    logger = get_logger()
    cfg = load_config(args.config, overrides=parse_cfg_options(args.cfg_options))
    model, _ = build_model(cfg.model)
    img_size = cfg.get("img_size", 224)
    test_ds_cfg = cfg.data.get("test", cfg.data.get("val", {})) if "data" in cfg else {}
    frames = args.frames or test_ds_cfg.get(
        "test_num_frames", test_ds_cfg.get("num_frames", 8))
    batch_sizes = [int(b) for b in args.batch_sizes.split(",") if b]

    init_imgs = jnp.zeros((1, 1, frames, img_size, img_size, 3), model.dtype)
    init_ids = jnp.zeros((1, args.text_len), jnp.int32)
    init_mask = jnp.ones((1, args.text_len), jnp.int32)
    params = jax.jit(lambda k: model.init(
        k, init_imgs, init_ids, init_mask, method="forward_test"))(
        jax.random.PRNGKey(0))

    if args.ckpt_dir:
        from clover_tpu.engine import CheckpointManager

        mgr = CheckpointManager(args.ckpt_dir)
        restored = mgr.restore_params(params["params"], step=args.step)
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
        params = {"params": restored}
        logger.info("restored params from %s step %s", args.ckpt_dir, args.step)
    else:
        logger.warning("no --ckpt-dir: exporting RANDOM weights (smoke only)")

    platforms = args.platform.split(",") if args.platform else None
    exports = export_retrieval_towers(
        model, params, batch_sizes=batch_sizes, frames=frames,
        image_size=img_size, text_len=args.text_len,
        sim_candidates=args.sim_candidates, platforms=platforms)
    out = save_bundle(exports, args.out)
    total = sum(os.path.getsize(os.path.join(out, f))
                for f in os.listdir(out))
    logger.info("wrote %d artifacts (%.1f MB) to %s",
                len(exports), total / 2 ** 20, out)
    for name, exp in exports.items():
        logger.info("  %s: %s -> %s [%s]", name,
                    ", ".join(str(a) for a in exp.in_avals),
                    ", ".join(str(a) for a in exp.out_avals),
                    ",".join(exp.platforms))


if __name__ == "__main__":
    main()
