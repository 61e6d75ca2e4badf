#!/usr/bin/env python
"""Evaluation entry point (reference tools/test.py equivalent).

Evaluates one checkpoint (or the latest / best in a directory) on the
config's test split and prints a json metrics line.

Usage:
  python tools/test.py configs/exp/debug_retrieval_synthetic.py \
      --ckpt-dir /tmp/run1/checkpoints [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a clover_tpu model")
    p.add_argument("config")
    p.add_argument("--ckpt-dir", default=None,
                   help="checkpoint directory (omit for random init)")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--load-from", default=None,
                   help="weights-only checkpoint dir (e.g. the output of "
                        "tools/convert_checkpoint.py); tower subtrees that "
                        "match by name are loaded, the rest keep fresh init "
                        "(reference load_from semantics)")
    p.add_argument("--all-steps", action="store_true",
                   help="sweep every checkpoint in --ckpt-dir (reference "
                        "inference_pytorch_multi_checkpoints)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from clover_tpu.builder import (
        build_dataset,
        build_loader,
        build_model,
        build_tokenizer,
    )
    from clover_tpu.config import load_config, parse_cfg_options
    from clover_tpu.engine import (
        CheckpointManager,
        make_embed_eval_step,
        make_qa_eval_step,
        run_qa_eval,
        run_retrieval_eval,
    )
    from clover_tpu.utils.logging import get_logger

    logger = get_logger()
    cfg = load_config(args.config, overrides=parse_cfg_options(args.cfg_options))
    tok_cfg = cfg.get("tokenizer")
    tokenizer = build_tokenizer(tok_cfg) if tok_cfg else None
    test_cfg = cfg.data.get("test", cfg.data.get("val"))
    test_ds = build_dataset(test_cfg, tokenizer)
    if tokenizer is None:
        tokenizer = test_ds.tokenizer
    model, _ = build_model(cfg.model)
    img_size = cfg.get("img_size", 224)

    loader_cfg = dict(cfg.data.get("test_loader",
                                   cfg.data.get("val_loader",
                                                {"batch_size": 8})))
    if model.config.swin.embed_impl == "host_s2d":
        # loader delivers space-to-depth'd frames (make_s2d_collate);
        # requires the dataset's canonical size == img_size (identity crop)
        if not model.config.swin.fold_normalize:
            raise SystemExit(
                "embed_impl='host_s2d' delivers raw pixel frames; set "
                "model.swin.fold_normalize=True so the mean/std affine "
                "folds into the patch embed")
        loader_cfg.setdefault("host_s2d", model.config.swin.patch_size)
    loader = build_loader(test_ds, loader_cfg, test=True)

    sample = test_ds[0]
    import jax.numpy as jnp
    import numpy as np

    from clover_tpu.ops.preprocess import eval_preprocess, space_to_depth_host

    if model.config.swin.embed_impl == "host_s2d":
        imgs = jnp.asarray(space_to_depth_host(
            np.asarray(sample["imgs"]), model.config.swin.patch_size))
    else:
        imgs = eval_preprocess(jnp.asarray(sample["imgs"]), out_size=img_size,
                               dtype=model.dtype)
    init_args = (imgs[None], jnp.asarray(sample["token_ids"])[None],
                 jnp.asarray(sample["input_mask"])[None])
    if cfg.model.get("eval_mode") == "itm_retrieval":
        # touch the fusion/itm params as well as the towers at init
        def _init_all(m, imgs, ids, mask):
            ids2 = ids.reshape((-1,) + ids.shape[-1:])
            mask2 = mask.reshape((-1,) + mask.shape[-1:])
            tokens = m.encode_visual(imgs, ids2.shape[0])
            return m.forward_test(imgs, ids, mask), m.itm_pair_score(
                tokens, ids2, mask2)

        params = model.init(jax.random.PRNGKey(0), *init_args,
                            method=_init_all)["params"]
    else:
        params = model.init(jax.random.PRNGKey(0), *init_args,
                            method="forward_test")["params"]

    is_retrieval = (cfg.model["type"] == "CloverPretrain"
                    or cfg.model.get("task") == "retrieval")

    from clover_tpu.models.swin3d import bias_cache_builder

    swin_cache_fn = bias_cache_builder(model.config.swin)

    def run_eval(params):
        if is_retrieval and cfg.model.get("eval_mode") == "mc_retrieval":
            from clover_tpu.engine.eval_loop import run_mc_retrieval_eval

            eval_step = make_embed_eval_step(model)
            return run_mc_retrieval_eval(eval_step, params, test_ds,
                                         loader.epoch(0), out_size=img_size,
                                         dtype=model.dtype,
                                         bias_cache=swin_cache_fn)
        if is_retrieval and cfg.model.get("eval_mode") == "itm_retrieval":
            # full-fusion itm reranking (reference forward_test non-separate
            # branch + recall_for_itm_t2v_retrieval)
            from clover_tpu.engine.eval_loop import run_itm_retrieval_eval
            from clover_tpu.engine.steps import (
                make_itm_embed_step,
                make_itm_score_step,
            )

            return run_itm_retrieval_eval(
                make_itm_embed_step(model), make_itm_score_step(model),
                params, test_ds, loader.epoch(0), out_size=img_size,
                dtype=model.dtype, top_k=cfg.model.get("itm_top_k"),
                bias_cache=swin_cache_fn)
        if is_retrieval and cfg.model.get("eval_mode") == "zeroshot_action":
            # class-name retrieval (reference UCF101VideoDataset ->
            # recall_for_zeroshot_action_recognition)
            from clover_tpu.engine.eval_loop import run_zeroshot_action_eval

            enc = test_ds.encode_class_names(
                cfg.model.get("class_template", "a video of {}"))
            text_fn = jax.jit(lambda p, ids, m: model.apply(
                {"params": p}, ids, m, method="forward_text"))
            cls_embd = np.asarray(text_fn(
                params, jnp.asarray(enc["token_ids"]),
                jnp.asarray(enc["input_mask"])), np.float32)
            eval_step = make_embed_eval_step(model)
            return run_zeroshot_action_eval(
                eval_step, params, test_ds, loader.epoch(0), cls_embd,
                out_size=img_size, dtype=model.dtype,
                bias_cache=swin_cache_fn)
        if is_retrieval:
            eval_step = make_embed_eval_step(model)
            return run_retrieval_eval(eval_step, params, test_ds,
                                      loader.epoch(0), out_size=img_size,
                                      dtype=model.dtype,
                                      bias_cache=swin_cache_fn)
        eval_step = make_qa_eval_step(model)
        return run_qa_eval(eval_step, params, test_ds, loader.epoch(0),
                           out_size=img_size, dtype=model.dtype,
                           bias_cache=swin_cache_fn)

    if args.load_from:
        # converted / pretrain checkpoint: merge matching tower subtrees
        # (the dress-rehearsal path for real-weight conversion,
        # tools/dress_rehearsal.py)
        from clover_tpu.engine.checkpoint import merge_pretrained_params

        pretrained = CheckpointManager(args.load_from).restore_params(params)
        if pretrained is None:
            raise SystemExit(f"--load-from: no checkpoint in {args.load_from}")
        params, loaded, fresh = merge_pretrained_params(params, pretrained)
        logger.info("load_from %s: loaded %s; fresh %s",
                    args.load_from, loaded, fresh)

    if args.ckpt_dir and args.all_steps:
        # checkpoint-directory sweep (reference tools/test.py:169-224)
        mgr = CheckpointManager(args.ckpt_dir)
        steps = mgr.all_steps()
        if not steps:
            raise SystemExit(f"no checkpoints found in {args.ckpt_dir}")
        for step in steps:
            metrics = run_eval(mgr.restore_params(params, step=step))
            print(json.dumps({"step": step, **metrics}))
        return

    if args.ckpt_dir:
        mgr = CheckpointManager(args.ckpt_dir)
        restored = mgr.restore_params(params, step=args.step)
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
        params = restored
        logger.info("restored params from %s step %s", args.ckpt_dir,
                    args.step or mgr.latest_step())
    print(json.dumps(run_eval(params)))


if __name__ == "__main__":
    main()
