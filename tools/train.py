#!/usr/bin/env python
"""Training entry point.

TPU-native counterpart of the reference tools/train.py +
tools/train_multiloader.py (both covered: ``data.train`` may be a single
dataset config or a list, which trains with interleaved per-loader steps
like MyEpochBasedMultiDatasetRunner).

Usage:
  python tools/train.py configs/exp/debug_retrieval_synthetic.py \
      --work-dir /tmp/run1 [--resume] [--cfg-options key=val ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train a clover_tpu model")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force CPU backend (debug/CI)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host/multi-slice: call jax.distributed."
                        "initialize() before device init (coordinator "
                        "auto-detected on TPU pods, or set JAX_COORDINATOR_"
                        "ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of training into DIR")
    p.add_argument("--tb", action="store_true",
                   help="write TensorBoard event files to work_dir/tb "
                        "(also enabled by cfg log_tensorboard=True)")
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.distributed:
        # one process per host; TPU pods/SLURM/MPI auto-detect coordinator
        # and topology. Other launchers (incl. plain shell, like the
        # reference's ddist_train.sh MASTER_ADDR convention) pass the JAX_*
        # env vars, which jax's auto-detect does NOT read — forward them
        # explicitly (see docs/SCALING.md).
        import jax

        def _env(name, cast=str):
            v = os.environ.get(name)
            return cast(v) if v is not None else None

        jax.distributed.initialize(
            coordinator_address=_env("JAX_COORDINATOR_ADDRESS"),
            num_processes=_env("JAX_NUM_PROCESSES", int),
            process_id=_env("JAX_PROCESS_ID", int))
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clover_tpu.builder import (
        build_dataset,
        build_loader,
        build_model,
        build_pretrain_loss_config,
        build_tokenizer,
    )
    from clover_tpu.config import load_config, parse_cfg_options
    from clover_tpu.engine import (
        CheckpointManager,
        TrainState,
        Trainer,
        make_embed_eval_step,
        make_optimizer,
        make_pretrain_train_step,
        make_qa_eval_step,
        make_qa_train_step,
        make_retrieval_train_step,
        run_qa_eval,
        run_retrieval_eval,
    )
    from clover_tpu.ops.preprocess import preprocess_clips
    from clover_tpu.parallel import make_mesh, shard_batch_pytree
    from clover_tpu.utils.logging import get_logger, param_table

    logger = get_logger()
    cfg = load_config(args.config, overrides=parse_cfg_options(args.cfg_options))
    work_dir = args.work_dir or cfg.get("work_dir") or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    if jax.process_index() == 0:
        cfg.dump(os.path.join(work_dir, "config.json"))

    # mesh axes from the config's parallel section (fsdp / tensor-parallel
    # are capabilities beyond the DP-only reference, SURVEY.md §2.5);
    # the data axis gets the remaining devices and must divide the batch
    par_cfg = cfg.get("parallel", {})
    fsdp_size = int(par_cfg.get("fsdp", 1))
    model_size = int(par_cfg.get("model", 1))
    seq_size = int(par_cfg.get("sequence", 1))
    batch_size = cfg.data.get("train_loader", {}).get("batch_size", 8)
    n_dev = len(jax.devices())
    nondata = fsdp_size * model_size * seq_size
    if n_dev % nondata:
        raise SystemExit(
            f"parallel fsdp*model*sequence={nondata} must divide the "
            f"device count {n_dev}")
    data_axis = n_dev // nondata
    if batch_size % data_axis:
        # never silently shrink the mesh: an 8-device run with batch 12
        # would otherwise quietly train on 6 chips
        raise SystemExit(
            f"batch_size {batch_size} must be divisible by the data axis "
            f"size {data_axis} ({n_dev} devices / fsdp*model*sp={nondata}); "
            f"adjust data.train_loader.batch_size or the parallel section")
    n_used = data_axis * nondata
    slice_ids = {getattr(d, "slice_index", 0) for d in jax.devices()}
    if len(slice_ids) > 1 and n_used == n_dev:
        # multi-slice pod: data parallelism over DCN, fsdp/tp/sp on ICI
        from clover_tpu.parallel.mesh import make_hybrid_mesh

        mesh = make_hybrid_mesh(
            (data_axis // len(slice_ids), fsdp_size, model_size, seq_size),
            axis_names=("data", "fsdp", "model", "sp"))
    else:
        mesh = make_mesh(
            axis_sizes=(data_axis, fsdp_size, model_size, seq_size),
            axis_names=("data", "fsdp", "model", "sp"),
            devices=jax.devices()[:n_used])
    logger.info("devices: %s, mesh axes %s", n_dev,
                dict(zip(mesh.axis_names, mesh.devices.shape)))
    if seq_size > 1:
        # sequence parallelism: shard the Swin spatial rows over 'sp'
        # (SwinConfig.act_sharding; GSPMD halo-exchanges the window shifts)
        cfg.model.setdefault("swin", {})["act_sharding"] = (
            "data", None, "sp", None, None)

    # ------------------------------------------------------------- data
    tok_cfg = cfg.get("tokenizer")
    tokenizer = build_tokenizer(tok_cfg) if tok_cfg else None
    train_cfgs = cfg.data.train
    if isinstance(train_cfgs, dict):
        train_cfgs = [train_cfgs]
    datasets = [build_dataset(dc, tokenizer) for dc in train_cfgs]
    if tokenizer is None:
        tokenizer = datasets[0].tokenizer
    loader_cfg = cfg.data.get("train_loader", {"batch_size": 8, "num_workers": 4})
    # multihost: each process loads its shard of every batch; pjit stitches
    # the global batch across hosts (reference: one DistributedSampler per
    # rank, tools/train.py + samplers/distributed_sampler.py)
    rank, world = jax.process_index(), jax.process_count()
    loaders = [
        build_loader(ds, loader_cfg, seed=args.seed)
        for ds in datasets
    ]
    if world > 1:
        from clover_tpu.data.loader import DataLoader as _DL

        loaders = [
            _DL(ds, batch_size=loader_cfg.get("batch_size", 8) // world,
                shuffle=True, num_workers=loader_cfg.get("num_workers", 4),
                rank=rank, world_size=world, seed=args.seed)
            for ds in datasets
        ]

    # ------------------------------------------------------------- model
    model, model_cfg = build_model(cfg.model)
    is_pretrain = cfg.model["type"] == "CloverPretrain"
    task = cfg.model.get("task", "retrieval")
    img_size = cfg.get("img_size", 224)
    compute_dtype = model.dtype

    def to_model_batch(host_batch, train=True):
        imgs = preprocess_clips(
            host_batch["imgs"].reshape((-1,) + host_batch["imgs"].shape[2:]),
            host_batch["crop_boxes"], host_batch["flip"],
            out_size=img_size, dtype=compute_dtype)
        n_cand = host_batch["imgs"].shape[1]
        batch = {
            "imgs": imgs.reshape((-1, n_cand) + imgs.shape[1:]),
            "token_ids": host_batch["token_ids"],
            "input_mask": host_batch["input_mask"],
        }
        for k in ("mlm_label", "v_token_mask", "label"):
            if k in host_batch:
                batch[k] = host_batch[k]
        return batch

    def batch_to_device(loader_idx, host_batch):
        return to_model_batch(shard_batch_pytree(host_batch, mesh))

    sample = to_model_batch(
        shard_batch_pytree(next(iter(loaders[0])), mesh))
    rng = jax.random.PRNGKey(args.seed)
    params = model.init(rng, sample, train=False)["params"]
    logger.info("\n%s", param_table(params))

    # weights-only warm start (reference load_from, tools/train.py:252-253):
    # a checkpoint directory produced by this framework; tower subtrees that
    # match by name are taken, the rest keep fresh init (e.g. a pretrain
    # checkpoint warm-starting a finetune model without QA heads).
    load_from = cfg.get("load_from")
    if load_from:
        from clover_tpu.engine.checkpoint import (CheckpointManager,
                                                  merge_pretrained_params)

        pretrained = CheckpointManager(load_from).restore_params(params)
        if pretrained is None:
            raise SystemExit(f"load_from: no checkpoint in {load_from}")
        params, loaded, fresh = merge_pretrained_params(params, pretrained)
        logger.info("load_from %s: loaded %s; fresh %s", load_from, loaded, fresh)

    if world > 1 and fsdp_size == 1 and model_size == 1:
        # multi-process DP: params start as process-local arrays from the
        # jitted init (every rank computes the identical seeded values);
        # re-place them as ONE global fully-replicated array so the train
        # step's jit sees inputs spanning all processes' devices
        from clover_tpu.parallel.mesh import replicate_pytree

        params = replicate_pytree(params, mesh)

    if fsdp_size > 1 or model_size > 1:
        # place params on their fsdp/tp shardings (after any warm start);
        # the optimizer state created from them inherits the placements and
        # GSPMD threads the shardings through the jitted train step
        from clover_tpu.parallel.sharding import combined_param_shardings

        param_sh = combined_param_shardings(params, mesh)
        params = jax.tree_util.tree_map(jax.device_put, params, param_sh)
        logger.info("placed params with fsdp=%d model=%d shardings",
                    fsdp_size, model_size)

    # ----------------------------------------------------- optimizer
    opt_cfg = cfg.get("optimizer", {})
    sched_cfg = cfg.get("schedule", {})
    steps_per_epoch = max(len(ld) for ld in loaders) * len(loaders)
    total_steps = steps_per_epoch * cfg.total_epochs
    warmup_epochs = sched_cfg.get("warmup_epochs", 0)
    # freeze_stage / freeze_except (reference recognizers/base.py:138-163;
    # substring match on param paths, except-list wins)
    freeze_stage = cfg.model.get("freeze_stage")
    freeze_mask = None
    if freeze_stage:
        from clover_tpu.engine.optim import freeze_mask_from_cfg

        freeze_mask = freeze_mask_from_cfg(
            params, freeze_stage, cfg.model.get("freeze_except", ()))
        n_frozen = sum(
            int(not m) for m in jax.tree_util.tree_leaves(freeze_mask))
        logger.info("freeze_stage %s (except %s): %d/%d param tensors frozen",
                    freeze_stage, cfg.model.get("freeze_except", ()), n_frozen,
                    len(jax.tree_util.tree_leaves(freeze_mask)))
    tx, lr_sched = make_optimizer(
        params,
        base_lr=opt_cfg.get("lr", 1e-4),
        total_steps=total_steps,
        warmup_steps=int(warmup_epochs * steps_per_epoch),
        weight_decay=opt_cfg.get("weight_decay", 0.01),
        betas=tuple(opt_cfg.get("betas", (0.9, 0.98))),
        eps=opt_cfg.get("eps", 1e-8),
        # clipping happens inside the train step (single global-norm pass
        # shared with the grad_norm metric; see engine/steps._finalize)
        grad_clip_norm=None,
        min_lr_ratio=sched_cfg.get("min_lr_ratio", 0.0),
        warmup_start_ratio=sched_cfg.get("warmup_start_ratio", 0.001),
        freeze_mask=freeze_mask,
    )
    ema_cfg = cfg.get("ema", {})
    state = TrainState.create(
        params, tx,
        ema_params=params if ema_cfg.get("enabled", False) else None)

    # ----------------------------------------------------- train steps
    ema_m = ema_cfg.get("momentum", 0.9998) if ema_cfg.get("enabled") else None
    clip = opt_cfg.get("grad_clip", None)
    if is_pretrain:
        loss_cfg = build_pretrain_loss_config(cfg)
        step = make_pretrain_train_step(model, loss_cfg, ema_momentum=ema_m,
                                        grad_clip_norm=clip)
    elif task == "retrieval":
        loss_type = cfg.model.get("loss", {})
        step = make_retrieval_train_step(
            model,
            temperature=loss_type.get("temperature", 0.05),
            cos_sim=loss_type.get("cos_sim", True),
            ema_momentum=ema_m,
            grad_clip_norm=clip)
    else:
        step = make_qa_train_step(model, ema_momentum=ema_m,
                                  grad_clip_norm=clip)
    train_steps = [step] * len(loaders)

    # ----------------------------------------------------- eval
    eval_fn = None
    eval_cfg = cfg.get("evaluation", {})
    if "val" in cfg.data:
        val_ds = build_dataset(cfg.data.val, tokenizer)
        val_loader = build_loader(
            val_ds, cfg.data.get("val_loader", loader_cfg), test=True)
        # val iterates epoch(0) on purpose: test_mode loaders are
        # deterministic (centered sampling, no shuffle), so every eval
        # sees the identical clip set — comparable across epochs. Any
        # val-time random sampling would need a per-eval epoch here.
        # precomputed relative-position biases (eval-time constants): the
        # builder re-materializes per eval call since params change between
        # evals; removes the per-batch table gathers (swin3d.swin_bias_cache)
        from clover_tpu.models.swin3d import bias_cache_builder

        swin_cache = bias_cache_builder(model.config.swin)
        if ((is_pretrain or task == "retrieval")
                and cfg.model.get("eval_mode") == "mc_retrieval"):
            # MC-as-retrieval val (finetune_msrvtt_mc.py): score the 5
            # candidate captions per video, metric 'acc'
            from clover_tpu.engine.eval_loop import run_mc_retrieval_eval

            eval_step = make_embed_eval_step(model)

            def eval_fn(params):
                return run_mc_retrieval_eval(
                    eval_step, params, val_ds, val_loader.epoch(0),
                    out_size=img_size, dtype=compute_dtype,
                    bias_cache=swin_cache)
        elif is_pretrain or task == "retrieval":
            eval_step = make_embed_eval_step(model)

            def eval_fn(params):
                return run_retrieval_eval(
                    eval_step, params, val_ds, val_loader.epoch(0),
                    out_size=img_size, dtype=compute_dtype,
                    bias_cache=swin_cache)
        else:
            eval_step = make_qa_eval_step(model)

            def eval_fn(params):
                return run_qa_eval(
                    eval_step, params, val_ds, val_loader.epoch(0),
                    out_size=img_size, dtype=compute_dtype,
                    bias_cache=swin_cache)

    ckpt_mgr = CheckpointManager(
        os.path.join(work_dir, "checkpoints"),
        max_to_keep=cfg.get("checkpoint", {}).get("max_to_keep", 3))

    trainer = Trainer(
        state=state,
        train_steps=train_steps,
        train_loaders=loaders,
        batch_to_device=batch_to_device,
        # dropout rng: the hardware RNG ('rbg', XLA RngBitGenerator)
        # generates mask bits ~free where threefry costs real VPU time
        # (+2.4% pretrain step, BASELINE.md r3). Deterministic per key;
        # the bit STREAM differs from threefry and may differ across
        # backends — fine for dropout (the reference's cuDNN dropout
        # streams were never bit-matched either). CLOVER_TRAIN_RNG=
        # threefry restores the portable stream.
        rng=jax.random.key(args.seed + 1,
                           impl=os.environ.get("CLOVER_TRAIN_RNG", "rbg")),
        total_epochs=cfg.total_epochs,
        # only rank 0 writes metrics.jsonl/tb (reference DDP convention);
        # every rank still logs to its own stdout
        work_dir=work_dir if jax.process_index() == 0 else None,
        log_interval=cfg.get("log_interval", 20),
        eval_fn=eval_fn,
        eval_interval=eval_cfg.get("interval", 1),
        save_best_key=eval_cfg.get("save_best"),
        ckpt_interval=cfg.get("checkpoint", {}).get("interval", 1),
        ckpt_manager=ckpt_mgr,
        ema_eval=ema_cfg.get("eval_with_ema", False),
        tensorboard=args.tb or cfg.get("log_tensorboard", False),
    )
    if args.resume:
        trainer.resume()
    from clover_tpu.utils.profiling import trace

    with jax.set_mesh(mesh), trace(args.profile):
        trainer.fit()
    if args.profile:
        logger.info("profiler trace written to %s", args.profile)
    logger.info("training done at step %d", int(trainer.state.step))


if __name__ == "__main__":
    main()
