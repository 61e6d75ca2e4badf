"""Optimizer + LR schedule construction (optax).

Reproduces the reference's optimization recipe (SURVEY.md §2.3):
- AdamW betas (0.9, 0.98), eps 1e-8 (configs/exp_local/*.py optimizer=)
- paramwise weight-decay exemptions: norms, biases, relative position
  tables, learned position/cls/mask tokens, embeddings
  (paramwise_cfg norm/bias decay_mult=0 + custom_keys,
  pretrain_webvid_cc3m.py:129-136)
- global-norm gradient clipping (optimizer_config grad_clip)
- cosine annealing with linear warmup (lr_config, by-epoch or by-iter)
- linear LR scaling by world size happens in the caller (the reference
  divides base_lr by world size in config then re-multiplies at runtime,
  tools/train.py:160-166 — net fixed global LR; we just take the global
  LR directly).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import optax

# parameter-path fragments that receive zero weight decay
NO_DECAY_LEAVES = ("bias", "scale", "embedding")
NO_DECAY_NAMES = (
    "relative_position_bias_table",
    "vis_space_pos",
    "vis_tempor_pos",
    "mask_token",
    "all_cls_token",
    "prompt_token",
    "absolute_pos_embed",
)


def weight_decay_mask(params) -> Any:
    """True where weight decay applies (matrix kernels only)."""

    def decide(path: Tuple, _leaf) -> bool:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        leaf_name = keys[-1] if keys else ""
        if leaf_name in NO_DECAY_LEAVES:
            return False
        if any(k in NO_DECAY_NAMES for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def cosine_warmup_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int,
    warmup_start_ratio: float = 0.001,
    min_lr_ratio: float = 0.0,
) -> optax.Schedule:
    """Linear warmup from base_lr*warmup_start_ratio, cosine decay to
    base_lr*min_lr_ratio (mmcv CosineAnnealing + linear warmup semantics)."""
    schedules = []
    boundaries = []
    if warmup_steps > 0:
        schedules.append(
            optax.linear_schedule(
                init_value=base_lr * warmup_start_ratio,
                end_value=base_lr,
                transition_steps=warmup_steps,
            ))
        boundaries.append(warmup_steps)
    schedules.append(
        optax.cosine_decay_schedule(
            init_value=base_lr,
            decay_steps=max(1, total_steps - warmup_steps),
            alpha=min_lr_ratio,
        ))
    if len(schedules) == 1:
        return schedules[0]
    return optax.join_schedules(schedules, boundaries)


def linear_annealing_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    warmup_start_ratio: float = 0.001,
    min_lr_ratio: float = 0.0,
) -> optax.Schedule:
    """Linear decay to base_lr*min_lr_ratio (reference
    LinearAnnealingLrUpdaterHook, core/lr/linear_annealing.py:4)."""
    schedules, boundaries = [], []
    if warmup_steps > 0:
        schedules.append(optax.linear_schedule(
            base_lr * warmup_start_ratio, base_lr, warmup_steps))
        boundaries.append(warmup_steps)
    schedules.append(optax.linear_schedule(
        base_lr, base_lr * min_lr_ratio, max(1, total_steps - warmup_steps)))
    return schedules[0] if len(schedules) == 1 else optax.join_schedules(
        schedules, boundaries)


def step_schedule(base_lr: float, boundaries_and_scales) -> optax.Schedule:
    """mmcv StepLrUpdater equivalent: piecewise-constant decay."""
    return optax.piecewise_constant_schedule(base_lr, dict(boundaries_and_scales))


SCHEDULES = {
    "cosine": cosine_warmup_schedule,
    "linear": linear_annealing_schedule,
}


def make_optimizer(
    params,
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    weight_decay: float = 0.01,
    betas: Tuple[float, float] = (0.9, 0.98),
    eps: float = 1e-8,
    grad_clip_norm: Optional[float] = None,
    warmup_start_ratio: float = 0.001,
    min_lr_ratio: float = 0.0,
    freeze_mask=None,
    policy: str = "cosine",
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """Build the full optax chain; returns (optimizer, lr_schedule).

    ``freeze_mask``: optional pytree of bools, True = trainable. Frozen
    leaves get zero updates (reference _freeze by name prefix,
    recognizers/base.py:138-163).
    """
    schedule = SCHEDULES[policy](
        base_lr, total_steps, warmup_steps, warmup_start_ratio, min_lr_ratio)
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=weight_decay,
            mask=weight_decay_mask(params),
        ))
    tx = optax.chain(*chain)
    if freeze_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", freeze_mask),
        )
    return tx, schedule


def freeze_by_prefix(params, prefixes: Tuple[str, ...]) -> Any:
    """Bool mask: False (frozen) for params whose path starts with any
    '/'-joined prefix, e.g. ('text_backbone', 'backbone/patch_embed')."""

    def decide(path: Tuple, _leaf) -> bool:
        joined = "/".join(getattr(p, "key", str(p)) for p in path)
        return not any(joined.startswith(p) for p in prefixes)

    return jax.tree_util.tree_map_with_path(decide, params)


def freeze_mask_from_cfg(params, freeze_stage, freeze_except=()) -> Any:
    """Bool mask (True = trainable) from the reference's freeze config keys.

    Reference semantics (recognizers/base.py:138-163; config keys in every
    exp_local/*.py): ``freeze_stage`` entries are SUBSTRING matches on
    module names, ``freeze_except`` entries exempt matching names and win
    over freeze_stage.  Paths here are '/'-joined flax param paths, e.g.
    'backbone/patch_embed' or 'text_backbone' — dots in configs are
    normalized to '/' so reference-style 'backbone.patch_embed.' keys
    also work.
    """
    stage = tuple(s.replace(".", "/").strip("/") for s in (freeze_stage or ()))
    exempt = tuple(s.replace(".", "/").strip("/") for s in (freeze_except or ()))

    def decide(path: Tuple, _leaf) -> bool:
        joined = "/".join(getattr(p, "key", str(p)) for p in path)
        if any(e in joined for e in exempt):
            return True
        return not any(s in joined for s in stage)

    return jax.tree_util.tree_map_with_path(decide, params)
