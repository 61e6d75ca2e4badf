"""Jitted train / eval step factories.

Each task's whole iteration — forward graph(s), losses, backward,
clipping, AdamW update, EMA — is ONE jit compile unit (SURVEY.md §7.1),
the TPU-native replacement for the reference's runner + Fp16OptimizerHook
ping-pong (clover_runner.py + mmcv_Fp16OptimizerHook.py). bf16 compute
happens inside the model (dtype policy); params/optimizer stay fp32, so
no loss scaling is needed.

Metrics returned per step mirror the reference log_vars keys.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from clover_tpu.engine.train_state import TrainState
from clover_tpu.losses.objectives import (
    PretrainLossConfig,
    pretrain_losses,
    qa_loss,
    retrieval_loss,
    total_loss,
)


def ema_momentum_schedule(kind: str = "constant", base: float = 0.9998,
                          ramp_steps: int = 2000):
    """EMA momentum schedules (reference ExpMomentumEMAHook /
    LinearMomentumEMAHook, core/hooks/ema.py:8-126): warm the decay up so
    early EMA tracks the fast-moving params."""

    def fn(step):
        step = step.astype(jnp.float32)
        if kind == "constant":
            return jnp.float32(base)
        if kind == "exp":
            return 1.0 - (1.0 - base) * (jnp.exp(-step / ramp_steps) + 1.0)
        if kind == "linear":
            return jnp.minimum(base, (1.0 + step) / (ramp_steps + step))
        raise ValueError(kind)

    return fn


def _global_norm_flat(grads, chunk_elems: int = 64 * 2 ** 20):
    """Global grad norm in O(few) kernels regardless of leaf count.

    Ravels the ~610 leaves into <=chunk_elems f32 chunks (one XLA
    concatenate each) and reduces per chunk: bounded kernel count and one
    clean HBM pass (~1.1 GB at Swin-B+BERT), vs per-leaf sumsq whose
    standalone scalar dispatches cost ~59 ms/step on the 32f remat recipe
    (r5 trace). Numerically: f32 sum in a different association than
    optax.global_norm — same reassociation class as any fusion change."""
    leaves = [l.astype(jnp.float32).ravel()
              for l in jax.tree_util.tree_leaves(grads)]
    chunks, cur, cur_n = [], [], 0
    for leaf in leaves:
        cur.append(leaf)
        cur_n += leaf.size
        if cur_n >= chunk_elems:
            chunks.append(jnp.concatenate(cur))
            cur, cur_n = [], 0
    if cur:
        chunks.append(jnp.concatenate(cur))
    total = sum(jnp.sum(c * c) for c in chunks)
    return jnp.sqrt(total)


def _finalize(state: TrainState, grads, losses, ema_momentum,
              grad_clip_norm=None):
    tot = total_loss(losses)
    if callable(ema_momentum):
        ema_momentum = ema_momentum(state.step)
    # ONE global-norm pass serves both the clip and the grad_norm metric.
    # Keeping optax.clip_by_global_norm in the optimizer chain next to
    # this metric compiles to TWO per-leaf sumsq sweeps (~610 leaves,
    # ~2x16 ms/step on the v5e pretrain profile — 13% of device time, not
    # CSE'd by XLA); clip here with the metric's norm instead and build
    # the optimizer with grad_clip_norm=None. Clip math mirrors
    # optax.clip_by_global_norm exactly: select(norm < max, g, g*max/norm).
    # CLOVER_GNORM=flat: single-pass norm over a few concatenated chunks
    # instead of optax's ~610 per-leaf sumsq reduces. At 8f the per-leaf
    # reduces fuse into the dW producers (free — r3 A/B); at 32f remat-0,1
    # they detach into ~400 standalone scalar dispatches (~59 ms/step,
    # r5 trace). '0' skips the norm entirely (A/B only: loses the
    # grad_norm metric and the clip).
    gnorm_mode = os.environ.get("CLOVER_GNORM", "leaf")
    if gnorm_mode == "0":
        gnorm = jnp.zeros((), jnp.float32)
        grad_clip_norm = None
    elif gnorm_mode == "flat":
        gnorm = _global_norm_flat(grads)
    else:
        gnorm = optax.global_norm(grads)
    if grad_clip_norm is not None:
        trigger = gnorm < grad_clip_norm
        grads = jax.tree_util.tree_map(
            lambda t: jax.lax.select(
                trigger, t, (t / gnorm.astype(t.dtype)) * grad_clip_norm),
            grads)
    new_state = state.apply_gradients(grads, ema_momentum=ema_momentum)
    metrics = dict(losses)
    metrics["loss"] = tot
    metrics["grad_norm"] = gnorm
    return new_state, metrics


def make_pretrain_train_step(
    model,
    loss_cfg: PretrainLossConfig = PretrainLossConfig(),
    ema_momentum: Optional[float] = None,
    jit: bool = True,
    grad_clip_norm: Optional[float] = None,
) -> Callable:
    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out = model.apply({"params": params}, batch, train=True,
                              rngs={"dropout": step_rng})
            losses = pretrain_losses(out, batch["mlm_label"], loss_cfg)
            return total_loss(losses), losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return _finalize(state, grads, losses, ema_momentum, grad_clip_norm)

    return jax.jit(step, donate_argnums=0) if jit else step


def make_retrieval_train_step(
    model,
    temperature: float = 0.05,
    cos_sim: bool = True,
    ema_momentum: Optional[float] = None,
    jit: bool = True,
    grad_clip_norm: Optional[float] = None,
) -> Callable:
    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            v, t = model.apply({"params": params}, batch, train=True,
                               rngs={"dropout": step_rng})
            losses = retrieval_loss(v, t, temperature=temperature, cos_sim=cos_sim)
            return total_loss(losses), losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return _finalize(state, grads, losses, ema_momentum, grad_clip_norm)

    return jax.jit(step, donate_argnums=0) if jit else step


def make_qa_train_step(
    model,
    ema_momentum: Optional[float] = None,
    jit: bool = True,
    grad_clip_norm: Optional[float] = None,
) -> Callable:
    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits = model.apply({"params": params}, batch, train=True,
                                 rngs={"dropout": step_rng})
            losses = qa_loss(logits, batch["label"])
            return total_loss(losses), losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return _finalize(state, grads, losses, ema_momentum, grad_clip_norm)

    return jax.jit(step, donate_argnums=0) if jit else step


def make_embed_eval_step(model) -> Callable:
    """separate_test dual-tower embeddings (retrieval eval).

    ``bias_cache`` (optional) is the swin_bias_cache(params) pytree of
    precomputed relative-position biases — eval-time constants that remove
    the per-dispatch table gathers (~6 ms/step at 32-frame shapes)."""

    @jax.jit
    def step(params, imgs, token_ids, input_mask, bias_cache=None):
        return model.apply({"params": params}, imgs, token_ids, input_mask,
                           bias_cache, method="forward_test")

    return step


def make_itm_embed_step(model) -> Callable:
    """Backbone tokens + dual-tower embeddings for the itm retrieval eval
    (cached-token protocol; see eval_loop.run_itm_retrieval_eval)."""

    @jax.jit
    def step(params, imgs, token_ids, input_mask, bias_cache=None):
        tokens = model.apply({"params": params}, imgs, token_ids.shape[0],
                             bias_cache, method="encode_visual")
        v, t = model.apply({"params": params}, imgs, token_ids, input_mask,
                           bias_cache, method="forward_test")
        return tokens, v, t

    return step


def make_itm_score_step(model) -> Callable:
    """Fused ITM match probability for (cached-video-tokens, text) pairs."""

    @jax.jit
    def step(params, visual_tokens, token_ids, input_mask):
        return model.apply({"params": params}, visual_tokens, token_ids,
                           input_mask, method="itm_pair_score")

    return step


def make_qa_eval_step(model) -> Callable:
    @jax.jit
    def step(params, imgs, token_ids, input_mask, bias_cache=None):
        return model.apply({"params": params}, imgs, token_ids, input_mask,
                           bias_cache, method="forward_test")

    return step
