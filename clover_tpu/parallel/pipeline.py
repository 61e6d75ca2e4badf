"""Pipeline parallelism (GPipe schedule) over a ``pp`` mesh axis.

New capability beyond the reference (which scales only by DDP,
SURVEY.md §2.5): partition a homogeneous layer stack into S stages, one
per device along a ``pp`` mesh axis, and stream M microbatches through
the stages with a fill/drain (GPipe) schedule. Idiomatic TPU building
blocks only: ``shard_map`` for the manual region, ``lax.ppermute`` for
the stage-to-stage activation hop (one ICI neighbor transfer per tick),
``lax.scan`` for the static schedule — no data-dependent control flow,
so the whole pipeline jits into a single XLA program and differentiates
through the scan/ppermute transposes (grad parity pinned by
tests/test_pipeline.py).

Schedule: T = M + S - 1 ticks. At tick t, stage s computes microbatch
``t - s`` when ``0 <= t - s < M``; bubble ticks compute on garbage and
their results are masked out (the standard SPMD-GPipe trade: bubble
FLOPs for a static schedule — S-1 of M·S stage-steps, amortized by
raising M). Stage 0 reads its microbatch from the replicated input
buffer; stage S-1 banks results into the output buffer, psum-broadcast
at the end so callers see a replicated result.

The reference has no equivalent; at Swin-B/BERT-base scale pipeline
parallelism is unnecessary, but the framework carries it as a
first-class axis for larger text/fusion towers.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map  # jax.experimental.shard_map is deprecated (v0.8)
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(
    stage_fn: Callable[[Any, Any], Any],
    stage_params: Any,
    x_mb: Any,
    axis_name: str = "pp",
) -> Any:
    """Run one GPipe pass inside an active ``shard_map`` region.

    stage_fn(params, x) -> y where ``x``/``y`` are pytrees of identical
    structure and shapes (a residual stack stage; side inputs like
    attention masks ride as extra leaves passed through unchanged).
    ``stage_params``: THIS stage's params (shard_map already consumed the
    leading stage axis). ``x_mb``: pytree of (M, mb, ...) microbatched
    leaves, replicated across ``axis_name``. Returns the same structure,
    replicated (psum-broadcast from the last stage).
    """
    n = jax.lax.axis_size(axis_name)
    s = jax.lax.axis_index(axis_name)
    leaves = jax.tree_util.tree_leaves(x_mb)
    M = leaves[0].shape[0]
    T = M + n - 1
    perm = [(i, (i + 1) % n) for i in range(n)]

    def index(tree, i):
        return jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, i, keepdims=False),
            tree)

    def tick(carry, t):
        out_buf, prev = carry
        # stage 0 consumes microbatch t (clamped — bubble ticks read a
        # valid-but-ignored slot); later stages consume the neighbor hop
        cur = jax.tree_util.tree_map(
            lambda a, b: jnp.where(s == 0, a, b),
            index(x_mb, jnp.clip(t, 0, M - 1)), prev)
        y = stage_fn(stage_params, cur)
        # hop to the next stage (ring; the wraparound S-1 -> 0 feed is
        # overwritten by the s == 0 select above)
        nxt = jax.tree_util.tree_map(
            lambda a: jax.lax.ppermute(a, axis_name, perm), y)
        # the last stage banks microbatch t - (n-1) when it is real
        out_idx = jnp.clip(t - (n - 1), 0, M - 1)
        is_real = jnp.logical_and(s == n - 1, t - (n - 1) >= 0)
        banked = jax.tree_util.tree_map(
            lambda a, b: jnp.where(is_real, a, b), y, index(out_buf, out_idx))
        out_buf = jax.tree_util.tree_map(
            lambda buf, v: jax.lax.dynamic_update_index_in_dim(
                buf, v, out_idx, 0), out_buf, banked)
        return (out_buf, nxt), None

    out0 = jax.tree_util.tree_map(jnp.zeros_like, x_mb)
    (out_buf, _), _ = jax.lax.scan(tick, (out0, index(out0, 0)),
                                   jnp.arange(T))
    # replicate the last stage's buffer to every stage
    mine = jax.tree_util.tree_map(
        lambda a: jnp.where(s == n - 1, a, jnp.zeros_like(a)), out_buf)
    return jax.tree_util.tree_map(lambda a: jax.lax.psum(a, axis_name), mine)


def stack_stage_params(per_layer_params, n_stages: int):
    """[L] list of identical-structure param trees -> (S, L/S, ...) tree.

    Layers are assigned to stages contiguously (layers 0..L/S-1 -> stage
    0, ...), matching how the in-stage ``lax.scan`` replays them in order.
    """
    L = len(per_layer_params)
    if L % n_stages:
        raise ValueError(f"{L} layers do not split into {n_stages} stages")
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *per_layer_params)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_stages, L // n_stages) + x.shape[1:]), stacked)


def _microbatch(x: jax.Array, M: int) -> jax.Array:
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} does not split into {M} microbatches")
    return x.reshape((M, B // M) + x.shape[1:])


def pipelined_layer_stack(
    layer_apply: Callable[[Any, Any], Any],
    per_layer_params,
    x,
    mesh: Mesh,
    *,
    axis_name: str = "pp",
    n_microbatches: Optional[int] = None,
):
    """Pipeline a homogeneous residual layer stack over ``mesh[axis_name]``.

    layer_apply(layer_params, x) -> x' applies ONE layer to the pytree
    ``x`` (leading dim of every leaf = batch). The L layers' params are
    stacked into S = mesh.shape[axis_name] stages of L/S layers each;
    within a stage the layers run under a ``lax.scan``. ``x`` is split
    into ``n_microbatches`` (default S) along the batch. Returns the
    same structure with batch restored — numerically the sequential
    composition of the L layers (pinned by tests/test_pipeline.py).

    CONTRACT: bubble ticks run ``layer_apply`` on ZERO-filled inputs
    (their outputs are masked, but reverse-mode still evaluates the vjp
    with a zero cotangent) — the layer must be finite, with finite
    jacobian, on zero inputs, or 0 * inf = NaN poisons the param grads.
    Standard transformer layers (LN/attention/MLP) satisfy this; layers
    dividing by or sqrt-ing an activation may not.
    """
    S = mesh.shape[axis_name]
    M = S if n_microbatches is None else n_microbatches
    stages = stack_stage_params(per_layer_params, S)
    x_mb = jax.tree_util.tree_map(lambda a: _microbatch(a, M), x)

    def stage_fn(stage_params, xm):
        # shard_map keeps the sharded stage axis as a size-1 leading dim
        local = jax.tree_util.tree_map(lambda a: a[0], stage_params)

        def body(h, lp):
            return layer_apply(lp, h), None

        out, _ = jax.lax.scan(body, xm, local)
        return out

    stage_spec = jax.tree_util.tree_map(lambda _: P(axis_name), stages)
    x_spec = jax.tree_util.tree_map(lambda _: P(), x_mb)
    fn = shard_map(
        functools.partial(pipeline_apply, stage_fn, axis_name=axis_name),
        mesh=mesh,
        in_specs=(stage_spec, x_spec),
        out_specs=x_spec,
        check_vma=False,
    )
    out_mb = fn(stages, x_mb)
    unsplit = lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
    return jax.tree_util.tree_map(unsplit, out_mb)


def pipelined_text_encoder(
    variables,
    cfg,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array],
    mesh: Mesh,
    *,
    axis_name: str = "pp",
    n_microbatches: Optional[int] = None,
    dtype=jnp.float32,
):
    """``BertTextEncoder`` forward with the encoder layers pipelined.

    Takes the standard (HF-layout) ``BertTextEncoder`` variables —
    checkpoints need no conversion. Embeddings run replicated (a lookup,
    not worth a stage); the ``num_hidden_layers`` post-LN layers pipeline
    over ``axis_name``; the per-sample extended attention mask rides the
    microbatch as a pass-through leaf. Returns the (B, S, D) hidden
    states — same math as ``BertTextEncoder.__call__`` (parity pinned by
    tests/test_pipeline.py::test_pipelined_bert_matches_sequential).

    Deterministic-only: layers run with dropout OFF (no rng plumbing
    through the pipeline scan) — equivalent to the sequential encoder in
    eval mode, or in training when cfg dropout rates are 0.
    """
    from clover_tpu.models.bert import (
        BertEmbeddings,
        BertLayer,
        extend_attention_mask,
    )

    params = variables["params"]
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)
    emb = BertEmbeddings(cfg, dtype=dtype).apply(
        {"params": params["embeddings"]}, input_ids)
    bias = extend_attention_mask(attention_mask, jnp.float32)
    layer = BertLayer(cfg, dtype=dtype)
    per_layer = [params["encoder"][f"layer_{i}"]
                 for i in range(cfg.num_hidden_layers)]

    def layer_apply(lp, hm):
        h, bm = hm
        return layer.apply({"params": lp}, h, bm), bm

    out, _ = pipelined_layer_stack(
        layer_apply, per_layer, (emb, bias), mesh,
        axis_name=axis_name, n_microbatches=n_microbatches)
    return out
