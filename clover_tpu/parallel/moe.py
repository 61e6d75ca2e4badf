"""Expert parallelism: a Mixture-of-Experts FFN sharded over an ``ep`` axis.

New capability beyond the reference (no MoE anywhere in Clover,
SURVEY.md §2.5) — carried so the framework's parallelism surface covers
every standard axis (dp/fsdp/tp/sp/pp/ep). The design is the idiomatic
XLA one (GShard/Switch on TPU): routing, dispatch, and combine are dense
einsums over a static-capacity buffer — no data-dependent shapes, no
manual collectives. Under a mesh, the expert dim of the expert weights
and of the dispatched (E, C, D) token buffer carry an ``ep`` sharding
constraint and GSPMD inserts the all-to-alls; on one device the same
program runs collective-free. Semantics:

- top-1 or top-2 routing with softmax gates (renormalized over the
  selected experts for top-2, Switch/GShard convention);
- static per-expert capacity C = ceil(T/E · capacity_factor); tokens
  routed past a full expert are DROPPED for that expert (output 0 for
  top-1, remaining gate mass for top-2) — the standard static-shape
  trade, documented and pinned by tests;
- auxiliary load-balance loss (Switch eq. 4: E · Σ_e f_e · p_e) returned
  for the trainer to weight in.

Numerics vs a per-token loop reference and ep-sharded vs single-device
equality are pinned by tests/test_moe.py.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clover_tpu.models.layers import dense

Dtype = Any


def _constrain(x: jax.Array, spec) -> jax.Array:
    """with_sharding_constraint when the named axes exist in the ambient
    mesh; identity otherwise (single device / tests). Same contract as
    swin3d.constrain_activation."""
    from clover_tpu.models.swin3d import constrain_activation

    return constrain_activation(x, tuple(spec))


def moe_dispatch(
    router_logits: jax.Array,       # (T, E) fp32
    top_k: int,
    capacity: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Static-shape dispatch/combine tensors from router logits.

    Returns (dispatch (T, E, C) 0/1, combine (T, E, C) gates, aux_loss).
    Position within each expert = prefix count of earlier tokens routed
    to it (GShard cumsum); tokens whose position >= C are dropped.
    """
    T, E = router_logits.shape
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)

    dispatch = jnp.zeros((T, E), jnp.float32)
    gates = jnp.zeros((T, E), jnp.float32)
    # successive argmax over MASKED LOGITS, not zeroed probs: a saturated
    # softmax (logit gap > ~88 in fp32) makes every non-top prob exactly
    # 0.0, and zeroing the winner would re-select it — double-dispatching
    # the token into one expert with weight 2
    masked = router_logits.astype(jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    for _ in range(top_k):
        idx = jnp.argmax(masked, axis=-1)
        one = jax.nn.one_hot(idx, E, dtype=jnp.float32)
        dispatch = dispatch + one
        gates = gates + one * probs
        masked = jnp.where(one > 0, neg, masked)
    if top_k > 1:
        # renormalize gate mass over the selected experts (GShard)
        gates = gates / jnp.maximum(
            jnp.sum(gates, axis=-1, keepdims=True), 1e-9)

    # position of each token in its expert's buffer (selection order =
    # token order, per expert): exclusive prefix sum over tokens
    pos = jnp.cumsum(dispatch, axis=0) - dispatch          # (T, E)
    keep = (pos < capacity) * dispatch                     # drop overflow
    pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), capacity,
                            dtype=jnp.float32)             # (T, E, C)
    dispatch_tec = keep[:, :, None] * pos_oh               # (T, E, C)
    combine_tec = (gates * keep)[:, :, None] * pos_oh

    # Switch load-balance loss: E * sum_e (fraction routed to e) * (mean
    # router prob of e); minimized at uniform routing
    frac = jnp.mean(dispatch, axis=0)
    mean_p = jnp.mean(probs, axis=0)
    aux = E * jnp.sum(frac * mean_p) / top_k
    return dispatch_tec, combine_tec, aux


class MoEFeedForward(nn.Module):
    """Gelu MLP with E experts and token-choice routing.

    Drop-in for a dense FFN block of the same d_model -> d_hidden ->
    d_model shape: ``y, aux = MoEFeedForward(...)(x)`` for x (B, S, D).
    ``ep_axis`` names the mesh axis sharding the expert dim of the
    weights and the dispatched buffers (expert parallelism); ``None``
    (or no ambient mesh) runs the identical program unsharded.
    """

    num_experts: int
    d_hidden: int
    top_k: int = 1
    capacity_factor: float = 1.25
    ep_axis: Optional[str] = "ep"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        B, S, D = x.shape
        E, H = self.num_experts, self.d_hidden
        T = B * S
        # GShard convention: expected assignments per expert under uniform
        # routing is top_k*T/E, so capacity must scale with top_k
        C = int(np.ceil(self.top_k * T / E * self.capacity_factor))
        xt = x.reshape(T, D)

        router = dense(E, dtype=jnp.float32, use_bias=False,
                       kernel_init=nn.initializers.normal(stddev=0.02),
                       name="router")
        logits = router(xt.astype(jnp.float32))            # (T, E) fp32
        dispatch, combine, aux = moe_dispatch(logits, self.top_k, C)

        init = nn.initializers.normal(stddev=0.02)
        w1 = self.param("w1", init, (E, D, H), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (E, H), jnp.float32)
        w2 = self.param("w2", init, (E, H, D), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (E, D), jnp.float32)

        ep = (self.ep_axis,)
        xe = jnp.einsum("tec,td->ecd", dispatch.astype(self.dtype),
                        xt.astype(self.dtype))             # (E, C, D)
        xe = _constrain(xe, ep + (None, None))
        h = jnp.einsum("ecd,edh->ech", xe, w1.astype(self.dtype))
        h = nn.gelu(h + b1[:, None, :].astype(h.dtype), approximate=False)
        ye = jnp.einsum("ech,ehd->ecd", h, w2.astype(self.dtype))
        ye = ye + b2[:, None, :].astype(ye.dtype)
        ye = _constrain(ye, ep + (None, None))
        y = jnp.einsum("tec,ecd->td", combine.astype(self.dtype), ye)
        return y.reshape(B, S, D), aux


def moe_param_shardings(params, mesh, ep_axis: str = "ep",
                        num_experts: Optional[int] = None):
    """NamedShardings placing every (E, ...) expert param over ``ep_axis``
    and replicating the router — compose with fsdp/tp shardings for the
    rest of the tree.

    Matching is by leaf name (w1/b1/w2/b2, MoEFeedForward's expert
    params); pass ``num_experts`` when composing over a larger tree so a
    same-named non-expert param (dim0 != E) cannot be silently
    ep-sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[ep_axis]

    def spec(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        is_expert = (name in ("w1", "b1", "w2", "b2") and x.ndim >= 2
                     and x.shape[0] % n == 0
                     and (num_experts is None or x.shape[0] == num_experts))
        if is_expert:
            return NamedSharding(mesh, P(ep_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)
