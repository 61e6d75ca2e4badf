"""Expert-parallel MoE FFN: routing/dispatch semantics vs a per-token
loop, and ep-sharded == single-device execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from clover_tpu.parallel.mesh import make_mesh
from clover_tpu.parallel.moe import MoEFeedForward, moe_dispatch, moe_param_shardings


def _loop_reference(params, x, top_k, capacity):
    """Per-token numpy re-implementation of the routed MLP (drops incl.)."""
    B, S, D = x.shape
    xt = np.asarray(x, np.float64).reshape(-1, D)
    r = np.asarray(params["router"]["kernel"], np.float64)
    w1 = np.asarray(params["w1"], np.float64)
    b1 = np.asarray(params["b1"], np.float64)
    w2 = np.asarray(params["w2"], np.float64)
    b2 = np.asarray(params["b2"], np.float64)
    E = w1.shape[0]
    logits = xt @ r
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)

    def gelu_exact(v):
        import math

        # exact erf gelu, matching nn.gelu(approximate=False)
        erf = np.vectorize(math.erf)
        return 0.5 * v * (1.0 + erf(v / np.sqrt(2.0)))

    counts = np.zeros(E, int)
    out = np.zeros_like(xt)
    sel = []
    for t in range(xt.shape[0]):
        p = probs[t].copy()
        picks = []
        for _ in range(top_k):
            e = int(np.argmax(p))
            picks.append((e, probs[t, e]))
            p[e] = -1.0
        gate_sum = sum(g for _, g in picks) if top_k > 1 else 1.0
        sel.append(picks)
        for e, g in picks:
            if counts[e] < capacity:
                h = gelu_exact(xt[t] @ w1[e] + b1[e])
                y = h @ w2[e] + b2[e]
                gate = probs[t, e] / gate_sum if top_k > 1 else probs[t, e]
                out[t] += gate * y
            counts[e] += 1
    return out.reshape(B, S, D)


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_matches_token_loop(rng, top_k):
    B, S, D, E, H = 2, 6, 8, 4, 16
    model = MoEFeedForward(num_experts=E, d_hidden=H, top_k=top_k,
                           capacity_factor=0.75)   # forces real drops
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    y, aux = model.apply(variables, x)
    C = int(np.ceil(top_k * B * S / E * 0.75))
    ref = _loop_reference(variables["params"], x, top_k, C)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4, rtol=1e-4)
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_moe_dispatch_capacity_and_positions():
    """All tokens to one expert: positions 0..C-1 kept, the rest dropped;
    aux loss maximal (E * 1 * ~1)."""
    T, E, C = 6, 3, 4
    logits = jnp.asarray(np.tile([10.0, 0.0, -10.0], (T, 1)), jnp.float32)
    dispatch, combine, aux = moe_dispatch(logits, 1, C)
    d = np.asarray(dispatch)
    assert d[:, 1:, :].sum() == 0
    np.testing.assert_array_equal(d[:, 0].sum(0), [1, 1, 1, 1])
    assert d[4:].sum() == 0            # tokens past capacity dropped
    assert float(aux) > 1.0            # badly imbalanced routing penalized


def test_moe_ep_sharded_matches_single_device(rng):
    """Same program under an ('ep',) mesh with expert-sharded params ==
    unsharded execution; GSPMD inserts the collectives."""
    assert len(jax.devices()) == 8
    B, S, D, E, H = 2, 8, 8, 4, 16
    model = MoEFeedForward(num_experts=E, d_hidden=H, top_k=2)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    y_ref, aux_ref = model.apply(variables, x)

    mesh = make_mesh(axis_sizes=(4,), axis_names=("ep",),
                     devices=jax.devices()[:4])
    shardings = {"params": moe_param_shardings(variables["params"], mesh)}
    v_sharded = jax.tree_util.tree_map(jax.device_put, variables, shardings)
    x_sh = jax.device_put(x, NamedSharding(mesh, P()))
    with jax.set_mesh(mesh):
        y, aux = jax.jit(model.apply)(v_sharded, x_sh)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)

    # expert params really are sharded over ep
    w1_sh = v_sharded["params"]["w1"].sharding
    assert w1_sh.spec == P("ep")


def test_moe_gradients_flow(rng):
    B, S, D, E, H = 2, 4, 8, 2, 8
    model = MoEFeedForward(num_experts=E, d_hidden=H, top_k=1)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(v, x):
        y, aux = model.apply(v, x)
        return jnp.mean(y ** 2) + 0.01 * aux

    g = jax.grad(loss)(variables, x)["params"]
    for name in ("w1", "w2", "router"):
        leaf = g[name]["kernel"] if name == "router" else g[name]
        assert float(jnp.abs(leaf).sum()) > 0, f"zero grad for {name}"


def test_top2_saturated_router_picks_distinct_experts():
    """A saturated softmax (logit gap > ~88 in fp32) zeroes every non-top
    prob; selection must still pick two DISTINCT experts (regression: the
    old prob-zeroing loop re-selected the winner, dispatching the token
    twice into one expert with weight 2)."""
    from clover_tpu.parallel.moe import moe_dispatch

    logits = jnp.asarray([[200.0, 0.0, -5.0, -5.0],
                          [0.0, 300.0, 1.0, -2.0]], jnp.float32)
    dispatch, combine, aux = moe_dispatch(logits, top_k=2, capacity=2)
    per_expert = np.asarray(dispatch.sum(axis=-1))      # (T, E) 0/1
    assert per_expert.max() <= 1.0                      # no double pick
    assert (per_expert.sum(axis=-1) == 2).all()         # two experts each
    # token 0: winner expert 0, runner-up expert 1; winner keeps all
    # gate mass (runner-up prob underflowed to 0)
    assert per_expert[0, 0] == 1.0 and per_expert[0, 1] == 1.0
    assert per_expert[0, 2] == 0.0 and per_expert[0, 3] == 0.0
    g = np.asarray(combine.sum(axis=-1))
    np.testing.assert_allclose(g[0, 0], 1.0, atol=1e-6)
    assert np.isfinite(float(aux))
