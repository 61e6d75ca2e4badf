"""Collective gradient semantics on the 8-device virtual CPU mesh.

Pins the critical property (SURVEY.md §7.3 #1): a contrastive loss over
globally gathered embeddings must produce the same gradients whether run
on 1 device or sharded over 8 — i.e. jax's all_gather VJP implements the
reference GatherLoss rule (gather forward, slice-local-shard backward,
gather_loss.py:5-23) plus the DDP gradient sum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clover_tpu.losses import exclusive_nce_with_ranking, norm_softmax_loss
from clover_tpu.parallel import all_gather_with_grad, make_mesh, shard_batch_pytree


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests need the 8-device virtual CPU platform"
    return make_mesh()


def _loss_fn(params, v, t):
    # projection params so gradients flow through a "model" (a plain scale
    # would have zero grad through the normalization)
    return norm_softmax_loss(v @ params["wv"], t @ params["wt"], temperature=0.1)


def test_global_nce_grad_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    B, D = 16, 8
    v = rng.normal(size=(B, D)).astype(np.float32)
    t = rng.normal(size=(B, D)).astype(np.float32)
    params = {
        "wv": jnp.asarray(rng.normal(size=(D, D)).astype(np.float32)) * 0.3,
        "wt": jnp.asarray(rng.normal(size=(D, D)).astype(np.float32)) * 0.3,
    }

    # single device reference
    g_ref = jax.grad(_loss_fn)(params, jnp.asarray(v), jnp.asarray(t))

    # pjit/GSPMD: batch sharded over 'data', loss computed globally
    sharding = NamedSharding(mesh, P("data"))
    v_sh = jax.device_put(jnp.asarray(v), sharding)
    t_sh = jax.device_put(jnp.asarray(t), sharding)
    g_pjit = jax.jit(jax.grad(_loss_fn))(params, v_sh, t_sh)

    np.testing.assert_allclose(g_pjit["wv"], g_ref["wv"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(g_pjit["wt"], g_ref["wt"], rtol=1e-4, atol=1e-6)


def test_shard_map_sharded_loss_grad_matches(mesh):
    """Explicit shard_map path: local-query contributions + psum.

    Under shard_map, cotangents of replicated params are psum'd over the
    mesh axis, so the loss must be written as a sum of per-device
    contributions (norm_softmax_loss_sharded) — gather-then-full-loss would
    over-count by the axis size.
    """
    from clover_tpu.losses.contrastive import norm_softmax_loss_sharded

    rng = np.random.default_rng(1)
    B, D = 16, 8
    v = rng.normal(size=(B, D)).astype(np.float32)
    t = rng.normal(size=(B, D)).astype(np.float32)
    params = {
        "wv": jnp.asarray(rng.normal(size=(D, D)).astype(np.float32)) * 0.3,
        "wt": jnp.asarray(rng.normal(size=(D, D)).astype(np.float32)) * 0.3,
    }

    def ref_loss(p, v, t):
        return norm_softmax_loss(v @ p["wv"], t @ p["wt"], temperature=0.1)

    ref_val = ref_loss(params, jnp.asarray(v), jnp.asarray(t))
    g_ref = jax.grad(ref_loss)(params, jnp.asarray(v), jnp.asarray(t))

    def local_loss(p, vl, tl):
        return norm_softmax_loss_sharded(vl @ p["wv"], tl @ p["wt"], "data",
                                         temperature=0.1)

    sharded = jax.shard_map(
        jax.value_and_grad(local_loss),
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()),
    )
    val, g_sm = jax.jit(sharded)(params, jnp.asarray(v), jnp.asarray(t))

    np.testing.assert_allclose(val, ref_val, rtol=1e-5)
    np.testing.assert_allclose(g_sm["wv"], g_ref["wv"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(g_sm["wt"], g_ref["wt"], rtol=1e-4, atol=1e-6)


def test_varied_sharded_loss_matches_compact_reference(mesh):
    """Ragged per-device batches (reference VariedShapeGatherLoss,
    gather_loss.py:25-70): the padded+masked sharded loss must equal the
    single-device loss over the compacted valid rows — value AND grads,
    with exactly zero gradient on padding rows."""
    from clover_tpu.losses.contrastive import norm_softmax_loss_sharded_varied

    rng = np.random.default_rng(3)
    world, max_n, D = 8, 3, 8
    counts = np.array([3, 1, 2, 3, 2, 1, 3, 2], np.int32)
    v_pad = rng.normal(size=(world * max_n, D)).astype(np.float32)
    t_pad = rng.normal(size=(world * max_n, D)).astype(np.float32)
    valid = (np.arange(max_n)[None, :] < counts[:, None]).reshape(-1)
    params = {
        "wv": jnp.asarray(rng.normal(size=(D, D)).astype(np.float32)) * 0.3,
        "wt": jnp.asarray(rng.normal(size=(D, D)).astype(np.float32)) * 0.3,
    }

    def ref_loss(p, v, t):
        return norm_softmax_loss(v @ p["wv"], t @ p["wt"], temperature=0.1,
                                 cos_sim=True)

    ref_val = ref_loss(params, jnp.asarray(v_pad[valid]), jnp.asarray(t_pad[valid]))
    g_ref = jax.grad(ref_loss)(params, jnp.asarray(v_pad[valid]),
                               jnp.asarray(t_pad[valid]))

    def local_loss(p, vl, tl, n):
        return norm_softmax_loss_sharded_varied(
            vl @ p["wv"], tl @ p["wt"], n[0], "data", temperature=0.1)

    sharded = jax.shard_map(
        jax.value_and_grad(local_loss, argnums=(0, 1)),
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=(P(), (P(), P("data"))),
    )
    val, (g_sm, g_v) = jax.jit(sharded)(
        params, jnp.asarray(v_pad), jnp.asarray(t_pad), jnp.asarray(counts))

    np.testing.assert_allclose(val, ref_val, rtol=1e-5)
    np.testing.assert_allclose(g_sm["wv"], g_ref["wv"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(g_sm["wt"], g_ref["wt"], rtol=1e-4, atol=1e-6)
    # padding rows must receive exactly zero input gradient
    g_v = np.asarray(g_v)
    assert np.all(g_v[~valid] == 0.0)
    assert np.any(g_v[valid] != 0.0)


def test_exclusive_nce_under_pjit(mesh):
    rng = np.random.default_rng(2)
    B, D = 16, 8
    embs = [rng.normal(size=(B, D)).astype(np.float32) for _ in range(4)]

    def loss(w, v, t, tm, tr):
        out = exclusive_nce_with_ranking(v @ w, t, tm, tr)
        return out["nce_loss"] + out["rank_t_tm_loss"]

    w = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32)) * 0.3
    ref_val = loss(w, *map(jnp.asarray, embs))
    ref_grad = jax.grad(loss)(w, *map(jnp.asarray, embs))

    sharding = NamedSharding(mesh, P("data"))
    shs = [jax.device_put(jnp.asarray(e), sharding) for e in embs]
    val = jax.jit(loss)(w, *shs)
    grad = jax.jit(jax.grad(loss))(w, *shs)

    np.testing.assert_allclose(val, ref_val, rtol=1e-5)
    np.testing.assert_allclose(grad, ref_grad, rtol=1e-4, atol=1e-6)


def test_shard_batch_pytree(mesh):
    batch = {"a": np.zeros((16, 4), np.float32), "b": np.zeros((16,), np.int32)}
    out = shard_batch_pytree(batch, mesh)
    assert out["a"].sharding.spec[0] == "data"
    assert out["b"].sharding.spec[0] == "data"
