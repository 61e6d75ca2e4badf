"""Pipeline parallelism (GPipe over a 'pp' mesh axis): forward and grad
parity vs the sequential layer stack, incl. the pipelined BERT tower."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clover_tpu.parallel.mesh import make_mesh
from clover_tpu.parallel.pipeline import (
    pipelined_layer_stack,
    pipelined_text_encoder,
    stack_stage_params,
)


@pytest.fixture(scope="module")
def pp_mesh():
    assert len(jax.devices()) == 8
    return make_mesh(axis_sizes=(4,), axis_names=("pp",),
                     devices=jax.devices()[:4])


def _toy_layers(rng, L, D):
    """L tiny residual MLP layers with distinct params."""
    return [
        {"w": jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.3),
         "b": jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1)}
        for _ in range(L)
    ]


def _layer_apply(lp, x):
    return x + jnp.tanh(x @ lp["w"] + lp["b"])


def _sequential(layers, x):
    for lp in layers:
        x = _layer_apply(lp, x)
    return x


@pytest.mark.parametrize("n_microbatches", [None, 8])
def test_pipeline_matches_sequential(pp_mesh, rng, n_microbatches):
    L, D, B = 8, 16, 8
    layers = _toy_layers(rng, L, D)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    out = jax.jit(lambda ls, xx: pipelined_layer_stack(
        _layer_apply, ls, xx, pp_mesh, n_microbatches=n_microbatches)
    )(layers, x)
    ref = _sequential(layers, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match_sequential(pp_mesh, rng):
    """The GPipe scan/ppermute schedule must transpose to exact grads —
    incl. the bubble masking (garbage ticks contribute zero gradient)."""
    L, D, B = 4, 8, 8
    layers = _toy_layers(rng, L, D)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    def loss_pp(layers, x):
        out = pipelined_layer_stack(_layer_apply, layers, x, pp_mesh)
        return jnp.mean((out - t) ** 2)

    def loss_seq(layers, x):
        return jnp.mean((_sequential(layers, x) - t) ** 2)

    from jax.flatten_util import ravel_pytree

    gl_pp, gx_pp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(layers, x)
    gl_sq, gx_sq = jax.grad(loss_seq, argnums=(0, 1))(layers, x)
    fp, _ = ravel_pytree(gl_pp)
    fs, _ = ravel_pytree(gl_sq)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fs),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_pp), np.asarray(gx_sq),
                               atol=1e-5, rtol=1e-4)


def test_stack_stage_params_order():
    layers = [{"w": jnp.full((2,), float(i))} for i in range(8)]
    stages = stack_stage_params(layers, 4)
    assert stages["w"].shape == (4, 2, 2)
    np.testing.assert_array_equal(
        np.asarray(stages["w"][1, 1]), np.full((2,), 3.0))
    with pytest.raises(ValueError):
        stack_stage_params(layers[:6], 4)


def test_pipelined_bert_matches_sequential(pp_mesh, rng):
    """Full BERT tower: pipelined encoder == BertTextEncoder, with a real
    padded attention mask riding the microbatches."""
    from clover_tpu.models.bert import BertConfig, BertTextEncoder

    cfg = BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=4,
                     num_attention_heads=2, intermediate_size=64,
                     hidden_dropout=0.0, attention_dropout=0.0)
    model = BertTextEncoder(cfg)
    B, S = 8, 12
    ids = jnp.asarray(rng.integers(0, 128, size=(B, S)), jnp.int32)
    mask = np.ones((B, S), np.int32)
    mask[:, 9:] = 0          # padded tail exercises the bias pass-through
    mask = jnp.asarray(mask)
    variables = model.init(jax.random.PRNGKey(0), ids, mask)
    ref = model.apply(variables, ids, mask)
    out = jax.jit(lambda v, i, m: pipelined_text_encoder(
        v, cfg, i, m, pp_mesh, n_microbatches=4))(variables, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
