"""Tensor-parallel param shardings: numerics unchanged under a model axis."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from clover_tpu.models.bert import BertConfig, BertTextEncoder
from clover_tpu.parallel.mesh import make_mesh
from clover_tpu.parallel.sharding import tp_param_shardings


def test_tp_sharded_bert_matches_replicated():
    assert len(jax.devices()) == 8
    mesh = make_mesh(axis_sizes=(2, 4), axis_names=("data", "model"))

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     hidden_dropout=0.0, attention_dropout=0.0)
    model = BertTextEncoder(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 64, size=(8, 10)))
    mask = jnp.ones((8, 10), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
    ref = model.apply({"params": params}, ids, mask)

    shardings = tp_param_shardings(params, mesh, axis="model")
    # sanity: column/row kernels actually got split
    enc = shardings["encoder"]["layer_0"]
    assert enc["attention"]["query"]["kernel"].spec == P(None, "model")
    assert enc["attention_output"]["kernel"].spec == P("model", None)
    assert enc["intermediate"]["kernel"].spec == P(None, "model")
    assert enc["output"]["kernel"].spec == P("model", None)

    params_tp = jax.tree_util.tree_map(jax.device_put, params, shardings)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda p, i, m: model.apply({"params": p}, i, m))(
        params_tp, ids_sh, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
