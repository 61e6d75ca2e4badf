"""Golden parity: flax BertTextEncoder vs HuggingFace torch BertModel.

The reference text tower is HF BertModel (bert_from_hugface.py:7-32). We
construct a small random-weight HF model offline, convert its state dict,
and require the flax tower to match to float32 tolerance — this pins the
architecture (post-LN order, gelu variant, mask semantics, position offset)
exactly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from clover_tpu.models.bert import BertConfig, BertTextEncoder  # noqa: E402
from clover_tpu.models.convert import convert_hf_bert, convert_mlm_head  # noqa: E402


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.BertConfig(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(hf_cfg, add_pooling_layer=False)
    model.eval()
    return model


@pytest.fixture(scope="module")
def flax_cfg():
    return BertConfig(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        hidden_dropout=0.0,
        attention_dropout=0.0,
    )


def test_bert_forward_parity(hf_model, flax_cfg):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, size=(3, 11))
    mask = np.ones((3, 11), dtype=np.int64)
    mask[0, 8:] = 0
    mask[2, 5:] = 0

    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert_hf_bert(sd, num_layers=2)
    model = BertTextEncoder(flax_cfg, dtype=jnp.float32)
    out = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask),
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_bert_parity_with_token_types(hf_model, flax_cfg):
    ids = np.arange(24).reshape(2, 12) % 100
    mask = np.ones((2, 12), dtype=np.int64)
    tt = np.zeros((2, 12), dtype=np.int64)
    tt[:, 6:] = 1
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tt),
        ).last_hidden_state.numpy()
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert_hf_bert(sd, num_layers=2)
    out = BertTextEncoder(flax_cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(tt), deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_mlm_head_parity(flax_cfg):
    hf_cfg = transformers.BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(1)
    mlm = transformers.BertForMaskedLM(hf_cfg)
    mlm.eval()
    x = np.random.default_rng(1).normal(size=(2, 7, 32)).astype(np.float32)
    with torch.no_grad():
        ref = mlm.cls(torch.tensor(x)).numpy()

    from clover_tpu.models.heads import MLMHead

    sd = {k: v.numpy() for k, v in mlm.state_dict().items()}
    params = convert_mlm_head(sd)
    out = MLMHead(flax_cfg).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)
