"""Production-shape parity (VERDICT r1 item 9): the HF-derived parts of
the fusion tower at hidden=768, and a converter rehearsal on a synthetic
full-size 2D Swin-B state dict — so real-weight conversion is de-risked
before weights ever show up.

Reference: cross_transformer.py:24-29 (fusion reuses pretrained BERT
embeddings + first 3 encoder layers), swin_transformer_3d.py:130-181
(2D->3D inflation rules).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from clover_tpu.models.bert import (  # noqa: E402
    BertConfig,
    BertEmbeddings,
    BertEncoder,
    extend_attention_mask,
)
from clover_tpu.models.convert import (  # noqa: E402
    convert_bert_embeddings,
    convert_bert_encoder,
    convert_swin3d,
    inflate_swin2d,
)
from clover_tpu.models.swin3d import SwinConfig, SwinTransformer3D  # noqa: E402

HIDDEN, HEADS, INTER, LAYERS = 768, 12, 3072, 3


@pytest.fixture(scope="module")
def hf_fusion_bert():
    """Random-weight HF BertModel at the fusion tower's production shape
    (hidden 768, 12 heads, the first 3 layers of bert-base-uncased)."""
    cfg = transformers.BertConfig(
        vocab_size=30522, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=512, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(7)
    m = transformers.BertModel(cfg, add_pooling_layer=False)
    m.eval()
    return m


@pytest.mark.slow
def test_fusion_encoder_parity_768(hf_fusion_bert):
    """The 3-layer 768-wide encoder (the part the fusion tower reuses from
    pretrained BERT) on a fused-length sequence (49 visual + 11 text = 60
    tokens) with padding: flax vs HF to fp32 tolerance."""
    B, S = 2, 60
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, S, HIDDEN)).astype(np.float32) * 0.5
    mask = np.ones((B, S), dtype=np.int64)
    mask[1, 50:] = 0  # padded text tail

    ext = hf_fusion_bert.get_extended_attention_mask(
        torch.tensor(mask), (B, S))
    with torch.no_grad():
        ref = hf_fusion_bert.encoder(
            torch.tensor(x), attention_mask=ext).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in hf_fusion_bert.state_dict().items()}
    params = convert_bert_encoder(sd, "encoder", LAYERS)
    cfg = BertConfig(hidden_size=HIDDEN, num_hidden_layers=LAYERS,
                     num_attention_heads=HEADS, intermediate_size=INTER,
                     hidden_dropout=0.0, attention_dropout=0.0)
    bias = extend_attention_mask(jnp.asarray(mask), jnp.float32)
    out = BertEncoder(cfg, dtype=jnp.float32).apply(
        {"params": params}, jnp.asarray(x), bias, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_fusion_embeddings_parity_768(hf_fusion_bert):
    """BERT embeddings at full vocab/width — the text half of the fusion
    input (cross_transformer.py:26, embeddings reused verbatim)."""
    ids = np.array([[101, 2023, 2003, 1037, 3231, 102, 0, 0],
                    [101, 7592, 2088, 102, 0, 0, 0, 0]])
    with torch.no_grad():
        ref = hf_fusion_bert.embeddings(torch.tensor(ids)).numpy()
    sd = {k: v.numpy() for k, v in hf_fusion_bert.state_dict().items()}
    params = convert_bert_embeddings(sd, "embeddings")
    cfg = BertConfig(hidden_size=HIDDEN, num_hidden_layers=LAYERS,
                     num_attention_heads=HEADS, intermediate_size=INTER,
                     hidden_dropout=0.0, attention_dropout=0.0)
    out = BertEmbeddings(cfg, dtype=jnp.float32).apply(
        {"params": params}, jnp.asarray(ids), deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


# ------------------------------------------------- Swin-B converter census


def _synthetic_swin2d_base_sd():
    """Torch-style 2D Swin-B state dict at production shapes
    (swin_base_patch244_window877's image ancestor: embed 128, depths
    (2,2,18,2), heads (4,8,16,32), window 7, patch 4)."""
    rng = np.random.default_rng(0)

    def t(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.02

    sd = {
        "patch_embed.proj.weight": t(128, 3, 4, 4),
        "patch_embed.proj.bias": t(128),
        "patch_embed.norm.weight": t(128),
        "patch_embed.norm.bias": t(128),
        "norm.weight": t(1024),
        "norm.bias": t(1024),
    }
    depths = (2, 2, 18, 2)
    heads = (4, 8, 16, 32)
    for s, (depth, nh) in enumerate(zip(depths, heads)):
        C = 128 * 2 ** s
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}"
            sd[f"{p}.norm1.weight"] = t(C)
            sd[f"{p}.norm1.bias"] = t(C)
            sd[f"{p}.norm2.weight"] = t(C)
            sd[f"{p}.norm2.bias"] = t(C)
            sd[f"{p}.attn.qkv.weight"] = t(3 * C, C)
            sd[f"{p}.attn.qkv.bias"] = t(3 * C)
            sd[f"{p}.attn.proj.weight"] = t(C, C)
            sd[f"{p}.attn.proj.bias"] = t(C)
            sd[f"{p}.attn.relative_position_bias_table"] = t(13 * 13, nh)
            sd[f"{p}.attn.relative_position_index"] = np.zeros((49, 49), np.int64)
            sd[f"{p}.mlp.fc1.weight"] = t(4 * C, C)
            sd[f"{p}.mlp.fc1.bias"] = t(4 * C)
            sd[f"{p}.mlp.fc2.weight"] = t(C, 4 * C)
            sd[f"{p}.mlp.fc2.bias"] = t(C)
        if s < 3:
            sd[f"layers.{s}.downsample.norm.weight"] = t(4 * C)
            sd[f"layers.{s}.downsample.norm.bias"] = t(4 * C)
            sd[f"layers.{s}.downsample.reduction.weight"] = t(2 * C, 4 * C)
    return sd


@pytest.mark.slow
def test_swin_b_converter_rehearsal_shape_census():
    """Full-size dry run: inflate a synthetic 2D Swin-B checkpoint with the
    reference rules (center-repeat conv / pd, rel-pos table tiled
    (2wd-1)x), convert to our param tree, and census every leaf shape
    against the model's own init shapes (via eval_shape — no compute)."""
    sd2d = _synthetic_swin2d_base_sd()
    # reference inflation: temporal patch 2, temporal window 8
    sd3d = inflate_swin2d(sd2d, temporal_patch=2, temporal_window=8)
    # conv inflation: center-repeat / pd keeps the mean response
    w2 = sd2d["patch_embed.proj.weight"]
    w3 = sd3d["patch_embed.proj.weight"]
    assert w3.shape == (128, 3, 2, 4, 4)
    np.testing.assert_allclose(w3.sum(axis=2), w2, rtol=1e-6)
    # rel-pos table tiled (2*8-1) = 15x along rows
    assert sd3d["layers.0.blocks.0.attn.relative_position_bias_table"].shape \
        == (15 * 13 * 13, 4)
    assert "layers.0.blocks.0.attn.relative_position_index" not in sd3d

    converted = convert_swin3d(sd3d, depths=(2, 2, 18, 2), prefix="")

    # param shapes are input-size independent; init on a tiny clip
    model = SwinTransformer3D(SwinConfig.base(), dtype=jnp.float32)
    video = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), video)
    want = jax.tree_util.tree_map(lambda l: l.shape, variables["params"])

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, key))
            else:
                out[key] = tuple(np.asarray(v).shape) if not isinstance(
                    v, tuple) else v
        return out

    got = flatten(jax.tree_util.tree_map(np.asarray, converted))
    expect = flatten(want)
    missing = sorted(set(expect) - set(got))
    extra = sorted(set(got) - set(expect))
    assert not extra, f"converter produced unknown params: {extra[:5]}"
    # an image checkpoint has no SimMIM mask token; everything else must map
    assert all("mask_token" in m for m in missing), missing
    for k in got:
        assert got[k] == expect[k], (k, got[k], expect[k])
