"""End-to-end model graph tests at tiny scale (CPU).

Covers: fusion output slicing, CloverPretrain full train graph + losses,
CloverFinetune retrieval/QA paths, multi-clip pooling, candidate expansion.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clover_tpu.losses.objectives import (
    PretrainLossConfig,
    pretrain_losses,
    qa_loss,
    retrieval_loss,
    total_loss,
)
from clover_tpu.models import (
    BertConfig,
    CloverFinetune,
    CloverPretrain,
    CrossModalTransformer,
    FinetuneConfig,
    FusionConfig,
    PretrainConfig,
    SwinConfig,
)

TINY_BERT = BertConfig(
    vocab_size=64, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=32, max_position_embeddings=64,
    hidden_dropout=0.0, attention_dropout=0.0)
TINY_SWIN = SwinConfig(
    patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8, depths=(1, 1),
    num_heads=(2, 2), window_size=(2, 2, 2), drop_path_rate=0.0,
    mask_token=True)
# swin out: C = 16, spatial 2x2 after one merge (16/4/2), T = 4/2 = 2
TINY_FUSION = FusionConfig(
    bert=TINY_BERT, img_in_size=16, hidden_size=16, num_frames=2,
    spatial_tokens=4)


def _pretrain_batch(rng, B=2, T=4, S=10):
    token_ids = rng.integers(4, 64, size=(B, S))
    mlm_label = np.full((B, S), -100)
    mlm_label[:, 2] = token_ids[:, 2].copy()
    token_ids[:, 2] = 3  # pretend-mask token id
    return {
        "imgs": rng.normal(size=(B, T, 16, 16, 3)).astype(np.float32),
        "token_ids": token_ids,
        "input_mask": np.ones((B, S), np.int32),
        "mlm_label": mlm_label,
        "v_token_mask": rng.integers(0, 2, size=(B, 2, 2)),
    }


@pytest.fixture(scope="module")
def np_rng():
    return np.random.default_rng(0)


def test_fusion_output_slicing(np_rng):
    model = CrossModalTransformer(TINY_FUSION)
    vis = jnp.asarray(np_rng.normal(size=(2, 2, 4, 16)).astype(np.float32))
    ids = jnp.asarray(np_rng.integers(0, 64, size=(2, 6)))
    mask = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), vis, mask, ids)["params"]
    out = model.apply({"params": params}, vis, mask, ids)
    assert out["last_hidden_state"].shape == (2, 8 + 6, 16)
    assert out["t_last_hidden_state"].shape == (2, 6, 16)
    assert out["v_last_hidden_state"].shape == (2, 8, 16)
    assert "cls_last_hidden_state" not in out  # use_text_cls=True

    # with all-CLS token
    cfg = FusionConfig(bert=TINY_BERT, img_in_size=16, hidden_size=16,
                       num_frames=2, spatial_tokens=4, use_text_cls=False)
    m2 = CrossModalTransformer(cfg)
    p2 = m2.init(jax.random.PRNGKey(0), vis, mask, ids)["params"]
    out2 = m2.apply({"params": p2}, vis, mask, ids)
    assert out2["last_hidden_state"].shape == (2, 8 + 1 + 6, 16)
    assert out2["cls_last_hidden_state"].shape == (2, 1, 16)
    assert out2["v_last_hidden_state"].shape == (2, 8, 16)


def test_fusion_candidate_reshape(np_rng):
    """text batch = B*n -> reshaped to (B, n*seq) (milnce path)."""
    model = CrossModalTransformer(TINY_FUSION)
    vis = jnp.asarray(np_rng.normal(size=(2, 2, 4, 16)).astype(np.float32))
    ids = jnp.asarray(np_rng.integers(0, 64, size=(6, 5)))  # 3 candidates each
    mask = jnp.ones((6, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), vis, mask, ids)["params"]
    out = model.apply({"params": params}, vis, mask, ids)
    assert out["t_last_hidden_state"].shape == (2, 15, 16)


def test_fusion_forward_text(np_rng):
    model = CrossModalTransformer(TINY_FUSION)
    vis = jnp.asarray(np_rng.normal(size=(1, 2, 4, 16)).astype(np.float32))
    ids = jnp.asarray(np_rng.integers(0, 64, size=(1, 6)))
    mask = jnp.ones((1, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), vis, mask, ids)["params"]
    out = model.apply({"params": params}, ids, mask, method="forward_text")
    assert out.shape == (1, 6, 16)


@pytest.fixture(scope="module")
def pretrain_setup(np_rng):
    cfg = PretrainConfig(
        swin=TINY_SWIN, text_bert=TINY_BERT, fusion=TINY_FUSION,
        vts_embed_dim=16)
    model = CloverPretrain(cfg)
    batch = _pretrain_batch(np_rng)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.PRNGKey(0), batch, train=False)["params"]
    return cfg, model, params, batch


def test_pretrain_forward_outputs(pretrain_setup):
    cfg, model, params, batch = pretrain_setup
    out = model.apply({"params": params}, batch, train=False)
    expected_keys = {
        "visual_emb", "text_emb", "mlm_logits", "mask_visual_recon_emb",
        "mask_word_emb", "mask_word_recon_emb", "mask_visual_emb"}
    assert expected_keys <= set(out)
    assert out["visual_emb"].shape == (2, 16)
    assert out["mlm_logits"].shape == (2, 10, 64)
    for k, v in out.items():
        assert np.all(np.isfinite(np.asarray(v))), k


def test_pretrain_losses_finite_and_keyed(pretrain_setup):
    cfg, model, params, batch = pretrain_setup
    out = model.apply({"params": params}, batch, train=False)
    losses = pretrain_losses(out, batch["mlm_label"])
    assert set(losses) == {
        "mlm_loss", "nce_loss", "rank_t_tm_loss", "v_nce_loss", "rank_v_vm_loss"}
    tot = float(total_loss(losses))
    assert np.isfinite(tot) and tot > 0


@pytest.mark.slow
def test_pretrain_grads_flow(pretrain_setup):
    cfg, model, params, batch = pretrain_setup

    def loss_fn(p):
        out = model.apply({"params": p}, batch, train=False)
        return total_loss(pretrain_losses(out, batch["mlm_label"]))

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = sum(bool(np.any(np.asarray(g) != 0)) for _, g in flat)
    # nearly all params should receive gradient (pos tables for unused
    # positions etc. may be 0)
    assert nonzero / len(flat) > 0.9


def test_pretrain_forward_test_multiclip(pretrain_setup):
    cfg, model, params, _ = pretrain_setup
    rng = np.random.default_rng(1)
    # 2 texts, 2 clips each -> imgs (2, 2, T, H, W, 3)
    imgs = jnp.asarray(rng.normal(size=(2, 2, 4, 16, 16, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(4, 64, size=(2, 10)))
    mask = jnp.ones((2, 10), jnp.int32)
    v, t = model.apply({"params": params}, imgs, ids, mask,
                       method="forward_test")
    assert v.shape == (2, 16) and t.shape == (2, 16)


@pytest.fixture(scope="module")
def finetune_retrieval_setup(np_rng):
    cfg = FinetuneConfig(swin=dataclasses_replace_no_mask(), text_bert=TINY_BERT,
                         fusion=TINY_FUSION, task="retrieval", vts_embed_dim=16)
    model = CloverFinetune(cfg)
    batch = {
        "imgs": jnp.asarray(
            np_rng.normal(size=(2, 1, 4, 16, 16, 3)).astype(np.float32)),
        "token_ids": jnp.asarray(np_rng.integers(4, 64, size=(2, 1, 10))),
        "input_mask": jnp.ones((2, 1, 10), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch, train=False)["params"]
    return model, params, batch


def dataclasses_replace_no_mask():
    import dataclasses

    return dataclasses.replace(TINY_SWIN, mask_token=False)


def test_finetune_retrieval(finetune_retrieval_setup):
    model, params, batch = finetune_retrieval_setup
    v, t = model.apply({"params": params}, batch, train=False)
    assert v.shape == (2, 16) and t.shape == (2, 16)
    l = retrieval_loss(v, t)
    assert np.isfinite(float(l["retrieval_nce_loss"]))


def test_finetune_qa_mc(np_rng):
    cfg = FinetuneConfig(
        swin=dataclasses_replace_no_mask(), text_bert=TINY_BERT,
        fusion=TINY_FUSION, task="video_qa", answer_cls=True, qa_head="mc")
    model = CloverFinetune(cfg)
    B, n_choices = 2, 3
    batch = {
        "imgs": jnp.asarray(
            np_rng.normal(size=(B, 1, 4, 16, 16, 3)).astype(np.float32)),
        "token_ids": jnp.asarray(np_rng.integers(4, 64, size=(B, n_choices, 8))),
        "input_mask": jnp.ones((B, n_choices, 8), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch, train=False)["params"]
    logits = model.apply({"params": params}, batch, train=False)
    assert logits.shape == (B, n_choices)
    labels = jnp.asarray([0, 2])
    l = qa_loss(logits, labels)
    assert np.isfinite(float(l["qa_loss"]))


def test_finetune_qa_oe_with_answer_mask(np_rng):
    cfg = FinetuneConfig(
        swin=dataclasses_replace_no_mask(), text_bert=TINY_BERT,
        fusion=TINY_FUSION, task="video_qa", answer_mask=True, qa_head="oe",
        num_labels=12)
    model = CloverFinetune(cfg)
    B = 2
    ids = np_rng.integers(4, 64, size=(B, 1, 8))
    ids[:, 0, 4] = 103  # one [MASK] per sample
    batch = {
        "imgs": jnp.asarray(
            np_rng.normal(size=(B, 1, 4, 16, 16, 3)).astype(np.float32)),
        "token_ids": jnp.asarray(ids),
        "input_mask": jnp.ones((B, 1, 8), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch, train=False)["params"]
    logits = model.apply({"params": params}, batch, train=False)
    assert logits.shape == (B, 12)


def test_pretrain_batched_passes_match_sequential(pretrain_setup):
    """batch_passes=True (one 2B Swin/BERT/fusion call each) must be
    numerically identical to the reference-shaped sequential graph."""
    import dataclasses

    cfg, model, params, batch = pretrain_setup
    seq_model = CloverPretrain(dataclasses.replace(cfg, batch_passes=False))
    out_b = model.apply({"params": params}, batch, train=False)
    out_s = seq_model.apply({"params": params}, batch, train=False)
    assert set(out_b) == set(out_s)
    for k in out_s:
        np.testing.assert_allclose(
            np.asarray(out_b[k]), np.asarray(out_s[k]),
            rtol=2e-5, atol=2e-5, err_msg=k)


def test_pretrain_shared_embed_matches_unshared(pretrain_setup):
    """share_embed=True (patch embed once on B, encode on 2B) must be exact
    vs the 2B-embed path — the passes share pixels until the mask mixing."""
    import dataclasses

    cfg, model, params, batch = pretrain_setup
    unshared = CloverPretrain(dataclasses.replace(cfg, share_embed=False))
    out_shared = model.apply({"params": params}, batch, train=False)
    out_unshared = unshared.apply({"params": params}, batch, train=False)
    assert set(out_shared) == set(out_unshared)
    for k in out_unshared:
        np.testing.assert_allclose(
            np.asarray(out_shared[k]), np.asarray(out_unshared[k]),
            rtol=1e-6, atol=1e-6, err_msg=k)
    # init with the shared path yields the identical param tree
    p2 = model.init(jax.random.PRNGKey(0), batch, train=False)["params"]
    assert (jax.tree_util.tree_structure(p2)
            == jax.tree_util.tree_structure(params))
