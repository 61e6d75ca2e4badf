"""Full-fusion ITM retrieval eval (reference non-separate forward_test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clover_tpu.data.datasets import make_synthetic_retrieval_dataset
from clover_tpu.data.loader import DataLoader
from clover_tpu.engine.eval_loop import run_itm_retrieval_eval
from clover_tpu.engine.steps import make_itm_embed_step, make_itm_score_step
from clover_tpu.evaluation.metrics import itm_t2v_recall
from clover_tpu.models import (
    BertConfig,
    CloverFinetune,
    FinetuneConfig,
    FusionConfig,
    SwinConfig,
)
from clover_tpu.ops.preprocess import eval_preprocess


def test_itm_t2v_recall_golden():
    # text 0 ranks its video first; text 1 ranks its video third
    scores = np.array([
        [0.9, 0.1, 0.2],
        [0.8, 0.3, 0.5],
        [0.1, 0.2, 0.9],
    ])
    m = itm_t2v_recall(scores)
    assert m["Recall@1"] == pytest.approx(200.0 / 3)
    assert m["Recall@5"] == 100.0
    assert m["MR"] == 1.0
    assert m["Recall@all"] == pytest.approx(m["Recall@1"] + 200.0 - 1.0)
    # explicit gt_video column
    m2 = itm_t2v_recall(scores, gt_video=np.array([0, 0, 2]))
    assert m2["Recall@1"] == 100.0


@pytest.fixture(scope="module")
def itm_model_setup():
    vocab = make_synthetic_retrieval_dataset(n_videos=2).tokenizer.vocab
    bert = BertConfig(vocab_size=len(vocab), hidden_size=16,
                      num_hidden_layers=1, num_attention_heads=2,
                      intermediate_size=32, hidden_dropout=0.0,
                      attention_dropout=0.0)
    swin = SwinConfig(patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8,
                      depths=(1, 1), num_heads=(2, 2), window_size=(2, 2, 2),
                      drop_path_rate=0.0)
    fus = FusionConfig(bert=bert, img_in_size=16, hidden_size=16,
                       num_frames=2, spatial_tokens=16)
    model = CloverFinetune(FinetuneConfig(
        swin=swin, text_bert=bert, fusion=fus, task="retrieval",
        vts_embed_dim=16, use_itm_head=True))

    test_ds = make_synthetic_retrieval_dataset(
        n_videos=5, test_mode=True, num_frames=4, test_canonical_size=40)
    sample = test_ds[0]
    imgs = eval_preprocess(jnp.asarray(sample["imgs"]), out_size=32,
                           dtype=jnp.float32)

    def _init_all(m, imgs, ids, mask):
        tokens = m.encode_visual(imgs, ids.shape[0])
        return m.forward_test(imgs, ids, mask), m.itm_pair_score(
            tokens, ids, mask)

    params = model.init(
        jax.random.PRNGKey(0), imgs[None],
        jnp.asarray(sample["token_ids"])[None],
        jnp.asarray(sample["input_mask"])[None],
        method=_init_all)["params"]
    assert "itm_head" in params
    assert "multimodal_backbone" in params
    return model, params, test_ds


def test_itm_retrieval_eval_loop(itm_model_setup):
    model, params, test_ds = itm_model_setup
    loader = DataLoader(test_ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=0)
    metrics = run_itm_retrieval_eval(
        make_itm_embed_step(model), make_itm_score_step(model),
        params, test_ds, loader.epoch(0), out_size=32, dtype=jnp.float32,
        pair_batch=8)
    assert set(metrics) >= {"Recall@1", "Recall@5", "Recall@10", "MR",
                            "Recall@all"}
    assert 0 <= metrics["Recall@1"] <= 100


def test_itm_retrieval_topk_matches_full_on_small_set(itm_model_setup):
    model, params, test_ds = itm_model_setup
    loader = DataLoader(test_ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=0)
    full = run_itm_retrieval_eval(
        make_itm_embed_step(model), make_itm_score_step(model),
        params, test_ds, loader.epoch(0), out_size=32, dtype=jnp.float32,
        pair_batch=8)
    topk = run_itm_retrieval_eval(
        make_itm_embed_step(model), make_itm_score_step(model),
        params, test_ds, loader.epoch(0), out_size=32, dtype=jnp.float32,
        top_k=5, pair_batch=8)   # top_k >= n_video -> identical pair set
    assert topk == full


def test_mc_retrieval_eval_loop():
    """run_mc_retrieval_eval end-to-end on a synthetic MC dataset: 5
    candidates per video scored by tower similarity -> {'acc'} (the eval
    tools/train.py wires for finetune_msrvtt_mc's val split)."""
    from clover_tpu.data import BertTokenizer, build_test_vocab
    from clover_tpu.data.datasets import MCRetrievalDataset
    from clover_tpu.engine.eval_loop import run_mc_retrieval_eval
    from clover_tpu.engine.steps import make_embed_eval_step

    tok = BertTokenizer(build_test_vocab(
        "the a dog cat runs jumps park option video".split()))
    records = [{"filename": f"v{i}.mp4",
                "options": [f"option {j} video {i}" for j in range(5)],
                "answer_idx": i % 5} for i in range(4)]
    ds = MCRetrievalDataset(
        records=records, tokenizer=tok, backend="synthetic",
        backend_kwargs={"height": 40, "width": 40}, num_frames=2,
        canonical_size=40, test_canonical_size=40, max_length=10)
    bert = BertConfig(vocab_size=len(tok.vocab), hidden_size=16,
                      num_hidden_layers=1, num_attention_heads=2,
                      intermediate_size=32, hidden_dropout=0.0,
                      attention_dropout=0.0)
    swin = SwinConfig(patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8,
                      depths=(1, 1), num_heads=(2, 2), window_size=(2, 2, 2),
                      drop_path_rate=0.0)
    model = CloverFinetune(FinetuneConfig(
        swin=swin, text_bert=bert,
        fusion=FusionConfig(bert=bert, img_in_size=16, hidden_size=16),
        task="retrieval", vts_embed_dim=16))
    sample = ds[0]
    imgs = eval_preprocess(jnp.asarray(sample["imgs"]), out_size=32,
                           dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), imgs[None],
        jnp.asarray(sample["token_ids"])[None],
        jnp.asarray(sample["input_mask"])[None],
        method="forward_test")["params"]
    loader = DataLoader(ds, batch_size=4, shuffle=False, drop_last=False,
                        num_workers=0)
    metrics = run_mc_retrieval_eval(
        make_embed_eval_step(model), params, ds, loader.epoch(0),
        out_size=32, dtype=jnp.float32)
    assert set(metrics) == {"acc"} and 0.0 <= metrics["acc"] <= 1.0
