"""Tests for the completeness additions: inflation, samplers, crops,
metrics, schedules, IO, env."""

import numpy as np
import pytest

import jax.numpy as jnp

from clover_tpu.data.loader import ClassBalancedSampler
from clover_tpu.engine.optim import linear_annealing_schedule, step_schedule
from clover_tpu.engine.steps import ema_momentum_schedule
from clover_tpu.evaluation import mean_average_precision, precision_recall_at_threshold
from clover_tpu.models.convert import inflate_swin2d
from clover_tpu.ops.preprocess import apply_color_jitter, three_crop_preprocess
from clover_tpu.utils.env import collect_env
from clover_tpu.utils.io import hload_jsonl, hload_pkl, hsave_jsonl, hsave_pkl


def test_inflate_swin2d():
    sd = {
        "patch_embed.proj.weight": np.ones((8, 3, 4, 4), np.float32),
        "layers.0.blocks.0.attn.relative_position_bias_table":
            np.arange(13 * 13 * 2, dtype=np.float32).reshape(13 * 13, 2),
        "layers.0.blocks.0.attn.relative_position_index": np.zeros((49, 49)),
        "norm.weight": np.ones(8, np.float32),
    }
    out = inflate_swin2d(sd, temporal_patch=2, temporal_window=8)
    assert out["patch_embed.proj.weight"].shape == (8, 3, 2, 4, 4)
    # center-repeat / pd preserves the conv's response to a constant input
    np.testing.assert_allclose(
        out["patch_embed.proj.weight"].sum(axis=2), sd["patch_embed.proj.weight"])
    tbl = out["layers.0.blocks.0.attn.relative_position_bias_table"]
    assert tbl.shape == (15 * 13 * 13, 2)
    np.testing.assert_array_equal(tbl[: 13 * 13], tbl[13 * 13: 2 * 13 * 13])
    assert "layers.0.blocks.0.attn.relative_position_index" not in out


def test_class_balanced_sampler():
    labels = [0] * 90 + [1] * 10
    s = ClassBalancedSampler(labels, {0: 1.0, 1: 9.0}, seed=0, batch_size=1)
    idx = s.indices(epoch=0)
    frac_minority = np.mean([labels[i] for i in idx])
    assert 0.35 < frac_minority < 0.65  # upweighted from 10% toward 50%
    np.testing.assert_array_equal(idx, s.indices(0))  # deterministic


def test_three_crop():
    frames = np.zeros((2, 1, 8, 8, 3), np.uint8)
    frames[:, :, :, :4] = 255  # left half white
    out = np.asarray(three_crop_preprocess(jnp.asarray(frames), out_size=4,
                                           dtype=jnp.float32))
    assert out.shape == (6, 1, 4, 4, 3)
    # left crop sees all white, right crop all black -> different means
    assert out[0].mean() > out[2].mean()


def test_color_jitter():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (2, 1, 8, 8, 3)).astype(np.float32))
    ident = np.asarray(apply_color_jitter(frames, jnp.ones((2, 3))))
    np.testing.assert_allclose(ident, np.asarray(frames), atol=1e-4)
    bright = np.asarray(apply_color_jitter(
        frames, jnp.asarray([[1.5, 1.0, 1.0], [1.0, 1.0, 1.0]])))
    assert bright[0].mean() > ident[0].mean()
    np.testing.assert_allclose(bright[1], ident[1], atol=1e-4)


def test_mean_average_precision():
    scores = np.array([[0.9, 0.1], [0.8, 0.4], [0.2, 0.7]])
    labels = np.array([[1, 0], [1, 1], [0, 1]])
    # class 0: ranked pos,pos,neg -> AP 1.0 ; class 1: ranked (0.7 pos),(0.4 pos),(0.1 neg) -> AP 1.0
    assert mean_average_precision(scores, labels) == pytest.approx(1.0)
    labels2 = np.array([[0, 0], [1, 1], [1, 1]])
    assert mean_average_precision(scores, labels2) < 1.0


def test_precision_recall_threshold():
    scores = np.array([[0.9, 0.2], [0.6, 0.8]])
    labels = np.array([[1, 0], [0, 1]])
    out = precision_recall_at_threshold(scores, labels, 0.5)
    assert out["precision"] == pytest.approx(2 / 3)
    assert out["recall"] == pytest.approx(1.0)


def test_linear_and_step_schedules():
    lin = linear_annealing_schedule(1.0, total_steps=100, warmup_steps=10,
                                    min_lr_ratio=0.1)
    assert float(lin(10)) == pytest.approx(1.0, rel=1e-3)
    assert float(lin(100)) == pytest.approx(0.1, rel=1e-2)
    st = step_schedule(1.0, {10: 0.1, 20: 0.1})
    assert float(st(5)) == pytest.approx(1.0)
    assert float(st(15)) == pytest.approx(0.1)
    assert float(st(25)) == pytest.approx(0.01)


def test_ema_momentum_schedules():
    const = ema_momentum_schedule("constant", base=0.99)
    assert float(const(jnp.int32(0))) == pytest.approx(0.99)
    lin = ema_momentum_schedule("linear", base=0.9998, ramp_steps=100)
    early = float(lin(jnp.int32(0)))
    late = float(lin(jnp.int32(100000)))
    assert early < late <= 0.9998


def test_io_roundtrip(tmp_path):
    rows = [{"a": 1}, {"a": 2}]
    p = str(tmp_path / "x.jsonl")
    hsave_jsonl(rows, p)
    assert hload_jsonl(p) == rows
    pk = str(tmp_path / "x.pkl")
    hsave_pkl({"k": [1, 2]}, pk)
    assert hload_pkl(pk) == {"k": [1, 2]}


def test_collect_env():
    info = collect_env()
    assert "jax" in info and "python" in info


def test_action_dataset_and_zeroshot_eval():
    from clover_tpu.data.datasets import ActionVideoDataset, _SYNTH_WORDS
    from clover_tpu.data.tokenization import BertTokenizer, build_test_vocab

    tok = BertTokenizer(build_test_vocab(_SYNTH_WORDS))
    records = [{"filename": f"v{i}.mp4", "label": (i % 3) + 1} for i in range(6)]
    ds = ActionVideoDataset(
        records=records, class_names=["dog runs", "cat jumps", "child plays"],
        tokenizer=tok, backend="synthetic", num_frames=2,
        test_canonical_size=32, max_length=12)
    sample = ds[0]
    assert sample["imgs"].shape[0] == 1
    enc = ds.encode_class_names()
    assert enc["token_ids"].shape[0] == 3


def test_zeroshot_action_eval_loop():
    """run_zeroshot_action_eval end-to-end: class-name embeddings from the
    text tower, clips scored by nearest class (tools/test.py
    eval_mode='zeroshot_action')."""
    import jax
    import jax.numpy as jnp

    from clover_tpu.data.datasets import ActionVideoDataset, _SYNTH_WORDS
    from clover_tpu.data.loader import DataLoader
    from clover_tpu.data.tokenization import BertTokenizer, build_test_vocab
    from clover_tpu.engine.eval_loop import run_zeroshot_action_eval
    from clover_tpu.engine.steps import make_embed_eval_step
    from clover_tpu.models import (
        BertConfig,
        CloverFinetune,
        FinetuneConfig,
        FusionConfig,
        SwinConfig,
    )
    from clover_tpu.ops.preprocess import eval_preprocess

    tok = BertTokenizer(build_test_vocab(_SYNTH_WORDS))
    records = [{"filename": f"v{i}.mp4", "label": (i % 3) + 1}
               for i in range(6)]
    ds = ActionVideoDataset(
        records=records, class_names=["dog runs", "cat jumps", "child plays"],
        tokenizer=tok, backend="synthetic",
        backend_kwargs={"height": 40, "width": 40}, num_frames=2,
        test_canonical_size=40, max_length=12)
    bert = BertConfig(vocab_size=len(tok.vocab), hidden_size=16,
                      num_hidden_layers=1, num_attention_heads=2,
                      intermediate_size=32, hidden_dropout=0.0,
                      attention_dropout=0.0)
    model = CloverFinetune(FinetuneConfig(
        swin=SwinConfig(patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8,
                        depths=(1, 1), num_heads=(2, 2),
                        window_size=(2, 2, 2), drop_path_rate=0.0),
        text_bert=bert,
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
    enc = ds.encode_class_names()
    cls_embd = np.asarray(model.apply(
        {"params": params}, jnp.asarray(enc["token_ids"]),
        jnp.asarray(enc["input_mask"]), method="forward_text"), np.float32)
    loader = DataLoader(ds, batch_size=3, shuffle=False, drop_last=False,
                        num_workers=0)
    metrics = run_zeroshot_action_eval(
        make_embed_eval_step(model), params, ds, loader.epoch(0), cls_embd,
        out_size=32, dtype=jnp.float32)
    assert 0.0 <= metrics["top-1 acc"] <= 100.0  # percent, reference convention
