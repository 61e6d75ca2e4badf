"""Engine tests: optimizer masks/schedules, train steps improve loss,
checkpoint roundtrip + best tracking, retrieval eval loop end-to-end."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clover_tpu.data import DataLoader, make_synthetic_retrieval_dataset
from clover_tpu.engine import (
    CheckpointManager,
    TrainState,
    cosine_warmup_schedule,
    freeze_by_prefix,
    freeze_mask_from_cfg,
    make_embed_eval_step,
    make_optimizer,
    make_retrieval_train_step,
    run_retrieval_eval,
    weight_decay_mask,
)
from clover_tpu.models import (
    BertConfig,
    CloverFinetune,
    FinetuneConfig,
    FusionConfig,
    SwinConfig,
)
from clover_tpu.ops.preprocess import preprocess_clips


def _tiny_model(vocab_size):
    bert = BertConfig(vocab_size=vocab_size, hidden_size=16, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=32,
                      hidden_dropout=0.0, attention_dropout=0.0)
    swin = SwinConfig(patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8,
                      depths=(1, 1), num_heads=(2, 2), window_size=(2, 2, 2),
                      drop_path_rate=0.0)
    fus = FusionConfig(bert=bert, img_in_size=16, hidden_size=16, num_frames=2,
                       spatial_tokens=16)
    return CloverFinetune(FinetuneConfig(
        swin=swin, text_bert=bert, fusion=fus, task="retrieval",
        vts_embed_dim=16))


def test_weight_decay_mask_exemptions():
    params = {
        "layer": {"kernel": np.zeros((2, 2)), "bias": np.zeros(2)},
        "norm": {"scale": np.ones(2), "bias": np.zeros(2)},
        "attn": {"relative_position_bias_table": np.zeros((5, 2))},
        "emb": {"embedding": np.zeros((4, 2))},
        "vis_space_pos": np.zeros((1, 1, 4, 2)),
    }
    mask = weight_decay_mask(params)
    assert mask["layer"]["kernel"] is True
    assert mask["layer"]["bias"] is False
    assert mask["norm"]["scale"] is False
    assert mask["attn"]["relative_position_bias_table"] is False
    assert mask["emb"]["embedding"] is False
    assert mask["vis_space_pos"] is False


def test_cosine_warmup_schedule():
    sched = cosine_warmup_schedule(1.0, total_steps=100, warmup_steps=10,
                                   warmup_start_ratio=0.001, min_lr_ratio=0.1)
    assert float(sched(0)) == pytest.approx(0.001, rel=1e-3)
    assert float(sched(10)) == pytest.approx(1.0, rel=1e-3)
    assert float(sched(100)) == pytest.approx(0.1, rel=1e-2)
    # monotone decay after warmup
    vals = [float(sched(s)) for s in range(10, 101, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_freeze_by_prefix():
    params = {"text_backbone": {"w": np.zeros(2)}, "backbone": {"w": np.zeros(2)}}
    mask = freeze_by_prefix(params, ("text_backbone",))
    assert mask["text_backbone"]["w"] is False
    assert mask["backbone"]["w"] is True


def test_freeze_mask_from_cfg_substring_and_except():
    # reference semantics: substring match, except-list wins
    # (recognizers/base.py:138-163); dot-style reference keys normalized
    params = {
        "backbone": {"patch_embed": {"w": np.zeros(2)},
                     "layers_3": {"w": np.zeros(2)}},
        "text_backbone": {"w": np.zeros(2)},
    }
    mask = freeze_mask_from_cfg(
        params, freeze_stage=("backbone.",), freeze_except=("layers_3",))
    assert mask["backbone"]["patch_embed"]["w"] is False
    assert mask["backbone"]["layers_3"]["w"] is True
    # 'backbone' substring also catches text_backbone — same as reference
    assert mask["text_backbone"]["w"] is False


def test_frozen_params_bit_identical_after_steps(retrieval_setup):
    """freeze_stage plumbing end-to-end: frozen backbone params must be
    bit-identical after optimizer steps while trainable params move."""
    from clover_tpu.engine import freeze_mask_from_cfg

    ds, model, loader, to_model_batch, params = retrieval_setup
    params = _copy(params)
    before = jax.tree_util.tree_map(np.asarray, params)
    mask = freeze_mask_from_cfg(params, freeze_stage=("backbone/",))
    tx, _ = make_optimizer(params, base_lr=1e-2, total_steps=20,
                           warmup_steps=0, weight_decay=0.01,
                           grad_clip_norm=5.0, freeze_mask=mask)
    state = TrainState.create(params, tx)
    step_fn = make_retrieval_train_step(model)
    batch = to_model_batch(next(iter(loader)))
    for _ in range(3):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(0))

    flat_before = jax.tree_util.tree_leaves_with_path(before)
    after = {"/".join(getattr(p, "key", str(p)) for p in path): leaf
             for path, leaf in
             jax.tree_util.tree_leaves_with_path(state.params)}
    froze, moved = 0, 0
    for path, b in flat_before:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        a = np.asarray(after[key])
        if key.startswith("backbone/"):
            np.testing.assert_array_equal(a, b, err_msg=key)
            froze += 1
        elif not np.array_equal(a, b):
            moved += 1
    assert froze > 0 and moved > 0


@pytest.fixture(scope="module")
def retrieval_setup():
    ds = make_synthetic_retrieval_dataset(n_videos=8, num_frames=4,
                                          canonical_size=40)
    model = _tiny_model(ds.tokenizer.vocab_size)
    loader = DataLoader(ds, batch_size=4, num_workers=2)
    batch = next(iter(loader))

    def to_model_batch(batch):
        imgs = preprocess_clips(
            jnp.asarray(batch["imgs"].reshape((-1,) + batch["imgs"].shape[2:])),
            jnp.asarray(batch["crop_boxes"]), jnp.asarray(batch["flip"]),
            out_size=32, dtype=jnp.float32)
        return {"imgs": imgs[:, None], "token_ids": jnp.asarray(batch["token_ids"])[:, None],
                "input_mask": jnp.asarray(batch["input_mask"])[:, None]}

    mb = to_model_batch(batch)
    params = model.init(jax.random.PRNGKey(0), mb, train=False)["params"]
    return ds, model, loader, to_model_batch, params


def _copy(tree):
    import jax, jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.copy, tree)


def test_train_step_improves_loss(retrieval_setup):
    ds, model, loader, to_model_batch, params = retrieval_setup
    params = _copy(params)  # steps donate state; keep fixture intact
    tx, _ = make_optimizer(params, base_lr=1e-2, total_steps=50,
                           warmup_steps=0, weight_decay=0.0, grad_clip_norm=5.0)
    state = TrainState.create(params, tx)
    step_fn = make_retrieval_train_step(model)
    rng = jax.random.PRNGKey(1)
    batch = to_model_batch(next(iter(loader)))
    first = None
    for _ in range(8):
        state, metrics = step_fn(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert int(state.step) == 8
    assert np.isfinite(float(metrics["grad_norm"]))


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, retrieval_setup):
    ds, model, loader, to_model_batch, params = retrieval_setup
    tx, _ = make_optimizer(params, base_lr=1e-3, total_steps=10,
                           warmup_steps=0)
    state = TrainState.create(_copy(params), tx)
    step_fn = make_retrieval_train_step(model)
    batch = to_model_batch(next(iter(loader)))
    state, _ = step_fn(state, batch, jax.random.PRNGKey(0))

    mgr = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    mgr.save(state, meta={"epoch": 0})
    assert mgr.latest_step() == 1

    fresh = TrainState.create(_copy(params), tx)
    restored = mgr.restore(fresh)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and restored state can keep training
    restored, m = step_fn(restored, batch, jax.random.PRNGKey(0))
    assert int(restored.step) == 2


def test_checkpoint_best_tracking(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "c"))
    assert mgr.update_best(1, "Recall@all", 100.0)
    assert not mgr.update_best(2, "Recall@all", 90.0)
    assert mgr.update_best(3, "Recall@all", 120.0)
    assert mgr._best_step() == 3


def test_retrieval_eval_loop(retrieval_setup):
    ds_train, model, _, _, params = retrieval_setup
    test_ds = make_synthetic_retrieval_dataset(
        n_videos=6, test_mode=True, num_frames=4, test_canonical_size=40)
    loader = DataLoader(test_ds, batch_size=3, shuffle=False, drop_last=False,
                        num_workers=2)
    eval_step = make_embed_eval_step(model)
    metrics = run_retrieval_eval(eval_step, params, test_ds, loader.epoch(0),
                                 out_size=32, dtype=jnp.float32)
    assert set(metrics) >= {"Recall@1", "Recall@5", "Recall@10", "MR"}
    assert 0 <= metrics["Recall@1"] <= 100


@pytest.mark.slow
def test_ema_params_update(retrieval_setup):
    ds, model, loader, to_model_batch, params = retrieval_setup
    orig = _copy(params)
    tx, _ = make_optimizer(params, base_lr=1e-2, total_steps=10, warmup_steps=0)
    state = TrainState.create(_copy(params), tx, ema_params=_copy(params))
    step_fn = make_retrieval_train_step(model, ema_momentum=0.9)
    batch = to_model_batch(next(iter(loader)))
    state, _ = step_fn(state, batch, jax.random.PRNGKey(0))
    # EMA moved toward new params but not equal to them
    p = jax.tree_util.tree_leaves(state.params)[0]
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    o = jax.tree_util.tree_leaves(orig)[0]
    assert not np.allclose(np.asarray(e), np.asarray(p))
    assert not np.allclose(np.asarray(e), np.asarray(o))


@pytest.mark.slow
def test_contrastive_alignment_learns(retrieval_setup):
    """Overfit the 8 (video, caption) pairs for ~happens-fast steps and
    check retrieval recall on those pairs rises far above chance — the
    end-to-end signal that the NCE loss + grads + optimizer actually
    align the two towers (chance R@1 = 12.5%)."""
    ds, model, loader, to_model_batch, params = retrieval_setup
    params = _copy(params)
    tx, _ = make_optimizer(params, base_lr=3e-3, total_steps=200,
                           warmup_steps=5, weight_decay=0.0,
                           grad_clip_norm=5.0)
    state = TrainState.create(params, tx)
    step_fn = make_retrieval_train_step(model, temperature=0.1)
    rng = jax.random.PRNGKey(2)
    for epoch in range(25):
        for batch in loader.epoch(epoch):
            state, metrics = step_fn(state, to_model_batch(batch), rng)
    assert np.isfinite(float(metrics["loss"]))

    # embed every (video, caption) pair with the trained params
    vs, ts = [], []
    for batch in loader.epoch(0):
        mb = to_model_batch(batch)
        v, t = model.apply({"params": state.params}, mb["imgs"],
                           mb["token_ids"][:, 0], mb["input_mask"][:, 0],
                           method="forward_test")
        vs.append(np.asarray(v, np.float32))
        ts.append(np.asarray(t, np.float32))
    v = np.concatenate(vs)
    t = np.concatenate(ts)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    sim = t @ v.T
    r1 = float(np.mean(sim.argmax(-1) == np.arange(len(sim))))
    assert r1 >= 0.5, f"t2v R@1 after overfit = {r1} (chance 0.125)"


class _FakeLoader:
    """Loader stub: only __len__/epoch are needed by Trainer.resume."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def epoch(self, e):
        return iter(())


def test_resume_epoch_from_meta(tmp_path):
    """Resume derives start_epoch from checkpoint meta, not step division —
    correct even when loader lengths change across the resume (reference
    meta round-trip, epoch_based_runner.py:169-201)."""
    from clover_tpu.engine.trainer import Trainer

    params = {"w": jnp.arange(4.0)}
    tx, _ = make_optimizer(params, base_lr=1e-3, total_steps=10)
    state = TrainState.create(params, tx).replace(step=jnp.asarray(100))
    mgr = CheckpointManager(str(tmp_path / "c"))
    mgr.save(state, meta={"epoch": 3})

    def make_trainer(loader_len):
        return Trainer(
            state=TrainState.create(params, tx),
            train_steps=[lambda s, b, r: (s, {})],
            train_loaders=[_FakeLoader(loader_len)],
            batch_to_device=lambda li, b: b,
            rng=jax.random.PRNGKey(0),
            total_epochs=10,
            ckpt_manager=mgr,
        )

    # Loader length changed since the save (100 steps / 7 per epoch would
    # give epoch 14 by division) — meta wins: end-of-epoch-3 save resumes
    # at epoch 4.
    tr = make_trainer(loader_len=7)
    assert tr.resume()
    assert tr.start_epoch == 4
    assert int(tr.state.step) == 100

    # Mid-epoch preemption save redoes the interrupted epoch.
    mgr2 = CheckpointManager(str(tmp_path / "p"))
    mgr2.save(state, meta={"epoch": 3, "preempted": True})
    tr = make_trainer(loader_len=7)
    tr.ckpt = mgr2
    assert tr.resume()
    assert tr.start_epoch == 3

    # Legacy checkpoint without an epoch in meta: falls back to division.
    mgr3 = CheckpointManager(str(tmp_path / "l"))
    mgr3.save(state)  # meta has only {"step": 100}
    tr = make_trainer(loader_len=25)
    tr.ckpt = mgr3
    assert tr.resume()
    assert tr.start_epoch == 4  # 100 // 25


def test_step_level_clip_matches_optax_chain(retrieval_setup):
    """The single-pass clip in _finalize (grad_clip_norm on the step
    factory) must produce bit-identical params to the optax
    clip_by_global_norm chain it replaced (engine/steps.py:_finalize) —
    including on a step where the clip actually triggers."""
    ds, model, loader, to_model_batch, params = retrieval_setup
    batch = to_model_batch(next(iter(loader)))
    rng = jax.random.PRNGKey(1)
    clip = 1e-3  # far below the initial grad norm so the clip TRIGGERS

    tx_chain, _ = make_optimizer(_copy(params), base_lr=1e-2, total_steps=50,
                                 warmup_steps=0, weight_decay=0.0,
                                 grad_clip_norm=clip)
    s_chain = TrainState.create(_copy(params), tx_chain)
    step_chain = make_retrieval_train_step(model)

    tx_step, _ = make_optimizer(_copy(params), base_lr=1e-2, total_steps=50,
                                warmup_steps=0, weight_decay=0.0)
    s_step = TrainState.create(_copy(params), tx_step)
    step_step = make_retrieval_train_step(model, grad_clip_norm=clip)

    for _ in range(3):
        s_chain, m_chain = step_chain(s_chain, batch, rng)
        s_step, m_step = step_step(s_step, batch, rng)
    assert float(m_chain["grad_norm"]) > clip  # it really clipped
    np.testing.assert_allclose(float(m_chain["grad_norm"]),
                               float(m_step["grad_norm"]), rtol=0, atol=0)
    for a, b in zip(jax.tree_util.tree_leaves(s_chain.params),
                    jax.tree_util.tree_leaves(s_step.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rbg_train_rng_deterministic(retrieval_setup):
    """The hardware-RNG train key (tools/train.py r3 default: rbg
    dropout bits) is deterministic per key: identical steps from
    identical state+key, different dropout draws across steps (the step
    folds the global step into the key)."""
    ds, model, loader, to_model_batch, params = retrieval_setup
    batch = to_model_batch(next(iter(loader)))
    rng = jax.random.key(5, impl="rbg")
    step_fn = make_retrieval_train_step(model, grad_clip_norm=5.0)

    def run(n):
        tx, _ = make_optimizer(_copy(params), base_lr=1e-2, total_steps=50,
                               warmup_steps=0, weight_decay=0.0)
        st = TrainState.create(_copy(params), tx)
        ms = []
        for _ in range(n):
            st, m = step_fn(st, batch, rng)
            ms.append(float(m["loss"]))
        return st, ms

    s1, m1 = run(2)
    s2, m2 = run(2)
    assert m1 == m2  # bit-deterministic across reruns
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_global_norm_flat_matches_optax():
    """CLOVER_GNORM=flat's chunked single-pass norm == optax.global_norm
    to f32 reassociation, incl. mixed shapes/dtypes and the chunking
    boundary (chunk_elems smaller than one leaf)."""
    import optax

    from clover_tpu.engine.steps import _global_norm_flat

    rng = np.random.default_rng(9)
    tree = {
        "a": jnp.asarray(rng.normal(size=(257, 33)).astype(np.float32)),
        "b": {"c": jnp.asarray(rng.normal(size=(41,)).astype(np.float32)),
              "d": jnp.asarray(rng.normal(size=(8, 3, 5)) * 1e-3,
                               jnp.bfloat16)},
        "e": jnp.asarray(rng.normal(size=()) * 10, jnp.float32),
    }
    want = float(optax.global_norm(
        jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), tree)))
    got = float(_global_norm_flat(tree))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got_chunked = float(_global_norm_flat(tree, chunk_elems=100))
    np.testing.assert_allclose(got_chunked, want, rtol=1e-6)
