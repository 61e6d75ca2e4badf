"""Serving export: AOT StableHLO bundle round-trips and matches the model.

Covers clover_tpu/serving.py + tools/export.py — the deployment path the
reference lacks (its inference requires the full framework; here a bundle
of weight-baked artifacts executes with no model code or checkpoint)."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clover_tpu.models import (
    BertConfig,
    CloverFinetune,
    FinetuneConfig,
    FusionConfig,
    SwinConfig,
)
from clover_tpu.serving import (
    export_retrieval_towers,
    load_bundle,
    save_bundle,
    similarity_fn,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_model():
    cfg = FinetuneConfig(
        swin=SwinConfig(patch_size=(2, 4, 4), stride=(2, 4, 4), embed_dim=8,
                        depths=(1, 1), num_heads=(2, 2),
                        window_size=(2, 2, 2), drop_path_rate=0.0),
        text_bert=BertConfig(hidden_size=16, num_hidden_layers=1,
                             num_attention_heads=2, intermediate_size=32,
                             vocab_size=120, max_position_embeddings=40),
        fusion=FusionConfig(bert=BertConfig(
            hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=32, vocab_size=120,
            max_position_embeddings=40), img_in_size=16),
        task="retrieval",
        vts_embed_dim=8,
    )
    return CloverFinetune(cfg, dtype=jnp.float32)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    model = tiny_model()
    B, T, S, L = 2, 2, 16, 6
    imgs = jnp.zeros((B, 1, T, S, S, 3), jnp.float32)
    ids = jnp.zeros((B, L), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), imgs, ids, mask,
                        method="forward_test")
    exports = export_retrieval_towers(
        model, params, batch_sizes=(B,), frames=T, image_size=S,
        text_len=L, sim_candidates=5)
    out = str(tmp_path_factory.mktemp("bundle"))
    save_bundle(exports, out)
    return model, params, out, (B, T, S, L)


def test_bundle_files_and_manifest(exported):
    _, _, out, (B, _, _, _) = exported
    names = sorted(os.listdir(out))
    assert f"video_tower_b{B}.stablehlo" in names
    assert f"text_tower_b{B}.stablehlo" in names
    assert "similarity.stablehlo" in names
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert set(manifest) == {f"video_tower_b{B}", f"text_tower_b{B}",
                             "similarity"}
    for meta in manifest.values():
        assert meta["nbytes"] > 0 and meta["platforms"]
    # the text tower must NOT carry the (baked) Swin weights
    assert (manifest[f"text_tower_b{B}"]["nbytes"]
            < manifest[f"video_tower_b{B}"]["nbytes"])


def test_loaded_towers_match_model(exported):
    model, params, out, (B, T, S, L) = exported
    fns = load_bundle(out)
    rng = np.random.default_rng(0)
    frames_u8 = jnp.asarray(rng.integers(0, 256, (B, T, S, S, 3), np.uint8))
    ids = jnp.asarray(rng.integers(1, 120, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)

    from clover_tpu.ops.preprocess import eval_preprocess

    imgs = eval_preprocess(frames_u8, out_size=S, dtype=jnp.float32)
    want_v = model.apply(params, imgs[:, None], None, method="forward_video")
    want_t = model.apply(params, ids, mask, method="forward_text")
    got_v = fns[f"video_tower_b{B}"](frames_u8)
    got_t = fns[f"text_tower_b{B}"](ids, mask)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               atol=1e-5, rtol=1e-5)

    # similarity artifact == the retrieval eval protocol (metrics.py)
    t5 = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    v5 = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(fns["similarity"](t5, v5)),
                               np.asarray(similarity_fn(t5, v5)),
                               atol=1e-6)


def test_towers_match_forward_test_pairing(exported):
    """forward_video/forward_text towers reproduce forward_test's joint
    output exactly (the export surface is the eval path, not a fork)."""
    model, params, _, (B, T, S, L) = exported
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(B, 1, T, S, S, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, 120, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    v_joint, t_joint = model.apply(params, imgs, ids, mask,
                                   method="forward_test")
    v = model.apply(params, imgs, None, method="forward_video")
    t = model.apply(params, ids, mask, method="forward_text")
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_joint), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_joint), atol=1e-6)


def test_export_accepts_bare_param_tree(exported):
    """export_retrieval_towers accepts both {'params': tree} and the bare
    tree (it wraps once up front — the old fallback broke at apply)."""
    model, params, _, (B, T, S, L) = exported
    exports = export_retrieval_towers(
        model, params["params"], batch_sizes=(B,), frames=T, image_size=S,
        text_len=L, sim_candidates=4)
    rng = np.random.default_rng(2)
    frames_u8 = jnp.asarray(rng.integers(0, 256, (B, T, S, S, 3), np.uint8))
    got = np.asarray(exports[f"video_tower_b{B}"].call(frames_u8))
    from clover_tpu.ops.preprocess import eval_preprocess

    imgs = eval_preprocess(frames_u8, out_size=S, dtype=jnp.float32)
    want = np.asarray(model.apply(params, imgs[:, None], None,
                                  method="forward_video"))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_export_cli_smoke(tmp_path):
    out = tmp_path / "bundle"
    env = dict(os.environ, USE_TF="0")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export.py"),
         os.path.join(REPO, "configs", "exp", "debug_retrieval_synthetic.py"),
         "--out", str(out), "--batch-sizes", "1", "--frames", "2",
         "--text-len", "8", "--sim-candidates", "4", "--cpu"],
        capture_output=True, text=True, env=env, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    fns = load_bundle(str(out))
    assert "video_tower_b1" in fns and "text_tower_b1" in fns
