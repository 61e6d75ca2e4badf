"""Async checkpointing + saliency utility tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clover_tpu.engine import CheckpointManager, TrainState, make_optimizer
from clover_tpu.utils.saliency import video_saliency


def test_async_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(8.0)}
    tx, _ = make_optimizer(params, base_lr=1e-3, total_steps=10)
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path / "c"), async_save=True)
    mgr.save(state, meta={"epoch": 0})
    restored = mgr.restore(TrainState.create(params, tx))  # waits on inflight
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(8.0))
    assert os.path.exists(str(tmp_path / "c" / "meta_0000000000.json"))


def test_video_saliency_localizes():
    # score depends only on the top-left 2x2 of frame 0
    def score_fn(imgs):
        return jnp.sum(imgs[:, 0, :2, :2, :] ** 2, axis=(1, 2, 3))

    imgs = jnp.ones((1, 2, 4, 4, 3))
    sal = video_saliency(score_fn, imgs)
    assert sal.shape == (1, 2, 4, 4)
    assert float(sal[0, 0, 0, 0]) == pytest.approx(1.0)
    assert float(sal[0, 1].max()) == 0.0  # frame 1 has no influence
