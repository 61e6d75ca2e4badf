"""On-device fused preprocessing tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from clover_tpu.ops.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    canonical_host_resize,
    center_crop_params,
    eval_preprocess,
    preprocess_clips,
    random_resized_crop_params,
)


def test_canonical_host_resize_shapes():
    frames = np.random.default_rng(0).integers(
        0, 256, size=(3, 120, 200, 3), dtype=np.uint8)
    out = canonical_host_resize(frames, 64)
    assert out.shape == (3, 64, 64, 3)
    assert out.dtype == np.uint8
    # square input passes through at same size (resize to itself)
    sq = np.random.default_rng(1).integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    np.testing.assert_array_equal(canonical_host_resize(sq, 64), sq)


def test_identity_crop_matches_manual_normalize():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(2, 3, 32, 32, 3), dtype=np.uint8)
    boxes = np.tile(np.asarray([[0, 0, 32, 32]], np.float32), (2, 1))
    flips = np.zeros(2, bool)
    out = preprocess_clips(jnp.asarray(frames), jnp.asarray(boxes),
                           jnp.asarray(flips), out_size=32, dtype=jnp.float32)
    expected = (frames.astype(np.float32) - np.asarray(IMAGENET_MEAN)) / np.asarray(
        IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-3)


def test_flip_flag():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(1, 2, 16, 16, 3), dtype=np.uint8)
    boxes = np.asarray([[0, 0, 16, 16]], np.float32)
    out_f = preprocess_clips(jnp.asarray(frames), jnp.asarray(boxes),
                             jnp.asarray(np.ones(1, bool)), out_size=16,
                             dtype=jnp.float32)
    out_n = preprocess_clips(jnp.asarray(frames), jnp.asarray(boxes),
                             jnp.asarray(np.zeros(1, bool)), out_size=16,
                             dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n)[:, :, :, ::-1],
                               atol=1e-5)


def test_center_crop_extracts_center():
    # constant border, distinct center: crop must only see center values
    frames = np.zeros((1, 1, 8, 8, 3), np.uint8)
    frames[0, 0, 2:6, 2:6, :] = 200
    boxes = np.asarray([center_crop_params(8, 4)], np.float32)
    out = preprocess_clips(jnp.asarray(frames), jnp.asarray(boxes),
                           jnp.asarray(np.zeros(1, bool)), out_size=4,
                           dtype=jnp.float32)
    expected = (200.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(out)[0, 0],
                               np.broadcast_to(expected, (4, 4, 3)), atol=1e-3)


def test_random_crop_params_in_bounds():
    rng = np.random.default_rng(2)
    for _ in range(50):
        y0, x0, h, w = random_resized_crop_params(rng, 64)
        assert 0 <= y0 and y0 + h <= 64
        assert 0 <= x0 and x0 + w <= 64
        assert h > 0 and w > 0


def test_eval_preprocess_dtype_and_shape():
    frames = np.random.default_rng(3).integers(
        0, 256, size=(2, 4, 64, 64, 3), dtype=np.uint8)
    out = eval_preprocess(jnp.asarray(frames), out_size=32, dtype=jnp.bfloat16)
    assert out.shape == (2, 4, 32, 32, 3)
    assert out.dtype == jnp.bfloat16
