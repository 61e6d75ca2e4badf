import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clover_tpu.ops.blending import cutmix, mixup


def test_mixup_soft_labels_sum_to_one(rng):
    imgs = jnp.asarray(rng.normal(size=(4, 2, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3])
    mixed, soft = mixup(jax.random.PRNGKey(0), imgs, labels, num_classes=4)
    assert mixed.shape == imgs.shape
    np.testing.assert_allclose(np.asarray(soft).sum(axis=1), 1.0, atol=1e-6)
    # mixing is convex: values bounded by inputs' range
    assert float(jnp.max(mixed)) <= float(jnp.max(imgs)) + 1e-5


def test_cutmix_pastes_box(rng):
    imgs = jnp.stack([jnp.zeros((2, 8, 8, 3)), jnp.ones((2, 8, 8, 3))])
    labels = jnp.asarray([0, 1])
    mixed, soft = cutmix(jax.random.PRNGKey(3), imgs, labels, num_classes=2,
                         alpha=1.0)
    vals = np.unique(np.asarray(mixed))
    assert set(vals.tolist()) <= {0.0, 1.0}  # pure paste, no interpolation
    np.testing.assert_allclose(np.asarray(soft).sum(axis=1), 1.0, atol=1e-6)
