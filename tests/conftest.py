"""Test harness: force an 8-device virtual CPU platform before jax loads.

This lets pjit/shard_map collective semantics (the reference's NCCL
all-gather behaviors, SURVEY.md §5.8) be tested multi-"chip" without TPU
hardware, per the driver contract.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("USE_TF", "0")  # keep transformers from importing TF
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The image's sitecustomize force-registers the axon TPU backend and exports
# JAX_PLATFORMS=axon before conftest runs; the config flag wins over both.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
