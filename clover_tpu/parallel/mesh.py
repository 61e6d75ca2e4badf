"""Device-mesh construction and sharding helpers.

The reference scales with DDP over NCCL (tools/train.py:150-154). The
TPU-native equivalent is one ``jax.sharding.Mesh`` whose axes carry all
parallelism (SURVEY.md §2.5, §5.8):

- ``data``  — batch sharding (DP); gradients are psum'd by GSPMD/autodiff
- ``fsdp``  — optional parameter sharding axis (new capability, not a port)
- ``model`` — optional tensor-parallel axis for the fusion/text towers

Single-axis data parallelism is the parity configuration.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a mesh; by default all visible devices on one 'data' axis."""
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = [len(devices)] + [1] * (len(axis_names) - 1)
    mesh_devices = np.asarray(devices).reshape(axis_sizes)
    return Mesh(mesh_devices, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data", ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``, replicate the rest."""
    spec = [axis] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch, mesh: Mesh, axis: str = "data"):
    """device_put a host batch with its leading dim sharded over ``axis``."""

    def put(x):
        return jax.device_put(x, batch_sharding(mesh, axis, np.ndim(x)))

    return jax.tree_util.tree_map(put, batch)
