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


def make_hybrid_mesh(
    ici_axis_sizes: Sequence[int],
    axis_names: Sequence[str] = ("data", "fsdp", "model", "sp"),
    dcn_data_parallel: Optional[int] = None,
) -> Mesh:
    """Multi-slice mesh: data parallelism over DCN, everything else on ICI.

    Follows the standard TPU multi-slice recipe (scaling-book): the slowest
    collective axis (pure data parallelism — one gradient psum per step)
    rides the data-center network between slices, while fsdp/tensor/sequence
    axes stay inside a slice on ICI. ``dcn_data_parallel`` defaults to the
    number of slices (jax.process/device slice_index); falls back to a flat
    single-slice mesh when slice information is unavailable (CPU, 1 slice).
    """
    devices = jax.devices()
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    n_slices = dcn_data_parallel or len(slice_ids)
    if n_slices <= 1:
        sizes = list(ici_axis_sizes)
        return make_mesh(axis_sizes=sizes, axis_names=axis_names[:len(sizes)],
                         devices=devices[: int(np.prod(sizes))])
    from jax.experimental import mesh_utils

    per_slice = list(ici_axis_sizes)
    dcn = [n_slices] + [1] * (len(per_slice) - 1)
    # result shape = elementwise product -> (n_slices*data_ici, fsdp, ...)
    mesh_devices = mesh_utils.create_hybrid_device_mesh(
        per_slice, dcn, devices=devices)
    return Mesh(mesh_devices, axis_names[: mesh_devices.ndim])


def batch_sharding(mesh: Mesh, axis: str = "data", ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``, replicate the rest."""
    spec = [axis] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch with its leading dim sharded over ``axis``.

    Single-process: a plain sharded device_put. Multi-process: each process
    holds only its LOCAL rows (the rank-strided loader shard), so the global
    array is assembled with ``make_array_from_process_local_data`` — the
    JAX equivalent of the reference's one-DistributedSampler-per-rank DDP
    feed (samplers/distributed_sampler.py)."""
    multiproc = jax.process_count() > 1

    def put(x):
        sh = batch_sharding(mesh, axis, np.ndim(x))
        if multiproc and np.ndim(x) >= 1:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def replicate_pytree(tree, mesh: Mesh):
    """Replicate a host pytree across every device of ``mesh``.

    Multi-process safe: every process must pass the SAME host values (e.g.
    params from an identical seeded init, or a checkpoint restore) —
    device_put then treats them as the global value on a fully-replicated
    sharding, giving jit inputs that span all processes' devices."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), sh), tree)
