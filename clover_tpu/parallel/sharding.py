"""Parameter-sharding rules (FSDP-style) over a mesh axis.

A new capability relative to the reference (which is DP-only, SURVEY.md
§2.5): shard each large parameter along its largest axis divisible by the
mesh axis size, replicate the rest. XLA/GSPMD inserts the all-gathers on
use and reduce-scatters on gradients.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_param_shardings(
    params: Any,
    mesh: Mesh,
    axis: str = "fsdp",
    min_size: int = 2 ** 16,
) -> Any:
    """Pytree of NamedShardings: big params sharded on ``axis``."""
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def shard_one(leaf):
        shape = np.shape(leaf)
        if axis_size == 1 or np.prod(shape, dtype=np.int64) < min_size:
            return NamedSharding(mesh, P())
        # choose the largest dim divisible by axis_size
        candidates = [
            (dim_size, i) for i, dim_size in enumerate(shape)
            if dim_size % axis_size == 0
        ]
        if not candidates:
            return NamedSharding(mesh, P())
        _, dim = max(candidates)
        spec = [None] * len(shape)
        spec[dim] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(shard_one, params)


def replicate_shardings(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), tree)


# Megatron-style tensor-parallel rules for the transformer towers (a new
# capability; the reference is DP-only). Column-parallel: qkv/query/key/
# value/intermediate kernels split on the OUTPUT dim; row-parallel:
# attention-output / MLP-output kernels split on the INPUT dim. GSPMD
# inserts the reduce at the row-parallel matmul automatically.
_TP_COLUMN = ("query", "key", "value", "qkv", "intermediate", "fc1")
_TP_ROW = ("attention_output", "output", "proj", "fc2")


def combined_param_shardings(
    params: Any,
    mesh: Mesh,
    fsdp_axis: str = "fsdp",
    model_axis: str = "model",
    min_size: int = 2 ** 16,
) -> Any:
    """TP rules first, FSDP on what TP left replicated.

    The config-path entry point (tools/train.py ``parallel`` section): a
    kernel claimed by a Megatron column/row rule is sharded on
    ``model_axis``; everything else big enough falls back to the FSDP
    largest-divisible-dim rule on ``fsdp_axis``. When a TP-sharded kernel's
    *other* dim divides the fsdp axis size the two composes (2D sharding).
    """
    tp = tp_param_shardings(params, mesh, axis=model_axis)
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    fsdp_size = axis_sizes.get(fsdp_axis, 1)

    def merge(leaf, tp_sh):
        shape = np.shape(leaf)
        tp_spec = tuple(tp_sh.spec) + (None,) * (len(shape) - len(tp_sh.spec))
        if fsdp_size == 1 or np.prod(shape, dtype=np.int64) < min_size:
            return tp_sh
        free = [
            (dim_size, i) for i, dim_size in enumerate(shape)
            if tp_spec[i] is None and dim_size % fsdp_size == 0
        ]
        if not free:
            return tp_sh
        _, dim = max(free)
        spec = list(tp_spec)
        spec[dim] = fsdp_axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(merge, params, tp)


def tp_param_shardings(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """NamedShardings splitting attention heads / MLP hidden over ``axis``."""
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def decide(path, leaf):
        if axis_size == 1:
            return NamedSharding(mesh, P())
        keys = [getattr(p, "key", str(p)) for p in path]
        shape = np.shape(leaf)
        parent = keys[-2] if len(keys) >= 2 else ""
        name = keys[-1]
        if name == "kernel" and len(shape) == 2:
            if parent in _TP_COLUMN and shape[1] % axis_size == 0:
                return NamedSharding(mesh, P(None, axis))
            if parent in _TP_ROW and shape[0] % axis_size == 0:
                return NamedSharding(mesh, P(axis, None))
        if name == "bias" and parent in _TP_COLUMN and shape[0] % axis_size == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(decide, params)
