"""Parallelism package: re-exports the mesh/sharding layer.

The actual implementation lives in :mod:`vqatpu.sharding` (the data-parallel
axis, the 2-D data x model tensor-parallel layout, batch/param placement).
This package name mirrors the conventional `models/ops/parallel` layout.
"""

from vqatpu.sharding import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    make_mesh_2d,
    param_shardings,
    replicate,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "make_mesh", "make_mesh_2d",
    "param_shardings", "replicate", "replicated", "shard_batch",
    "shard_params",
]
