"""Parallelism layer: device mesh construction and data/tensor-parallel
placement (the TPU-native replacement for the reference's vestigial
distributed hooks, SURVEY.md §2.5)."""

from vqatpu.parallel.sharding import (
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
