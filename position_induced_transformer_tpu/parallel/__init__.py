"""Distributed: device meshes, sharding presets, parallel training."""

from position_induced_transformer_tpu.parallel.shard_map_step import (
    make_shard_map_train_step,
    shard_batch_arrays,
)
from position_induced_transformer_tpu.parallel.sharding import (
    batch_spec,
    make_mesh,
    param_shardings,
    replicate_tree,
    replicated,
    sequence_shard_geometry,
    shard_batch,
    shard_state,
)

__all__ = [
    "make_mesh",
    "batch_spec",
    "shard_batch",
    "param_shardings",
    "shard_state",
    "replicated",
    "replicate_tree",
    "sequence_shard_geometry",
    "make_shard_map_train_step",
    "shard_batch_arrays",
]
