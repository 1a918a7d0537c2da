"""Distributed: device meshes, sharding presets, parallel training."""

from position_induced_transformer_tpu.parallel.pipeline import (
    make_pipelined_apply,
    make_stage_mesh,
    pipeline_processor,
    pipeline_task,
    stack_processor_params,
)
from position_induced_transformer_tpu.parallel.shard_map_step import (
    make_shard_map_train_step,
    shard_batch_arrays,
)
from position_induced_transformer_tpu.parallel.sharding import (
    batch_spec,
    make_mesh,
    parse_mesh_spec,
    param_shardings,
    replicate_tree,
    replicated,
    sequence_constrain_tf_geometry,
    sequence_shard_geometry,
    shard_batch,
    shard_state,
)

__all__ = [
    "make_mesh",
    "parse_mesh_spec",
    "batch_spec",
    "shard_batch",
    "param_shardings",
    "shard_state",
    "replicated",
    "replicate_tree",
    "sequence_shard_geometry",
    "sequence_constrain_tf_geometry",
    "make_shard_map_train_step",
    "shard_batch_arrays",
    "make_stage_mesh",
    "stack_processor_params",
    "pipeline_processor",
    "make_pipelined_apply",
    "pipeline_task",
]
