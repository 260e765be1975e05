"""Parallelism helpers: shardings, collectives, state placement.

The mesh itself lives in :mod:`geo_deep_learning_tpu.core.mesh`; this
package holds the sharding-spec utilities that sit above it.
"""

from geo_deep_learning_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    MeshConfig,
    batch_sharding,
    create_mesh,
    local_batch_to_global,
    replicated_sharding,
    shard_batch,
)
from geo_deep_learning_tpu.parallel.placement import (
    TENSOR_PARALLEL_RULES,
    count_model_sharded,
    model_axis_size,
    place_state,
    replicate_state,
    shard_params,
    shard_params_spec,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "MeshConfig",
    "TENSOR_PARALLEL_RULES",
    "batch_sharding",
    "count_model_sharded",
    "create_mesh",
    "local_batch_to_global",
    "model_axis_size",
    "place_state",
    "replicate_state",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
    "shard_params_spec",
]
