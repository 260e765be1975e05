"""Core: mesh/topology, precision policy, train state, jitted step functions."""

from geo_deep_learning_tpu.core.mesh import (
    MeshConfig,
    batch_sharding,
    create_mesh,
    host0_only,
    initialize_distributed,
    replicated_sharding,
)
from geo_deep_learning_tpu.core.precision import Precision, PrecisionPolicy
from geo_deep_learning_tpu.core.train_state import TrainState

__all__ = [
    "MeshConfig",
    "Precision",
    "PrecisionPolicy",
    "TrainState",
    "batch_sharding",
    "create_mesh",
    "host0_only",
    "initialize_distributed",
    "replicated_sharding",
]
