"""State placement over the mesh.

Pure data parallelism (the reference's only strategy, SURVEY.md §2.3)
replicates parameters and shards batches; these helpers centralize that
placement and provide the hook where tensor-parallel PartitionSpecs will
attach when the model axis grows beyond 1.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from geo_deep_learning_tpu.core.mesh import MODEL_AXIS, replicated_sharding


def shard_params_spec(params: Any, mesh: Mesh, rules: list | None = None) -> Any:
    """PartitionSpec tree for parameters.

    With no rules (default) everything is replicated — correct for DP.
    ``rules`` is a list of ``(path_substring, PartitionSpec)`` pairs for
    future tensor-parallel layouts (first match wins).
    """
    del mesh

    def spec_of(path) -> P:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        for substr, spec in rules or []:
            if substr in name:
                return spec
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = [spec_of(p) for p, _ in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Place a train state fully replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding)
        if isinstance(x, (jax.Array, np.ndarray))
        else x,
        state,
    )


def model_axis_size(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]
