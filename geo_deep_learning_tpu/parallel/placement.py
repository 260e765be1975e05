"""State placement over the mesh.

Pure data parallelism (the reference's only strategy, SURVEY.md §2.3)
replicates parameters and shards batches. When the mesh's model axis
grows beyond 1, ``TENSOR_PARALLEL_RULES`` provides Megatron-style
PartitionSpecs for the transformer families (MiT / DOFA ViT): the
attention QKV and MLP up-projections are column-sharded (output features
over ``model``) and the attention output / MLP down-projections are
row-sharded (input features over ``model``), so each block needs exactly
one reduce-scatter-equivalent collective that XLA emits from the
annotations — there is no hand-written collective code.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geo_deep_learning_tpu.core.mesh import MODEL_AXIS, replicated_sharding

# (param-path substring, PartitionSpec) — first match wins. Paths follow
# the Flax module names in models/encoders/{mix_transformer,dofa}.py.
# Column-parallel layers also shard their bias; row-parallel biases stay
# replicated (they add after the contraction that sums over the shards).
TENSOR_PARALLEL_RULES: list[tuple[str, P]] = [
    # --- MixTransformer (SR attention + Mix-FFN), kernels [in, out] ---
    ("attn/q/kernel", P(None, MODEL_AXIS)),
    ("attn/q/bias", P(MODEL_AXIS)),
    ("attn/kv/kernel", P(None, MODEL_AXIS)),
    ("attn/kv/bias", P(MODEL_AXIS)),
    ("attn/proj/kernel", P(MODEL_AXIS, None)),
    ("mlp/fc1/kernel", P(None, MODEL_AXIS)),
    ("mlp/fc1/bias", P(MODEL_AXIS)),
    # depthwise 3x3 between the FCs: kernel [kh, kw, 1, hidden] acts
    # per-channel, so it shards with the hidden (column) dimension
    ("mlp/dwconv/kernel", P(None, None, None, MODEL_AXIS)),
    ("mlp/dwconv/bias", P(MODEL_AXIS)),
    ("mlp/fc2/kernel", P(MODEL_AXIS, None)),
    # --- DOFA ViT (DenseGeneral QKV [D, H, hd]: shard the head axis) ---
    ("attn/query/kernel", P(None, MODEL_AXIS, None)),
    ("attn/query/bias", P(MODEL_AXIS, None)),
    ("attn/key/kernel", P(None, MODEL_AXIS, None)),
    ("attn/key/bias", P(MODEL_AXIS, None)),
    ("attn/value/kernel", P(None, MODEL_AXIS, None)),
    ("attn/value/bias", P(MODEL_AXIS, None)),
    ("attn/out/kernel", P(MODEL_AXIS, None, None)),
    ("mlp_fc1/kernel", P(None, MODEL_AXIS)),
    ("mlp_fc1/bias", P(MODEL_AXIS)),
    ("mlp_fc2/kernel", P(MODEL_AXIS, None)),
]


def _divisible(shape: tuple, spec: P, mesh: Mesh) -> bool:
    """A spec is usable only if every sharded dim divides evenly."""
    if len(spec) > len(shape):
        return False
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        if dim % size != 0:
            return False
    return True


def _path_name(path) -> str:
    """Join a tree path into a '/'-separated rule-matchable string."""
    return "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)


def _match_spec(name: str, shape: tuple, mesh: Mesh, rules: list | None) -> P:
    """First matching rule's spec if its sharded dims divide the mesh
    axis; replicated otherwise. Single source of truth for every rule
    consumer (shard_params_spec / shard_params / place_state)."""
    for substr, spec in rules or []:
        if substr in name:
            return spec if _divisible(tuple(shape), spec, mesh) else P()
    return P()


def shard_params_spec(params: Any, mesh: Mesh, rules: list | None = None) -> Any:
    """PartitionSpec tree for parameters.

    With no rules (default) everything is replicated — correct for DP.
    ``rules`` is a list of ``(path_substring, PartitionSpec)`` pairs
    (first match wins); pass ``TENSOR_PARALLEL_RULES`` for the built-in
    Megatron-style transformer layout. Rules whose sharded dims do not
    divide the mesh axis fall back to replicated for that leaf.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = [
        _match_spec(_path_name(p), getattr(leaf, "shape", ()), mesh, rules)
        for p, leaf in flat[0]
    ]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def shard_params(params: Any, mesh: Mesh, rules: list | None = None) -> Any:
    """Place parameters on the mesh according to ``rules``.

    The returned tree carries real ``NamedSharding``s, so an optimizer
    initialized from it (``zeros_like``) and a jitted step consuming it
    inherit the tensor-parallel layout end to end.
    """
    specs = shard_params_spec(params, mesh, rules)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def count_model_sharded(params: Any) -> int:
    """Number of param leaves actually sharded over the model axis."""

    def _uses_model(leaf) -> bool:
        sharding = getattr(leaf, "sharding", None)
        spec = getattr(sharding, "spec", None)
        if spec is None:
            return False
        for axis in spec:
            axes = axis if isinstance(axis, tuple) else (axis,)
            if MODEL_AXIS in axes:
                return True
        return False

    return sum(_uses_model(leaf) for leaf in jax.tree.leaves(params))


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Place a train state fully replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding)
        if isinstance(x, (jax.Array, np.ndarray))
        else x,
        state,
    )


def place_state(state: Any, mesh: Mesh, rules: list | None = None) -> Any:
    """Place a FULL train state on the mesh under tensor-parallel rules.

    Walks every array leaf of the state by path. Rules are param-path
    substrings, and optimizer moments (optax adam ``mu``/``nu`` etc.)
    carry the param path as a suffix of their own tree path, so one walk
    lays out params AND optimizer state consistently; everything else
    (step counter, rng, batch_stats, schedule counts) is replicated.
    With no rules this degenerates to :func:`replicate_state` (pure DP).
    """
    if not rules:
        return replicate_state(state, mesh)

    def place(path, leaf):
        if not isinstance(leaf, (jax.Array, np.ndarray)):
            return leaf
        spec = _match_spec(
            _path_name(path), getattr(leaf, "shape", ()), mesh, rules
        )
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, state)


def model_axis_size(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]
