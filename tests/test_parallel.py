"""Parallel helpers: shardings, placement, multi-host assembly."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from geo_deep_learning_tpu.core.mesh import MeshConfig, create_mesh, shard_batch
from geo_deep_learning_tpu.parallel import (
    batch_sharding,
    local_batch_to_global,
    replicate_state,
    shard_params_spec,
)


def test_batch_sharding_places_on_data_axis():
    mesh = create_mesh(MeshConfig())
    batch = {"image": np.ones((16, 8, 8, 3), np.float32), "name": ["a"] * 16}
    out = shard_batch(batch, mesh)
    assert out["image"].sharding.spec == P("data")
    assert out["name"] == ["a"] * 16  # non-arrays untouched


def test_local_batch_to_global_single_process():
    mesh = create_mesh(MeshConfig())
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    out = local_batch_to_global(batch, mesh)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    assert out["x"].sharding.spec == P("data")


def test_shard_params_spec_rules():
    mesh = create_mesh(MeshConfig(data=4, model=2))
    params = {
        "encoder": {"attn": {"kernel": jnp.ones((8, 8))}},
        "head": {"kernel": jnp.ones((8, 2))},
    }
    specs = shard_params_spec(params, mesh, rules=[("attn", P(None, "model"))])
    assert specs["encoder"]["attn"]["kernel"] == P(None, "model")
    assert specs["head"]["kernel"] == P()


def test_replicate_state():
    mesh = create_mesh(MeshConfig())
    tree = {"w": jnp.ones((4, 4)), "step": jnp.zeros(())}
    out = replicate_state(tree, mesh)
    assert out["w"].sharding.spec == P()
    # every device holds the full value
    assert len(out["w"].sharding.device_set) == 8


def test_data_parallel_global_reduction():
    """Batch-sharded reduction under jit equals the full-batch value —
    XLA inserts the cross-device collective (the DDP allreduce analog)."""
    mesh = create_mesh(MeshConfig())
    x = np.random.default_rng(0).normal(size=(16, 32)).astype(np.float32)
    sharded = shard_batch({"x": x}, mesh)["x"]

    @jax.jit
    def mean_all(v):
        return jnp.mean(v)

    np.testing.assert_allclose(float(mean_all(sharded)), x.mean(), atol=1e-6)
