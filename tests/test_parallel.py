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


def test_tensor_parallel_rules_shard_mit_params():
    """TENSOR_PARALLEL_RULES produce a real model-axis layout for MiT:
    QKV/FC1 column-sharded, proj/FC2 row-sharded, rest replicated."""
    from geo_deep_learning_tpu.models.segmentation.segformer import SegFormer
    from geo_deep_learning_tpu.parallel import (
        TENSOR_PARALLEL_RULES,
        count_model_sharded,
        shard_params,
    )

    mesh = create_mesh(MeshConfig(data=4, model=2))
    model = SegFormer(encoder_name="mit_b0", num_classes=3)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = shard_params(variables["params"], mesh, rules=TENSOR_PARALLEL_RULES)

    n = count_model_sharded(params)
    assert n > 0
    enc = params["encoder"]
    blk = enc["block1_0"]
    assert blk["attn"]["q"]["kernel"].sharding.spec == P(None, "model")
    assert blk["attn"]["proj"]["kernel"].sharding.spec == P("model", None)
    assert blk["mlp"]["fc1"]["kernel"].sharding.spec == P(None, "model")
    assert blk["mlp"]["fc2"]["kernel"].sharding.spec == P("model", None)
    # non-transformer params stay replicated
    assert enc["patch_embed1"]["proj"]["kernel"].sharding.spec == P()


def test_tensor_parallel_train_step_matches_replicated():
    """One full train step with model=2 TP sharding: runs, stays sharded,
    and the loss matches the pure-DP (replicated-params) step — XLA's
    collectives preserve the math exactly."""
    from geo_deep_learning_tpu.core.precision import PrecisionPolicy
    from geo_deep_learning_tpu.core.train_state import TrainState
    from geo_deep_learning_tpu.models.segmentation.segformer import SegFormer
    from geo_deep_learning_tpu.ops.losses import dice_loss
    from geo_deep_learning_tpu.parallel import (
        TENSOR_PARALLEL_RULES,
        count_model_sharded,
        replicate_state,
        shard_params,
    )
    from geo_deep_learning_tpu.training.optim import build_optimizer
    from geo_deep_learning_tpu.training.steps import make_train_step
    from geo_deep_learning_tpu.training.task import SegmentationTask

    mesh = create_mesh(MeshConfig(data=4, model=2))
    model = SegFormer(encoder_name="mit_b0", num_classes=3)
    task = SegmentationTask(model=model, loss=dice_loss, num_classes=3)
    batch = {
        "image": np.random.default_rng(0).normal(size=(8, 64, 64, 3)).astype(np.float32),
        "mask": np.random.default_rng(1).integers(0, 3, size=(8, 64, 64)).astype(np.int32),
    }
    variables = task.init_variables(jax.random.PRNGKey(0), batch)
    # the step donates its state; keep a host copy so each run gets
    # fresh device buffers
    params_np = jax.tree.map(np.asarray, variables["params"])
    stats_np = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    step_fn = make_train_step(task, PrecisionPolicy.create("32-true"), augment=None)

    def run(params_placed):
        tx = build_optimizer(params_placed, optimizer="adam", lr=1e-4, grad_clip=1.0)
        state = TrainState.create(
            apply_fn=model.apply, params=params_placed, tx=tx,
            batch_stats=jax.tree.map(jnp.asarray, stats_np),
            rng=jax.random.PRNGKey(1),
        )
        new_state, metrics = step_fn(state, shard_batch(batch, mesh))
        return new_state, float(metrics["loss"])

    tp_params = shard_params(params_np, mesh, rules=TENSOR_PARALLEL_RULES)
    assert count_model_sharded(tp_params) > 0
    tp_state, tp_loss = run(tp_params)
    assert count_model_sharded(tp_state.params) > 0, "TP layout lost through step"

    dp_params = shard_params(params_np, mesh, rules=None)
    _, dp_loss = run(dp_params)
    np.testing.assert_allclose(tp_loss, dp_loss, rtol=1e-5)
