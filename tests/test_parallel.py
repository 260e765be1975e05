"""Parallel helpers: shardings, placement, multi-host assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
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


def _one_train_step(task, mesh, batch, variables, *, tp_rules=None):
    """One full f32 train step of ``task`` on ``mesh``; returns
    (loss, new_state). Params placed per ``tp_rules`` (None = DP)."""
    from geo_deep_learning_tpu.core.precision import PrecisionPolicy
    from geo_deep_learning_tpu.core.train_state import TrainState
    from geo_deep_learning_tpu.parallel import shard_params
    from geo_deep_learning_tpu.training.optim import build_optimizer
    from geo_deep_learning_tpu.training.steps import make_train_step

    params = shard_params(
        jax.tree.map(np.asarray, variables["params"]), mesh, rules=tp_rules
    )
    tx = build_optimizer(params, optimizer="adam", lr=1e-4, grad_clip=1.0)
    state = TrainState.create(
        apply_fn=task.model.apply,
        params=params,
        tx=tx,
        # fresh device arrays per call: the train step donates its state,
        # so reusing `variables`' jnp arrays across calls would hand a
        # deleted buffer to the second invocation
        batch_stats=jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a)),
            variables.get("batch_stats", {}),
        ),
        rng=jax.random.PRNGKey(1),
    )
    step_fn = make_train_step(
        task, PrecisionPolicy.create("32-true"), augment=None, mesh=mesh
    )
    new_state, metrics = step_fn(state, shard_batch(batch, mesh))
    return float(metrics["loss"]), new_state


def test_unetpp_sync_bn_multi_device_matches_single():
    """UNet++ under the 8-device data mesh is sync-BN by construction
    (reference: ``sync_batchnorm: true``, configs/dofa_config_RGB.yaml:13):
    one train step computes batch statistics over the GLOBAL batch, so
    the loss AND every updated batch_stats leaf match the 1-device run
    on the same batch exactly (up to f32 reduction order)."""
    from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus
    from geo_deep_learning_tpu.ops.losses import dice_loss
    from geo_deep_learning_tpu.training.task import SegmentationTask

    model = UnetPlusPlus(encoder_name="resnet18", num_classes=3)
    task = SegmentationTask(model=model, loss=dice_loss, num_classes=3)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(8, 64, 64, 3)).astype(np.float32),
        "mask": rng.integers(0, 3, size=(8, 64, 64)).astype(np.int32),
    }
    variables = task.init_variables(jax.random.PRNGKey(0), batch)

    mesh8 = create_mesh(MeshConfig())
    mesh1 = create_mesh(MeshConfig(data=1), devices=jax.devices()[:1])
    loss8, state8 = _one_train_step(task, mesh8, batch, variables)
    loss1, state1 = _one_train_step(task, mesh1, batch, variables)

    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)
    flat8 = jax.tree_util.tree_flatten_with_path(state8.batch_stats)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(state1.batch_stats)[0]
    assert flat8 and len(flat8) == len(flat1)
    for (pa, a), (pb, b) in zip(flat8, flat1):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
            err_msg=str(pa),
        )


@pytest.mark.slow  # DOFA-base ×2 train-step compiles ≈ minutes on CPU;
# the quick lane's dryrun_multichip covers the same TP-through-step path
def test_dofa_tensor_parallel_train_step_matches_dp():
    """DOFA-base (the model TP matters most for): TENSOR_PARALLEL_RULES
    actually shard the ViT QKV/MLP kernels over "model", the layout
    survives a full train step (main + 0.4·aux loss, wavelength-
    conditioned embed), and the loss matches pure DP."""
    from geo_deep_learning_tpu.models.segmentation.dofa import DOFASegmentation
    from geo_deep_learning_tpu.ops.losses import dice_loss
    from geo_deep_learning_tpu.parallel import (
        TENSOR_PARALLEL_RULES,
        count_model_sharded,
        shard_params,
    )
    from geo_deep_learning_tpu.training.task import SegmentationTask

    model = DOFASegmentation(encoder_name="dofa_base", num_classes=3)
    task = SegmentationTask(model=model, loss=dice_loss, num_classes=3)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(8, 64, 64, 3)).astype(np.float32),
        "mask": rng.integers(0, 3, size=(8, 64, 64)).astype(np.int32),
        "wavelengths": np.asarray([0.665, 0.549, 0.481], np.float32),
    }
    variables = task.init_variables(jax.random.PRNGKey(0), batch)

    mesh = create_mesh(MeshConfig(data=4, model=2))
    # the rules hit the ViT blocks: DenseGeneral QKV (head-axis) + MLP
    tp = shard_params(
        variables["params"], mesh, rules=TENSOR_PARALLEL_RULES
    )
    n = count_model_sharded(tp)
    assert n > 0, "no DOFA ViT param sharded over the model axis"
    blk = tp["encoder"]["block0"]
    assert blk["attn"]["query"]["kernel"].sharding.spec == P(
        None, "model", None
    )
    assert blk["mlp_fc1"]["kernel"].sharding.spec == P(None, "model")
    assert blk["mlp_fc2"]["kernel"].sharding.spec == P("model", None)

    tp_loss, tp_state = _one_train_step(
        task, mesh, batch, variables, tp_rules=TENSOR_PARALLEL_RULES
    )
    assert count_model_sharded(tp_state.params) > 0, "TP layout lost"
    dp_loss, _ = _one_train_step(task, mesh, batch, variables)
    np.testing.assert_allclose(tp_loss, dp_loss, rtol=1e-5)
