"""Worker process for tests/test_multihost.py.

One of two ``jax.distributed`` processes (gloo CPU collectives, 2 local
devices each → 4 global). Exercises, end to end, the distributed pieces
the reference delegates to Lightning DDP + webdataset node splitting
(reference: datasets/wds_dataset.py:397-406, torch.distributed rank
queries):

- ``core.mesh.initialize_distributed`` (jax.distributed bring-up),
- ``ShardedDataset._assigned_shards`` per-process shard striding,
- ``core.mesh.local_batch_to_global`` global-array assembly,
- one jitted train step whose loss is a GLOBAL collective result —
  printed so the parent can assert both processes agree.

Invoked as: python _multihost_worker.py <pid> <coordinator> <shard_dir>
with XLA_FLAGS=--xla_force_host_platform_device_count=2.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main() -> None:
    pid, coord, shard_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from geo_deep_learning_tpu.core.mesh import (
        MeshConfig,
        create_mesh,
        initialize_distributed,
        local_batch_to_global,
    )

    initialize_distributed(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np

    from geo_deep_learning_tpu.data.shard_dataset import ShardedDataset

    shards = sorted(str(p) for p in Path(shard_dir).glob("*.tar"))
    ds = ShardedDataset(
        sensor_name="geoeye",
        shard_paths=shards,
        patch_count=8,
        normalization_stats_path=str(Path(shard_dir) / "stats.json"),
        model_type="unified",
        split="trn",
        batch_size=4,
        shuffle_buffer=0,
        shardshuffle=None,
    )
    assigned = ds._assigned_shards(epoch=0)

    # local batch from THIS process's shards only
    images, masks = [], []
    from geo_deep_learning_tpu.data.shard_dataset import iter_tar_samples

    for shard in assigned:
        for sample in iter_tar_samples(shard):
            out = ds.process_sample(sample)
            images.append(np.asarray(out["image"], np.float32))
            masks.append(np.asarray(out["mask"], np.int32))
    local = {"image": np.stack(images), "mask": np.stack(masks)}

    import flax.linen as nn
    import jax.numpy as jnp

    from geo_deep_learning_tpu.core.precision import PrecisionPolicy
    from geo_deep_learning_tpu.core.train_state import TrainState
    from geo_deep_learning_tpu.models.base import SegmentationOutput
    from geo_deep_learning_tpu.ops.losses import dice_loss
    from geo_deep_learning_tpu.parallel import replicate_state
    from geo_deep_learning_tpu.training.optim import build_optimizer
    from geo_deep_learning_tpu.training.steps import make_train_step
    from geo_deep_learning_tpu.training.task import SegmentationTask

    class TinyModel(nn.Module):
        num_classes: int = 3

        @nn.compact
        def __call__(self, x, train: bool = False):
            h = nn.Conv(8, (3, 3), padding="SAME", name="conv1")(x)
            h = nn.relu(h)
            logits = nn.Conv(self.num_classes, (1, 1), name="head")(h)
            return SegmentationOutput(out=logits, aux=None)

    mesh = create_mesh(MeshConfig())
    task = SegmentationTask(model=TinyModel(), loss=dice_loss, num_classes=3)
    variables = task.init_variables(jax.random.PRNGKey(0), local)
    tx = build_optimizer(variables["params"], optimizer="adam", lr=1e-3)
    state = TrainState.create(
        apply_fn=task.model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
        rng=jax.random.PRNGKey(1),
    )
    state = replicate_state(state, mesh)
    step = make_train_step(task, PrecisionPolicy.create("32-true"), augment=None)

    with mesh:
        batch = local_batch_to_global(local, mesh)
        assert batch["image"].shape[0] == 2 * local["image"].shape[0]
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])

    print(
        "RESULT "
        + json.dumps(
            {
                "pid": pid,
                "loss": loss,
                "assigned": [Path(s).name for s in assigned],
                "local_batch": int(local["image"].shape[0]),
                "global_batch": int(batch["image"].shape[0]),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
