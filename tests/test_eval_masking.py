"""Eval-step padding mask: wraparound-padded tail samples must not bias
``val_loss`` (VERDICT r2 #5 — the loss drives early stopping, plateau LR,
and best-checkpoint selection; the confusion matrix was already masked).

Reference behavior being matched: Lightning evaluates a genuinely smaller
final DataLoader batch (``.batched(bs, partial=split != "trn")``,
/root/reference/geo_deep_learning/datasets/wds_dataset.py:423); our static
shapes pad-and-mask instead.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from geo_deep_learning_tpu.core.precision import PrecisionPolicy
from geo_deep_learning_tpu.core.train_state import TrainState
from geo_deep_learning_tpu.models.base import SegmentationOutput
from geo_deep_learning_tpu.ops.losses import DiceLoss
from geo_deep_learning_tpu.training.steps import make_eval_step
from geo_deep_learning_tpu.training.task import SegmentationTask


class _TinySeg(nn.Module):
    num_classes: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.num_classes, (1, 1))(x)
        return SegmentationOutput(out=y, aux=None)


def _make(loss):
    task = SegmentationTask(model=_TinySeg(), loss=loss, num_classes=3)
    rng = jax.random.PRNGKey(0)
    img = np.zeros((4, 8, 8, 3), np.float32)
    variables = task.init_variables(rng, {"image": img})
    import optax

    state = TrainState.create(
        apply_fn=task.model.apply,
        params=variables["params"],
        tx=optax.sgd(1e-3),
        batch_stats={},
        rng=rng,
    )
    step = make_eval_step(task, PrecisionPolicy.create("32-true"))
    return task, state, step


def _batches():
    rng = np.random.default_rng(3)
    image = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    mask = rng.integers(0, 3, size=(4, 8, 8)).astype(np.int32)
    # wraparound pad: the last sample duplicates the first
    image[3] = image[0]
    mask[3] = mask[0]
    return image, mask


def test_eval_loss_ignores_padded_samples():
    task, state, step = _make(DiceLoss(mode="multiclass"))
    image, mask = _batches()
    padded = {
        "image": jnp.asarray(image),
        "mask": jnp.asarray(mask),
        "valid_count": jnp.asarray(3),
    }
    out = step(state, padded)
    # ground truth: eval the genuinely smaller batch (no padding at all)
    small = {"image": jnp.asarray(image[:3]), "mask": jnp.asarray(mask[:3])}
    out_small = step(state, small)
    np.testing.assert_allclose(
        float(out["loss"]), float(out_small["loss"]), rtol=1e-5
    )
    # and the old (unmasked) behavior measurably differs on this batch,
    # i.e. the test would fail against the pre-fix code
    unmasked = {"image": jnp.asarray(image), "mask": jnp.asarray(mask)}
    out_full = step(state, unmasked)
    assert abs(float(out_full["loss"]) - float(out_small["loss"])) > 1e-7


def test_eval_loss_custom_callable_falls_back():
    """A loss callable without sample_weights support still evaluates."""

    def plain_ce(logits, targets):
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)
        return jnp.mean(nll)

    task, state, step = _make(plain_ce)
    image, mask = _batches()
    out = step(
        state,
        {
            "image": jnp.asarray(image),
            "mask": jnp.asarray(mask),
            "valid_count": jnp.asarray(3),
        },
    )
    assert np.isfinite(float(out["loss"]))


def test_fresh_fit_resets_stale_best(tmp_path):
    """A fresh fit into a dir holding an earlier run's checkpoints must
    not restore that run's (possibly tree-incompatible) best at
    auto-test time (found driving the CLI with a changed scheduler:
    Orbax tree-structure mismatch on restore)."""
    import json

    from geo_deep_learning_tpu.training.checkpoint import CheckpointManager

    d = tmp_path / "ckpts"
    d.mkdir()
    (d / "index.json").write_text(
        json.dumps(
            {
                "best_score": 0.001,  # unbeatably good stale best
                "best_path": str(d / "model-epoch=00-val_loss=0.001"),
                "monitor": "val_loss",
            }
        )
    )
    mgr = CheckpointManager(d)
    assert mgr.best_score == 0.001  # index load still works (resume path)
    mgr.reset_best()
    assert mgr.best_score is None and mgr.best_path is None
    # and the reset persists so save() can beat it
    mgr2 = CheckpointManager(d)
    assert mgr2.best_score is None
