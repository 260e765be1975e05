"""Jitted train/eval step factories.

The hot loop of the framework. Everything the reference scatters over
Lightning hooks — Kornia host-side augmentation (``on_before_batch_transfer``),
forward, loss, DDP allreduce, optimizer step, grad clip, metric reduction —
is ONE fused XLA program here:

- augmentation runs on device inside the step (keyed from ``state.rng``),
- gradient sync is implicit: the batch is sharded over the mesh's data
  axis, so XLA inserts the psum during the backward pass (the NCCL
  bucketed-allreduce equivalent, fused with compute),
- the whole train state is donated, so parameters/optimizer state are
  updated in place in HBM,
- metrics come back as small scalars/confusion matrices, already globally
  reduced.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from geo_deep_learning_tpu.core.mesh import use_compute_mesh
from geo_deep_learning_tpu.core.precision import PrecisionPolicy
from geo_deep_learning_tpu.core.train_state import TrainState
from geo_deep_learning_tpu.ops.augment import AugmentConfig, apply_augmentations
from geo_deep_learning_tpu.ops.metrics import confusion_matrix, logits_to_preds
from geo_deep_learning_tpu.ops.pallas.preprocess import fused_normalize_standardize
from geo_deep_learning_tpu.training.task import SegmentationTask

# batch keys consumed by the jitted step; everything else (image names,
# metadata strings) stays on host
_DEVICE_KEYS = ("image", "mask", "wavelengths", "mean", "std", "valid_count")


def device_batch(batch: dict) -> dict:
    return {k: batch[k] for k in _DEVICE_KEYS if k in batch}




def _prepare_image(batch: dict, precision: PrecisionPolicy) -> jnp.ndarray:
    """Host-normalized float images cast to compute dtype; raw uint8 images
    go through the fused on-device normalize+standardize kernel (4x less
    host->device traffic — ships bytes, not floats)."""
    image = batch["image"]
    if image.dtype == jnp.uint8:
        return fused_normalize_standardize(
            image, batch["mean"], batch["std"], out_dtype=precision.compute_dtype
        )
    return precision.cast_input(image)


def make_train_step(
    task: SegmentationTask,
    precision: PrecisionPolicy,
    augment: AugmentConfig | None = AugmentConfig(),
    freeze_patterns: list[str] | None = None,
    mesh=None,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Build the jitted training step (donates the state).

    ``mesh``: the GSPMD mesh the step runs over. Declaring it lets the
    Pallas kernels shard_map themselves per-device on multi-chip runs
    (ops/pallas/spmd.py); single-device meshes cost nothing.

    ``freeze_patterns``: param-path substrings to freeze. Beyond the
    optimizer mask (training/optim.py ``freeze_mask``), frozen subtrees
    get ``stop_gradient`` inside the loss, so XLA dead-code-eliminates
    their entire backward pass — matching the reference's
    ``requires_grad=False`` cost profile (its frozen DOFA encoder never
    runs backward, configs/dofa_config_RGB.yaml:57). BN statistics under
    frozen modules still update, as in the reference's train() mode.
    """

    def _freeze(params):
        if not freeze_patterns:
            return params

        def maybe_stop(path, leaf):
            name = "/".join(
                str(getattr(p, "key", getattr(p, "idx", ""))) for p in path
            )
            if any(s in name for s in freeze_patterns):
                return jax.lax.stop_gradient(leaf)
            return leaf

        return jax.tree_util.tree_map_with_path(maybe_stop, params)

    def train_step(state: TrainState, batch: dict):
        with use_compute_mesh(mesh):
            return _train_step(state, batch)

    def _train_step(state: TrainState, batch: dict):
        rng_aug, rng_drop, rng_next = jax.random.split(state.rng, 3)
        image = _prepare_image(batch, precision)
        mask = batch["mask"]
        if augment is not None:
            image, mask = apply_augmentations(rng_aug, image, mask, augment)
        fwd_batch = dict(batch)
        fwd_batch["image"] = image

        def loss_fn(params):
            variables = {"params": _freeze(params)}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, updates = task.forward(
                variables,
                fwd_batch,
                train=True,
                rngs={"dropout": rng_drop},
                mutable=["batch_stats"],
            )
            loss = task.compute_loss(out, mask)
            return loss, updates.get("batch_stats", state.batch_stats)

        (loss, new_batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(
            grads, batch_stats=new_batch_stats, rng=rng_next
        )
        metrics = {"loss": loss.astype(jnp.float32)}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=0)


def make_eval_step(
    task: SegmentationTask,
    precision: PrecisionPolicy,
    mesh=None,
) -> Callable[[TrainState, dict], dict]:
    """Build the jitted eval step: loss + confusion-matrix contribution.

    The confusion matrix is additive, so the caller accumulates it across
    batches and derives dataset-level IoU — fixing the reference's
    per-batch-reset quirk (SURVEY.md §7) while :func:`batch_metrics` in
    ops.metrics still offers the quirk-parity per-batch IoU.

    ``preds`` is always part of the output: it stays in HBM (no
    device->host transfer) unless the caller fetches it, and returning it
    unconditionally means ONE compiled eval program serves both the metric
    loop and visualization (compile latency is this environment's pain
    point — a preds-only variant used to cost a second full compile).
    """

    n = task.eval_classes

    def eval_step(state: TrainState, batch: dict):
        with use_compute_mesh(mesh):
            return _eval_step(state, batch)

    def _eval_step(state: TrainState, batch: dict):
        image = _prepare_image(batch, precision)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        fwd_batch = dict(batch)
        fwd_batch["image"] = image
        out = task.forward(variables, fwd_batch, train=False)
        # padded tail batches (static shapes) carry valid_count; pad
        # samples are masked out of BOTH the loss and the metric — the
        # loss drives early stopping / plateau LR / best-checkpoint, so
        # letting wraparound pads double-weight their source samples
        # would bias model selection
        weights = None
        if "valid_count" in batch:
            b = batch["mask"].shape[0]
            weights = (jnp.arange(b) < batch["valid_count"]).astype(jnp.float32)
        loss = task.compute_loss(out, batch["mask"], sample_weights=weights)
        preds = logits_to_preds(out.out, task.num_classes, task.threshold)
        cm = confusion_matrix(preds, batch["mask"], n, sample_weights=weights)
        return {
            "loss": loss.astype(jnp.float32),
            "confusion": cm,
            "preds": preds,
        }

    return jax.jit(eval_step)


def make_predict_step(task: SegmentationTask, precision: PrecisionPolicy, mesh=None):
    def predict_step(state: TrainState, batch: dict):
        with use_compute_mesh(mesh):
            return _predict_step(state, batch)

    def _predict_step(state: TrainState, batch: dict):
        image = _prepare_image(batch, precision)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        fwd_batch = dict(batch)
        fwd_batch["image"] = image
        out = task.forward(variables, fwd_batch, train=False)
        if task.num_classes == 1:
            probs = jax.nn.sigmoid(out.out)
        else:
            probs = jax.nn.softmax(out.out, axis=-1)
        preds = logits_to_preds(out.out, task.num_classes, task.threshold)
        return {"probs": probs, "preds": preds}

    return jax.jit(predict_step)
