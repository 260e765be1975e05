"""Segmentation metrics as jit-friendly streaming PyTrees.

Replaces the reference's torchmetrics ``MeanIoU(per_class=True)`` +
``ClasswiseWrapper`` (reference tasks_with_models/segmentation_dofa.py:71-85).
Design: a confusion-matrix accumulator PyTree that is (a) pure-functional
so it lives inside the jitted step, and (b) additive, so cross-device
aggregation is a single ``psum``/sum over the data axis — the TPU-native
analog of ``sync_dist=True``.

Two IoU flavors are exposed because the reference has a quirk
(SURVEY.md §7): its test loop computes and *resets* the metric every batch,
so logged IoU is a mean of per-batch IoUs, not a dataset-level IoU.

- :func:`iou_from_confusion` on an accumulated matrix → true dataset IoU.
- :func:`batch_mean_iou` → per-batch IoU for reference-parity comparisons.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_matrix(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    num_classes: int,
    sample_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Dense ``[C, C]`` confusion matrix (rows = target, cols = pred).

    Implemented as a one-hot matmul so it runs on the MXU instead of a
    scatter (TPU scatters serialize; a ``[N, C]ᵀ @ [N, C]`` dot does not).

    ``sample_weights`` (leading-dim vector, e.g. 0/1 validity of padded
    eval samples) scales each sample's pixel contributions.
    """
    b = preds.shape[0]
    p = preds.reshape(-1)
    t = targets.reshape(-1)
    t_oh = jax.nn.one_hot(t, num_classes, dtype=jnp.float32)
    p_oh = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
    if sample_weights is not None:
        per_pixel = jnp.repeat(
            sample_weights.astype(jnp.float32), p.shape[0] // b
        )
        t_oh = t_oh * per_pixel[:, None]
    return jnp.dot(t_oh.T, p_oh, preferred_element_type=jnp.float32)


def iou_from_confusion(cm: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Per-class IoU vector from a (possibly accumulated) confusion matrix.

    Classes absent from both target and prediction get IoU = NaN so callers
    can exclude them from means (torchmetrics convention).
    """
    tp = jnp.diag(cm)
    fp = jnp.sum(cm, axis=0) - tp
    fn = jnp.sum(cm, axis=1) - tp
    union = tp + fp + fn
    iou = tp / jnp.maximum(union, eps)
    return jnp.where(union > 0, iou, jnp.nan)


def mean_iou(cm: jnp.ndarray) -> jnp.ndarray:
    """Mean over classes present in target or prediction."""
    iou = iou_from_confusion(cm)
    return jnp.nanmean(iou)


def batch_mean_iou(
    preds: jnp.ndarray, targets: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """Per-class IoU of one batch (reference's per-batch-reset behavior)."""
    return iou_from_confusion(confusion_matrix(preds, targets, num_classes))


def logits_to_preds(logits: jnp.ndarray, num_classes: int, threshold: float = 0.5):
    """Logits → integer prediction map, matching the reference's inference
    rule (segmentation_dofa.py:309-312): sigmoid>threshold when binary
    (C==1), otherwise channel argmax."""
    if logits.shape[-1] == 1:
        return (jax.nn.sigmoid(logits[..., 0]) > threshold).astype(jnp.int32)
    del num_classes
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def accuracy_from_confusion(cm: jnp.ndarray) -> jnp.ndarray:
    return jnp.trace(cm) / jnp.maximum(jnp.sum(cm), 1.0)


def f1_from_confusion(cm: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Per-class F1 from a confusion matrix."""
    tp = jnp.diag(cm)
    fp = jnp.sum(cm, axis=0) - tp
    fn = jnp.sum(cm, axis=1) - tp
    denom = 2 * tp + fp + fn
    f1 = 2 * tp / jnp.maximum(denom, eps)
    return jnp.where(denom > 0, f1, jnp.nan)


def classwise(values: jnp.ndarray, class_labels: list[str] | None, prefix: str):
    """Format a per-class metric vector as a ``{name: scalar}`` dict —
    the reference's ``ClasswiseWrapper`` naming scheme."""
    n = values.shape[0]
    labels = class_labels if class_labels else [str(i) for i in range(n)]
    return {f"{prefix}_{labels[i]}": values[i] for i in range(n)}
