"""Segmentation losses.

The reference imports these from ``segmentation_models_pytorch.losses``
(reference configs/dofa_config_RGB.yaml:58-61 uses ``DiceLoss(mode=
"multiclass")``; the quickstart notebook uses ``SoftCrossEntropyLoss``).
We implement them natively with matching semantics so configs translate
1:1, as pure functions over logits that fuse into the jitted train step.

Conventions: logits are NHWC ``[B, H, W, C]`` (or ``[B, H, W, 1]`` binary),
targets are integer class maps ``[B, H, W]`` (binary: {0,1}).
All losses return a scalar in f32.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

_EPS = 1e-7

BINARY_MODE = "binary"
MULTICLASS_MODE = "multiclass"


def _sample_w(sample_weights, targets) -> jnp.ndarray | None:
    """Broadcastable ``[B, 1, ...]`` per-sample weight (None if absent).

    Used to mask wraparound-padded tail samples out of eval losses (the
    static-shape equivalent of the reference evaluating a genuinely
    smaller final DataLoader batch): a zero weight removes the sample's
    contribution exactly, matching how ``valid_count`` already masks the
    confusion matrix in ops/metrics.py.
    """
    if sample_weights is None:
        return None
    w = jnp.asarray(sample_weights, jnp.float32)
    return w.reshape((targets.shape[0],) + (1,) * (targets.ndim - 1))


def _soft_probs(logits: jnp.ndarray, mode: str) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    if mode == BINARY_MODE:
        return jax.nn.sigmoid(logits)
    # log-space softmax then exp: matches smp's log_softmax().exp() which is
    # numerically safer than plain softmax for extreme logits
    return jnp.exp(jax.nn.log_softmax(logits, axis=-1))


def dice_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mode: str = MULTICLASS_MODE,
    smooth: float = 0.0,
    eps: float = _EPS,
    log_loss: bool = False,
    ignore_index: int | None = None,
    sample_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Soft Dice loss with smp-compatible aggregation.

    Per-class dice computed over (batch, spatial) jointly, then averaged
    over classes — the same aggregation smp's ``DiceLoss`` uses (dims
    ``(0, 2)`` of a ``[B, C, H*W]`` layout). ``sample_weights`` ([B],
    0/1) restricts the joint aggregation to valid samples exactly.
    """
    probs = _soft_probs(logits, mode)
    b = probs.shape[0]
    c = probs.shape[-1]
    probs = probs.reshape(b, -1, c)  # [B, HW, C]
    if mode == BINARY_MODE:
        onehot = targets.reshape(b, -1, 1).astype(jnp.float32)
    else:
        onehot = jax.nn.one_hot(targets.reshape(b, -1), c, dtype=jnp.float32)
    if ignore_index is not None:
        valid = (targets.reshape(b, -1, 1) != ignore_index).astype(jnp.float32)
        probs = probs * valid
        onehot = onehot * valid
    if sample_weights is not None:
        w = jnp.asarray(sample_weights, jnp.float32).reshape(b, 1, 1)
        probs = probs * w
        onehot = onehot * w

    intersection = jnp.sum(probs * onehot, axis=(0, 1))  # per class
    cardinality = jnp.sum(probs + onehot, axis=(0, 1))
    dice = (2.0 * intersection + smooth) / jnp.maximum(cardinality + smooth, eps)
    loss = -jnp.log(jnp.maximum(dice, eps)) if log_loss else 1.0 - dice
    return jnp.mean(loss)


def jaccard_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mode: str = MULTICLASS_MODE,
    smooth: float = 0.0,
    eps: float = _EPS,
    sample_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Soft IoU (Jaccard) loss, same aggregation as :func:`dice_loss`."""
    probs = _soft_probs(logits, mode)
    b, c = probs.shape[0], probs.shape[-1]
    probs = probs.reshape(b, -1, c)
    if mode == BINARY_MODE:
        onehot = targets.reshape(b, -1, 1).astype(jnp.float32)
    else:
        onehot = jax.nn.one_hot(targets.reshape(b, -1), c, dtype=jnp.float32)
    if sample_weights is not None:
        w = jnp.asarray(sample_weights, jnp.float32).reshape(b, 1, 1)
        probs = probs * w
        onehot = onehot * w
    intersection = jnp.sum(probs * onehot, axis=(0, 1))
    union = jnp.sum(probs + onehot, axis=(0, 1)) - intersection
    iou = (intersection + smooth) / jnp.maximum(union + smooth, eps)
    return jnp.mean(1.0 - iou)


def soft_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smooth_factor: float = 0.0,
    ignore_index: int | None = None,
    sample_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Label-smoothed cross entropy (smp ``SoftCrossEntropyLoss`` semantics).

    Smoothing distributes ``smooth_factor`` uniformly over all classes
    (including the true one), i.e. target = ``(1 - s) * onehot + s / C``.
    """
    logits = logits.astype(jnp.float32)
    c = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(targets, c, dtype=jnp.float32)
    soft_targets = (1.0 - smooth_factor) * onehot + smooth_factor / c
    nll = -jnp.sum(soft_targets * log_probs, axis=-1)  # [B, H, W]
    weights = _sample_w(sample_weights, targets)
    if ignore_index is not None:
        valid = (targets != ignore_index).astype(jnp.float32)
        weights = valid if weights is None else weights * valid
    if weights is not None:
        weights = jnp.broadcast_to(weights, nll.shape)
        return jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.mean(nll)


def cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int | None = None,
    class_weights: jnp.ndarray | None = None,
    sample_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Plain multiclass cross entropy over NHWC logits."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    # clamp the gather index so ignore_index values (often 255) stay in range;
    # their contribution is zeroed by the weight mask below
    safe = jnp.clip(targets, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(log_probs, safe[..., None], axis=-1)[..., 0]
    weights = jnp.ones_like(nll)
    if class_weights is not None:
        weights = weights * jnp.asarray(class_weights)[safe]
    if ignore_index is not None:
        weights = weights * (targets != ignore_index)
    sw = _sample_w(sample_weights, targets)
    if sw is not None:
        weights = weights * sw
    return jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def binary_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    sample_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """BCE-with-logits over ``[B, H, W, 1]`` logits and {0,1} targets."""
    logits = logits.astype(jnp.float32).squeeze(-1)
    t = targets.astype(jnp.float32)
    # stable formulation: max(x,0) - x*t + log1p(exp(-|x|))
    loss = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    w = _sample_w(sample_weights, t)
    if w is not None:
        w = jnp.broadcast_to(w, loss.shape)
        return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(loss)


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mode: str = MULTICLASS_MODE,
    alpha: float | None = None,
    gamma: float = 2.0,
    sample_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Focal loss for class-imbalanced segmentation."""
    logits = logits.astype(jnp.float32)
    if mode == BINARY_MODE:
        p = jax.nn.sigmoid(logits.squeeze(-1))
        t = targets.astype(jnp.float32)
        pt = p * t + (1 - p) * (1 - t)
        ce = -jnp.log(jnp.maximum(pt, _EPS))
        w = (1 - pt) ** gamma
        if alpha is not None:
            w = w * (alpha * t + (1 - alpha) * (1 - t))
        per_pixel = w * ce
    else:
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        logpt = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
        pt = jnp.exp(logpt)
        w = (1 - pt) ** gamma
        if alpha is not None:
            w = w * alpha
        per_pixel = -w * logpt
    sw = _sample_w(sample_weights, targets)
    if sw is not None:
        sw = jnp.broadcast_to(sw, per_pixel.shape)
        return jnp.sum(per_pixel * sw) / jnp.maximum(jnp.sum(sw), 1.0)
    return jnp.mean(per_pixel)


class _ConfiguredLoss:
    """Config-surface wrapper: lets YAML ``class_path``/``init_args`` name a
    loss exactly as the reference names smp loss classes."""

    fn: Callable = None
    name = "loss"

    def __init__(self, **kwargs):
        self.kwargs = kwargs

    def __call__(self, logits, targets, sample_weights=None):
        if sample_weights is not None:
            return type(self).fn(
                logits, targets, sample_weights=sample_weights, **self.kwargs
            )
        return type(self).fn(logits, targets, **self.kwargs)

    def __repr__(self):
        return f"{type(self).__name__}({self.kwargs})"


class DiceLoss(_ConfiguredLoss):
    fn = staticmethod(dice_loss)


class JaccardLoss(_ConfiguredLoss):
    fn = staticmethod(jaccard_loss)


class SoftCrossEntropyLoss(_ConfiguredLoss):
    fn = staticmethod(soft_cross_entropy)


class CrossEntropyLoss(_ConfiguredLoss):
    fn = staticmethod(cross_entropy)


class BinaryCrossEntropyLoss(_ConfiguredLoss):
    fn = staticmethod(binary_cross_entropy)


class FocalLoss(_ConfiguredLoss):
    fn = staticmethod(focal_loss)
