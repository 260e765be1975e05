"""Metric tests: confusion matrix, IoU, reference parity quirks."""

import jax.numpy as jnp
import numpy as np

from geo_deep_learning_tpu.ops import metrics


def test_confusion_matrix_basic():
    preds = jnp.array([[0, 1], [1, 1]])
    targets = jnp.array([[0, 1], [0, 1]])
    cm = metrics.confusion_matrix(preds, targets, 2)
    np.testing.assert_allclose(np.asarray(cm), [[1, 1], [0, 2]])


def test_iou_perfect():
    preds = jnp.array([0, 1, 2, 2])
    cm = metrics.confusion_matrix(preds, preds, 3)
    iou = metrics.iou_from_confusion(cm)
    np.testing.assert_allclose(np.asarray(iou), [1.0, 1.0, 1.0])


def test_iou_absent_class_is_nan():
    preds = jnp.array([0, 0, 1, 1])
    cm = metrics.confusion_matrix(preds, preds, 4)
    iou = np.asarray(metrics.iou_from_confusion(cm))
    assert np.isnan(iou[2]) and np.isnan(iou[3])
    assert float(metrics.mean_iou(cm)) == 1.0


def test_streaming_accumulation_equals_full():
    rng = np.random.default_rng(3)
    preds = rng.integers(0, 4, size=(8, 16, 16))
    targets = rng.integers(0, 4, size=(8, 16, 16))
    full = metrics.confusion_matrix(jnp.asarray(preds), jnp.asarray(targets), 4)
    acc = jnp.zeros((4, 4))
    for i in range(8):
        acc = acc + metrics.confusion_matrix(
            jnp.asarray(preds[i]), jnp.asarray(targets[i]), 4
        )
    np.testing.assert_allclose(np.asarray(acc), np.asarray(full))


def test_logits_to_preds_binary_and_multiclass():
    binary_logits = jnp.array([[[[2.0]], [[-2.0]]]])  # [1, 2, 1, 1]
    p = metrics.logits_to_preds(binary_logits, 1)
    np.testing.assert_array_equal(np.asarray(p), [[[1], [0]]])
    mc_logits = jnp.zeros((1, 2, 2, 3)).at[..., 2].set(5.0)
    p2 = metrics.logits_to_preds(mc_logits, 3)
    assert np.all(np.asarray(p2) == 2)


def test_classwise_naming():
    vals = jnp.array([0.5, 0.7])
    d = metrics.classwise(vals, ["background", "building"], "test_iou")
    assert set(d) == {"test_iou_background", "test_iou_building"}


def test_f1_and_accuracy():
    preds = jnp.array([0, 1, 1, 0])
    targets = jnp.array([0, 1, 0, 0])
    cm = metrics.confusion_matrix(preds, targets, 2)
    assert 0 < float(metrics.accuracy_from_confusion(cm)) <= 1
    f1 = np.asarray(metrics.f1_from_confusion(cm))
    assert f1.shape == (2,)
