"""Fused preprocessing: jnp-reference parity + uint8 train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np

from geo_deep_learning_tpu.ops.pallas.preprocess import (
    _jnp_reference,
    fused_normalize_standardize,
)


def test_fused_matches_reference_math():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, 16, 16, 3)).astype(np.uint8)
    mean = np.array([[0.4, 0.5, 0.6], [0.3, 0.3, 0.3]], np.float32)
    std = np.array([[0.2, 0.2, 0.2], [0.1, 0.1, 0.1]], np.float32)
    out = fused_normalize_standardize(jnp.asarray(img), mean, std)
    expected = (img.astype(np.float32) / 255.0 - mean[:, None, None]) / std[
        :, None, None
    ]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_fused_broadcast_single_stats():
    img = jnp.zeros((3, 8, 8, 2), jnp.uint8)
    out = fused_normalize_standardize(img, jnp.array([0.5, 0.5]), jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(out), -1.0, atol=1e-6)


def test_uint8_train_step_end_to_end():
    """A full train step on a raw uint8 batch (device preprocessing)."""
    from geo_deep_learning_tpu.core.precision import PrecisionPolicy
    from geo_deep_learning_tpu.core.train_state import TrainState
    from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus
    from geo_deep_learning_tpu.ops.losses import dice_loss
    from geo_deep_learning_tpu.training.optim import build_optimizer
    from geo_deep_learning_tpu.training.steps import make_train_step
    from geo_deep_learning_tpu.training.task import SegmentationTask

    rng = np.random.default_rng(1)
    batch = {
        "image": rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8),
        "mask": rng.integers(0, 2, (2, 32, 32)).astype(np.int32),
        "mean": np.tile(np.array([[0.4, 0.4, 0.4]], np.float32), (2, 1)),
        "std": np.tile(np.array([[0.2, 0.2, 0.2]], np.float32), (2, 1)),
    }
    model = UnetPlusPlus(
        encoder_name="resnet18", num_classes=1, decoder_channels=(8, 8, 8, 8, 8)
    )
    task = SegmentationTask(model=model, loss=lambda l, t: dice_loss(l, t, "binary"),
                            num_classes=1)
    # init uses a float image (model params are dtype-agnostic to input scale)
    init_batch = dict(batch)
    init_batch["image"] = batch["image"].astype(np.float32) / 255.0
    variables = task.init_variables(jax.random.PRNGKey(0), init_batch)
    tx = build_optimizer(variables["params"], "adam", lr=1e-3)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )
    precision = PrecisionPolicy.create("32-true")
    step = make_train_step(task, precision)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_csv_dataset_device_preprocess(tmp_path):
    from geo_deep_learning_tpu.data.csv_dataset import CSVDataset
    from geo_deep_learning_tpu.data.geotiff import write_geotiff

    rng = np.random.default_rng(2)
    (tmp_path / "trn" / "image").mkdir(parents=True)
    (tmp_path / "trn" / "label").mkdir(parents=True)
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    write_geotiff(tmp_path / "trn" / "image" / "0.tif", img)
    write_geotiff(
        tmp_path / "trn" / "label" / "0_lbl.tif", np.zeros((16, 16), np.uint8)
    )
    (tmp_path / "trn.csv").write_text("trn/image/0.tif;trn/label/0_lbl.tif\n")
    stats = {"mean": [0.4] * 3, "std": [0.2] * 3}
    raw = CSVDataset(str(tmp_path), str(tmp_path), "trn", stats, device_preprocess=True)
    s = raw[0]
    assert s["image"].dtype == np.uint8
    np.testing.assert_array_equal(s["image"], img)
    host = CSVDataset(str(tmp_path), str(tmp_path), "trn", stats)
    s2 = host[0]
    assert s2["image"].dtype == np.float32
    # device-side fused result equals host-side preprocessing
    fused = fused_normalize_standardize(
        jnp.asarray(s["image"][None]), s["mean"][None], s["std"][None]
    )
    np.testing.assert_allclose(np.asarray(fused)[0], s2["image"], atol=1e-5)
