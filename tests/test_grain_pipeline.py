"""Grain-backed datamodule tests (skipped when grain is unavailable)."""

import numpy as np
import pytest

pytest.importorskip("grain")

from geo_deep_learning_tpu.data.geotiff import write_geotiff
from geo_deep_learning_tpu.data.grain_pipeline import GrainCSVDataModule


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("grain_data")
    rng = np.random.default_rng(0)
    for split, n in [("trn", 10), ("val", 5), ("tst", 5)]:
        (root / split / "image").mkdir(parents=True)
        (root / split / "label").mkdir(parents=True)
        rows = []
        for i in range(n):
            img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            write_geotiff(root / split / "image" / f"{i}.tif", img)
            write_geotiff(
                root / split / "label" / f"{i}_lbl.tif",
                (img.mean(-1) > 127).astype(np.uint8),
            )
            rows.append(f"{split}/image/{i}.tif;{split}/label/{i}_lbl.tif")
        (root / f"{split}.csv").write_text("\n".join(rows) + "\n")
    return root


@pytest.fixture(scope="module")
def dm(dataset_dir):
    m = GrainCSVDataModule(
        str(dataset_dir), str(dataset_dir),
        batch_size=4, num_workers=2,
        mean=[0.4] * 3, std=[0.2] * 3, patch_size=(32, 32),
    )
    m.setup("fit")
    return m


def test_grain_train_batches(dm):
    loader = dm.train_dataloader()
    assert len(loader) == 2  # 10 // 4, drop_remainder
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 32, 32, 3)
    assert batches[0]["mask"].dtype == np.int32


def test_grain_reshuffles_per_epoch(dm):
    loader = dm.train_dataloader()
    e0 = [tuple(b["image_name"]) for b in loader]
    e1 = [tuple(b["image_name"]) for b in loader]
    assert e0 != e1


def test_grain_val_keeps_partial(dm):
    batches = list(dm.val_dataloader())
    assert len(batches) == 2  # 5 → 4 + 1
    assert int(batches[-1]["valid_count"]) == 1


def test_grain_fit_through_trainer(dm, tmp_path):
    from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus
    from geo_deep_learning_tpu.ops.losses import DiceLoss
    from geo_deep_learning_tpu.training.loop import Trainer, TrainerConfig
    from geo_deep_learning_tpu.training.task import SegmentationTask

    task = SegmentationTask(
        model=UnetPlusPlus(
            encoder_name="resnet18", num_classes=1, decoder_channels=(8, 8, 8, 8, 8)
        ),
        loss=DiceLoss(mode="binary"),
        num_classes=1,
    )
    trainer = Trainer(
        TrainerConfig(
            max_epochs=1, precision="32-true",
            checkpoint_dir=str(tmp_path / "ck"),
            early_stopping_patience=None, auto_test_after_fit=False,
        )
    )
    hist = trainer.fit(task, dm, optimizer={"name": "adam", "lr": 1e-3})
    assert np.isfinite(hist["val_loss"])
