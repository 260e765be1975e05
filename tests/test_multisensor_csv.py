"""Map-style multi-sensor datamodule (round-robin sampler wired)."""

import numpy as np
import pytest

from geo_deep_learning_tpu.data.geotiff import write_geotiff
from geo_deep_learning_tpu.data.multisensor_csv import MultiSensorCSVDataModule


@pytest.fixture(scope="module")
def sensor_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("ms_csv")
    rng = np.random.default_rng(0)
    cfg = {}
    for sensor, n_trn in [("geoeye", 8), ("worldview", 16)]:
        sdir = root / sensor
        for split, n in [("trn", n_trn), ("val", 4), ("tst", 4)]:
            (sdir / split / "image").mkdir(parents=True)
            (sdir / split / "label").mkdir(parents=True)
            rows = []
            for i in range(n):
                img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
                write_geotiff(sdir / split / "image" / f"{i}.tif", img)
                write_geotiff(
                    sdir / split / "label" / f"{i}_lbl.tif",
                    (img[..., 0] > 127).astype(np.uint8),
                )
                rows.append(f"{split}/image/{i}.tif;{split}/label/{i}_lbl.tif")
            (sdir / f"{split}.csv").write_text("\n".join(rows) + "\n")
        cfg[sensor] = {
            "csv_root_folder": str(sdir),
            "mean": [0.4, 0.4, 0.4],
            "std": [0.2, 0.2, 0.2],
            "wavelengths": [0.665, 0.549, 0.481],
        }
    return cfg


def test_round_robin_training_batches(sensor_dirs):
    dm = MultiSensorCSVDataModule(sensor_dirs, batch_size=4, num_workers=2)
    dm.setup("fit")
    batches = list(dm.train_dataloader())
    # balance=True: both sensors padded to 16 samples → 4 batches each
    sensors_seen = [b["platform"][0] for b in batches]
    assert sensors_seen.count("geoeye") == sensors_seen.count("worldview") == 4
    for b in batches:
        assert b["image"].shape == (4, 16, 16, 3)
        assert len(set(b["platform"])) == 1  # homogeneous batches
        assert b["wavelengths"].shape == (4, 3)


def test_epochs_reshuffle(sensor_dirs):
    dm = MultiSensorCSVDataModule(sensor_dirs, batch_size=4, num_workers=2, balance=False)
    dm.setup("fit")
    loader = dm.train_dataloader()
    names0 = [tuple(b["image_name"]) for b in loader]
    names1 = [tuple(b["image_name"]) for b in loader]
    assert names0 != names1  # set_epoch reshuffles


def test_eval_loader_covers_all_sensors(sensor_dirs):
    dm = MultiSensorCSVDataModule(sensor_dirs, batch_size=4, num_workers=2)
    dm.setup("fit")
    val = list(dm.val_dataloader())
    assert {b["platform"][0] for b in val} == {"geoeye", "worldview"}
    total = sum(int(b["valid_count"]) for b in val)
    assert total == 8  # 4 + 4 val patches


def test_fit_through_trainer(sensor_dirs, tmp_path):
    from geo_deep_learning_tpu.ops.losses import DiceLoss
    from geo_deep_learning_tpu.models.segmentation.segformer import SegFormer
    from geo_deep_learning_tpu.training.loop import Trainer, TrainerConfig
    from geo_deep_learning_tpu.training.task import SegmentationTask

    task = SegmentationTask(
        model=SegFormer(encoder_name="mit_b0", num_classes=2),
        loss=DiceLoss(mode="multiclass"),
        num_classes=2,
    )
    dm = MultiSensorCSVDataModule(sensor_dirs, batch_size=8, num_workers=2)
    trainer = Trainer(
        TrainerConfig(
            max_epochs=1,
            precision="32-true",
            checkpoint_dir=str(tmp_path / "ck"),
            early_stopping_patience=None,
            auto_test_after_fit=False,
        )
    )
    hist = trainer.fit(task, dm, optimizer={"name": "adam", "lr": 1e-3})
    assert np.isfinite(hist["val_loss"])
