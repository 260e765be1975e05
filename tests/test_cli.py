"""CLI + config system tests: interpolation, aliases, full fit via main()."""

from pathlib import Path

import numpy as np
import pytest

# full end-to-end fits: the suite's dominant wall-clock cost
pytestmark = pytest.mark.slow
import yaml

from geo_deep_learning_tpu.cli.config import (
    import_class,
    instantiate,
    load_config,
    resolve_interpolations,
)
from geo_deep_learning_tpu.cli.main import main
from geo_deep_learning_tpu.data.geotiff import write_geotiff


def test_interpolation_whole_and_partial():
    cfg = {
        "data": {"init_args": {"mean": [0.1, 0.2], "batch": 4}},
        "model": {"mean": "${data.init_args.mean}", "tag": "bs=${data.init_args.batch}"},
    }
    out = resolve_interpolations(cfg)
    assert out["model"]["mean"] == [0.1, 0.2]  # keeps list type
    assert out["model"]["tag"] == "bs=4"


def test_reference_class_path_aliases():
    cls = import_class("segmentation_models_pytorch.losses.DiceLoss")
    from geo_deep_learning_tpu.ops.losses import DiceLoss

    assert cls is DiceLoss
    cls2 = import_class("tasks_with_models.segmentation_segformer.SegmentationSegformer")
    from geo_deep_learning_tpu.tasks import SegmentationSegformer

    assert cls2 is SegmentationSegformer


def test_instantiate_keeps_optimizer_raw():
    node = {
        "class_path": "geo_deep_learning_tpu.tasks.SegmentationUnetPlus",
        "init_args": {
            "encoder": "resnet18",
            "num_classes": 1,
            "decoder_channels": [8, 8, 8, 8, 8],
            "optimizer": {"class_path": "torch.optim.Adam", "init_args": {"lr": 1e-3}},
            "loss": {
                "class_path": "segmentation_models_pytorch.losses.DiceLoss",
                "init_args": {"mode": "binary"},
            },
        },
    }
    spec = instantiate(node)
    assert spec.optimizer == {
        "class_path": "torch.optim.Adam",
        "init_args": {"lr": 1e-3},
    }
    from geo_deep_learning_tpu.ops.losses import DiceLoss

    assert isinstance(spec.task.loss, DiceLoss)


def test_load_config_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a:\n  b: 1\nc: ${a.b}\n")
    cfg = load_config(p, overrides=["a.b=7"])
    assert cfg["a"]["b"] == 7
    assert cfg["c"] == 7


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    rng = np.random.default_rng(0)
    for split, n in [("trn", 8), ("val", 4), ("tst", 4)]:
        (root / split / "image").mkdir(parents=True)
        (root / split / "label").mkdir(parents=True)
        rows = []
        for i in range(n):
            img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            mask = (img.mean(-1) > 127).astype(np.uint8)
            write_geotiff(root / split / "image" / f"{i}.tif", img)
            write_geotiff(root / split / "label" / f"{i}_lbl.tif", mask)
            rows.append(f"{split}/image/{i}.tif;{split}/label/{i}_lbl.tif")
        (root / f"{split}.csv").write_text("\n".join(rows) + "\n")
    return root


def _write_cli_config(path, data_root, ckpt_dir):
    config = {
        "seed_everything": 42,
        "trainer": {
            "max_epochs": 1,
            "precision": "32-true",
            "gradient_clip_val": 1.0,
            "default_root_dir": str(ckpt_dir),
            "callbacks": [
                {
                    "class_path": "lightning.pytorch.callbacks.EarlyStopping",
                    "init_args": {"monitor": "val_loss", "mode": "min", "patience": 5},
                },
                {
                    "class_path": "lightning.pytorch.callbacks.ModelCheckpoint",
                    "init_args": {"monitor": "val_loss", "mode": "min", "save_top_k": 1},
                },
            ],
        },
        "model": {
            "class_path": "tasks_with_models.segmentation_unetplus.SegmentationUnetPlus",
            "init_args": {
                "encoder": "resnet18",
                "image_size": [32, 32],
                "in_channels": 3,
                "num_classes": 1,
                "max_samples": 1,
                "precision": "32-true",
                "decoder_channels": [8, 8, 8, 8, 8],
                "loss": {
                    "class_path": "segmentation_models_pytorch.losses.DiceLoss",
                    "init_args": {"mode": "binary"},
                },
                "optimizer": {
                    "class_path": "torch.optim.Adam",
                    "init_args": {"lr": 1e-3},
                },
                "scheduler": {
                    "class_path": "torch.optim.lr_scheduler.ReduceLROnPlateau",
                    "init_args": {"mode": "min", "factor": 0.1, "patience": 10},
                },
                "class_labels": ["background", "building"],
            },
        },
        "data": {
            "class_path": "datamodules.csv_datamodule.CSVDataModule",
            "init_args": {
                "csv_root_folder": str(data_root),
                "patches_root_folder": str(data_root),
                "batch_size": 8,
                "num_workers": 2,
                "mean": [0.4, 0.4, 0.4],
                "std": [0.2, 0.2, 0.2],
            },
        },
        "ckpt_path": None,
    }
    path.write_text(yaml.safe_dump(config))


def test_cli_fit_and_test(mini_dataset, tmp_path):
    cfg_path = tmp_path / "run.yaml"
    _write_cli_config(cfg_path, mini_dataset, tmp_path)
    result = main(["fit", "--config", str(cfg_path)])
    assert np.isfinite(result["val_loss"])
    assert "test_miou" in result  # auto-test after fit

    # test subcommand from the saved best checkpoint
    ckpts = list((tmp_path / "checkpoints").glob("model-*"))
    assert ckpts
    result2 = main(
        ["test", "--config", str(cfg_path), "--ckpt-path", str(ckpts[0])]
    )
    assert "test_miou" in result2

    # validate + predict subcommands on the same checkpoint
    result3 = main(
        ["validate", "--config", str(cfg_path), "--ckpt-path", str(ckpts[0])]
    )
    assert np.isfinite(result3["val_loss"])
    result4 = main(
        ["predict", "--config", str(cfg_path), "--ckpt-path", str(ckpts[0])]
    )
    assert result4["num_batches"] >= 1
    assert result4["num_predictions"] >= 1
    pred_files = list(Path(result4["output_dir"]).glob("*_pred.tif"))
    assert len(pred_files) == result4["num_predictions"]
    from geo_deep_learning_tpu.data.geotiff import read_geotiff

    arr, _ = read_geotiff(str(pred_files[0]))
    assert arr.squeeze().ndim == 2  # class-index raster

    # predict-scene: full-scene sliding-window inference from the CLI
    rng = np.random.default_rng(5)
    scene = rng.integers(0, 255, (80, 72, 3)).astype(np.uint8)
    scene_path = tmp_path / "scene.tif"
    write_geotiff(scene_path, scene)
    result5 = main(
        [
            "predict-scene", "--config", str(cfg_path),
            "--ckpt-path", str(ckpts[0]),
            "--scene", str(scene_path),
            "--output", str(tmp_path / "scene_pred.tif"),
            "--tile-size", "32", "--tile-overlap", "8", "--tile-batch", "4",
        ]
    )
    pred, _ = read_geotiff(result5["output"])
    assert pred.shape[:2] == (80, 72)

    # --streamed produces the identical map
    result6 = main(
        [
            "predict-scene", "--config", str(cfg_path),
            "--ckpt-path", str(ckpts[0]),
            "--scene", str(scene_path),
            "--output", str(tmp_path / "scene_pred_s.tif"),
            "--tile-size", "32", "--tile-overlap", "8", "--tile-batch", "4",
            "--streamed",
        ]
    )
    pred_s, _ = read_geotiff(result6["output"])
    assert result6["streamed"]
    np.testing.assert_array_equal(pred, pred_s)


def test_cli_shipped_configs_parse():
    """The three shipped recipes must at least instantiate their model."""
    from geo_deep_learning_tpu.cli.config import instantiate as inst

    for name in [
        "unetplus_config_RGB",
        "segformer_config_RGB",
        "dofa_config_RGB",
        "dofa_config_RGB_onecycle",
    ]:
        cfg = load_config(f"configs/{name}.yaml")
        spec = inst(cfg["model"])
        assert spec.task.model is not None
        assert cfg["trainer"]["precision"] == "bf16-mixed"


def test_reference_repo_configs_load_through_our_cli():
    """The UPSTREAM reference's own YAML configs instantiate through our
    config system (model + data sections), modulo host-specific paths."""
    import pathlib

    from geo_deep_learning_tpu.cli.config import instantiate as inst

    ref = pathlib.Path("/root/reference/configs")
    if not ref.exists():
        pytest.skip("reference not mounted")
    for name in ["unetplus_config_RGB", "segformer_config_RGB", "dofa_config_RGB"]:
        cfg = load_config(ref / f"{name}.yaml")
        spec = inst(cfg["model"])
        assert spec.task.model is not None
        dm = inst(cfg["data"])
        assert dm.batch_size == 4


def test_trainer_mesh_config_parses():
    """``trainer.mesh: {data: N, model: M}`` reaches TrainerConfig (the
    user-facing TP switch, VERDICT r4 #3)."""
    from geo_deep_learning_tpu.cli.main import build_trainer_config

    cfg = build_trainer_config({"max_epochs": 3, "mesh": {"data": 4, "model": 2}}, 42)
    assert cfg.mesh.data == 4 and cfg.mesh.model == 2
    # default: all devices on the data axis (reference devices: -1 + ddp)
    cfg2 = build_trainer_config({}, 42)
    assert cfg2.mesh.data == -1 and cfg2.mesh.model == 1


def test_eval_torch_weights_seam(tmp_path, caplog):
    """Eval-time torch_weights routing (code-review fix): present file
    passes through; absent file warns loudly and returns None; specs
    without torch_weights return None silently."""
    import logging
    import types

    from geo_deep_learning_tpu.cli.main import _eval_torch_weights

    art = tmp_path / "w.msgpack"
    art.write_bytes(b"x")
    spec = types.SimpleNamespace(torch_weights={"path": str(art), "format": "dofa"})
    assert _eval_torch_weights(spec) == spec.torch_weights

    spec2 = types.SimpleNamespace(torch_weights=None)
    assert _eval_torch_weights(spec2) is None

    spec3 = types.SimpleNamespace(
        torch_weights={"path": str(tmp_path / "missing.pth"), "format": "dofa"}
    )
    with caplog.at_level(logging.WARNING):
        assert _eval_torch_weights(spec3) is None
    assert any("pos_embed" in r.message for r in caplog.records)
