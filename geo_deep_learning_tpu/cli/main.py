"""CLI entry point: ``fit`` / ``validate`` / ``test`` / ``predict``.

Reference equivalent: ``train.py:27-76`` (``GeoDeepLearningCLI`` over
LightningCLI). Usage::

    python -m geo_deep_learning_tpu.cli.main fit --config configs/x.yaml \
        [section.key=value ...]

The trainer section understands the reference's Lightning vocabulary
(max_epochs, precision, gradient_clip_val, callbacks Early/Checkpoint/
Visualization, MLflow logger) and maps it onto :class:`TrainerConfig`;
``after-fit`` auto-testing on the best checkpoint is built into the
trainer (reference train.py:30-62).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np
from typing import Any

from geo_deep_learning_tpu.cli.config import instantiate, load_config
from geo_deep_learning_tpu.config.logging_config import setup_logging

logger = logging.getLogger(__name__)

_PRECISION_MAP = {
    "16-mixed": "bf16-mixed",  # AMP → bf16 on TPU
    "bf16-mixed": "bf16-mixed",
    "32-true": "32-true",
    "32": "32-true",
    32: "32-true",
    16: "bf16-mixed",
}


def build_trainer_config(trainer_node: dict, seed: int):
    from geo_deep_learning_tpu.training.loop import TrainerConfig

    cfg = TrainerConfig(seed=seed)
    cfg.max_epochs = int(trainer_node.get("max_epochs", cfg.max_epochs))
    cfg.precision = _PRECISION_MAP.get(
        trainer_node.get("precision", "bf16-mixed"), "bf16-mixed"
    )
    if "gradient_clip_val" in trainer_node:
        cfg.grad_clip = trainer_node["gradient_clip_val"]
    ckpt_dir = trainer_node.get("default_root_dir", ".")
    cfg.checkpoint_dir = str(Path(ckpt_dir) / "checkpoints")

    # TPU extension beyond the reference's DDP-only vocabulary:
    # ``trainer.mesh: {data: N, model: M}`` — model > 1 turns on tensor
    # parallelism (parallel/placement.py TENSOR_PARALLEL_RULES); the
    # default (data: -1, model: 1) is pure data parallelism over all
    # devices, the reference's ``devices: -1`` + ``strategy: ddp``
    mesh_node = trainer_node.get("mesh")
    if mesh_node:
        from geo_deep_learning_tpu.core.mesh import MeshConfig

        cfg.mesh = MeshConfig(
            data=int(mesh_node.get("data", -1)),
            model=int(mesh_node.get("model", 1)),
        )

    for cb in trainer_node.get("callbacks", []) or []:
        path = cb.get("class_path", "") if isinstance(cb, dict) else ""
        args = cb.get("init_args", {}) if isinstance(cb, dict) else {}
        if path.endswith("EarlyStopping"):
            cfg.early_stopping_patience = int(args.get("patience", 20))
            cfg.monitor = args.get("monitor", cfg.monitor)
            cfg.monitor_mode = args.get("mode", cfg.monitor_mode)
        elif path.endswith("ModelCheckpoint"):
            cfg.monitor = args.get("monitor", cfg.monitor)
            cfg.monitor_mode = args.get("mode", cfg.monitor_mode)
        elif path.endswith("VisualizationCallback"):
            cfg.visualize_max_samples = int(args.get("max_samples", 3))
    return cfg


def build_tracker(trainer_node: dict, run_dir: str):
    from geo_deep_learning_tpu.tools.tracking import create_tracker

    logger_node = trainer_node.get("logger")
    if not logger_node:
        return create_tracker("file", directory=run_dir)
    args = logger_node.get("init_args", {}) if isinstance(logger_node, dict) else {}
    return create_tracker(
        "auto",
        directory=args.get("save_dir", run_dir),
        run_name=args.get("run_name", "run"),
        experiment_name=args.get("experiment_name", "geo-deep-learning-tpu"),
    )


def main(argv: list[str] | None = None) -> dict[str, Any]:
    setup_logging()
    parser = argparse.ArgumentParser(prog="gdl-tpu")
    parser.add_argument(
        "subcommand",
        choices=["fit", "validate", "test", "predict", "predict-scene"],
    )
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt-path", default=None)
    # predict-scene options (full-scene sliding-window inference)
    parser.add_argument("--scene", default=None, help="input GeoTIFF scene")
    parser.add_argument("--output", default=None, help="output class map path")
    parser.add_argument("--tile-size", type=int, default=512)
    parser.add_argument("--tile-overlap", type=int, default=128)
    parser.add_argument("--tile-batch", type=int, default=8)
    parser.add_argument(
        "--blend",
        default="hann",
        choices=("hann", "uniform", "crop"),
        help="overlap blending: hann taper (default), uniform average, or "
        "receptive-field-aware core cropping (margins contribute only at "
        "scene borders)",
    )
    parser.add_argument(
        "--streamed",
        action="store_true",
        help="band-streamed I/O (auto-enabled for scenes > 512 MB)",
    )
    parser.add_argument("overrides", nargs="*", help="a.b.c=value overrides")
    args = parser.parse_args(argv)

    config = load_config(args.config, args.overrides)
    seed = config.get("seed_everything", 42)
    seed = 42 if seed is True else int(seed)

    trainer_node = config.get("trainer", {}) or {}
    spec = instantiate(config["model"])
    datamodule = instantiate(config["data"])
    trainer_cfg = build_trainer_config(trainer_node, seed)
    tracker = build_tracker(trainer_node, trainer_cfg.checkpoint_dir)

    from geo_deep_learning_tpu.training.loop import Trainer

    trainer = Trainer(trainer_cfg, tracker)
    tracker.log_params(config)
    # archive the merged run config (reference tools/mlflow_logger.py:18-24)
    import yaml as _yaml

    tracker.log_text(_yaml.safe_dump(config), "config/run_config.yaml")
    ckpt_path = args.ckpt_path or config.get("ckpt_path")

    if args.subcommand == "fit":
        result = trainer.fit(
            spec.task, datamodule, ckpt_path=ckpt_path, **spec.fit_kwargs()
        )
    elif args.subcommand == "predict-scene":
        result = run_predict_scene(trainer, spec, datamodule, ckpt_path, args)
    else:
        result = run_eval_from_ckpt(
            trainer, spec, datamodule, ckpt_path, args.subcommand
        )
    tracker.finish()
    logger.info("%s result: %s", args.subcommand, result)
    return result


def _eval_torch_weights(spec):
    """``torch_weights`` for EVAL-time state init.

    Must mirror the fit-time wiring: a DOFA artifact's pretrained
    pos-embed table is routed into the model as a module constant (not a
    checkpointed param), so omitting torch_weights at eval would silently
    fall back to fresh sincos positions while the restored weights were
    trained against the pretrained table. If the artifact file is absent
    on the eval host, warn loudly and continue (non-DOFA families are
    unaffected — their converted weights are fully overwritten by the
    checkpoint restore that follows).
    """
    tw = getattr(spec, "torch_weights", None)
    if not tw:
        return None
    if Path(tw.get("path", "")).exists():
        return tw
    logger.warning(
        "torch_weights artifact %s not found on this host; evaluating "
        "without it. For DOFA models trained from a pretrained artifact "
        "this skews the positional embedding (pos_embed table missing) — "
        "copy the artifact or expect degraded metrics.",
        tw.get("path"),
    )
    return None


def run_predict_scene(trainer, spec, datamodule, ckpt_path, args):
    """Full-scene sliding-window inference from the CLI (a capability the
    reference lacks — its workflows pre-tile scenes offline, SURVEY.md §5).
    Streams band-by-band for scenes too large for host memory."""
    from geo_deep_learning_tpu.inference.sliding_window import (
        SlidingWindowConfig,
        predict_scene,
    )
    from geo_deep_learning_tpu.inference.streaming import predict_scene_streamed
    from geo_deep_learning_tpu.training.checkpoint import CheckpointManager

    if not args.scene:
        msg = "predict-scene requires --scene <input.tif>"
        raise SystemExit(msg)
    scene_path = Path(args.scene)
    out_path = (
        Path(args.output)
        if args.output
        else scene_path.with_name(scene_path.stem + "_pred.tif")
    )
    task = spec.task
    cfg = SlidingWindowConfig(
        tile_size=args.tile_size,
        overlap=args.tile_overlap,
        batch_size=args.tile_batch,
        blend=args.blend,
    )
    # init variables from a dummy tile batch, then restore the checkpoint
    from geo_deep_learning_tpu.data.geotiff_stream import GeoTiffWindowReader

    with GeoTiffWindowReader(scene_path) as r:
        channels = r.channels
    wv = (
        None
        if not task.uses_wavelengths
        else np.asarray(
            task.default_wavelengths or [0.665, 0.549, 0.481], np.float32
        )
    )
    dummy = {
        "image": np.zeros((1, cfg.tile_size, cfg.tile_size, channels), np.float32),
        "mask": np.zeros((1, cfg.tile_size, cfg.tile_size), np.int32),
    }
    if wv is not None:
        dummy["wavelengths"] = wv
    trainer.state = trainer._init_state(
        task, dummy, spec.optimizer, spec.scheduler, None,
        weights_from_checkpoint_path=spec.weights_from_checkpoint_path,
        load_parts=spec.load_parts, freeze_layers=spec.freeze_layers,
        torch_weights=_eval_torch_weights(spec),
    )
    if ckpt_path:
        mgr = CheckpointManager(trainer.config.checkpoint_dir)
        trainer.state = mgr.restore(ckpt_path, trainer.state)
    state = trainer.state
    batch_stats = state.batch_stats

    def forward(params, tiles):
        variables = {"params": params, "batch_stats": batch_stats}
        model_args = (tiles,) if wv is None else (tiles, wv)
        return task.model.apply(variables, *model_args, train=False).out

    mean = getattr(datamodule, "mean", None)
    std = getattr(datamodule, "std", None)
    # gate streaming on DECODED size (h*w*c*itemsize) — a heavily
    # deflate/LZW-compressed scene under a file-size threshold can decode
    # to many GB and OOM the monolithic path (advisor r2)
    try:
        from geo_deep_learning_tpu.data.geotiff_stream import GeoTiffWindowReader

        with GeoTiffWindowReader(str(scene_path)) as _r:
            decoded_bytes = (
                _r.height * _r.width * _r.channels * _r.dtype.itemsize
            )
    except Exception:  # non-TIFF input: fall back to the file size
        decoded_bytes = scene_path.stat().st_size
    streamed = args.streamed or decoded_bytes > 512 * 1024 * 1024
    runner = predict_scene_streamed if streamed else predict_scene
    out = runner(
        forward,
        str(scene_path),
        str(out_path),
        num_classes=task.num_classes,
        config=cfg,
        mean=mean,
        std=std,
        threshold=task.threshold,
        params=state.params,
    )
    logger.info("wrote scene prediction to %s (streamed=%s)", out, streamed)
    return {"output": str(out), "streamed": streamed}


def run_eval_from_ckpt(trainer, spec, datamodule, ckpt_path, mode: str):
    """Initialize state (optionally from a checkpoint), then evaluate."""
    from geo_deep_learning_tpu.training.checkpoint import CheckpointManager
    from geo_deep_learning_tpu.training.steps import make_eval_step

    stage = {"validate": "validate", "test": "test", "predict": "predict"}[mode]
    datamodule.setup(stage)
    loader = (
        datamodule.val_dataloader() if mode == "validate" else datamodule.test_dataloader()
    )
    first = next(iter(loader))
    # scheduler must match fit-time wiring so the optimizer state tree
    # (e.g. inject_hyperparams for plateau) restores structurally
    trainer.state = trainer._init_state(
        spec.task, first, spec.optimizer, spec.scheduler, None,
        weights_from_checkpoint_path=spec.weights_from_checkpoint_path,
        load_parts=spec.load_parts, freeze_layers=spec.freeze_layers,
        torch_weights=_eval_torch_weights(spec),
    )
    if ckpt_path:
        mgr = CheckpointManager(trainer.config.checkpoint_dir)
        trainer.state = mgr.restore(ckpt_path, trainer.state)
    if mode in ("validate", "test"):
        prefix = "val" if mode == "validate" else "test"
        eval_step = make_eval_step(spec.task, trainer.precision, mesh=trainer.mesh)
        metrics, _ = trainer._run_eval(
            spec.task, eval_step, loader, prefix=prefix, task_labels=spec.task
        )
        return metrics
    # predict: write one class-index raster per input patch (uint8 GeoTIFF)
    # under <root>/predictions/ — the reference's Lightning predict returns
    # tensors but persists nothing; a serving user needs files.
    from geo_deep_learning_tpu.data.geotiff import write_geotiff

    out_dir = Path(trainer.config.checkpoint_dir).parent / "predictions"
    out_dir.mkdir(parents=True, exist_ok=True)
    n_batches = 0
    n_written = 0
    for out in trainer.predict(spec.task, loader):
        n_batches += 1
        preds = out["preds"]
        names = out["batch"].get(
            "image_name", [f"batch{n_batches}_{i}" for i in range(len(preds))]
        )
        valid = int(out["batch"].get("valid_count", len(preds)))
        for i in range(valid):
            stem = Path(str(names[i])).stem or f"batch{n_batches}_{i}"
            write_geotiff(
                out_dir / f"{stem}_pred.tif", preds[i].astype(np.uint8)
            )
            n_written += 1
    logger.info("wrote %d prediction rasters to %s", n_written, out_dir)
    return {"num_batches": n_batches, "num_predictions": n_written,
            "output_dir": str(out_dir)}


if __name__ == "__main__":
    main(sys.argv[1:])
