"""YAML config system: ``class_path``/``init_args`` + ``${...}`` interpolation.

Reference equivalent: LightningCLI + jsonargparse in OmegaConf parser mode
(reference train.py:68-74) — YAML nodes of the form::

    model:
      class_path: tasks_with_models.segmentation_segformer.SegmentationSegformer
      init_args: {...}

are dependency-injected, and ``${a.b.c}`` references resolve against the
merged document (reference configs/dofa_config_RGB.yaml:37-41). This
module reimplements both without jsonargparse/omegaconf, plus an alias
table translating reference class paths (torch/smp/lightning) to their
native equivalents so reference configs run with minimal edits.
"""

from __future__ import annotations

import importlib
import re
from pathlib import Path
from typing import Any

import yaml

# reference class paths → native equivalents
CLASS_PATH_ALIASES: dict[str, str] = {
    # tasks
    "tasks_with_models.segmentation_unetplus.SegmentationUnetPlus":
        "geo_deep_learning_tpu.tasks.SegmentationUnetPlus",
    "tasks_with_models.segmentation_segformer.SegmentationSegformer":
        "geo_deep_learning_tpu.tasks.SegmentationSegformer",
    "tasks_with_models.segmentation_dofa.SegmentationDOFA":
        "geo_deep_learning_tpu.tasks.SegmentationDOFA",
    # losses (smp)
    "segmentation_models_pytorch.losses.DiceLoss":
        "geo_deep_learning_tpu.ops.losses.DiceLoss",
    "segmentation_models_pytorch.losses.JaccardLoss":
        "geo_deep_learning_tpu.ops.losses.JaccardLoss",
    "segmentation_models_pytorch.losses.SoftCrossEntropyLoss":
        "geo_deep_learning_tpu.ops.losses.SoftCrossEntropyLoss",
    "segmentation_models_pytorch.losses.FocalLoss":
        "geo_deep_learning_tpu.ops.losses.FocalLoss",
    "torch.nn.CrossEntropyLoss":
        "geo_deep_learning_tpu.ops.losses.CrossEntropyLoss",
    "torch.nn.BCEWithLogitsLoss":
        "geo_deep_learning_tpu.ops.losses.BinaryCrossEntropyLoss",
    # datamodules
    "datamodules.csv_datamodule.CSVDataModule":
        "geo_deep_learning_tpu.data.datamodule.CSVDataModule",
    "datamodules.wds_datamodule.MultiSensorDataModule":
        "geo_deep_learning_tpu.data.multisensor.MultiSensorDataModule",
    # the reference dofa config's class path is stale/nonexistent
    # (SURVEY.md §7); its init_args are CSV-shaped, so map it there
    "datamodules.imagery_NonGeoDataModule.BlueSkyNonGeoDataModule":
        "geo_deep_learning_tpu.data.datamodule.CSVDataModule",
}

_INTERP = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _lookup(root: Any, dotted: str) -> Any:
    node = root
    for part in dotted.split("."):
        if isinstance(node, list):
            node = node[int(part)]
        else:
            node = node[part]
    return node


def resolve_interpolations(config: Any) -> Any:
    """Resolve ``${a.b.c}`` references against the document root."""

    def resolve(node: Any) -> Any:
        if isinstance(node, dict):
            return {k: resolve(v) for k, v in node.items()}
        if isinstance(node, list):
            return [resolve(v) for v in node]
        if isinstance(node, str):
            full = _INTERP.fullmatch(node)
            if full:  # whole-value reference keeps the referent's type
                return resolve(_lookup(config, full.group(1)))
            return _INTERP.sub(
                lambda m: str(resolve(_lookup(config, m.group(1)))), node
            )
        return node

    return resolve(config)


def import_class(class_path: str) -> type:
    class_path = CLASS_PATH_ALIASES.get(class_path, class_path)
    module_name, _, attr = class_path.rpartition(".")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


# init_args keys whose class_path nodes are config data consumed by the
# trainer (optimizer/scheduler factories), not objects to construct here
RAW_KEYS = frozenset({"optimizer", "scheduler", "scheduler_config"})


def instantiate(node: Any) -> Any:
    """Recursively build objects from class_path/init_args nodes.

    Keys in :data:`RAW_KEYS` pass through un-instantiated — the reference
    hands optimizer/scheduler *callables* to the task via jsonargparse;
    here they stay declarative dicts interpreted by ``Trainer.fit``.
    """
    if isinstance(node, dict):
        if "class_path" in node:
            cls = import_class(node["class_path"])
            raw = node.get("init_args", {}) or {}
            init_args = {
                k: (v if k in RAW_KEYS else instantiate(v)) for k, v in raw.items()
            }
            return cls(**init_args)
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def load_config(path: str | Path, overrides: list[str] | None = None) -> dict:
    """Load YAML, apply ``a.b.c=value`` CLI overrides, resolve ``${...}``."""
    with Path(path).open() as f:
        config = yaml.safe_load(f)
    for ov in overrides or []:
        key, _, raw = ov.partition("=")
        value = yaml.safe_load(raw)
        node = config
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return resolve_interpolations(config)
