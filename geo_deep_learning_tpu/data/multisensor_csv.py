"""Map-style multi-sensor datamodule driven by the round-robin sampler.

The reference ships ``RoundRobinSampler`` as a library-only alternative to
WebDataset mixing for map-style datasets (samplers/round_robin_sampler.py,
never wired into a datamodule — SURVEY.md §2.1 "dead code"). This module
wires it: one CSV patch dataset per sensor, batches cycling sensors with
equal/proportional/custom weights, each batch homogeneous in sensor (so
per-sensor normalization stats and wavelengths stay batch-constant — the
invariant DOFA requires, dofa_v2.py:437-442).
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import numpy as np

from geo_deep_learning_tpu.data.csv_dataset import CSVDataset
from geo_deep_learning_tpu.data.loader import DataLoader, collate
from geo_deep_learning_tpu.data.samplers import create_round_robin_sampler

logger = logging.getLogger(__name__)


class RoundRobinLoader:
    """Iterate (sensor, indices) from the sampler into collated batches."""

    def __init__(
        self,
        datasets: dict[str, CSVDataset],
        sampler,
        wavelengths: dict[str, list[float]] | None = None,
        num_workers: int = 8,
    ) -> None:
        self.datasets = datasets
        self.sampler = sampler
        self.wavelengths = wavelengths or {}
        self.num_workers = max(1, num_workers)
        self.epoch = 0

    def __len__(self) -> int:
        return len(self.sampler)

    def __iter__(self) -> Iterator[dict[str, Any]]:
        self.sampler.set_epoch(self.epoch)
        self.epoch += 1
        with ThreadPoolExecutor(self.num_workers) as pool:
            for sensor, indices in self.sampler:
                ds = self.datasets[sensor]
                samples = list(pool.map(ds.__getitem__, indices))
                batch = collate(samples)
                batch["platform"] = [sensor] * len(indices)
                wv = self.wavelengths.get(sensor)
                if wv is not None:
                    batch["wavelengths"] = np.tile(
                        np.asarray(wv, np.float32), (len(indices), 1)
                    )
                batch["valid_count"] = np.int32(len(indices))
                yield batch


class MultiSensorCSVDataModule:
    """Per-sensor CSV datasets + weighted round-robin training batches.

    ``sensors`` maps sensor name → dict with ``csv_root_folder``,
    ``patches_root_folder``, ``mean``, ``std`` and optional
    ``wavelengths`` (µm, for DOFA) / ``band_indices``.
    """

    def __init__(
        self,
        sensors: dict[str, dict],
        batch_size: int = 8,
        num_workers: int = 8,
        weights: str | dict[str, int] = "equal",
        balance: bool = True,
        distributed: bool = False,
        device_preprocess: bool = False,
        seed: int = 42,
    ) -> None:
        self.sensors = sensors
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.weights = weights
        self.balance = balance
        self.distributed = distributed
        self.device_preprocess = device_preprocess
        self.seed = seed
        self.datasets: dict[str, dict[str, CSVDataset]] = {}

    def _make(self, sensor: str, split: str) -> CSVDataset:
        cfg = self.sensors[sensor]
        return CSVDataset(
            cfg["csv_root_folder"],
            cfg.get("patches_root_folder", cfg["csv_root_folder"]),
            split=split,
            norm_stats={"mean": cfg.get("mean", [0.0]), "std": cfg.get("std", [1.0])},
            band_indices=cfg.get("band_indices"),
            device_preprocess=self.device_preprocess,
        )

    def setup(self, stage: str = "fit") -> None:
        splits = {
            "fit": ("trn", "val"),
            "validate": ("val",),
            "test": ("tst",),
            "predict": ("tst",),
        }[stage]
        for sensor in self.sensors:
            per = self.datasets.setdefault(sensor, {})
            for split in splits:
                if split not in per:
                    try:
                        per[split] = self._make(sensor, split)
                    except FileNotFoundError as e:
                        logger.warning("%s/%s: %s", sensor, split, e)
        if stage == "fit":
            for sensor in self.sensors:
                try:
                    self.datasets[sensor].setdefault(
                        "tst", self._make(sensor, "tst")
                    )
                except FileNotFoundError:
                    pass

    def _wavelengths(self) -> dict[str, list[float]]:
        return {
            s: cfg["wavelengths"]
            for s, cfg in self.sensors.items()
            if "wavelengths" in cfg
        }

    def train_dataloader(self) -> RoundRobinLoader:
        sizes = {
            s: len(d["trn"]) for s, d in self.datasets.items() if "trn" in d
        }
        sampler = create_round_robin_sampler(
            sizes,
            distributed=self.distributed,
            batch_size=self.batch_size,
            weights=self.weights,
            balance=self.balance,
            seed=self.seed,
        )
        return RoundRobinLoader(
            {s: d["trn"] for s, d in self.datasets.items() if "trn" in d},
            sampler,
            wavelengths=self._wavelengths(),
            num_workers=self.num_workers,
        )

    def _eval_loader(self, split: str):
        """Sequential per-sensor evaluation (padded static batches)."""
        loaders = [
            (s, DataLoader(d[split], batch_size=self.batch_size, pad_partial=True,
                           num_workers=self.num_workers))
            for s, d in self.datasets.items()
            if split in d
        ]
        wv = self._wavelengths()

        class _Chain:
            def __iter__(self_inner):
                for sensor, loader in loaders:
                    for batch in loader:
                        batch["platform"] = [sensor] * len(batch["image"])
                        if sensor in wv:
                            batch["wavelengths"] = np.tile(
                                np.asarray(wv[sensor], np.float32),
                                (len(batch["image"]), 1),
                            )
                        yield batch

        return _Chain()

    def val_dataloader(self):
        return self._eval_loader("val")

    def test_dataloader(self):
        return self._eval_loader("tst")
