"""Datamodules: split-aware dataset + loader construction.

Reference equivalent: ``datamodules/csv_datamodule.py:11-100``
(``CSVDataModule``). The Lightning DataModule protocol (``setup`` +
``{train,val,test}_dataloader``) is kept so configs translate directly.
"""

from __future__ import annotations

from typing import Sequence

from geo_deep_learning_tpu.data.csv_dataset import CSVDataset
from geo_deep_learning_tpu.data.loader import DataLoader


class CSVDataModule:
    def __init__(
        self,
        csv_root_folder: str,
        patches_root_folder: str,
        batch_size: int = 4,
        num_workers: int = 8,
        mean: Sequence[float] | None = None,
        std: Sequence[float] | None = None,
        patch_size: Sequence[int] = (512, 512),
        band_indices: Sequence[int] | None = None,
        device_preprocess: bool = False,
        data_type_max: float = 255.0,
        seed: int = 42,
    ) -> None:
        self.csv_root_folder = csv_root_folder
        self.patches_root_folder = patches_root_folder
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.norm_stats = {
            "mean": list(mean) if mean is not None else [0.0],
            "std": list(std) if std is not None else [1.0],
        }
        self.patch_size = tuple(patch_size)
        self.band_indices = list(band_indices) if band_indices else None
        self.device_preprocess = device_preprocess
        self.data_type_max = float(data_type_max)
        self.seed = seed
        self.datasets: dict[str, CSVDataset] = {}

    def _make(self, split: str) -> CSVDataset:
        return CSVDataset(
            self.csv_root_folder,
            self.patches_root_folder,
            split=split,
            norm_stats=self.norm_stats,
            band_indices=self.band_indices,
            device_preprocess=self.device_preprocess,
            data_type_max=self.data_type_max,
        )

    def setup(self, stage: str = "fit") -> None:
        if stage in ("fit",):
            self.datasets["trn"] = self._make("trn")
            self.datasets["val"] = self._make("val")
        if stage in ("validate",) and "val" not in self.datasets:
            self.datasets["val"] = self._make("val")
        if stage in ("test", "predict") and "tst" not in self.datasets:
            self.datasets["tst"] = self._make("tst")
        if stage == "fit":
            # test set is optional at fit time (auto-test after fit)
            try:
                self.datasets["tst"] = self._make("tst")
            except FileNotFoundError:
                pass

    def train_dataloader(self) -> DataLoader:
        return DataLoader(
            self.datasets["trn"],
            batch_size=self.batch_size,
            shuffle=True,
            drop_last=True,
            num_workers=self.num_workers,
            seed=self.seed,
        )

    def val_dataloader(self) -> DataLoader:
        return DataLoader(
            self.datasets["val"],
            batch_size=self.batch_size,
            pad_partial=True,
            num_workers=self.num_workers,
        )

    def test_dataloader(self) -> DataLoader:
        if "tst" not in self.datasets:
            self.setup("test")
        return DataLoader(
            self.datasets["tst"],
            batch_size=self.batch_size,
            pad_partial=True,
            num_workers=self.num_workers,
        )
