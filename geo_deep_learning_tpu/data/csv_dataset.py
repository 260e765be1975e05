"""CSV-indexed GeoTIFF patch dataset.

Reference equivalent: ``datasets/csv_dataset.py:25-171`` — semicolon-
separated ``{split}.csv`` files (image;mask[;extra]) under a patches root;
each sample is min-max normalized (0-255 → 0-1) then standardized with
config mean/std, and emits the batch-dict contract
``{"image", "mask", "image_name", "mean", "std"}``.

Differences by design (SURVEY.md §7 quirks):
- arrays are HWC float32 / HW int32 (clean mask contract, channel-last),
- mean/std travel as 1-D per-channel vectors,
- decoding uses the in-repo GeoTIFF codec instead of rasterio.
"""

from __future__ import annotations

import csv
import logging
from pathlib import Path

import numpy as np

from geo_deep_learning_tpu.core.mesh import host0_only
from geo_deep_learning_tpu.data.geotiff import read_geotiff

logger = logging.getLogger(__name__)


@host0_only
def _log_dataset(split: str, patch_count: int) -> None:
    logger.info("Created dataset for %s split with %s patches", split, patch_count)


class CSVDataset:
    def __init__(
        self,
        csv_root_folder: str,
        patches_root_folder: str,
        split: str = "trn",
        norm_stats: dict[str, list[float]] | None = None,
        band_indices: list[int] | None = None,
        device_preprocess: bool = False,
        data_type_max: float = 255.0,
    ) -> None:
        self.csv_root_folder = Path(csv_root_folder)
        self.patches_root_folder = Path(patches_root_folder)
        self.split = split
        self.norm_stats = norm_stats or {"mean": [0.0], "std": [1.0]}
        self.band_indices = band_indices
        # device_preprocess: emit raw uint8 pixels; normalization and
        # standardization fuse into the train step on device (Pallas)
        self.device_preprocess = device_preprocess
        self.data_type_max = float(data_type_max)
        self.files = self._load_files()
        _log_dataset(split, len(self.files))

    def _load_files(self) -> list[dict[str, Path]]:
        csv_path = self.csv_root_folder / f"{self.split}.csv"
        if not csv_path.exists():
            msg = f"CSV file {csv_path} not found."
            raise FileNotFoundError(msg)
        out = []
        with csv_path.open() as f:
            for row in csv.reader(f, delimiter=";"):
                if not row:
                    continue
                if len(row) < 2:
                    msg = (
                        "CSV file must contain at least two columns: "
                        "image_path;mask_path"
                    )
                    raise ValueError(msg)
                out.append(
                    {
                        "image": self.patches_root_folder / row[0],
                        "mask": self.patches_root_folder / row[1],
                    }
                )
        return out

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, index: int) -> dict:
        entry = self.files[index]
        image, _ = read_geotiff(entry["image"])
        if self.band_indices is not None:
            image = image[..., self.band_indices]
        mean = np.asarray(self.norm_stats["mean"], dtype=np.float32)
        std = np.asarray(self.norm_stats["std"], dtype=np.float32)
        if self.device_preprocess and image.dtype == np.uint8:
            pass  # raw bytes; fused normalize+standardize happens on device
        else:
            image = image.astype(np.float32)
            # reference normalization (0..data_type_max -> 0..1)
            image = image / self.data_type_max
            image = (image - mean) / std
        mask, _ = read_geotiff(entry["mask"])
        mask = mask[..., 0].astype(np.int32)
        return {
            "image": image,
            "mask": mask,
            "image_name": entry["image"].name,
            "mask_name": entry["mask"].name,
            "mean": mean,
            "std": std,
        }
