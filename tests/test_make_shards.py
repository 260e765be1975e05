"""CSV → sharded-tar converter round-trip (scripts/make_shards_from_csv.py)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parents[1]


def _make_csv_dataset(root: Path, n: int = 5, size: int = 128) -> None:
    sys.path.insert(0, str(REPO / "scripts"))
    from make_synthetic_waterloo import make_patch

    from geo_deep_learning_tpu.data.geotiff import write_geotiff

    rng = np.random.default_rng(0)
    for split, k in [("trn", n), ("val", 2), ("tst", 2)]:
        (root / split / "image").mkdir(parents=True)
        (root / split / "label").mkdir(parents=True)
        rows = []
        for i in range(k):
            img, mask = make_patch(rng, size, "five")
            write_geotiff(root / split / "image" / f"{i}.tif", img)
            write_geotiff(root / split / "label" / f"{i}_lbl.tif", mask)
            rows.append(f"{split}/image/{i}.tif;{split}/label/{i}_lbl.tif")
        (root / f"{split}.csv").write_text("\n".join(rows) + "\n")


def test_convert_and_stream(tmp_path):
    csv_root = tmp_path / "csv"
    out_root = tmp_path / "shards"
    _make_csv_dataset(csv_root)
    subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "make_shards_from_csv.py"),
            str(csv_root),
            str(out_root),
            "--sensor",
            "testsensor",
            "--per-shard",
            "3",
        ],
        check=True,
        cwd=REPO,
    )
    sensors = yaml.safe_load((out_root / "sensors.yaml").read_text())
    assert "testsensor" in sensors
    manifest = json.loads((out_root / "testsensor" / "manifest.json").read_text())
    assert manifest["statistics"]["patch_counts"]["trn"] == 5
    assert len(manifest["shards"]["trn"]) == 2  # 5 samples, 3 per shard

    from geo_deep_learning_tpu.data.shard_dataset import (
        ShardedDataset,
        iter_tar_samples,
    )

    cfg = sensors["testsensor"]
    ds = ShardedDataset(
        shard_paths=[
            str(out_root / "testsensor" / "trn" / e["path"])
            for e in manifest["shards"]["trn"]
        ],
        patch_count=5,
        normalization_stats_path=cfg["stats_path"],
        sensor_name="testsensor",
        model_type="dofa",
        wavelength_keys=cfg["wavelength_keys"],
    )
    shard = str(out_root / "testsensor" / "trn" / "shard-0000.tar")
    sample = ds.process_sample(next(iter_tar_samples(shard)))
    assert sample["image"].shape[-1] == 3  # NHWC layout (TPU-native)
    assert sample["image"].dtype == np.float32
    assert np.allclose(sample["wavelengths"], [0.665, 0.549, 0.481])
    assert sample["mask"].ndim == 2
