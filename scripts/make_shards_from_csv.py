"""Convert a CSV/GeoTIFF patch dataset into the sharded-tar streaming layout.

The reference ships no tooling to produce its WebDataset shards (users
bring pre-built archives; reference datasets/wds_dataset.py only READS
them). This converter closes that gap: it takes a CSV-dataset root (the
quickstart layout, reference datasets/csv_dataset.py:89-106) and emits
the exact multi-sensor layout `data/multisensor.py` consumes:

    <out>/<sensor>/{trn,val,tst}/shard-NNNN.tar    (.image_patch.npy [C,H,W],
                                                    .label_patch.npy [H,W],
                                                    .metadata.json)
    <out>/<sensor>/manifest.json                   (shards + patch counts)
    <out>/<sensor>/stats.json                      (per-band mean/std, 0-255)
    <out>/sensors.yaml                             (sensor registry)

Band statistics are computed over the actual training images; metadata
carries per-band wavelengths (DOFA format) plus datetime/lat-lon (CLAY
format), so every model_type in shard_dataset.py can stream the result.

Usage:
    python scripts/make_shards_from_csv.py data/five_class data/shards \
        --sensor geoeye --per-shard 64 \
        [--wavelengths 0.665 0.549 0.481] [--yaml-out data/sensors.yaml]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tarfile
from pathlib import Path

import numpy as np
import yaml

# runnable straight from a checkout, without the package installed
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _read_pairs(root: Path, split: str) -> list[tuple[Path, Path]]:
    csv = root / f"{split}.csv"
    if not csv.exists():
        return []
    pairs = []
    for line in csv.read_text().strip().splitlines():
        img, lbl = line.split(";")
        pairs.append((root / img.strip(), root / lbl.strip()))
    return pairs


def main() -> None:
    from geo_deep_learning_tpu.data.geotiff import read_geotiff

    p = argparse.ArgumentParser()
    p.add_argument("csv_root")
    p.add_argument("out_root")
    p.add_argument("--sensor", default="geoeye")
    p.add_argument("--per-shard", type=int, default=64)
    p.add_argument(
        "--wavelengths", type=float, nargs="+", default=[0.665, 0.549, 0.481]
    )
    p.add_argument("--datetime", default="2023-06-15T14:30:00Z")
    p.add_argument("--lat", type=float, default=43.47)  # Waterloo, ON
    p.add_argument("--lon", type=float, default=-80.54)
    p.add_argument("--yaml-out", default=None)
    args = p.parse_args()

    csv_root = Path(args.csv_root)
    sdir = Path(args.out_root) / args.sensor
    wl_names = ["red", "green", "blue", "nir", "swir1", "swir2"]
    meta = {
        "metadata": {
            "datetime": args.datetime,
            "coordinates_lat": args.lat,
            "coordinates_lon": args.lon,
            **{
                f"{wl_names[i]}_wavelength": w
                for i, w in enumerate(args.wavelengths)
            },
        }
    }

    manifest = {"shards": {}, "statistics": {"patch_counts": {}}}
    sum_ = None
    sumsq = None
    count_px = 0
    bands = None
    for split in ("trn", "val", "tst"):
        pairs = _read_pairs(csv_root, split)
        if not pairs:
            continue
        (sdir / split).mkdir(parents=True, exist_ok=True)
        entries = []
        for s in range(0, len(pairs), args.per_shard):
            chunk = pairs[s : s + args.per_shard]
            name = f"shard-{s // args.per_shard:04d}.tar"
            with tarfile.open(sdir / split / name, "w") as tar:
                for img_path, lbl_path in chunk:
                    img, _ = read_geotiff(str(img_path))  # [H, W, C]
                    lbl, _ = read_geotiff(str(lbl_path))
                    img_chw = np.moveaxis(np.asarray(img), -1, 0)
                    lbl2d = np.asarray(lbl).squeeze()
                    if split == "trn":
                        f = img_chw.reshape(img_chw.shape[0], -1).astype(np.float64)
                        bands = img_chw.shape[0]
                        if sum_ is None:
                            sum_ = f.sum(1)
                            sumsq = (f**2).sum(1)
                        else:
                            sum_ += f.sum(1)
                            sumsq += (f**2).sum(1)
                        count_px += f.shape[1]
                    key = img_path.stem
                    for field, payload in [
                        (f"{key}.image_patch.npy", img_chw),
                        (f"{key}.label_patch.npy", lbl2d),
                        (f"{key}.metadata.json", meta),
                    ]:
                        if field.endswith(".npy"):
                            buf = io.BytesIO()
                            np.save(buf, payload)
                            raw = buf.getvalue()
                        else:
                            raw = json.dumps(payload).encode()
                        info = tarfile.TarInfo(field)
                        info.size = len(raw)
                        tar.addfile(info, io.BytesIO(raw))
            entries.append({"path": name})
        manifest["shards"][split] = entries
        manifest["statistics"]["patch_counts"][split] = len(pairs)
        print(f"{split}: {len(pairs)} patches in {len(entries)} shards")

    mean = (sum_ / count_px).tolist()
    std = np.sqrt(sumsq / count_px - (sum_ / count_px) ** 2).tolist()
    (sdir / "manifest.json").write_text(json.dumps(manifest, indent=1))
    (sdir / "stats.json").write_text(
        json.dumps(
            {
                "statistics": {
                    args.sensor: {
                        "mean": mean,
                        "std": std,
                        "band_count": bands,
                        "patch_count": manifest["statistics"]["patch_counts"].get(
                            "trn", 0
                        ),
                        "dtype": "uint8",
                    }
                }
            },
            indent=1,
        )
    )
    yaml_path = Path(args.yaml_out or (Path(args.out_root) / "sensors.yaml"))
    registry = {}
    if yaml_path.exists():
        registry = yaml.safe_load(yaml_path.read_text()) or {}
    registry[args.sensor] = {
        "manifest_path": str(sdir / "manifest.json"),
        "parent_dir": str(sdir),
        "stats_path": str(sdir / "stats.json"),
        "wavelength_keys": [
            f"{wl_names[i]}_wavelength" for i in range(len(args.wavelengths))
        ],
    }
    yaml_path.parent.mkdir(parents=True, exist_ok=True)
    yaml_path.write_text(yaml.safe_dump(registry))
    print(f"wrote {yaml_path} (sensor: {args.sensor}, mean={np.round(mean,1)})")


if __name__ == "__main__":
    main()
