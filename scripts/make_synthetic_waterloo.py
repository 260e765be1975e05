"""Generate a synthetic Waterloo-like building-segmentation dataset.

The reference's smallest verified workflow trains on the Waterloo
Building Dataset 512² subset (reference notebooks/00_quickstart.ipynb,
cells 1-5: aerial RGB orthoimagery + binary building-footprint masks,
split CSVs of ``image;label`` pairs). That archive is not available in
this zero-egress environment, so this script synthesizes a structurally
similar dataset: textured ground with roads, and axis-rotated rectangular
"buildings" with distinct roof tones, edge shading, and sensor noise —
enough signal that segmentation quality (mIoU) is a meaningful number,
while remaining fully reproducible from a seed.

Layout produced (matches reference CSVDataset expectations,
datasets/csv_dataset.py:89-106):

    <root>/{trn,val,tst}/image/{i}.tif
    <root>/{trn,val,tst}/label/{i}_lbl.tif
    <root>/{trn,val,tst}.csv          (semicolon-separated pairs)

Usage: python scripts/make_synthetic_waterloo.py <root> [--train 600]
       [--val 150] [--test 150] [--size 512] [--seed 0]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

# runnable straight from a checkout, without the package installed;
# absolute so it survives cwd changes and never leaves a relative
# entry in sys.path when imported from elsewhere
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _smooth(field: np.ndarray, k: int) -> np.ndarray:
    """Box-blur a 2-D field k times via cumulative sums (no scipy)."""
    for _ in range(2):
        c = np.cumsum(field, axis=0)
        field = (np.roll(c, -k, 0) - c) / k
        c = np.cumsum(field, axis=1)
        field = (np.roll(c, -k, 1) - c) / k
    return field


def make_patch(
    rng: np.random.Generator, size: int, classes: str = "binary", bands: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """One (image uint8 HWC, mask uint8 HW) pair.

    ``classes="binary"``: building footprints only (quickstart workflow).
    ``classes="five"``: the reference SegFormer/DOFA recipes' 5-class
    scheme (configs/segformer_config_RGB.yaml class_labels) — 0
    background, 1 fore(st)/vegetation, 2 hydro, 3 roads, 4 buildings.
    ``bands=4`` appends a NIR band (bright over vegetation, dark over
    water/roads/roofs — the usual spectral signature) for multi-sensor
    demos mixing RGB and RGBN sensors.
    """
    five = classes == "five"
    # ground: low-frequency green/brown texture
    base = _smooth(rng.normal(size=(size, size)), 31)
    base = (base - base.min()) / (np.ptp(base) + 1e-9)
    img = np.stack(
        [
            90 + 60 * base + rng.normal(0, 6, (size, size)),
            110 + 50 * base + rng.normal(0, 6, (size, size)),
            80 + 40 * base + rng.normal(0, 6, (size, size)),
        ],
        axis=-1,
    )
    mask = np.zeros((size, size), np.uint8)
    yy, xx = np.mgrid[0:size, 0:size]
    if five:
        # forest/vegetation: dark-green high-texture zones where a second
        # smoothed field is high
        veg = _smooth(rng.normal(size=(size, size)), 47)
        veg = (veg - veg.min()) / (np.ptp(veg) + 1e-9)
        vmask = veg > 0.62
        img[vmask] = (
            np.stack([40 + 20 * base[vmask], 95 + 35 * base[vmask], 45 + 15 * base[vmask]], -1)
            + rng.normal(0, 7, (int(vmask.sum()), 3))
        )
        mask[vmask] = 1
        # hydro: 1-2 elliptical dark-blue water bodies
        for _ in range(rng.integers(1, 3)):
            cy, cx = rng.integers(40, size - 40, 2)
            ry, rx = rng.integers(25, 90, 2)
            inside = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
            img[inside] = np.array([40, 60, 120]) + rng.normal(
                0, 4, (int(inside.sum()), 3)
            )
            mask[inside] = 2
    # roads: a couple of grey strips
    for _ in range(rng.integers(1, 3)):
        pos = rng.integers(0, size)
        width = rng.integers(8, 20)
        sl = slice(max(0, pos - width // 2), min(size, pos + width // 2))
        if rng.random() < 0.5:
            img[sl, :, :] = 120 + rng.normal(0, 4, img[sl, :, :].shape)
            if five:
                mask[sl, :] = 3
        else:
            img[:, sl, :] = 120 + rng.normal(0, 4, img[:, sl, :].shape)
            if five:
                mask[:, sl] = 3
    for _ in range(rng.integers(4, 14)):
        cy, cx = rng.integers(20, size - 20, 2)
        h, w = rng.integers(14, 70, 2)
        theta = rng.uniform(0, np.pi)
        c, s = np.cos(theta), np.sin(theta)
        u = (yy - cy) * c + (xx - cx) * s
        v = -(yy - cy) * s + (xx - cx) * c
        inside = (np.abs(u) < h / 2) & (np.abs(v) < w / 2)
        roof = rng.uniform(140, 235)
        tint = rng.uniform(-15, 15, 3)
        img[inside] = roof + tint + rng.normal(0, 5, (int(inside.sum()), 3))
        # edge shadow just outside one side of the footprint
        shadow = (
            (np.abs(u) < h / 2 + 4) & (np.abs(v) < w / 2 + 4) & ~inside
        )
        img[shadow] = img[shadow] * 0.55
        mask[inside] = 4 if five else 1
    if bands == 4:
        # NIR: follows vegetation reflectance — bright on vegetation
        # (incl. the base texture), dark on water/roads/buildings
        nir = 120 + 100 * base + rng.normal(0, 8, (size, size))
        nir[mask == 2] = 20 + rng.normal(0, 4, (int((mask == 2).sum()),))
        nir[mask == 3] = 70 + rng.normal(0, 5, (int((mask == 3).sum()),))
        nir[mask == (4 if five else 1)] = 90 + rng.normal(
            0, 8, (int((mask == (4 if five else 1)).sum()),)
        )
        if five:
            nir[mask == 1] = 200 + rng.normal(0, 10, (int((mask == 1).sum()),))
        img = np.concatenate([img, nir[:, :, None]], axis=-1)
    img = np.clip(img, 0, 255).astype(np.uint8)
    return img, mask


def main() -> None:
    from geo_deep_learning_tpu.data.geotiff import write_geotiff

    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("--train", type=int, default=600)
    p.add_argument("--val", type=int, default=150)
    p.add_argument("--test", type=int, default=150)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--classes", choices=["binary", "five"], default="binary")
    p.add_argument("--bands", type=int, choices=[3, 4], default=3)
    args = p.parse_args()

    root = Path(args.root)
    rng = np.random.default_rng(args.seed)
    for split, n in [("trn", args.train), ("val", args.val), ("tst", args.test)]:
        (root / split / "image").mkdir(parents=True, exist_ok=True)
        (root / split / "label").mkdir(parents=True, exist_ok=True)
        rows = []
        for i in range(n):
            img, mask = make_patch(rng, args.size, args.classes, args.bands)
            write_geotiff(root / split / "image" / f"{i}.tif", img)
            write_geotiff(root / split / "label" / f"{i}_lbl.tif", mask)
            rows.append(f"{split}/image/{i}.tif;{split}/label/{i}_lbl.tif")
        (root / f"{split}.csv").write_text("\n".join(rows) + "\n")
        print(f"{split}: {n} patches")


if __name__ == "__main__":
    main()
