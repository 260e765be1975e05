#!/usr/bin/env python
"""Host input-pipeline benchmark: can the loader feed the chip?

The device-step benchmark (bench.py) times a pre-placed batch; this
script proves the HOST side (GeoTIFF decode → collate → prefetch,
data/loader.py + data/geotiff.py, and the sharded-tar streaming path)
can produce patches at least as fast as each model consumes them
(VERDICT r4 #2). Reference analog: torch DataLoader workers/pin_memory
(reference datamodules/csv_datamodule.py:59-93).

Measures, on a synthetic 512x512 RGB uint8 dataset:

- CSV pipeline patches/sec vs thread count, with the native libtiff
  reader ON vs OFF (GDL_TPU_NO_NATIVE), for the f32 host-preprocess path
  and the uint8 device-preprocess path, uncompressed and LZW;
- sharded-tar streaming patches/sec (the WebDataset-equivalent path);
- an overlap A/B: loader + device_put + a fixed-cost consumer, showing
  wall time ~= max(host, consumer), i.e. H2D transfer and host decode
  hide behind the step (double-buffered prefetch).

Prints one JSON object; use --markdown for a table.

NOTE on this dev container: the TPU is reached through a network relay,
so device_put bandwidth here is NOT representative of a real TPU host
(where the chip is PCIe/ICI-attached); the host-side decode numbers are
the transferable result, and the overlap A/B uses a host-side consumer
to stay hardware-independent.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_dataset(root: Path, n: int, size: int, compress: str | None) -> Path:
    from geo_deep_learning_tpu.data.geotiff import write_geotiff

    rng = np.random.default_rng(0)
    (root / "trn" / "image").mkdir(parents=True, exist_ok=True)
    (root / "trn" / "label").mkdir(parents=True, exist_ok=True)
    rows = []
    for i in range(n):
        img = rng.integers(0, 255, size=(size, size, 3)).astype(np.uint8)
        mask = (img.mean(axis=-1) > 127).astype(np.uint8)
        kw = {"compress": compress} if compress else {}
        write_geotiff(root / "trn" / "image" / f"{i}.tif", img, **kw)
        write_geotiff(root / "trn" / "label" / f"{i}_lbl.tif", mask, **kw)
        rows.append(f"trn/image/{i}.tif;trn/label/{i}_lbl.tif")
    (root / "trn.csv").write_text("\n".join(rows) + "\n")
    return root


def bench_csv(
    root: Path,
    batch_size: int,
    workers: int,
    device_preprocess: bool,
    epochs: int = 2,
) -> float:
    """Patches/sec through CSVDataset + DataLoader (full host pipeline)."""
    from geo_deep_learning_tpu.data.csv_dataset import CSVDataset
    from geo_deep_learning_tpu.data.loader import DataLoader

    ds = CSVDataset(
        str(root),
        str(root),
        split="trn",
        norm_stats={"mean": [0.4] * 3, "std": [0.2] * 3},
        device_preprocess=device_preprocess,
    )
    loader = DataLoader(
        ds, batch_size=batch_size, shuffle=True, num_workers=workers
    )
    # warm epoch (page cache, thread pool spin-up)
    for _ in loader:
        pass
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in loader:
            n += int(batch["image"].shape[0])
    return n / (time.perf_counter() - t0)


def bench_tar(root: Path, batch_size: int, size: int, epochs: int = 2) -> float:
    """Patches/sec through the sharded-tar streaming pipeline
    (ShardedDataset decode/normalize → StreamBatcher collate, the
    WebDataset-equivalent path, data/shard_dataset.py + data/multisensor.py)."""
    import io
    import tarfile

    from geo_deep_learning_tpu.data.multisensor import StreamBatcher
    from geo_deep_learning_tpu.data.shard_dataset import ShardedDataset

    shard_dir = root / "shards"
    shard_dir.mkdir(exist_ok=True)
    # reference WDS member layout (datasets/wds_dataset.py:217-244):
    # <key>.image_patch.npy (CHW uint8) / <key>.label_patch.npy /
    # <key>.metadata.json
    rng = np.random.default_rng(1)
    n_shards, per_shard = 4, 16
    shard_paths = []
    for s in range(n_shards):
        tar_path = shard_dir / f"trn-{s:04d}.tar"
        with tarfile.open(tar_path, "w") as tf:
            for i in range(per_shard):
                img = rng.integers(0, 255, (3, size, size)).astype(np.uint8)
                lbl = rng.integers(0, 2, (size, size)).astype(np.uint8)
                meta = {"metadata": {"datetime": "2024-01-01T00:00:00Z"}}
                for field, payload in [
                    ("image_patch.npy", img),
                    ("label_patch.npy", lbl),
                    ("metadata.json", meta),
                ]:
                    if field.endswith("npy"):
                        buf = io.BytesIO()
                        np.save(buf, payload)
                        data = buf.getvalue()
                    else:
                        data = json.dumps(meta).encode()
                    ti = tarfile.TarInfo(f"sample{s:04d}_{i:04d}.{field}")
                    ti.size = len(data)
                    tf.addfile(ti, io.BytesIO(data))
        shard_paths.append(str(tar_path))
    stats_path = shard_dir / "stats.json"
    stats_path.write_text(
        json.dumps(
            {
                "statistics": {
                    "synthetic": {
                        "mean": [102.0] * 3,
                        "std": [51.0] * 3,
                        "band_count": 3,
                        "patch_count": n_shards * per_shard,
                        "dtype": "uint8",
                    }
                }
            }
        )
    )
    ds = ShardedDataset(
        sensor_name="synthetic",
        shard_paths=shard_paths,
        patch_count=n_shards * per_shard,
        normalization_stats_path=str(stats_path),
        model_type="unified",
        split="trn",
        batch_size=batch_size,
        shuffle_buffer=8,
    )
    batcher = StreamBatcher(
        lambda epoch: ds.iter_samples(epoch=epoch),
        batch_size=batch_size,
        drop_partial=True,
    )
    for _ in batcher:  # warm epoch (page cache)
        pass
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in batcher:
            n += int(batch["image"].shape[0])
    return n / (time.perf_counter() - t0)


def bench_overlap(root: Path, batch_size: int, step_ms: float, workers: int) -> dict:
    """A/B: loader feeding a fixed-cost consumer with device_put.

    serial   = sum of (load + put + step) with prefetch disabled (1-deep)
    overlapped = loader prefetch hides decode behind the consumer
    A real TPU host overlaps H2D the same way (double buffering).
    """
    import jax

    from geo_deep_learning_tpu.data.csv_dataset import CSVDataset
    from geo_deep_learning_tpu.data.loader import DataLoader

    ds = CSVDataset(
        str(root),
        str(root),
        split="trn",
        norm_stats={"mean": [0.4] * 3, "std": [0.2] * 3},
        device_preprocess=True,
    )

    cpu = (
        jax.devices("cpu")[0]
        if jax.devices()[0].platform != "cpu"
        else jax.devices()[0]
    )

    def consume(batch):
        jax.device_put(batch["image"], cpu).block_until_ready()
        time.sleep(step_ms / 1e3)  # stand-in for the jitted step
        return int(batch["image"].shape[0])

    def run_serial() -> float:
        """Strictly synchronous: load a batch, then step — no thread."""
        from geo_deep_learning_tpu.data.loader import collate

        n = 0
        idx = list(range(len(ds)))
        t0 = time.perf_counter()
        for i in range(0, len(idx) - batch_size + 1, batch_size):
            batch = collate([ds[j] for j in idx[i : i + batch_size]])
            n += consume(batch)
        return n / (time.perf_counter() - t0)

    def run_overlapped() -> float:
        loader = DataLoader(
            ds, batch_size=batch_size, num_workers=workers, prefetch=4
        )
        n = 0
        t0 = time.perf_counter()
        for batch in loader:
            n += consume(batch)
        return n / (time.perf_counter() - t0)

    run_serial()  # warm page cache
    serial = run_serial()
    overlapped = run_overlapped()
    return {
        "serial_pps": round(serial, 2),
        "overlapped_pps": round(overlapped, 2),
        "speedup": round(overlapped / serial, 2),
        "consumer_step_ms": step_ms,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64, help="patches in the dataset")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--threads", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--markdown", action="store_true")
    p.add_argument("--skip-overlap", action="store_true")
    args = p.parse_args()

    report: dict = {"host_cpus": os.cpu_count(), "patch": f"{args.size}x{args.size}x3"}
    with tempfile.TemporaryDirectory(prefix="bench_loader_") as tmp:
        results = {}
        for compress in (None, "lzw"):
            root = make_dataset(
                Path(tmp) / (compress or "raw"), args.n, args.size, compress
            )
            for native in (True, False):
                os.environ["GDL_TPU_NO_NATIVE"] = "" if native else "1"
                # reset the native-lib memo so the env change takes effect
                import geo_deep_learning_tpu.data._native as natmod

                natmod._tried = False
                natmod._lib = None
                for dp in (True, False):
                    key = (
                        f"csv/{compress or 'raw'}/"
                        f"{'native' if native else 'numpy'}/"
                        f"{'uint8' if dp else 'f32'}"
                    )
                    results[key] = {
                        f"t{w}": round(
                            bench_csv(root, args.batch, w, dp, args.epochs), 1
                        )
                        for w in args.threads
                    }
            os.environ["GDL_TPU_NO_NATIVE"] = ""
            natmod._tried = False
            natmod._lib = None
        report["csv_pps"] = results
        raw_root = Path(tmp) / "raw"
        report["tar_pps"] = round(
            bench_tar(raw_root, args.batch, args.size, args.epochs), 1
        )
        if not args.skip_overlap:
            report["overlap"] = bench_overlap(
                raw_root, args.batch, step_ms=100.0, workers=max(args.threads)
            )

    print(json.dumps(report))
    if args.markdown:
        print("\n| pipeline | " + " | ".join(f"{w} thr" for w in args.threads) + " |")
        print("|---|" + "---|" * len(args.threads))
        for key, row in report["csv_pps"].items():
            print(
                f"| {key} | "
                + " | ".join(str(row[f"t{w}"]) for w in args.threads)
                + " |"
            )
        print(f"| tar stream | {report['tar_pps']} |")


if __name__ == "__main__":
    main()
