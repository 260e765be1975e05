"""Tar-shard streaming + multi-sensor mixing + sampler tests."""

import io
import json
import tarfile

import numpy as np
import pytest
import yaml

from geo_deep_learning_tpu.data.multisensor import (
    MultiSensorDataModule,
    StreamBatcher,
    random_mix,
)
from geo_deep_learning_tpu.data.samplers import (
    RoundRobinDistributedSampler,
    RoundRobinSampler,
    create_round_robin_sampler,
)
from geo_deep_learning_tpu.data.shard_dataset import (
    ShardedDataset,
    encode_spatial,
    encode_temporal,
    iter_tar_samples,
)


def _write_shard(path, keys, bands=4, size=16, wavelengths=True):
    with tarfile.open(path, "w") as tar:
        for key in keys:
            rng = np.random.default_rng(abs(hash(key)) % 2**32)
            img = rng.integers(0, 255, (bands, size, size)).astype(np.uint8)
            lbl = rng.integers(0, 3, (size, size)).astype(np.uint8)
            meta = {
                "metadata": {
                    "datetime": "2023-06-15T14:30:00Z",
                    "coordinates_lat": 45.4,
                    "coordinates_lon": -75.7,
                    "red_wavelength": 0.665,
                    "green_wavelength": 0.549,
                    "blue_wavelength": 0.481,
                    "nir_wavelength": 0.842,
                }
            }
            for field, payload in [
                ("image_patch.npy", img),
                ("label_patch.npy", lbl),
                ("metadata.json", meta),
            ]:
                if field.endswith("npy"):
                    buf = io.BytesIO()
                    np.save(buf, payload)
                    raw = buf.getvalue()
                else:
                    raw = json.dumps(payload).encode()
                info = tarfile.TarInfo(f"{key}.{field}")
                info.size = len(raw)
                tar.addfile(info, io.BytesIO(raw))


@pytest.fixture(scope="module")
def sensor_root(tmp_path_factory):
    """Two sensors, manifest+stats+config files in the reference layout."""
    root = tmp_path_factory.mktemp("sensors")
    config = {}
    for sensor, n_shards, per_shard in [("geoeye", 2, 6), ("worldview", 1, 4)]:
        sdir = root / sensor
        manifest = {"shards": {}, "statistics": {"patch_counts": {}}}
        for split in ("trn", "val", "tst"):
            (sdir / split).mkdir(parents=True)
            shard_entries = []
            count = 0
            for s in range(n_shards):
                name = f"shard-{s:04d}.tar"
                keys = [f"{sensor}_{split}_{s}_{i}" for i in range(per_shard)]
                _write_shard(sdir / split / name, keys)
                shard_entries.append({"path": name})
                count += per_shard
            manifest["shards"][split] = shard_entries
            manifest["statistics"]["patch_counts"][split] = count
        (sdir / "manifest.json").write_text(json.dumps(manifest))
        stats = {
            "statistics": {
                sensor: {
                    "mean": [120.0, 110.0, 100.0, 90.0],
                    "std": [50.0, 50.0, 50.0, 50.0],
                    "band_count": 4,
                    "patch_count": count,
                    "dtype": "uint8",
                }
            }
        }
        (sdir / "stats.json").write_text(json.dumps(stats))
        config[sensor] = {
            "manifest_path": str(sdir / "manifest.json"),
            "parent_dir": str(sdir),
            "stats_path": str(sdir / "stats.json"),
            "wavelength_keys": [
                "red_wavelength",
                "green_wavelength",
                "blue_wavelength",
                "nir_wavelength",
            ],
        }
    cfg_path = root / "sensors.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    return root, cfg_path


def test_iter_tar_samples(sensor_root):
    root, _ = sensor_root
    shard = root / "geoeye" / "trn" / "shard-0000.tar"
    samples = list(iter_tar_samples(shard))
    assert len(samples) == 6
    s = samples[0]
    assert s["image_patch.npy"].shape == (4, 16, 16)
    assert "metadata.json" in s and "__key__" in s


def test_sharded_dataset_dofa_format(sensor_root):
    root, _ = sensor_root
    ds = ShardedDataset(
        sensor_name="geoeye",
        shard_paths=[str(root / "geoeye" / "trn" / f"shard-{i:04d}.tar") for i in range(2)],
        patch_count=12,
        normalization_stats_path=str(root / "geoeye" / "stats.json"),
        model_type="dofa",
        split="trn",
        shuffle_buffer=4,
    )
    samples = list(ds.iter_samples(epoch=0))
    assert len(samples) == 12
    s = samples[0]
    assert s["image"].shape == (16, 16, 4)  # HWC conversion
    assert s["mask"].dtype == np.int32
    np.testing.assert_allclose(
        s["wavelengths"], [0.665, 0.549, 0.481, 0.842], atol=1e-6
    )
    # standardized with /255 stats
    assert abs(float(np.mean(s["image"]))) < 5


def test_sharded_dataset_clay_format(sensor_root):
    root, _ = sensor_root
    ds = ShardedDataset(
        sensor_name="geoeye",
        shard_paths=[str(root / "geoeye" / "val" / "shard-0000.tar")],
        patch_count=6,
        normalization_stats_path=str(root / "geoeye" / "stats.json"),
        model_type="clay",
        split="val",
    )
    s = next(ds.iter_samples())
    assert s["time"].shape == (4,)
    assert s["latlon"].shape == (4,)
    assert not np.allclose(s["time"], 0)


def test_temporal_spatial_encoding_fallbacks():
    assert np.allclose(encode_temporal("not-a-date"), 0)
    t = encode_temporal("2023-06-15T14:30:00Z")
    assert np.all(np.abs(t) <= 1)
    ll = encode_spatial(45.0, -75.0)
    np.testing.assert_allclose(np.linalg.norm(ll[:2]), 1.0, atol=1e-6)


def test_shuffle_differs_across_epochs(sensor_root):
    root, _ = sensor_root
    ds = ShardedDataset(
        sensor_name="geoeye",
        shard_paths=[str(root / "geoeye" / "trn" / f"shard-{i:04d}.tar") for i in range(2)],
        patch_count=12,
        normalization_stats_path=str(root / "geoeye" / "stats.json"),
        model_type="unified",
        split="trn",
        shuffle_buffer=12,
        shardshuffle=10,
    )
    names0 = [s["image_name"] for s in ds.iter_samples(epoch=0)]
    names1 = [s["image_name"] for s in ds.iter_samples(epoch=1)]
    assert sorted(names0) == sorted(names1)
    assert names0 != names1


def test_random_mix_longest():
    a = iter([{"v": "a"}] * 5)
    b = iter([{"v": "b"}] * 2)
    out = [s["v"] for s in random_mix([a, b], seed=0)]
    assert len(out) == 7
    assert out.count("a") == 5 and out.count("b") == 2


def test_multisensor_datamodule_end_to_end(sensor_root):
    _, cfg = sensor_root
    dm = MultiSensorDataModule(
        sensor_configs_path=str(cfg),
        model_type="dofa",
        batch_size=4,
        epoch_size=8,
        shuffle_buffer=8,
    )
    dm.setup()
    assert set(dm.datasets) == {"geoeye", "worldview"}
    train = dm.train_dataloader()
    batches = list(train)
    assert len(batches) == 2  # epoch_size 8 / batch 4
    b = batches[0]
    assert b["image"].shape == (4, 16, 16, 4)
    assert b["wavelengths"].shape == (4, 4)
    platforms = set()
    for bt in batches:
        platforms.update(bt["platform"])
    # mixing can draw from either sensor
    assert platforms.issubset({"geoeye", "worldview"})

    val = dm.val_dataloader()
    vb = list(val)
    total = sum(b["valid_count"] for b in vb)
    assert total == 16  # 12 + 4 val patches
    assert all(b["image"].shape[0] == 4 for b in vb)  # padded static shapes


def test_round_robin_sampler_weights_and_balance():
    s = RoundRobinSampler(
        {"a": 10, "b": 20}, batch_size=5, weights="equal", balance=True, seed=0
    )
    batches = list(s)
    names = [n for n, _ in batches]
    assert names.count("a") == names.count("b") == 4  # balanced to 20 each
    for _, idx in batches:
        assert len(idx) == 5
    with pytest.raises(ValueError, match="positive integers"):
        RoundRobinSampler({"a": 4}, weights={"a": 0})


def test_round_robin_proportional():
    s = RoundRobinSampler(
        {"a": 10, "b": 30}, batch_size=5, weights="proportional", balance=False
    )
    assert s.weights == {"a": 1, "b": 3}


def test_round_robin_distributed_slices():
    all_idx = {}
    for rank in range(2):
        s = RoundRobinDistributedSampler(
            {"a": 20},
            num_replicas=2,
            rank=rank,
            batch_size=5,
            balance=False,
            shuffle=True,
            seed=1,
        )
        s.set_epoch(3)
        all_idx[rank] = [i for _, b in s for i in b]
    assert len(all_idx[0]) == len(all_idx[1]) == 10
    assert not set(all_idx[0]) & set(all_idx[1])  # disjoint
    with pytest.raises(ValueError, match="rank"):
        RoundRobinDistributedSampler({"a": 4}, num_replicas=2, rank=5)


def test_factory():
    s = create_round_robin_sampler({"a": 8}, batch_size=4)
    assert isinstance(s, RoundRobinSampler)


def test_mixing_is_batch_level_for_heterogeneous_sensors(tmp_path):
    """Sensors with DIFFERENT band counts (RGB + RGBN) must mix at BATCH
    granularity — each batch single-sensor (reference semantics: per-
    sensor ``.batched(bs)`` before RandomMix, wds_datamodule.py:179-190);
    sample-level mixing would collate incompatible channel counts."""
    import json as _json

    import yaml as _yaml

    root = tmp_path
    config = {}
    for sensor, bands, n in [("rgb_sensor", 3, 8), ("rgbn_sensor", 4, 8)]:
        sdir = root / sensor
        manifest = {"shards": {}, "statistics": {"patch_counts": {}}}
        for split in ("trn", "val", "tst"):
            (sdir / split).mkdir(parents=True)
            _write_shard(
                sdir / split / "shard-0000.tar",
                [f"{sensor}_{split}_{i}" for i in range(n)],
                bands=bands,
            )
            manifest["shards"][split] = [{"path": "shard-0000.tar"}]
            manifest["statistics"]["patch_counts"][split] = n
        (sdir / "manifest.json").write_text(_json.dumps(manifest))
        stats = {
            "statistics": {
                sensor: {
                    "mean": [100.0] * bands,
                    "std": [50.0] * bands,
                    "band_count": bands,
                    "patch_count": n,
                    "dtype": "uint8",
                }
            }
        }
        (sdir / "stats.json").write_text(_json.dumps(stats))
        config[sensor] = {
            "manifest_path": str(sdir / "manifest.json"),
            "parent_dir": str(sdir),
            "stats_path": str(sdir / "stats.json"),
            "wavelength_keys": [
                "red_wavelength", "green_wavelength", "blue_wavelength",
                "nir_wavelength",
            ][:bands],
        }
    cfg_path = root / "sensors.yaml"
    cfg_path.write_text(_yaml.safe_dump(config))

    dm = MultiSensorDataModule(
        sensor_configs_path=str(cfg_path),
        model_type="dofa",
        batch_size=4,
        epoch_size=16,
        shuffle_buffer=8,
    )
    dm.setup()
    seen_channels = set()
    for b in dm.train_dataloader():
        c = b["image"].shape[-1]
        seen_channels.add(c)
        # every batch is single-sensor: uniform platform + matching λ count
        assert len(set(b["platform"])) == 1
        assert b["wavelengths"].shape[-1] == c
    assert seen_channels == {3, 4}  # both sensors drawn over the epoch


def test_with_epoch_cycles_when_dataset_smaller(sensor_root):
    """with_epoch semantics (ref wds_datamodule.py:112-113): a configured
    train epoch_size larger than the dataset must cycle the stream —
    every epoch delivers exactly epoch_size//bs full batches."""
    _, cfg = sensor_root
    dm = MultiSensorDataModule(
        sensor_configs_path=str(cfg),
        model_type="dofa",
        batch_size=4,
        epoch_size=40,  # dataset only has 16 trn patches
        shuffle_buffer=8,
    )
    dm.setup()
    train = dm.train_dataloader()
    assert len(train) == 10
    for _ in range(2):  # stable across epochs
        batches = list(train)
        assert len(batches) == 10
        assert all(int(b["valid_count"]) == 4 for b in batches)


def test_stream_batcher_cycles_single_stream():
    rng = np.random.default_rng(0)
    samples = [{"image": rng.normal(size=(4, 4, 3)).astype(np.float32),
                "idx": np.int32(i)} for i in range(5)]

    def make_stream(epoch):
        order = np.random.default_rng(epoch).permutation(5)
        return iter([samples[i] for i in order])

    sb = StreamBatcher(make_stream, batch_size=2, drop_partial=True,
                       epoch_size=9, cycle=True)
    batches = list(sb)
    assert len(batches) == 4  # floor(9/2) full batches from a 5-sample set
    seen = np.concatenate([b["idx"] for b in batches])
    assert len(seen) == 8
    # the cycled pass re-visits samples
    assert np.bincount(seen, minlength=5).max() >= 2


def test_stream_batcher_no_cycle_stops_at_exhaustion():
    def make_stream(epoch):
        return iter([{"idx": np.int32(i)} for i in range(5)])

    sb = StreamBatcher(make_stream, batch_size=2, drop_partial=True,
                       epoch_size=9, cycle=False)
    assert len(list(sb)) == 2  # legacy behavior preserved when off
