"""Multi-sensor streaming datamodule: mixing + batched loaders.

Reference equivalent: ``datamodules/wds_datamodule.py:14-207``
(``MultiSensorDataModule``): per-sensor ``ShardedDataset``s from a YAML
sensor config; a single sensor streams directly, multiple sensors are
mixed sample-wise with equal probability until ALL are exhausted
(``wds.RandomMix(longest=True)``, ref :179-190); training can be bounded
to a nominal ``epoch_size`` (ref ``with_epoch``, :112-113).

Batching semantics (ref datasets/wds_dataset.py:418-423): train drops the
partial tail batch; val/test keep it — here padded with wraparound +
``valid_count`` so jit shapes stay static.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Any, Iterator

import numpy as np

from geo_deep_learning_tpu.data.loader import collate
from geo_deep_learning_tpu.data.shard_dataset import (
    ShardedDataset,
    create_shard_split_paths,
    load_sensor_configs,
)

logger = logging.getLogger(__name__)


def random_mix(
    streams: list[Iterator], seed: int = 0, probs: list[float] | None = None
) -> Iterator:
    """Sample-wise random mixing, equal probability, until all exhausted
    (``wds.RandomMix(longest=True)`` semantics)."""
    rng = np.random.default_rng(seed)
    alive = list(streams)
    weights = list(probs) if probs else [1.0] * len(alive)
    while alive:
        i = rng.choice(len(alive), p=np.asarray(weights) / np.sum(weights))
        try:
            yield next(alive[i])
        except StopIteration:
            del alive[i]
            del weights[i]


class StreamBatcher:
    """Batch an (infinite or finite) sample stream with static shapes.

    Iterating yields collated numpy batch dicts. ``epoch_size`` (in
    samples) bounds one epoch of an otherwise endless stream.
    """

    def __init__(
        self,
        make_stream,  # (epoch) -> sample stream OR list of per-sensor streams
        batch_size: int,
        drop_partial: bool,
        epoch_size: int | None = None,
        prefetch: int = 2,
        mix_seed: int = 0,
        mix_probs: list[float] | None = None,
        cycle: bool = False,
    ) -> None:
        self.make_stream = make_stream
        self.batch_size = batch_size
        self.drop_partial = drop_partial
        self.epoch_size = epoch_size
        self.prefetch = prefetch
        self.mix_seed = mix_seed
        self.mix_probs = mix_probs
        self.cycle = cycle
        self.epoch = 0

    def __len__(self) -> int:
        if self.epoch_size is None:
            msg = "stream length unknown without epoch_size"
            raise TypeError(msg)
        if self.drop_partial:
            return self.epoch_size // self.batch_size
        return -(-self.epoch_size // self.batch_size)

    def _cycled(self, idx: int, first, start_epoch: int) -> Iterator[dict]:
        """``with_epoch`` semantics (ref wds_datamodule.py:112-113, and
        webdataset's persistent-iterator behavior behind it): when the
        underlying pipeline exhausts before the nominal ``epoch_size`` is
        reached, restart it — a fresh pass with a new shuffle order — so
        every training epoch delivers exactly ``epoch_size`` samples even
        when the dataset is smaller. Lazy: streams that do cover
        ``epoch_size`` never restart."""
        yield from first
        pass_idx = 1
        while True:
            streams = self.make_stream(start_epoch + 7919 * pass_idx)
            s = (
                streams[idx]
                if isinstance(streams, (list, tuple))
                else streams
            )
            yield from s
            pass_idx += 1

    def _batches(self, stream, cap_samples: bool = True) -> Iterator[dict]:
        buf: list[dict] = []
        count = 0
        for sample in stream:
            buf.append(sample)
            count += 1
            if len(buf) == self.batch_size:
                batch = collate(buf)
                batch["valid_count"] = np.int32(self.batch_size)
                yield batch
                buf = []
            if (
                cap_samples
                and self.epoch_size is not None
                and count >= self.epoch_size
            ):
                break
        if buf and not self.drop_partial:
            valid = len(buf)
            while len(buf) < self.batch_size:  # pad with wraparound
                buf.append(buf[len(buf) % valid])
            batch = collate(buf)
            batch["valid_count"] = np.int32(valid)
            yield batch

    def _mixed_batches(self, streams: list) -> Iterator[dict]:
        """Batch each sensor's stream SEPARATELY, then mix whole batches —
        the reference's semantics (each sensor pipeline ``.batched(bs)``
        before ``wds.RandomMix``, wds_datamodule.py:179-190). Sample-level
        mixing would collate different sensors' channel counts into one
        batch, which is ill-formed for heterogeneous sensors (e.g. RGB +
        RGBN); batch-level mixing keeps every batch single-sensor."""
        import itertools

        gens = [self._batches(s, cap_samples=False) for s in streams]
        mixed = random_mix(
            gens, seed=self.mix_seed + self.epoch, probs=self.mix_probs
        )
        if self.epoch_size is not None and (self.drop_partial or self.cycle):
            # cycled per-sensor streams are endless — the islice is the cap
            mixed = itertools.islice(mixed, len(self))
        return mixed

    def __iter__(self) -> Iterator[dict]:
        stream = self.make_stream(self.epoch)
        epoch0 = self.epoch
        self.epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        streams = (
            list(stream) if isinstance(stream, (list, tuple)) else [stream]
        )
        if self.cycle and self.epoch_size is not None:
            streams = [
                self._cycled(i, s, epoch0) for i, s in enumerate(streams)
            ]
        batches = (
            self._mixed_batches(streams)
            if len(streams) > 1
            else self._batches(streams[0])
        )

        def produce():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    q.put(b)
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is None:
                    break
                yield b
        finally:
            stop.set()


class MultiSensorDataModule:
    def __init__(
        self,
        sensor_configs_path: str,
        model_type: str = "clay",
        batch_size: int = 16,
        num_workers: int = 4,
        epoch_size: int | None = None,
        shuffle_buffer: int = 1000,
        shardshuffle: int | None = 100,
        seed: int = 42,
        mix_probs: list[float] | None = None,
    ) -> None:
        self.sensor_configs_path = sensor_configs_path
        self.model_type = model_type
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.epoch_size = epoch_size
        self.shuffle_buffer = shuffle_buffer
        self.shardshuffle = shardshuffle
        self.seed = seed
        self.mix_probs = mix_probs
        self.datasets: dict[str, dict[str, ShardedDataset]] = {}

    def setup(self, stage: str | None = None) -> None:
        sensor_configs = load_sensor_configs(self.sensor_configs_path)
        self.datasets = {}
        for sensor_name, config in sensor_configs.items():
            self.datasets[sensor_name] = {}
            for split in ("trn", "val", "tst"):
                try:
                    shard_paths, patch_count = create_shard_split_paths(
                        manifest_path=config["manifest_path"],
                        split=split,
                        parent_dir=config.get("parent_dir"),
                    )
                except (FileNotFoundError, KeyError) as e:
                    logger.warning("manifest issue for %s/%s: %s", sensor_name, split, e)
                    continue
                if not shard_paths:
                    logger.warning("No shards found for %s %s split", sensor_name, split)
                    continue
                self.datasets[sensor_name][split] = ShardedDataset(
                    sensor_name=sensor_name,
                    shard_paths=shard_paths,
                    patch_count=patch_count,
                    normalization_stats_path=config["stats_path"],
                    model_type=self.model_type,
                    split=split,
                    batch_size=self.batch_size,
                    shuffle_buffer=self.shuffle_buffer,
                    shardshuffle=self.shardshuffle,
                    seed=self.seed,
                    epoch_size=self.epoch_size,
                    wavelength_keys=config.get("wavelength_keys"),
                )
                logger.info(
                    "Created dataset for %s %s split (%s shards) with %s patches",
                    sensor_name,
                    split,
                    len(shard_paths),
                    patch_count,
                )

    def _loader(self, split: str, drop_partial: bool) -> StreamBatcher | None:
        sensors = [
            splits[split] for splits in self.datasets.values() if split in splits
        ]
        if not sensors:
            logger.warning("No %s datasets found!", split)
            return None

        def make_stream(epoch: int) -> list[Iterator[dict[str, Any]]]:
            # per-sensor streams; StreamBatcher batches each sensor
            # separately and mixes whole batches (reference RandomMix
            # semantics — heterogeneous channel counts stay per-batch)
            return [ds.iter_samples(epoch=epoch) for ds in sensors]

        total = sum(ds.patch_count for ds in sensors)
        epoch_size = self.epoch_size if split == "trn" else total
        return StreamBatcher(
            make_stream,
            batch_size=self.batch_size,
            drop_partial=drop_partial,
            epoch_size=epoch_size,
            mix_seed=self.seed,
            mix_probs=self.mix_probs,
            # with_epoch semantics: a configured train epoch_size is a
            # guarantee, cycling the stream when the dataset is smaller
            # (ref wds_datamodule.py:112-113)
            cycle=split == "trn" and self.epoch_size is not None,
        )

    def train_dataloader(self) -> StreamBatcher:
        return self._loader("trn", drop_partial=True)

    def val_dataloader(self) -> StreamBatcher:
        return self._loader("val", drop_partial=False)

    def test_dataloader(self) -> StreamBatcher:
        return self._loader("tst", drop_partial=False)
