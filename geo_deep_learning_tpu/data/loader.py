"""Host-side batched loader with threaded prefetch.

Replaces torch ``DataLoader`` worker processes + pinned memory (reference
datamodules/*.py): map-style datasets are read by a thread pool (GeoTIFF
zlib inflate releases the GIL) and collated into contiguous numpy batches;
a small prefetch queue keeps the device fed while the jitted step runs.
Static batch shapes are preserved for XLA: the final partial batch is
either dropped (train) or padded with repeated samples + a ``pad`` count
(eval), mirroring ``.batched(partial=split != "trn")`` semantics of the
reference's WebDataset path (datasets/wds_dataset.py:418-423).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import numpy as np


def collate(samples: list[dict]) -> dict:
    """Stack array fields; keep string/scalar fields as lists."""
    out: dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 4,
        shuffle: bool = False,
        drop_last: bool = False,
        pad_partial: bool = False,
        num_workers: int = 8,
        prefetch: int = 2,
        seed: int = 0,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_partial = pad_partial
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self) -> list[list[int]]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        batches = []
        for i in range(0, n, self.batch_size):
            chunk = idx[i : i + self.batch_size].tolist()
            if len(chunk) < self.batch_size:
                if self.drop_last:
                    continue
                if self.pad_partial:
                    # pad with wrap-around samples; record true count
                    pad = self.batch_size - len(chunk)
                    chunk = chunk + idx[:pad].tolist()
                    batches.append((chunk, self.batch_size - pad))
                    continue
            batches.append((chunk, len(chunk)))
        return batches

    def __iter__(self) -> Iterator[dict]:
        batches = self._index_batches()
        self.epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for chunk, valid in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, chunk))
                    batch = collate(samples)
                    batch["valid_count"] = np.int32(valid)
                    q.put(batch)
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
