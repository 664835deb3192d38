"""Minimal torch-free data loader with host sharding and background prefetch.

Replaces torch DataLoader + DistributedSampler (reference main.py:192-207):
  - deterministic per-epoch shuffling (seed + epoch)
  - multi-host sharding: each host reads its contiguous 1/Nth of the index
    stream (the analogue of DistributedSampler rank sharding)
  - a background thread prefetches collated numpy batches so host IO overlaps
    with TPU steps
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        collate_fn: Callable,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 42,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
        transform=None,
    ):
        """`transform(batch) -> batch` runs in the prefetch thread (use it
        for tokenization so host text processing overlaps device steps)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.transform = transform
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.num_shards > 1:
            # pad to a multiple so every shard sees the same batch count
            per = -(-n // self.num_shards)
            padded = np.concatenate([idx, idx[: per * self.num_shards - n]])
            idx = padded[self.shard_index::self.num_shards]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self) -> Iterator:
        idx = self._indices()
        end = (len(idx) // self.batch_size) * self.batch_size if self.drop_last else len(idx)
        for s in range(0, end, self.batch_size):
            chunk = idx[s: s + self.batch_size]
            batch = self.collate_fn([self.dataset[int(i)] for i in chunk])
            if self.transform is not None:
                batch = self.transform(batch)
            yield batch

    def __iter__(self) -> Iterator:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            except BaseException as e:  # surface loader errors on the main thread
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        if err:
            raise err[0]
