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
        num_workers: int = 0,
        transform=None,
    ):
        """`transform(batch) -> batch` runs in the prefetch/worker threads
        (use it for tokenization so host text processing overlaps device
        steps). `num_workers > 1` builds batches in a thread pool with
        order-preserving handoff — numpy/mmap reads and fast tokenizers
        release the GIL, so workers overlap on real IO."""
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
        self.num_workers = num_workers
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
            yield self._make_batch(idx[s: s + self.batch_size])

    def _make_batch(self, chunk) -> object:
        batch = self.collate_fn([self.dataset[int(i)] for i in chunk])
        if self.transform is not None:
            batch = self.transform(batch)
        return batch

    def _iter_workers(self) -> Iterator:
        """Thread-pool batch construction, yielded in index order."""
        from concurrent.futures import ThreadPoolExecutor

        idx = self._indices()
        end = (len(idx) // self.batch_size) * self.batch_size if self.drop_last else len(idx)
        chunks = [idx[s: s + self.batch_size] for s in range(0, end, self.batch_size)]
        window = self.num_workers + max(self.prefetch, 1)
        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            futs = {seq: ex.submit(self._make_batch, chunks[seq])
                    for seq in range(min(window, len(chunks)))}
            next_submit = len(futs)
            for seq in range(len(chunks)):
                yield futs.pop(seq).result()
                if next_submit < len(chunks):
                    futs[next_submit] = ex.submit(self._make_batch, chunks[next_submit])
                    next_submit += 1

    def __iter__(self) -> Iterator:
        if self.num_workers > 1:
            yield from self._iter_workers()
            return
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


def device_prefetch(iterator, place_fn: Callable, depth: int = 2) -> Iterator:
    """Run `place_fn(batch)` (host encode + device_put) `depth` batches
    ahead of the consumer, in a background thread.

    JAX dispatch is thread-safe and device_put enqueues asynchronously, so
    the next batch's tokenization and H2D transfer overlap the train step's
    blocking host work (the float(loss) fetch). Exceptions surface on the
    consumer thread; generators must be fully consumed or discarded (the
    daemon thread exits with the queue).
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    sentinel = object()
    err: list = []

    def worker():
        try:
            for b in iterator:
                q.put(place_fn(b))
        except BaseException as e:
            err.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item
    if err:
        raise err[0]


class OneAhead:
    """One-deep software pipeline for dispatch/fetch loops.

    JAX dispatch is asynchronous: `submit(item)` (where item holds a
    just-dispatched, un-fetched device result) hands back the PREVIOUS
    item, whose blocking fetch then overlaps the new item's device
    execution. `drain()` returns the final in-flight item. Shared by the
    chunked eval loops (videoqa_ar answers, CLIP text/frame chunks)."""

    def __init__(self):
        self._pending = None

    def submit(self, item):
        prev, self._pending = self._pending, item
        return prev

    def drain(self):
        prev, self._pending = self._pending, None
        return prev
