"""Threaded prefetching data loader (host side).

Replaces torch's multiprocess DataLoader (the reference's worker parallelism,
/root/reference/src/data_loaders/__init__.py:51-57) with a dependency-free
thread-pool pipeline: sample loading/augmentation runs in worker threads
(numpy releases the GIL for the heavy ops), collated batches are staged in a
bounded queue so host preprocessing overlaps device compute.

Multi-host: pass shard=(process_index, process_count) to partition the
sample index space per host.  shard_pad=True additionally wraps short
shards to the global maximum length so every process yields the SAME number
of batches — required whenever the consuming loop runs collective SPMD
programs (e.g. the mesh-sharded validation eval_step), where a process
running one extra step would desynchronize the collectives and hang the
job.  The few duplicated samples bias averaged metrics negligibly (same
trade-off as torch's DistributedSampler padding).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional, Sequence, Tuple

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        drop_last: bool = False,
        shard: Optional[Tuple[int, int]] = None,
        shard_pad: bool = False,
        pad_last_batch: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.drop_last = drop_last
        self.shard = shard
        self.shard_pad = shard_pad
        # Wrap-pad the FINAL batch to full batch_size (duplicate leading
        # samples) so every batch has identical shape: mesh-sharded steps
        # require the batch axis to divide the mesh.  Same duplicate-bias
        # trade-off as torch's DistributedSampler; use for val, never for
        # test protocols (duplicated pairs would corrupt benchmark scores).
        self.pad_last_batch = pad_last_batch
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(idx)
        if self.shard is not None:
            rank, world = self.shard
            full = idx
            idx = idx[rank::world]
            if self.shard_pad and n > 0:
                target = -(-n // world)   # global max shard length
                if len(idx) == 0:
                    idx = full[[rank % n]]
                while len(idx) < target:
                    idx = np.concatenate([idx, idx[: target - len(idx)]])
        return idx

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        idx = self._indices()
        batches = [
            idx[i: i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        elif self.pad_last_batch and batches and len(idx) > 0:
            last = batches[-1]
            if len(last) < self.batch_size:
                fill = np.resize(idx, self.batch_size - len(last))
                batches[-1] = np.concatenate([last, fill])

        if self.num_workers == 0:
            for b in batches:
                yield self.collate_fn([self.dataset[int(i)] for i in b])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def _put(item):
            """Bounded put that aborts when the consumer went away."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = list(
                            pool.map(lambda i: self.dataset[int(i)], b)
                        )
                        if not _put(self.collate_fn(samples)):
                            return
            except BaseException as e:  # surface worker errors to consumer
                _put(e)
            finally:
                _put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # Consumer may break mid-epoch (e.g. step budget reached):
            # release the producer so its thread exits instead of leaking.
            stop.set()
            t.join(timeout=5.0)
