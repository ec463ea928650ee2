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
        group_key: Optional[Callable] = None,
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
        # group_key(sample) -> hashable: when set, samples are regrouped
        # into same-key batches as they stream through the loader (size-
        # grouped eval batching: the bucketed collate pads every pair in a
        # batch to the batch MAX bucket, so one large cloud would otherwise
        # drag a whole batch of small pairs to the big bucket).  Batch
        # EMISSION ORDER changes (consumers must key results on sample idx,
        # which run_test does); the sample multiset does not.  Only for
        # per-process protocols (test): grouping makes per-process batch
        # COUNTS diverge, which would desynchronize collective loops.
        self.group_key = group_key
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

    def _sample_batches(self, idx, pool=None):
        """Yield lists of LOADED samples forming each batch.

        Ungrouped: fixed index slices in (shuffled) order.  Grouped
        (`group_key`): samples stream through a per-key pending buffer and a
        batch is emitted whenever some key accumulates `batch_size` samples;
        remainders flush at the end in sorted key order (deterministic).
        """
        load = lambda i: self.dataset[int(i)]  # noqa: E731

        if self.group_key is None:
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
            for b in batches:
                if pool is not None:
                    yield list(pool.map(load, b))
                else:
                    yield [load(i) for i in b]
            return

        if pool is not None:
            # Bounded submission window: ThreadPoolExecutor.map would submit
            # every load up front and buffer the whole dataset in memory.
            from collections import deque

            window = max(2 * self.num_workers, self.batch_size)
            futs: deque = deque()
            it = iter(idx)

            def _samples():
                for i in it:
                    futs.append(pool.submit(load, i))
                    if len(futs) >= window:
                        yield futs.popleft().result()
                while futs:
                    yield futs.popleft().result()

            samples = _samples()
        else:
            samples = (load(i) for i in idx)

        pending: dict = {}
        for s in samples:
            k = self.group_key(s)
            pending.setdefault(k, []).append(s)
            if len(pending[k]) == self.batch_size:
                yield pending.pop(k)
        for k in sorted(pending):
            yield pending[k]

    def __iter__(self):
        idx = self._indices()

        if self.num_workers == 0:
            for samples in self._sample_batches(idx):
                yield self.collate_fn(samples)
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
                    for samples in self._sample_batches(idx, pool):
                        if stop.is_set():
                            return
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
