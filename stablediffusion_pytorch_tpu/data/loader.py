"""Batching loader with background prefetch and per-host sharding.

The TPU-native replacement for the reference's DataLoader + DistributedSampler
stack (train_ddpm_cond_celebhq_multi_gpu.py:172-233): each host iterates only
its shard of the index space (jax.process_index() / process_count()), batches
are collated to numpy, and a background thread keeps a small prefetch queue
so host IO overlaps device compute. ``set_epoch``-style reshuffling is the
``seed + epoch`` argument of ``__iter__`` (reference: DistributedSampler
set_epoch, :286-288).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import jax
import numpy as np


def _collate(items: List[Any]):
    """Stack samples; dict conditions stacked per key; int classes -> array."""
    first = items[0]
    if isinstance(first, tuple):
        ims = np.stack([it[0] for it in items])
        cond: Dict[str, Any] = {}
        for key in first[1]:
            vals = [it[1][key] for it in items]
            if isinstance(vals[0], str):
                cond[key] = list(vals)
            else:
                cond[key] = np.stack([np.asarray(v) for v in vals])
        return ims, cond
    return np.stack(items)


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 prefetch: int = 2, num_workers: int = 4,
                 num_shards: Optional[int] = None,
                 shard_index: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.num_workers = max(1, num_workers)
        self.num_shards = (jax.process_count() if num_shards is None
                           else num_shards)
        self.shard_index = (jax.process_index() if shard_index is None
                            else shard_index)

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self, epoch: int) -> List[np.ndarray]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(idx)
        idx = idx[self.shard_index::self.num_shards]
        # equalize shard lengths (len(dataset) not divisible by num_shards
        # leaves early shards one element long): every host MUST yield the
        # same number of batches or multi-host collectives deadlock —
        # torch DistributedSampler solves this by padding, we truncate
        idx = idx[: n // self.num_shards]
        batches = []
        for s in range(0, len(idx), self.batch_size):
            b = idx[s:s + self.batch_size]
            if self.drop_last and len(b) < self.batch_size:
                break
            batches.append(b)
        return batches

    def __iter__(self) -> Iterator:
        return self.epoch(0)

    def epoch(self, epoch: int) -> Iterator:
        """Iterate one epoch's batches: a thread pool decodes samples in
        parallel (PIL decode is the host bottleneck at 256^2 — the
        reference's dataloader-worker autotuning concern,
        train_ddpm_cond_celebhq_multi_gpu.py:57-84) while a coordinator
        keeps a bounded prefetch queue in order."""
        from concurrent.futures import ThreadPoolExecutor

        batches = self._index_batches(epoch)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def load_batch(b):
            return _collate([self.dataset[int(i)] for i in b])

        def coordinator():
            # sliding window of in-flight futures (Executor.map would submit
            # the WHOLE epoch up front and buffer every finished batch)
            from collections import deque

            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                window: deque = deque()
                it = iter(batches)
                for _ in range(self.num_workers + self.prefetch):
                    b = next(it, None)
                    if b is None:
                        break
                    window.append(pool.submit(load_batch, b))
                while window:
                    q.put(window.popleft().result())
                    b = next(it, None)
                    if b is not None:
                        window.append(pool.submit(load_batch, b))
            q.put(sentinel)

        t = threading.Thread(target=coordinator, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
