"""Minimal batching loader for host-side datasets.

Replaces the torch DataLoader stack (trainfd.py:112-133) with a single-
process iterator: shuffling, drop_last, None-filtering collate
(fn/datacore.py:359-369), and a background thread prefetcher so host data
prep overlaps with device compute (the JAX analog of num_workers +
pin_memory). JAX dispatch is async, so one prefetch thread suffices to
keep the device fed for these small batches.
"""
from __future__ import annotations

import queue
import threading

import numpy as np


def collate(batch: list[dict]) -> dict | None:
    """Stack a list of sample dicts, dropping Nones (collate_remove_none)."""
    batch = [b for b in batch if b is not None]
    if not batch:
        return None
    return {k: np.stack([b[k] for b in batch]) for k in batch[0]}


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        b = self.batch_size
        return n // b if self.drop_last else (n + b - 1) // b

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        end = (len(idx) // self.batch_size) * self.batch_size \
            if self.drop_last else len(idx)
        for i in range(0, end, self.batch_size):
            yield idx[i:i + self.batch_size]

    def __iter__(self):
        if self.prefetch <= 0:
            for ib in self._index_batches():
                out = collate([self.dataset[int(i)] for i in ib])
                if out is not None:
                    yield out
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _END = object()

        def worker():
            try:
                for ib in self._index_batches():
                    q.put(collate([self.dataset[int(i)] for i in ib]))
            finally:
                q.put(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            if item is not None:
                yield item
