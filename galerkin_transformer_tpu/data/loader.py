"""Minimal batching iterator over dict-style numpy datasets.

Replaces torch's DataLoader for this framework: datasets are plain objects
with __len__ and __getitem__ returning a dict of numpy arrays
(the reference's batch-dict protocol, libs/ft.py:366-371).  Batches are
stacked numpy arrays, ready to feed a jitted step (device transfer happens
inside jit via donate/commit).

Static shapes: `drop_last=True` keeps every batch the same shape so each
step reuses one compiled executable.
"""
from __future__ import annotations

from typing import Dict, Iterator

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 1127802):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start: start + self.batch_size]
            items = [self.dataset[int(i)] for i in idx]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
