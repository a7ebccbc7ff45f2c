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
    """Multi-host aware: with ``num_shards > 1`` every host runs the SAME
    seeded shuffle and takes its disjoint strided slice of the sample
    space (shard `shard_index` of `num_shards`), so a TPU-pod data-parallel
    run feeds each process a distinct local batch with zero coordination
    traffic.  Use `DataLoader.for_process(...)` to shard by
    ``jax.process_index()`` automatically."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 1127802,
                 num_shards: int = 1, shard_index: int = 0):
        assert 0 <= shard_index < num_shards
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self._epoch = 0

    @classmethod
    def for_process(cls, dataset, batch_size: int = 1, shuffle: bool = False,
                    drop_last: bool = True, seed: int = 1127802):
        """Shard the sample space across JAX processes (multi-host input
        pipeline — parallel/mesh.py::init_distributed)."""
        import jax

        return cls(dataset, batch_size, shuffle, drop_last, seed,
                   num_shards=jax.process_count(),
                   shard_index=jax.process_index())

    def _shard_len(self) -> int:
        n = len(self.dataset)
        return (n - self.shard_index + self.num_shards - 1) // self.num_shards

    def __len__(self) -> int:
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # identical stream on every host for a given epoch -> shards
            # stay disjoint and exhaustive across processes
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
            self._epoch += 1
        order = order[self.shard_index:: self.num_shards]
        m = len(order)
        stop = (m // self.batch_size) * self.batch_size if self.drop_last else m
        for start in range(0, stop, self.batch_size):
            idx = order[start: start + self.batch_size]
            items = [self.dataset[int(i)] for i in idx]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
