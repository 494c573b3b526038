"""Prefetching data loader producing numpy NHWC batches.

Replaces torch DataLoader + accelerate's DistributedSampler: each host
iterates its own shard of the record list (jax.process_index-based split for
multi-host); device sharding happens later via parallel.shard_batch.
``num_workers`` collate threads run batches concurrently (PIL decode and
numpy release the GIL) with order preserved — the reference leaves
preprocessing in the training process (dataloader_num_workers: 0 in every
shipped config) and eats the stall.
"""
from __future__ import annotations

from typing import Callable, Iterator, Optional, Sequence

import numpy as np


class DataLoader:
    def __init__(
        self,
        records: Sequence,
        batch_size: int,
        collate: Callable[[list], dict],
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        num_shards: int = 1,
        shard_index: int = 0,
        num_workers: int = 1,
    ):
        self.records = records
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.num_workers = max(1, int(num_workers))
        self._epoch = 0

    def __len__(self):
        n = len(self.records) // self.num_shards
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.records))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx[self.shard_index :: self.num_shards]

    def __iter__(self) -> Iterator[dict]:
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        idx = self._epoch_indices()
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        sels = (
            idx[b * self.batch_size : (b + 1) * self.batch_size] for b in range(nb)
        )
        inflight = self.num_workers + self.prefetch
        ex = ThreadPoolExecutor(self.num_workers)
        futures: "deque" = deque()

        def submit(sel):
            futures.append(
                ex.submit(self.collate, [self.records[int(i)] for i in sel])
            )

        try:
            it = iter(sels)
            for _ in range(inflight):
                sel = next(it, None)
                if sel is None:
                    break
                submit(sel)
            while futures:
                yield futures.popleft().result()  # re-raises collate errors
                sel = next(it, None)
                if sel is not None:
                    submit(sel)
        finally:
            ex.shutdown(wait=False, cancel_futures=True)
        self._epoch += 1

    def infinite(self) -> Iterator[dict]:
        if len(self) == 0:
            raise ValueError(
                "DataLoader has no complete batches: "
                f"{len(self.records)} records / {self.num_shards} shards "
                f"< batch_size {self.batch_size} (is the dataset over-filtered?)"
            )
        while True:
            yield from self
