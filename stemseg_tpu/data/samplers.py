"""Deterministic samplers for multi-host data parallelism + infinite
iteration-based batching with resume.

Behavioral reference: ``/root/reference/stemseg/data/distributed_data_sampler.py``
(epoch-seeded shuffle, pad-to-divisible, rank slice) and
``iteration_based_batch_sampler.py`` (re-iterate until ``num_iterations``,
``set_epoch`` per iteration, resume from ``start_iter``).

TPU-native notes: with a single-controller JAX setup the "rank" is the host
(process) index — each host loads only its shard of the global batch; the
epoch-seeded permutation uses numpy's PCG instead of torch's RNG (indices
differ from the reference but the determinism/resume contract is the same).
"""

from __future__ import annotations

import math
from typing import Iterator, List

import numpy as np


class ShardedSampler:
    """Epoch-seeded permutation, padded to a multiple of num_replicas, rank
    slice. ``set_epoch`` reseeds (called once per outer iteration by the
    iteration-based wrapper, as in the reference)."""

    def __init__(self, dataset_len: int, num_replicas: int = 1, rank: int = 0,
                 shuffle: bool = True):
        assert 0 <= rank < num_replicas
        self.dataset_len = dataset_len
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.epoch = 0
        self.num_samples = int(math.ceil(dataset_len / num_replicas))
        self.total_size = self.num_samples * self.num_replicas

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        if self.shuffle:
            rng = np.random.default_rng(self.epoch)
            indices = rng.permutation(self.dataset_len).tolist()
        else:
            indices = list(range(self.dataset_len))
        indices += indices[: (self.total_size - len(indices))]
        assert len(indices) == self.total_size
        offset = self.num_samples * self.rank
        return iter(indices[offset:offset + self.num_samples])

    def __len__(self):
        return self.num_samples


class BatchSampler:
    def __init__(self, sampler, batch_size: int, drop_last: bool = True):
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last

    def __iter__(self) -> Iterator[List[int]]:
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)


class IterationBasedBatchSampler:
    """Yields exactly ``num_iterations - start_iter`` batches, re-iterating
    the wrapped batch sampler and bumping its epoch each outer pass."""

    def __init__(self, batch_sampler: BatchSampler, num_iterations: int,
                 start_iter: int = 0):
        self.batch_sampler = batch_sampler
        self.num_iterations = num_iterations
        self.start_iter = start_iter

    def __iter__(self) -> Iterator[List[int]]:
        iteration = self.start_iter
        while iteration <= self.num_iterations:
            if hasattr(self.batch_sampler.sampler, "set_epoch"):
                self.batch_sampler.sampler.set_epoch(iteration)
            for batch in self.batch_sampler:
                iteration += 1
                if iteration > self.num_iterations:
                    break
                yield batch

    def __len__(self):
        return self.num_iterations
