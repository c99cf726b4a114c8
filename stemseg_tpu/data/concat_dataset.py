"""Weighted multi-dataset mixing.

Behavioral reference: ``/root/reference/stemseg/data/concat_dataset.py:8-61``.
Each dataset gets ``round(weight * total)`` samples; larger datasets are
down-sampled via a seed-42 shuffled ``SparseDataset``; smaller ones are
repeated floor(n/len) times plus linspace-rounded remainder indices to hit
the exact quota.
"""

from __future__ import annotations

import math
import random
from typing import List, Optional, Sequence


class SparseDataset:
    def __init__(self, dataset, num_samples: int):
        assert num_samples < len(dataset), \
            "SparseDataset is only applicable when num_samples < len(dataset)"
        self.dataset = dataset
        self.num_samples = num_samples
        rng = random.Random(42)
        self.idxes = list(range(len(dataset)))
        rng.shuffle(self.idxes)

    def __len__(self):
        return self.num_samples

    def __getitem__(self, index):
        return self.dataset[self.idxes[index]]


class ConcatDataset:
    def __init__(self, datasets: Sequence, total_samples: int,
                 weights: Optional[List[float]] = None):
        if weights is None:
            weights = [1.0 / len(datasets)] * len(datasets)
        assert abs(sum(weights) - 1.0) < 1e-6, \
            f"Sum of weights is {sum(weights)}. Should be 1"

        self.id_mapping = []
        self.samples_per_dataset = []
        wrapped = []
        for i, (wt, ds) in enumerate(zip(weights, datasets)):
            assert 0.0 < wt <= 1.0
            quota = int(round(wt * total_samples))
            if quota < len(ds):
                ds = SparseDataset(ds, quota)
            wrapped.append(ds)

            repetitions = int(math.floor(quota / float(len(ds))))
            idxes = list(range(len(ds))) * repetitions
            n_rem = quota - len(idxes)
            if n_rem > 0:
                import numpy as np

                rem = np.round(np.linspace(0, len(ds) - 1, n_rem)).astype(int).tolist()
                idxes += rem

            self.id_mapping.extend((i, j) for j in idxes)
            self.samples_per_dataset.append(quota)

        self.datasets = wrapped
        self.weights = weights
        assert len(self.id_mapping) == total_samples, \
            f"{len(self.id_mapping)} != {total_samples}"

    def __len__(self):
        return len(self.id_mapping)

    def __getitem__(self, index):
        ds_idx, sample_idx = self.id_mapping[index]
        return self.datasets[ds_idx][sample_idx]
