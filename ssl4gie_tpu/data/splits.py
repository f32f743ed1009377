"""Deterministic dataset splits — parity-critical.

Reimplements the reference's chained sklearn `train_test_split(random_state=42)`
80/10/10 split (`Binary_segmentation/Data/dataloaders.py:42-57`, identical in all
tasks) in pure numpy, bit-for-bit: sklearn's ShuffleSplit draws
`RandomState(seed).permutation(n)`, takes `perm[:n_test]` as test and
`perm[n_test:n_test+n_train]` as train. Verified against sklearn in
tests/test_splits.py.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _train_test_split(indices: np.ndarray, test_size: int,
                      random_state: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    n = len(indices)
    n_test = int(test_size)
    n_train = n - n_test
    perm = np.random.RandomState(random_state).permutation(n)
    test_idx = perm[:n_test]
    train_idx = perm[n_test:n_test + n_train]
    return indices[train_idx], indices[test_idx]


def split_ids(len_ids: int, seed: int = 42) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (train_indices, test_indices, val_indices), exactly like the
    reference's split_ids: both chained splits use test_size=round(10% of total)."""
    test_size = int(round((10 / 100) * len_ids))
    all_ids = np.linspace(0, len_ids - 1, len_ids).astype(int)
    train_indices, test_indices = _train_test_split(all_ids, test_size, seed)
    train_indices, val_indices = _train_test_split(train_indices, test_size, seed)
    return train_indices, test_indices, val_indices
