"""Static-shape batch iteration.

Replaces ``torch.utils.data.DataLoader`` + ``trim_collate``
(``utils.py:120-169``).  trim_collate pads each batch's box dim to the batch
max — dynamic shapes that would force an XLA recompile per batch.  Here every
sample is already padded to ``max_boxes`` (see FeatureStore.get), so batches
stack to ONE static shape; the final partial batch is zero-padded to
``batch_size`` with a ``valid`` row mask so eval stays exact.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np


def stack_samples(samples) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples], 0) for k in keys}


class BatchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 1204, drop_last: bool = False,
                 pad_final: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_final = pad_final
        self._rng = np.random.RandomState(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_samples(self) -> int:
        return len(self.dataset)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        stop = (n // bs) * bs if self.drop_last else n
        for start in range(0, stop, bs):
            idx = order[start:start + bs]
            samples = [self.dataset.sample(int(i)) for i in idx]
            batch = stack_samples(samples)
            valid = np.ones((len(idx),), bool)
            if len(idx) < bs and self.pad_final:
                pad = bs - len(idx)
                batch = {
                    k: np.concatenate(
                        [v, np.zeros((pad,) + v.shape[1:], v.dtype)], 0)
                    for k, v in batch.items()
                }
                valid = np.concatenate([valid, np.zeros((pad,), bool)])
            batch["valid"] = valid
            yield batch
