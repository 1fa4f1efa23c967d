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
                 pad_final: bool = True, fields_only: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_final = pad_final
        # fields_only: skip the feature slabs (v/b/v_mask) and ship the
        # dataset sample index as ``ds_idx`` instead — the device-resident
        # feature-store mode (data/device_store.py), where v/b never cross
        # the host wire.  Shuffle order is IDENTICAL to the full loader
        # (same RNG, same seed), so trajectories match bit-for-bit.
        self.fields_only = fields_only
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
            if self.fields_only:
                samples = [self.dataset.sample_fields(int(i)) for i in idx]
                batch = stack_samples(samples)
                batch["ds_idx"] = idx.astype(np.int64)
            else:
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
                if self.fields_only:
                    # padded rows must gather the all-zero sentinel boxes,
                    # not image 0's features (wire parity: zero rows)
                    batch["ds_idx"][len(idx):] = -1
            batch["valid"] = valid
            yield batch


class PrefetchLoader:
    """Background-thread prefetch wrapper around any batch iterable.

    Overlaps host-side batch assembly (python sample stacking; streaming
    HDF5 reads in ``FeatureStore(in_memory=False)`` mode) with device
    compute, so an epoch costs ~max(assembly, step) instead of their sum.
    The TPU-side analogue of the reference's ``num_workers`` DataLoader knob
    (which it leaves at 0 — ``FFOE/main.py:140-147``).

    Order and values are exactly the inner loader's: the worker just runs
    the inner iterator one epoch at a time into a bounded queue (``depth``
    batches ahead), so the multi-host lockstep-ordering contract is
    untouched.  Every yielded batch is freshly allocated by the inner
    loader (``stack_samples``/``np.concatenate``), never rewritten — safe
    to alias into ``jax.device_put`` zero-copy.

    An abandoned epoch iterator leaves its daemon worker parked on the
    queue; it holds one epoch's iterator until process exit (the train/eval
    loops always drain full epochs).
    """

    def __init__(self, inner, depth: int = 2):
        assert depth >= 1
        self.inner = inner
        self.depth = depth

    def __len__(self) -> int:
        return len(self.inner)

    @property
    def num_samples(self) -> int:
        return self.inner.num_samples

    @property
    def dataset(self):
        return self.inner.dataset

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        end = object()
        failure = []

        def _worker():
            try:
                for b in self.inner:
                    q.put(b)
            except BaseException as e:  # propagate to the consumer
                failure.append(e)
            finally:
                q.put(end)

        threading.Thread(target=_worker, daemon=True,
                         name="vqatpu-prefetch").start()
        while True:
            b = q.get()
            if b is end:
                if failure:
                    raise failure[0]
                return
            yield b


def make_eval_loader(dataset, batch_size: int, use_native: bool = True,
                     quantize: bool = False):
    """Sequential-sweep loader for eval/inference: no shuffle, padded final
    batch with a ``valid`` row mask.

    Prefers the native C++ assembly loader (same ~5x host-side win as
    training, PROFILE.md: 15.7 vs 65-85 ms/batch at B=256) when the library
    builds, the dataset exposes a resident FeatureStore, and falls back to
    the prefetch-wrapped Python ``BatchLoader`` otherwise.  Either loader
    yields byte-identical batches (tests/test_native.py).

    ``quantize=True`` (pass when sweeping with ``transfer_dtype="int8"``)
    makes the native loader quantize on assembly (v int8 + v_scale); the
    Python fallback still yields f32 v and quantizes in ``wire_cast``."""
    if (use_native and hasattr(dataset, "store")
            and hasattr(dataset, "entries")
            and getattr(dataset.store, "in_memory", True)):
        try:
            from vqatpu.data import native
            if native.available():
                return native.NativeBatchLoader(dataset, batch_size,
                                                shuffle=False,
                                                drop_last=False,
                                                quantize=quantize)
        except Exception:
            pass
    return PrefetchLoader(BatchLoader(dataset, batch_size))
