"""Deterministic in-memory VQA-shaped dataset for multi-process loop tests.

Every process constructs it from the same seed, so the identically-seeded
BatchLoaders on each host yield identical global batches — the multi-host
data contract (vqatpu/train/loop.py multiproc path).
"""

import numpy as np


class SynthVQADataset:
    def __init__(self, n, v_dim=16, boxes=6, q_len=12, a_len=3, num_ans=11,
                 ntoken=50, seed=5):
        rng = np.random.RandomState(seed)
        self.v = rng.randn(n, boxes, v_dim).astype(np.float32)
        self.v[:, boxes - 1:] = 0.0  # one padded box row
        self.q = rng.randint(0, ntoken + 1, (n, q_len)).astype(np.int32)
        self.a = rng.randint(0, ntoken + 1, (n, a_len)).astype(np.int32)
        self.target = rng.rand(n, num_ans).astype(np.float32)

    def __len__(self):
        return self.v.shape[0]

    def sample(self, i):
        return {"v": self.v[i], "q": self.q[i], "a": self.a[i],
                "target": self.target[i]}


class SynthV7WDataset:
    """V7W-shaped in-memory MC dataset: 4 answer candidates per question,
    exactly one ground truth (``label`` one-hot over candidates) — the
    sample-dict contract of ``vqatpu.data.mc_dataset.V7WDataset.sample``
    minus the feature-store plumbing.  ``qid`` is the sample index, so
    expand_mc_batch's tiled qids stay deterministic."""

    def __init__(self, n, v_dim=16, boxes=6, q_len=12, a_len=6, ntoken=50,
                 seed=5):
        rng = np.random.RandomState(seed)
        self.v = rng.randn(n, boxes, v_dim).astype(np.float32)
        self.v[:, boxes - 1:] = 0.0  # one padded box row
        self.q = rng.randint(0, ntoken + 1, (n, q_len)).astype(np.int32)
        self.ans_mc = rng.randint(0, ntoken + 1, (n, 4, a_len)).astype(
            np.int32)
        gt = rng.randint(0, 4, n)
        self.label = np.zeros((n, 4), np.float32)
        self.label[np.arange(n), gt] = 1.0

    def __len__(self):
        return self.v.shape[0]

    def sample(self, i):
        return {"v": self.v[i], "q": self.q[i], "label": self.label[i],
                "ans_mc": self.ans_mc[i], "qid": np.int64(i)}
