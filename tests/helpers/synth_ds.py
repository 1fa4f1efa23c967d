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
