"""Stretch-regime (V=2048) timing A/Bs: fused_v_tucker, remat, blockwise.

Round-1 measured the standard XLA path at 82 ms / 8.0 GB temp (B=64,
V=2048) and blockwise at 121 ms / 7.6 GB.  At V=2048 the v-side tucker
GEMMs dominate the step FLOPs (3 x [B*V, 2048] @ [2048, d]), so the fused
single-GEMM knob is re-measured here in its intended regime.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_stretch.py [variant ...]
    variants: base fused remat fused_remat blockwise
"""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.train.steps import make_train_state, make_train_step

B, V, Q, A = 64, 2048, 12, 3

VARIANTS = {
    "base": {},
    "fused": {"fused_v_tucker": True},
    "remat": {"remat_glimpse": True},
    "fused_remat": {"fused_v_tucker": True, "remat_glimpse": True},
    "blockwise": {"v_block_size": 512},
    "pallas": {"kernel_backend": "pallas"},
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    base = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                       model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    tcfg = TrainConfig(update_freq=1, batch_size=B)

    rng = np.random.RandomState(0)
    v = rng.randn(B, V, 2048).astype(np.float32)
    v[:, V - 64:] = 0.0
    batch = {
        "v": jnp.asarray(v),
        "q": jnp.asarray(rng.randint(0, 20000, (B, Q)).astype(np.int32)),
        "a": jnp.asarray(rng.randint(0, 20000, (B, A)).astype(np.int32)),
        "v_mask": jnp.asarray(np.arange(V)[None] < V - 64).repeat(B, 0),
        "target": jnp.asarray(rng.rand(B, 3129).astype(np.float32)),
    }
    key = jax.random.PRNGKey(1)

    for name in names:
        cfg = dataclasses.replace(base, **VARIANTS[name])
        model = build_model(cfg)
        state = make_train_state(model, jax.random.PRNGKey(0))
        step = make_train_step(model, tcfg)
        state, m = step(state, batch, jnp.float32(1e-3), key)
        float(np.asarray(m["loss"]))
        iters = 10
        best = float("inf")
        for w in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                state, m = step(state, batch, jnp.float32(1e-3),
                                jax.random.fold_in(key, i))
            float(np.asarray(m["loss"]))
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{name:14s} {best * 1e3:8.2f} ms/step "
              f"({B / best:,.0f} samples/s)", flush=True)
        del state, step, model


if __name__ == "__main__":
    main()
