"""Same-process, interleaved train-step timing across the model matrix
(CTI/BAN/BAN+counter at batch 256, CTI at 1024) — the PARITY.md table rows,
refreshed in one tunnel session so the numbers are mutually comparable.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_models.py [name ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.train.steps import make_train_state, make_train_step

CONFIGS = {
    "cti_256": dict(model="cti", B=256),
    "ban_256": dict(model="ban", B=256),
    "ban_counter_256": dict(model="ban", B=256, use_counter=True),
    "cti_1024": dict(model="cti", B=1024),
}


def make(name):
    spec = dict(CONFIGS[name])
    B = spec.pop("B")
    V, Q, A = 50, 12, 3
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      num_hid=1024, h_mm=512, rank=32, gamma=2, **spec)
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    v = rng.randn(B, V, 2048).astype(np.float32)
    v[:, 44:] = 0.0
    batch = {
        "v": jnp.asarray(v),
        "q": jnp.asarray(rng.randint(0, 20000, (B, Q)).astype(np.int32)),
        "v_mask": jnp.asarray(np.arange(V)[None] < 44).repeat(B, 0),
        "target": jnp.asarray(rng.rand(B, 3129).astype(np.float32)),
    }
    if spec["model"] == "cti":
        batch["a"] = jnp.asarray(rng.randint(0, 20000, (B, A)).astype(np.int32))
    if spec.get("use_counter"):
        batch["b"] = jnp.asarray(rng.rand(B, V, 6).astype(np.float32))
    state = make_train_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model, TrainConfig(update_freq=1, batch_size=B))
    return B, batch, state, step


def main():
    names = sys.argv[1:] or list(CONFIGS)
    key = jax.random.PRNGKey(1)
    runners = {}
    for name in names:
        B, batch, state, step = make(name)
        state, m = step(state, batch, jnp.float32(1e-3), key)
        float(np.asarray(m["loss"]))
        runners[name] = [B, batch, state, step]
        print(f"compiled {name}", flush=True)
    iters = 30
    best = {n: float("inf") for n in names}
    for rep in range(4):
        for name, r in runners.items():
            B, batch = r[0], r[1]
            t0 = time.perf_counter()
            for i in range(iters):
                r[2], m = r[3](r[2], batch, jnp.float32(1e-3),
                               jax.random.fold_in(key, i))
            float(np.asarray(m["loss"]))
            dt = (time.perf_counter() - t0) / iters
            best[name] = min(best[name], dt)
            print(f"rep{rep} {name:16s} {dt * 1e3:8.2f} ms "
                  f"({B / dt:,.0f} samples/s)", flush=True)
    print("--- best ---", flush=True)
    for name in names:
        B = runners[name][0]
        print(f"{name:16s} {best[name] * 1e3:8.2f} ms "
              f"({B / best[name]:,.0f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
