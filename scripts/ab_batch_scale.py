"""Interleaved A/B: CTI train-step throughput vs batch size (f32 wire).

The step is composition/latency-bound at B=256 (PROFILE.md roofline: many
small/medium ops at their own floors plus serialization) — larger batches
amortize the fixed per-op cost, so per-sample throughput should rise until
HBM bandwidth saturates.  BENCH_MATRIX's cti_1024 row (24.7k vs 21.0k
samples/s) was measured in a different session; this script interleaves
B=256 / 1024 / 2048 windows in ONE process so the tunnel drift (CLAUDE.md)
cancels.

Readback barriers throughout (block_until_ready on the tunnel acks dispatch,
not completion).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vqatpu.cli.common import enable_compilation_cache
from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.train.steps import make_train_state, make_train_step


def make(B):
    V, Q, A = 50, 12, 3
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    v = rng.randn(B, V, 2048).astype(np.float32)
    v[:, 44:] = 0.0
    batch = {
        "v": jnp.asarray(v),
        "q": jnp.asarray(rng.randint(0, 20000, (B, Q)).astype(np.int32)),
        "a": jnp.asarray(rng.randint(0, 20000, (B, A)).astype(np.int32)),
        "v_mask": jnp.asarray(np.arange(V)[None] < 44).repeat(B, 0),
        "target": jnp.asarray(rng.rand(B, 3129).astype(np.float32)),
    }
    state = make_train_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model, TrainConfig(update_freq=1, batch_size=B))
    return batch, state, step


def main():
    enable_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache"))
    sizes = [int(s) for s in (sys.argv[1:] or ["256", "1024", "2048"])]
    rigs = {}
    for B in sizes:
        t0 = time.perf_counter()
        batch, state, step = make(B)
        lr = jnp.float32(1e-3)
        key = jax.random.PRNGKey(1)
        for i in range(3):
            state, metrics = step(state, batch, lr, jax.random.fold_in(key, i))
        float(np.asarray(metrics["loss"]))
        print(f"B={B}: warm in {time.perf_counter()-t0:.1f}s", flush=True)
        rigs[B] = [batch, state, step, key]

    # free-HBM sanity print: all rigs stay resident at once (~850 MB
    # params+Adamax+accum each plus the B=2048 slab), so this interleaved
    # A/B runs under materially higher HBM pressure than bench.py's
    # single-rig numbers — check headroom before trusting the comparison.
    try:
        stats = jax.devices()[0].memory_stats() or {}
        if stats.get("bytes_limit"):
            free = (stats["bytes_limit"] - stats.get("bytes_in_use", 0)) / 2**30
            print(f"free HBM after warmup: {free:.2f} GiB", flush=True)
    except Exception:
        pass
    lr = jnp.float32(1e-3)  # hoisted: a per-iteration scalar would add a
    # host->device transfer inside every timed dispatch (bench.py:69)
    best = {B: float("inf") for B in sizes}
    for w in range(5):
        for B in sizes:
            batch, state, step, key = rigs[B]
            iters = max(8, 8192 // B)
            t0 = time.perf_counter()
            for i in range(iters):
                state, metrics = step(state, batch, lr,
                                      jax.random.fold_in(key, 100 + w * 64 + i))
            float(np.asarray(metrics["loss"]))
            dt = (time.perf_counter() - t0) / iters
            rigs[B][1] = state
            best[B] = min(best[B], dt)
            print(f"w{w} B={B}: {dt*1e3:.2f} ms/step  {B/dt:,.0f} samples/s",
                  flush=True)

    print("\nbest-of-windows:")
    for B in sizes:
        print(f"  B={B}: {best[B]*1e3:.2f} ms/step  {B/best[B]:,.0f} samples/s")


if __name__ == "__main__":
    main()
