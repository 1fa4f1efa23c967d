"""Interleaved A/B: bf16 knobs at LARGE batch (NEXT.md #5's measurable half).

r2 measured ``compute_dtype=bfloat16`` dead-even with f32 for CTI at B=256
(the step is layout/medium-op bound there, not GEMM-bound), and r3 measured
``optim_state_dtype=bfloat16`` worth ~-0.3 ms.  NEXT.md #5 predicts both
knobs should win MORE at larger batch, where GEMM and state-bandwidth terms
grow relative to the fixed per-op cost.  This script tests that prediction
directly: one process, shared input batch, interleaved windows across dtype
configs at the same B, so the tunnel drift (CLAUDE.md) cancels.

Usage: python scripts/ab_dtype_scale.py [B] [config ...]
  configs: f32 | bf16c (compute) | bf16o (optim state) | bf16co (both)
  default: B=1024, all four.

HBM note: each rig keeps its own params+Adamax state (~850 MB at reference
dims); the input batch is SHARED across rigs (one ~400 MB v slab at B=1024).
Free HBM is printed after warmup — check headroom before trusting the A/B.

Readback barriers throughout (block_until_ready on this tunnel acks
dispatch, not completion — CLAUDE.md).
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

CONFIGS = {
    "f32": dict(),
    "bf16c": dict(compute_dtype="bfloat16"),
    "bf16o": dict(optim_state_dtype="bfloat16"),
    "bf16co": dict(compute_dtype="bfloat16", optim_state_dtype="bfloat16"),
    # int8-resident v (wire contract; dequant fused into consumers — the
    # on-chip win of scripts/ab_wire_device.py) with and without bf16
    "int8": dict(wire="int8"),
    "bf16c_int8": dict(compute_dtype="bfloat16", wire="int8"),
    "bf16co_int8": dict(compute_dtype="bfloat16",
                        optim_state_dtype="bfloat16", wire="int8"),
}


def make_batch(B):
    V, Q, A = 50, 12, 3
    rng = np.random.RandomState(0)
    v = rng.randn(B, V, 2048).astype(np.float32)
    v[:, 44:] = 0.0
    return {
        "v": jnp.asarray(v),
        "q": jnp.asarray(rng.randint(0, 20000, (B, Q)).astype(np.int32)),
        "a": jnp.asarray(rng.randint(0, 20000, (B, A)).astype(np.int32)),
        "v_mask": jnp.asarray(np.arange(V)[None] < 44).repeat(B, 0),
        "target": jnp.asarray(rng.rand(B, 3129).astype(np.float32)),
    }


def main():
    enable_compilation_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".xla_cache"))
    args = sys.argv[1:]
    B = int(args[0]) if args and args[0].isdigit() else 1024
    names = [a for a in args if not a.isdigit()] or list(CONFIGS)
    for n in names:
        assert n in CONFIGS, (n, list(CONFIGS))

    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    model = build_model(cfg)
    # two shared device-resident batches: f32 wire and int8 wire (the step
    # auto-detects `v_scale` and fuses the dequant into v's consumers)
    from vqatpu.train.steps import wire_cast

    batch_host = jax.tree.map(np.asarray, make_batch(B))
    batches = {"float32": jax.tree.map(jnp.asarray, batch_host),
               "int8": jax.tree.map(jnp.asarray,
                                    wire_cast(batch_host, "int8"))}
    lr = jnp.float32(1e-3)
    key = jax.random.PRNGKey(1)

    rigs = {}
    for name in names:
        t0 = time.perf_counter()
        spec = dict(CONFIGS[name])
        batch = batches[spec.pop("wire", "float32")]
        tcfg = TrainConfig(update_freq=1, batch_size=B, **spec)
        state = make_train_state(model, jax.random.PRNGKey(0),
                                 optim_state_dtype=tcfg.optim_state_dtype)
        step = make_train_step(model, tcfg)
        for i in range(3):
            state, metrics = step(state, batch, lr, jax.random.fold_in(key, i))
        float(np.asarray(metrics["loss"]))
        print(f"{name}: warm in {time.perf_counter() - t0:.1f}s", flush=True)
        rigs[name] = [state, step, batch]

    try:
        stats = jax.devices()[0].memory_stats() or {}
        if stats.get("bytes_limit"):
            free = (stats["bytes_limit"] - stats.get("bytes_in_use", 0)) / 2**30
            print(f"free HBM after warmup: {free:.2f} GiB", flush=True)
    except Exception:
        pass

    iters = max(8, 8192 // B)
    best = {n: float("inf") for n in names}
    for w in range(5):
        for name in names:
            state, step, batch = rigs[name]
            t0 = time.perf_counter()
            for i in range(iters):
                state, metrics = step(state, batch, lr,
                                      jax.random.fold_in(key, 100 + w * 64 + i))
            float(np.asarray(metrics["loss"]))
            dt = (time.perf_counter() - t0) / iters
            rigs[name][0] = state
            best[name] = min(best[name], dt)
            print(f"w{w} {name}: {dt * 1e3:.2f} ms/step  "
                  f"{B / dt:,.0f} samples/s", flush=True)

    print(f"\nbest-of-windows (B={B}):")
    for name in names:
        print(f"  {name}: {best[name] * 1e3:.2f} ms/step  "
              f"{B / best[name]:,.0f} samples/s")


if __name__ == "__main__":
    main()
