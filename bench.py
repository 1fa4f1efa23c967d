"""Benchmark: CTI fwd+bwd training throughput, batch 256, one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes:
- The barrier is a VALUE READBACK of the final step's loss (which depends on
  every prior step through the param chain).  On this environment's axon
  tunnel, ``jax.block_until_ready`` returns on dispatch-ack rather than
  completion, so ready-based timings measure dispatch rate (~10x too fast);
  reading a value back is the only honest barrier.
- Best of 3 windows (shared-tunnel variance).

Baseline derivation (BASELINE.md): the reference publishes no CTI throughput;
its only timing datapoint is BAN at 157.84 s/epoch on a V100-era GPU
(``bc.py:49-51``) over the VQA-2.0 train split (443,757 questions)
=> ~2,811 samples/s.  BASELINE.json's target is >= 5x that per chip for CTI
fwd+bwd, so vs_baseline = (our samples/s) / 2811.  >= 5.0 meets the target.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.train.steps import make_train_state, make_train_step

V100_BAN_SAMPLES_PER_SEC = 443_757 / 157.84  # ~2811


def main():
    # Persistent XLA compilation cache (repo-local, gitignored): the driver
    # launches bench.py as a fresh process each round, and the CTI train step
    # at reference dims costs ~293 s to compile cold on the tunnel vs ~9 s
    # from cache (cli/common.py).  Warmup is untimed, so this only removes
    # wall-clock risk, never affects the measured windows.
    import os

    from vqatpu.cli.common import enable_compilation_cache

    enable_compilation_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"))

    B, V, Q, A = 256, 50, 12, 3
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    tcfg = TrainConfig(update_freq=1, batch_size=B)
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
    step = make_train_step(model, tcfg)
    lr = jnp.float32(1e-3)
    key = jax.random.PRNGKey(1)

    # warmup / compile, with a true (value-readback) barrier
    for i in range(3):
        state, metrics = step(state, batch, lr, jax.random.fold_in(key, i))
    float(np.asarray(metrics["loss"]))

    # Best of 8 windows: the shared tunnel drifts +-15% on minute scales
    # (CLAUDE.md), so more windows = a fairer shot at an uncontended slot.
    iters = 60
    dts = []
    for w in range(8):
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(state, batch, lr,
                                  jax.random.fold_in(key, 100 + w * iters + i))
        # readback forces the whole dependent chain to finish
        float(np.asarray(metrics["loss"]))
        dts.append(time.perf_counter() - t0)

    # `value` stays best-window samples/s (the driver contract); `windows`
    # carries the [best, median, worst] window throughputs so cross-round
    # flat-vs-regression calls are decidable from the artifact: two rounds
    # whose [best, worst] intervals overlap are tunnel weather, not a
    # regression (CLAUDE.md: the tunnel drifts +-2 ms on minute scales).
    thr = sorted(B * iters / dt for dt in dts)
    samples_per_sec = thr[-1]
    print(json.dumps({
        "metric": "cti_train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / V100_BAN_SAMPLES_PER_SEC, 3),
        "windows": [round(samples_per_sec, 2),
                    round(float(np.median(thr)), 2),
                    round(thr[0], 2)],
    }))


if __name__ == "__main__":
    main()
