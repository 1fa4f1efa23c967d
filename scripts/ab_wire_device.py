"""Interleaved DEVICE-side A/B: the CTI train step on an f32 batch vs the
same batch through the f16 and int8 wires (v resident in HBM at reduced
width; upcast/dequant inside the jitted step).

3-way ladder at B=256/V=50 (same session, 4/4 reps monotone):
f32 12.7-12.9 / f16 12.0-12.1 / int8 11.2-11.3 ms — the on-chip win
tracks v's byte width (XLA fuses the upcast into consumers for every
wire dtype), so each halving of the wire buys both H2D and HBM.

Both batches are device_put BEFORE timing, so this isolates the on-chip
cost: does `_upcast_wire`'s dequantization cost HBM traffic, or does
storing v 4x smaller WIN on read bandwidth?

Measured (v5e-lite tunnel, B=256/V=50/2048-d, reps interleaved, readback
barriers draining the warmup queue before t0 AND after the timed loop —
an earlier version skipped the pre-t0 drain and read ~2x high): **int8
wins every rep, −1.3..−1.5 ms/step (11.2 vs 12.6-12.7 ms, −11%)** — XLA
fuses convert+scale into v's consumers, so the dequant is free while
every read of v moves 4x fewer HBM bytes.  Matches the independently
measured BENCH_MATRIX row (cti_256_int8 10.83 vs cti_256 12.30 ms).  The
int8 wire is therefore a DOUBLE win on transfer-bound hosts: −75% H2D
bytes AND a faster step.  Loss parity: 2254.9651 (f32) vs 2254.9641
(int8) — input-quantization-level only.

Stretch regime (AB_B=64 AB_V=2048, v = 1 GB f32): **−8.5..−9.0 ms/step
(47.8-48.0 vs 56.4-56.8 ms, −15.5%, 4/4 reps)** — the win scales with
v's share of the step's HBM traffic, exactly as the fusion story
predicts.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_wire_device.py
     (AB_B / AB_V env vars override the batch/box dims)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.train.steps import make_train_state, make_train_step, wire_cast

B = int(os.environ.get("AB_B", 256))
V = int(os.environ.get("AB_V", 50))
MODEL = os.environ.get("AB_MODEL", "cti")
CDTYPE = os.environ.get("AB_DTYPE", "float32")
QL, AL = 12, 3


def main():
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model=MODEL, num_hid=1024, h_mm=512, rank=32, gamma=2)
    m = build_model(cfg)
    step = make_train_step(m, TrainConfig(update_freq=1,
                                          compute_dtype=CDTYPE))
    rng = np.random.RandomState(0)
    batch_f = {
        "v": (rng.randn(B, V, 2048) * rng.rand(B, V, 1) * 3).astype(np.float32),
        "b": rng.rand(B, V, 6).astype(np.float32),
        "q": rng.randint(0, 20000, (B, QL)),
        "a": rng.randint(0, 20000, (B, AL)),
        "target": rng.rand(B, 3129).astype(np.float32),
    }
    dev = jax.devices()[0]

    def put(b):
        return {k: jax.device_put(jnp.asarray(x), dev) for k, x in b.items()}

    batches = {
        "f32": put(batch_f),
        "f16": put(wire_cast(dict(batch_f), "float16")),
        "int8": put(wire_cast(dict(batch_f), "int8")),
    }
    key = jax.random.PRNGKey(1)
    lr = jnp.float32(1e-3)

    def run(b, state, iters=20):
        mtr = None
        for _ in range(iters):
            state, mtr = step(state, b, lr, key, False)
        # drain the warmup queue BEFORE t0 — on this tunnel dispatch
        # returns long before execution, so without this readback the
        # timed window absorbs the warmup steps and reads ~2x high
        # (caught in review; CLAUDE.md's readback-barrier rule)
        float(np.asarray(mtr["loss"]))
        t0 = time.perf_counter()
        for _ in range(iters):
            state, mtr = step(state, b, lr, key, False)
        _ = float(np.asarray(mtr["loss"]))  # readback barrier (CLAUDE.md)
        return (time.perf_counter() - t0) / iters * 1e3, state

    # loss parity check (fresh states; step donates its state argument)
    losses = []
    for name, b in batches.items():
        _, mt = step(make_train_state(m, jax.random.PRNGKey(0)), b, lr, key,
                     False)
        losses.append(f"{name} {float(np.asarray(mt['loss']))}")
    print("loss:", "  ".join(losses))

    states = {n: make_train_state(m, jax.random.PRNGKey(0)) for n in batches}
    for n, b in batches.items():  # compile all variants
        _, states[n] = run(b, states[n], 5)
    for rep in range(4):
        line = [f"rep{rep}"]
        for n, b in batches.items():
            t, states[n] = run(b, states[n])
            line.append(f"{n} {t:6.2f} ms")
        print("  ".join(line))


if __name__ == "__main__":
    main()
