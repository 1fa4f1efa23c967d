"""Interleaved A/B: BAN train step f32 vs bf16 activations.

CTI measured ~even (PROFILE.md: layout/medium-op bound, not GEMM-bound),
but BAN's BCNet k=3 projections (2048->3072 over 50 boxes, x(1+glimpse)
nets) are ~6x CTI's tucker GEMM FLOPs, so BAN may actually be MXU-bound
where bf16 doubles throughput.  Same harness rules as profile_cti.py:
compile both steps once, alternate timing windows, value-readback barrier.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_ban_dtype.py
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.train.steps import make_train_state, make_train_step

B, V, Q = 256, 50, 12


def main():
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model="ban", num_hid=1024, gamma=2)
    tcfg = TrainConfig(update_freq=1, batch_size=B)
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "v": jnp.asarray(rng.randn(B, V, 2048).astype(np.float32)),
        "q": jnp.asarray(rng.randint(0, 20000, (B, Q)).astype(np.int32)),
        "v_mask": jnp.asarray(np.arange(V)[None] < 44).repeat(B, 0),
        "target": jnp.asarray(rng.rand(B, 3129).astype(np.float32)),
    }
    key = jax.random.PRNGKey(1)
    runners = {}
    for dt in ("float32", "bfloat16"):
        st = make_train_state(model, jax.random.PRNGKey(0))
        stp = make_train_step(model, dataclasses.replace(tcfg, compute_dtype=dt))
        st, m = stp(st, batch, jnp.float32(1e-3), key)
        float(np.asarray(m["loss"]))
        runners[dt] = [st, stp]

    best = {n: float("inf") for n in runners}
    for rep in range(5):
        for dt, r in runners.items():
            t0 = time.perf_counter()
            for i in range(30):
                r[0], m = r[1](r[0], batch, jnp.float32(1e-3),
                               jax.random.fold_in(key, i))
            float(np.asarray(m["loss"]))
            ms = (time.perf_counter() - t0) / 30
            best[dt] = min(best[dt], ms)
            print(f"rep{rep} ban {dt:10s} {ms * 1e3:8.3f} ms", flush=True)
    print("best:", {k: round(v * 1e3, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()
