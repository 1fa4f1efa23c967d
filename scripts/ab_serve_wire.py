"""Interleaved A/B: serving wire format f32 vs f16 vs int8.

Serving on the bench tunnel is transfer-bound (b1 ~47 ms vs 7.7 ms
compute, PROFILE.md r3); `InferenceSession(transfer_dtype=...)` narrows
the [N, 50, 2048] feature copy.  int8 ships v symmetric-quantized per box
(steps.quantize_v) for a 4x byte cut over f32, 2x over f16; the jitted
predict dequantizes on device.

Same harness rules as profile_cti.py: interleaved windows, the np.asarray
readback inside .logits() is the barrier.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_serve_wire.py
"""

import time

import numpy as np

import jax  # noqa: F401  (device init)

from vqatpu.config import ModelConfig
from vqatpu.models import build_model
from vqatpu.serve import InferenceSession
from vqatpu.train.steps import make_train_state


def main():
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    model = build_model(cfg)
    params = make_train_state(model, jax.random.PRNGKey(0)).params

    wires = {"f32": None, "f16": np.float16, "int8": "int8"}
    sessions = {n: InferenceSession(model, params, ["a"] * 3129,
                                    batch_buckets=(1, 32), max_boxes=50,
                                    transfer_dtype=w)
                for n, w in wires.items()}
    rng = np.random.RandomState(3)
    v = rng.randn(32, 50, 2048).astype(np.float32)
    q = rng.randint(0, 20000, (32, 12))
    a = rng.randint(0, 20000, (32, 3))

    ref = sessions["f32"].logits(v, None, q, a)
    for name, sess in sessions.items():  # compile + numerics sanity
        got = sess.logits(v, None, q, a)
        err = float(np.abs(got - ref).max())
        sess.logits(v[:1], None, q[:1], a[:1])  # compile b1 bucket
        print(f"{name}: max|logit delta| vs f32 = {err:.2e}", flush=True)

    for label, rows in (("b1", 1), ("b32", 32)):
        best = {n: float("inf") for n in sessions}
        for rep in range(5):
            for name, sess in sessions.items():
                t0 = time.perf_counter()
                iters = 20 if rows == 1 else 6
                for _ in range(iters):
                    sess.logits(v[:rows], None, q[:rows], a[:rows])
                ms = (time.perf_counter() - t0) / iters * 1e3
                best[name] = min(best[name], ms)
                print(f"rep{rep} {label} wire={name:5s} {ms:8.2f} ms",
                      flush=True)
        print(f"best {label} ms:",
              {k: round(v_, 2) for k, v_ in best.items()}, flush=True)


if __name__ == "__main__":
    main()
