"""Interleaved A/B: chunk-pipelined vs serial InferenceSession.logits.

Multi-chunk requests (N > largest bucket) previously serialized
[transfer -> compute -> readback] per chunk; serve.py now keeps one chunk
in flight so chunk i's H2D copy (the dominant cost on the bench tunnel,
see PROFILE.md r3) overlaps chunk i-1's compute + readback.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_serve_pipeline.py
"""

import time

import numpy as np

import jax  # noqa: F401  (device init)

from vqatpu.config import ModelConfig
from vqatpu.models import build_model
from vqatpu.serve import InferenceSession
from vqatpu.train.steps import make_train_state

N, BUCKET = 256, 64


def serial_logits(sess, v, b, q, a):
    """The pre-pipeline behavior: read each chunk back before the next."""
    out = []
    largest = sess.batch_buckets[-1]
    for s in range(0, v.shape[0], largest):
        dev, rows = sess._dispatch_chunk(
            v[s:s + largest], None if b is None else b[s:s + largest],
            q[s:s + largest], None if a is None else a[s:s + largest])
        out.append(np.asarray(dev)[:rows])
    return np.concatenate(out, 0)


def main():
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    model = build_model(cfg)
    params = make_train_state(model, jax.random.PRNGKey(0)).params
    sess = InferenceSession(model, params, ["a"] * 3129,
                            batch_buckets=(1, BUCKET), max_boxes=50)
    rng = np.random.RandomState(3)
    v = rng.randn(N, 50, 2048).astype(np.float32)
    q = rng.randint(0, 20000, (N, 12))
    a = rng.randint(0, 20000, (N, 3))

    ref = serial_logits(sess, v, None, q, a)  # compiles the bucket
    np.testing.assert_allclose(sess.logits(v, None, q, a), ref, atol=1e-5)

    runners = {"serial": lambda: serial_logits(sess, v, None, q, a),
               "pipelined": lambda: sess.logits(v, None, q, a)}
    best = {n: float("inf") for n in runners}
    for rep in range(4):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            for _ in range(4):
                fn()
            dt = (time.perf_counter() - t0) / 4
            best[name] = min(best[name], dt)
            print(f"rep{rep} {name:9s} {dt * 1e3:8.2f} ms "
                  f"({N / dt:8.0f} rows/s)", flush=True)
    print("best:", {k: round(v * 1e3, 2) for k, v in best.items()})


if __name__ == "__main__":
    main()
