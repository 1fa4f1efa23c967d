"""Interleaved A/B: 32 concurrent single-question HTTP posts against the
plain server vs the --micro_batch server (reference-dim CTI).

Without coalescing, ThreadingHTTPServer dispatches 32 separate bucket-1
predicts that serialize on the device and each pay full dispatch + H2D
overhead; the MicroBatcher packs the wave into one bucket-32 predict.

Requests ride the npz wire (Content-Type: application/x-npz) with float16
features: the JSON form of a 50x2048 feature tensor is ~400 KB and costs
tens of host-CPU ms per request to parse, which on this 1-core host
serializes the whole wave on JSON parsing and hides the device-side
difference entirely (measured: 1825 vs 1746 ms, parse-bound).  npz keeps
the wave device-bound, which is the regime micro-batching exists for.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_serve_microbatch.py
"""

import io
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from vqatpu.cli.serve import serve_in_thread
from vqatpu.config import ModelConfig
from vqatpu.data.dictionary import Dictionary
from vqatpu.models import build_model
from vqatpu.serve import InferenceSession, MicroBatcher
from vqatpu.train.steps import make_train_state

N, BOXES, VDIM = 32, 50, 2048


def npz_body(feats_i, qtok_i, atok_i):
    buf = io.BytesIO()
    np.savez(buf, features=feats_i.astype(np.float16),
             question_tokens=qtok_i, answer_tokens=atok_i)
    return buf.getvalue()


def fire_wave(port, bodies, path="/answer"):
    got = [None] * N
    barrier = threading.Barrier(N + 1)

    def post(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=bodies[i],
            headers={"Content-Type": "application/x-npz"})
        barrier.wait()
        with urllib.request.urlopen(req, timeout=300) as r:
            import json
            got[i] = json.loads(r.read())["answers"][0]

    threads = [threading.Thread(target=post, args=(i,)) for i in range(N)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    return (time.perf_counter() - t0) * 1e3, got


def fire_direct(target, feats, qtok, atok):
    """32 threads call target.logits directly (no HTTP): isolates the
    device-contention regime — requests that truly arrive together."""
    got = [None] * N
    barrier = threading.Barrier(N + 1)

    def call(i):
        barrier.wait()
        got[i] = target.logits(feats[i:i + 1], None, qtok[i:i + 1],
                               atok[i:i + 1])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(N)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    return (time.perf_counter() - t0) * 1e3


def main():
    cfg = ModelConfig(ntoken=20000, v_dim=VDIM, num_ans_candidates=3129,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    model = build_model(cfg)
    params = make_train_state(model, jax.random.PRNGKey(0)).params
    label2ans = [f"a{i}" for i in range(3129)]
    wire = {"float32": None, "float16": np.float16, "int8": "int8"}[
        os.environ.get("AB_WIRE", "float32")]
    print(f"wire dtype: {os.environ.get('AB_WIRE', 'float32')}")
    sess = InferenceSession(model, params, label2ans, batch_buckets=(1, 32),
                            max_boxes=BOXES, transfer_dtype=wire)
    # wait sized to arrival staggering on the 1-core bench host; a real
    # serving host with spare cores takes the 3 ms CLI default
    mb = MicroBatcher(sess, max_batch=32, max_wait_ms=25.0)
    d = Dictionary()
    d.tokenize("warm words", add_word=True)
    srv_plain = serve_in_thread(sess, d, "cti", 8441)
    srv_mb = serve_in_thread(mb, d, "cti", 8442)

    rng = np.random.RandomState(0)
    feats = rng.randn(N, BOXES, VDIM).astype(np.float32)
    qtok = rng.randint(0, 20000, (N, 12))
    atok = rng.randint(0, 20000, (N, 3))
    bodies = [npz_body(feats[i:i + 1], qtok[i:i + 1], atok[i:i + 1])
              for i in range(N)]
    # warm both compile caches (bucket 1 and bucket 32)
    sess.answer(feats[:1], None, qtok[:1], atok[:1])
    sess.answer(feats, None, qtok, atok)

    # correctness note: bucket-1 and bucket-32 are DIFFERENT compiled
    # programs whose reduction orders differ at the ~1e-4 logit level;
    # with RANDOM-INIT params the 3129 logits are near-ties (top-2 gaps
    # ~1e-3), so a fraction of argmaxes legitimately flips across
    # programs (f16 request features add another such quantization).
    # Numeric correctness is pinned by tests/test_serve.py (allclose on
    # logits); agreement here is reported, not asserted — trained models
    # separate answers by orders of magnitude more.
    want = sess.answer(feats, None, qtok, atok)
    for rep in range(4):
        tp, ans_p = fire_wave(8441, bodies)
        tm, ans_m = fire_wave(8442, bodies)
        agree_p = sum(x == y for x, y in zip(ans_p, want))
        agree_m = sum(x == y for x, y in zip(ans_m, want))
        print(f"rep{rep}  plain {tp:7.1f} ms   micro-batched {tm:7.1f} ms "
              f"(b32-ref agreement {agree_p}/{agree_m} of {N}; "
              f"batches so far: {mb.batches_run})")
    for rep in range(4):
        td_p = fire_direct(sess, feats, qtok, atok)
        td_m = fire_direct(mb, feats, qtok, atok)
        print(f"direct rep{rep}  plain {td_p:7.1f} ms   "
              f"micro-batched {td_m:7.1f} ms")
    srv_plain.shutdown()
    srv_mb.shutdown()
    mb.close()


if __name__ == "__main__":
    main()
