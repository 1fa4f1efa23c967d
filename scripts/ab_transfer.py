"""Interleaved A/B: train-loop H2D wire dtype f32 vs f16 vs int8
(transfer_dtype).

The ab_prefetch.py diagnosis: end-to-end training through this
environment's axon tunnel is H2D-bound (~100 MB of f32 `v` per B=256
batch ≈ 1.4-2.3 s/batch vs ~85 ms assembly + ~12 ms compute).  Shipping
v/b as f16 halves the wire bytes; the jitted step upcasts on device
(steps._upcast_wire), so only input quantization changes.

Same harness rules as profile_cti.py: interleaved windows, value-readback
barrier at every window end.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_transfer.py
"""

import os
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.data import BatchLoader, VQAFeatureDataset
from vqatpu.data.synthetic import make_vqa_fixture
from vqatpu.models import build_model
from vqatpu.train.loop import _device_batch
from vqatpu.train.steps import make_train_state, make_train_step

B = 256
N_TRAIN = 2048  # 8 batches/epoch


def run_epoch(loader, step_fn, state, key, transfer_dtype):
    i = 0
    for batch in loader:
        batch.pop("valid", None)
        db = _device_batch(batch, transfer_dtype=transfer_dtype)
        state, m = step_fn(state, db, jnp.float32(1e-3),
                           jax.random.fold_in(key, i))
        i += 1
    float(np.asarray(m["loss"]))  # readback barrier over the whole chain
    return state


def main():
    root = tempfile.mkdtemp(prefix="ab_transfer_")
    d = make_vqa_fixture(os.path.join(root, "data_vqa"), n_train=N_TRAIN,
                         n_val=16, n_images=64, v_dim=2048)
    ds = VQAFeatureDataset("train", d, dataroot=os.path.join(root, "data_vqa"),
                           max_boxes=50)
    cfg = ModelConfig(ntoken=d.ntoken, v_dim=2048,
                      num_ans_candidates=ds.num_ans_candidates,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    tcfg = TrainConfig(update_freq=1, batch_size=B)
    model = build_model(cfg)
    state = make_train_state(model, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, tcfg)
    key = jax.random.PRNGKey(1)
    loader = BatchLoader(ds, B, shuffle=True, seed=7, drop_last=True)

    variants = ("float32", "float16", "int8")
    for td in variants:  # compile both wire dtypes
        state = run_epoch(loader, step_fn, state, key, td)
        print(f"warm {td} ok", flush=True)

    nb = len(loader)
    best = {n: float("inf") for n in variants}
    for rep in range(6):
        for td in variants:
            t0 = time.perf_counter()
            state = run_epoch(loader, step_fn, state, key, td)
            ms = (time.perf_counter() - t0) / nb * 1e3
            best[td] = min(best[td], ms)
            print(f"rep{rep} wire={td:8s} {ms:8.2f} ms/batch", flush=True)
    print("best ms/batch:", {k: round(v, 2) for k, v in best.items()})


if __name__ == "__main__":
    main()
