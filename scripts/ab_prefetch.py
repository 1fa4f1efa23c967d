"""Interleaved A/B: bare BatchLoader vs PrefetchLoader epoch wall time.

Measures the real host-side pipeline the Python-loader fallback uses
(streaming stores, MC expansion, no native lib): VQAFeatureDataset sample
assembly -> stack -> device_put -> jitted CTI train step, at reference
assembly dims (B=256, 50 boxes, v_dim 2048).  PrefetchLoader should turn
epoch cost from assembly+step into ~max(assembly, step) by running the
sample/stack work in a worker thread while the step executes on device.

Same harness rules as profile_cti.py: interleaved windows (tunnel drift
makes sequential one-shots lie), value-readback barrier at every window end.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_prefetch.py
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
from vqatpu.data import BatchLoader, Dictionary, PrefetchLoader, VQAFeatureDataset
from vqatpu.data.synthetic import make_vqa_fixture
from vqatpu.models import build_model
from vqatpu.train.loop import _device_batch
from vqatpu.train.steps import make_train_state, make_train_step

B = 256
N_TRAIN = 2048  # 8 batches/epoch


def run_epoch(loader, step_fn, state, key):
    i = 0
    for batch in loader:
        batch.pop("valid", None)
        db = _device_batch(batch)
        state, m = step_fn(state, db, jnp.float32(1e-3),
                           jax.random.fold_in(key, i))
        i += 1
    float(np.asarray(m["loss"]))  # readback barrier over the whole chain
    return state


def main():
    root = tempfile.mkdtemp(prefix="ab_prefetch_")
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

    loaders = {
        "bare": BatchLoader(ds, B, shuffle=True, seed=7, drop_last=True),
        "prefetch": PrefetchLoader(
            BatchLoader(ds, B, shuffle=True, seed=7, drop_last=True)),
    }
    # compile + warm both paths once
    for name, ld in loaders.items():
        state = run_epoch(ld, step_fn, state, key)
        print(f"warm {name} ok", flush=True)

    nb = len(loaders["bare"])
    best = {n: float("inf") for n in loaders}
    for rep in range(6):
        for name, ld in loaders.items():
            t0 = time.perf_counter()
            state = run_epoch(ld, step_fn, state, key)
            ms = (time.perf_counter() - t0) / nb * 1e3
            best[name] = min(best[name], ms)
            print(f"rep{rep} {name:9s} {ms:8.2f} ms/batch", flush=True)
    print("best ms/batch:", {k: round(v, 2) for k, v in best.items()})


if __name__ == "__main__":
    main()
