"""Interleaved epoch-wall A/B: device-resident feature store vs the host
wire (f32 / int8) through the REAL input pipeline on the tunnel.

Methodology per CLAUDE.md: interleaved same-process reps (the tunnel
drifts +-2 ms on minute scales), value-readback barrier per epoch (the
tunnel's block_until_ready acks dispatch, not completion).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_devstore.py
"""

import os
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vqatpu.config import ModelConfig, TrainConfig          # noqa: E402
from vqatpu.data import VQAFeatureDataset                   # noqa: E402
from vqatpu.data.batching import BatchLoader, PrefetchLoader  # noqa: E402
from vqatpu.data.device_store import DeviceFeatureStore     # noqa: E402
from vqatpu.data.synthetic import make_vqa_fixture          # noqa: E402
from vqatpu.models import build_model                       # noqa: E402
from vqatpu.train.loop import _device_batch, _make_loader   # noqa: E402
from vqatpu.train.steps import (make_train_state,           # noqa: E402
                                make_train_step)


def main():
    from vqatpu.cli.common import enable_compilation_cache

    enable_compilation_cache(os.environ.get(
        "VQATPU_COMPILATION_CACHE", "~/.cache/vqatpu/xla"))
    root = tempfile.mkdtemp(prefix="ab_devstore_")
    B = 256
    d = make_vqa_fixture(os.path.join(root, "data_vqa"), n_train=2048,
                         n_val=16, n_images=64, v_dim=2048)
    ds = VQAFeatureDataset("train", d,
                           dataroot=os.path.join(root, "data_vqa"),
                           max_boxes=50)
    cfg = ModelConfig(ntoken=d.ntoken, v_dim=2048,
                      num_ans_candidates=ds.num_ans_candidates,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    model = build_model(cfg)
    key = jax.random.PRNGKey(1)

    variants = {}
    for td in ("float32", "int8"):
        tcfg = TrainConfig(update_freq=1, batch_size=B, transfer_dtype=td)
        variants[td] = [_make_loader(ds, tcfg, use_native=True),
                        make_train_step(model, tcfg),
                        make_train_state(model, jax.random.PRNGKey(0)),
                        tcfg, None]
    dtcfg = TrainConfig(update_freq=1, batch_size=B, transfer_dtype="int8",
                        device_features=True)
    dev = DeviceFeatureStore.build(ds, transfer_dtype="int8")
    print(f"device store: {dev.describe()}", flush=True)
    variants["devstore"] = [
        PrefetchLoader(BatchLoader(ds, B, shuffle=True, seed=dtcfg.seed,
                                   drop_last=True, fields_only=True)),
        make_train_step(model, dtcfg),
        make_train_state(model, jax.random.PRNGKey(0)), dtcfg, dev]
    # + sparse targets (the train() default): t_label/t_score instead of
    # the dense [B, 3129] f32 slab, densified on device
    from vqatpu.data.batching import max_target_labels

    variants["dev+sparse"] = [
        PrefetchLoader(BatchLoader(ds, B, shuffle=True, seed=dtcfg.seed,
                                   drop_last=True, fields_only=True,
                                   sparse_target_k=max_target_labels(ds))),
        make_train_step(model, dtcfg),
        make_train_state(model, jax.random.PRNGKey(0)), dtcfg, dev]

    def run_epoch(var):
        loader, step, state, tcfg, dev_store = var
        nb = i = 0
        m = None
        for batch in loader:
            batch.pop("valid", None)
            ds_idx = batch.pop("ds_idx", None)
            db = _device_batch(batch, transfer_dtype=tcfg.transfer_dtype)
            if dev_store is not None:
                db.update(dev_store.gather(ds_idx))
            state, m = step(state, db, jnp.float32(1e-3),
                            jax.random.fold_in(key, i))
            i += 1
            nb += 1
        float(np.asarray(m["loss"]))  # readback barrier over the whole chain
        var[2] = state
        return nb

    for name, var in variants.items():
        nb = run_epoch(var)
        print(f"warm {name} ok ({nb} batches)", flush=True)
    best = {n: float("inf") for n in variants}
    for rep in range(6):
        for name, var in variants.items():
            t0 = time.perf_counter()
            nb = run_epoch(var)
            ms = (time.perf_counter() - t0) / nb * 1e3
            best[name] = min(best[name], ms)
            print(f"rep{rep} {name:10s} {ms:8.2f} ms/batch", flush=True)
    print("--- best ---", flush=True)
    for name, ms in best.items():
        print(f"{name:9s} {ms:8.2f} ms/batch ({B / ms * 1e3:,.0f} samples/s)",
              flush=True)


if __name__ == "__main__":
    main()
