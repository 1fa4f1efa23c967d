"""Same-process, interleaved timing across the model matrix — train steps
(CTI/BAN/BAN+counter/SAN at batch 256, CTI at 1024, MC TanModel at its
reference batch 64 x4-expanded), eval-mode inference, and serve-bucket
latency.  One tunnel session so rows are mutually comparable; writes the
committed ``BENCH_MATRIX.json`` regression artifact (VERDICT r2 item 5).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_models.py [name ...]
       (names filter the train/infer matrix; serve rows always run)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.train.steps import (make_eval_step, make_train_state,
                                make_train_step)

CONFIGS = {
    "cti_256": dict(model="cti", B=256),
    "ban_256": dict(model="ban", B=256),
    "ban_counter_256": dict(model="ban", B=256, use_counter=True),
    "san_256": dict(model="san", B=256),
    # BAN is GEMM-bound (k=3 2048->3072 projections, ~6x CTI's tucker
    # FLOPs): bf16 activations win ~27% here where CTI measures even
    # (scripts/ab_ban_dtype.py, PROFILE.md r3)
    "ban_256_bf16": dict(model="ban", B=256, compute_dtype="bfloat16"),
    # int8 wire: v resident as int8+scale, dequant fused into consumers —
    # wins ON-CHIP as well as on the wire (scripts/ab_wire_device.py)
    "cti_256_int8": dict(model="cti", B=256, wire="int8"),
    "cti_1024": dict(model="cti", B=1024),
    # bf16 compute turns from a wash (B=256, where the step is
    # layout/medium-op bound) into a −13% win at B=1024, where the tucker
    # GEMMs dominate and the MXU's bf16 rate shows (scripts/ab_dtype_scale.py)
    "cti_1024_bf16": dict(model="cti", B=1024, compute_dtype="bfloat16"),
    # MC TanModel at the reference batch 64, x4 candidate expansion
    # (MC/train.py:74-83) => 256 device rows
    "mc_tan_64": dict(model="cti", B=256, task="mc"),
}
INFER = {
    # name -> (train config to borrow shapes from, eval compute_dtype)
    "cti_256_infer": ("cti_256", "float32"),
    "ban_256_infer": ("ban_256", "float32"),
    # bf16 forward (the serving/eval knob wired through
    # make_eval_step/InferenceSession) — BAN is the GEMM-bound family where
    # it should win; CTI is the control
    "ban_256_infer_bf16": ("ban_256", "bfloat16"),
    "cti_256_infer_bf16": ("cti_256", "bfloat16"),
}
MATRIX_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_MATRIX.json")


def make(name):
    spec = dict(CONFIGS[name])
    B = spec.pop("B")
    compute_dtype = spec.pop("compute_dtype", "float32")
    wire = spec.pop("wire", "float32")
    V, Q = 50, 12
    A = 6 if spec.get("task") == "mc" else 3
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      num_hid=1024, h_mm=512, rank=32, gamma=2, **spec)
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    v = rng.randn(B, V, 2048).astype(np.float32)
    v[:, 44:] = 0.0
    batch = {
        "v": jnp.asarray(v),
        "q": jnp.asarray(rng.randint(0, 20000, (B, Q)).astype(np.int32)),
        "v_mask": jnp.asarray(np.arange(V)[None] < 44).repeat(B, 0),
        "target": jnp.asarray(rng.rand(B, cfg.num_classes).astype(np.float32)),
    }
    if spec["model"] == "cti":
        batch["a"] = jnp.asarray(rng.randint(0, 20000, (B, A)).astype(np.int32))
    if spec.get("use_counter"):
        batch["b"] = jnp.asarray(rng.rand(B, V, 6).astype(np.float32))
    if wire != "float32":
        from vqatpu.train.steps import wire_cast

        batch = {k: jnp.asarray(x) for k, x in
                 wire_cast({k: np.asarray(x) for k, x in batch.items()},
                           wire).items()}
    state = make_train_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model, TrainConfig(update_freq=1, batch_size=B,
                                              compute_dtype=compute_dtype),
                           mc_scoring=(spec.get("task") == "mc"))
    return B, batch, state, step, model


def _serve_rows(results):
    """Single-request and batch-32 serve-bucket latency (CTI session) — the
    default bit-exact session and the fast path (float16 wire + bf16
    forward), interleaved so the pairs are mutually comparable."""
    from vqatpu.serve import InferenceSession

    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    model = build_model(cfg)
    params = make_train_state(model, jax.random.PRNGKey(0)).params
    sessions = {
        "": InferenceSession(model, params, ["a"] * 3129,
                             batch_buckets=(1, 32), max_boxes=50),
        "_fast": InferenceSession(model, params, ["a"] * 3129,
                                  batch_buckets=(1, 32), max_boxes=50,
                                  transfer_dtype=np.float16,
                                  compute_dtype="bfloat16"),
        # int8 wire (4x fewer H2D bytes than f32; steps.quantize_v via the
        # C++ single-pass quantizer) + bf16 forward
        "_fast8": InferenceSession(model, params, ["a"] * 3129,
                                   batch_buckets=(1, 32), max_boxes=50,
                                   transfer_dtype="int8",
                                   compute_dtype="bfloat16"),
    }
    rng = np.random.RandomState(3)
    for n, base in ((1, "serve_latency_b1"), (32, "serve_latency_b32")):
        v = rng.randn(n, 50, 2048).astype(np.float32)
        q = rng.randint(0, 20000, (n, 12))
        a = rng.randint(0, 20000, (n, 3))
        for suffix, sess in sessions.items():
            sess.logits(v, None, q, a)  # compile the bucket
        best = {s: float("inf") for s in sessions}
        for _ in range(4):
            for suffix, sess in sessions.items():
                t0 = time.perf_counter()
                for _ in range(20):
                    out = sess.logits(v, None, q, a)
                float(out.sum())  # readback barrier
                best[suffix] = min(best[suffix],
                                   (time.perf_counter() - t0) / 20)
        for suffix in sessions:
            label = base + suffix
            results[label] = {"kind": "serve", "batch": n,
                              "ms": round(best[suffix] * 1e3, 3),
                              "requests_per_sec": round(n / best[suffix], 1)}
            print(f"{label:22s} {best[suffix] * 1e3:8.2f} ms", flush=True)
    _serve_by_id_rows(results, model, params)


def _serve_by_id_rows(results, model, params):
    """Serve-by-image-id (r4): features HBM-resident (int8 rows + scales +
    per-image index table), gathered + dequantized inside the jitted
    predict — the request moves 200 bytes of row indices per image instead
    of ~410 KB of f32 features.  These rows bound the wire-free serving
    floor the upload rows should be compared against."""
    from vqatpu.data.features import FeatureStore
    from vqatpu.serve import InferenceSession, ResidentFeatures

    rng = np.random.RandomState(7)
    n_img, boxes = 256, 50
    counts = rng.randint(30, boxes + 1, n_img)
    ends = np.cumsum(counts)
    store = FeatureStore(
        rng.randn(int(ends[-1]), 2048).astype(np.float32),
        rng.rand(int(ends[-1]), 6).astype(np.float32),
        pos_boxes=np.stack([ends - counts, ends], 1).astype(np.int64))
    rf = ResidentFeatures(store, {i: i for i in range(n_img)},
                          max_boxes=boxes)
    sess = InferenceSession(model, params, ["a"] * 3129,
                            batch_buckets=(1, 32), max_boxes=boxes)
    sess.attach_features(rf, placement="device", quantize=True)
    for n, label in ((1, "serve_by_id_b1"), (32, "serve_by_id_b32")):
        ids = rng.randint(0, n_img, n)
        q = rng.randint(0, 20000, (n, 12))
        a = rng.randint(0, 20000, (n, 3))
        sess.logits_by_id(ids, q, a)  # compile
        t_best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(20):
                out = sess.logits_by_id(ids, q, a)
            float(out.sum())  # readback barrier
            t_best = min(t_best, (time.perf_counter() - t0) / 20)
        results[label] = {"kind": "serve", "batch": n,
                          "ms": round(t_best * 1e3, 3),
                          "requests_per_sec": round(n / t_best, 1)}
        print(f"{label:22s} {t_best * 1e3:8.2f} ms", flush=True)


def _epoch_wall_rows(results):
    """Epoch wall through the REAL input pipeline (r3 verdict item 4): CTI
    B=256 over a reference-shaped synthetic fixture (2048 rows = 8 batches),
    native C++ ring loader -> wire -> jitted step, f32 vs int8 wire
    interleaved with a readback barrier per epoch.  ms/batch includes
    assembly + H2D transfer + step, so input-pipeline regressions diff
    round-over-round the way device-step rows already do.  (The absolute is
    tunnel-weather dependent — the f32/int8 RATIO is the stable signal;
    PROFILE.md's 6/6-rep A/B is the methodology reference.)"""
    import tempfile

    from vqatpu.data import VQAFeatureDataset
    from vqatpu.data.synthetic import make_vqa_fixture
    from vqatpu.train.loop import _device_batch, _make_loader

    root = tempfile.mkdtemp(prefix="bench_epoch_")
    B = 256
    d = make_vqa_fixture(os.path.join(root, "data_vqa"), n_train=2048,
                         n_val=16, n_images=64, v_dim=2048)
    ds = VQAFeatureDataset("train", d, dataroot=os.path.join(root, "data_vqa"),
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
                        make_train_state(model, jax.random.PRNGKey(0)), tcfg,
                        None]
    # device-resident store (int8 tables) — the train() --device_features
    # default: v/b never cross the host wire (the loader ships fields +
    # ~50 KB of row indices per batch; targets stay dense — sparse was a
    # measured wash, scripts/ab_devstore.py)
    from vqatpu.data.batching import BatchLoader, PrefetchLoader
    from vqatpu.data.device_store import DeviceFeatureStore

    dtcfg = TrainConfig(update_freq=1, batch_size=B, transfer_dtype="int8",
                        device_features=True)
    variants["devstore"] = [
        PrefetchLoader(BatchLoader(ds, B, shuffle=True, seed=dtcfg.seed,
                                   drop_last=True, fields_only=True)),
        make_train_step(model, dtcfg),
        make_train_state(model, jax.random.PRNGKey(0)), dtcfg,
        DeviceFeatureStore.build(ds, transfer_dtype="int8")]

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

    for td, var in variants.items():
        nb = run_epoch(var)
        print(f"epoch_wall warm {td} ok ({nb} batches)", flush=True)
    best = {td: float("inf") for td in variants}
    for rep in range(4):
        for td, var in variants.items():
            t0 = time.perf_counter()
            nb = run_epoch(var)
            ms = (time.perf_counter() - t0) / nb * 1e3
            best[td] = min(best[td], ms)
            print(f"rep{rep} epoch_wall wire={td:8s} {ms:8.2f} ms/batch",
                  flush=True)
    for td in variants:
        label = f"epoch_wall_cti_256_{'f32' if td == 'float32' else td}"
        results[label] = {"kind": "epoch", "batch": B,
                          "ms_per_batch": round(best[td], 2),
                          "samples_per_sec": round(B / best[td] * 1e3, 1)}
        print(f"{label:22s} {best[td]:8.2f} ms/batch", flush=True)


def main():
    from vqatpu.cli.common import enable_compilation_cache

    enable_compilation_cache(os.environ.get(
        "VQATPU_COMPILATION_CACHE", "~/.cache/vqatpu/xla"))
    names = sys.argv[1:] or list(CONFIGS)
    key = jax.random.PRNGKey(1)
    runners = {}
    for name in names:
        B, batch, state, step, model = make(name)
        state, m = step(state, batch, jnp.float32(1e-3), key)
        float(np.asarray(m["loss"]))
        runners[name] = ["train", B, batch, state, step]
        print(f"compiled {name}", flush=True)
    for iname, (base, ev_dtype) in INFER.items():
        if base not in names:
            continue
        B, batch, _, _, model = make(base)
        ev = make_eval_step(model, compute_dtype=ev_dtype)
        db = {k: v for k, v in batch.items() if k != "target"}
        params = make_train_state(model, jax.random.PRNGKey(0)).params
        out = ev(params, db)
        float(np.asarray(out["logits"]).sum())
        runners[iname] = ["infer", B, db, params, ev]
        print(f"compiled {iname}", flush=True)

    iters = 30
    best = {n: float("inf") for n in runners}
    for rep in range(4):
        for name, r in runners.items():
            kind, B, batch = r[0], r[1], r[2]
            t0 = time.perf_counter()
            if kind == "train":
                for i in range(iters):
                    r[3], m = r[4](r[3], batch, jnp.float32(1e-3),
                                   jax.random.fold_in(key, i))
                float(np.asarray(m["loss"]))
            else:
                for i in range(iters):
                    out = r[4](r[3], batch)
                float(np.asarray(out["logits"]).sum())
            dt = (time.perf_counter() - t0) / iters
            best[name] = min(best[name], dt)
            print(f"rep{rep} {name:16s} {dt * 1e3:8.2f} ms "
                  f"({B / dt:,.0f} samples/s)", flush=True)

    results = {}
    print("--- best ---", flush=True)
    for name, r in runners.items():
        kind, B = r[0], r[1]
        print(f"{name:16s} {best[name] * 1e3:8.2f} ms "
              f"({B / best[name]:,.0f} samples/s)", flush=True)
        results[name] = {"kind": kind, "batch": B,
                         "ms_per_step": round(best[name] * 1e3, 3),
                         "samples_per_sec": round(B / best[name], 1)}
    if "mc_tan_64" in results:
        # 4 candidate rows per question (MC/train.py:74-83)
        results["mc_tan_64"]["questions_per_sec"] = round(
            results["mc_tan_64"]["batch"] / 4 / best["mc_tan_64"], 1)

    _serve_rows(results)
    _epoch_wall_rows(results)

    payload = {
        "note": ("one interleaved tunnel session; rows mutually comparable, "
                 "cross-session absolutes drift (PROFILE.md). samples = "
                 "device rows (mc_tan_64 rows are x4 candidate-expanded)."),
        "device": jax.devices()[0].device_kind,
        "date": time.strftime("%Y-%m-%d"),
        "results": results,
    }
    with open(MATRIX_PATH, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {MATRIX_PATH}", flush=True)


if __name__ == "__main__":
    main()
