"""Consolidated roofline for the CTI train step (r3 verdict item 4): sum
the step's FLOPs + HBM bytes into ONE modeled floor and state what fraction
of that floor the measured step achieves.

Method: XLA's own post-optimization cost model
(``jit(...).lower(...).compile().cost_analysis()``) — ``flops`` and
``bytes accessed`` on the FUSED executable, so VMEM-resident intermediates
inside a fusion are already excluded, while genuine repeated HBM reads of a
buffer by different consumers count each time (they are real traffic).  That
makes ``bytes accessed`` the honest HBM-traffic model short of a hardware
profiler, and

    floor = max(flops / peak_flops, bytes / peak_bw)

the classic roofline bound.  Peaks are public TPU v5e numbers: 197 TFLOP/s
(bf16 MXU — JAX's DEFAULT matmul precision feeds f32 operands through the
bf16 multipliers, so f32 GEMMs run at this rate too) and 819 GB/s HBM.

Stages: the full train step (measured wall same-session, readback barrier),
the int8-wire step (shows the byte shrink that bought the measured −12%),
eval forward, and the clip+Adamax update alone (whose analytic ~1.7 GB
floor PROFILE.md already argued by hand — cross-checks the model).

Measured (v5e-lite tunnel, one session, best-of-4 windows of 20-30 iters,
value-readback barriers; see PROFILE.md "Consolidated roofline" for the
full interpretation — the headline is that cost_analysis bytes are an
UPPER bound on real traffic, so %floor > 100 means the executable beat
the modeled traffic via fusion/VMEM residency, not the laws of physics):

    stage                     GFLOP      GB  t_flop   t_mem   floor    meas  %floor
    train_step_f32wire        493.6   16.65    2.51   20.33   20.33   12.01   169.2
    train_step_int8wire       493.4   15.81    2.50   19.30   19.30   12.40   155.6
    eval_forward              211.8    3.29    1.08    4.01    4.01    5.47    73.4
    clip_adamax                 0.7    4.14    0.00    5.05    5.05    3.39   149.0

(f32-vs-int8 within one roofline run is NOT an A/B — the rows run
sequentially and the tunnel drifts ±2 ms on minute scales; the
interleaved 6/6 A/B in scripts/ab_wire_device.py is the wire verdict.)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vqatpu.cli.common import enable_compilation_cache
from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.train.optim import clip_flat_grads
from vqatpu.train.steps import (_frozen_mask_fn, make_eval_step,
                                make_optimizer, make_train_state,
                                make_train_step, wire_cast)

PEAK_FLOPS = 197e12  # v5e bf16 MXU (f32 GEMMs ride it via DEFAULT precision)
PEAK_BW = 819e9      # v5e HBM GB/s
B, V, Q, A = 256, 50, 12, 3


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    enable_compilation_cache(os.environ.get(
        "VQATPU_COMPILATION_CACHE", "~/.cache/vqatpu/xla"))
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    model = build_model(cfg)
    tcfg = TrainConfig(update_freq=1, batch_size=B)
    state = make_train_state(model, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    v = rng.randn(B, V, 2048).astype(np.float32)
    v[:, 44:] = 0.0
    batch = {
        "v": v,
        "q": rng.randint(0, 20000, (B, Q)).astype(np.int32),
        "a": rng.randint(0, 20000, (B, A)).astype(np.int32),
        "v_mask": (np.arange(V)[None] < 44).repeat(B, 0),
        "target": rng.rand(B, cfg.num_classes).astype(np.float32),
    }
    key = jax.random.PRNGKey(1)
    lr = jnp.float32(1e-3)

    step = make_train_step(model, tcfg)
    batch8 = wire_cast(dict(batch), "int8")

    rows = {}

    # --- full train step: cost model + measured wall, same session ---
    for name, b in (("train_step_f32wire", batch), ("train_step_int8wire",
                                                    batch8)):
        db = {k: jnp.asarray(x) for k, x in b.items()}
        compiled = step.lower(state, db, lr, key).compile()
        fl, by = cost(compiled)
        # the step donates its state arg — keep the pristine `state` out of
        # execution (eval/opt stages below still need its buffers)
        st = make_train_state(model, jax.random.PRNGKey(0))
        st, m = step(st, db, lr, key)
        float(np.asarray(m["loss"]))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for i in range(30):
                st, m = step(st, db, lr, jax.random.fold_in(key, i))
            float(np.asarray(m["loss"]))
            best = min(best, (time.perf_counter() - t0) / 30)
        rows[name] = (fl, by, best)
        print(f"{name}: measured {best * 1e3:.2f} ms", flush=True)

    # --- eval forward ---
    # Consume every output leaf ON DEVICE and read back one scalar: a full
    # (256,3129) f32 logits readback is ~3.2 MB through the tunnel and
    # inflates the wall by ~2 ms/iter, which is transfer, not compute.
    ev = make_eval_step(model)

    def ev_scalar(p, b):
        return sum(jnp.sum(x) for x in jax.tree.leaves(ev(p, b)))

    jev = jax.jit(ev_scalar)
    db = {k: jnp.asarray(x) for k, x in batch.items() if k != "target"}
    compiled = jev.lower(state.params, db).compile()
    fl, by = cost(compiled)
    s = jev(state.params, db)
    float(np.asarray(s))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(20):
            s = s * 0 + jev(state.params, db)
        float(np.asarray(s))
        best = min(best, (time.perf_counter() - t0) / 20)
    rows["eval_forward"] = (fl, by, best)
    print(f"eval_forward: measured {best * 1e3:.2f} ms", flush=True)

    # --- clip+Adamax alone (cross-checks PROFILE.md's analytic ~1.7 GB) ---
    tx = make_optimizer(_frozen_mask_fn(model, False))
    grads = jax.tree.map(lambda x: x * 1e-3, state.params)

    def opt_step(p, os_, g):
        g, norm = clip_flat_grads(g, 0.25)
        updates, os_ = tx.update(g, os_, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return p, os_, norm

    # donate p/opt_state like the real train step does — without donation
    # XLA writes fresh m/u/p buffers and the row over-counts write traffic
    jopt = jax.jit(opt_step, donate_argnums=(0, 1))
    compiled = jopt.lower(state.params, state.opt_state, grads).compile()
    fl, by = cost(compiled)
    p, os_, n = jopt(state.params, state.opt_state, grads)
    float(np.asarray(n))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(30):
            p, os_, n = jopt(p, os_, grads)
        float(np.asarray(n))
        best = min(best, (time.perf_counter() - t0) / 30)
    rows["clip_adamax"] = (fl, by, best)
    print(f"clip_adamax: measured {best * 1e3:.2f} ms", flush=True)

    print(f"\ndevice: {jax.devices()[0].device_kind}")
    print(f"peaks: {PEAK_FLOPS / 1e12:.0f} TFLOP/s, {PEAK_BW / 1e9:.0f} GB/s")
    hdr = (f"{'stage':22s} {'GFLOP':>8s} {'GB':>7s} {'t_flop':>7s} "
           f"{'t_mem':>7s} {'floor':>7s} {'meas':>7s} {'%floor':>7s}")
    print(hdr)
    for name, (fl, by, meas) in rows.items():
        t_f = fl / PEAK_FLOPS * 1e3
        t_m = by / PEAK_BW * 1e3
        floor = max(t_f, t_m)
        meas_ms = meas * 1e3
        print(f"{name:22s} {fl / 1e9:8.1f} {by / 1e9:7.2f} {t_f:7.2f} "
              f"{t_m:7.2f} {floor:7.2f} {meas_ms:7.2f} "
              f"{floor / meas_ms * 100:7.1f}")


if __name__ == "__main__":
    main()
