"""Quantify reduced-precision logit impact at reference scale: eval logits
f32 vs int8 WIRE and vs bf16 COMPUTE, CTI + BAN, B=256.  Reports max/mean
|delta| and argmax flips, plus (``--traj``) a short f32-vs-bf16
training-trajectory divergence curve (the risk profile of the measured
``ban_256_bf16`` −27% step-time knob — r3 verdict item 5).

Measured (random-init params, synthetic reference-dim inputs, 1024 rows):
  int8 wire   cti: max|dlogit| 0.0026  mean 0.0003  span 2.4  flips 2/1024
  int8 wire   ban: max|dlogit| 0.1068  mean 0.0044  span 4.9  flips 14/1024
  bf16 fwd    cti: max|dlogit| 0.0075  mean 0.0012  span 2.4  flips 7/1024
  bf16 fwd    ban: max|dlogit| 0.0620  mean 0.0034  span 4.9  flips 16/1024
(bf16 BAN's worst-case logit perturbation is SMALLER than the already-
studied int8 wire's.)
Caveat: random-init logit margins are tiny (span 2.4-4.9 over 3129
classes), so the flip rate is an upper bound — trained models separate
classes by far more than the ~0.2-logit worst-case perturbation.  Real
accuracy confirmation still needs the real artifacts (NEXT.md item 1).

Trajectory (--traj [ban|cti], 20 steps at reference dims, identical
batches and dropout keys, optimizer state f32 in both runs):
  ban (r4): per-step |dloss| stays 0.01-1.4% of the loss (worst 5.5
  absolute on a 321 loss at step 18, no compounding blow-up); after 20
  updates param max|delta| 7.2e-3, mean relative drift 1.0e-3 (≈ lr-scale
  — one update's worth of noise).  See PARITY.md "bf16 BAN risk".
  cti (r5, behind the large-batch bf16 recommendation): per-step |dloss|
  <= 0.14% of the loss; after 20 updates param max|delta| 5.3e-3, mean
  relative drift 1.3e-4 — an order tighter than BAN.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python scripts/int8_logit_delta.py [--traj [ban|cti]]
"""
import os
import sys
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from vqatpu.cli.common import enable_compilation_cache
enable_compilation_cache(os.environ.get("VQATPU_COMPILATION_CACHE",
                                        "~/.cache/vqatpu/xla"))
from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.train.steps import (make_eval_step, make_train_state,
                                make_train_step, wire_cast)

rng = np.random.RandomState(0)
B, V = 256, 50


def make_batch(model_name, with_target=False):
    batch = {
        "v": (rng.randn(B, V, 2048) * rng.rand(B, V, 1) * 3).astype(np.float32),
        "q": rng.randint(0, 20000, (B, 12)),
        "v_mask": np.arange(V)[None].repeat(B, 0) < 44,
    }
    if model_name == "cti":
        batch["a"] = rng.randint(0, 20000, (B, 3))
    if with_target:
        t = rng.rand(B, 3129).astype(np.float32)
        batch["target"] = (t * (t > 0.995)).astype(np.float32)
    return batch


def logit_deltas():
    for model_name in ("cti", "ban"):
        cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                          model=model_name, num_hid=1024, h_mm=512, rank=32,
                          gamma=2)
        m = build_model(cfg)
        params = make_train_state(m, jax.random.PRNGKey(0)).params
        ev = make_eval_step(m)
        ev16 = make_eval_step(m, compute_dtype="bfloat16")
        stats = {k: [0.0, 0.0, 0, 0.0] for k in ("int8", "bf16")}  # mx/mean/flips/span
        n = 0
        for it in range(4):
            batch = make_batch(model_name)
            lf = np.asarray(ev(params, batch)["logits"])
            for key, lq in (("int8", np.asarray(
                    ev(params, wire_cast(batch, "int8"))["logits"])),
                            ("bf16", np.asarray(ev16(params, batch)["logits"]))):
                d = np.abs(lf - lq)
                s = stats[key]
                s[0] = max(s[0], float(d.max())); s[1] += float(d.mean())
                s[2] += int((lf.argmax(1) != lq.argmax(1)).sum())
                s[3] += float((lf.max(1) - lf.min(1)).mean())
            n += B
        for key, s in stats.items():
            print(f"{key:5s} {model_name}: max|dlogit| {s[0]:.4f}  "
                  f"mean {s[1]/4:.5f}  logit span {s[3]/4:.1f}  "
                  f"argmax flips {s[2]}/{n}", flush=True)


def traj_divergence(steps=20, model_name="ban"):
    """f32 vs bf16-compute training at reference dims from identical
    state/batches: per-step |dloss| and relative param drift.  ``ban`` is
    the r4 risk profile behind the ``ban_256_bf16`` knob; ``cti`` is the
    r5 one behind the large-batch `--compute_dtype bfloat16` recommendation
    (B stays 256 here — the bf16 rounding error is per-element, what B=1024
    changes is only the speed verdict, scripts/ab_dtype_scale.py)."""
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model=model_name, num_hid=1024, h_mm=512, rank=32,
                      gamma=2)
    m = build_model(cfg)
    runs = {}
    batches = [make_batch(model_name, with_target=True) for _ in range(steps)]
    for dtype in ("float32", "bfloat16"):
        tcfg = TrainConfig(batch_size=B, compute_dtype=dtype)
        step = make_train_step(m, tcfg)
        state = make_train_state(m, jax.random.PRNGKey(0))
        losses = []
        for i, batch in enumerate(batches):
            state, met = step(state, batch, jnp.float32(1e-3),
                              jax.random.PRNGKey(7 + i))
            losses.append(float(met["loss"]))
        runs[dtype] = (losses, state.params)
    lf, pf = runs["float32"]
    lb, pb = runs["bfloat16"]
    print("step  loss_f32    loss_bf16   |dloss|", flush=True)
    for i, (a, b) in enumerate(zip(lf, lb)):
        print(f"{i:4d}  {a:.6f}  {b:.6f}  {abs(a-b):.2e}", flush=True)
    num = den = 0.0
    mx = 0.0
    for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pb)):
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        num += float(d.sum()); den += float(np.abs(np.asarray(a)).sum())
        mx = max(mx, float(d.max()))
    print(f"after {len(lf)} steps: param max|delta| {mx:.2e}, "
          f"mean relative drift {num/den:.2e}", flush=True)


if __name__ == "__main__":
    if "--traj" in sys.argv:
        i = sys.argv.index("--traj")
        name = (sys.argv[i + 1] if len(sys.argv) > i + 1
                and not sys.argv[i + 1].startswith("-") else "ban")
        traj_divergence(model_name=name)
    else:
        logit_deltas()
