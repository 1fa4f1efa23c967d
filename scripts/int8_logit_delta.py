"""Quantify int8-wire logit impact at reference scale: eval logits f32 vs
int8 wire, CTI + BAN, B=256.  Reports max/mean |delta| and argmax flips.

Measured (random-init params, synthetic reference-dim inputs, 1024 rows):
  cti: max|dlogit| 0.0026  mean 0.0003  logit span 2.4  flips 2/1024
  ban: max|dlogit| 0.1068  mean 0.0044  logit span 4.9  flips 14/1024
Caveat: random-init logit margins are tiny (span 2.4-4.9 over 3129
classes), so the flip rate is an upper bound — trained models separate
classes by far more than the ~0.1-logit worst-case perturbation.  Real
accuracy confirmation still needs the real artifacts (NEXT.md item 1).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/int8_logit_delta.py
"""
import os
import sys
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from vqatpu.config import ModelConfig
from vqatpu.models import build_model
from vqatpu.train.steps import make_eval_step, make_train_state, wire_cast

rng = np.random.RandomState(0)
B, V = 256, 50
for model_name in ("cti", "ban"):
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model=model_name, num_hid=1024, h_mm=512, rank=32,
                      gamma=2)
    m = build_model(cfg)
    params = make_train_state(m, jax.random.PRNGKey(0)).params
    ev = make_eval_step(m)
    flips = 0; mx = 0.0; mean = 0.0; n = 0; span = 0.0
    for it in range(4):
        batch = {
            "v": (rng.randn(B, V, 2048) * rng.rand(B, V, 1) * 3).astype(np.float32),
            "q": rng.randint(0, 20000, (B, 12)),
            "v_mask": np.arange(V)[None].repeat(B, 0) < 44,
        }
        if model_name == "cti":
            batch["a"] = rng.randint(0, 20000, (B, 3))
        lf = np.asarray(ev(params, batch)["logits"])
        lq = np.asarray(ev(params, wire_cast(batch, "int8"))["logits"])
        d = np.abs(lf - lq)
        mx = max(mx, float(d.max())); mean += float(d.mean())
        flips += int((lf.argmax(1) != lq.argmax(1)).sum()); n += B
        span += float((lf.max(1) - lf.min(1)).mean())
    print(f"{model_name}: max|dlogit| {mx:.4f}  mean {mean/4:.5f}  "
          f"logit span {span/4:.1f}  argmax flips {flips}/{n}")
