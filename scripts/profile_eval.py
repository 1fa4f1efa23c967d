"""Eval-mode FORWARD stage breakdown (VERDICT r4 #3).

The r4 roofline's eval-forward row measured 5.47 ms vs a 4.01 ms modeled
t_mem upper bound; this script prices each eval stage separately and tests
the one zero-risk candidate win: ``fused_v_tucker`` in EVAL mode (no
dropout => bit-identical math; saves two of the three 100 MB HBM reads of
``v``) — the knob measured "even" for the TRAIN step, where the saving is
a smaller fraction.

Every function is compiled up front; timing windows INTERLEAVE all stages
per rep (the tunnel drifts ±2 ms on minute scales, so only same-session
alternation is meaningful).  Forward-only, value-readback barriers, carry
threading so iteration i+1 depends on i.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_eval.py
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig
from vqatpu.models import build_model
from vqatpu.ops.module import Ctx

B, V, Q, A = 256, 50, 12, 3


def main():
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    model = build_model(cfg)
    model_fused = build_model(dataclasses.replace(cfg, fused_v_tucker=True))

    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(B, V, 2048).astype(np.float32))
    q = jnp.asarray(rng.randint(0, 20000, (B, Q)).astype(np.int32))
    a = jnp.asarray(rng.randint(0, 20000, (B, A)).astype(np.int32))
    v_mask = jnp.asarray(np.arange(V)[None] < 44).repeat(B, 0)
    batch = {"v": v, "q": q, "a": a, "v_mask": v_mask}
    params = model.init(jax.random.PRNGKey(0))

    ctx0 = Ctx(train=False)
    w_emb, q_emb = model.w_emb, model.q_emb
    w0 = w_emb.apply(params["w_emb"], q, ctx0)
    q_state = q_emb.apply_all(params["q_emb"], w0, ctx0)
    wa0 = w_emb.apply(params["wa_emb"], a, ctx0)
    a_state = q_emb.apply_all(params["ans_emb"], wa0, ctx0)
    tc = model.t_att.tc
    v_r, q_r, a_r, T = tc.rank_projections(params["t_att"]["tc"], v, q_state,
                                           a_state, ctx0)
    att_g = model.t_att.apply_gqav(params["t_att"], v, q_state, a_state,
                                   v_mask, ctx0)
    pooled = jnp.asarray(rng.randn(B, 1024).astype(np.float32))

    def full(c, p):
        logits, _ = model.apply(p, dict(batch, v=v + c * 1e-30))
        return logits.sum() * 1e-9

    def full_fused(c, p):
        logits, _ = model_fused.apply(p, dict(batch, v=v + c * 1e-30))
        return logits.sum() * 1e-9

    def gru(c, p):
        w = w_emb.apply(p["w_emb"], q, None)
        qs = q_emb.apply_all(p["q_emb"], w + c * 1e-30, None)
        wa = w_emb.apply(p["wa_emb"], a, None)
        as_ = q_emb.apply_all(p["ans_emb"], wa, None)
        return qs.sum() * 1e-9 + as_.sum() * 1e-9

    def proj(c, p):
        vr, qr, ar, _ = tc.rank_projections(p, v + c * 1e-30, q_state,
                                            a_state, None)
        return vr.sum() * 1e-9 + qr.sum() * 1e-9 + ar.sum() * 1e-9

    def chain(c, vr, qr, ar, t):
        from vqatpu.kernels.trilinear import (attention_logits_gqav,
                                              masked_softmax_gqav)
        att = masked_softmax_gqav(
            attention_logits_gqav(vr + c * 1e-30, qr, ar, t), v_mask)
        return att.sum() * 1e-9

    def joint(c, p):
        # both glimpses: t_net pool + q/a projections (the residual updates)
        tot = jnp.float32(0.0)
        qs, as_ = q_state, a_state
        for g in range(cfg.gamma):
            j = model.t_net.apply_with_weights_qav(
                p[f"t_net{g}"], v + c * 1e-30, qs, as_, att_g[:, g], None)
            qu = model.prj.apply(p[f"q_prj{g}"], j[:, None], None)
            au = model.prj.apply(p[f"a_prj{g}"], j[:, None], None)
            qs = qs + qu
            as_ = as_ + au
            tot = tot + j.sum() * 1e-9
        return tot + qs.sum() * 1e-12 + as_.sum() * 1e-12

    def clf(c, p):
        return model.classifier.apply(p, pooled + c * 1e-30, None).sum() * 1e-9

    stages = {
        "full eval fwd": (full, (params,)),
        "full eval fwd FUSED v-tucker": (full_fused, (params,)),
        "  gru q+a fwd": (gru, (params,)),
        "  tucker+rank proj fwd": (proj, (params["t_att"]["tc"],)),
        "  chain+softmax fwd": (chain, (v_r, q_r, a_r, T)),
        "  joint pool+prj x2 fwd": (joint, (params,)),
        "  classifier fwd": (clf, (params["classifier"],)),
    }
    compiled = {}
    for name, (fn, args) in stages.items():
        f = jax.jit(fn)
        float(np.asarray(f(jnp.float32(0.0), *args)))
        compiled[name] = (f, args)
        print(f"compiled: {name}", flush=True)

    iters = 50
    best = {name: float("inf") for name in stages}
    for rep in range(4):
        for name, (f, args) in compiled.items():
            c = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(iters):
                c = f(c, *args)
            float(np.asarray(c))
            dt = (time.perf_counter() - t0) / iters
            best[name] = min(best[name], dt)
            print(f"rep{rep} {name:34s} {dt * 1e3:8.3f} ms", flush=True)

    print("\nbest-of-reps:")
    for name, dt in best.items():
        print(f"  {name:34s} {dt * 1e3:8.3f} ms")
    parts = sum(dt for name, dt in best.items() if name.startswith("  "))
    print(f"  {'sum of stages':34s} {parts * 1e3:8.3f} ms "
          f"(vs full {best['full eval fwd'] * 1e3:.3f})")


if __name__ == "__main__":
    main()
