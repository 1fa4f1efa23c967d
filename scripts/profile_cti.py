"""Component-level timing breakdown of the CTI train step (VERDICT r1 #3).

Times each stage of the hot path separately, fwd+bwd, with VALUE-READBACK
barriers (the only honest barrier on the axon tunnel — see bench.py notes).
Every timed fn threads a scalar dependency through the loop so iteration i+1
cannot be dispatched ahead of i's math, and the final readback covers the
whole chain.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_cti.py \
    [stage ...]   # stages: step loss fwd gru att proj chain joint clf rng adamax
                  # (no args = all; compiles are slow on the 1-core host, so
                  # run a few stages per invocation)
"""

from __future__ import annotations

import sys
import time

STAGES = set(sys.argv[1:])


def want(name: str) -> bool:
    return not STAGES or name in STAGES

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.ops.module import Ctx
from vqatpu.train.steps import make_train_state, make_train_step

B, V, Q, A = 256, 50, 12, 3


def _gsum(g):
    """Consume EVERY grad leaf so XLA cannot dead-code-eliminate any branch
    of the backward pass (summing one leaf lets whole grad subtrees drop)."""
    return sum(x.sum() for x in jax.tree.leaves(g)) * 1e-20


def timed(name, fn, *args, iters=30):
    """fn(carry, i, *args) -> scalar carry. Times the chained loop."""
    fn = jax.jit(fn)
    carry = jnp.float32(0.0)
    carry = fn(carry, 0, *args)  # compile
    float(np.asarray(carry))
    best = float("inf")
    for w in range(3):
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(iters):
            carry = fn(carry, i, *args)
        float(np.asarray(carry))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:44s} {best * 1e3:8.3f} ms", flush=True)
    return best


def main():
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    tcfg = TrainConfig(update_freq=1, batch_size=B)
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(B, V, 2048).astype(np.float32))
    q = jnp.asarray(rng.randint(0, 20000, (B, Q)).astype(np.int32))
    a = jnp.asarray(rng.randint(0, 20000, (B, A)).astype(np.int32))
    v_mask = jnp.asarray(np.arange(V)[None] < 44).repeat(B, 0)
    target = jnp.asarray(rng.rand(B, 3129).astype(np.float32))
    batch = {"v": v, "q": q, "a": a, "v_mask": v_mask, "target": target}

    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    # --- full train step (the bench number) ---
    if want("step"):
        _time_full_step(model, tcfg, batch, key)
    if want("dtype"):
        # interleaved A/B (the shared tunnel drifts on minute scales, so
        # sequential one-shot comparisons are unreliable): compile both once,
        # then alternate timing windows
        import dataclasses
        runners = {}
        for dt in ("float32", "bfloat16"):
            st = make_train_state(model, jax.random.PRNGKey(0))
            stp = make_train_step(model, dataclasses.replace(tcfg,
                                                             compute_dtype=dt))
            st, mm = stp(st, batch, jnp.float32(1e-3), key)
            float(np.asarray(mm["loss"]))
            runners[dt] = [st, stp]
        for rep in range(4):
            for dt, r in runners.items():
                t0 = time.perf_counter()
                for i in range(30):
                    r[0], mm = r[1](r[0], batch, jnp.float32(1e-3),
                                    jax.random.fold_in(key, i))
                float(np.asarray(mm["loss"]))
                dtm = (time.perf_counter() - t0) / 30
                print(f"rep{rep} {dt:10s} {dtm * 1e3:8.3f} ms", flush=True)
    if want("mb"):
        # interleaved A/B: 32-bit vs 16-bit dropout masks
        import dataclasses
        runners = {}
        for mb in (32, 16):
            st = make_train_state(model, jax.random.PRNGKey(0))
            stp = make_train_step(model,
                                  dataclasses.replace(tcfg, mask_bits=mb))
            st, mm = stp(st, batch, jnp.float32(1e-3), key)
            float(np.asarray(mm["loss"]))
            runners[mb] = [st, stp]
        for rep in range(3):
            for mb, r in runners.items():
                t0 = time.perf_counter()
                for i in range(30):
                    r[0], mm = r[1](r[0], batch, jnp.float32(1e-3),
                                    jax.random.fold_in(key, i))
                float(np.asarray(mm["loss"]))
                print(f"rep{rep} mask_bits={mb:2d} "
                      f"{(time.perf_counter() - t0) / 30 * 1e3:8.3f} ms",
                      flush=True)
    if want("kb"):
        import dataclasses
        for kb in ("xla", "pallas"):
            m = build_model(dataclasses.replace(cfg, kernel_backend=kb))
            print(f"--- kernel_backend={kb}", flush=True)
            _time_full_step(m, tcfg, batch, key)
    if want("ab"):
        # fused vs unfused v-tucker, same process (fair tunnel conditions)
        import dataclasses
        for fused in (True, False):
            m = build_model(dataclasses.replace(cfg, fused_v_tucker=fused))
            print(f"--- fused_v_tucker={fused}", flush=True)
            _time_full_step(m, tcfg, batch, key)
    rest_stages = {"loss", "fwd", "gru", "gru2", "att", "proj", "chain",
                   "chain2", "chain3", "chain4", "joint", "clf", "rng", "rngfast",
                   "adamax"}
    if not STAGES or STAGES & rest_stages:
        _rest(model, tcfg, batch, key, params)


def _time_full_step(model, tcfg, batch, key):
    import numpy as np
    state = make_train_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model, tcfg)
    state, m = step(state, batch, jnp.float32(1e-3), key)
    float(np.asarray(m["loss"]))
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(30):
            state, m = step(state, batch, jnp.float32(1e-3),
                            jax.random.fold_in(key, i))
        float(np.asarray(m["loss"]))
        best = min(best, (time.perf_counter() - t0) / 30)
    print(f"{'FULL train step':44s} {best * 1e3:8.3f} ms", flush=True)


def _rest(model, tcfg, batch, key, params):
    import numpy as np
    B = batch["v"].shape[0]
    v, q, a = batch["v"], batch["q"], batch["a"]
    v_mask, target = batch["v_mask"], batch["target"]
    rng = np.random.RandomState(1)

    # --- loss fwd+bwd only (no adamax/clip) ---
    def loss_fn(p, c):
        ctx = Ctx(train=True, rng=jax.random.fold_in(key, 0))
        logits, _ = model.apply(p, dict(batch, v=batch["v"] + c), ctx)
        from vqatpu.ops import bce_with_logits_sum
        return bce_with_logits_sum(logits, target) / B

    def fwd_bwd(c, i, p):
        loss, g = jax.value_and_grad(loss_fn)(p, c * 1e-20)
        return loss * 1e-9 + _gsum(g)

    if want("loss"):
        timed("loss fwd+bwd (no optimizer)", fwd_bwd, params)

    # --- forward only, train mode / eval mode ---
    def fwd_train(c, i, p):
        ctx = Ctx(train=True, rng=jax.random.fold_in(key, i))
        logits, _ = model.apply(p, dict(batch, v=batch["v"] + c * 1e-20), ctx)
        return logits.sum() * 1e-9

    def fwd_eval(c, i, p):
        logits, _ = model.apply(p, dict(batch, v=batch["v"] + c * 1e-20))
        return logits.sum() * 1e-9

    if want("fwd"):
        timed("forward train-mode (dropout on)", fwd_train, params)
        timed("forward eval-mode (dropout off)", fwd_eval, params)

    # --- GRU encoders fwd+bwd ---
    w_emb = model.w_emb
    q_emb = model.q_emb

    def gru_loss(p, c):
        ctx = Ctx(train=True, rng=key)
        w = w_emb.apply(p["w_emb"], q, ctx)
        qs = q_emb.apply_all(p["q_emb"], w + c, ctx)
        wa = w_emb.apply(p["wa_emb"], a, ctx)
        as_ = q_emb.apply_all(p["ans_emb"], wa, ctx)
        return qs.sum() * 1e-9 + as_.sum() * 1e-9

    def gru_fb(c, i, p):
        l, g = jax.value_and_grad(gru_loss)(p, c * 1e-20)
        return l + _gsum(g)

    if want("gru"):
        timed("GRU q+a encoders fwd+bwd", gru_fb, params)

    if want("gru2"):
        # interleaved A/B: dual 2-batched scan vs two separate scans
        from vqatpu.ops.rnn import gru_dual_apply_all

        def loss_dual(p, c):
            ctx = Ctx(train=True, rng=key)
            w = w_emb.apply(p["w_emb"], q, ctx)
            wa = w_emb.apply(p["wa_emb"], a, ctx)
            qs, as_ = gru_dual_apply_all(p["q_emb"]["fwd"], p["ans_emb"]["fwd"],
                                         w + c, wa, 1024)
            return qs.sum() * 1e-9 + as_.sum() * 1e-9

        def dual_fb(c, i, p):
            l, g = jax.value_and_grad(loss_dual)(p, c * 1e-20)
            return l + _gsum(g)

        fns = {"separate": jax.jit(gru_fb), "dual": jax.jit(dual_fb)}
        for name, f in fns.items():
            float(np.asarray(f(jnp.float32(0.0), 0, params)))
        for rep in range(3):
            for name, f in fns.items():
                c = jnp.float32(0.0)
                t0 = time.perf_counter()
                for i in range(30):
                    c = f(c, i, params)
                float(np.asarray(c))
                print(f"rep{rep} gru-{name:9s} "
                      f"{(time.perf_counter() - t0) / 30 * 1e3:8.3f} ms",
                      flush=True)

    # precomputed states for attention / joint timing
    ctx0 = Ctx(train=False)
    w0 = w_emb.apply(params["w_emb"], q, ctx0)
    q_state = q_emb.apply_all(params["q_emb"], w0, ctx0)
    wa0 = w_emb.apply(params["wa_emb"], a, ctx0)
    a_state = q_emb.apply_all(params["ans_emb"], wa0, ctx0)

    # --- trilinear attention fwd+bwd (rank projections + chain + softmax) ---
    t_att = model.t_att

    def att_loss(p, vv, c, i):
        ctx = Ctx(train=True, rng=jax.random.fold_in(key, i))
        att, _ = t_att.apply(p, vv + c, q_state, a_state, v_mask, ctx)
        return att.sum() * 1e-6

    def att_fb(c, i, p):
        l, g = jax.value_and_grad(att_loss, argnums=(0, 1))(
            p, v, c * 1e-20, i)
        return l + _gsum(g)

    if want("att"):
        timed("TriAttention fwd+bwd (proj+chain+softmax)", att_fb, params["t_att"])

    # --- attention: projections only ---
    tc = t_att.tc

    def proj_loss(p, vv, c, i):
        ctx = Ctx(train=True, rng=jax.random.fold_in(key, i))
        v_r, q_r, a_r, T = tc.rank_projections(p, vv + c, q_state, a_state, ctx)
        return v_r.sum() * 1e-6 + q_r.sum() * 1e-6 + a_r.sum() * 1e-6

    def proj_fb(c, i, p):
        l, g = jax.value_and_grad(proj_loss, argnums=(0, 1))(p, v, c * 1e-20, i)
        return l + _gsum(g)

    if want("proj"):
        timed("  tucker+rank projections fwd+bwd", proj_fb, params["t_att"]["tc"])

    # --- attention: contraction chain + softmax only (fixed projections) ---
    ctxp = Ctx(train=False)
    v_r, q_r, a_r, T = tc.rank_projections(params["t_att"]["tc"], v, q_state,
                                           a_state, ctxp)

    from vqatpu.kernels.trilinear import trilinear_attention

    def chain_loss(vr, qr, ar, t, c):
        att = trilinear_attention(vr + c, qr, ar, t, v_mask)
        return att.sum() * 1e-6

    def chain_fb(c, i, *ops):
        l, g = jax.value_and_grad(chain_loss, argnums=(0, 1, 2, 3))(
            *ops, c * 1e-20)
        return l + _gsum(g)

    if want("chain"):
        timed("  PARALIND chain+softmax fwd+bwd", chain_fb, v_r, q_r, a_r, T)

    if want("chain3"):
        # interleaved A/B: chain with f32 vs bf16 operands (f32 softmax)
        from vqatpu.kernels.trilinear import (attention_logits_xla,
                                              masked_softmax_vqa_xla)

        def mk3(dtype):
            def loss(vr, qr, ar, t, c):
                vr = (vr + c).astype(dtype)
                logits = attention_logits_xla(vr, qr.astype(dtype),
                                              ar.astype(dtype),
                                              t.astype(dtype))
                att = masked_softmax_vqa_xla(logits.astype(jnp.float32),
                                             v_mask)
                return att.sum() * 1e-6

            def fb(c, i, *ops):
                l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                    *ops, c * 1e-20)
                return l + _gsum(g)
            return fb

        fns3 = {"f32": jax.jit(mk3(jnp.float32)),
                "bf16": jax.jit(mk3(jnp.bfloat16))}
        for name, f in fns3.items():
            float(np.asarray(f(jnp.float32(0.0), 0, v_r, q_r, a_r, T)))
        for rep in range(3):
            for name, f in fns3.items():
                c = jnp.float32(0.0)
                t0 = time.perf_counter()
                for i in range(30):
                    c = f(c, i, v_r, q_r, a_r, T)
                float(np.asarray(c))
                print(f"rep{rep} chain-{name:5s} "
                      f"{(time.perf_counter() - t0) / 30 * 1e3:8.3f} ms",
                      flush=True)

    if want("chain4"):
        # interleaved A/B: einsum chain vs hand-laid-out dot_general chain
        from vqatpu.kernels.trilinear import (attention_logits_dg,
                                              attention_logits_xla,
                                              masked_softmax_vqa_xla)

        def mk4(fn):
            def loss(vr, qr, ar, t, c):
                att = masked_softmax_vqa_xla(fn(vr + c, qr, ar, t), v_mask)
                return att.sum() * 1e-6

            def fb(c, i, *ops):
                l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                    *ops, c * 1e-20)
                return l + _gsum(g)
            return fb

        fns4 = {"einsum": jax.jit(mk4(attention_logits_xla)),
                "dg": jax.jit(mk4(attention_logits_dg))}
        for name, f in fns4.items():
            float(np.asarray(f(jnp.float32(0.0), 0, v_r, q_r, a_r, T)))
        for rep in range(3):
            for name, f in fns4.items():
                c = jnp.float32(0.0)
                t0 = time.perf_counter()
                for i in range(30):
                    c = f(c, i, v_r, q_r, a_r, T)
                float(np.asarray(c))
                print(f"rep{rep} chain-{name:7s} "
                      f"{(time.perf_counter() - t0) / 30 * 1e3:8.3f} ms",
                      flush=True)

    if want("chain2"):
        # interleaved A/B: standard chain vs block-diagonal-T first step
        from vqatpu.kernels.trilinear import (attention_logits_blockdiag,
                                              attention_logits_xla)

        def mk(fn):
            def loss(vr, qr, ar, t, c):
                from vqatpu.kernels.trilinear import masked_softmax_vqa_xla
                att = masked_softmax_vqa_xla(fn(vr + c, qr, ar, t), v_mask)
                return att.sum() * 1e-6

            def fb(c, i, *ops):
                l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                    *ops, c * 1e-20)
                return l + _gsum(g)
            return fb

        fns = {"std": jax.jit(mk(attention_logits_xla)),
               "bd": jax.jit(mk(attention_logits_blockdiag))}
        for name, f in fns.items():
            c = f(jnp.float32(0.0), 0, v_r, q_r, a_r, T)
            float(np.asarray(c))
        for rep in range(3):
            for name, f in fns.items():
                c = jnp.float32(0.0)
                t0 = time.perf_counter()
                for i in range(30):
                    c = f(c, i, v_r, q_r, a_r, T)
                float(np.asarray(c))
                print(f"rep{rep} chain-{name:4s} "
                      f"{(time.perf_counter() - t0) / 30 * 1e3:8.3f} ms",
                      flush=True)

    # --- per-glimpse joint embedding fwd+bwd ---
    t_net = model.t_net

    def joint_loss(p, vv, w_, c, i):
        ctx = Ctx(train=True, rng=jax.random.fold_in(key, i))
        j = t_net.apply_with_weights(p, vv + c, q_state, a_state, w_, ctx)
        return j.sum() * 1e-6

    att0, _ = t_att.apply(params["t_att"], v, q_state, a_state, v_mask, ctx0)
    w_g = att0[..., 0]

    def joint_fb(c, i, p):
        l, g = jax.value_and_grad(joint_loss, argnums=(0, 1, 2))(
            p, v, w_g, c * 1e-20, i)
        return l + _gsum(g)

    if want("joint"):
        timed("t_net joint embed fwd+bwd (x1 glimpse)", joint_fb, params["t_net0"])

    # --- classifier + BCE fwd+bwd ---
    clf = model.classifier
    pooled = jnp.asarray(rng.randn(B, 1024).astype(np.float32))

    def clf_loss(p, x, c, i):
        ctx = Ctx(train=True, rng=jax.random.fold_in(key, i))
        from vqatpu.ops import bce_with_logits_sum
        logits = clf.apply(p, x + c, ctx)
        return bce_with_logits_sum(logits, target) / B

    def clf_fb(c, i, p):
        l, g = jax.value_and_grad(clf_loss, argnums=(0, 1))(
            p, pooled, c * 1e-20, i)
        return l * 1e-6 + _gsum(g)

    if want("clf"):
        timed("classifier+BCE fwd+bwd", clf_fb, params["classifier"])

    # --- dropout mask generation alone (all big masks of one step) ---
    def rng_cost(c, i, _):
        k = jax.random.fold_in(key, i)
        tot = c * 1e-20
        # 3x v-sized masks (t_att + 2 glimpses) + rank-proj + q/a masks
        for j, shape in enumerate([(B, V, 2048)] * 3 + [(B, V, 512)]
                                  + [(B, Q, 1024)] * 3 + [(B, A, 1024)] * 3
                                  + [(B, 2048)]):
            m = jax.random.bernoulli(jax.random.fold_in(k, j), 0.5, shape)
            tot = tot + m.sum(dtype=jnp.float32) * 1e-9
        return tot

    if want("rng"):
        timed("dropout mask RNG (all step masks)", rng_cost, 0)

    def rng_cost_rbg(c, i, _):
        from vqatpu.ops.module import fast_rng
        k = fast_rng(jax.random.fold_in(key, i))
        tot = c * 1e-20
        for j, shape in enumerate([(B, V, 2048)] * 3 + [(B, V, 512)]
                                  + [(B, Q, 1024)] * 3 + [(B, A, 1024)] * 3
                                  + [(B, 2048)]):
            m = jax.random.bernoulli(jax.random.fold_in(k, j), 0.5, shape)
            tot = tot + m.sum(dtype=jnp.float32) * 1e-9
        return tot

    if want("rngfast"):
        timed("dropout mask RNG via rbg", rng_cost_rbg, 0)

    # --- adamax update alone ---
    tx_state = make_train_state(model, jax.random.PRNGKey(0))
    from vqatpu.train.optim import clip_flat_grads
    from vqatpu.train.steps import _frozen_mask_fn, make_optimizer
    tx = make_optimizer(_frozen_mask_fn(model, False))
    grads = jax.tree.map(lambda x: x * 1e-3, params)

    def adamax_step(c, i, p, os, g):
        g2 = jax.tree.map(lambda x: x + c * 1e-20, g)
        g2, norm = clip_flat_grads(g2, 0.25)
        updates, _ = tx.update(g2, os, p)
        return norm * 1e-6 + _gsum(updates)

    if want("adamax"):
        timed("clip+adamax update alone", adamax_step, params,
              tx_state.opt_state, grads)


if __name__ == "__main__":
    main()
