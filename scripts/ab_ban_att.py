"""Interleaved A/B: BAN's BiAttention logits chain (k=3, d=3072).

Current: one 3-operand einsum 'bqd,gd,bvd->bgqv' (XLA chooses the
factorization).  Candidate: explicit (q*h) [B,G,Q,D] Hadamard then a
dot_general against v_ — forces the small-side-first factorization and a
V-minor output, mirroring the r2 lane-efficiency treatment of the CTI
chain.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_ban_att.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.ops.bilinear import BCNet
from vqatpu.ops.module import dropout
from vqatpu.train.steps import make_train_state, make_train_step

B, V, Q = 256, 50, 12


def dg_apply_qv(self, p, v, q, ctx=None, h_mat_override=None):
    v_ = self.v_net.apply(p["v_net"], v, ctx)  # [B, V, d]
    q_ = self.q_net.apply(p["q_net"], q, ctx)  # [B, Q, d]
    h_mat = p["h_mat"] if h_mat_override is None else h_mat_override
    v_ = dropout(v_, self.dropout[1], ctx)
    h = h_mat[0, :, 0, :]  # [G, d]
    G, d = h.shape
    qh = q_[:, None, :, :] * h[None, :, None, :]           # [B, G, Q, d]
    b = q_.shape[0]
    logits = jax.lax.dot_general(
        qh.reshape(b, G * q_.shape[1], d), v_,
        (((2,), (2,)), ((0,), (0,))))                       # [B, G*Q, V]
    logits = logits.reshape(b, G, q_.shape[1], v_.shape[1])
    return logits + p["h_bias"]


def main():
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model="ban", num_hid=1024, h_mm=512, rank=32, gamma=2,
                      use_counter=True)
    tcfg = TrainConfig(update_freq=1, batch_size=B)
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "v": jnp.asarray(rng.randn(B, V, 2048).astype(np.float32)),
        "q": jnp.asarray(rng.randint(0, 20000, (B, Q)).astype(np.int32)),
        "b": jnp.asarray(np.abs(rng.randn(B, V, 6)).astype(np.float32)),
        "v_mask": jnp.asarray(np.arange(V)[None] < 44).repeat(B, 0),
        "target": jnp.asarray(rng.rand(B, 3129).astype(np.float32)),
    }
    key = jax.random.PRNGKey(1)
    orig = BCNet.apply_qv
    runners = {}
    for name, fn in (("einsum", orig), ("dg", dg_apply_qv)):
        BCNet.apply_qv = fn
        st = make_train_state(model, jax.random.PRNGKey(0))
        stp = make_train_step(model, tcfg)
        st, m = stp(st, batch, jnp.float32(1e-3), key)
        float(np.asarray(m["loss"]))
        runners[name] = [st, stp]
    BCNet.apply_qv = orig

    best = {n: float("inf") for n in runners}
    for rep in range(6):
        for name, r in runners.items():
            t0 = time.perf_counter()
            for i in range(30):
                r[0], m = r[1](r[0], batch, jnp.float32(1e-3),
                               jax.random.fold_in(key, i))
            float(np.asarray(m["loss"]))
            dt = (time.perf_counter() - t0) / 30
            best[name] = min(best[name], dt)
            print(f"rep{rep} ban_att {name:7s} {dt * 1e3:8.3f} ms", flush=True)
    print("best:", {k: round(v * 1e3, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()
