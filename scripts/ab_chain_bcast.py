"""A/B: the PARALIND chain's step-2 relayout vs a broadcast-batched variant.

The production chain (kernels.attention_logits_gqav) pays two big relayouts:
[R,B,A,Y,XG] -> [R,B,Y,A,XG] (12.6M elems, 32-wide minor = 25% lanes) before
the q-contraction, and the 9.4M-elem transpose before the v-GEMM.  Variant
``gqav2`` removes the FIRST one entirely: step 2 contracts Y batched over
(R*B*A) — ``ta`` arrives by pure reshape (no copy), and q is broadcast
across the A axis (4.7M operand elems, and XLA may fuse the broadcast into
the batched-GEMM operand feed, making it free).  Same math, same outputs.

Timing: fwd+bwd wrt ALL inputs (v_r, q_r, a_r, T) with every grad leaf
consumed (PROFILE.md: summing one leaf lets XLA DCE backward branches),
value-readback barriers, interleaved reps (tunnel drifts +-2 ms).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_chain_bcast.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.kernels.trilinear import attention_logits_gqav, masked_softmax_gqav

B, V, Q, A, R, X, G = 256, 50, 12, 3, 32, 16, 2


def attention_logits_gqav2(v_r, q_r, a_r, T):
    """gqav with step 2 batched over (R,B,A): no ta relayout, q broadcast."""
    B, V, R, X = v_r.shape
    Q = q_r.shape[1]
    A = a_r.shape[1]
    Z, Y, G = T.shape[3], T.shape[2], T.shape[4]
    a2 = jnp.transpose(a_r, (2, 0, 1, 3)).reshape(R, B * A, Z)
    T2 = jnp.transpose(T, (0, 3, 2, 1, 4)).reshape(R, Z, Y * X * G)
    ta = jax.lax.dot_general(a2, T2, (((2,), (1,)), ((0,), (0,))))
    ta = ta.reshape(R * B * A, Y, X * G)  # pure reshape — no copy
    q3 = jnp.transpose(q_r, (2, 0, 1, 3))  # [R, B, Q, Y]
    q3 = jnp.broadcast_to(q3[:, :, None], (R, B, A, Q, Y)).reshape(
        R * B * A, Q, Y)
    tqa = jax.lax.dot_general(q3, ta, (((2,), (1,)), ((0,), (0,))))
    tqa = tqa.reshape(R, B, A, Q, X, G)
    tqa = jnp.transpose(tqa, (1, 0, 4, 3, 2, 5)).reshape(B, R * X, Q * A * G)
    v2 = v_r.reshape(B, V, R * X)
    out = jax.lax.dot_general(tqa, v2, (((1,), (2,)), ((0,), (0,))))
    return jnp.transpose(out.reshape(B, Q, A, G, V), (0, 3, 1, 2, 4))


def main():
    rng = np.random.RandomState(0)
    v_r = jnp.asarray(rng.randn(B, V, R, X).astype(np.float32) * 0.1)
    q_r = jnp.asarray(rng.randn(B, Q, R, X).astype(np.float32) * 0.1)
    a_r = jnp.asarray(rng.randn(B, A, R, X).astype(np.float32) * 0.1)
    T = jnp.asarray(rng.randn(R, X, X, X, G).astype(np.float32) * 0.05)
    v_mask = jnp.asarray(np.arange(V)[None] < 44).repeat(B, 0)
    probe = jnp.asarray(rng.randn(B, G, Q, A, V).astype(np.float32))

    def make_loss(logits_fn):
        def loss(v_r, q_r, a_r, T):
            att = masked_softmax_gqav(logits_fn(v_r, q_r, a_r, T), v_mask)
            return (att * probe).sum()
        return loss

    # numerics: outputs and all four grads must agree
    ga = jax.jit(jax.grad(make_loss(attention_logits_gqav), argnums=(0, 1, 2, 3)))
    gb = jax.jit(jax.grad(make_loss(attention_logits_gqav2), argnums=(0, 1, 2, 3)))
    out_a = ga(v_r, q_r, a_r, T)
    out_b = gb(v_r, q_r, a_r, T)
    for name, xa, xb in zip("vqaT", out_a, out_b):
        d = float(jnp.max(jnp.abs(xa - xb)))
        s = float(jnp.max(jnp.abs(xa)))
        print(f"grad d{name}: maxdiff {d:.3e} (scale {s:.3e})")
        assert d <= 1e-4 * max(s, 1.0), name

    def make_step(logits_fn):
        loss = make_loss(logits_fn)

        @jax.jit
        def step(carry, v_r, q_r, a_r, T):
            g = jax.grad(loss, argnums=(0, 1, 2, 3))(
                v_r + carry * 1e-30, q_r, a_r, T)
            return sum(x.sum() for x in g) * 1e-20
        return step

    step_a = make_step(attention_logits_gqav)
    step_b = make_step(attention_logits_gqav2)

    def run(step, iters=30):
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step(carry, v_r, q_r, a_r, T)
        float(np.asarray(carry))
        return (time.perf_counter() - t0) / iters

    run(step_a, iters=1)
    run(step_b, iters=1)
    for rep in range(4):
        dt_a = run(step_a)
        dt_b = run(step_b)
        print(f"rep{rep}: gqav {dt_a * 1e3:7.3f} ms   "
              f"gqav2 {dt_b * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
