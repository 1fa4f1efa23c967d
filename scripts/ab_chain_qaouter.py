"""A/B: the PARALIND chain vs a restructured decomposition that MERGES the
(y, z) factor dims — the algebraic lever NEXT.md #6 / VERDICT r4 #8 asks
to be tested.

The structural floor argument says any two-stage contraction of the
trilinear form must carry the rank index in its intermediate, making the
inner GEMMs (r·b)-batched and tiny ([12,16]x[16,96] — 8192 issues/step).
Variant ``qaouter`` restructures the algebra instead of the layout: it
materializes the q⊗a outer product over the COMBINED (y·z)=256 contraction
dim, so the whole q/a side collapses into ONE well-shaped batched GEMM

    qa [R, B·Q·A, 256] x T' [R, 256, X·G]   (M=9216, K=256, N=32, 32 batches)

deleting the 8192 tiny-GEMM stage and its two relayouts entirely.  Same
math bit-for-bit modulo f32 reassociation (grads asserted <=1e-4 rel).
The price is the qa tensor itself: 75.5M elems (302 MB f32) written+read
in forward and touched again in backward — the experiment decides whether
deleting the tiny-GEMM issue cost pays for ~1 GB of extra HBM traffic.

Timing discipline: fwd+bwd wrt ALL inputs, every grad leaf consumed,
value-readback barriers, interleaved reps (tunnel drifts +-2 ms).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_chain_qaouter.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.kernels.trilinear import attention_logits_gqav, masked_softmax_gqav

B, V, Q, A, R, X, G = 256, 50, 12, 3, 32, 16, 2


def attention_logits_qaouter(v_r, q_r, a_r, T):
    """gqav output layout, (y·z)-merged contraction via the q⊗a outer
    product: logits = (qa ×_{yz} T) ×_{rx} v."""
    B, V, R, X = v_r.shape
    Q = q_r.shape[1]
    A = a_r.shape[1]
    Z, Y, G = T.shape[3], T.shape[2], T.shape[4]
    q2 = jnp.transpose(q_r, (2, 0, 1, 3))  # [R, B, Q, Y]
    a2 = jnp.transpose(a_r, (2, 0, 1, 3))  # [R, B, A, Z]
    qa = (q2[:, :, :, None, :, None]
          * a2[:, :, None, :, None, :])    # [R, B, Q, A, Y, Z]
    qa = qa.reshape(R, B * Q * A, Y * Z)
    T2 = jnp.transpose(T, (0, 2, 3, 1, 4)).reshape(R, Y * Z, X * G)
    tqa = jax.lax.dot_general(qa, T2, (((2,), (1,)), ((0,), (0,))))
    tqa = tqa.reshape(R, B, Q, A, X, G)
    tqa = jnp.transpose(tqa, (1, 0, 4, 2, 3, 5)).reshape(B, R * X, Q * A * G)
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

    ga = jax.jit(jax.grad(make_loss(attention_logits_gqav), argnums=(0, 1, 2, 3)))
    gb = jax.jit(jax.grad(make_loss(attention_logits_qaouter), argnums=(0, 1, 2, 3)))
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
    step_b = make_step(attention_logits_qaouter)

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
              f"qaouter {dt_b * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
