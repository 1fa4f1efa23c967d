"""Optimizer-row discrepancy closure (VERDICT r4 #4).

Three sessions measured clip+Adamax differently: 1.82 ms (r2, profile_cti
``adamax`` stage — UNdonated), 3.39 ms (r4 roofline — donated), 2.05 ms
(r4-late — donated).  This script interleaves all the candidate mechanisms
in ONE session so the spread is attributable:

a. ``undonated``  — profile_cti's method: inputs stay live, XLA writes
   fresh p/m/u buffers (extra allocation, no in-place update).
b. ``donated``    — the roofline's method and the REAL train-step regime
   (donate_argnums on state).
c. ``normfree``   — donated, with the global-norm pass DELETED: the clip
   coef is computed from per-leaf squared sums supplied as tiny inputs
   (standing in for a backward-fused norm).  (c) vs (b) is the exact
   headroom of the verdict's "fuse the norm pass into the backward" idea:
   one full 233 MB grad-tree read, ~0.28 ms at 819 GB/s.

Math note: (c) is bit-identical to (b) — coef = min(clip/(norm+1e-6), 1)
with norm = sqrt(sum of the same per-leaf f32 partial sums, summed in the
same leaf order).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_optim_donate.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig
from vqatpu.models import build_model
from vqatpu.train.optim import clip_flat_grads
from vqatpu.train.steps import _frozen_mask_fn, make_optimizer, make_train_state


def main():
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    model = build_model(cfg)
    tx = make_optimizer(_frozen_mask_fn(model, False))
    state0 = make_train_state(model, jax.random.PRNGKey(0))
    params0 = jax.tree.map(np.asarray, state0.params)
    opt0 = jax.tree.map(np.asarray, state0.opt_state)
    grads = jax.tree.map(lambda x: jnp.asarray(np.asarray(x) * 1e-3),
                         state0.params)

    import optax

    def opt_undonated(p, os, g, c):
        g = jax.tree.map(lambda x: x + c * 1e-30, g)
        g, norm = clip_flat_grads(g, 0.25)
        updates, new_os = tx.update(g, os, p)
        p = optax.apply_updates(p, updates)
        return p, new_os, norm

    def opt_donated(p, os, g, c):
        return opt_undonated(p, os, g, c)

    def opt_normfree(p, os, g, sq, c):
        # norm from pre-supplied per-leaf squared sums (tiny vector) — the
        # 233 MB norm-pass read of g never happens here
        g = jax.tree.map(lambda x: x + c * 1e-30, g)
        norm = jnp.sqrt(sq.sum())
        coef = jnp.minimum(0.25 / (norm + 1e-6), 1.0)
        g = jax.tree.map(lambda x: x * coef, g)
        updates, new_os = tx.update(g, os, p)
        p = optax.apply_updates(p, updates)
        return p, new_os, norm

    sq = jnp.asarray(np.asarray(
        [float(np.square(np.asarray(x)).sum()) for x in
         jax.tree.leaves(grads)], np.float32))

    j_un = jax.jit(opt_undonated)
    j_do = jax.jit(opt_donated, donate_argnums=(0, 1))
    j_nf = jax.jit(opt_normfree, donate_argnums=(0, 1))

    def fresh():
        return (jax.tree.map(jnp.asarray, params0),
                jax.tree.map(jnp.asarray, opt0))

    # numerics: donated vs normfree must match bit-for-bit-ish
    p1, o1 = fresh()
    p1, o1, n1 = j_do(p1, o1, grads, jnp.float32(0.0))
    p2, o2 = fresh()
    p2, o2, n2 = j_nf(p2, o2, grads, sq, jnp.float32(0.0))
    d = max(float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)))
    print(f"norm {float(n1):.6f} vs {float(n2):.6f}; param maxdiff {d:.3e}")
    assert abs(float(n1) - float(n2)) < 1e-3 * max(1.0, float(n1))
    assert d < 1e-6

    iters = 30

    def run_un():
        p, os = fresh()
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            p2, os2, norm = j_un(p, os, grads, c)
            c = norm * 1e-9
        float(np.asarray(c))
        return (time.perf_counter() - t0) / iters

    def run_do(fn, *extra):
        p, os = fresh()
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            p, os, norm = fn(p, os, grads, *extra, c)
            c = norm * 1e-9
        float(np.asarray(c))
        return (time.perf_counter() - t0) / iters

    run_un()
    run_do(j_do)
    run_do(j_nf, sq)
    for rep in range(4):
        a = run_un()
        b = run_do(j_do)
        c = run_do(j_nf, sq)
        print(f"rep{rep}: undonated {a * 1e3:6.3f} ms   donated "
              f"{b * 1e3:6.3f} ms   normfree {c * 1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
