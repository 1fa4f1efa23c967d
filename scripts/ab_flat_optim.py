"""A/B: clip+Adamax update on the real CTI param PYTREE (67 leaves) vs the
IDENTICAL math on ONE flat f32 buffer of the same total size.

Motivation (PROFILE.md roofline): the donated clip+Adamax stage measures
2.5-3.4 ms against a ~1.9 ms HBM floor.  The candidate explanation for the
gap is per-leaf kernel/fusion overhead: 67 leaves (40 of them < 10k params,
together only 124 KB) turn the update into ~200 small fusions plus a
67-way reduce for the global norm, each with fixed dispatch cost.  A flat
buffer runs the same bytes through ~5 fusions.  If B wins materially, a
flat-parameter train-state variant is worth building; if not, the pytree
update is already at its floor and the roofline gap is elsewhere.

Method: interleaved A/B windows (tunnel drifts +-2 ms on minute scales —
CLAUDE.md), value-readback barriers, a scalar carry threaded through every
iteration so step i+1 cannot overtake step i.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_flat_optim.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig
from vqatpu.models import build_model

B1, B2, EPS, CLIP = 0.9, 0.999, 1e-8, 0.25


def adamax_update(params, m, u, grads, lr, carry):
    """torch-Adamax + reference flat-grad clip, pytree form (the same math
    as train/optim.py's adamax + clip_flat_grads, bias_corr folded to 1 so
    both variants run the identical per-element op count)."""
    grads = jax.tree.map(lambda g: g + carry * 1e-30, grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads)))
    coef = jnp.minimum(CLIP / (norm + 1e-6), 1.0)
    grads = jax.tree.map(lambda g: g * coef, grads)
    m = jax.tree.map(lambda m_, g: B1 * m_ + (1 - B1) * g, m, grads)
    u = jax.tree.map(lambda u_, g: jnp.maximum(B2 * u_, jnp.abs(g) + EPS),
                     u, grads)
    params = jax.tree.map(lambda p, m_, u_: p - lr * m_ / u_, params, m, u)
    return params, m, u, norm


def main():
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model="cti", num_hid=1024, h_mm=512, rank=32, gamma=2)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    n_leaves = len(jax.tree.leaves(params))
    total = sum(x.size for x in jax.tree.leaves(params))
    print(f"leaves={n_leaves} total_params={total}")

    key = jax.random.PRNGKey(1)
    grads = jax.tree.map(
        lambda p: jax.random.normal(jax.random.fold_in(key, p.size), p.shape,
                                    p.dtype) * 1e-3, params)
    m = jax.tree.map(jnp.zeros_like, params)
    u = jax.tree.map(lambda p: jnp.full_like(p, 1e-3), params)

    from jax.flatten_util import ravel_pytree
    p_flat, _ = ravel_pytree(params)
    g_flat, _ = ravel_pytree(grads)
    m_flat = jnp.zeros_like(p_flat)
    u_flat = jnp.full_like(p_flat, 1e-3)

    @jax.jit
    def step_tree(params, m, u, grads, lr, carry):
        params, m, u, norm = adamax_update(params, m, u, grads, lr, carry)
        return params, m, u, norm

    @jax.jit
    def step_flat(p, m, u, g, lr, carry):
        p, m, u, norm = adamax_update(p, m, u, g, lr, carry)
        return p, m, u, norm

    lr = jnp.float32(1e-3)

    def run(step, params, m, u, grads, iters=30):
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            params, m, u, carry = step(params, m, u, grads, lr, carry)
        float(np.asarray(carry))  # honest barrier: readback
        return (time.perf_counter() - t0) / iters, params, m, u

    # compile both before any timing
    _ = run(step_tree, params, m, u, grads, iters=1)
    _ = run(step_flat, p_flat, m_flat, u_flat, g_flat, iters=1)

    for rep in range(4):
        dt_a, params, m, u = run(step_tree, params, m, u, grads)
        dt_b, p_flat, m_flat, u_flat = run(step_flat, p_flat, m_flat,
                                           u_flat, g_flat)
        print(f"rep{rep}: pytree {dt_a * 1e3:7.3f} ms   "
              f"flat {dt_b * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
