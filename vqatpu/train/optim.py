"""Optimizer stack: torch-semantics Adamax, flat-grad global-norm clip, and
the reference's epoch-level LR schedule.

Reference parity targets:
- ``torch.optim.Adamax`` (used at ``FFOE/train.py:34-35``): eps is added
  *inside* the infinity-norm max (``u = max(b2*u, |g| + eps)``), unlike
  optax's adamax which adds eps in the denominator — so we implement it.
- ``utils.clip_grad_norm_`` (``utils.py:323-328``): clip applied to the
  *concatenated* gradient vector with ``coef = max_norm / (norm + 1e-6)``.
- LR schedule (``FFOE/train.py:26-31,62-69``): warmup factors
  [0.5, 1, 1.5, 2]x on epochs 0-3, then x0.25 decay at epochs 10, 12, ...
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from vqatpu.config import TrainConfig


class AdamaxState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates
    u: optax.Updates


def adamax(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
           state_dtype=None) -> optax.GradientTransformation:
    """torch.optim.Adamax semantics. Produces the *delta* ``m_hat / u``; the
    learning rate is applied by a chained ``optax.scale`` (see
    :func:`adamax_with_lr`).

    ``state_dtype``: storage dtype for the m/u moments (e.g.
    ``jnp.bfloat16`` halves the optimizer's HBM traffic, which is the
    measured Adamax floor — PROFILE.md).  The update math always runs in
    the gradient dtype (f32); only the carried state narrows.  Default
    ``None`` stores at param precision — exact torch parity."""

    def _z(p):
        return jnp.zeros_like(p, dtype=state_dtype or p.dtype)

    def init_fn(params):
        return AdamaxState(jnp.zeros([], jnp.int32),
                           jax.tree.map(_z, params),
                           jax.tree.map(_z, params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        m = jax.tree.map(
            lambda m_, g: b1 * m_.astype(g.dtype) + (1 - b1) * g,
            state.m, updates)
        u = jax.tree.map(
            lambda u_, g: jnp.maximum(b2 * u_.astype(g.dtype),
                                      jnp.abs(g) + eps),
            state.u, updates)
        bias_corr = 1.0 - b1 ** count.astype(jnp.float32)
        out = jax.tree.map(lambda m_, u_: m_ / (u_ * bias_corr), m, u)
        if state_dtype is not None:
            m = jax.tree.map(lambda x: x.astype(state_dtype), m)
            u = jax.tree.map(lambda x: x.astype(state_dtype), u)
        return out, AdamaxState(count, m, u)

    return optax.GradientTransformation(init_fn, update_fn)


def adamax_with_lr(trainable=None, state_dtype=None) -> optax.GradientTransformation:
    """Adamax whose per-step LR arrives via ``optax.inject_hyperparams`` —
    the epoch schedule is driven from the host loop like the reference.

    ``trainable``: optional params->bool-pytree fn; frozen leaves get no
    m/u state (``optax.masked``).  Their updates pass through unscaled by
    Adamax, so callers must zero frozen grads (the train step does)."""
    inner = (adamax(state_dtype=state_dtype) if trainable is None
             else optax.masked(adamax(state_dtype=state_dtype), trainable))
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            inner, optax.scale_by_learning_rate(learning_rate)
        )
    )(learning_rate=1e-3)


def global_grad_norm(grads) -> jnp.ndarray:
    leaves = jax.tree.leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))


def clip_flat_grads(grads, max_norm: float) -> Tuple[optax.Updates, jnp.ndarray]:
    """Reference ``clip_grad_norm_``: scale all grads by
    ``max_norm / (norm + 1e-6)`` when norm exceeds ``max_norm``.
    Returns (clipped grads, pre-clip norm)."""
    norm = global_grad_norm(grads)
    coef = jnp.minimum(max_norm / (norm + 1e-6), 1.0)
    return jax.tree.map(lambda g: g * coef, grads), norm


def lr_for_epoch(cfg: TrainConfig, epoch: int) -> float:
    """Pure epoch->lr function reproducing the warmup/decay state machine."""
    warm = cfg.warmup_factors
    if epoch < len(warm):
        return cfg.lr * warm[epoch]
    lr = cfg.lr * warm[-1]
    # decay epochs: range(start, end, step) as in FFOE/train.py:29
    for e in range(cfg.lr_decay_start, cfg.lr_decay_end, cfg.lr_decay_step):
        if e <= epoch:
            lr *= cfg.lr_decay_rate
    return lr
