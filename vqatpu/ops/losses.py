"""Loss functions.

- ``bce_with_logits_sum``: ``nn.BCEWithLogitsLoss(reduction='sum')`` — the
  reference training criterion (``FFOE/train.py:40``, ``MC/train.py:35``).
- ``distillation_loss``: Hinton KD (``src/loss_function.py:20-25``):
  ``KL(log_softmax(s/T) || softmax(t/T)).sum(1).mean() * alpha * T^2
  + BCE_sum(s, target)/B * (1 - alpha)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits_sum(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable sum-reduced binary cross entropy with logits."""
    # max(x,0) - x*z + log(1 + exp(-|x|))
    per = (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return per.sum()


def distillation_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    targets: jnp.ndarray,
    T: float,
    alpha: float,
) -> jnp.ndarray:
    s = jax.nn.log_softmax(student_logits / T, axis=1)
    t = jax.nn.softmax(teacher_logits / T, axis=1)
    # KLDivLoss(log-probs, probs), reduction='none': t * (log t - s)
    log_t = jnp.where(t > 0, jnp.log(jnp.maximum(t, 1e-38)), 0.0)
    kl = (t * (log_t - s)).sum(axis=1).mean()
    bsz = student_logits.shape[0]
    bce = bce_with_logits_sum(student_logits, targets) / bsz
    return kl * (alpha * T * T) + bce * (1.0 - alpha)
