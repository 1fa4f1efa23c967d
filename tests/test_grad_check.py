"""Gradient-correctness check for softmax attention (the analogue of the
reference's only numerical verification artifact, ``tools/grad_check.py``):
JAX autograd vs the closed linear-algebra form ``V (diag(p) - p p^T) V^T q``.
"""

import numpy as np

import jax
import jax.numpy as jnp


def attention_output(q, V):
    """q [D], V [N, D]: softmax-attended value readout (grad_check.py:8-20)."""
    scores = V @ q                      # [N]
    p = jax.nn.softmax(scores)
    v_bar = p @ V                       # [D]
    return jnp.dot(q, v_bar)


def test_autograd_matches_closed_form(rng):
    q = jnp.asarray(rng.randn(5).astype(np.float32))
    V = jnp.asarray(rng.randn(7, 5).astype(np.float32))

    dq_auto = jax.grad(attention_output, argnums=0)(q, V)

    # closed form: d/dq [q^T softmax(Vq) V] = v_bar + V^T (diag(p) - p p^T) V q
    p = np.asarray(jax.nn.softmax(V @ q))
    Vn = np.asarray(V)
    qn = np.asarray(q)
    v_bar = p @ Vn
    J = np.diag(p) - np.outer(p, p)
    dq_closed = v_bar + Vn.T @ J @ (Vn @ qn)

    np.testing.assert_allclose(np.asarray(dq_auto), dq_closed, atol=1e-5)

    # and the explicit per-element loop form (grad_check.py:38-52)
    s = np.zeros_like(qn)
    for i in range(Vn.shape[0]):
        dp = np.zeros_like(qn)
        for j in range(Vn.shape[0]):
            if i == j:
                dp += p[i] * (1 - p[i]) * Vn[i]
            else:
                dp -= p[i] * p[j] * Vn[j]
        s += dp * float(Vn[i] @ qn)
    np.testing.assert_allclose(dq_closed, v_bar + s, atol=1e-5)
