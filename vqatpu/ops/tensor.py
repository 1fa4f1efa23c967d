"""N-mode tensor-matrix products (reference ``src/Tensor.py``).

The reference implements mode products with reshape/transpose/matmul chains
(``Tensor.py:3-28``); on TPU each mode product is a single einsum that XLA
maps onto the MXU directly.  ``mode_product`` reproduces
``ModeProduct(tensor, m1, m2, m3, m4, n_way)``: contraction of a core
tensor's modes 1..n_way with per-batch factor matrices.

Core: ``[1, d1, d2, d3, d4]`` (trailing modes beyond ``n_way`` pass
through).  Factors: ``m_k [B, n_k, d_k]``.  Output:
``[B, n_1, n_2, n_3, d4]`` for ``n_way=3``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def mode_product(core: jnp.ndarray,
                 m1: jnp.ndarray,
                 m2: Optional[jnp.ndarray] = None,
                 m3: Optional[jnp.ndarray] = None,
                 m4: Optional[jnp.ndarray] = None,
                 n_way: int = 3) -> jnp.ndarray:
    """Sequential mode-1..n products of ``core`` with factor matrices."""
    out = jnp.einsum("bix,oxyzw->biyzw", m1, core)
    if n_way >= 2 and m2 is not None:
        out = jnp.einsum("bjy,biyzw->bijzw", m2, out)
    if n_way >= 3 and m3 is not None:
        out = jnp.einsum("blz,bijzw->bijlw", m3, out)
    if n_way >= 4 and m4 is not None:
        out = jnp.einsum("bmw,bijlw->bijlm", m4, out)
    return out
