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


def paralind_core_unscramble(core):
    """Reference->clean layout for a PARALIND core tensor ``[..., x, y, z, g]``.

    The reference's ``ModeProduct`` is NOT the mathematical mode product of
    the stored ``T_g``: its mode-1 step flattens the non-contracted block in
    ``(z, y, g)`` order but *splits it back* as ``(g, z, y)``
    (``Tensor.py:6-9``: ``transpose(3,2).view(.., y*z*g)`` then
    ``view(.., g, z, y).transpose(4,2)``) — a digit-regrouping element
    permutation of the core (modes 2/3 split in matching order and add no
    further scramble).  Net effect, verified numerically against the
    reference for several shapes:

        ModeProduct(T, v, q, a)  ==  einsum('xyzg,bvx,bqy,baz->bvqag',
                                            paralind_core_unscramble(T), ...)

    vqatpu stores the core in the CLEAN parameterization (the einsum is the
    MXU-friendly form); this permutation is applied only at the torch
    checkpoint boundary (import applies it, export applies the inverse).
    Trajectories map exactly through it: an element bijection commutes with
    elementwise Adamax and leaves global grad norms unchanged.  Identity
    when ``g == 1``.  Only defined for trailing ``h_out == 1`` — ModeProduct
    itself errors otherwise (its first view folds a 6-d core into 5-d).

    Works on numpy or jnp arrays; leading (e.g. rank) axes pass through.
    """
    *lead, x, y, z, g = core.shape
    t = core.swapaxes(-3, -2)  # (..., x, z, y, g): ModeProduct's transpose(3,2)
    t = t.reshape(*lead, x, g, z, y)  # the mismatched view split (Tensor.py:9)
    return t.swapaxes(-1, -3)  # back to (..., x, y, z, g) axis labels


def paralind_core_scramble(core):
    """Inverse of :func:`paralind_core_unscramble` (clean -> reference)."""
    *lead, x, y, z, g = core.shape
    t = core.swapaxes(-1, -3)  # (..., x, g, z, y)
    t = t.reshape(*lead, x, z, y, g)  # re-flatten in the reference's order
    return t.swapaxes(-3, -2)  # (..., x, y, z, g) stored layout


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
