"""Bilinear connect network (BAN's core op), as fused einsums.

Reference: ``/root/reference/src/bc.py`` (BCNet).  The reference has three
forward regimes chosen by ``h_out`` vs ``c=32`` for GPU memory reasons
(``bc.py:42-68``); mathematically they all compute low-rank bilinear logits.
On TPU we express each directly as an einsum and let XLA fuse — the
"memory-efficient" vs "fast" split disappears.

Shapes: ``v [B, V, v_dim]``, ``q [B, Q, q_dim]``; hidden ``d = h_dim * k``.

- ``h_out is None``  -> joint embedding logits ``[B, 1, d]``:
  ``sum_{v,q}`` of the rank-1 outer map (``bc.py:42-47``).
- ``h_out <= 32``    -> attention logits ``[B, h_out, V, Q]`` via the
  learned ``h_mat``/``h_bias`` broadcast Hadamard (``bc.py:52-58``).
- ``h_out > 32``     -> projected logits via ``h_net`` (``bc.py:63-68``).

``apply_with_weights`` is the attention-weighted bilinear pooling
``einsum('bvd,bvq,bqd->bd')`` with k-fold sum pooling (``bc.py:70-78``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vqatpu.ops.linear import FCNet, WNLinear
from vqatpu.ops.module import Ctx, config, dropout

ATT_REGIME_MAX = 32  # reference `self.c` (bc.py:22)


@config
class BCNet:
    v_dim: int
    q_dim: int
    h_dim: int
    h_out: Optional[int]
    act: str = "ReLU"
    dropout: Tuple[float, float] = (0.2, 0.5)
    k: int = 1

    @property
    def d(self) -> int:
        return self.h_dim * self.k

    @property
    def v_net(self) -> FCNet:
        return FCNet((self.v_dim, self.d), self.act, self.dropout[0])

    @property
    def q_net(self) -> FCNet:
        return FCNet((self.q_dim, self.d), self.act, self.dropout[0])

    def init(self, key: jax.Array):
        kv, kq, kh1, kh2 = jax.random.split(key, 4)
        p = {"v_net": self.v_net.init(kv), "q_net": self.q_net.init(kq)}
        if self.h_out is None:
            pass
        elif self.h_out <= ATT_REGIME_MAX:
            # torch .normal_() => N(0, 1)
            p["h_mat"] = jax.random.normal(kh1, (1, self.h_out, 1, self.d))
            p["h_bias"] = jax.random.normal(kh2, (1, self.h_out, 1, 1))
        else:
            p["h_net"] = WNLinear(self.d, self.h_out).init(kh1)
        return p

    def apply(self, p, v, q, ctx: Optional[Ctx] = None,
              h_mat_override: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Forward logits.

        Returns ``[B, 1, d]`` when ``h_out is None`` (joint-embedding regime,
        summed over V and Q), else ``[B, h_out, V, Q]`` attention logits.

        ``h_mat_override`` lets BiAttention weight-norm the ``h_mat`` param
        externally (reference wraps BCNet in ``weight_norm(..., name='h_mat',
        dim=None)``, ``attention.py:19-20``).
        """
        v_ = self.v_net.apply(p["v_net"], v, ctx)  # [B, V, d]
        q_ = self.q_net.apply(p["q_net"], q, ctx)  # [B, Q, d]
        if self.h_out is None:
            # b x v x q x d summed over v,q -> [B, 1, d]
            d_ = jnp.einsum("bvd,bqd->bd", v_, q_)
            return d_[:, None, :]
        if self.h_out <= ATT_REGIME_MAX:
            h_mat = p["h_mat"] if h_mat_override is None else h_mat_override
            v_ = dropout(v_, self.dropout[1], ctx)
            # (v_ * h_mat) @ q_^T  ==  einsum over d with per-glimpse h_mat
            logits = jnp.einsum("bvd,gd,bqd->bgvq", v_, h_mat[0, :, 0, :], q_)
            return logits + p["h_bias"]
        v_ = dropout(v_, self.dropout[1], ctx)
        d_ = jnp.einsum("bvd,bqd->bvqd", v_, q_)
        logits = WNLinear(self.d, self.h_out).apply(p["h_net"], d_)  # [B,V,Q,h_out]
        return jnp.transpose(logits, (0, 3, 1, 2))

    def apply_qv(self, p, v, q, ctx: Optional[Ctx] = None,
                 h_mat_override: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Attention-regime logits in the V-minor [B, G, Q, V] layout (same
        values as ``apply`` transposed; V=50 minor instead of Q=12 — the
        (8,128)-tile lane-efficiency argument, see PROFILE.md)."""
        assert self.h_out is not None and self.h_out <= ATT_REGIME_MAX
        v_ = self.v_net.apply(p["v_net"], v, ctx)
        q_ = self.q_net.apply(p["q_net"], q, ctx)
        h_mat = p["h_mat"] if h_mat_override is None else h_mat_override
        v_ = dropout(v_, self.dropout[1], ctx)
        logits = jnp.einsum("bqd,gd,bvd->bgqv", q_, h_mat[0, :, 0, :], v_)
        return logits + p["h_bias"]  # [1, G, 1, 1] broadcasts

    def apply_with_weights_qv(self, p, v, q, w_qv,
                              ctx: Optional[Ctx] = None) -> jnp.ndarray:
        """As :meth:`apply_with_weights` with ``w_qv`` [B, Q, V] (one glimpse
        of the V-minor layout): the pool's w-read keeps a 50-wide minor."""
        v_ = self.v_net.apply(p["v_net"], v, ctx)  # [B, V, d]
        q_ = self.q_net.apply(p["q_net"], q, ctx)  # [B, Q, d]
        wv = jax.lax.dot_general(w_qv, v_, (((2,), (1,)), ((0,), (0,))))
        logits = (wv * q_).sum(axis=1)  # [B, d]
        if self.k > 1:
            logits = logits.reshape(logits.shape[0], self.h_dim, self.k).sum(-1)
        return logits

    def apply_with_weights(self, p, v, q, w, ctx: Optional[Ctx] = None) -> jnp.ndarray:
        """``v^T · w · q`` bilinear pooling (``bc.py:70-78``).

        ``w``: [B, V, Q] attention map. Returns [B, h_dim]; when k > 1, sums
        every k consecutive channels (AvgPool1d(k)*k == grouped sum-pool).
        """
        v_ = self.v_net.apply(p["v_net"], v, ctx)  # [B, V, d]
        q_ = self.q_net.apply(p["q_net"], q, ctx)  # [B, Q, d]
        logits = jnp.einsum("bvd,bvq,bqd->bd", v_, w, q_)
        if self.k > 1:
            logits = logits.reshape(logits.shape[0], self.h_dim, self.k).sum(-1)
        return logits
