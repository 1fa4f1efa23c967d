"""Bilinear / trilinear / stacked attention with NaN-safe masked softmax.

Reference: ``/root/reference/src/attention.py``.  The reference infers box
padding from ``v.abs().sum(2) == 0`` and writes ``-inf`` into the logits
in-place before a flattened softmax.  Here masks are explicit (static-shape
friendly) but default to the same inference from ``v``; the softmax guards
the all-masked edge case (reference would NaN there).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vqatpu.ops.bilinear import BCNet
from vqatpu.ops.linear import Linear
from vqatpu.ops.module import Ctx, config, dropout
from vqatpu.ops.trilinear import TCNet

NEG_INF = float("-inf")


def box_mask_from_features(v: jnp.ndarray) -> jnp.ndarray:
    """True for *real* boxes: [B, V]. (attention.py:36 inverted)"""
    return jnp.abs(v).sum(-1) != 0


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axes) -> jnp.ndarray:
    """Softmax over (flattened) ``axes`` with False-masked entries at -inf.

    NaN-safe: fully-masked slices return zeros instead of NaN.
    """
    neg = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(neg, axis=axes, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # all-masked slice guard
    e = jnp.where(mask, jnp.exp(neg - m), 0.0)
    denom = e.sum(axis=axes, keepdims=True)
    return e / jnp.maximum(denom, 1e-30)


@config
class BiAttention:
    """BCNet(k=3, h_out=glimpse) with ``h_mat`` weight-normed (dim=None)
    externally, masked softmax over the flattened V*Q grid per glimpse
    (``attention.py:15-40``)."""

    x_dim: int
    y_dim: int
    z_dim: int
    glimpse: int
    dropout: Tuple[float, float] = (0.2, 0.5)

    @property
    def bc(self) -> BCNet:
        return BCNet(self.x_dim, self.y_dim, self.z_dim, self.glimpse,
                     dropout=self.dropout, k=3)

    def init(self, key: jax.Array):
        p_bc = self.bc.init(key)
        # weight_norm(bc, name='h_mat', dim=None): h_mat becomes g * V/||V||_F
        g = jnp.linalg.norm(p_bc["h_mat"].reshape(-1))
        return {"bc": p_bc, "h_mat_g": g}

    def apply(self, p, v, q, v_mask: Optional[jnp.ndarray] = None,
              ctx: Optional[Ctx] = None):
        """v: [B, V, x_dim], q: [B, Q, y_dim] ->
        (p_att [B, G, V, Q], masked logits [B, G, V, Q])."""
        h_v = p["bc"]["h_mat"]
        h_mat = (p["h_mat_g"] / jnp.linalg.norm(h_v.reshape(-1))) * h_v
        logits = self.bc.apply(p["bc"], v, q, ctx, h_mat_override=h_mat)
        if v_mask is None:
            v_mask = box_mask_from_features(v)
        mask4 = v_mask[:, None, :, None]  # [B,1,V,1] broadcast over G, Q
        att = masked_softmax(logits, mask4, axes=(2, 3))
        masked_logits = jnp.where(mask4, logits, NEG_INF)
        return att, masked_logits

    def apply_gqv(self, p, v, q, v_mask: Optional[jnp.ndarray] = None,
                  ctx: Optional[Ctx] = None):
        """Attention in the V-minor [B, G, Q, V] layout (values == ``apply``
        transposed; see BCNet.apply_qv / PROFILE.md).  Returns
        (att, masked logits), both [B, G, Q, V]."""
        h_v = p["bc"]["h_mat"]
        h_mat = (p["h_mat_g"] / jnp.linalg.norm(h_v.reshape(-1))) * h_v
        logits = self.bc.apply_qv(p["bc"], v, q, ctx, h_mat_override=h_mat)
        if v_mask is None:
            v_mask = box_mask_from_features(v)
        mask4 = v_mask[:, None, None, :]  # [B,1,1,V]
        att = masked_softmax(logits, mask4, axes=(2, 3))
        masked_logits = jnp.where(mask4, logits, NEG_INF)
        return att, masked_logits


@config
class TriAttention:
    """TCNet attention logits [B, V, Q, A, G] + masked softmax over V*Q*A
    (``attention.py:43-59``)."""

    v_dim: int
    q_dim: int
    a_dim: int
    h_dim: int
    h_out: int
    rank: int
    glimpse: int
    k: int
    dropout: Tuple[float, float] = (0.2, 0.5)
    backend: str = "xla"  # masked-softmax kernel: "xla" | "pallas"

    @property
    def tc(self) -> TCNet:
        return TCNet(self.v_dim, self.q_dim, self.a_dim, self.h_dim,
                     self.h_out, self.rank, self.glimpse,
                     dropout=self.dropout, k=self.k, backend=self.backend)

    def init(self, key: jax.Array):
        return {"tc": self.tc.init(key)}

    def apply(self, p, v, q, a, v_mask: Optional[jnp.ndarray] = None,
              ctx: Optional[Ctx] = None,
              v_t: Optional[jnp.ndarray] = None,
              return_logits: bool = True):
        """``return_logits=False`` lets the pallas backend run the fully
        fused rank-contraction+softmax kernel (the [B,V,Q,A,G] logits never
        reach HBM); both in-repo consumers discard the logits."""
        if v_mask is None:
            v_mask = box_mask_from_features(v)
        if self.backend == "pallas" and not return_logits:
            from vqatpu.kernels.trilinear import trilinear_attention_fused

            v_r, q_r, a_r, T = self.tc.rank_projections(p["tc"], v, q, a,
                                                        ctx, v_t=v_t)
            return trilinear_attention_fused(v_r, q_r, a_r, T, v_mask), None
        logits = self.tc.apply(p["tc"], v, q, a, ctx, v_t=v_t)  # [B,V,Q,A,G]
        mask5 = v_mask[:, :, None, None, None]
        if self.backend == "pallas":
            from vqatpu.kernels.trilinear import _masked_softmax_pallas_vjp
            att = _masked_softmax_pallas_vjp(logits, v_mask)
        else:
            att = masked_softmax(logits, mask5, axes=(1, 2, 3))
        masked_logits = jnp.where(mask5, logits, NEG_INF)
        return att, masked_logits

    def apply_gqav(self, p, v, q, a, v_mask: Optional[jnp.ndarray] = None,
                   ctx: Optional[Ctx] = None,
                   v_t: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Attention in the V-minor [B, G, Q, A, V] layout (the fast path
        for the CTI glimpse loop — see kernels.attention_logits_gqav).
        Same values as ``apply``'s att transposed; only the memory layout
        differs."""
        from vqatpu.kernels.trilinear import (attention_logits_gqav,
                                              masked_softmax_gqav)

        if v_mask is None:
            v_mask = box_mask_from_features(v)
        v_r, q_r, a_r, T = self.tc.rank_projections(p["tc"], v, q, a, ctx,
                                                    v_t=v_t)
        return masked_softmax_gqav(attention_logits_gqav(v_r, q_r, a_r, T),
                                   v_mask)


@config
class StackedAttention:
    """Classic SAN: ``num_stacks`` rounds of tanh-add attention
    (``attention.py:62-152``)."""

    num_stacks: int
    img_feat_size: int
    ques_feat_size: int
    att_size: int
    drop_ratio: float

    def init(self, key: jax.Array):
        ks = jax.random.split(key, 5 + 3 * (self.num_stacks - 1))
        p = {
            "fc11": Linear(self.ques_feat_size, self.att_size).init(ks[0]),
            "fc12": Linear(self.img_feat_size, self.att_size, bias=False).init(ks[1]),
            "fc13": Linear(self.att_size, 1).init(ks[2]),
            "fc14": Linear(self.ques_feat_size, self.att_size).init(ks[3]),
            "fc15": Linear(self.img_feat_size, self.att_size, bias=False).init(ks[4]),
        }
        for s in range(self.num_stacks - 1):
            p[f"w{s}_q"] = Linear(self.att_size, self.att_size).init(ks[5 + 3 * s])
            p[f"w{s}_i"] = Linear(self.img_feat_size, self.att_size, bias=False).init(ks[6 + 3 * s])
            p[f"w{s}_h"] = Linear(self.att_size, 1).init(ks[7 + 3 * s])
        return p

    def _att_round(self, h_emb, img_emb_mask, axis=1):
        att = masked_softmax(h_emb, img_emb_mask, axes=(axis,))
        return att

    def apply(self, p, img_feat, ques_feat, v_mask: bool = True,
              ctx: Optional[Ctx] = None) -> jnp.ndarray:
        """img_feat [B, V, img_dim], ques_feat [B, ques_dim] -> [B, att_size].

        Lane-efficiency: the reference's per-round attention head is a
        ``Linear(att_size, 1)`` producing [B, V, 1] — a 1-lane minor that
        wastes (8,128) VMEM tiles through the softmax and the weighted sum.
        Here the head is a matvec contraction to 2-D [B, V] logits, and the
        attention-weighted image pooling is the batched matvec
        ``einsum('bv,bvd->bd')`` instead of a broadcast-multiply+reduce.
        Same math as ``attention.py:96-152``."""
        ques_emb = Linear(self.ques_feat_size, self.att_size).apply(p["fc11"], ques_feat)
        img_emb = Linear(self.img_feat_size, self.att_size, bias=False).apply(p["fc12"], img_feat)

        def head(lin_p, h):
            # Linear(att,1) -> [B, V] logits directly
            return jnp.einsum("bvd,d->bv", h, lin_p["w"][0]) + lin_p["b"][0]

        h1 = jnp.tanh(ques_emb[:, None, :] + img_emb)
        l1 = head(p["fc13"], dropout(h1, self.drop_ratio, ctx))
        # reference masks on img_emb rows being exactly zero (attention.py:106)
        mask = ((jnp.abs(img_emb).sum(-1) != 0) if v_mask
                else jnp.ones_like(l1, bool))
        p1 = masked_softmax(l1, mask, axes=(1,))

        ques_emb_1 = Linear(self.ques_feat_size, self.att_size).apply(p["fc14"], ques_feat)
        img_emb_1 = Linear(self.img_feat_size, self.att_size, bias=False).apply(p["fc15"], img_feat)
        u = ques_emb_1 + jnp.einsum("bv,bvd->bd", p1, img_emb_1)

        for s in range(self.num_stacks - 1):
            q_s = Linear(self.att_size, self.att_size).apply(p[f"w{s}_q"], u)
            i_s = Linear(self.img_feat_size, self.att_size, bias=False).apply(p[f"w{s}_i"], img_feat)
            h_s = jnp.tanh(q_s[:, None, :] + i_s)
            l_s = head(p[f"w{s}_h"], dropout(h_s, self.drop_ratio, ctx))
            mask_s = ((jnp.abs(i_s).sum(-1) != 0) if v_mask
                      else jnp.ones_like(l_s, bool))
            p_s = masked_softmax(l_s, mask_s, axes=(1,))
            u = u + jnp.einsum("bv,bvd->bd", p_s, i_s)
        return u
