"""Compact Trilinear interaction (the paper's core op) as chained einsums.

Reference: ``/root/reference/src/tc.py`` (TCNet) + ``src/Tensor.py``
(ModeProduct).  The PARALIND decomposition there runs a Python loop over 32
ranks, each doing 3 FCNets and a transpose-heavy ModeProduct.  TPU-first we:

- run all per-rank projection nets as ONE batched matmul each
  (``[rank*h_sub, h_dim]`` stacked weights -> a single MXU-friendly GEMM),
- contract the core tensor with sequential mode-product einsums that XLA
  fuses, summing ranks inside the contraction (no rank-expanded
  intermediates materialize in HBM).

Math (attention regime, ``h_out == 1``): logits[b,i,j,l,g]
  = sum_r sum_{xyz} v_r[b,i,x] q_r[b,j,y] a_r[b,l,z] T[r,x,y,z,g]

``apply_with_weights`` is the fused joint embedding
``einsum('bdv,bvqa,bdq,bda->bd')`` (``tc.py:54-61``).

Construction notes mirrored from the reference:
- ``self.h_dim = h_dim * k`` but sub-rank dims use the *pre-k* ``h_dim/rank``
  (``tc.py:18-21``).
- The rank nets + core tensor exist only when ``h_dim*k < 1024``
  (``tc.py:27``) — the CTI ``t_net`` (k=2) therefore has only tucker
  projections and is used exclusively via ``apply_with_weights``.
- ``h_out > 1`` divides the output dim across ranks (``tc.py:33-35``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vqatpu.ops.linear import FCNet
from vqatpu.ops.module import Ctx, config

RANK_NET_GATE = 1024  # reference `if self.h_dim < 1024` (tc.py:27)


def fused_tucker_projection(nets, x, rate: float, act: str, ctx):
    """Run several single-layer weight-norm tucker FCNets over the SAME
    input as ONE GEMM.

    ``nets`` is a list of FCNet param trees (each ``{"l0": {"v","g","b"}}``
    with identical in_dim / activation / dropout rate).  The input is read
    from HBM once and one dropout mask is drawn instead of len(nets)
    independent ones (see ModelConfig.fused_v_tucker for the semantics
    note).  Returns the per-net outputs, split back out.

    Reference shape: each net is a ``tc.py:22-25`` tucker FCNet; in CTI the
    v-side ones all consume the [B, V, 2048] features, so the naive path
    costs 3x the HBM reads and 3x the mask RNG of this fused one.
    """
    from vqatpu.ops.activation import get_activation
    from vqatpu.ops.module import dropout as _dropout

    ls = [n["l0"] for n in nets]
    # per-net weight-norm scalars applied to the fused GEMM's output blocks
    # (epilogue-fused; no scaled-weight materialization)
    scale = jnp.concatenate([
        jnp.broadcast_to(l["g"] / jnp.linalg.norm(l["v"].reshape(-1)),
                         (l["v"].shape[0],)) for l in ls])
    w_all = jnp.concatenate([l["v"] for l in ls], axis=0)  # [sum(d_i), in]
    b_all = jnp.concatenate([l["b"] for l in ls])
    xd = _dropout(x, rate, ctx)
    out = get_activation(act)((xd @ w_all.T) * scale + b_all)
    sizes = [l["v"].shape[0] for l in ls]
    offs = [0]
    for s in sizes:
        offs.append(offs[-1] + s)
    return [out[..., offs[i]:offs[i + 1]] for i in range(len(sizes))]


@config
class TCNet:
    v_dim: int
    q_dim: int
    a_dim: int
    h_dim: int
    h_out: int
    rank: int
    glimpse: int
    act: str = "ReLU"
    dropout: Tuple[float, float] = (0.2, 0.5)
    k: int = 1
    # The reference gates rank-net construction on the literal `h_dim*k <
    # 1024` (tc.py:27), which happens to disable them exactly for the CTI
    # joint-embedding t_net (k=2, h_mm=512). `joint_only=True` states that
    # intent explicitly so small test configs don't allocate dead params.
    joint_only: bool = False
    # "xla" or "pallas" — selects the fused-kernel path for the rank
    # contraction softmax / weighted pooling (vqatpu.kernels.trilinear).
    backend: str = "xla"

    @property
    def d(self) -> int:
        return self.h_dim * self.k

    @property
    def h_sub(self) -> int:
        return self.h_dim // self.rank

    @property
    def has_rank_nets(self) -> bool:
        return (not self.joint_only) and self.d < RANK_NET_GATE

    @property
    def ho_dim(self) -> int:
        if self.h_out > 1:
            return self.h_out // self.rank
        return self.h_out

    def _tucker(self, in_dim: int, drop: float) -> FCNet:
        return FCNet((in_dim, self.d), self.act, drop)

    def _rank_net(self, drop: float) -> FCNet:
        return FCNet((self.d, self.h_sub), self.act, drop)

    def init(self, key: jax.Array):
        keys = jax.random.split(key, 8)
        p = {
            "v_tucker": self._tucker(self.v_dim, self.dropout[1]).init(keys[0]),
            "q_tucker": self._tucker(self.q_dim, self.dropout[0]).init(keys[1]),
            "a_tucker": self._tucker(self.a_dim, self.dropout[0]).init(keys[2]),
        }
        if self.has_rank_nets:
            # Stacked per-rank nets: weights [rank, h_sub, d] applied as one GEMM.
            def stack_init(k0, drop):
                ks = jax.random.split(k0, self.rank)
                net = self._rank_net(drop)
                return jax.vmap(net.init)(ks)

            p["v_net"] = stack_init(keys[3], self.dropout[1])
            p["q_net"] = stack_init(keys[4], self.dropout[0])
            p["a_net"] = stack_init(keys[5], self.dropout[0])
            p["T_g"] = jax.random.normal(
                keys[6],
                (self.rank, self.h_sub, self.h_sub, self.h_sub, self.glimpse, self.ho_dim),
            )
        return p

    def _rank_project(self, stacked, x, drop: float, ctx) -> jnp.ndarray:
        """Apply all rank nets at once: x [B, N, d] -> [B, N, rank, h_sub].

        The per-rank weight-norm linears fuse into ONE [d, rank*h_sub] GEMM:
        effective weights ``g_r * v_r / ||v_r||_F`` are scaled per rank and
        concatenated along the output dim (a batched GEMM with N=h_sub per
        rank badly underutilizes the MXU).

        Dropout-semantics note: the reference's per-rank FCNets each draw an
        INDEPENDENT mask over the shared tucker output (``tc.py:46-48``);
        the fused GEMM draws ONE mask shared across ranks — identical
        per-site keep probability and inverted scaling (unbiased), but
        rank-DEcorrelated noise becomes rank-correlated.  Reference-exact
        per-rank masks would cost rank x the mask elements (at CTI scale a
        [32, B, V, 512] mask tensor) and break the lane-wide fused GEMM, so
        the shared mask is the deliberate default.  Mask-injection runs
        (``ctx.mask_source``, the dropout-active trajectory oracle) take the
        exact per-rank path below so training-mode placement/scaling is
        verified against the reference's own realized masks."""
        from vqatpu.ops.activation import get_activation
        from vqatpu.ops.module import dropout as _dropout

        p = stacked["l0"]  # {"v": [R, h_sub, d], "g": [R], "b": [R, h_sub]}
        w = p["v"]
        norms = jnp.sqrt((w * w).sum(axis=(1, 2)))  # [R] Frobenius per rank
        act = get_activation(self.act)
        if ctx is not None and ctx.mask_source is not None:
            # reference-exact regime (eager/test only): one independent
            # captured mask per rank, consumed in rank order like tc.py:45
            outs = [
                act((_dropout(x, drop, ctx) @ w[r].T)
                    * (p["g"][r] / norms[r]) + p["b"][r])
                for r in range(self.rank)
            ]
            return jnp.stack(outs, axis=2)  # [B, N, R, h_sub]
        # per-rank scales applied to the GEMM OUTPUT columns (rides the
        # bias+activation epilogue; avoids rewriting the stacked weights)
        scale = jnp.repeat(p["g"] / norms, self.h_sub)  # [R*h_sub]
        w_all = w.reshape(self.rank * self.h_sub, w.shape[-1])
        b_all = p["b"].reshape(self.rank * self.h_sub)
        x = _dropout(x, drop, ctx)
        out = act((x @ w_all.T) * scale + b_all)
        return out.reshape(x.shape[0], x.shape[1], self.rank, self.h_sub)

    def rank_projections(self, p, v, q, a, ctx: Optional[Ctx] = None,
                         v_t: Optional[jnp.ndarray] = None):
        """Tucker + per-rank projections: -> (v_r [B,V,R,x], q_r, a_r,
        T [R,x,y,z,G]) — the operands of the PARALIND contraction.

        ``v_t`` supplies an externally fused v-tucker activation (see
        :func:`fused_tucker_projection`)."""
        assert self.has_rank_nets, "rank projections need the rank-net regime"
        if v_t is None:
            v_t = self._tucker(self.v_dim, self.dropout[1]).apply(p["v_tucker"], v, ctx)
        q_t = self._tucker(self.q_dim, self.dropout[0]).apply(p["q_tucker"], q, ctx)
        a_t = self._tucker(self.a_dim, self.dropout[0]).apply(p["a_tucker"], a, ctx)
        v_r = self._rank_project(p["v_net"], v_t, self.dropout[1], ctx)
        q_r = self._rank_project(p["q_net"], q_t, self.dropout[0], ctx)
        a_r = self._rank_project(p["a_net"], a_t, self.dropout[0], ctx)
        T = p["T_g"][..., 0] if self.ho_dim == 1 else p["T_g"].sum(-1)
        return v_r, q_r, a_r, T

    def apply(self, p, v, q, a, ctx: Optional[Ctx] = None,
              v_t: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Attention logits [B, V, Q, A, glimpse] (h_out==1 squeezed away,
        matching ``f_emb.squeeze(4)`` in ``tc.py:52``)."""
        from vqatpu.kernels.trilinear import attention_logits_dg

        v_r, q_r, a_r, T = self.rank_projections(p, v, q, a, ctx, v_t=v_t)
        # Hand-laid-out dot_general chain: 2.2x the einsum path (2.6 vs
        # 5.7 ms fwd+bwd interleaved) by keeping every big intermediate's
        # minor axis >= 96 lanes — see kernels/trilinear.py + PROFILE.md.
        return attention_logits_dg(v_r, q_r, a_r, T)

    def tucker_projections(self, p, v, q, a, ctx: Optional[Ctx] = None):
        """Just the tucker projections (the pooling operands)."""
        v_t = self._tucker(self.v_dim, self.dropout[1]).apply(p["v_tucker"], v, ctx)
        q_t = self._tucker(self.q_dim, self.dropout[0]).apply(p["q_tucker"], q, ctx)
        a_t = self._tucker(self.a_dim, self.dropout[0]).apply(p["a_tucker"], a, ctx)
        return v_t, q_t, a_t

    def apply_with_weights_qav(self, p, v, q, a, w,
                               ctx: Optional[Ctx] = None,
                               v_t: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """As :meth:`apply_with_weights` but ``w`` is one glimpse of the
        V-minor attention layout: [B, Q, A, V] (see
        kernels.trilinear_pool_qav — same math, lane-efficient layout)."""
        from vqatpu.kernels.trilinear import trilinear_pool_qav

        if v_t is None:
            v_t = self._tucker(self.v_dim, self.dropout[1]).apply(p["v_tucker"], v, ctx)
        q_t = self._tucker(self.q_dim, self.dropout[0]).apply(p["q_tucker"], q, ctx)
        a_t = self._tucker(self.a_dim, self.dropout[0]).apply(p["a_tucker"], a, ctx)
        return trilinear_pool_qav(v_t, q_t, a_t, w)

    def apply_with_weights(self, p, v, q, a, w, ctx: Optional[Ctx] = None,
                           v_t: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Fused joint embedding with attention ``w`` [B, V, Q, A] -> [B, d]
        (``tc.py:54-61``)."""
        from vqatpu.kernels.trilinear import trilinear_pool

        if v_t is None:
            v_t = self._tucker(self.v_dim, self.dropout[1]).apply(p["v_tucker"], v, ctx)
        q_t = self._tucker(self.q_dim, self.dropout[0]).apply(p["q_tucker"], q, ctx)
        a_t = self._tucker(self.a_dim, self.dropout[0]).apply(p["a_tucker"], a, ctx)
        return trilinear_pool(v_t, q_t, a_t, w, backend=self.backend)
