"""Parity: BCNet regimes and TCNet contractions vs torch-einsum oracles.

The oracles are written directly from the math (low-rank bilinear pooling,
PARALIND trilinear decomposition) with torch FCNets supplying the exact
weight-norm projections; params are transplanted into the jnp pytrees.
"""

import numpy as np
import torch
import torch.nn as nn
from torch.nn.utils.weight_norm import weight_norm

import jax
import jax.numpy as jnp

from vqatpu.ops import BCNet, TCNet
from tests.test_ops_linear import _torch_fcnet, fcnet_params_from_torch


def make_torch_proj(in_dim, out_dim, seed):
    torch.manual_seed(seed)
    seq = _torch_fcnet([in_dim, out_dim], "ReLU")
    seq.eval()
    return seq


class TestBCNet:
    B, V, Q = 3, 7, 5
    v_dim, q_dim, h_dim = 16, 12, 24

    def _setup(self, h_out, k=1):
        vp = make_torch_proj(self.v_dim, self.h_dim * k, 10)
        qp = make_torch_proj(self.q_dim, self.h_dim * k, 11)
        bc = BCNet(self.v_dim, self.q_dim, self.h_dim, h_out, k=k)
        p = bc.init(jax.random.PRNGKey(0))
        p["v_net"] = fcnet_params_from_torch(vp)
        p["q_net"] = fcnet_params_from_torch(qp)
        rng = np.random.RandomState(7)
        v = rng.randn(self.B, self.V, self.v_dim).astype(np.float32)
        q = rng.randn(self.B, self.Q, self.q_dim).astype(np.float32)
        return bc, p, vp, qp, v, q

    def test_joint_embedding_regime(self):
        # h_out=None: sum over v,q of outer-product logits -> [B, 1, d]
        bc, p, vp, qp, v, q = self._setup(None)
        v_ = vp(torch.from_numpy(v))
        q_ = qp(torch.from_numpy(q))
        want = torch.einsum("bvd,bqd->bd", v_, q_).unsqueeze(1).detach().numpy()
        got = bc.apply(p, jnp.asarray(v), jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_attention_regime(self):
        # h_out <= 32: h_mat broadcast Hadamard
        bc, p, vp, qp, v, q = self._setup(2)
        h_mat = torch.from_numpy(np.asarray(p["h_mat"]))
        h_bias = torch.from_numpy(np.asarray(p["h_bias"]))
        v_ = vp(torch.from_numpy(v))
        q_ = qp(torch.from_numpy(q))
        want = (
            torch.einsum("bvd,gd,bqd->bgvq", v_, h_mat[0, :, 0, :], q_) + h_bias
        ).detach().numpy()
        got = bc.apply(p, jnp.asarray(v), jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_projection_regime(self):
        # h_out > 32: h_net projection of the outer product
        bc, p, vp, qp, v, q = self._setup(40)
        torch.manual_seed(12)
        h_net = weight_norm(nn.Linear(self.h_dim, 40), dim=None)
        h_net.eval()
        from tests.test_ops_linear import wn_params_from_torch
        p["h_net"] = wn_params_from_torch(h_net)
        v_ = vp(torch.from_numpy(v))
        q_ = qp(torch.from_numpy(q))
        d_ = torch.einsum("bvd,bqd->bvqd", v_, q_)
        want = h_net(d_).permute(0, 3, 1, 2).detach().numpy()
        got = bc.apply(p, jnp.asarray(v), jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_with_weights_and_kfold(self):
        k = 3
        bc, p, vp, qp, v, q = self._setup(2, k=k)
        rng = np.random.RandomState(8)
        w = rng.rand(self.B, self.V, self.Q).astype(np.float32)
        v_ = vp(torch.from_numpy(v))
        q_ = qp(torch.from_numpy(q))
        logits = torch.einsum("bvd,bvq,bqd->bd", v_, torch.from_numpy(w), q_)
        # AvgPool1d(k, stride=k) * k == sum over consecutive k channels
        want = logits.view(self.B, self.h_dim, k).sum(-1).detach().numpy()
        got = bc.apply_with_weights(p, jnp.asarray(v), jnp.asarray(q), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


class TestTCNet:
    B, V, Q, A = 2, 6, 4, 3
    v_dim, q_dim, a_dim = 10, 8, 8
    h_mm, rank, glimpse = 32, 4, 2  # h_sub = 8

    def test_attention_logits_vs_naive(self):
        tc = TCNet(self.v_dim, self.q_dim, self.a_dim, self.h_mm, 1,
                   self.rank, self.glimpse, k=1)
        assert tc.has_rank_nets
        p = tc.init(jax.random.PRNGKey(1))
        rng = np.random.RandomState(9)
        v = rng.randn(self.B, self.V, self.v_dim).astype(np.float32)
        q = rng.randn(self.B, self.Q, self.q_dim).astype(np.float32)
        a = rng.randn(self.B, self.A, self.a_dim).astype(np.float32)
        got = tc.apply(p, jnp.asarray(v), jnp.asarray(q), jnp.asarray(a))
        assert got.shape == (self.B, self.V, self.Q, self.A, self.glimpse)

        # naive oracle: per-rank mode products summed, using the same
        # (jax-computed) projections
        from vqatpu.ops.linear import FCNet
        v_t = tc._tucker(self.v_dim, 0.5).apply(p["v_tucker"], jnp.asarray(v))
        q_t = tc._tucker(self.q_dim, 0.2).apply(p["q_tucker"], jnp.asarray(q))
        a_t = tc._tucker(self.a_dim, 0.2).apply(p["a_tucker"], jnp.asarray(a))
        want = np.zeros(got.shape, np.float32)
        net = tc._rank_net(0.0)
        for r in range(self.rank):
            pv = jax.tree.map(lambda x: x[r], p["v_net"])
            pq = jax.tree.map(lambda x: x[r], p["q_net"])
            pa = jax.tree.map(lambda x: x[r], p["a_net"])
            v_r = np.asarray(net.apply(pv, v_t))
            q_r = np.asarray(net.apply(pq, q_t))
            a_r = np.asarray(net.apply(pa, a_t))
            T_r = np.asarray(p["T_g"][r, ..., 0])  # [x, y, z, g]
            want += np.einsum("bix,bjy,blz,xyzg->bijlg", v_r, q_r, a_r, T_r)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)

    def test_with_weights_vs_full_einsum(self):
        # CTI t_net config: k=2 -> d=1024-like gate means NO rank nets
        tc = TCNet(self.v_dim, self.q_dim, self.a_dim, 512, 1, self.rank, 1, k=2)
        assert not tc.has_rank_nets
        p = tc.init(jax.random.PRNGKey(2))
        assert "T_g" not in p
        rng = np.random.RandomState(10)
        v = rng.randn(self.B, self.V, self.v_dim).astype(np.float32)
        q = rng.randn(self.B, self.Q, self.q_dim).astype(np.float32)
        a = rng.randn(self.B, self.A, self.a_dim).astype(np.float32)
        w = rng.rand(self.B, self.V, self.Q, self.A).astype(np.float32)
        got = tc.apply_with_weights(
            p, jnp.asarray(v), jnp.asarray(q), jnp.asarray(a), jnp.asarray(w)
        )
        v_t = np.asarray(tc._tucker(self.v_dim, 0.5).apply(p["v_tucker"], jnp.asarray(v)))
        q_t = np.asarray(tc._tucker(self.q_dim, 0.2).apply(p["q_tucker"], jnp.asarray(q)))
        a_t = np.asarray(tc._tucker(self.a_dim, 0.2).apply(p["a_tucker"], jnp.asarray(a)))
        # reference einsum 'bdv,bvqa,bdqi,bdaj->bdij' squeezed (tc.py:59-61)
        want = np.einsum("bvd,bvqa,bqd,bad->bd", v_t, w, q_t, a_t)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-4)
