"""North-star parity (BASELINE.md): full-model eval logits vs a PyTorch
oracle to <= 1e-3.

The oracle is written functionally from the reference's documented forward
semantics (SURVEY.md §3.2/§3.3): torch GRUs + effective weight-norm linears
+ the BCNet/TCNet contraction formulas, with weights transplanted from the
JAX pytrees.  Eval mode (no dropout), float32.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig
from vqatpu.models import build_model

NTOKEN, V_DIM, NUM_ANS = 40, 24, 13
B, V, Q, A = 3, 9, 12, 3
HID, HMM, RANK, GAMMA = 32, 16, 4, 2


def t(x):
    return torch.from_numpy(np.asarray(x).copy())


def wn_weight(p):
    v = np.asarray(p["v"])
    return t(v * (float(p["g"]) / np.linalg.norm(v)))


def fcnet(p, x, acts):
    """Apply an FCNet param dict: acts is a list like ['relu'] or [None]."""
    for i, act in enumerate(acts):
        x = F.linear(x, wn_weight(p[f"l{i}"]), t(p[f"l{i}"]["b"]))
        if act:
            x = getattr(F, act)(x)
    return x


def word_embed(p, ids, ntoken):
    emb = t(p["emb"]).clone()
    emb[ntoken] = 0.0
    out = F.embedding(ids, emb)
    if "emb_" in p:
        emb_ = t(p["emb_"]).clone()
        emb_[ntoken] = 0.0
        out = torch.cat([out, F.embedding(ids, emb_)], dim=-1)
    return out


def gru_all(p, x, hid):
    rnn = torch.nn.GRU(x.shape[-1], hid, 1, batch_first=True)
    with torch.no_grad():
        rnn.weight_ih_l0.copy_(t(p["fwd"]["w_ih"]))
        rnn.weight_hh_l0.copy_(t(p["fwd"]["w_hh"]))
        rnn.bias_ih_l0.copy_(t(p["fwd"]["b_ih"]))
        rnn.bias_hh_l0.copy_(t(p["fwd"]["b_hh"]))
    out, _ = rnn(x)
    return out


def make_inputs(rng):
    v = rng.randn(B, V, V_DIM).astype(np.float32)
    v[:, 7:] = 0.0
    q = rng.randint(0, NTOKEN + 1, (B, Q))
    a = rng.randint(0, NTOKEN + 1, (B, A))
    return v, q, a


def cfg(model):
    return ModelConfig(ntoken=NTOKEN, v_dim=V_DIM, num_ans_candidates=NUM_ANS,
                       model=model, num_hid=HID, h_mm=HMM, rank=RANK,
                       gamma=GAMMA)


def test_cti_full_model_parity(rng):
    m = build_model(cfg("cti"))
    p = m.init(jax.random.PRNGKey(7))
    v_np, q_np, a_np = make_inputs(rng)
    batch = {"v": jnp.asarray(v_np), "q": jnp.asarray(q_np), "a": jnp.asarray(a_np)}
    want, att_jax = m.apply(p, batch)

    # ---- torch oracle, following FFOE/base_model.py:112-136 ----
    v = t(v_np)
    q_ids = t(q_np).long()
    a_ids = t(a_np).long()
    with torch.no_grad():
        w_emb = word_embed(p["w_emb"], q_ids, NTOKEN)
        q_emb = gru_all(p["q_emb"], w_emb, HID)
        wa_emb = word_embed(p["wa_emb"], a_ids, NTOKEN)
        ans_emb = gru_all(p["ans_emb"], wa_emb, HID)

        # TriAttention: TCNet rank contraction (tc.py:41-52)
        tc = p["t_att"]["tc"]
        v_t = fcnet(tc["v_tucker"], v, ["relu"])
        q_t = fcnet(tc["q_tucker"], q_emb, ["relu"])
        a_t = fcnet(tc["a_tucker"], ans_emb, ["relu"])
        logits_att = 0
        for r in range(RANK):
            pr = lambda stack: {  # noqa: E731
                "l0": {k: np.asarray(stack["l0"][k])[r] for k in stack["l0"]}
            }
            v_r = fcnet(pr(tc["v_net"]), v_t, ["relu"])
            q_r = fcnet(pr(tc["q_net"]), q_t, ["relu"])
            a_r = fcnet(pr(tc["a_net"]), a_t, ["relu"])
            T_r = t(p["t_att"]["tc"]["T_g"])[r, ..., 0]  # [x,y,z,g]
            logits_att = logits_att + torch.einsum(
                "bix,bjy,blz,xyzg->bijlg", v_r, q_r, a_r, T_r)
        # mask + softmax over flattened v*q*a per glimpse (attention.py:55-58)
        box_mask = (v.abs().sum(2) != 0)
        neg = logits_att.masked_fill(~box_mask[:, :, None, None, None],
                                     -float("inf"))
        att = torch.softmax(neg.reshape(B, V * Q * A, GAMMA), 1)
        att = att.reshape(B, V, Q, A, GAMMA)

        # per-glimpse fused joint embedding + residual updates
        for g in range(GAMMA):
            tn = p[f"t_net{g}"]
            vt = fcnet(tn["v_tucker"], v, ["relu"])
            qt = fcnet(tn["q_tucker"], q_emb, ["relu"])
            at = fcnet(tn["a_tucker"], ans_emb, ["relu"])
            joint = torch.einsum("bvd,bvqa,bqd,bad->bd", vt, att[..., g], qt, at)
            q_emb = fcnet(p[f"q_prj{g}"], joint[:, None, :], [None]) + q_emb
            ans_emb = fcnet(p[f"a_prj{g}"], joint[:, None, :], [None]) + ans_emb

        pooled = q_emb.sum(1) + ans_emb.sum(1)
        c = p["classifier"]
        h = F.relu(F.linear(pooled, wn_weight(c["l1"]), t(c["l1"]["b"])))
        oracle = F.linear(h, wn_weight(c["l2"]), t(c["l2"]["b"]))

    np.testing.assert_allclose(np.asarray(att_jax), att.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(want), oracle.numpy(), atol=1e-3)


def test_ban_full_model_parity(rng):
    m = build_model(cfg("ban"))
    p = m.init(jax.random.PRNGKey(8))
    v_np, q_np, _ = make_inputs(rng)
    batch = {"v": jnp.asarray(v_np), "q": jnp.asarray(q_np)}
    want, _ = m.apply(p, batch)

    # ---- torch oracle, following FFOE/base_model.py:37-67 ----
    v = t(v_np)
    q_ids = t(q_np).long()
    with torch.no_grad():
        w_emb = word_embed(p["w_emb"], q_ids, NTOKEN)
        q_emb = gru_all(p["q_emb"], w_emb, HID)

        # BiAttention: weight-normed h_mat BCNet k=3 (attention.py:15-40)
        bc = p["v_att"]["bc"]
        v_ = fcnet(bc["v_net"], v, ["relu"])
        q_ = fcnet(bc["q_net"], q_emb, ["relu"])
        h_v = np.asarray(bc["h_mat"])
        h_mat = t(h_v * (float(np.asarray(p["v_att"]["h_mat_g"]))
                         / np.linalg.norm(h_v)))
        logits = torch.einsum("bvd,gd,bqd->bgvq", v_, h_mat[0, :, 0, :], q_)
        logits = logits + t(bc["h_bias"])
        box_mask = (v.abs().sum(2) != 0)
        neg = logits.masked_fill(~box_mask[:, None, :, None], -float("inf"))
        att = torch.softmax(neg.reshape(B, GAMMA, V * Q), 2).reshape(
            B, GAMMA, V, Q)

        # glimpse loop with cumulative-state stack-sum (base_model.py:47-65)
        q_states = []
        for g in range(GAMMA):
            bn = p[f"b_net{g}"]
            bv = fcnet(bn["v_net"], v, ["relu"])
            bq = fcnet(bn["q_net"], q_emb, ["relu"])
            b_emb = torch.einsum("bvd,bvq,bqd->bd", bv, att[:, g], bq)
            q_emb = fcnet(p[f"q_prj{g}"], b_emb[:, None, :], [None]) + q_emb
            q_states.append(q_emb)
        pooled = torch.stack(q_states, 1).sum(1).sum(1)
        c = p["classifier"]
        h = F.relu(F.linear(pooled, wn_weight(c["l1"]), t(c["l1"]["b"])))
        oracle = F.linear(h, wn_weight(c["l2"]), t(c["l2"]["b"]))

    np.testing.assert_allclose(np.asarray(want), oracle.numpy(), atol=1e-3)
