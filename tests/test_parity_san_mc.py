"""Full-model torch-oracle parity for the remaining families: SAN (FFOE)
and BAN (MC, dual attention + answer stream)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig
from vqatpu.models import build_model
from tests.test_full_model_parity import gru_all, t, wn_weight, word_embed

NTOKEN, V_DIM, NUM_ANS = 30, 20, 9
B, V, Q, A = 2, 8, 12, 3
HID = 24


def lin(p, x, bias=True):
    return F.linear(x, t(p["w"]), t(p["b"]) if bias and "b" in p else None)


def test_san_ffoe_full_parity(rng):
    cfg = ModelConfig(ntoken=NTOKEN, v_dim=V_DIM, num_ans_candidates=NUM_ANS,
                      model="san", num_hid=HID, num_stacks=2)
    m = build_model(cfg)
    p = m.init(jax.random.PRNGKey(4))
    v_np = rng.randn(B, V, V_DIM).astype(np.float32)
    v_np[:, 6:] = 0.0
    q_np = rng.randint(0, NTOKEN + 1, (B, Q))
    want, _ = m.apply(p, {"v": jnp.asarray(v_np), "q": jnp.asarray(q_np)})

    # torch oracle following attention.py:62-152 + FFOE/base_model.py:70-92
    v = t(v_np)
    with torch.no_grad():
        w = word_embed(p["w_emb"], t(q_np).long(), NTOKEN)
        q_last = gru_all(p["q_emb"], w, HID)[:, -1]  # forward_all[:, -1]

        sa = p["v_att"]
        ques_emb = lin(sa["fc11"], q_last)
        img_emb = lin(sa["fc12"], v, bias=False)
        h1 = torch.tanh(ques_emb[:, None, :] + img_emb)
        h1_emb = lin(sa["fc13"], h1)
        mask = (img_emb.abs().sum(2) != 0)[:, :, None]
        p1 = torch.softmax(h1_emb.masked_fill(~mask, -float("inf")), 1)
        u = lin(sa["fc14"], q_last) + (lin(sa["fc15"], v, bias=False) * p1).sum(1)
        for s in range(cfg.num_stacks - 1):
            q_s = lin(sa[f"w{s}_q"], u)
            i_s = lin(sa[f"w{s}_i"], v, bias=False)
            h_s = torch.tanh(q_s[:, None, :] + i_s)
            h_emb = lin(sa[f"w{s}_h"], h_s)
            mask_s = (i_s.abs().sum(2) != 0)[:, :, None]
            p_s = torch.softmax(h_emb.masked_fill(~mask_s, -float("inf")), 1)
            u = u + (i_s * p_s).sum(1)
        c = p["classifier"]
        h = F.relu(F.linear(u, wn_weight(c["l1"]), t(c["l1"]["b"])))
        oracle = F.linear(h, wn_weight(c["l2"]), t(c["l2"]["b"]))

    np.testing.assert_allclose(np.asarray(want), oracle.numpy(), atol=1e-3)


def test_ban_mc_full_parity(rng):
    cfg = ModelConfig(ntoken=NTOKEN, v_dim=V_DIM, num_ans_candidates=NUM_ANS,
                      model="ban", task="mc", num_hid=HID, gamma=2,
                      use_counter=True)
    m = build_model(cfg)
    p = m.init(jax.random.PRNGKey(5))
    v_np = rng.randn(B, V, V_DIM).astype(np.float32)
    v_np[:, 6:] = 0.0
    b_np = np.sort(rng.rand(B, V, 6).astype(np.float32), axis=2)
    q_np = rng.randint(0, NTOKEN + 1, (B, Q))
    a_np = rng.randint(0, NTOKEN + 1, (B, A))
    want, _ = m.apply(p, {"v": jnp.asarray(v_np), "b": jnp.asarray(b_np),
                          "q": jnp.asarray(q_np), "a": jnp.asarray(a_np)})

    def fcnet(pp, x, acts):
        for i, act in enumerate(acts):
            x = F.linear(x, wn_weight(pp[f"l{i}"]), t(pp[f"l{i}"]["b"]))
            if act:
                x = getattr(F, act)(x)
        return x

    def biatt(pa, v, states):
        bc = pa["bc"]
        v_ = fcnet(bc["v_net"], v, ["relu"])
        s_ = fcnet(bc["q_net"], states, ["relu"])
        h_v = np.asarray(bc["h_mat"])
        h_mat = t(h_v * (float(np.asarray(pa["h_mat_g"])) / np.linalg.norm(h_v)))
        logits = torch.einsum("bvd,gd,bqd->bgvq", v_, h_mat[0, :, 0, :], s_)
        logits = logits + t(bc["h_bias"])
        mask = (v.abs().sum(2) != 0)
        neg = logits.masked_fill(~mask[:, None, :, None], -float("inf"))
        att = torch.softmax(neg.reshape(B, 2, -1), 2).reshape(neg.shape)
        return att, neg

    # numpy counter oracle from the counting equations
    from tests.test_ops_counter_losses import np_counter

    v = t(v_np)
    with torch.no_grad():
        w = word_embed(p["w_emb"], t(q_np).long(), NTOKEN)
        q_emb = gru_all(p["q_emb"], w, HID)
        wa = word_embed(p["wa_emb"], t(a_np).long(), NTOKEN)
        a_emb = gru_all(p["ans_emb"], wa, HID)
        boxes = b_np[:, :, :4].transpose(0, 2, 1)  # [B, 4, V]

        att, logits = biatt(p["v_att"], v, q_emb)
        va_att, _ = biatt(p["va_att"], v, a_emb)
        for g in range(2):
            bn, tn = p[f"b_net{g}"], p[f"tva_net{g}"]
            b_emb = torch.einsum("bvd,bvq,bqd->bd",
                                 fcnet(bn["v_net"], v, ["relu"]), att[:, g],
                                 fcnet(bn["q_net"], q_emb, ["relu"]))
            va_emb = torch.einsum("bvd,bvq,bqd->bd",
                                  fcnet(tn["v_net"], v, ["relu"]), va_att[:, g],
                                  fcnet(tn["q_net"], a_emb, ["relu"]))
            q_emb = fcnet(p[f"q_prj{g}"], b_emb[:, None, :], [None]) + q_emb
            a_emb = fcnet(p[f"a_prj{g}"], va_emb[:, None, :], [None]) + a_emb
            atten = logits[:, g].max(2).values.numpy()
            # objects=10 with only V=8 boxes: the numpy argsort top-k caps at
            # V naturally, matching Counter's min(objects, V) clamp, while
            # the one-hot stays objects+1 wide
            cnt = np_counter(
                {k: {"weight": np.asarray(vv["weight"])}
                 for k, vv in p["counter"].items()}, boxes, atten, objects=10)
            q_emb = q_emb + fcnet(p[f"c_prj{g}"],
                                  torch.from_numpy(cnt.astype(np.float32))[:, None, :],
                                  ["relu"])

        pooled = q_emb.sum(1) + a_emb.sum(1)
        c = p["classifier"]
        h = F.relu(F.linear(pooled, wn_weight(c["l1"]), t(c["l1"]["b"])))
        oracle = F.linear(h, wn_weight(c["l2"]), t(c["l2"]["b"]))

    np.testing.assert_allclose(np.asarray(want), oracle.numpy(), atol=1e-3)
