"""North-star parity at REFERENCE scale: CTI eval logits vs the torch oracle
at the real dimensions (num_hid 1024, h_mm 512, rank 32, v_dim 2048,
3129 answers) — <= 1e-3 on actual-size accumulations, not just toy dims."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig
from vqatpu.models import build_model
from tests.test_full_model_parity import fcnet, gru_all, t, wn_weight, word_embed

NTOKEN, V_DIM, NUM_ANS = 2000, 2048, 3129
B, V, Q, A = 2, 50, 12, 3
HID, HMM, RANK, GAMMA = 1024, 512, 32, 2


def test_cti_reference_scale_parity(rng):
    cfg = ModelConfig(ntoken=NTOKEN, v_dim=V_DIM, num_ans_candidates=NUM_ANS,
                      model="cti", num_hid=HID, h_mm=HMM, rank=RANK,
                      gamma=GAMMA)
    m = build_model(cfg)
    p = m.init(jax.random.PRNGKey(3))
    # scale the random core down like trained weights would be; untrained
    # N(0,1) cores produce logits in the thousands and drown the comparison
    p["t_att"]["tc"]["T_g"] = p["t_att"]["tc"]["T_g"] * 0.05

    v_np = rng.randn(B, V, V_DIM).astype(np.float32)
    v_np[:, 44:] = 0.0
    q_np = rng.randint(0, NTOKEN + 1, (B, Q))
    a_np = rng.randint(0, NTOKEN + 1, (B, A))
    batch = {"v": jnp.asarray(v_np), "q": jnp.asarray(q_np), "a": jnp.asarray(a_np)}
    want, att_jax = m.apply(p, batch)

    v = t(v_np)
    with torch.no_grad():
        w_emb = word_embed(p["w_emb"], t(q_np).long(), NTOKEN)
        q_emb = gru_all(p["q_emb"], w_emb, HID)
        wa_emb = word_embed(p["wa_emb"], t(a_np).long(), NTOKEN)
        ans_emb = gru_all(p["ans_emb"], wa_emb, HID)

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
            T_r = t(tc["T_g"])[r, ..., 0]
            logits_att = logits_att + torch.einsum(
                "bix,bjy,blz,xyzg->bijlg", v_r, q_r, a_r, T_r)
        box_mask = (v.abs().sum(2) != 0)
        neg = logits_att.masked_fill(~box_mask[:, :, None, None, None],
                                     -float("inf"))
        att = torch.softmax(neg.reshape(B, V * Q * A, GAMMA), 1).reshape(
            B, V, Q, A, GAMMA)

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
        h = torch.relu(torch.nn.functional.linear(
            pooled, wn_weight(c["l1"]), t(c["l1"]["b"])))
        oracle = torch.nn.functional.linear(h, wn_weight(c["l2"]), t(c["l2"]["b"]))

    att_err = np.abs(np.asarray(att_jax) - att.numpy()).max()
    logit_err = np.abs(np.asarray(want) - oracle.numpy()).max()
    # BASELINE north star: <= 1e-3 at reference scale
    assert att_err < 1e-4, att_err
    assert logit_err < 1e-3, logit_err
