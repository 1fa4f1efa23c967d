"""Torch-checkpoint importer: reference-named state_dicts load into vqatpu
params, and the imported model reproduces the torch model's logits."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils.weight_norm import weight_norm

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig
from vqatpu.models import build_model
from vqatpu.ops.tensor import (paralind_core_scramble,
                               paralind_core_unscramble)
from vqatpu.tools.import_torch import convert_state_dict

NTOKEN, V_DIM, NUM_ANS = 25, 12, 6
B, V, Q = 2, 7, 12
HID = 16


class FC(nn.Module):
    """Sequential named 'main', the reference's FCNet state-dict shape."""

    def __init__(self, dims, act=nn.ReLU, drop=0.0):
        super().__init__()
        layers = []
        for i in range(len(dims) - 1):
            if drop > 0:
                layers.append(nn.Dropout(drop))
            layers.append(weight_norm(nn.Linear(dims[i], dims[i + 1]), dim=None))
            if act is not None:
                layers.append(act())
        self.main = nn.Sequential(*layers)

    def forward(self, x):
        return self.main(x)


class WE(nn.Module):
    def __init__(self, dim=8):
        super().__init__()
        self.emb = nn.Embedding(NTOKEN + 1, dim, padding_idx=NTOKEN)
        self.emb_ = nn.Embedding(NTOKEN + 1, dim, padding_idx=NTOKEN)

    def forward(self, x):
        return torch.cat([self.emb(x), self.emb_(x)], -1)


class QE(nn.Module):
    def __init__(self, in_dim, hid=HID):
        super().__init__()
        self.rnn = nn.GRU(in_dim, hid, 1, batch_first=True)

    def forward(self, x):
        out, _ = self.rnn(x)
        return out


class BC(nn.Module):
    def __init__(self, h_out=None, k=1):
        super().__init__()
        self.v_net = FC([V_DIM, HID * k])
        self.q_net = FC([HID, HID * k])
        if h_out is not None:
            self.h_mat = nn.Parameter(torch.randn(1, h_out, 1, HID * k))
            self.h_bias = nn.Parameter(torch.randn(1, h_out, 1, 1))


class ATT(nn.Module):
    def __init__(self, glimpse):
        super().__init__()
        self.logits = weight_norm(BC(h_out=glimpse, k=3), name="h_mat", dim=None)


class TorchBan(nn.Module):
    def __init__(self, gamma):
        super().__init__()
        self.gamma = gamma
        self.w_emb = WE()
        self.q_emb = QE(16)
        self.v_att = ATT(gamma)
        self.b_net = nn.ModuleList([BC() for _ in range(gamma)])
        self.q_prj = nn.ModuleList(
            [FC([HID, HID], act=None, drop=0.2) for _ in range(gamma)])
        self.classifier = FC([HID, 2 * HID], act=None)
        # reference classifier: wn-linear / act / dropout / wn-linear
        self.classifier.main = nn.Sequential(
            weight_norm(nn.Linear(HID, 2 * HID), dim=None), nn.ReLU(),
            nn.Dropout(0.5),
            weight_norm(nn.Linear(2 * HID, NUM_ANS), dim=None))

    def forward(self, v, q):
        w = self.w_emb(q)
        q_emb = self.q_emb(w)
        bc = self.v_att.logits
        v_ = bc.v_net(v)
        q_ = bc.q_net(q_emb)
        logits = torch.einsum("bvd,gd,bqd->bgvq", v_, bc.h_mat[0, :, 0, :], q_)
        logits = logits + bc.h_bias
        mask = (v.abs().sum(2) != 0)
        neg = logits.masked_fill(~mask[:, None, :, None], -float("inf"))
        att = torch.softmax(neg.reshape(-1, self.gamma, V * Q), 2).reshape(
            -1, self.gamma, V, Q)
        states = []
        for g in range(self.gamma):
            bn = self.b_net[g]
            b_emb = torch.einsum("bvd,bvq,bqd->bd", bn.v_net(v), att[:, g],
                                 bn.q_net(q_emb))
            q_emb = self.q_prj[g](b_emb.unsqueeze(1)) + q_emb
            states.append(q_emb)
        pooled = torch.stack(states, 1).sum(1).sum(1)
        return self.classifier.main(pooled)


def test_import_ban_checkpoint_reproduces_logits(rng):
    torch.manual_seed(11)
    tban = TorchBan(gamma=2)
    tban.eval()

    v = rng.randn(B, V, V_DIM).astype(np.float32)
    v[:, 5:] = 0.0
    q = rng.randint(0, NTOKEN + 1, (B, Q))
    with torch.no_grad():
        want = tban(torch.from_numpy(v), torch.from_numpy(q).long()).numpy()

    cfg = ModelConfig(ntoken=NTOKEN, v_dim=V_DIM, num_ans_candidates=NUM_ANS,
                      model="ban", num_hid=HID, gamma=2, op="c")
    model = build_model(cfg)
    sd = {k: v_.detach().numpy() for k, v_ in tban.state_dict().items()}
    # the tiny torch net uses 8-d word embeddings; apply() consumes param
    # shapes directly, so the config's nominal 300-d doesn't constrain it
    params = convert_state_dict_with_dims(sd, model)
    batch = {"v": jnp.asarray(v), "q": jnp.asarray(q)}
    got, _ = model.apply(params, batch)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


def convert_state_dict_with_dims(sd, model):
    from vqatpu.tools import import_torch as it
    params = it.convert_ban_ffoe(sd, model.cfg.gamma, model.cfg.use_counter)
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)), params)


def test_cti_import_structure(rng):
    """CTI importer: synthesized reference-named state dict maps onto the
    exact pytree structure model.init produces (shape-validated)."""
    cfg = ModelConfig(ntoken=NTOKEN, v_dim=V_DIM, num_ans_candidates=NUM_ANS,
                      model="cti", num_hid=16, h_mm=8, rank=2, gamma=2, op="c")
    model = build_model(cfg)
    ref = model.init(jax.random.PRNGKey(0))

    sd = {}

    def put_fcnet(prefix, p, start_idx=1):
        for j, lp in enumerate(sorted(p)):
            i = start_idx + j * 3
            sd[f"{prefix}.main.{i}.weight_v"] = np.asarray(p[lp]["v"])
            sd[f"{prefix}.main.{i}.weight_g"] = np.asarray(p[lp]["g"]).reshape(())
            sd[f"{prefix}.main.{i}.bias"] = np.asarray(p[lp]["b"])

    def put_gru(prefix, p):
        for ours, theirs in (("w_ih", "weight_ih_l0"), ("w_hh", "weight_hh_l0"),
                             ("b_ih", "bias_ih_l0"), ("b_hh", "bias_hh_l0")):
            sd[f"{prefix}.rnn.{theirs}"] = np.asarray(p["fwd"][ours])

    for we in ("w_emb", "wa_emb"):
        sd[f"{we}.emb.weight"] = np.asarray(ref[we]["emb"])
        sd[f"{we}.emb_.weight"] = np.asarray(ref[we]["emb_"])
    put_gru("q_emb", ref["q_emb"])
    put_gru("ans_emb", ref["ans_emb"])
    tc = ref["t_att"]["tc"]
    for tk in ("v_tucker", "q_tucker", "a_tucker"):
        put_fcnet(f"t_att.TriAtt.{tk}", tc[tk])
    # a reference checkpoint stores the core in ModeProduct's scrambled
    # layout (Tensor.py:6-9); the importer unscrambles it back
    sd["t_att.TriAtt.T_g"] = np.asarray(
        paralind_core_scramble(np.asarray(tc["T_g"])[..., 0])[..., None])[None]
    for stream in ("v_net", "q_net", "a_net"):
        for r in range(cfg.rank):
            put_fcnet(f"t_att.TriAtt.{stream}.{r}",
                      {"l0": {k: np.asarray(tc[stream]["l0"][k])[r]
                              for k in tc[stream]["l0"]}})
    for g in range(cfg.gamma):
        for tk in ("v_tucker", "q_tucker", "a_tucker"):
            put_fcnet(f"t_net.{g}.{tk}", ref[f"t_net{g}"][tk])
        put_fcnet(f"q_prj.{g}", ref[f"q_prj{g}"])
        put_fcnet(f"a_prj.{g}", ref[f"a_prj{g}"])
    sd["classifier.main.0.weight_v"] = np.asarray(ref["classifier"]["l1"]["v"])
    sd["classifier.main.0.weight_g"] = np.asarray(ref["classifier"]["l1"]["g"]).reshape(())
    sd["classifier.main.0.bias"] = np.asarray(ref["classifier"]["l1"]["b"])
    sd["classifier.main.3.weight_v"] = np.asarray(ref["classifier"]["l2"]["v"])
    sd["classifier.main.3.weight_g"] = np.asarray(ref["classifier"]["l2"]["g"]).reshape(())
    sd["classifier.main.3.bias"] = np.asarray(ref["classifier"]["l2"]["b"])

    params = convert_state_dict(sd, model)
    # roundtrip: imported values equal the originals, leaf-for-leaf
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ---------------------------------------------------------------------------
# CTI (FFOE), TanModel (MC) and BanModel (MC) importer VALUE parity:
# reference-named torch modules -> state_dict -> convert_state_dict (the full
# shape-checked entry path) -> vqatpu forward reproduces the torch logits.
# Reference layouts: tc.py:24-37 (tuckers + rank nets + T_g, rank nets only
# when h_dim<1024 — i.e. the attention TCNet; glimpse t_nets are k=2 and
# carry tuckers only), MC/base_model.py:19-77 and 112-152.
# ---------------------------------------------------------------------------

HMM, RANK, GAMMA, CHID = 16, 4, 2, 32  # CHID = 2*HMM (the k=2 joint contract)
A_LEN = 3


class CLS(nn.Module):
    """SimpleClassifier layout: wn-linear / ReLU / Dropout / wn-linear under
    ``main`` (classifier.py:11-29)."""

    def __init__(self, in_dim, hid, out):
        super().__init__()
        self.main = nn.Sequential(
            weight_norm(nn.Linear(in_dim, hid), dim=None), nn.ReLU(),
            nn.Dropout(0.5), weight_norm(nn.Linear(hid, out), dim=None))

    def forward(self, x):
        return self.main(x)


class TCRef(nn.Module):
    """TCNet state-dict layout (tc.py:24-37)."""

    def __init__(self, v_dim, q_dim, a_dim, h_dim, rank, glimpse, with_rank):
        super().__init__()
        self.v_tucker = FC([v_dim, h_dim], drop=0.5)
        self.q_tucker = FC([q_dim, h_dim], drop=0.2)
        self.a_tucker = FC([a_dim, h_dim], drop=0.2)
        if with_rank:
            hr = h_dim // rank
            self.v_net = nn.ModuleList(
                [FC([h_dim, hr], drop=0.5) for _ in range(rank)])
            self.q_net = nn.ModuleList(
                [FC([h_dim, hr], drop=0.2) for _ in range(rank)])
            self.a_net = nn.ModuleList(
                [FC([h_dim, hr], drop=0.2) for _ in range(rank)])
            self.T_g = nn.Parameter(
                torch.randn(1, rank, hr, hr, hr, glimpse, 1))


class TriATT(nn.Module):
    """TriAttention wraps its TCNet as attribute ``TriAtt`` (attention.py:46)."""

    def __init__(self, v_dim, q_dim, a_dim, h_dim, rank, glimpse):
        super().__init__()
        self.TriAtt = TCRef(v_dim, q_dim, a_dim, h_dim, rank, glimpse,
                            with_rank=True)


class TorchCTI(nn.Module):
    """Reference-named CTI module (FFOE/base_model.py:95-136).  The MC
    TanModel (MC/base_model.py:112-152) differs only in the attention
    attribute name ('v_att') and the 2-class head."""

    def __init__(self, num_out, att_attr="t_att"):
        super().__init__()
        self.att_attr = att_attr
        self.w_emb = WE(300)
        self.q_emb = QE(600, CHID)
        self.wa_emb = WE(300)
        self.ans_emb = QE(600, CHID)
        setattr(self, att_attr, TriATT(V_DIM, CHID, CHID, HMM, RANK, GAMMA))
        self.t_net = nn.ModuleList(
            [TCRef(V_DIM, CHID, CHID, 2 * HMM, RANK, 1, with_rank=False)
             for _ in range(GAMMA)])
        self.q_prj = nn.ModuleList(
            [FC([CHID, CHID], act=None, drop=0.2) for _ in range(GAMMA)])
        self.a_prj = nn.ModuleList(
            [FC([CHID, CHID], act=None, drop=0.2) for _ in range(GAMMA)])
        self.classifier = CLS(CHID, 2 * CHID, num_out)

    def forward(self, v, q, a):
        q_emb = self.q_emb(self.w_emb(q))
        ans_emb = self.ans_emb(self.wa_emb(a))
        tri = getattr(self, self.att_attr).TriAtt
        v_t = tri.v_tucker(v)
        q_t = tri.q_tucker(q_emb)
        a_t = tri.a_tucker(ans_emb)
        logits = 0
        # faithful ModeProduct semantics: the stored core is element-
        # scrambled (Tensor.py:6-9); unscramble before the clean einsum
        T_u = paralind_core_unscramble(tri.T_g[0, ..., 0])
        for r in range(RANK):
            logits = logits + torch.einsum(
                "bix,bjy,blz,xyzg->bijlg", tri.v_net[r](v_t),
                tri.q_net[r](q_t), tri.a_net[r](a_t), T_u[r])
        mask = (v.abs().sum(2) != 0)
        b_, v_n, q_n, a_n = v.shape[0], v.shape[1], q.shape[1], a.shape[1]
        neg = logits.masked_fill(~mask[:, :, None, None, None], -float("inf"))
        att = torch.softmax(neg.reshape(b_, v_n * q_n * a_n, GAMMA), 1)
        att = att.reshape(b_, v_n, q_n, a_n, GAMMA)
        for g in range(GAMMA):
            tn = self.t_net[g]
            joint = torch.einsum(
                "bvd,bvqa,bqd,bad->bd", tn.v_tucker(v), att[..., g],
                tn.q_tucker(q_emb), tn.a_tucker(ans_emb))
            q_emb = self.q_prj[g](joint[:, None, :]) + q_emb
            ans_emb = self.a_prj[g](joint[:, None, :]) + ans_emb
        return self.classifier(q_emb.sum(1) + ans_emb.sum(1)), att


def _tri_inputs(rng):
    v = rng.randn(B, V, V_DIM).astype(np.float32)
    v[:, 5:] = 0.0
    q = rng.randint(0, NTOKEN + 1, (B, Q))
    a = rng.randint(0, NTOKEN + 1, (B, A_LEN))
    return v, q, a


def _tri_cfg(task, **kw):
    return ModelConfig(ntoken=NTOKEN, v_dim=V_DIM,
                       num_ans_candidates=NUM_ANS, task=task, num_hid=CHID,
                       h_mm=HMM, rank=RANK, gamma=GAMMA, op="c", **kw)


def test_import_cti_checkpoint_reproduces_logits(rng):
    torch.manual_seed(5)
    tm = TorchCTI(NUM_ANS, att_attr="t_att")
    tm.eval()
    v, q, a = _tri_inputs(rng)
    with torch.no_grad():
        want, want_att = tm(torch.from_numpy(v), torch.from_numpy(q).long(),
                            torch.from_numpy(a).long())

    model = build_model(_tri_cfg("ffoe", model="cti"))
    sd = {k: p.detach().numpy() for k, p in tm.state_dict().items()}
    params = convert_state_dict(sd, model)
    got, got_att = model.apply(
        jax.tree.map(jnp.asarray, params),
        {"v": jnp.asarray(v), "q": jnp.asarray(q), "a": jnp.asarray(a)})
    np.testing.assert_allclose(np.asarray(got_att), want_att.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-3)


def test_import_tan_mc_checkpoint_reproduces_logits(rng):
    torch.manual_seed(6)
    tm = TorchCTI(2, att_attr="v_att")
    tm.eval()
    v, q, a = _tri_inputs(rng)
    with torch.no_grad():
        want, _ = tm(torch.from_numpy(v), torch.from_numpy(q).long(),
                     torch.from_numpy(a).long())

    model = build_model(_tri_cfg("mc", model="cti"))
    sd = {k: p.detach().numpy() for k, p in tm.state_dict().items()}
    params = convert_state_dict(sd, model)
    got, _ = model.apply(
        jax.tree.map(jnp.asarray, params),
        {"v": jnp.asarray(v), "q": jnp.asarray(q), "a": jnp.asarray(a)})
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-3)


class PLRef(nn.Module):
    """PiecewiseLin holds one ``weight`` of n+1 knots (counting.py:148-155)."""

    def __init__(self, n=16):
        super().__init__()
        self.weight = nn.Parameter(torch.rand(n + 1) + 0.1)


class CounterRef(nn.Module):
    def __init__(self):
        super().__init__()
        self.f = nn.ModuleList([PLRef() for _ in range(8)])


class BANATT300(nn.Module):
    """BiAttention at 300-d word / CHID hidden dims."""

    def __init__(self, glimpse):
        super().__init__()
        bc = BC.__new__(BC)
        nn.Module.__init__(bc)
        bc.v_net = FC([V_DIM, CHID * 3])
        bc.q_net = FC([CHID, CHID * 3])
        bc.h_mat = nn.Parameter(torch.randn(1, glimpse, 1, CHID * 3))
        bc.h_bias = nn.Parameter(torch.randn(1, glimpse, 1, 1))
        self.logits = weight_norm(bc, name="h_mat", dim=None)


class BCJoint(nn.Module):
    """Pooling BCNet (h_out=None, k=1): v_net + q_net only."""

    def __init__(self):
        super().__init__()
        self.v_net = FC([V_DIM, CHID])
        self.q_net = FC([CHID, CHID])


def _ban_att(attmod, v, states):
    """BiAttention forward (attention.py:30-40): returns (att, masked logits)."""
    bc = attmod.logits
    v_ = bc.v_net(v)
    q_ = bc.q_net(states)
    g = bc.h_mat.shape[1]
    logits = torch.einsum("bvd,gd,bqd->bgvq", v_, bc.h_mat[0, :, 0, :], q_)
    logits = logits + bc.h_bias
    mask = (v.abs().sum(2) != 0)
    neg = logits.masked_fill(~mask[:, None, :, None], -float("inf"))
    b_, v_n, q_n = v.shape[0], v.shape[1], states.shape[1]
    att = torch.softmax(neg.reshape(b_, g, v_n * q_n), 2).reshape(
        b_, g, v_n, q_n)
    return att, neg


class TorchBanMC(nn.Module):
    """Reference-named MC BanModel (MC/base_model.py:19-77): dual
    BiAttention, answer stream, tva_net, counter branch."""

    def __init__(self):
        super().__init__()
        self.w_emb = WE(300)
        self.q_emb = QE(600, CHID)
        self.wa_emb = WE(300)
        self.ans_emb = QE(600, CHID)
        self.v_att = BANATT300(GAMMA)
        self.va_att = BANATT300(GAMMA)
        self.b_net = nn.ModuleList([BCJoint() for _ in range(GAMMA)])
        self.tva_net = nn.ModuleList([BCJoint() for _ in range(GAMMA)])
        self.q_prj = nn.ModuleList(
            [FC([CHID, CHID], act=None, drop=0.2) for _ in range(GAMMA)])
        self.a_prj = nn.ModuleList(
            [FC([CHID, CHID], act=None, drop=0.2) for _ in range(GAMMA)])
        self.c_prj = nn.ModuleList(
            [FC([11, CHID], act=nn.ReLU, drop=0.0) for _ in range(GAMMA)])
        self.counter = CounterRef()
        self.classifier = CLS(CHID, 2 * CHID, 2)

    def forward(self, v, b, q, a):
        from tests.test_ops_counter_losses import np_counter

        q_emb = self.q_emb(self.w_emb(q))
        ans_emb = self.ans_emb(self.wa_emb(a))
        att, logits = _ban_att(self.v_att, v, q_emb)
        va_att, _ = _ban_att(self.va_att, v, ans_emb)
        boxes = b[:, :, :4].transpose(1, 2)
        cw = {f"f{i}": {"weight": self.counter.f[i].weight.detach().numpy()}
              for i in range(8)}
        for g in range(GAMMA):
            bn, tn = self.b_net[g], self.tva_net[g]
            b_emb = torch.einsum("bvd,bvq,bqd->bd", bn.v_net(v), att[:, g],
                                 bn.q_net(q_emb))
            va_emb = torch.einsum("bvd,bvq,bqd->bd", tn.v_net(v), va_att[:, g],
                                  tn.q_net(ans_emb))
            q_emb = self.q_prj[g](b_emb[:, None, :]) + q_emb
            ans_emb = self.a_prj[g](va_emb[:, None, :]) + ans_emb
            atten = logits[:, g].max(2).values
            embed = torch.from_numpy(np_counter(
                cw, boxes.numpy(), atten.numpy(), objects=10))
            q_emb = q_emb + self.c_prj[g](embed.float())[:, None, :]
        return self.classifier(q_emb.sum(1) + ans_emb.sum(1))


def test_import_ban_mc_checkpoint_reproduces_logits(rng):
    torch.manual_seed(9)
    tm = TorchBanMC()
    tm.eval()
    v, q, a = _tri_inputs(rng)
    b = np.sort(rng.rand(B, V, 6).astype(np.float32), axis=2)
    with torch.no_grad():
        want = tm(torch.from_numpy(v), torch.from_numpy(b),
                  torch.from_numpy(q).long(), torch.from_numpy(a).long())

    model = build_model(_tri_cfg("mc", model="ban", use_counter=True))
    sd = {k: p.detach().numpy() for k, p in tm.state_dict().items()}
    params = convert_state_dict(sd, model)
    got, _ = model.apply(
        jax.tree.map(jnp.asarray, params),
        {"v": jnp.asarray(v), "b": jnp.asarray(b), "q": jnp.asarray(q),
         "a": jnp.asarray(a)})
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-3)


def test_load_params_any_pth_on_ramp(rng, tmp_path):
    """A reference utils.save_model .pth (FFOE/test.py:157-166 format) drops
    straight into the eval-CLI checkpoint resolver."""
    from vqatpu.train.checkpoints import load_params_any

    torch.manual_seed(5)
    tm = TorchCTI(NUM_ANS, att_attr="t_att")
    tm.eval()
    torch.save({"epoch": 12, "model_state": tm.state_dict(),
                "optimizer_state": {}}, tmp_path / "model_epoch12.pth")

    model = build_model(_tri_cfg("ffoe", model="cti"))
    params = load_params_any(str(tmp_path), 12, model)

    v, q, a = _tri_inputs(rng)
    with torch.no_grad():
        want, _ = tm(torch.from_numpy(v), torch.from_numpy(q).long(),
                     torch.from_numpy(a).long())
    got, _ = model.apply(
        jax.tree.map(jnp.asarray, params),
        {"v": jnp.asarray(v), "q": jnp.asarray(q), "a": jnp.asarray(a)})
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-3)
