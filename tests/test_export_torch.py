"""Torch checkpoint EXPORT validation (vqatpu -> reference .pth).

Two layers of evidence:
1. roundtrip — export_state_dict then import converts back to the identical
   pytree for every supported family;
2. strict torch load — a reference-faithful torch skeleton (FCNet Sequential
   layout per ``/root/reference/src/fc.py:16-29``, with the REAL dropout
   configs so the Linear indices match) accepts the exported state_dict with
   ``strict=True``, proving key names and shapes are what the reference's
   ``torch.load``/``load_state_dict`` expects.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
from torch.nn.utils.weight_norm import weight_norm

import jax

from vqatpu.config import ModelConfig
from vqatpu.models import build_model
from vqatpu.tools.export_torch import export_checkpoint, export_state_dict
from vqatpu.tools.import_torch import convert_state_dict, load_torch_state_dict

NTOKEN, V_DIM, HID, HMM, RANK = 30, 16, 8, 4, 2


def _cfg(**kw):
    base = dict(ntoken=NTOKEN, v_dim=V_DIM, num_ans_candidates=11,
                num_hid=HID, h_mm=HMM, rank=RANK, gamma=2, op="c")
    base.update(kw)
    return ModelConfig(**base)


@pytest.mark.parametrize("model_name,task,extra", [
    ("ban", "ffoe", {"use_counter": True}),
    ("cti", "ffoe", {}),
    ("cti", "mc", {}),
    ("ban", "mc", {}),
])
def test_export_roundtrip(model_name, task, extra):
    model = build_model(_cfg(model=model_name, task=task, **extra))
    params = model.init(jax.random.PRNGKey(7))
    sd = export_state_dict(model, params)
    back = convert_state_dict(sd, model)

    leaves0, tree0 = jax.tree.flatten(params)
    leaves1, tree1 = jax.tree.flatten(back)
    assert tree0 == tree1
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_export_checkpoint_payload(tmp_path):
    """File payload matches the reference utils.save_model format and
    import_checkpoint reads it back."""
    model = build_model(_cfg(model="cti"))
    params = model.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "model_epoch9.pth")
    export_checkpoint(path, model, params, epoch=9)
    payload = torch.load(path, map_location="cpu", weights_only=False)
    assert set(payload) == {"epoch", "model_state", "optimizer_state"}
    assert payload["epoch"] == 9
    back = convert_state_dict(load_torch_state_dict(path), model)
    np.testing.assert_array_equal(
        np.asarray(back["classifier"]["l1"]["v"]),
        np.asarray(params["classifier"]["l1"]["v"], np.float32))


# --- reference-faithful torch skeleton (structure per fc.py/tc.py, not a
# copy: built from the documented Sequential layout) -----------------------

class FC(nn.Module):
    def __init__(self, dims, act="ReLU", drop=0.0):
        super().__init__()
        layers = []
        for i in range(len(dims) - 1):
            if drop > 0:
                layers.append(nn.Dropout(drop))
            layers.append(weight_norm(nn.Linear(dims[i], dims[i + 1]),
                                      dim=None))
            if act != "":
                layers.append(getattr(nn, act)())
        self.main = nn.Sequential(*layers)


class WE(nn.Module):
    def __init__(self):
        super().__init__()
        self.emb = nn.Embedding(NTOKEN + 1, 300, padding_idx=NTOKEN)
        self.emb_ = nn.Embedding(NTOKEN + 1, 300, padding_idx=NTOKEN)


class QE(nn.Module):
    def __init__(self, in_dim=600, hid=HID):
        super().__init__()
        self.rnn = nn.GRU(in_dim, hid, batch_first=True)


class TC(nn.Module):
    """Reference TCNet param surface (tc.py:18-35): tuckers with the real
    dropout split (v: 0.5, q/a: 0.2) and, in the rank-net regime,
    per-rank ModuleLists + T_g with its leading parameter dim."""

    def __init__(self, d, rank=0, h_sub=0, glimpse=1):
        super().__init__()
        self.v_tucker = FC([V_DIM, d], drop=0.5)
        self.q_tucker = FC([HID, d], drop=0.2)
        self.a_tucker = FC([HID, d], drop=0.2)
        if rank:
            self.v_net = nn.ModuleList([FC([d, h_sub], drop=0.5)
                                        for _ in range(rank)])
            self.q_net = nn.ModuleList([FC([d, h_sub], drop=0.2)
                                        for _ in range(rank)])
            self.a_net = nn.ModuleList([FC([d, h_sub], drop=0.2)
                                        for _ in range(rank)])
            self.T_g = nn.Parameter(
                torch.randn(1, rank, h_sub, h_sub, h_sub, glimpse, 1))


class TriAttWrap(nn.Module):
    def __init__(self):
        super().__init__()
        self.TriAtt = TC(HMM, rank=RANK, h_sub=HMM // RANK, glimpse=2)


class TorchCTISkeleton(nn.Module):
    def __init__(self, gamma=2):
        super().__init__()
        self.w_emb = WE()
        self.q_emb = QE()
        self.wa_emb = WE()
        self.ans_emb = QE()
        self.t_att = TriAttWrap()
        self.t_net = nn.ModuleList([TC(HID) for _ in range(gamma)])
        self.q_prj = nn.ModuleList([FC([HID, HID], act="", drop=0.2)
                                    for _ in range(gamma)])
        self.a_prj = nn.ModuleList([FC([HID, HID], act="", drop=0.2)
                                    for _ in range(gamma)])
        self.classifier = nn.Module()
        self.classifier.main = nn.Sequential(
            weight_norm(nn.Linear(HID, 2 * HID), dim=None), nn.ReLU(),
            nn.Dropout(0.5),
            weight_norm(nn.Linear(2 * HID, 11), dim=None))


def test_export_cti_strict_torch_load():
    """The exported state_dict loads strict=True into a reference-faithful
    torch skeleton — key names, Sequential indices, and shapes all match
    what the reference's CTI module tree declares."""
    model = build_model(_cfg(model="cti"))
    params = model.init(jax.random.PRNGKey(3))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(model, params).items()}

    skel = TorchCTISkeleton()
    # weight-norm modules expose weight_g/weight_v; load the exported dict
    missing, unexpected = skel.load_state_dict(sd, strict=False)
    assert not unexpected, f"exported keys the reference would reject: {unexpected}"
    assert not missing, f"reference keys the export lacks: {missing}"


class BCReal(nn.Module):
    """Reference-faithful BCNet param surface (bc.py): FCNets with dropout
    0.2, optional h_mat/h_bias (attention regime) or h_net (k-fold)."""

    def __init__(self, k=1, h_out=None, with_h_net=False):
        super().__init__()
        self.v_net = FC([V_DIM, HID * k], drop=0.2)
        self.q_net = FC([HID, HID * k], drop=0.2)
        if h_out is not None:
            self.h_mat = nn.Parameter(torch.randn(1, h_out, 1, HID * k))
            self.h_bias = nn.Parameter(torch.randn(1, h_out, 1, 1))
        if with_h_net:
            self.h_net = weight_norm(nn.Linear(HID * k, 1), dim=None)


class BiAttWrap(nn.Module):
    def __init__(self, glimpse):
        super().__init__()
        self.logits = weight_norm(BCReal(k=3, h_out=glimpse), name="h_mat",
                                  dim=None)


class TorchBanSkeleton(nn.Module):
    def __init__(self, gamma=2):
        super().__init__()
        self.w_emb = WE()
        self.q_emb = QE()
        self.v_att = BiAttWrap(gamma)
        self.b_net = nn.ModuleList([BCReal(k=1) for _ in range(gamma)])
        self.q_prj = nn.ModuleList([FC([HID, HID], act="", drop=0.2)
                                    for _ in range(gamma)])
        self.c_prj = nn.ModuleList([FC([11, HID], act="ReLU", drop=0.0)
                                    for _ in range(gamma)])
        self.counter = nn.Module()
        self.counter.f = nn.ModuleList()
        for _ in range(8):
            m = nn.Module()
            m.weight = nn.Parameter(torch.randn(17))
            self.counter.f.append(m)
        self.classifier = nn.Module()
        self.classifier.main = nn.Sequential(
            weight_norm(nn.Linear(HID, 2 * HID), dim=None), nn.ReLU(),
            nn.Dropout(0.5),
            weight_norm(nn.Linear(2 * HID, 11), dim=None))


def test_export_ban_strict_torch_load():
    """BAN+counter export loads strict into a reference-faithful skeleton."""
    model = build_model(_cfg(model="ban", use_counter=True, objects=10))
    params = model.init(jax.random.PRNGKey(4))
    sd = {k: torch.from_numpy(np.array(v, np.float32, copy=True))
          for k, v in export_state_dict(model, params).items()}
    skel = TorchBanSkeleton()
    missing, unexpected = skel.load_state_dict(sd, strict=False)
    # the b_net k=1 regime has h_net in vqatpu only when h_out None; the
    # skeleton omits it like the reference's None-h_out path
    assert not unexpected, f"exported keys the reference would reject: {unexpected}"
    assert not missing, f"reference keys the export lacks: {missing}"
