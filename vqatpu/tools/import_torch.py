"""Import reference PyTorch checkpoints into vqatpu param pytrees.

A user of the reference can bring their trained ``model_epoch{N}.pth``
(``utils.save_model`` format: ``{epoch, model_state, optimizer_state}``)
straight into this framework: ``import_checkpoint(path, model)`` maps the
torch ``state_dict`` onto the matching vqatpu pytree.

Key mapping facts (from the reference module tree):
- FCNet is ``nn.Sequential`` named ``main`` with weight-normed Linears at
  varying indices (dropout/activation shift them) — we collect
  ``{prefix}.main.{i}.weight_v`` in index order and map to ``l0..lN``.
- ``weight_norm(..., dim=None)`` stores scalar ``weight_g`` + full
  ``weight_v`` — exactly our ``{"g", "v"}`` reparameterization.
- BiAttention wraps BCNet with ``weight_norm(name='h_mat')`` ->
  ``h_mat_g`` / ``h_mat_v`` (``attention.py:19-20``).
- GRU: ``rnn.weight_ih_l0`` etc -> ``fwd.w_ih`` etc (reverse-suffixed keys
  -> ``bwd``).
- ModuleList entries (``b_net.0`` ...) -> our ``b_net0`` ... flat keys.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from vqatpu.ops.tensor import paralind_core_unscramble


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("model_state", payload)
    return {k: _np(v) for k, v in sd.items()}


def _wn_linear(sd, prefix):
    out = {"v": sd[prefix + ".weight_v"],
           "g": np.float32(sd[prefix + ".weight_g"].reshape(()))}
    if prefix + ".bias" in sd:
        out["b"] = sd[prefix + ".bias"]
    return out


def _plain_linear(sd, prefix):
    out = {"w": sd[prefix + ".weight"]}
    if prefix + ".bias" in sd:
        out["b"] = sd[prefix + ".bias"]
    return out


def _fcnet(sd, prefix):
    """Collect weight-normed Linears under ``{prefix}.main.{i}`` in order."""
    pat = re.compile(re.escape(prefix) + r"\.main\.(\d+)\.weight_v$")
    idxs = sorted(int(m.group(1)) for k in sd if (m := pat.match(k)))
    assert idxs, f"no FCNet linears under {prefix}"
    return {f"l{j}": _wn_linear(sd, f"{prefix}.main.{i}")
            for j, i in enumerate(idxs)}


def _gru_dir(sd, prefix, layer, rev):
    name = f"l{layer}{'_reverse' if rev else ''}"
    return {
        "w_ih": sd[f"{prefix}.rnn.weight_ih_{name}"],
        "w_hh": sd[f"{prefix}.rnn.weight_hh_{name}"],
        "b_ih": sd[f"{prefix}.rnn.bias_ih_{name}"],
        "b_hh": sd[f"{prefix}.rnn.bias_hh_{name}"],
    }


def _gru(sd, prefix):
    # torch flat nn.GRU/LSTM layers -> ops/rnn.py layer keys ('fwd'/'bwd'
    # for layer 0, 'fwd_l{i}'/'bwd_l{i}' beyond)
    out = {"fwd": _gru_dir(sd, prefix, 0, rev=False)}
    if prefix + ".rnn.weight_ih_l0_reverse" in sd:
        out["bwd"] = _gru_dir(sd, prefix, 0, rev=True)
    layer = 1
    while f"{prefix}.rnn.weight_ih_l{layer}" in sd:
        out[f"fwd_l{layer}"] = _gru_dir(sd, prefix, layer, rev=False)
        if f"{prefix}.rnn.weight_ih_l{layer}_reverse" in sd:
            out[f"bwd_l{layer}"] = _gru_dir(sd, prefix, layer, rev=True)
        layer += 1
    return out


def _word_emb(sd, prefix):
    out = {"emb": sd[prefix + ".emb.weight"]}
    if prefix + ".emb_.weight" in sd:
        out["emb_"] = sd[prefix + ".emb_.weight"]
    return out


def _bcnet(sd, prefix, attention: bool):
    out = {"v_net": _fcnet(sd, prefix + ".v_net"),
           "q_net": _fcnet(sd, prefix + ".q_net")}
    if attention:
        # weight_norm(name='h_mat') over the wrapping BiAttention
        key = prefix + ".h_mat_v" if prefix + ".h_mat_v" in sd else prefix + ".h_mat"
        out["h_mat"] = sd[key]
        out["h_bias"] = sd[prefix + ".h_bias"]
    if prefix + ".h_net.weight_v" in sd:
        out["h_net"] = _wn_linear(sd, prefix + ".h_net")
    return out


def _biattention(sd, prefix):
    p = {"bc": _bcnet(sd, prefix + ".logits", attention=True)}
    p["h_mat_g"] = np.float32(sd[prefix + ".logits.h_mat_g"].reshape(()))
    return p


def _counter(sd, prefix):
    return {f"f{i}": {"weight": sd[f"{prefix}.f.{i}.weight"]} for i in range(8)}


def _classifier(sd, prefix):
    pat = re.compile(re.escape(prefix) + r"\.main\.(\d+)\.weight_v$")
    idxs = sorted(int(m.group(1)) for k in sd if (m := pat.match(k)))
    return {"l1": _wn_linear(sd, f"{prefix}.main.{idxs[0]}"),
            "l2": _wn_linear(sd, f"{prefix}.main.{idxs[1]}")}


def _tcnet(sd, prefix, rank: int):
    out = {"v_tucker": _fcnet(sd, prefix + ".v_tucker"),
           "q_tucker": _fcnet(sd, prefix + ".q_tucker"),
           "a_tucker": _fcnet(sd, prefix + ".a_tucker")}
    if prefix + ".T_g" in sd:
        # reference core [1, rank, x, y, z, g, h_out] -> [rank, x, y, z, g, h_out],
        # unscrambled into vqatpu's clean einsum parameterization: the
        # reference's ModeProduct applies a fixed element permutation to the
        # stored core (Tensor.py:6-9 mismatched view split — see
        # ops/tensor.py:paralind_core_unscramble).
        t_g = sd[prefix + ".T_g"][0]
        assert t_g.shape[-1] == 1, "ModeProduct only runs with h_out 1"
        out["T_g"] = paralind_core_unscramble(t_g[..., 0])[..., None]
        for stream in ("v_net", "q_net", "a_net"):
            per_rank = [_fcnet(sd, f"{prefix}.{stream}.{r}") for r in range(rank)]
            out[stream] = {
                "l0": {k: np.stack([p["l0"][k] for p in per_rank], 0)
                       for k in per_rank[0]["l0"]}
            }
    return out


def convert_ban_ffoe(sd: Dict[str, np.ndarray], gamma: int,
                     use_counter: bool) -> dict:
    p = {
        "w_emb": _word_emb(sd, "w_emb"),
        "q_emb": _gru(sd, "q_emb"),
        "v_att": _biattention(sd, "v_att"),
        "classifier": _classifier(sd, "classifier"),
    }
    for g in range(gamma):
        p[f"b_net{g}"] = _bcnet(sd, f"b_net.{g}", attention=False)
        p[f"q_prj{g}"] = _fcnet(sd, f"q_prj.{g}")
        if use_counter:
            p[f"c_prj{g}"] = _fcnet(sd, f"c_prj.{g}")
    if use_counter:
        p["counter"] = _counter(sd, "counter")
    return p


def convert_cti_ffoe(sd: Dict[str, np.ndarray], gamma: int, rank: int) -> dict:
    p = {
        "w_emb": _word_emb(sd, "w_emb"),
        "q_emb": _gru(sd, "q_emb"),
        "wa_emb": _word_emb(sd, "wa_emb"),
        "ans_emb": _gru(sd, "ans_emb"),
        "t_att": {"tc": _tcnet(sd, "t_att.TriAtt", rank)},
        "classifier": _classifier(sd, "classifier"),
    }
    for g in range(gamma):
        p[f"t_net{g}"] = _tcnet(sd, f"t_net.{g}", rank)
        p[f"q_prj{g}"] = _fcnet(sd, f"q_prj.{g}")
        p[f"a_prj{g}"] = _fcnet(sd, f"a_prj.{g}")
    return p


def convert_tan_mc(sd: Dict[str, np.ndarray], gamma: int, rank: int) -> dict:
    """MC TanModel (``MC/base_model.py:112-152``) — CTI layout but the
    trilinear attention attribute is named ``v_att``."""
    p = {
        "w_emb": _word_emb(sd, "w_emb"),
        "q_emb": _gru(sd, "q_emb"),
        "wa_emb": _word_emb(sd, "wa_emb"),
        "ans_emb": _gru(sd, "ans_emb"),
        "v_att": {"tc": _tcnet(sd, "v_att.TriAtt", rank)},
        "classifier": _classifier(sd, "classifier"),
    }
    for g in range(gamma):
        p[f"t_net{g}"] = _tcnet(sd, f"t_net.{g}", rank)
        p[f"q_prj{g}"] = _fcnet(sd, f"q_prj.{g}")
        p[f"a_prj{g}"] = _fcnet(sd, f"a_prj.{g}")
    return p


def convert_ban_mc(sd: Dict[str, np.ndarray], gamma: int,
                   use_counter: bool) -> dict:
    """MC BanModel (``MC/base_model.py:19-77``): dual BiAttention + answer
    stream + tva_net BCNets."""
    p = {
        "w_emb": _word_emb(sd, "w_emb"),
        "q_emb": _gru(sd, "q_emb"),
        "wa_emb": _word_emb(sd, "wa_emb"),
        "ans_emb": _gru(sd, "ans_emb"),
        "v_att": _biattention(sd, "v_att"),
        "va_att": _biattention(sd, "va_att"),
        "classifier": _classifier(sd, "classifier"),
    }
    for g in range(gamma):
        p[f"b_net{g}"] = _bcnet(sd, f"b_net.{g}", attention=False)
        p[f"tva_net{g}"] = _bcnet(sd, f"tva_net.{g}", attention=False)
        p[f"q_prj{g}"] = _fcnet(sd, f"q_prj.{g}")
        p[f"a_prj{g}"] = _fcnet(sd, f"a_prj.{g}")
        if use_counter:
            p[f"c_prj{g}"] = _fcnet(sd, f"c_prj.{g}")
    if use_counter:
        p["counter"] = _counter(sd, "counter")
    return p


def convert_state_dict(sd: Dict[str, np.ndarray], model) -> dict:
    """Dispatch on the vqatpu model class; validates shapes vs model.init."""
    import jax

    cfg = model.cfg
    name = type(model).__name__
    if name == "BanModel":
        params = convert_ban_ffoe(sd, cfg.gamma, cfg.use_counter)
    elif name == "CTIModel":
        params = convert_cti_ffoe(sd, cfg.gamma, cfg.rank)
    elif name == "TanModel":
        params = convert_tan_mc(sd, cfg.gamma, cfg.rank)
    elif name == "BanModelMC":
        params = convert_ban_mc(sd, cfg.gamma, cfg.use_counter)
    else:
        raise NotImplementedError(f"torch import for {name}")

    ref = model.init(jax.random.PRNGKey(0))

    def check(a, b, path=""):
        assert np.shape(a) == np.shape(b), (path, np.shape(a), np.shape(b))
        return np.asarray(a, np.float32)

    return jax.tree.map(check, params, ref)


def import_checkpoint(path: str, model) -> dict:
    return convert_state_dict(load_torch_state_dict(path), model)
