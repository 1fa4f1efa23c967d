"""Export vqatpu param pytrees back to reference-layout PyTorch checkpoints.

The inverse of :mod:`vqatpu.tools.import_torch`: a model trained here can be
saved as ``model_epoch{N}.pth`` in the reference's ``utils.save_model``
payload (``{epoch, model_state, optimizer_state}``,
``/root/reference/src/utils.py:98-106``) and loaded by the reference's
``test.py`` (``FFOE/test.py:157-166``) — closing the parity loop in BOTH
directions (import is value-validated per family in
``tests/test_import_torch.py``; export is roundtrip- and torch-load
validated in ``tests/test_export_torch.py``).

Key-naming facts mirrored from the reference module tree:
- FCNet is ``nn.Sequential`` named ``main`` where each layer contributes
  ``[Dropout (if p>0), weight_norm(Linear), Act (if non-empty)]``
  (``fc.py:14-31``) — the Linear's index therefore depends on the FCNet's
  (dropout, act) config, which the exporter derives from the vqatpu module
  objects themselves.
- SimpleClassifier is ``[wn Linear, Act, Dropout, wn Linear]``
  (``classifier.py:16-26``) — Linears at ``main.0`` / ``main.3``.
- ``weight_norm(..., dim=None)`` stores scalar ``weight_g`` + ``weight_v``.
- TCNet's core tensor is stored with a leading parameter dim:
  ``T_g [1, rank, x, y, z, g, h_out]`` (``tc.py:29-31``).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from vqatpu.ops.tensor import paralind_core_scramble


def _np(x):
    return np.asarray(x, np.float32)


def _linear_index(fcnet, layer: int) -> int:
    """Index of the ``layer``-th Linear inside the reference Sequential."""
    idx = 0
    for _ in range(layer + 1):
        if fcnet.dropout > 0:
            idx += 1
        lin = idx
        idx += 1
        if fcnet.act:
            idx += 1
    return lin


def _put_wn(sd, prefix, p):
    sd[prefix + ".weight_v"] = _np(p["v"])
    sd[prefix + ".weight_g"] = _np(p["g"]).reshape(())
    if "b" in p:
        sd[prefix + ".bias"] = _np(p["b"])


def _put_fcnet(sd, prefix, fcnet, p):
    for j in range(len(fcnet.dims) - 1):
        _put_wn(sd, f"{prefix}.main.{_linear_index(fcnet, j)}", p[f"l{j}"])


def _put_gru(sd, prefix, p):
    # layer 0 keys are 'fwd'/'bwd'; stacked layers 'fwd_l{i}'/'bwd_l{i}'
    # (ops/rnn.py QuestionEmbedding._dir_keys); torch names them
    # weight_ih_l{i}[_reverse] on the flat nn.GRU/LSTM module
    nlayers = 1 + sum(1 for k in p if k.startswith("fwd_l"))
    for layer in range(nlayers):
        suffix = "" if layer == 0 else f"_l{layer}"
        pairs = [("", p[f"fwd{suffix}"])]
        if f"bwd{suffix}" in p:
            pairs.append(("_reverse", p[f"bwd{suffix}"]))
        for name, sub in pairs:
            sd[f"{prefix}.rnn.weight_ih_l{layer}{name}"] = _np(sub["w_ih"])
            sd[f"{prefix}.rnn.weight_hh_l{layer}{name}"] = _np(sub["w_hh"])
            sd[f"{prefix}.rnn.bias_ih_l{layer}{name}"] = _np(sub["b_ih"])
            sd[f"{prefix}.rnn.bias_hh_l{layer}{name}"] = _np(sub["b_hh"])


def _put_word_emb(sd, prefix, p):
    sd[prefix + ".emb.weight"] = _np(p["emb"])
    if "emb_" in p:
        sd[prefix + ".emb_.weight"] = _np(p["emb_"])


def _put_bcnet(sd, prefix, bc, p, attention: bool):
    _put_fcnet(sd, prefix + ".v_net", bc.v_net, p["v_net"])
    _put_fcnet(sd, prefix + ".q_net", bc.q_net, p["q_net"])
    if attention:
        sd[prefix + ".h_mat_v"] = _np(p["h_mat"])
        sd[prefix + ".h_bias"] = _np(p["h_bias"])
    if "h_net" in p:
        _put_wn(sd, prefix + ".h_net", p["h_net"])


def _put_biattention(sd, prefix, att, p):
    _put_bcnet(sd, prefix + ".logits", att.bc, p["bc"], attention=True)
    sd[prefix + ".logits.h_mat_g"] = _np(p["h_mat_g"]).reshape(())


def _put_linear(sd, prefix, p):
    """Plain nn.Linear (SAN's StackedAttention uses no weight norm)."""
    sd[prefix + ".weight"] = _np(p["w"])
    if "b" in p:
        sd[prefix + ".bias"] = _np(p["b"])


def _put_san_att(sd, prefix, p):
    """StackedAttention naming (attention.py:78-88): fc11..fc15 + a flat
    ``layers`` ModuleList with 3 Linears per extra stack."""
    for nm in ("fc11", "fc12", "fc13", "fc14", "fc15"):
        _put_linear(sd, f"{prefix}.{nm}", p[nm])
    s = 0
    while f"w{s}_q" in p:
        _put_linear(sd, f"{prefix}.layers.{3 * s}", p[f"w{s}_q"])
        _put_linear(sd, f"{prefix}.layers.{3 * s + 1}", p[f"w{s}_i"])
        _put_linear(sd, f"{prefix}.layers.{3 * s + 2}", p[f"w{s}_h"])
        s += 1


def _put_classifier(sd, prefix, p):
    _put_wn(sd, f"{prefix}.main.0", p["l1"])
    _put_wn(sd, f"{prefix}.main.3", p["l2"])


def _put_counter(sd, prefix, p):
    for i in range(8):
        sd[f"{prefix}.f.{i}.weight"] = _np(p[f"f{i}"]["weight"])


def _put_tcnet(sd, prefix, tc, p):
    _put_fcnet(sd, prefix + ".v_tucker", tc._tucker(tc.v_dim, tc.dropout[1]),
               p["v_tucker"])
    _put_fcnet(sd, prefix + ".q_tucker", tc._tucker(tc.q_dim, tc.dropout[0]),
               p["q_tucker"])
    _put_fcnet(sd, prefix + ".a_tucker", tc._tucker(tc.a_dim, tc.dropout[0]),
               p["a_tucker"])
    if "T_g" in p:
        # vqatpu stores the clean-einsum core; the reference's ModeProduct
        # reads a scrambled layout (ops/tensor.py:paralind_core_unscramble) —
        # export the inverse so the reference computes identical logits
        t_g = _np(p["T_g"])
        assert t_g.shape[-1] == 1, "ModeProduct only runs with h_out 1"
        sd[prefix + ".T_g"] = paralind_core_scramble(t_g[..., 0])[..., None][None]
        for stream, drop in (("v_net", tc.dropout[1]), ("q_net", tc.dropout[0]),
                             ("a_net", tc.dropout[0])):
            net = tc._rank_net(drop)
            stacked = p[stream]["l0"]
            for r in range(tc.rank):
                _put_fcnet(sd, f"{prefix}.{stream}.{r}", net,
                           {"l0": {k: np.asarray(v)[r]
                                   for k, v in stacked.items()}})


def export_state_dict(model, params) -> Dict[str, np.ndarray]:
    """vqatpu params -> reference-layout flat state_dict (numpy values)."""
    name = type(model).__name__
    sd: Dict[str, np.ndarray] = {}
    _put_word_emb(sd, "w_emb", params["w_emb"])
    _put_gru(sd, "q_emb", params["q_emb"])
    _put_classifier(sd, "classifier", params["classifier"])

    if name == "StackedAttentionModel":
        _put_san_att(sd, "v_att", params["v_att"])
    elif name == "StackedAttentionModelMC":
        # MC SAN: dual question/answer attention streams
        # (MC/base_model.py:80-109)
        _put_word_emb(sd, "wa_emb", params["wa_emb"])
        _put_gru(sd, "a_emb", params["a_emb"])
        _put_san_att(sd, "v_att", params["v_att"])
        _put_san_att(sd, "va_att", params["va_att"])
    elif name == "BanModel":
        _put_biattention(sd, "v_att", model.v_att, params["v_att"])
        for g in range(model.cfg.gamma):
            _put_bcnet(sd, f"b_net.{g}", model.b_net, params[f"b_net{g}"],
                       attention=False)
            _put_fcnet(sd, f"q_prj.{g}", model.q_prj, params[f"q_prj{g}"])
            if model.cfg.use_counter:
                _put_fcnet(sd, f"c_prj.{g}", model.c_prj, params[f"c_prj{g}"])
        if model.cfg.use_counter:
            _put_counter(sd, "counter", params["counter"])
    elif name in ("CTIModel", "TanModel"):
        att_attr = "t_att" if name == "CTIModel" else "v_att"
        att = getattr(model, att_attr)
        _put_word_emb(sd, "wa_emb", params["wa_emb"])
        _put_gru(sd, "ans_emb", params["ans_emb"])
        _put_tcnet(sd, f"{att_attr}.TriAtt", att.tc, params[att_attr]["tc"])
        for g in range(model.cfg.gamma):
            _put_tcnet(sd, f"t_net.{g}", model.t_net, params[f"t_net{g}"])
            _put_fcnet(sd, f"q_prj.{g}", model.prj, params[f"q_prj{g}"])
            _put_fcnet(sd, f"a_prj.{g}", model.prj, params[f"a_prj{g}"])
    elif name == "BanModelMC":
        _put_word_emb(sd, "wa_emb", params["wa_emb"])
        _put_gru(sd, "ans_emb", params["ans_emb"])
        _put_biattention(sd, "v_att", model.v_att, params["v_att"])
        _put_biattention(sd, "va_att", model.v_att, params["va_att"])
        for g in range(model.cfg.gamma):
            _put_bcnet(sd, f"b_net.{g}", model.b_net, params[f"b_net{g}"],
                       attention=False)
            _put_bcnet(sd, f"tva_net.{g}", model.b_net, params[f"tva_net{g}"],
                       attention=False)
            _put_fcnet(sd, f"q_prj.{g}", model.prj, params[f"q_prj{g}"])
            _put_fcnet(sd, f"a_prj.{g}", model.prj, params[f"a_prj{g}"])
            if model.cfg.use_counter:
                _put_fcnet(sd, f"c_prj.{g}", model.c_prj, params[f"c_prj{g}"])
        if model.cfg.use_counter:
            _put_counter(sd, "counter", params["counter"])
    else:
        raise NotImplementedError(f"torch export for {name}")
    return sd


def export_checkpoint(path: str, model, params, epoch: int = 0) -> None:
    """Write the reference's ``utils.save_model`` payload."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, np.float32, copy=True))
          for k, v in export_state_dict(model, params).items()}
    torch.save({"epoch": epoch, "model_state": sd, "optimizer_state": None},
               path)


def main(argv=None):
    """CLI: convert a vqatpu checkpoint to a reference-format ``.pth``.

    python -m vqatpu.tools.export_torch saved/model_epoch9.ckpt out.pth \
        --model cti --ntoken 20573 --v_dim 2048 --num_ans 3129 [...]
    """
    import argparse

    from vqatpu.config import ModelConfig
    from vqatpu.models import build_model
    from vqatpu.train.checkpoints import load_checkpoint

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("ckpt")
    ap.add_argument("out")
    ap.add_argument("--model", default="cti")
    ap.add_argument("--task", default="ffoe", choices=["ffoe", "mc"])
    ap.add_argument("--ntoken", type=int, required=True)
    ap.add_argument("--v_dim", type=int, default=2048)
    ap.add_argument("--num_ans", type=int, default=3129)
    ap.add_argument("--num_hid", type=int, default=1024)
    ap.add_argument("--h_mm", type=int, default=512)
    ap.add_argument("--rank", type=int, default=32)
    ap.add_argument("--gamma", type=int, default=2)
    ap.add_argument("--use_counter", action="store_true")
    args = ap.parse_args(argv)

    cfg = ModelConfig(ntoken=args.ntoken, v_dim=args.v_dim,
                      num_ans_candidates=args.num_ans, model=args.model,
                      num_hid=args.num_hid, h_mm=args.h_mm, rank=args.rank,
                      gamma=args.gamma, task=args.task,
                      use_counter=args.use_counter)
    payload = load_checkpoint(args.ckpt)
    model = build_model(cfg)
    export_checkpoint(args.out, model, payload["params"],
                      epoch=payload.get("epoch", 0))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
