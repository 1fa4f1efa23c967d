"""MC (multiple-choice, Visual7W) model assembly.

Reference: ``/root/reference/src/MC/base_model.py``.  MC models carry an
answer-candidate stream and emit 2-way match/non-match logits; the training
loop expands each sample x4 candidates (``MC/train.py:74-83``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig
from vqatpu.ops import (
    BCNet,
    BiAttention,
    Counter,
    Ctx,
    FCNet,
    QuestionEmbedding,
    SimpleClassifier,
    StackedAttention,
    TCNet,
    TriAttention,
    WordEmbedding,
    box_mask_from_features,
)
from vqatpu.ops.module import config


@config
class BanModelMC:
    """BAN with a second BiAttention over (v, answer) (``MC/base_model.py:19-77``)."""

    cfg: ModelConfig

    @property
    def w_emb(self):
        return WordEmbedding(self.cfg.ntoken, 300, 0.0, self.cfg.op)

    @property
    def q_emb(self):
        return QuestionEmbedding(self.cfg.word_dim, self.cfg.num_hid,
                                 nlayers=self.cfg.num_layers)

    @property
    def v_att(self):
        return BiAttention(self.cfg.v_dim, self.cfg.num_hid, self.cfg.num_hid,
                           self.cfg.gamma)

    @property
    def b_net(self):
        return BCNet(self.cfg.v_dim, self.cfg.num_hid, self.cfg.num_hid, None, k=1)

    @property
    def prj(self):
        return FCNet((self.cfg.num_hid, self.cfg.num_hid), "", 0.2)

    @property
    def c_prj(self):
        return FCNet((self.cfg.objects + 1, self.cfg.num_hid), "ReLU", 0.0)

    @property
    def counter(self):
        return Counter(self.cfg.objects) if self.cfg.use_counter else None

    @property
    def classifier(self):
        return SimpleClassifier(self.cfg.num_hid, self.cfg.num_hid * 2, 2,
                                self.cfg.activation, self.cfg.dropout)

    def init(self, key: jax.Array):
        g = self.cfg.gamma
        ks = jax.random.split(key, 8 + 5 * g)
        p = {
            "w_emb": self.w_emb.init(ks[0]),
            "q_emb": self.q_emb.init(ks[1]),
            "wa_emb": self.w_emb.init(ks[2]),
            "ans_emb": self.q_emb.init(ks[3]),
            "v_att": self.v_att.init(ks[4]),
            "va_att": self.v_att.init(ks[5]),
            "classifier": self.classifier.init(ks[6]),
        }
        for i in range(g):
            p[f"b_net{i}"] = self.b_net.init(ks[8 + 5 * i])
            p[f"tva_net{i}"] = self.b_net.init(ks[9 + 5 * i])
            p[f"q_prj{i}"] = self.prj.init(ks[10 + 5 * i])
            p[f"a_prj{i}"] = self.prj.init(ks[11 + 5 * i])
            if self.counter is not None:
                p[f"c_prj{i}"] = self.c_prj.init(ks[12 + 5 * i])
        if self.counter is not None:
            p["counter"] = self.counter.init(ks[7])
        return p

    def apply(self, p, batch, ctx: Optional[Ctx] = None):
        v, b, q, a = batch["v"], batch.get("b"), batch["q"], batch["a"]
        v_mask = batch.get("v_mask")
        if v_mask is None:
            v_mask = box_mask_from_features(v)

        w = self.w_emb.apply(p["w_emb"], q, ctx)
        q_state = self.q_emb.apply_all(p["q_emb"], w, ctx)
        wa = self.w_emb.apply(p["wa_emb"], a, ctx)
        a_state = self.q_emb.apply_all(p["ans_emb"], wa, ctx)

        # V-minor layout (see BanModel FFOE + PROFILE.md)
        att_qv, logits_qv = self.v_att.apply_gqv(p["v_att"], v, q_state,
                                                 v_mask, ctx)
        va_att_qv, _ = self.v_att.apply_gqv(p["va_att"], v, a_state,
                                            v_mask, ctx)
        if self.counter is not None:
            boxes = jnp.swapaxes(b[:, :, :4], 1, 2)

        for g in range(self.cfg.gamma):
            b_emb = self.b_net.apply_with_weights_qv(
                p[f"b_net{g}"], v, q_state, att_qv[:, g], ctx)
            va_emb = self.b_net.apply_with_weights_qv(
                p[f"tva_net{g}"], v, a_state, va_att_qv[:, g], ctx)
            q_state = self.prj.apply(p[f"q_prj{g}"], b_emb[:, None, :], ctx) + q_state
            a_state = self.prj.apply(p[f"a_prj{g}"], va_emb[:, None, :], ctx) + a_state
            if self.counter is not None:
                atten = logits_qv[:, g].max(axis=1)
                embed = self.counter.apply(p["counter"], boxes, atten, ctx)
                q_state = q_state + self.c_prj.apply(p[f"c_prj{g}"], embed, ctx)[:, None, :]

        pooled = q_state.sum(1) + a_state.sum(1)
        out = self.classifier.apply(p["classifier"], pooled, ctx)
        return out, jnp.swapaxes(att_qv, 2, 3)


@config
class TanModel:
    """CTI for MC (``MC/base_model.py:112-152``) — same trilinear core as the
    FFOE CTIModel but with a 2-way classifier; returns (logits, att)."""

    cfg: ModelConfig

    @property
    def w_emb(self):
        return WordEmbedding(self.cfg.ntoken, 300, 0.0, self.cfg.op)

    @property
    def q_emb(self):
        return QuestionEmbedding(self.cfg.word_dim, self.cfg.num_hid,
                                 nlayers=self.cfg.num_layers)

    @property
    def v_att(self):
        return TriAttention(self.cfg.v_dim, self.cfg.num_hid, self.cfg.num_hid,
                            self.cfg.h_mm, 1, self.cfg.rank, self.cfg.gamma,
                            self.cfg.k, backend=self.cfg.kernel_backend)

    @property
    def t_net(self):
        return TCNet(self.cfg.v_dim, self.cfg.num_hid, self.cfg.num_hid,
                     self.cfg.h_mm, self.cfg.h_out, self.cfg.rank, 1, k=2,
                     joint_only=True, backend=self.cfg.kernel_backend)

    @property
    def prj(self):
        return FCNet((self.cfg.num_hid, self.cfg.num_hid), "", 0.2)

    @property
    def classifier(self):
        return SimpleClassifier(self.cfg.num_hid, self.cfg.num_hid * 2, 2,
                                self.cfg.activation, self.cfg.dropout)

    def init(self, key: jax.Array):
        ks = jax.random.split(key, 6 + 3 * self.cfg.gamma)
        p = {
            "w_emb": self.w_emb.init(ks[0]),
            "q_emb": self.q_emb.init(ks[1]),
            "wa_emb": self.w_emb.init(ks[2]),
            "ans_emb": self.q_emb.init(ks[3]),
            "v_att": self.v_att.init(ks[4]),
            "classifier": self.classifier.init(ks[5]),
        }
        for g in range(self.cfg.gamma):
            p[f"t_net{g}"] = self.t_net.init(ks[6 + 3 * g])
            p[f"q_prj{g}"] = self.prj.init(ks[7 + 3 * g])
            p[f"a_prj{g}"] = self.prj.init(ks[8 + 3 * g])
        return p

    def apply(self, p, batch, ctx: Optional[Ctx] = None):
        v, q, a = batch["v"], batch["q"], batch["a"]
        v_mask = batch.get("v_mask")
        if v_mask is None:
            v_mask = box_mask_from_features(v)

        w = self.w_emb.apply(p["w_emb"], q, ctx)
        wa = self.w_emb.apply(p["wa_emb"], a, ctx)
        # separate scans beat the dual 2-batched scan by measurement
        # (see CTIModel.apply + PROFILE.md)
        q_state = self.q_emb.apply_all(p["q_emb"], w, ctx)
        a_state = self.q_emb.apply_all(p["ans_emb"], wa, ctx)

        # V-minor attention layout (see CTIModel.apply + PROFILE.md)
        qav = self.cfg.kernel_backend != "pallas"
        if qav:
            att_g = self.v_att.apply_gqav(p["v_att"], v, q_state, a_state,
                                          v_mask, ctx)
        else:
            att, _ = self.v_att.apply(p["v_att"], v, q_state, a_state, v_mask,
                                      ctx, return_logits=False)
        for g in range(self.cfg.gamma):
            if qav:
                joint = self.t_net.apply_with_weights_qav(
                    p[f"t_net{g}"], v, q_state, a_state, att_g[:, g], ctx)
            else:
                joint = self.t_net.apply_with_weights(
                    p[f"t_net{g}"], v, q_state, a_state, att[..., g], ctx)
            q_state = self.prj.apply(p[f"q_prj{g}"], joint[:, None, :], ctx) + q_state
            a_state = self.prj.apply(p[f"a_prj{g}"], joint[:, None, :], ctx) + a_state

        pooled = q_state.sum(1) + a_state.sum(1)
        out = self.classifier.apply(p["classifier"], pooled, ctx)
        if qav:
            att = jnp.transpose(att_g, (0, 4, 2, 3, 1))
        return out, att


@config
class StackedAttentionModelMC:
    """SAN for MC: question + answer attention streams summed
    (``MC/base_model.py:80-109``, ``build_stacked_attention`` at ``:211-230``)."""

    cfg: ModelConfig

    @property
    def w_emb(self):
        return WordEmbedding(self.cfg.ntoken, 300, 0.0, self.cfg.op)

    @property
    def q_emb(self):
        return QuestionEmbedding(self.cfg.word_dim, self.cfg.num_hid,
                                 nlayers=self.cfg.num_layers)

    @property
    def v_att(self):
        return StackedAttention(self.cfg.num_stacks, self.cfg.v_dim,
                                self.cfg.num_hid, self.cfg.num_hid,
                                self.cfg.dropout)

    @property
    def classifier(self):
        return SimpleClassifier(self.cfg.num_hid, self.cfg.num_hid * 2, 2,
                                self.cfg.activation, self.cfg.dropout)

    def init(self, key: jax.Array):
        ks = jax.random.split(key, 7)
        return {
            "w_emb": self.w_emb.init(ks[0]),
            "q_emb": self.q_emb.init(ks[1]),
            "wa_emb": self.w_emb.init(ks[2]),
            "a_emb": self.q_emb.init(ks[3]),
            "v_att": self.v_att.init(ks[4]),
            "va_att": self.v_att.init(ks[5]),
            "classifier": self.classifier.init(ks[6]),
        }

    def apply(self, p, batch, ctx: Optional[Ctx] = None):
        v, q, a = batch["v"], batch["q"], batch["a"]
        w = self.w_emb.apply(p["w_emb"], q, ctx)
        q_last = self.q_emb.apply_last(p["q_emb"], w, ctx)
        wa = self.w_emb.apply(p["wa_emb"], a, ctx)
        a_last = self.q_emb.apply_last(p["a_emb"], wa, ctx)
        vq = self.v_att.apply(p["v_att"], v, q_last, ctx=ctx)
        va = self.v_att.apply(p["va_att"], v, a_last, ctx=ctx)
        out = self.classifier.apply(p["classifier"], vq + va, ctx)
        return out, None
