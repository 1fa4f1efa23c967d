"""FFOE (free-form open-ended) model assembly: BAN / SAN / CTI.

Reference: ``/root/reference/src/FFOE/base_model.py``.  Shapes:
``v [B, V, v_dim]`` region features, ``b [B, V, 6]`` spatials,
``q [B, Q]`` question token ids, ``a [B, A]`` answer token ids (CTI only).

All models expose ``init(key) -> params`` and
``apply(params, batch, ctx) -> (logits, att)`` where ``batch`` is a dict
with keys ``v, b, q, a, v_mask`` (unused keys ignored) — one uniform
signature so the jitted train step is model-agnostic.
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
class BanModel:
    """Bilinear attention network with glimpse-residual question updates and
    optional counting branch (``FFOE/base_model.py:21-67``)."""

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
    def q_prj(self):
        return FCNet((self.cfg.num_hid, self.cfg.num_hid), "", 0.2)

    @property
    def c_prj(self):
        return FCNet((self.cfg.objects + 1, self.cfg.num_hid), "ReLU", 0.0)

    @property
    def counter(self):
        return Counter(self.cfg.objects) if self.cfg.use_counter else None

    @property
    def classifier(self):
        return SimpleClassifier(self.cfg.num_hid, self.cfg.num_hid * 2,
                                self.cfg.num_classes, self.cfg.activation,
                                self.cfg.dropout)

    def init(self, key: jax.Array):
        ks = jax.random.split(key, 6 + 3 * self.cfg.gamma)
        p = {
            "w_emb": self.w_emb.init(ks[0]),
            "q_emb": self.q_emb.init(ks[1]),
            "v_att": self.v_att.init(ks[2]),
            "classifier": self.classifier.init(ks[3]),
        }
        for g in range(self.cfg.gamma):
            p[f"b_net{g}"] = self.b_net.init(ks[6 + 3 * g])
            p[f"q_prj{g}"] = self.q_prj.init(ks[7 + 3 * g])
            if self.counter is not None:
                p[f"c_prj{g}"] = self.c_prj.init(ks[8 + 3 * g])
        if self.counter is not None:
            p["counter"] = self.counter.init(ks[4])
        return p

    def apply(self, p, batch, ctx: Optional[Ctx] = None):
        v, b, q = batch["v"], batch.get("b"), batch["q"]
        v_mask = batch.get("v_mask")
        if v_mask is None:
            v_mask = box_mask_from_features(v)

        w = self.w_emb.apply(p["w_emb"], q, ctx)
        q_state = self.q_emb.apply_all(p["q_emb"], w, ctx)  # [B, Q, H]

        # V-minor [B, G, Q, V] attention layout through the glimpse loop
        # (lane efficiency at (8,128) tiling — see PROFILE.md)
        att_qv, logits_qv = self.v_att.apply_gqv(p["v_att"], v, q_state,
                                                 v_mask, ctx)
        if self.counter is not None:
            boxes = jnp.swapaxes(b[:, :, :4], 1, 2)  # [B, 4, V]

        q_states = []
        for g in range(self.cfg.gamma):
            b_emb = self.b_net.apply_with_weights_qv(
                p[f"b_net{g}"], v, q_state, att_qv[:, g], ctx
            )
            q_state = self.q_prj.apply(p[f"q_prj{g}"], b_emb[:, None, :], ctx) + q_state
            if self.counter is not None:
                # per-box max logit over Q; -inf on padded boxes -> sigmoid 0
                atten = logits_qv[:, g].max(axis=1)
                embed = self.counter.apply(p["counter"], boxes, atten, ctx)
                q_state = q_state + self.c_prj.apply(p[f"c_prj{g}"], embed, ctx)[:, None, :]
            q_states.append(q_state)

        pooled = jnp.stack(q_states, 1).sum(1)  # [B, Q, H]
        out = self.classifier.apply(p["classifier"], pooled.sum(1), ctx)
        # API layout [B, G, V, Q]; dead code when the caller discards att
        att = jnp.swapaxes(att_qv, 2, 3)
        return out, att


@config
class StackedAttentionModel:
    """SAN (``FFOE/base_model.py:70-92``)."""

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
        return SimpleClassifier(self.cfg.num_hid, self.cfg.num_hid * 2,
                                self.cfg.num_classes, self.cfg.activation,
                                self.cfg.dropout)

    def init(self, key: jax.Array):
        ks = jax.random.split(key, 4)
        return {
            "w_emb": self.w_emb.init(ks[0]),
            "q_emb": self.q_emb.init(ks[1]),
            "v_att": self.v_att.init(ks[2]),
            "classifier": self.classifier.init(ks[3]),
        }

    def apply(self, p, batch, ctx: Optional[Ctx] = None):
        v, q = batch["v"], batch["q"]
        w = self.w_emb.apply(p["w_emb"], q, ctx)
        q_last = self.q_emb.apply_last(p["q_emb"], w, ctx)  # [B, H]
        att = self.v_att.apply(p["v_att"], v, q_last, ctx=ctx)
        out = self.classifier.apply(p["classifier"], att, ctx)
        return out, None


@config
class CTIModel:
    """Compact Trilinear Interaction model (``FFOE/base_model.py:95-136``):
    dual GRU streams (question + answer), trilinear attention, per-glimpse
    fused joint embeddings with residual updates to both streams."""

    cfg: ModelConfig

    @property
    def w_emb(self):
        return WordEmbedding(self.cfg.ntoken, 300, 0.0, self.cfg.op)

    @property
    def q_emb(self):
        return QuestionEmbedding(self.cfg.word_dim, self.cfg.num_hid,
                                 nlayers=self.cfg.num_layers)

    @property
    def t_att(self):
        return TriAttention(self.cfg.v_dim, self.cfg.num_hid, self.cfg.num_hid,
                            self.cfg.h_mm, 1, self.cfg.rank, self.cfg.gamma,
                            self.cfg.k, backend=self.cfg.kernel_backend)

    @property
    def t_net(self):
        # k=2 joint-embedding TCNet => d = 2*h_mm = num_hid, no rank nets
        return TCNet(self.cfg.v_dim, self.cfg.num_hid, self.cfg.num_hid,
                     self.cfg.h_mm, self.cfg.h_out, self.cfg.rank, 1, k=2,
                     joint_only=True, backend=self.cfg.kernel_backend)

    @property
    def prj(self):
        return FCNet((self.cfg.num_hid, self.cfg.num_hid), "", 0.2)

    @property
    def classifier(self):
        return SimpleClassifier(self.cfg.num_hid, self.cfg.num_hid * 2,
                                self.cfg.num_classes, self.cfg.activation,
                                self.cfg.dropout)

    def init(self, key: jax.Array):
        ks = jax.random.split(key, 6 + 3 * self.cfg.gamma)
        p = {
            "w_emb": self.w_emb.init(ks[0]),
            "q_emb": self.q_emb.init(ks[1]),
            "wa_emb": self.w_emb.init(ks[2]),
            "ans_emb": self.q_emb.init(ks[3]),
            "t_att": self.t_att.init(ks[4]),
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
        # two separate scans measured FASTER than the bit-identical dual
        # 2-batched scan (2.4-2.7 vs 3.4-4.9 ms fwd+bwd interleaved) — the
        # fully-unrolled independent scans already overlap under XLA; see
        # rnn.gru_dual_apply_all + PROFILE.md
        q_state = self.q_emb.apply_all(p["q_emb"], w, ctx)  # [B, Q, H]
        a_state = self.q_emb.apply_all(p["ans_emb"], wa, ctx)  # [B, A, H]

        blockwise = (self.cfg.v_block_size > 0
                     and v.shape[1] > self.cfg.v_block_size)
        if blockwise:
            return self._apply_blockwise(p, v, q_state, a_state, v_mask, ctx)

        # One GEMM for every v-side tucker (attention + gamma glimpses): v is
        # read from HBM once and one dropout mask is drawn instead of 1+gamma
        # (see ModelConfig.fused_v_tucker).  Skipped under remat_glimpse —
        # fused activations would be stored as checkpoint inputs, defeating
        # the remat memory saving.
        fused = self.cfg.fused_v_tucker and not self.cfg.remat_glimpse
        if fused:
            from vqatpu.ops.trilinear import fused_tucker_projection

            # fusing shares ONE dropout draw + activation across the nets —
            # only valid while their configs agree (they do at reference
            # defaults; guard against future divergence)
            assert (self.t_att.tc.dropout[1] == self.t_net.dropout[1]
                    and self.t_att.tc.act == self.t_net.act), \
                "fused_v_tucker requires matching t_att/t_net tucker configs"
            nets = [p["t_att"]["tc"]["v_tucker"]] + [
                p[f"t_net{g}"]["v_tucker"] for g in range(self.cfg.gamma)]
            v_ts = fused_tucker_projection(
                nets, v, self.t_net.dropout[1], self.t_net.act, ctx)
        else:
            v_ts = [None] * (1 + self.cfg.gamma)

        # V-minor [B, G, Q, A, V] attention layout through the glimpse loop
        # (the [B,V,Q,A,G] layout's 2/3-wide minor axes waste ~60x of every
        # lane; see kernels.attention_logits_gqav + PROFILE.md).  The pallas
        # backend keeps its own fused path/layout.
        qav = self.cfg.kernel_backend != "pallas"
        if qav:
            att_g = self.t_att.apply_gqav(p["t_att"], v, q_state, a_state,
                                          v_mask, ctx, v_t=v_ts[0])
        else:
            att, _ = self.t_att.apply(p["t_att"], v, q_state, a_state, v_mask,
                                      ctx, v_t=v_ts[0], return_logits=False)

        # mask-injection oracle runs (Ctx.mask_source) carry no rng; the
        # sub-Ctx inherits the mask FIFO instead of deriving a key (eager
        # only, so jax.checkpoint never re-traces/double-consumes it)
        inject = ctx is not None and ctx.mask_source is not None

        def joint_fn(tp, v_, q_, a_, w_, sub_rng, v_t=None):
            # dropout rng enters as an ARGUMENT so jax.checkpoint's re-trace
            # replays the identical key stream (a closed-over Ctx counter
            # would advance during the extra trace and shift the masks)
            sub_ctx = (None if (sub_rng is None and not inject) else
                       Ctx(train=True, rng=sub_rng,
                           mask_bits=ctx.mask_bits if ctx else 32,
                           mask_source=ctx.mask_source if ctx else None,
                           mask_replay=ctx.mask_replay if ctx else False))
            if qav:
                return self.t_net.apply_with_weights_qav(
                    tp, v_, q_, a_, w_, sub_ctx, v_t=v_t)
            return self.t_net.apply_with_weights(tp, v_, q_, a_, w_, sub_ctx,
                                                 v_t=v_t)

        if self.cfg.remat_glimpse:
            # don't store the [B, V, d] tucker activations for backward —
            # recompute them (they dominate temp memory at large V)
            joint_fn = jax.checkpoint(joint_fn)

        for g in range(self.cfg.gamma):
            sub_rng = (ctx.dropout_key()
                       if (ctx is not None and ctx.train and not inject)
                       else None)
            w_g = att_g[:, g] if qav else att[..., g]
            joint = joint_fn(p[f"t_net{g}"], v, q_state, a_state, w_g,
                             sub_rng, v_t=v_ts[1 + g])
            q_state = self.prj.apply(p[f"q_prj{g}"], joint[:, None, :], ctx) + q_state
            a_state = self.prj.apply(p[f"a_prj{g}"], joint[:, None, :], ctx) + a_state

        pooled = q_state.sum(1) + a_state.sum(1)
        out = self.classifier.apply(p["classifier"], pooled, ctx)
        if qav:
            # API layout [B, V, Q, A, G]; dead code under jit when the
            # caller (train/eval loss) discards the attention
            att = jnp.transpose(att_g, (0, 4, 2, 3, 1))
        return out, att

    def _apply_blockwise(self, p, v, q_state, a_state, v_mask, ctx):
        """Flash-style path for large V (stretch regime): identical math,
        O(v_block_size) memory in V, attention maps not materialized."""
        from vqatpu.kernels.blockwise import (
            attention_pool_blockwise,
            precontract_qa,
            softmax_stats,
        )

        block = self.cfg.v_block_size
        v_r, q_r, a_r, T = self.t_att.tc.rank_projections(
            p["t_att"]["tc"], v, q_state, a_state, ctx)
        tqa = precontract_qa(q_r, a_r, T)
        m, den = softmax_stats(v_r, tqa, v_mask, block)

        for g in range(self.cfg.gamma):
            vt, qt, at = self.t_net.tucker_projections(
                p[f"t_net{g}"], v, q_state, a_state, ctx)
            joint = attention_pool_blockwise(v_r, tqa, v_mask, m, den, g,
                                             vt, qt, at, block)
            q_state = self.prj.apply(p[f"q_prj{g}"], joint[:, None, :], ctx) + q_state
            a_state = self.prj.apply(p[f"a_prj{g}"], joint[:, None, :], ctx) + a_state

        pooled = q_state.sum(1) + a_state.sum(1)
        out = self.classifier.apply(p["classifier"], pooled, ctx)
        return out, None
