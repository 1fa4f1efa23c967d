"""Word embedding with pad row and optional frozen-copy concat (op 'c').

Reference: ``/root/reference/src/language_model.py:11-47``.
``nn.Embedding(ntoken+1, emb_dim, padding_idx=ntoken)`` — the last row is the
pad token, initialized to zero and excluded from gradients.  When ``'c' in
op`` a second, *frozen* embedding table is concatenated along features
(300 -> 600-d); after tf-idf loading the frozen copy becomes trainable
(``init_embedding``, ``language_model.py:28-40``).

The pad row is handled by multiplying the table with a row mask inside
``apply`` — lookups of the pad index read zeros and its gradient is
structurally zero, with no optimizer masking needed.  Trainability of the
frozen copy *is* optimizer-level: see ``trainable_mask``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vqatpu.ops.module import Ctx, config, dropout


@config
class WordEmbedding:
    ntoken: int
    emb_dim: int = 300
    dropout: float = 0.0
    op: str = ""  # 'c' => concat frozen copy

    @property
    def cat(self) -> bool:
        return "c" in self.op

    @property
    def out_dim(self) -> int:
        return self.emb_dim * (2 if self.cat else 1)

    def init(self, key: jax.Array):
        # torch nn.Embedding default: N(0, 1), pad row zeroed.  apply() masks
        # pad lookups so the stored pad row is never read here, but it IS
        # read by torch after export_torch transplants these params — keep it
        # zero so both frameworks agree (torch returns weight[padding_idx]
        # verbatim for pad tokens).
        k1, k2 = jax.random.split(key)
        shape = (self.ntoken + 1, self.emb_dim)
        pad = jnp.zeros((1, self.emb_dim))
        p = {"emb": jax.random.normal(k1, shape).at[-1:].set(pad)}
        if self.cat:
            p["emb_"] = jax.random.normal(k2, shape).at[-1:].set(pad)
        return p

    def load_pretrained(
        self,
        p,
        weight_init: np.ndarray,
        tfidf: Optional[np.ndarray] = None,
        tfidf_weights: Optional[np.ndarray] = None,
    ):
        """Port of ``init_embedding`` (``language_model.py:28-40``).

        ``weight_init``: [ntoken, emb_dim] GloVe matrix.  With tf-idf, extra
        weighted-vocab rows are appended and the whole table is mixed by the
        (sparse, here dense) tf-idf matrix.  Returns updated params.
        """
        w = np.asarray(weight_init, np.float32)
        assert w.shape == (self.ntoken, self.emb_dim), (w.shape, self.ntoken, self.emb_dim)
        emb = np.asarray(p["emb"]).copy()
        emb[: self.ntoken] = w
        out = dict(p, emb=jnp.asarray(emb))
        if tfidf is not None:
            if tfidf_weights is not None and tfidf_weights.size > 0:
                w = np.concatenate([w, np.asarray(tfidf_weights, np.float32)], 0)
            w = np.asarray(tfidf, np.float32) @ w  # (N x N') x (N' x F)
        if self.cat:
            emb_ = np.asarray(p["emb_"]).copy()
            clone = np.zeros_like(emb_)
            clone[: w.shape[0]] = w
            emb_[: self.ntoken] = clone[: self.ntoken]
            out["emb_"] = jnp.asarray(emb_)
        return out

    def trainable_mask(self, p, tfidf_loaded: bool = False):
        """Pytree of bools mirroring params: the frozen copy only becomes
        trainable once tf-idf weights were loaded (``language_model.py:35``)."""
        mask = {"emb": True}
        if self.cat:
            mask["emb_"] = bool(tfidf_loaded)
        return mask

    def apply(self, p, x: jnp.ndarray, ctx: Optional[Ctx] = None) -> jnp.ndarray:
        # padding_idx semantics: zero output for pad tokens AND zero gradient
        # to the pad row.  Masking the *gathered output* (not the whole
        # table) gives both — the cotangent scatters 0 into the pad row —
        # and costs O(B*Q*dim) instead of O(ntoken*dim) per step.
        out_mask = (x != self.ntoken).astype(p["emb"].dtype)[..., None]
        emb = jnp.take(p["emb"], x, axis=0) * out_mask
        if self.cat:
            emb_ = jnp.take(p["emb_"], x, axis=0) * out_mask
            emb = jnp.concatenate([emb, emb_], axis=-1)
        return dropout(emb, self.dropout, ctx)
