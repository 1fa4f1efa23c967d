"""Recurrent question/answer encoders as ``lax.scan`` cells.

Replaces ``torch.nn.GRU/LSTM`` in ``/root/reference/src/language_model.py:50-98``.
Gate ordering and bias layout match PyTorch exactly so eval-mode logits agree
to float tolerance:

- GRU:  ``W_ih = [W_ir; W_iz; W_in]``, ``n = tanh(i_n + r * (W_hn h + b_hn))``
- LSTM: ``W_ih = [W_ii; W_if; W_ig; W_io]``

The scan carries the hidden state; the (short, <=12-step) time loop is a
compiled ``lax.scan`` — sequential by nature, but each step is a batched
(B, 3H) matmul that lands on the MXU. Init: all params
``U(-1/sqrt(hidden), 1/sqrt(hidden))`` (torch RNNBase default).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vqatpu.ops.module import Ctx, config, uniform


def _gru_gate_update(gi, gh, h):
    """Shared GRU cell gate math (torch r,z,n order — parity-critical; used
    by both the single scan and the dual 2-batched scan)."""
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _gru_scan(x_btf, w_ih, w_hh, b_ih, b_hh, reverse: bool = False):
    """x: [B, T, F] -> all hidden states [B, T, H]."""
    B = x_btf.shape[0]
    H = w_hh.shape[1]
    # Precompute input projections for every step at once: one big MXU matmul.
    gi_all = jnp.einsum("btf,gf->btg", x_btf, w_ih) + b_ih  # [B, T, 3H]

    def cell(h, gi):
        h_new = _gru_gate_update(gi, h @ w_hh.T + b_hh, h)
        return h_new, h_new

    h0 = jnp.zeros((B, H), x_btf.dtype)
    T = x_btf.shape[1]
    _, hs = jax.lax.scan(cell, h0, jnp.swapaxes(gi_all, 0, 1),
                         reverse=reverse, unroll=min(T, 16))
    return jnp.swapaxes(hs, 0, 1)  # [B, T, H]


def _lstm_scan(x_btf, w_ih, w_hh, b_ih, b_hh, reverse: bool = False):
    B = x_btf.shape[0]
    H = w_hh.shape[1]
    gi_all = jnp.einsum("btf,gf->btg", x_btf, w_ih) + b_ih  # [B, T, 4H]

    def cell(carry, gi):
        h, c = carry
        gh = h @ w_hh.T + b_hh
        i_i, i_f, i_g, i_o = jnp.split(gi, 4, axis=-1)
        h_i, h_f, h_g, h_o = jnp.split(gh, 4, axis=-1)
        i = jax.nn.sigmoid(i_i + h_i)
        f = jax.nn.sigmoid(i_f + h_f)
        g = jnp.tanh(i_g + h_g)
        o = jax.nn.sigmoid(i_o + h_o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    init = (jnp.zeros((B, H), x_btf.dtype), jnp.zeros((B, H), x_btf.dtype))
    T = x_btf.shape[1]
    _, hs = jax.lax.scan(cell, init, jnp.swapaxes(gi_all, 0, 1),
                         reverse=reverse, unroll=min(T, 16))
    return jnp.swapaxes(hs, 0, 1)


def gru_dual_apply_all(p_q, p_a, x_q: jnp.ndarray, x_a: jnp.ndarray,
                       num_hid: int):
    """Run the question and answer GRU streams (independent weights,
    different lengths) as ONE ``lax.scan``.

    The two streams' hidden GEMMs stack into a single 2-batched
    ``[2, B, H] x [2, H, 3H]`` dot per step — twice the MXU work per launch,
    and max(Tq, Ta) sequential steps instead of Tq + Ta.  The shorter
    stream's inputs are zero-padded; its emitted states at t < Ta are
    unaffected (the scan is causal), and the padded tail is sliced away.
    Bit-identical to two separate :func:`_gru_scan` calls.

    Returns (q_states [B, Tq, H], a_states [B, Ta, H]).
    """
    B, Tq = x_q.shape[:2]
    Ta = x_a.shape[1]
    T = max(Tq, Ta)
    H = num_hid

    def gi_of(p, x):
        return jnp.einsum("btf,gf->btg", x, p["w_ih"]) + p["b_ih"]

    def pad_t(g):
        if g.shape[1] == T:
            return g
        return jnp.concatenate(
            [g, jnp.zeros((B, T - g.shape[1], g.shape[2]), g.dtype)], axis=1)

    gi = jnp.stack([pad_t(gi_of(p_q, x_q)), pad_t(gi_of(p_a, x_a))])  # [2,B,T,3H]
    w_hh = jnp.stack([p_q["w_hh"], p_a["w_hh"]])                      # [2,3H,H]
    b_hh = jnp.stack([p_q["b_hh"], p_a["b_hh"]])[:, None, :]          # [2,1,3H]

    def cell(h, gi_t):
        gh = jax.lax.dot_general(
            h, w_hh, (((2,), (2,)), ((0,), (0,)))) + b_hh  # [2, B, 3H]
        h_new = _gru_gate_update(gi_t, gh, h)
        return h_new, h_new

    h0 = jnp.zeros((2, B, H), x_q.dtype)
    _, hs = jax.lax.scan(cell, h0, jnp.moveaxis(gi, 2, 0),
                         unroll=min(T, 16))  # hs [T, 2, B, H]
    return (jnp.moveaxis(hs[:Tq, 0], 0, 1), jnp.moveaxis(hs[:Ta, 1], 0, 1))


@config
class QuestionEmbedding:
    """GRU/LSTM encoder (reference ``language_model.py:50-98``).

    ``apply_all`` returns every step's hidden state ([B, T, H·ndir]);
    ``apply_last`` returns the final state (concat fwd-last/bwd-first when
    bidirectional), matching ``QuestionEmbedding.forward``.

    ``nlayers``: stacked layers with torch ``nn.GRU(num_layers=...)``
    semantics — layer ``i > 0`` consumes layer ``i-1``'s (direction-concat)
    output, with inter-layer dropout applied to every layer's output except
    the last (torch RNN ``dropout=`` behavior).  The reference's builders
    all pass 1 (``base_model.py:141`` etc.), but the component signature
    allows it (``language_model.py:51-66``) — parity-tested vs torch for
    2-layer and bidirectional stacks.
    """

    in_dim: int
    num_hid: int
    bidirect: bool = False
    rnn_type: str = "GRU"  # "GRU" | "LSTM"
    nlayers: int = 1
    dropout: float = 0.0  # between layers only, like torch nn.RNNBase

    @property
    def _ngates(self) -> int:
        return 3 if self.rnn_type == "GRU" else 4

    @property
    def _ndir(self) -> int:
        return 2 if self.bidirect else 1

    def _layer_in_dim(self, layer: int) -> int:
        return self.in_dim if layer == 0 else self.num_hid * self._ndir

    def _init_dir(self, key: jax.Array, in_dim: int):
        k = jax.random.split(key, 4)
        H, G = self.num_hid, self._ngates
        bound = 1.0 / (H ** 0.5)
        return {
            "w_ih": uniform(k[0], (G * H, in_dim), bound),
            "w_hh": uniform(k[1], (G * H, H), bound),
            "b_ih": uniform(k[2], (G * H,), bound),
            "b_hh": uniform(k[3], (G * H,), bound),
        }

    @staticmethod
    def _dir_keys(layer: int):
        """Param keys for a layer's directions; layer 0 keeps the flat
        'fwd'/'bwd' names so single-layer checkpoints are unchanged."""
        suffix = "" if layer == 0 else f"_l{layer}"
        return f"fwd{suffix}", f"bwd{suffix}"

    def init(self, key: jax.Array):
        p = {}
        keys = jax.random.split(key, 2 * self.nlayers)
        for layer in range(self.nlayers):
            fk, bk = self._dir_keys(layer)
            d = self._layer_in_dim(layer)
            p[fk] = self._init_dir(keys[2 * layer], d)
            if self.bidirect:
                p[bk] = self._init_dir(keys[2 * layer + 1], d)
        return p

    def _run(self, p_dir, x, reverse: bool):
        scan = _gru_scan if self.rnn_type == "GRU" else _lstm_scan
        return scan(x, p_dir["w_ih"], p_dir["w_hh"], p_dir["b_ih"], p_dir["b_hh"], reverse)

    def apply_all(self, p, x: jnp.ndarray, ctx: Optional[Ctx] = None) -> jnp.ndarray:
        from vqatpu.ops.module import dropout as _dropout

        out = x
        for layer in range(self.nlayers):
            fk, bk = self._dir_keys(layer)
            if layer > 0:
                out = _dropout(out, self.dropout, ctx)
            fwd = self._run(p[fk], out, reverse=False)
            if self.bidirect:
                fwd = jnp.concatenate(
                    [fwd, self._run(p[bk], out, reverse=True)], axis=-1)
            out = fwd
        return out

    def apply_last(self, p, x: jnp.ndarray, ctx: Optional[Ctx] = None) -> jnp.ndarray:
        out = self.apply_all(p, x, ctx)
        if not self.bidirect:
            return out[:, -1]
        return jnp.concatenate(
            [out[:, -1, : self.num_hid], out[:, 0, self.num_hid:]], axis=-1
        )
