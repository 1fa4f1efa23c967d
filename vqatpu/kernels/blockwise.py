"""Blockwise (flash-style) trilinear attention + pooling over the V axis.

SURVEY.md §5: the reference has no long-context analogue — its scaling
pressure is the ``[B, V, Q, A, G]`` trilinear attention tensor.  At the
reference's V<=100 boxes that tensor is small and the standard path
(``vqatpu/kernels/trilinear.py``) wins.  For the stretch regime (dense
ViT-style region grids, V in the thousands) this module computes the SAME
math without ever materializing the attention tensor:

- pass 1 (:func:`softmax_stats`): ``lax.scan`` over V blocks maintaining the
  running max ``m`` and rescaled denominator ``den`` per (batch, glimpse) —
  online softmax, numerically identical to the flat softmax.
- pass 2 (:func:`attention_pool_blockwise`): per glimpse, re-stream the V
  blocks, form ``exp(logits - m)`` on the fly, and accumulate the weighted
  trilinear pooling ``sum_{i,j,l} p[i,j,l] vt[i,d] qt[j,d] at[l,d]``
  directly into a ``[B, D]`` accumulator.

Peak memory is O(V_block) in V instead of O(V); the V-independent
``tqa = q (x) a (x) T`` contraction is shared across both passes.
``jax.checkpoint`` on the block body keeps backward memory O(V_block) too.

CTI semantics note: glimpse g's pooling operands depend on glimpse g-1's
joint embedding (residual updates, ``FFOE/base_model.py:129-132``), so
pass 2 runs once per glimpse; logits are recomputed per pass (the classic
flash-attention recompute-vs-materialize trade).

Measured verdict (v5e, B=64, V=2048, full CTI train step, value-readback
barrier): standard 82 ms/step at 8.0 GB temp vs blockwise 121 ms at 7.6 GB.
Unlike V x V self-attention, CTI's attention tensor scales as V*Q*A*G
(~288 B/box) while each tucker activation scales as V*D (~4 KB/box) — the
attention tensor is never the memory bottleneck, so blocking it buys little
memory and the scan serialization costs ~1.5x in time
(``ModelConfig.remat_glimpse`` is the better memory lever: -40% temp for
+20% time).  Kept (equivalence-tested, values AND gradients) for regimes
with large Q*A*G products; default off (``ModelConfig.v_block_size = 0``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_BIG = -1e30


def _pad_v_blocks(x: jnp.ndarray, block: int) -> Tuple[jnp.ndarray, int]:
    """Pad axis 1 (V) to a multiple of ``block`` and reshape to
    [n_blocks, B, block, ...]."""
    B, V = x.shape[:2]
    n_blocks = -(-V // block)
    pad = n_blocks * block - V
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((B, pad) + x.shape[2:], x.dtype)], axis=1)
    x = x.reshape(B, n_blocks, block, *x.shape[2:])
    return jnp.moveaxis(x, 1, 0), n_blocks


def precontract_qa(q_r: jnp.ndarray, a_r: jnp.ndarray, T: jnp.ndarray
                   ) -> jnp.ndarray:
    """V-independent part of the PARALIND contraction:
    tqa [B, Q, A, R, X, G]."""
    ta = jnp.einsum("blrz,rxyzg->blrxyg", a_r, T)
    return jnp.einsum("bjry,blrxyg->bjlrxg", q_r, ta)


def _block_logits(v_blk: jnp.ndarray, tqa: jnp.ndarray) -> jnp.ndarray:
    """v_blk [B, Vb, R, X] -> logits [B, Vb, Q, A, G]."""
    return jnp.einsum("birx,bjlrxg->bijlg", v_blk, tqa)


def softmax_stats(v_r: jnp.ndarray, tqa: jnp.ndarray, v_mask: jnp.ndarray,
                  block: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Online-softmax normalizers over the flattened (V, Q, A) axes.

    -> (m [B, G], den [B, G]) such that
    att[b,i,j,l,g] = exp(logits - m) * mask / den.
    """
    B = v_r.shape[0]
    G = tqa.shape[-1]
    v_blocks, _ = _pad_v_blocks(v_r, block)
    m_blocks, _ = _pad_v_blocks(v_mask.astype(jnp.float32), block)

    @jax.checkpoint
    def body(carry, inp):
        m, den = carry
        v_blk, mask_blk = inp
        logits = _block_logits(v_blk, tqa)
        mask5 = mask_blk[:, :, None, None, None]
        neg = jnp.where(mask5 > 0, logits, NEG_BIG)
        bm = neg.max(axis=(1, 2, 3))  # [B, G]
        m_new = jnp.maximum(m, bm)
        scale = jnp.exp(m - m_new)
        e = jnp.exp(neg - m_new[:, None, None, None, :]) * mask5
        den = den * scale + e.sum(axis=(1, 2, 3))
        return (m_new, den), None

    init = (jnp.full((B, G), NEG_BIG, jnp.float32),
            jnp.zeros((B, G), jnp.float32))
    (m, den), _ = jax.lax.scan(body, init, (v_blocks, m_blocks))
    return m, jnp.maximum(den, 1e-30)


def attention_pool_blockwise(v_r: jnp.ndarray, tqa: jnp.ndarray,
                             v_mask: jnp.ndarray, m: jnp.ndarray,
                             den: jnp.ndarray, g: int, vt: jnp.ndarray,
                             qt: jnp.ndarray, at: jnp.ndarray,
                             block: int) -> jnp.ndarray:
    """Weighted trilinear pooling for glimpse ``g`` without materializing the
    attention: -> joint [B, D]."""
    v_blocks, _ = _pad_v_blocks(v_r, block)
    vt_blocks, _ = _pad_v_blocks(vt, block)
    m_blocks, _ = _pad_v_blocks(v_mask.astype(jnp.float32), block)
    m_g = m[:, g]
    den_g = den[:, g]

    @jax.checkpoint
    def body(acc, inp):
        v_blk, vt_blk, mask_blk = inp
        logits = _block_logits(v_blk, tqa)[..., g]  # [B, Vb, Q, A]
        mask4 = mask_blk[:, :, None, None]
        e = jnp.exp(jnp.where(mask4 > 0, logits, NEG_BIG)
                    - m_g[:, None, None, None]) * mask4
        wq = jnp.einsum("bvqa,bqd->bvad", e, qt)
        wqa = jnp.einsum("bvad,bad->bvd", wq, at)
        return acc + jnp.einsum("bvd,bvd->bd", wqa, vt_blk), None

    init = jnp.zeros((v_r.shape[0], vt.shape[-1]), jnp.float32)
    acc, _ = jax.lax.scan(body, init, (v_blocks, vt_blocks, m_blocks))
    return acc / den_g[:, None]
