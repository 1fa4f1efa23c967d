"""Blockwise (flash-style) trilinear attention+pool: numerical equivalence
with the standard materializing path, values and gradients."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.kernels.blockwise import (
    attention_pool_blockwise,
    precontract_qa,
    softmax_stats,
)
from vqatpu.kernels.trilinear import (
    attention_logits_xla,
    masked_softmax_vqa_xla,
    trilinear_pool_xla,
)
from vqatpu.models import build_model
from tests.test_models import tiny_batch, tiny_cfg

B, V, Q, A, R, X, G, D = 2, 21, 12, 3, 4, 8, 2, 16  # V not a block multiple


def _inputs(rng):
    v_r = jnp.asarray(rng.randn(B, V, R, X).astype(np.float32))
    q_r = jnp.asarray(rng.randn(B, Q, R, X).astype(np.float32))
    a_r = jnp.asarray(rng.randn(B, A, R, X).astype(np.float32))
    T = jnp.asarray(0.1 * rng.randn(R, X, X, X, G).astype(np.float32))
    mask = jnp.asarray(np.arange(V)[None] < 17).repeat(B, 0)
    return v_r, q_r, a_r, T, mask


def test_softmax_stats_match_flat_softmax(rng):
    v_r, q_r, a_r, T, mask = _inputs(rng)
    logits = attention_logits_xla(v_r, q_r, a_r, T)
    att = masked_softmax_vqa_xla(logits, mask)

    tqa = precontract_qa(q_r, a_r, T)
    m, den = softmax_stats(v_r, tqa, mask, block=8)
    # flat softmax from the online stats must equal the reference softmax
    mask5 = mask[:, :, None, None, None]
    e = jnp.exp(jnp.where(mask5, logits, -1e30) - m[:, None, None, None, :]) * mask5
    att2 = e / den[:, None, None, None, :]
    np.testing.assert_allclose(np.asarray(att2), np.asarray(att), atol=1e-6)


def test_blockwise_pool_matches_standard(rng):
    v_r, q_r, a_r, T, mask = _inputs(rng)
    vt = jnp.asarray(rng.randn(B, V, D).astype(np.float32))
    qt = jnp.asarray(rng.randn(B, Q, D).astype(np.float32))
    at = jnp.asarray(rng.randn(B, A, D).astype(np.float32))

    logits = attention_logits_xla(v_r, q_r, a_r, T)
    att = masked_softmax_vqa_xla(logits, mask)

    tqa = precontract_qa(q_r, a_r, T)
    m, den = softmax_stats(v_r, tqa, mask, block=8)
    for g in range(G):
        want = trilinear_pool_xla(vt, qt, at, att[..., g])
        got = attention_pool_blockwise(v_r, tqa, mask, m, den, g, vt, qt, at,
                                       block=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_blockwise_gradients_match(rng):
    v_r, q_r, a_r, T, mask = _inputs(rng)
    vt = jnp.asarray(rng.randn(B, V, D).astype(np.float32))
    qt = jnp.asarray(rng.randn(B, Q, D).astype(np.float32))
    at = jnp.asarray(rng.randn(B, A, D).astype(np.float32))

    def loss_standard(args):
        v_r_, T_, vt_ = args
        att = masked_softmax_vqa_xla(attention_logits_xla(v_r_, q_r, a_r, T_),
                                     mask)
        return (trilinear_pool_xla(vt_, qt, at, att[..., 0]) ** 2).sum()

    def loss_blockwise(args):
        v_r_, T_, vt_ = args
        tqa = precontract_qa(q_r, a_r, T_)
        m, den = softmax_stats(v_r_, tqa, mask, block=8)
        out = attention_pool_blockwise(v_r_, tqa, mask, m, den, 0, vt_, qt,
                                       at, block=8)
        return (out ** 2).sum()

    g1 = jax.grad(loss_standard)((v_r, T, vt))
    g2 = jax.grad(loss_blockwise)((v_r, T, vt))
    for a, b in zip(g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)


def test_cti_model_blockwise_equals_standard(rng):
    cfg = tiny_cfg(model="cti")
    cfg_blk = dataclasses.replace(cfg, v_block_size=4)  # V=8 in tiny_batch
    m_std = build_model(cfg)
    m_blk = build_model(cfg_blk)
    p = m_std.init(jax.random.PRNGKey(0))
    batch = tiny_batch(rng)

    want, att = m_std.apply(p, batch)
    got, att_blk = m_blk.apply(p, batch)
    assert att_blk is None  # blockwise path does not materialize attention
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    # gradients through the full model agree too
    def loss(model, params):
        out, _ = model.apply(params, batch)
        return (out ** 2).sum()

    g1 = jax.grad(lambda q: loss(m_std, q))(p)
    g2 = jax.grad(lambda q: loss(m_blk, q))(p)
    for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-4)
