"""Pallas kernel parity (interpret mode on CPU) vs the XLA reference math:
values AND gradients, plus full-model xla/pallas backend equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vqatpu.kernels.trilinear import (
    _masked_softmax_pallas_vjp,
    attention_logits_xla,
    masked_softmax_vqa_xla,
    trilinear_pool_pallas,
    trilinear_pool_xla,
)

B, V, Q, A, R, X, G, D = 2, 10, 12, 3, 4, 8, 2, 32


@pytest.fixture
def tri_inputs(rng):
    v_r = jnp.asarray(rng.randn(B, V, R, X).astype(np.float32))
    q_r = jnp.asarray(rng.randn(B, Q, R, X).astype(np.float32))
    a_r = jnp.asarray(rng.randn(B, A, R, X).astype(np.float32))
    T = jnp.asarray(0.1 * rng.randn(R, X, X, X, G).astype(np.float32))
    mask = jnp.asarray(np.arange(V)[None] < 8).repeat(B, 0)
    return v_r, q_r, a_r, T, mask


def test_attention_order_matches_naive(tri_inputs):
    """The optimized contraction order equals the naive full einsum."""
    v_r, q_r, a_r, T, _ = tri_inputs
    want = jnp.einsum("birx,bjry,blrz,rxyzg->bijlg", v_r, q_r, a_r, T)
    got = attention_logits_xla(v_r, q_r, a_r, T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    # the measured-slower block-diag variant (PROFILE.md) stays correct
    from vqatpu.kernels.trilinear import attention_logits_blockdiag
    got_bd = attention_logits_blockdiag(v_r, q_r, a_r, T)
    np.testing.assert_allclose(np.asarray(got_bd), np.asarray(want), atol=2e-4)
    # ...and the hand-laid-out dot_general variant
    from vqatpu.kernels.trilinear import attention_logits_dg
    got_dg = attention_logits_dg(v_r, q_r, a_r, T)
    np.testing.assert_allclose(np.asarray(got_dg), np.asarray(want), atol=2e-4)


def test_pallas_softmax_matches_xla(tri_inputs):
    v_r, q_r, a_r, T, mask = tri_inputs
    logits = attention_logits_xla(v_r, q_r, a_r, T)
    want = masked_softmax_vqa_xla(logits, mask)
    with pltpu.force_tpu_interpret_mode():
        got = _masked_softmax_pallas_vjp(logits, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # masked rows exactly zero, mass sums to 1 per glimpse
    np.testing.assert_array_equal(np.asarray(got)[:, 8:], 0.0)
    np.testing.assert_allclose(np.asarray(got).sum((1, 2, 3)),
                               np.ones((B, G)), atol=1e-5)


def test_pallas_softmax_gradient(tri_inputs):
    v_r, q_r, a_r, T, mask = tri_inputs
    logits = attention_logits_xla(v_r, q_r, a_r, T)
    tgt = jnp.asarray(np.random.RandomState(3).rand(B, V, Q, A, G).astype(np.float32))

    def loss_xla(l):
        return ((masked_softmax_vqa_xla(l, mask) - tgt) ** 2).sum()

    def loss_pal(l):
        with pltpu.force_tpu_interpret_mode():
            return ((_masked_softmax_pallas_vjp(l, mask) - tgt) ** 2).sum()

    g_want = jax.grad(loss_xla)(logits)
    g_got = jax.grad(loss_pal)(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-5)


def test_pallas_pool_matches_xla_and_grads(rng):
    vt = jnp.asarray(rng.randn(B, V, D).astype(np.float32))
    qt = jnp.asarray(rng.randn(B, Q, D).astype(np.float32))
    at = jnp.asarray(rng.randn(B, A, D).astype(np.float32))
    w = jnp.asarray(rng.rand(B, V, Q, A).astype(np.float32))

    want = trilinear_pool_xla(vt, qt, at, w)
    with pltpu.force_tpu_interpret_mode():
        got = trilinear_pool_pallas(vt, qt, at, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def loss_xla(args):
        return (trilinear_pool_xla(*args) ** 2).sum()

    def loss_pal(args):
        with pltpu.force_tpu_interpret_mode():
            return (trilinear_pool_pallas(*args) ** 2).sum()

    g_want = jax.grad(loss_xla)((vt, qt, at, w))
    g_got = jax.grad(loss_pal)((vt, qt, at, w))
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-3)


def test_cti_model_backend_equivalence(rng):
    """Full CTI forward: pallas backend == xla backend (interpret mode)."""
    from tests.test_models import tiny_batch, tiny_cfg
    from vqatpu.models import build_model
    import dataclasses

    cfg_x = tiny_cfg(model="cti")
    cfg_p = dataclasses.replace(cfg_x, kernel_backend="pallas")
    m_x = build_model(cfg_x)
    m_p = build_model(cfg_p)
    p = m_x.init(jax.random.PRNGKey(0))
    batch = tiny_batch(rng)
    want, att_x = m_x.apply(p, batch)
    with pltpu.force_tpu_interpret_mode():
        got, att_p = m_p.apply(p, batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)
    np.testing.assert_allclose(np.asarray(att_p), np.asarray(att_x), atol=1e-5)


def test_fused_rank_softmax_matches_xla(tri_inputs):
    """The fused GEMM+softmax kernel (VERDICT r1 #9) == logits einsum +
    masked softmax, values and gradients."""
    from vqatpu.kernels.blockwise import precontract_qa
    from vqatpu.kernels.trilinear import fused_rank_softmax

    v_r, q_r, a_r, T, mask = tri_inputs
    tqa = precontract_qa(q_r, a_r, T)
    want = masked_softmax_vqa_xla(attention_logits_xla(v_r, q_r, a_r, T), mask)
    with pltpu.force_tpu_interpret_mode():
        got = fused_rank_softmax(v_r, tqa, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got)[:, 8:], 0.0)

    tgt = jnp.asarray(np.random.RandomState(5).rand(B, V, Q, A, G).astype(np.float32))

    def loss_xla(vr, qa):
        att = masked_softmax_vqa_xla(
            jnp.einsum("birx,bjlrxg->bijlg", vr, qa), mask)
        return ((att - tgt) ** 2).sum()

    def loss_pallas(vr, qa):
        return ((fused_rank_softmax(vr, qa, mask) - tgt) ** 2).sum()

    gw = jax.grad(loss_xla, argnums=(0, 1))(v_r, tqa)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pallas, argnums=(0, 1))(v_r, tqa)
    for a_, b_ in zip(gp, gw):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=1e-4)


def test_tri_attention_fused_path_full(tri_inputs, rng):
    """TriAttention(backend=pallas, return_logits=False) == xla backend."""
    from vqatpu.ops.attention import TriAttention

    v = jnp.asarray(rng.randn(B, V, 16).astype(np.float32))
    q = jnp.asarray(rng.randn(B, Q, 24).astype(np.float32))
    a = jnp.asarray(rng.randn(B, A, 24).astype(np.float32))
    mask = jnp.asarray(np.arange(V)[None] < 8).repeat(B, 0)
    att_x = TriAttention(16, 24, 24, 16, 1, 4, G, 1, backend="xla")
    att_p = TriAttention(16, 24, 24, 16, 1, 4, G, 1, backend="pallas")
    p = att_x.init(jax.random.PRNGKey(2))
    want, _ = att_x.apply(p, v, q, a, mask)
    with pltpu.force_tpu_interpret_mode():
        got, none_logits = att_p.apply(p, v, q, a, mask, return_logits=False)
    assert none_logits is None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_tri_pool_blocked_grid(rng):
    """Pool kernel streams V in blocks (grid accumulation + zero padding):
    V > POOL_V_BLOCK must equal the XLA path."""
    from vqatpu.kernels import trilinear as K

    Vbig = K.POOL_V_BLOCK + 37  # forces 2 blocks with a ragged tail
    vt = jnp.asarray(rng.randn(2, Vbig, D).astype(np.float32))
    qt = jnp.asarray(rng.randn(2, Q, D).astype(np.float32))
    at = jnp.asarray(rng.randn(2, A, D).astype(np.float32))
    w = jnp.asarray(rng.rand(2, Vbig, Q, A).astype(np.float32))
    want = trilinear_pool_xla(vt, qt, at, w)
    with pltpu.force_tpu_interpret_mode():
        got = trilinear_pool_pallas(vt, qt, at, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-2)


def test_gqav_layout_matches_vqag(tri_inputs):
    """V-minor attention layout (logits+softmax) == the standard layout
    transposed; qav pooling == the standard pool."""
    from vqatpu.kernels.trilinear import (
        attention_logits_gqav,
        masked_softmax_gqav,
        trilinear_pool_qav,
    )

    v_r, q_r, a_r, T, mask = tri_inputs
    want = masked_softmax_vqa_xla(attention_logits_xla(v_r, q_r, a_r, T), mask)
    got = masked_softmax_gqav(attention_logits_gqav(v_r, q_r, a_r, T), mask)
    np.testing.assert_allclose(np.asarray(jnp.transpose(got, (0, 4, 2, 3, 1))),
                               np.asarray(want), atol=1e-5)

    rng2 = np.random.RandomState(9)
    vt = jnp.asarray(rng2.randn(B, V, D).astype(np.float32))
    qt = jnp.asarray(rng2.randn(B, Q, D).astype(np.float32))
    at = jnp.asarray(rng2.randn(B, A, D).astype(np.float32))
    w = want[..., 0]  # [B, V, Q, A]
    want_pool = trilinear_pool_xla(vt, qt, at, w)
    got_pool = trilinear_pool_qav(vt, qt, at, jnp.transpose(w, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_pool), np.asarray(want_pool),
                               rtol=2e-4, atol=1e-4)
