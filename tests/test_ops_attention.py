"""BiAttention / TriAttention / StackedAttention behavior tests."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from vqatpu.ops import BiAttention, StackedAttention, TriAttention, masked_softmax


def test_masked_softmax_matches_torch_inf_fill(rng):
    x = rng.randn(2, 3, 4).astype(np.float32)
    mask = rng.rand(2, 3, 4) > 0.3
    mask[0, :, 0] = True  # ensure at least one valid entry per slice
    xt = torch.from_numpy(x.copy())
    xt[~torch.from_numpy(mask)] = -float("inf")
    want = torch.softmax(xt.view(2, -1), 1).view(2, 3, 4).numpy()
    got = masked_softmax(jnp.asarray(x), jnp.asarray(mask), axes=(1, 2))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_masked_softmax_all_masked_is_zero_not_nan():
    x = jnp.ones((1, 4))
    got = masked_softmax(x, jnp.zeros((1, 4), bool), axes=(1,))
    np.testing.assert_array_equal(np.asarray(got), np.zeros((1, 4)))


def test_biattention_masks_padded_boxes(rng):
    B, V, Q, G = 2, 6, 5, 2
    att_mod = BiAttention(x_dim=8, y_dim=7, z_dim=12, glimpse=G)
    p = att_mod.init(jax.random.PRNGKey(0))
    v = rng.randn(B, V, 8).astype(np.float32)
    v[:, 4:] = 0.0  # padded boxes
    q = rng.randn(B, Q, 7).astype(np.float32)
    att, logits = att_mod.apply(p, jnp.asarray(v), jnp.asarray(q))
    att = np.asarray(att)
    assert att.shape == (B, G, V, Q)
    # padded boxes get exactly zero attention; valid mass sums to 1 per glimpse
    np.testing.assert_array_equal(att[:, :, 4:, :], 0.0)
    np.testing.assert_allclose(att.sum((2, 3)), np.ones((B, G)), atol=1e-5)
    assert np.all(np.isneginf(np.asarray(logits)[:, :, 4:, :]))


def test_biattention_weight_norm_h_mat_invariance(rng):
    """Scaling h_mat's v-param must not change logits (weight-norm)."""
    att_mod = BiAttention(x_dim=4, y_dim=4, z_dim=8, glimpse=1)
    p = att_mod.init(jax.random.PRNGKey(1))
    v = jnp.asarray(rng.randn(1, 3, 4).astype(np.float32))
    q = jnp.asarray(rng.randn(1, 2, 4).astype(np.float32))
    _, l1 = att_mod.apply(p, v, q)
    p2 = jax.tree.map(lambda x: x, p)
    p2["bc"]["h_mat"] = p["bc"]["h_mat"] * 5.0
    _, l2 = att_mod.apply(p2, v, q)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)


def test_triattention_shapes_and_mask(rng):
    B, V, Q, A, G = 2, 5, 4, 3, 2
    tri = TriAttention(v_dim=8, q_dim=6, a_dim=6, h_dim=16, h_out=1,
                       rank=4, glimpse=G, k=1)
    p = tri.init(jax.random.PRNGKey(2))
    v = rng.randn(B, V, 8).astype(np.float32)
    v[:, -1] = 0.0
    q = rng.randn(B, Q, 6).astype(np.float32)
    a = rng.randn(B, A, 6).astype(np.float32)
    att, logits = tri.apply(p, jnp.asarray(v), jnp.asarray(q), jnp.asarray(a))
    att = np.asarray(att)
    assert att.shape == (B, V, Q, A, G)
    np.testing.assert_array_equal(att[:, -1], 0.0)
    np.testing.assert_allclose(att.sum((1, 2, 3)), np.ones((B, G)), atol=1e-5)


def test_stacked_attention_output(rng):
    B, V = 3, 6
    san = StackedAttention(num_stacks=2, img_feat_size=10, ques_feat_size=8,
                           att_size=12, drop_ratio=0.5)
    p = san.init(jax.random.PRNGKey(3))
    v = rng.randn(B, V, 10).astype(np.float32)
    q = rng.randn(B, 8).astype(np.float32)
    out = san.apply(p, jnp.asarray(v), jnp.asarray(q))
    assert out.shape == (B, 12)
    assert np.all(np.isfinite(np.asarray(out)))
