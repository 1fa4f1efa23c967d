"""Parity: GRU/LSTM scan cells vs torch nn.GRU/nn.LSTM; WordEmbedding."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from vqatpu.ops import QuestionEmbedding, WordEmbedding


def gru_params_from_torch(rnn, suffix="l0"):
    return {
        "w_ih": jnp.asarray(getattr(rnn, f"weight_ih_{suffix}").detach().numpy()),
        "w_hh": jnp.asarray(getattr(rnn, f"weight_hh_{suffix}").detach().numpy()),
        "b_ih": jnp.asarray(getattr(rnn, f"bias_ih_{suffix}").detach().numpy()),
        "b_hh": jnp.asarray(getattr(rnn, f"bias_hh_{suffix}").detach().numpy()),
    }


def test_gru_forward_all_matches_torch(rng):
    torch.manual_seed(3)
    B, T, F, H = 4, 12, 30, 25
    rnn = nn.GRU(F, H, 1, batch_first=True)
    x = rng.randn(B, T, F).astype(np.float32)
    want, _ = rnn(torch.from_numpy(x))
    qe = QuestionEmbedding(F, H)
    p = {"fwd": gru_params_from_torch(rnn)}
    got = qe.apply_all(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=2e-5)
    # last state
    got_last = qe.apply_last(p, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got_last), want[:, -1].detach().numpy(), atol=2e-5
    )


def test_gru_bidirectional_matches_torch(rng):
    torch.manual_seed(4)
    B, T, F, H = 3, 7, 10, 8
    rnn = nn.GRU(F, H, 1, batch_first=True, bidirectional=True)
    x = rng.randn(B, T, F).astype(np.float32)
    want, _ = rnn(torch.from_numpy(x))
    qe = QuestionEmbedding(F, H, bidirect=True)
    p = {
        "fwd": gru_params_from_torch(rnn, "l0"),
        "bwd": gru_params_from_torch(rnn, "l0_reverse"),
    }
    got = qe.apply_all(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=2e-5)
    # forward-last + backward-first concat (language_model.py:91-92)
    want_last = torch.cat([want[:, -1, :H], want[:, 0, H:]], dim=1)
    got_last = qe.apply_last(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_last), want_last.detach().numpy(), atol=2e-5)


def test_lstm_matches_torch(rng):
    torch.manual_seed(5)
    B, T, F, H = 2, 6, 9, 11
    rnn = nn.LSTM(F, H, 1, batch_first=True)
    x = rng.randn(B, T, F).astype(np.float32)
    want, _ = rnn(torch.from_numpy(x))
    qe = QuestionEmbedding(F, H, rnn_type="LSTM")
    p = {"fwd": gru_params_from_torch(rnn)}
    got = qe.apply_all(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=2e-5)


def test_word_embedding_pad_and_concat(rng):
    ntoken, dim = 20, 6
    we = WordEmbedding(ntoken, dim, 0.0, op="c")
    p = we.init(jax.random.PRNGKey(0))
    ids = jnp.asarray([[1, 5, ntoken], [0, ntoken, ntoken]])
    out = we.apply(p, ids)
    assert out.shape == (2, 3, 2 * dim)
    # pad token rows (index == ntoken) must embed to exactly zero
    np.testing.assert_array_equal(np.asarray(out[0, 2]), np.zeros(2 * dim))
    np.testing.assert_array_equal(np.asarray(out[1, 1:]), np.zeros((2, 2 * dim)))
    # pad-row gradient is structurally zero
    def loss(params):
        return (we.apply(params, ids) ** 2).sum()
    g = jax.grad(loss)(p)
    np.testing.assert_array_equal(np.asarray(g["emb"][ntoken]), np.zeros(dim))


def test_word_embedding_load_pretrained(rng):
    ntoken, dim = 10, 4
    we = WordEmbedding(ntoken, dim, 0.0, op="c")
    p = we.init(jax.random.PRNGKey(1))
    glove = rng.randn(ntoken, dim).astype(np.float32)
    p = we.load_pretrained(p, glove)
    np.testing.assert_allclose(np.asarray(p["emb"][:ntoken]), glove)
    np.testing.assert_allclose(np.asarray(p["emb_"][:ntoken]), glove)
    # frozen copy not trainable until tf-idf is loaded
    assert we.trainable_mask(p)["emb_"] is False
    assert we.trainable_mask(p, tfidf_loaded=True)["emb_"] is True
    # tf-idf path: emb_ becomes the tfidf-mixed matrix
    tfidf = rng.rand(ntoken, ntoken).astype(np.float32)
    p2 = we.load_pretrained(we.init(jax.random.PRNGKey(2)), glove, tfidf=tfidf)
    np.testing.assert_allclose(
        np.asarray(p2["emb_"][:ntoken]), tfidf @ glove, rtol=1e-5
    )


def test_gru_dual_scan_matches_separate(rng):
    """gru_dual_apply_all (q+a streams in one scan) == two separate scans."""
    import jax
    import jax.numpy as jnp
    from vqatpu.ops.rnn import QuestionEmbedding, gru_dual_apply_all

    emb = QuestionEmbedding(20, 16)
    p_q = emb.init(jax.random.PRNGKey(0))
    p_a = emb.init(jax.random.PRNGKey(1))
    x_q = jnp.asarray(rng.randn(4, 12, 20).astype(np.float32))
    x_a = jnp.asarray(rng.randn(4, 3, 20).astype(np.float32))
    want_q = emb.apply_all(p_q, x_q)
    want_a = emb.apply_all(p_a, x_a)
    got_q, got_a = gru_dual_apply_all(p_q["fwd"], p_a["fwd"], x_q, x_a, 16)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(want_q),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                               atol=1e-6)


def test_gru_two_layer_matches_torch(rng):
    """Stacked GRU (nlayers=2): torch feeds layer 1 with layer 0's output
    (language_model.py:51-66 allows nlayers; builders pass 1)."""
    torch.manual_seed(6)
    B, T, F, H = 3, 9, 14, 11
    rnn = nn.GRU(F, H, 2, batch_first=True)
    x = rng.randn(B, T, F).astype(np.float32)
    want, _ = rnn(torch.from_numpy(x))
    qe = QuestionEmbedding(F, H, nlayers=2)
    p = {
        "fwd": gru_params_from_torch(rnn, "l0"),
        "fwd_l1": gru_params_from_torch(rnn, "l1"),
    }
    got = qe.apply_all(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=2e-5)
    # init shapes match the oracle param tree
    init = qe.init(jax.random.PRNGKey(0))
    assert set(init) == {"fwd", "fwd_l1"}
    assert init["fwd_l1"]["w_ih"].shape == (3 * H, H)


def test_gru_two_layer_bidirectional_matches_torch(rng):
    """2-layer bidirectional stack: layer 1 input is layer 0's fwd+bwd
    concat (2H wide)."""
    torch.manual_seed(7)
    B, T, F, H = 2, 6, 8, 5
    rnn = nn.GRU(F, H, 2, batch_first=True, bidirectional=True)
    x = rng.randn(B, T, F).astype(np.float32)
    want, _ = rnn(torch.from_numpy(x))
    qe = QuestionEmbedding(F, H, bidirect=True, nlayers=2)
    p = {
        "fwd": gru_params_from_torch(rnn, "l0"),
        "bwd": gru_params_from_torch(rnn, "l0_reverse"),
        "fwd_l1": gru_params_from_torch(rnn, "l1"),
        "bwd_l1": gru_params_from_torch(rnn, "l1_reverse"),
    }
    got = qe.apply_all(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=2e-5)
    init = qe.init(jax.random.PRNGKey(0))
    assert init["fwd_l1"]["w_ih"].shape == (3 * H, 2 * H)


def test_gru_multilayer_export_import_roundtrip(rng):
    """Stacked-GRU params survive export->import through the torch naming
    (weight_ih_l{i}[_reverse])."""
    from vqatpu.tools.export_torch import _put_gru
    from vqatpu.tools.import_torch import _gru

    qe = QuestionEmbedding(10, 6, bidirect=True, nlayers=3)
    p = qe.init(jax.random.PRNGKey(1))
    sd = {}
    _put_gru(sd, "q_emb", p)
    assert "q_emb.rnn.weight_ih_l2_reverse" in sd
    back = _gru(sd, "q_emb")
    assert set(back) == set(p)
    for k in p:
        for leaf in p[k]:
            np.testing.assert_allclose(np.asarray(p[k][leaf]),
                                       np.asarray(back[k][leaf]))
