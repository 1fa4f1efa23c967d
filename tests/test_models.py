"""Model assembly smoke + structural tests (all 6 model variants, jitted)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig
from vqatpu.models import build_model
from vqatpu.ops.module import Ctx

NTOKEN, V_DIM, NUM_ANS = 50, 32, 17
B, V, Q, A = 2, 8, 12, 3


def tiny_cfg(**kw):
    base = dict(
        ntoken=NTOKEN, v_dim=V_DIM, num_ans_candidates=NUM_ANS,
        num_hid=32, h_mm=16, rank=4, gamma=2, num_stacks=2,
    )
    base.update(kw)
    return ModelConfig(**base)


def tiny_batch(rng, num_pad=2):
    v = rng.randn(B, V, V_DIM).astype(np.float32)
    v[:, V - num_pad:] = 0.0
    return {
        "v": jnp.asarray(v),
        "b": jnp.asarray(rng.rand(B, V, 6).astype(np.float32)),
        "q": jnp.asarray(rng.randint(0, NTOKEN + 1, (B, Q))),
        "a": jnp.asarray(rng.randint(0, NTOKEN + 1, (B, A))),
        "v_mask": jnp.asarray(np.arange(V)[None] < V - num_pad).repeat(B, 0),
    }


@pytest.mark.parametrize("task,model,extra", [
    ("ffoe", "ban", {}),
    ("ffoe", "ban", {"use_counter": True}),
    ("ffoe", "san", {}),
    ("ffoe", "cti", {}),
    ("mc", "ban", {}),
    ("mc", "cti", {}),
    ("mc", "san", {}),
])
def test_model_forward_shapes(rng, task, model, extra):
    cfg = tiny_cfg(task=task, model=model, **extra)
    m = build_model(cfg)
    p = m.init(jax.random.PRNGKey(0))
    batch = tiny_batch(rng)

    fwd = jax.jit(lambda p, b: m.apply(p, b)[0])
    logits = fwd(p, batch)
    assert logits.shape == (B, cfg.num_classes)
    assert np.all(np.isfinite(np.asarray(logits)))

    # train mode with dropout runs and differs from eval
    out_train, _ = m.apply(p, batch, Ctx(train=True, rng=jax.random.PRNGKey(1)))
    assert out_train.shape == logits.shape


def test_ban_glimpse_residual_accumulation(rng):
    """BAN sums the *cumulative* per-glimpse question states
    (FFOE/base_model.py:63-65: list of post-update q_emb, stacked & summed)."""
    cfg = tiny_cfg(model="ban", gamma=1)
    m = build_model(cfg)
    p = m.init(jax.random.PRNGKey(0))
    logits, att = m.apply(p, tiny_batch(rng))
    assert att.shape == (B, 1, V, Q)
    # attention over padded boxes must be zero
    np.testing.assert_array_equal(np.asarray(att)[:, :, V - 2:], 0.0)


def test_cti_attention_mass(rng):
    cfg = tiny_cfg(model="cti")
    m = build_model(cfg)
    p = m.init(jax.random.PRNGKey(0))
    _, att = m.apply(p, tiny_batch(rng))
    assert att.shape == (B, V, Q, A, cfg.gamma)
    np.testing.assert_allclose(
        np.asarray(att).sum((1, 2, 3)), np.ones((B, cfg.gamma)), atol=1e-5
    )


def test_gradients_flow_everywhere(rng):
    """Every parameter of the CTI model receives a nonzero gradient path."""
    cfg = tiny_cfg(model="cti")
    m = build_model(cfg)
    p = m.init(jax.random.PRNGKey(0))
    batch = tiny_batch(rng)

    def loss(params):
        out, _ = m.apply(params, batch)
        return (out ** 2).sum()

    g = jax.grad(loss)(p)
    flat, _ = jax.tree.flatten(
        {k: v for k, v in g.items() if k not in ("wa_emb",)}
    )
    nonzero = [bool(np.any(np.asarray(x) != 0)) for x in flat]
    assert all(nonzero), f"{sum(nonzero)}/{len(nonzero)} grads nonzero"


def test_registry_rejects_unknown():
    with pytest.raises(ValueError):
        build_model(tiny_cfg(model="nope"))


def test_padding_value_invariance(rng):
    """With an explicit v_mask, the VALUES in padded box rows must not
    affect outputs (the static-masking contract; the reference instead
    relies on padded rows being exactly zero, attention.py:36)."""
    for model_name in ("ban", "cti"):
        cfg = tiny_cfg(model=model_name)
        m = build_model(cfg)
        p = m.init(jax.random.PRNGKey(0))
        batch = tiny_batch(rng)  # rows V-2: zeroed, mask False
        want, _ = m.apply(p, batch)

        poisoned = dict(batch)
        v = np.asarray(batch["v"]).copy()
        v[:, V - 2:] = 1e3 * rng.randn(B, 2, V_DIM)  # garbage in padded rows
        poisoned["v"] = jnp.asarray(v)
        got, _ = m.apply(p, poisoned)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, err_msg=model_name)


def test_fully_masked_sample_is_finite(rng):
    """A sample with ZERO real boxes must produce finite logits (the
    reference would NaN: softmax over an all -inf row)."""
    cfg = tiny_cfg(model="cti")
    m = build_model(cfg)
    p = m.init(jax.random.PRNGKey(0))
    batch = tiny_batch(rng)
    mask = np.asarray(batch["v_mask"]).copy()
    mask[0, :] = False  # first sample: no boxes at all
    batch["v_mask"] = jnp.asarray(mask)
    out, att = m.apply(p, batch)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_array_equal(np.asarray(att)[0], 0.0)


def test_fused_v_tucker_eval_parity_and_grads(rng):
    """fused_v_tucker=True must be bit-identical to the unfused path in eval
    mode (same weight-norm GEMMs, concatenated), and train-mode grads must
    reach every v_tucker param through the fused GEMM."""
    import dataclasses

    cfg = tiny_cfg(model="cti", fused_v_tucker=True)
    m_fused = build_model(cfg)
    m_plain = build_model(dataclasses.replace(cfg, fused_v_tucker=False))
    m_remat = build_model(dataclasses.replace(cfg, remat_glimpse=True))
    p = m_fused.init(jax.random.PRNGKey(3))
    batch = tiny_batch(rng)

    lf, _ = m_fused.apply(p, batch)
    lp, _ = m_plain.apply(p, batch)
    lr, _ = m_remat.apply(p, batch)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lp), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lp), atol=1e-5)

    def loss(pp):
        ctx = Ctx(train=True, rng=jax.random.PRNGKey(7))
        logits, _ = m_fused.apply(pp, batch, ctx)
        return (logits ** 2).sum()

    g = jax.grad(loss)(p)
    for name in ["t_att", "t_net0", "t_net1"]:
        sub = g[name]["tc"] if name == "t_att" else g[name]
        gv = np.asarray(sub["v_tucker"]["l0"]["v"])
        assert np.isfinite(gv).all() and np.abs(gv).sum() > 0, name


def test_cti_api_att_matches_standard_path(rng):
    """The att a CTI/BAN model returns (API layout) equals the standard
    TriAttention/BiAttention apply() result — guards the V-minor internal
    layout's final transpose."""
    cfg = tiny_cfg(model="cti")
    m = build_model(cfg)
    p = m.init(jax.random.PRNGKey(11))
    batch = tiny_batch(rng)
    _, att = m.apply(p, batch)

    from vqatpu.ops.rnn import QuestionEmbedding

    w = m.w_emb.apply(p["w_emb"], batch["q"])
    qs = m.q_emb.apply_all(p["q_emb"], w)
    wa = m.w_emb.apply(p["wa_emb"], batch["a"])
    as_ = m.q_emb.apply_all(p["ans_emb"], wa)
    want, _ = m.t_att.apply(p["t_att"], batch["v"], qs, as_, batch["v_mask"])
    np.testing.assert_allclose(np.asarray(att), np.asarray(want), atol=1e-5)

    cfg_b = tiny_cfg(model="ban")
    mb = build_model(cfg_b)
    pb = mb.init(jax.random.PRNGKey(12))
    _, att_b = mb.apply(pb, batch)
    wq = mb.w_emb.apply(pb["w_emb"], batch["q"])
    qsb = mb.q_emb.apply_all(pb["q_emb"], wq)
    want_b, _ = mb.v_att.apply(pb["v_att"], batch["v"], qsb, batch["v_mask"])
    np.testing.assert_allclose(np.asarray(att_b), np.asarray(want_b),
                               atol=1e-5)
