"""Counter vs a pure-numpy oracle derived from the ICLR'18 counting paper,
plus loss parity vs torch."""

import numpy as np
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from vqatpu.ops import Counter, PiecewiseLin, bce_with_logits_sum, distillation_loss


def np_piecewise(weight, x, n=16):
    w = np.abs(weight)
    w = w / w.sum()
    csum = np.cumsum(w)
    y = n * x
    idx = np.floor(y).astype(np.int64)
    f = y - np.floor(y)
    return csum[np.clip(idx, 0, n)] + f * w[np.clip(idx + 1, 0, n)]


def np_counter(params, boxes, attention, objects=10):
    """Independent numpy implementation of the counting equations."""
    B, _, m = boxes.shape
    f = [params[f"f{i}"]["weight"] for i in range(8)]
    # top-k by attention
    order = np.argsort(-attention, axis=1)[:, :objects]
    att = np.take_along_axis(attention, order, 1)
    bx = np.stack([np.take_along_axis(boxes[:, c], order, 1) for c in range(4)], 1)
    att = 1 / (1 + np.exp(-att))  # sigmoid

    def outer_prod(x):
        return x[..., :, None] * x[..., None, :]

    def outer_diff(x):
        return np.abs(x[..., :, None] - x[..., None, :])

    def area(b):
        return np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)

    def iou(a, b):
        mn = np.maximum(a[:, :2, :, None], b[:, :2, None, :])
        mx = np.minimum(a[:, 2:, :, None], b[:, 2:, None, :])
        it = np.clip(mx - mn, 0, None)
        inter = it[:, 0] * it[:, 1]
        return inter / (area(a)[:, :, None] + area(b)[:, None, :] - inter + 1e-12)

    relevancy = outer_prod(att)
    distance = 1 - iou(bx, bx)
    score = np_piecewise(f[0], relevancy) * np_piecewise(f[1], distance)
    dedup_score = np_piecewise(f[3], relevancy) * np_piecewise(f[4], distance)
    att_diff = outer_diff(att)
    score_diff = outer_diff(dedup_score)
    sim = np_piecewise(f[2], 1 - score_diff).prod(axis=1) * np_piecewise(f[2], 1 - att_diff)
    row_sims = sim.sum(axis=2)
    all_sims = outer_prod(row_sims)
    score = score / all_sims
    correction = np_piecewise(f[0], att * att) / row_sims
    score = score.sum(2).sum(1, keepdims=True) + correction.sum(1, keepdims=True)
    score = np.sqrt(score + 1e-20)
    score = np.clip(score, 0, objects)
    i = np.floor(score).astype(np.int64)[:, 0]
    fr = (score - np.floor(score))[:, 0]
    tl = np.eye(objects + 1)[np.clip(i, 0, objects)]
    tr = np.eye(objects + 1)[np.clip(i + 1, 0, objects)]
    one_hot = (1 - fr)[:, None] * tl + fr[:, None] * tr
    att_conf = np.abs(np_piecewise(f[5], att) - 0.5)
    dist_conf = np.abs(np_piecewise(f[6], distance) - 0.5)
    conf = np_piecewise(
        f[7], att_conf.mean(1, keepdims=True) + dist_conf.mean(2).mean(1, keepdims=True)
    )
    return one_hot * conf


def test_piecewise_identity_at_init():
    pw = PiecewiseLin(16)
    p = pw.init(jax.random.PRNGKey(0))
    x = jnp.linspace(0, 1, 33)
    np.testing.assert_allclose(np.asarray(pw.apply(p, x)), np.asarray(x), atol=1e-6)


def test_piecewise_matches_numpy(rng):
    pw = PiecewiseLin(16)
    w = rng.randn(17).astype(np.float32)
    x = rng.rand(5, 6).astype(np.float32)
    got = pw.apply({"weight": jnp.asarray(w)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np_piecewise(w, x), atol=1e-5)


def test_counter_matches_numpy_oracle(rng):
    c = Counter(objects=4)
    key = jax.random.PRNGKey(5)
    p = c.init(key)
    # randomize the piecewise weights so the test isn't identity-trivial
    p = jax.tree.map(lambda x: x + 0.3 * jax.random.normal(key, x.shape), p)
    B, m = 3, 9
    boxes = np.sort(rng.rand(B, 4, m).astype(np.float32), axis=1)  # x1<y1... ok
    boxes = np.concatenate([boxes[:, :2] * 0.4, boxes[:, :2] * 0.4 + 0.5], 1)
    att = rng.randn(B, m).astype(np.float32)
    got = c.apply(p, jnp.asarray(boxes), jnp.asarray(att))
    want = np_counter({k: {"weight": np.asarray(v["weight"])} for k, v in p.items()},
                      boxes, att, objects=4)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    assert got.shape == (B, 5)


def test_counter_counts_distinct_boxes():
    """k well-separated confident boxes at init-params => count ~= k."""
    c = Counter(objects=10)
    p = c.init(jax.random.PRNGKey(0))
    B, m, k = 1, 20, 4
    boxes = np.zeros((B, 4, m), np.float32)
    att = np.full((B, m), -20.0, np.float32)  # sigmoid ~ 0
    for j in range(k):
        boxes[0, :, j] = [j * 2.0, 0.0, j * 2.0 + 1.0, 1.0]
        att[0, j] = 20.0  # sigmoid ~ 1
    out = np.asarray(c.apply(p, jnp.asarray(boxes), jnp.asarray(att)))
    # one_hot component peaks at index k (confidence scales magnitude)
    assert out[0].argmax() == k


def test_bce_matches_torch(rng):
    logits = rng.randn(6, 11).astype(np.float32)
    targets = rng.rand(6, 11).astype(np.float32)
    want = TF.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="sum"
    ).item()
    got = float(bce_with_logits_sum(jnp.asarray(logits), jnp.asarray(targets)))
    assert np.isclose(got, want, rtol=1e-5)


def test_distillation_matches_torch(rng):
    T, alpha = 1.5, 0.2
    s = rng.randn(5, 9).astype(np.float32)
    t = rng.randn(5, 9).astype(np.float32)
    tgt = rng.rand(5, 9).astype(np.float32)
    st, tt, tg = map(torch.from_numpy, (s, t, tgt))
    kl = torch.nn.KLDivLoss(reduction="none")(
        TF.log_softmax(st / T, dim=1), TF.softmax(tt / T, dim=1)
    ).sum(1).mean()
    bce = TF.binary_cross_entropy_with_logits(st, tg, reduction="sum") / 5
    want = (kl * alpha * T * T + bce * (1 - alpha)).item()
    got = float(distillation_loss(jnp.asarray(s), jnp.asarray(t), jnp.asarray(tgt), T, alpha))
    assert np.isclose(got, want, rtol=1e-5)
