"""Object counting module (Zhang et al., ICLR'18) — vectorized jnp port.

Reference: ``/root/reference/src/counting.py`` (verbatim vendored by the CTI
repo).  Semantics preserved exactly:

- keep top-``objects`` boxes by attention (permutation-invariant math, so
  ``lax.top_k``'s sorted order vs torch's unsorted one is immaterial),
- sigmoid unless ``already_sigmoided``,
- intra/inter-object dedup via 8 learned monotonic ``PiecewiseLin(16)``
  activations over outer-products / IoU distances,
- soft one-hot count vector of size ``objects + 1`` scaled by confidence.

Everything is fixed-shape (``objects=10``) — jit-friendly by construction.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vqatpu.ops.module import Ctx, config


@config
class PiecewiseLin:
    """Monotonic piecewise-linear activation on [0, 1] with n segments
    (``counting.py:148-176``). Weight[0] is pinned at 0 by the gradient:
    torch's abs backward is ``grad * sign(x)`` with ``sign(0) == 0``, so the
    zero-initialized first weight never moves ("always 0 with a 0 gradient",
    ``counting.py:154``).  ``jnp.abs``'s derivative at 0 is +1, which WOULD
    let it drift — ``x * sign(x)`` reproduces torch's subgradient exactly
    (same value, derivative ``sign(x)``)."""

    n: int = 16

    def init(self, key: jax.Array):
        del key
        w = jnp.ones((self.n + 1,))
        return {"weight": w.at[0].set(0.0)}

    def apply(self, p, x: jnp.ndarray) -> jnp.ndarray:
        w = p["weight"] * jnp.sign(p["weight"])
        w = w / w.sum()
        csum = jnp.cumsum(w)
        y = self.n * x
        idx = jnp.floor(y).astype(jnp.int32)
        f = y - jnp.floor(y)
        # one-hot matmuls instead of gathers: dynamic gathers on these small
        # tensors lower to slow scatter loops on TPU, one-hot contractions
        # ride the MXU/VPU (measured ~2x on the whole counter branch)
        oh_l = jax.nn.one_hot(jnp.clip(idx, 0, self.n), self.n + 1,
                              dtype=x.dtype)
        oh_r = jax.nn.one_hot(jnp.clip(idx + 1, 0, self.n), self.n + 1,
                              dtype=x.dtype)
        left = oh_l @ csum
        seg = oh_r @ w
        return left + f * seg


@config
class Counter:
    objects: int = 10
    already_sigmoided: bool = False

    @property
    def pw(self) -> PiecewiseLin:
        return PiecewiseLin(16)

    def init(self, key: jax.Array):
        ks = jax.random.split(key, 8)
        return {f"f{i}": self.pw.init(ks[i]) for i in range(8)}

    # --- geometry helpers (counting.py:104-147) ---

    @staticmethod
    def _outer(x):
        a = x[..., :, None]
        b = x[..., None, :]
        return a, b

    def _outer_product(self, x):
        a, b = self._outer(x)
        return a * b

    def _outer_diff(self, x):
        a, b = self._outer(x)
        return jnp.abs(a - b)

    @staticmethod
    def _area(box):
        # box: [B, 4, m] with (x1, y1, x2, y2)
        x = jnp.clip(box[:, 2, :] - box[:, 0, :], 0, None)
        y = jnp.clip(box[:, 3, :] - box[:, 1, :], 0, None)
        return x * y

    def _iou(self, a, b):
        min_pt = jnp.maximum(a[:, :2, :, None], b[:, :2, None, :])
        max_pt = jnp.minimum(a[:, 2:, :, None], b[:, 2:, None, :])
        inter = jnp.clip(max_pt - min_pt, 0, None)
        inter_area = inter[:, 0] * inter[:, 1]
        area_a = self._area(a)[:, :, None]
        area_b = self._area(b)[:, None, :]
        return inter_area / (area_a + area_b - inter_area + 1e-12)

    def _f(self, p, i, x):
        return self.pw.apply(p[f"f{i}"], x)

    def apply(self, p, boxes: jnp.ndarray, attention: jnp.ndarray,
              ctx: Optional[Ctx] = None) -> jnp.ndarray:
        """boxes [B, 4, m], attention [B, m] -> count features [B, objects+1]."""
        # reference assumes >= `objects` boxes ("minimum number of boxes",
        # FFOE/base_model.py:149); clamp for smaller static box counts.
        n = min(self.objects, attention.shape[1])
        att, idx = jax.lax.top_k(attention, n)  # [B, n]
        boxes = jnp.take_along_axis(boxes, idx[:, None, :].repeat(4, 1), axis=2)
        if not self.already_sigmoided:
            att = jax.nn.sigmoid(att)

        relevancy = self._outer_product(att)
        distance = 1.0 - self._iou(boxes, boxes)

        score = self._f(p, 0, relevancy) * self._f(p, 1, distance)

        # deduplicate (counting.py:67-77)
        dedup_score = self._f(p, 3, relevancy) * self._f(p, 4, distance)
        att_diff = self._outer_diff(att)
        score_diff = self._outer_diff(dedup_score)  # [B, n, n, n]? no: below
        # outer_diff of a [B, n, n] tensor differs along the last axis pair:
        # reference computes outer_diff(dedup_score) over the last dim,
        # giving [B, n, n, n]; prod over dim=1 then * f2(1 - att_diff).
        sim = self._f(p, 2, 1.0 - score_diff).prod(axis=1) * self._f(p, 2, 1.0 - att_diff)
        row_sims = sim.sum(axis=2)
        all_sims = self._outer_product(row_sims)
        dedup_per_entry, dedup_per_row = all_sims, row_sims
        score = score / dedup_per_entry

        correction = self._f(p, 0, att * att) / dedup_per_row
        score = score.sum(axis=2).sum(axis=1, keepdims=True) + correction.sum(
            axis=1, keepdims=True
        )
        score = jnp.sqrt(score + 1e-20)
        one_hot = self._to_one_hot(score)

        att_conf = jnp.abs(self._f(p, 5, att) - 0.5)
        dist_conf = jnp.abs(self._f(p, 6, distance) - 0.5)
        conf = self._f(
            p, 7,
            att_conf.mean(axis=1, keepdims=True)
            + dist_conf.mean(axis=2).mean(axis=1, keepdims=True),
        )
        return one_hot * conf

    def _to_one_hot(self, scores: jnp.ndarray) -> jnp.ndarray:
        """[B, 1] soft count -> interpolated one-hot [B, objects+1]
        (``counting.py:79-96``)."""
        scores = jnp.clip(scores, 0.0, float(self.objects))
        i = jnp.floor(scores).astype(jnp.int32)  # [B, 1]
        f = scores - jnp.floor(scores)
        tl = jax.nn.one_hot(jnp.clip(i[:, 0], 0, self.objects), self.objects + 1)
        tr = jax.nn.one_hot(jnp.clip(i[:, 0] + 1, 0, self.objects), self.objects + 1)
        return (1.0 - f) * tl + f * tr
