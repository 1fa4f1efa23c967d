"""Final answer classifier (reference ``src/classifier.py:11-29``):
``weight_norm(Linear(in, hid)) -> ReLU|Swish -> Dropout -> weight_norm(Linear(hid, out))``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vqatpu.ops.activation import get_activation
from vqatpu.ops.linear import WNLinear
from vqatpu.ops.module import Ctx, config, dropout


@config
class SimpleClassifier:
    in_dim: int
    hid_dim: int
    out_dim: int
    activation: str = "relu"  # 'relu' | 'swish'
    dropout: float = 0.5

    def init(self, key: jax.Array):
        k1, k2 = jax.random.split(key)
        return {
            "l1": WNLinear(self.in_dim, self.hid_dim).init(k1),
            "l2": WNLinear(self.hid_dim, self.out_dim).init(k2),
        }

    def apply(self, p, x: jnp.ndarray, ctx: Optional[Ctx] = None) -> jnp.ndarray:
        act = get_activation(self.activation)
        h = act(WNLinear(self.in_dim, self.hid_dim).apply(p["l1"], x))
        h = dropout(h, self.dropout, ctx)
        return WNLinear(self.hid_dim, self.out_dim).apply(p["l2"], h)
