"""Weight-normalized linear layers and the FCNet MLP stack.

Reference semantics (``/root/reference/src/fc.py:10-34``):
``FCNet(dims, act, dropout)`` = for each intermediate pair
``[Dropout?, weight_norm(Linear, dim=None), Act]`` and a final
``[Dropout?, weight_norm(Linear, dim=None), Act]``.

``weight_norm(..., dim=None)`` reparameterizes the *whole* weight matrix by
its Frobenius norm: ``W = g * V / ||V||_F`` with a scalar ``g`` initialized
to ``||V_init||_F``.  We keep that exact reparameterization (it changes
training dynamics, not just init), stored as ``{"g", "v", "b"}``.

Init matches torch defaults: ``V, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vqatpu.ops.activation import get_activation
from vqatpu.ops.module import Ctx, config, dropout, uniform


@config
class WNLinear:
    """``weight_norm(nn.Linear(in_dim, out_dim), dim=None)``."""

    in_dim: int
    out_dim: int
    bias: bool = True

    def init(self, key: jax.Array):
        kv, kb = jax.random.split(key)
        bound = 1.0 / (self.in_dim ** 0.5)
        v = uniform(kv, (self.out_dim, self.in_dim), bound)
        p = {"v": v, "g": jnp.linalg.norm(v.reshape(-1))}
        if self.bias:
            p["b"] = uniform(kb, (self.out_dim,), bound)
        return p

    def weight(self, p) -> jnp.ndarray:
        v = p["v"]
        return (p["g"] / jnp.linalg.norm(v.reshape(-1))) * v

    def apply(self, p, x: jnp.ndarray) -> jnp.ndarray:
        # (x @ vᵀ)·s rather than x @ (s·v)ᵀ: the scalar rides the GEMM's
        # existing bias/activation epilogue for free, instead of a separate
        # full pass materializing the scaled weight (and the backward scales
        # the output cotangent, not a weight-sized array).  Same math as
        # torch weight_norm dim=None (fc.py:22) up to reassociation.
        v = p["v"]
        s = p["g"] / jnp.linalg.norm(v.reshape(-1))
        y = (x @ v.T) * s
        if self.bias:
            y = y + p["b"]
        return y


@config
class Linear:
    """Plain ``nn.Linear`` (used by SAN / counting heads)."""

    in_dim: int
    out_dim: int
    bias: bool = True

    def init(self, key: jax.Array):
        kv, kb = jax.random.split(key)
        bound = 1.0 / (self.in_dim ** 0.5)
        p = {"w": uniform(kv, (self.out_dim, self.in_dim), bound)}
        if self.bias:
            p["b"] = uniform(kb, (self.out_dim,), bound)
        return p

    def apply(self, p, x: jnp.ndarray) -> jnp.ndarray:
        y = x @ p["w"].T
        if self.bias:
            y = y + p["b"]
        return y


@config
class FCSTL:
    """Single tanh layer ``Dropout -> Linear -> Tanh`` (reference
    ``fc.py:36-44``; unused by the shipped models, kept for API parity)."""

    in_dim: int
    out_dim: int
    dropout: float = 0.0

    def init(self, key: jax.Array):
        return {"l0": Linear(self.in_dim, self.out_dim).init(key)}

    def apply(self, p, x: jnp.ndarray, ctx: Optional[Ctx] = None) -> jnp.ndarray:
        x = dropout(x, self.dropout, ctx)
        return jnp.tanh(Linear(self.in_dim, self.out_dim).apply(p["l0"], x))


@config
class FCNet:
    """Non-linear fully-connected stack (reference ``fc.py:10-34``)."""

    dims: Tuple[int, ...]
    act: str = "ReLU"
    dropout: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "dims", tuple(self.dims))

    @property
    def layers(self) -> Sequence[WNLinear]:
        return tuple(
            WNLinear(self.dims[i], self.dims[i + 1])
            for i in range(len(self.dims) - 1)
        )

    def init(self, key: jax.Array):
        keys = jax.random.split(key, len(self.dims) - 1)
        return {f"l{i}": layer.init(k) for i, (layer, k) in enumerate(zip(self.layers, keys))}

    def apply(self, p, x: jnp.ndarray, ctx: Optional[Ctx] = None) -> jnp.ndarray:
        act = get_activation(self.act)
        for i, layer in enumerate(self.layers):
            x = dropout(x, self.dropout, ctx)
            x = layer.apply(p[f"l{i}"], x)
            x = act(x)
        return x
