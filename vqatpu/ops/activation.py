"""Activation functions (reference: ``src/activation.py:17-22`` Swish; FCNet
resolves activations by name via ``getattr(nn, act)`` in ``src/fc.py:24``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """Swish = x * sigmoid(x) (arXiv:1710.05941)."""
    return x * jax.nn.sigmoid(x)


_ACTS = {
    "": lambda x: x,
    "none": lambda x: x,
    "ReLU": jax.nn.relu,
    "relu": jax.nn.relu,
    "Tanh": jnp.tanh,
    "tanh": jnp.tanh,
    "Sigmoid": jax.nn.sigmoid,
    "sigmoid": jax.nn.sigmoid,
    "LeakyReLU": jax.nn.leaky_relu,
    "GELU": jax.nn.gelu,
    "Swish": swish,
    "swish": swish,
}


def get_activation(name: str):
    try:
        return _ACTS[name]
    except KeyError:
        raise ValueError(f"activation {name!r} is not supported") from None
