"""Minimal functional-module protocol.

Every op in ``vqatpu.ops`` is a frozen dataclass holding *static* hyper
parameters, with two pure methods:

- ``init(key) -> params``: build a pytree (nested dict) of ``jnp`` arrays.
- ``apply(params, *inputs, ctx) -> outputs``: pure forward pass.

Stochastic layers (dropout) draw keys from a :class:`Ctx`, which hands out
deterministically derived subkeys in call order at trace time.  In eval mode
(``ctx.train == False``, the default) dropout is the identity, so parity
tests against the PyTorch reference are exact.

This replaces ``torch.nn.Module`` state (reference: e.g.
``/root/reference/src/fc.py:10-34``) with explicit pytrees so that the whole
model is a single jittable function of ``(params, batch)`` — the shape XLA
wants.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

Params = Any  # nested dict pytree of jnp arrays


class MaskSource:
    """Replays externally supplied dropout masks in declaration order.

    Masks are keyed by shape with a per-shape FIFO, so two implementations
    whose dropout *call* order differs still pair correctly as long as
    same-shape sites run in the same relative order.  Used by the
    dropout-ACTIVE reference-trajectory oracle
    (``tests/test_reference_trajectory.py``): torch/jax RNG streams can
    never align, so the oracle captures the reference's realized masks (by
    monkeypatching ``torch.nn.functional.dropout``) and both sides consume
    the identical masks.  Eager-mode only — inside ``jit`` the popped masks
    would bake in as constants of the first trace."""

    def __init__(self, masks):
        from collections import deque

        self._fifo: dict = {}
        for m in masks:
            self._fifo.setdefault(tuple(m.shape), deque()).append(m)

    def next_mask(self, shape):
        q = self._fifo.get(tuple(shape))
        if not q:
            raise ValueError(f"no captured dropout mask left for shape {shape}")
        return q.popleft()

    def assert_exhausted(self):
        left = {s: len(q) for s, q in self._fifo.items() if q}
        assert not left, f"unconsumed captured dropout masks: {left}"


class Ctx:
    """Per-call context: train flag + deterministic dropout key stream.

    ``mask_bits=16`` draws dropout masks by thresholding uint16 bits instead
    of f32 uniforms (half the RNG bits; the keep probability quantizes to
    1/65536 granularity, and the inverted-dropout scale uses the EXACT
    realized probability, so the estimator stays unbiased).

    ``mask_source`` (a :class:`MaskSource`) replaces RNG mask draws with
    externally captured masks — the dropout-active trajectory-parity hook."""

    def __init__(self, train: bool = False, rng: Optional[jax.Array] = None,
                 mask_bits: int = 32, mask_source: Optional[MaskSource] = None,
                 mask_replay: bool = False):
        self.train = train
        self.rng = rng
        self.mask_bits = mask_bits
        self.mask_source = mask_source
        self.mask_replay = mask_replay
        self._counter = 0

    def dropout_key(self) -> jax.Array:
        if self.rng is None:
            raise ValueError("Ctx needs an rng key for dropout in train mode")
        self._counter += 1
        return jax.random.fold_in(self.rng, self._counter)


def fast_rng(key: jax.Array) -> jax.Array:
    """Re-wrap a PRNG key for the ``rbg`` implementation (XLA
    RngBitGenerator -> the TPU hardware RNG).

    Dropout masks dominate the train step's RNG cost under the default
    threefry (measured 2.97 ms/step of pure mask generation at CTI reference
    shapes, ~17% of the step); rbg generates the same ~95M mask bits nearly
    for free.  rbg is a deterministic, well-distributed generator — it only
    lacks threefry's key-derivation guarantees, which dropout does not need.
    ``fold_in``/``split`` on the wrapped key still use threefry on the (tiny)
    key words, so the Ctx counter stream stays deterministic."""
    data = key if jnp.issubdtype(key.dtype, jnp.integer) else jax.random.key_data(key)
    if data.shape[-1] == 2:  # threefry2x32 words -> the 4 words rbg wants
        data = jnp.concatenate([data, data], axis=-1)
    return jax.random.wrap_key_data(data, impl="rbg")


def _masked_apply(keep: float, mask_bits: int, x: jnp.ndarray,
                  key: jax.Array) -> jnp.ndarray:
    """Draw the dropout mask from ``key`` and apply it to ``x`` (inverted
    scaling).  Pure function of (key, shape), so calling it again with the
    same key regenerates the *identical* mask — the property the replay VJP
    below relies on."""
    if mask_bits == 16:
        thresh = max(round(keep * 65536.0), 1)  # rate→1.0 must not div-by-0
        bits = jax.random.bits(key, x.shape, jnp.uint16)
        mask = bits.astype(jnp.uint32) < jnp.uint32(thresh)
        return jnp.where(mask, x * (65536.0 / thresh), jnp.zeros_like(x))
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _dropout_replay(keep: float, mask_bits: int, x: jnp.ndarray,
                    key: jax.Array) -> jnp.ndarray:
    return _masked_apply(keep, mask_bits, x, key)


def _dropout_replay_fwd(keep, mask_bits, x, key):
    return _masked_apply(keep, mask_bits, x, key), key


def _dropout_replay_bwd(keep, mask_bits, key, g):
    # Regenerating from the saved key yields bit-identical masks, so this IS
    # d/dx of the forward — not an approximation (tests/test_ops.py asserts
    # bit-equality against the plain-AD path).
    return _masked_apply(keep, mask_bits, g, key), None


_dropout_replay.defvjp(_dropout_replay_fwd, _dropout_replay_bwd)


def dropout(x: jnp.ndarray, rate: float, ctx: Optional[Ctx]) -> jnp.ndarray:
    """Inverted dropout matching ``torch.nn.Dropout`` semantics.

    With ``ctx.mask_replay`` the mask is REGENERATED in the backward pass
    from the saved PRNG key instead of being stored as an AD residual
    (plain AD keeps every realized mask alive from forward to backward,
    ~95M bool elements/step at CTI reference shapes).  Bit-identical to the
    plain path in both directions.  Measured at CTI reference shapes
    (scripts/ab_dropout_replay.py, interleaved): a WASH on step time
    (12.0-12.3 ms both ways) AND on compiled temp memory (812.3 MB
    identical — the backward peak is set elsewhere, and XLA's rbg mask
    residuals are already cheap bools), so the default stays False; the
    knob exists for large-V regimes where mask residuals could dominate
    the live set."""
    if rate <= 0.0 or ctx is None or not ctx.train:
        return x
    keep = 1.0 - rate
    if ctx.mask_source is not None:
        # replay an externally captured 0/1 mask (torch inverted-dropout
        # scaling: x * mask / keep — matching F.dropout exactly)
        mask = jnp.asarray(ctx.mask_source.next_mask(x.shape), x.dtype)
        return x * mask / keep
    if ctx.mask_replay:
        return _dropout_replay(keep, ctx.mask_bits, x, ctx.dropout_key())
    return _masked_apply(keep, ctx.mask_bits, x, ctx.dropout_key())


def uniform(key: jax.Array, shape, bound: float, dtype=jnp.float32) -> jnp.ndarray:
    """U(-bound, bound) — torch's default Linear/RNN init family."""
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def config(cls):
    """Decorator: frozen dataclass usable as a static (hashable) config."""
    return dataclasses.dataclass(frozen=True)(cls)
