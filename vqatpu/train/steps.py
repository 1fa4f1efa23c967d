"""Jitted train / eval steps (the reference's ``Trainer`` hot loop,
``FFOE/trainer.py:97-272``, collapsed into pure functions).

Everything that was host-side in the reference — flat-grad accumulation,
denominator rescale, global-norm clip, Adamax step — happens inside ONE
jitted function here.  Gradient accumulation (``update_freq``) is carried in
the train state so the whole pipeline stays on-device; the optimizer update
fires via ``lax.cond`` every ``update_freq``-th microbatch, dividing by the
microbatch count exactly like ``_all_reduce_and_rescale(grad_denom)``
(grad_denom == number of buffered microbatches, ``trainer.py:112-126``).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vqatpu.config import TrainConfig
from vqatpu.ops import bce_with_logits_sum, distillation_loss
from vqatpu.ops.module import Ctx
from vqatpu.train.optim import adamax_with_lr, clip_flat_grads


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    grad_accum: Any
    accum_count: jnp.ndarray  # microbatches buffered since last update
    step: jnp.ndarray  # completed optimizer updates


def compute_score_with_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """VQA soft accuracy: one_hot(argmax) · soft target, summed
    (``FFOE/train.py:16-21``)."""
    one_hot = jax.nn.one_hot(jnp.argmax(logits, axis=1), logits.shape[1],
                             dtype=target.dtype)
    return (one_hot * target).sum()


def compute_score_mc_jnp(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MC group accuracy inside jit (``MC/train.py:14-19``): per 4-candidate
    group, pick the argmax of the class-0 margin, score its label."""
    groups = logits.shape[0] // 4
    margin = (logits[:, 0] - logits[:, 1]).reshape(groups, 4)
    pick = jnp.argmax(margin, axis=1)
    return target[:, 0].reshape(groups, 4)[jnp.arange(groups), pick].sum()


def trainable_mask(params, tfidf_loaded: bool = False):
    """True where a param is trainable.  Only the frozen GloVe copy
    (``emb_``) is non-trainable pre-tfidf (``language_model.py:21-24``)."""

    def walk(tree, frozen):
        if isinstance(tree, dict):
            return {k: walk(v, frozen or k == "emb_") for k, v in tree.items()}
        return not frozen or tfidf_loaded

    return walk(params, False)


def mask_grads(grads, mask):
    return jax.tree.map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def make_optimizer(trainable=None, state_dtype: str = "float32"):
    """``trainable`` is an optional params->bool-pytree fn; when given, the
    Adamax m/u state is simply not allocated for frozen leaves
    (``optax.masked``) — matching torch, which keeps no optimizer state for
    ``requires_grad=False`` params (``language_model.py:21-24``), and saving
    the frozen GloVe copy's share of the update's HBM traffic.
    ``state_dtype``: see :func:`vqatpu.train.optim.adamax`."""
    sd = jnp.bfloat16 if state_dtype == "bfloat16" else None
    return adamax_with_lr(trainable, state_dtype=sd)


def cast_floats(tree, dtype):
    """Cast floating leaves to ``dtype`` (mixed-precision activations)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def _frozen_mask_fn(model, tfidf_loaded: bool):
    """params->trainable-bool-pytree fn, or None when nothing is frozen."""
    if "c" in model.cfg.op and not tfidf_loaded:
        return lambda p: trainable_mask(p, tfidf_loaded)
    return None


def make_train_state(model, key: jax.Array, tfidf_loaded: bool = False,
                     optim_state_dtype: str = "float32") -> TrainState:
    params = model.init(key)
    tx = make_optimizer(_frozen_mask_fn(model, tfidf_loaded),
                        optim_state_dtype)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        grad_accum=jax.tree.map(jnp.zeros_like, params),
        accum_count=jnp.zeros([], jnp.int32),
        step=jnp.zeros([], jnp.int32),
    )


def quantize_v(v: np.ndarray):
    """Per-(sample, box) symmetric int8 quantization of the feature slab:
    ``scale = absmax(row)/127`` (f32, shape ``v.shape[:-1]``), ``q =
    rint(v/scale)`` int8.  All-zero rows (box padding) get scale 1 and stay
    exactly zero.  Max per-element error is ``row_absmax/254`` (~0.4% of
    the row peak) — the wire-accuracy trade for a 4x H2D byte cut."""
    from vqatpu.data.native import quantize_rows_any

    return quantize_rows_any(v)


def wire_cast(db: dict, transfer_dtype: str = "float32") -> dict:
    """Host-side half of the wire-dtype contract: shrink the big feature
    tensors (v, b) before device_put on transfer-bound hosts (measured
    −28% epoch wall at f16 on the bench tunnel, PROFILE.md).  ``int8``
    ships ``v`` symmetric-quantized per box (see :func:`quantize_v`, a
    ``v_scale`` side tensor rides along at ~0.05% of the bytes) and ``b``
    as f16 — 4x fewer wire bytes than f32.  The jitted steps dequantize /
    upcast on device (``_upcast_wire``)."""
    if transfer_dtype == "float32":
        return db
    if transfer_dtype == "int8":
        out = dict(db)
        if "v" in db and "v_scale" not in db:
            # already-quantized v (the native loader's quantize-on-assembly
            # mode ships v int8 + v_scale) passes through untouched
            out["v"], out["v_scale"] = quantize_v(db["v"])
        if "b" in db:
            out["b"] = np.asarray(db["b"]).astype(np.float16)
        return out
    wires = {"float16": np.float16, "bfloat16": jnp.bfloat16}
    if transfer_dtype not in wires:
        raise ValueError(f"unknown transfer_dtype {transfer_dtype!r}; "
                         f"expected float32, float16, bfloat16, or int8")
    wire = wires[transfer_dtype]
    return dict(db, **{k: np.asarray(db[k]).astype(wire)
                       for k in ("v", "b") if k in db})


def densify_target(batch, n_ans: int):
    """Device-side half of the sparse-target wire (the device-feature-store
    loader ships ``t_label [B, K] int32`` + ``t_score [B, K] f32`` instead
    of the dense ``target [B, n_ans]`` — ~10x fewer wire bytes at VQA's
    K<=10).  Densified as a one-hot matmul (the PiecewiseLin lesson:
    per-element scatters lower to slow sequential loops on TPU; a masked
    contraction rides the MXU).  Exactness: the sparse rows come from
    ``np.nonzero`` of the host-dense target, so each output column sums
    exactly one nonzero term (pads contribute ``0.0 * onehot`` at column
    0) — bit-identical to the host-dense wire."""
    if "t_label" not in batch:
        return batch
    batch = dict(batch)
    lab = batch.pop("t_label")
    sc = batch.pop("t_score").astype(jnp.float32)
    oh = (lab[:, :, None]
          == jnp.arange(n_ans, dtype=lab.dtype)[None, None, :])
    batch["target"] = jnp.einsum("bk,bkn->bn", sc, oh.astype(jnp.float32))
    return batch


def _upcast_wire(batch):
    """Device-side half of the wire contract: dequantize int8 ``v`` (via
    the ``v_scale`` side tensor, which is dropped here) and upcast f16/bf16
    feature tensors back to f32.

    ``TrainConfig.transfer_dtype`` lets the host ship v/b small to cut H2D
    bytes (the dominant end-to-end term on transfer-bound hosts,
    PROFILE.md); compute semantics past this point are unchanged — only the
    input quantization differs from a pure-f32 run."""
    if "v_scale" in batch:
        batch = dict(batch)
        scale = batch.pop("v_scale")
        batch["v"] = batch["v"].astype(jnp.float32) * scale[..., None]
    cast = {k: batch[k].astype(jnp.float32)
            for k in ("v", "b")
            if k in batch and batch[k].dtype in (jnp.float16, jnp.bfloat16)}
    return dict(batch, **cast) if cast else batch


def make_train_step(model, cfg: TrainConfig, tfidf_loaded: bool = False,
                    mc_scoring: bool = False, ctx_factory=None):
    """Build the jitted train step.

    Distillation applies only to ban/san — the reference's CTI branch ignores
    the KD criterion entirely (``FFOE/trainer.py:168-192``).
    ``mc_scoring`` switches batch_score to 4-candidate group accuracy
    (``MC/train.py:14-19``) for the x4-expanded MC batches.
    ``ctx_factory`` (zero-arg -> :class:`Ctx`) overrides Ctx construction —
    the dropout-mask-injection hook for the dropout-active trajectory
    oracle; callers supplying per-step :class:`~vqatpu.ops.MaskSource`
    contexts must run under ``jax.disable_jit()`` (a jitted trace would
    bake the first step's masks in as constants).
    """
    tx = make_optimizer(_frozen_mask_fn(model, tfidf_loaded),
                        cfg.optim_state_dtype)
    distill = cfg.distillation and model.cfg.model in ("ban", "san")
    half = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    def loss_fn(params, batch, rng):
        if ctx_factory is not None:
            ctx = ctx_factory()
        else:
            if cfg.rng_impl == "rbg":
                from vqatpu.ops.module import fast_rng
                rng = fast_rng(rng)
            # train=True only gates dropout in these models;
            # cfg.deterministic turns it off for trajectory-parity runs
            # against the torch reference
            ctx = Ctx(train=not cfg.deterministic, rng=rng,
                      mask_bits=cfg.mask_bits,
                      mask_replay=getattr(cfg, "mask_replay", False))
        batch = _upcast_wire(batch)
        if half is not None:
            # bf16 activations/params in the forward+backward; f32 master
            # params, loss, and optimizer state stay outside.
            params = cast_floats(params, half)
            batch = dict(batch, v=batch["v"].astype(half))
        logits, _ = model.apply(params, batch, ctx)
        logits = logits.astype(jnp.float32)
        target = batch["target"].astype(jnp.float32)
        if distill:
            loss = distillation_loss(logits, batch["t_logits"].astype(jnp.float32),
                                     target, cfg.T, cfg.alpha)
        else:
            loss = bce_with_logits_sum(logits, target) / logits.shape[0]
        return loss, logits

    # with no frozen params the identity mask is pure overhead
    any_frozen = "c" in model.cfg.op and not tfidf_loaded

    def _apply_update(state, grads, lr, count):
        denom = count.astype(jnp.float32)
        g = jax.tree.map(lambda x: x / denom, grads)
        g, norm = clip_flat_grads(g, cfg.clip_norm)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr  # type: ignore[attr-defined]
        updates, new_opt = tx.update(g, opt_state, state.params)
        if any_frozen:
            updates = mask_grads(updates, trainable_mask(state.params, tfidf_loaded))
        params = optax.apply_updates(state.params, updates)
        return params, new_opt, norm

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(4,))
    def train_step(state: TrainState, batch, lr, rng, force_update: bool = False):
        """``force_update`` flushes the accumulation buffer regardless of
        count — the reference updates on each epoch's LAST batch
        (``FFOE/train.py:78-82``) so microbatches never carry across epochs."""
        batch = densify_target(batch, model.cfg.num_ans_candidates)
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        if any_frozen:
            grads = mask_grads(grads, trainable_mask(state.params, tfidf_loaded))

        finite = jnp.isfinite(loss)
        if cfg.skip_nonfinite:
            # on-device analog of the reference's OverflowError zero-grad
            # recovery (trainer.py:141-143): a non-finite microbatch
            # contributes ZERO gradient; the update cadence and denominator
            # are unchanged (matching the reference's OOM bookkeeping, which
            # still appends to sample_sizes, trainer.py:112)
            grads = jax.tree.map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)

        if cfg.update_freq == 1:
            # fast path: no accumulation buffer traffic (two full param-tree
            # passes saved per step)
            params, new_opt, grad_norm = _apply_update(
                state, grads, lr, jnp.int32(1))
            new_state = TrainState(params, new_opt, state.grad_accum,
                                   state.accum_count, state.step + 1)
            count = jnp.int32(1)
        else:
            accum = jax.tree.map(jnp.add, state.grad_accum, grads)
            count = state.accum_count + 1

            def do_update(_):
                params, new_opt, norm = _apply_update(
                    state._replace(grad_accum=accum), accum, lr, count)
                zeros = jax.tree.map(jnp.zeros_like, accum)
                return TrainState(params, new_opt, zeros,
                                  jnp.zeros([], jnp.int32), state.step + 1), norm

            def no_update(_):
                return TrainState(state.params, state.opt_state, accum, count,
                                  state.step), jnp.float32(0.0)

            new_state, grad_norm = jax.lax.cond(
                force_update or (count >= cfg.update_freq),
                do_update, no_update, None
            )
        if mc_scoring:
            score = compute_score_mc_jnp(logits, batch["target"])
        else:
            score = compute_score_with_logits(logits, batch["target"])
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "batch_score": score,
            "updated": ((count >= cfg.update_freq) | force_update
                        ).astype(jnp.int32),
            "skipped": ((~finite) & cfg.skip_nonfinite).astype(jnp.int32),
        }
        return new_state, metrics

    return train_step


def make_eval_step(model, mc_scoring: bool = False,
                   compute_dtype: str = "float32"):
    """Eval: logits + soft score + upper bound (``FFOE/train.py:119-149``).

    ``mc_scoring`` scores 4-candidate groups device-side
    (``MC/train.py:14-19``) — needed by the multi-process eval path, where
    per-row logits are sharded across hosts and only replicated scalars are
    host-readable.  Zero-padded rows contribute 0 to score and bound either
    way, so padded final batches stay exact.

    ``compute_dtype="bfloat16"`` casts params + features for the forward
    (logits return f32): the BAN throughput knob (PROFILE.md r3) for
    per-epoch evals and serving; default f32 keeps logits bit-exact."""
    half = jnp.bfloat16 if compute_dtype == "bfloat16" else None

    @jax.jit
    def eval_step(params, batch):
        batch = _upcast_wire(batch)
        if half is not None:
            params = cast_floats(params, half)
            batch = dict(batch, v=batch["v"].astype(half))
        logits, _ = model.apply(params, batch)
        logits = logits.astype(jnp.float32)
        out = {"logits": logits}
        if "target" in batch:
            if mc_scoring:
                out["score"] = compute_score_mc_jnp(logits, batch["target"])
            else:
                out["score"] = compute_score_with_logits(logits, batch["target"])
                out["upper_bound"] = batch["target"].max(axis=1).sum()
        return out

    return eval_step
