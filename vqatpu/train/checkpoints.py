"""Checkpoint save/restore.

Mirrors the reference policy (``utils.py:98-106``, ``FFOE/train.py:108-116``):
``{output}/model_epoch{E}.ckpt`` every epoch >= ``saving_epoch`` plus
``model_epoch_best.ckpt``; resume restores params + optimizer state and
continues at ``epoch + 1`` (``FFOE/main.py:121-128``).

Format: pickle of a numpy-leaf pytree (the JAX analogue of ``torch.save`` on
state dicts — same trust model, same durability).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np

from vqatpu.train.steps import TrainState


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: TrainState, epoch: int,
                    extra: Optional[dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "epoch": epoch,
        "params": _to_numpy(state.params),
        "opt_state": _to_numpy(state.opt_state),
        "step": int(state.step),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def load_params_any(input_dir: str, epoch, model) -> Any:
    """Resolve eval params from ``{input_dir}/model_epoch{epoch}.ckpt`` (ours)
    or ``.pth`` (the reference ``utils.save_model`` format,
    ``FFOE/test.py:157-166``) — the released-checkpoint on-ramp: a reference
    user's trained ``.pth`` drops straight into the test CLIs."""
    ckpt = os.path.join(input_dir, f"model_epoch{epoch}.ckpt")
    if os.path.exists(ckpt):
        return load_checkpoint(ckpt)["params"]
    orbax_dir = os.path.join(input_dir, f"model_epoch{epoch}.orbax")
    if os.path.isdir(orbax_dir):
        import orbax.checkpoint as ocp

        payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(orbax_dir))
        return payload["params"]
    pth = os.path.join(input_dir, f"model_epoch{epoch}.pth")
    if os.path.exists(pth):
        from vqatpu.tools.import_torch import import_checkpoint

        return import_checkpoint(pth, model)
    raise FileNotFoundError(
        f"no model_epoch{epoch}.{{ckpt,orbax,pth}} under {input_dir}")


def _merge_opt_state(payload_node, template_node):
    """Structural merge of a pickled opt_state into the current template.

    Pre-r2 checkpoints carry full Adamax m/u state for frozen params; the
    current optimizer is ``optax.masked`` and keeps ``MaskedNode`` there
    (train/steps.py).  Wherever the template says MaskedNode, the payload's
    stale state is dropped; everywhere else shapes must match."""
    import optax

    if isinstance(template_node, optax.MaskedNode):
        return template_node
    if (isinstance(template_node, optax.MaskedState)
            and not isinstance(payload_node, optax.MaskedState)):
        # old layout stored the inner optimizer state unwrapped
        return optax.MaskedState(inner_state=_merge_opt_state(
            payload_node, template_node.inner_state))
    if isinstance(template_node, dict):
        if not isinstance(payload_node, dict):
            raise ValueError(
                "incompatible checkpoint: opt_state has "
                f"{type(payload_node).__name__} where the current optimizer "
                "expects a dict — checkpoint from a different model/optimizer?")
        missing = [k for k in template_node if k not in payload_node]
        if missing:
            raise ValueError(
                f"incompatible checkpoint: opt_state missing keys {missing} "
                "— checkpoint from a different model/optimizer?")
        return {k: _merge_opt_state(payload_node[k], v)
                for k, v in template_node.items()}
    if hasattr(template_node, "_fields"):  # namedtuple (optax states)
        vals = []
        for i, f in enumerate(template_node._fields):
            sub = (getattr(payload_node, f) if hasattr(payload_node, f)
                   else payload_node[i])
            vals.append(_merge_opt_state(sub, getattr(template_node, f)))
        return type(template_node)(*vals)
    if isinstance(template_node, (list, tuple)):
        return type(template_node)(
            _merge_opt_state(a, b) for a, b in zip(payload_node, template_node))
    if np.shape(payload_node) != np.shape(template_node):
        raise ValueError(
            f"incompatible checkpoint: opt_state leaf shape "
            f"{np.shape(payload_node)} != expected {np.shape(template_node)}")
    return jax.numpy.asarray(payload_node)


def restore_train_state(path: str, state: TrainState
                        ) -> tuple[TrainState, int, dict]:
    """Load params/opt_state into an existing (freshly-built) state, returning
    (state, start_epoch, extra) — ``extra`` is the checkpoint's metadata dict
    ({} for old checkpoints), carrying e.g. ``best_eval`` so a resumed run
    cannot clobber a better existing best checkpoint (train/loop.py).
    Structure must match the current model; opt_state tolerates the
    pre-masked-Adamax layout (see :func:`_merge_opt_state`)."""
    payload = load_checkpoint(path)
    saved_model = (payload.get("extra") or {}).get("model")

    def check_and_cast(new, old):
        if np.shape(new) != np.shape(old):
            raise ValueError(
                f"incompatible checkpoint: param shape {np.shape(new)} != "
                f"model shape {np.shape(old)} — wrong model/dims for {path}?")
        return jax.numpy.asarray(new)

    try:
        params = jax.tree.map(check_and_cast, payload["params"], state.params)
    except (ValueError, TypeError, KeyError) as e:
        if str(e).startswith("incompatible checkpoint"):
            raise  # per-leaf shape mismatch: already descriptive
        # tree STRUCTURE mismatch (jax's "Dict key mismatch" etc.): name the
        # models instead of leaking a raw pytree error
        got = sorted(payload["params"]) if isinstance(payload["params"], dict) \
            else type(payload["params"]).__name__
        want = sorted(state.params) if isinstance(state.params, dict) \
            else type(state.params).__name__
        raise ValueError(
            f"incompatible checkpoint {path}: saved from model "
            f"{saved_model or '<unknown>'!r}, current model expects a "
            f"different parameter structure (checkpoint modules: {got}; "
            f"model modules: {want})") from e
    try:
        opt_state = jax.tree.map(check_and_cast, payload["opt_state"],
                                 state.opt_state)
    except (ValueError, TypeError):
        # structural mismatch: the one known-good case is a pre-masked-Adamax
        # checkpoint (full m/u state where the template has MaskedNode) —
        # _merge_opt_state handles it and raises a descriptive
        # "incompatible checkpoint" error for anything else
        opt_state = _merge_opt_state(payload["opt_state"], state.opt_state)
    new_state = TrainState(
        params=params,
        opt_state=opt_state,
        grad_accum=jax.tree.map(jax.numpy.zeros_like, state.grad_accum),
        accum_count=jax.numpy.zeros([], jax.numpy.int32),
        step=jax.numpy.asarray(payload.get("step", 0), jax.numpy.int32),
    )
    return new_state, payload["epoch"] + 1, (payload.get("extra") or {})


def save_checkpoint_orbax(path: str, state: TrainState, epoch: int) -> None:
    """Orbax-backed checkpoint (multi-host/sharded-restore capable): params
    and opt_state as a PyTree plus a scalar metadata leaf.  Path must not
    already exist (orbax semantics)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), {
        "epoch": np.asarray(epoch),
        "step": np.asarray(int(state.step)),
        "params": _to_numpy(state.params),
        "opt_state": _to_numpy(state.opt_state),
    })


def restore_train_state_orbax(path: str, state: TrainState
                              ) -> tuple[TrainState, int]:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    params = jax.tree.map(lambda n, o: jax.numpy.asarray(n),
                          payload["params"], state.params)
    # orbax restores namedtuple-typed nodes as dicts; rebuild by structure
    flat_new = jax.tree.leaves(payload["opt_state"])
    treedef = jax.tree.structure(state.opt_state)
    opt_state = jax.tree.unflatten(
        treedef, [jax.numpy.asarray(x) for x in flat_new])
    new_state = TrainState(
        params=params,
        opt_state=opt_state,
        grad_accum=jax.tree.map(jax.numpy.zeros_like, state.grad_accum),
        accum_count=jax.numpy.zeros([], jax.numpy.int32),
        step=jax.numpy.asarray(int(payload["step"]), jax.numpy.int32),
    )
    return new_state, int(payload["epoch"]) + 1


def save_params(path: str, params: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"params": _to_numpy(params)}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)


def load_params(path: str) -> Any:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload["params"] if "params" in payload else payload
