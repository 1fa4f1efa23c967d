"""Epoch-level training loops for the FFOE and MC pipelines.

Reference: ``src/FFOE/train.py:24-116`` and ``src/MC/train.py:22-120``.
Warmup/decay is per-epoch from the host (the jitted step receives lr as an
argument), gradient accumulation + clip + Adamax live inside the jitted step
(``vqatpu/train/steps.py``), checkpointing follows the reference policy
(every epoch >= ``saving_epoch`` plus best).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vqatpu.config import TrainConfig
from vqatpu.data.batching import (BatchLoader, PrefetchLoader,
                                  make_eval_loader)
from vqatpu.data.mc_dataset import expand_mc_batch
from vqatpu.eval.ffoe import evaluate as evaluate_ffoe
from vqatpu.eval.mc import evaluate_mc
from vqatpu.parallel import make_mesh, replicate, shard_batch
from vqatpu.train.checkpoints import save_checkpoint, save_checkpoint_orbax
from vqatpu.train.logging import Logger, time_since
from vqatpu.train.optim import lr_for_epoch
from vqatpu.train.steps import (TrainState, make_train_state, make_train_step,
                                wire_cast)

_FFOE_KEYS = ("v", "v_scale", "b", "q", "a", "v_mask", "target",
              "t_label", "t_score", "t_logits")


def _device_batch(batch: dict, keys=_FFOE_KEYS,
                  transfer_dtype: str = "float32") -> dict:
    return wire_cast({k: batch[k] for k in keys if k in batch},
                     transfer_dtype)


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def _native_capable(dataset) -> bool:
    """True when every member dataset (ConcatDataset aware) exposes an
    in-memory FeatureStore the C++ runtime can register.  Streaming
    (out-of-core) stores can't hand raw pointers to the C++ runtime —
    NativeFeatureStore would slurp the whole HDF5 into RAM."""
    members = list(getattr(dataset, "datasets", [])) or [dataset]
    return all(
        hasattr(d, "store") and hasattr(d, "entries")
        and getattr(d.store, "in_memory", True) for d in members)


def _make_loader(dataset, cfg: TrainConfig, use_native: bool, logger=None):
    """Prefer the native C++ prefetch loader when available and the dataset
    (or every ConcatDataset member — the ``--use_both --use_vg`` headline
    config) exposes a FeatureStore; fall back to the Python loader, LOUDLY
    when the caller asked for native.

    With ``transfer_dtype="int8"`` the native loader quantizes on assembly
    (v int8 + v_scale straight out of the store — the f32 slab never
    exists); ``wire_cast`` passes the pre-quantized v through."""
    reason = None
    if use_native and _native_capable(dataset):
        try:
            from vqatpu.data import native
            if native.available():
                return native.NativeBatchLoader(
                    dataset, cfg.batch_size, shuffle=True, seed=cfg.seed,
                    drop_last=True,
                    quantize=(cfg.transfer_dtype == "int8"))
            reason = "libvqadata.so unavailable"
        except Exception as e:  # noqa: BLE001 — any native failure degrades
            reason = f"native loader failed: {e!r}"
    elif use_native:
        reason = "dataset has no in-memory FeatureStore (streaming or MC)"
    if use_native and logger is not None:
        # the ~5x-slower path must never be silent (r3 verdict: the paper's
        # train+val+VG config silently lost the native loader)
        logger.write(f"native loader OFF ({reason}); using Python loader")
    # Python fallback (no native lib, streaming store, or MC expansion):
    # prefetch one epoch-iterator thread so assembly overlaps device compute.
    return PrefetchLoader(
        BatchLoader(dataset, cfg.batch_size, shuffle=True, seed=cfg.seed,
                    drop_last=True))


_UNSET = object()  # eval device store: build lazily, at most once


def _make_eval_device_store(eval_ds, cfg: TrainConfig, task: str,
                            multiproc: bool, mesh, logger):
    """Device store for the in-loop epoch eval.  One extra gate vs the
    train store: on a mesh the store's gather output is ALWAYS
    P(data)-sharded, so the (2x) eval batch must divide the data axis.
    Checked BEFORE the build — declining after DeviceFeatureStore.build
    would first upload the whole eval table to HBM just to discard it."""
    if mesh is not None:
        from vqatpu.parallel import DATA_AXIS

        dp = int(mesh.shape.get(DATA_AXIS, 1))
        if (cfg.batch_size * 2) % dp != 0:
            logger.write("eval device feature store OFF (eval batch %d not "
                         "divisible by the data mesh %d); using host wire"
                         % (cfg.batch_size * 2, dp))
            return None
    return _make_device_store(eval_ds, cfg, task, multiproc, mesh, logger,
                              what="eval ")


def _make_device_store(dataset, cfg: TrainConfig, task: str, multiproc: bool,
                       mesh, logger, what: str = ""):
    """Build the HBM-resident feature store per the tri-state
    ``--device_features`` knob (default ``auto``: build whenever the
    dataset is capable AND the tables fit the HBM budget — the 20x
    input-pipeline win is the default experience); decline LOUDLY
    otherwise (the r3-verdict rule: a silently-degraded input pipeline
    is a bug)."""
    from vqatpu.data.device_store import (DeviceFeatureStore,
                                          devstore_decision,
                                          normalize_device_features)

    mode = normalize_device_features(cfg.device_features)
    if cfg.shard_feature_store:
        mode = "on"
    if mode == "off":
        return None
    if multiproc:
        build = False
        why = "multi-process training gathers per-host batch slices"
    else:
        build, why = devstore_decision(dataset, mode, cfg.transfer_dtype,
                                       task, shard=cfg.shard_feature_store)
    if not build:
        tag = "auto-OFF" if mode == "auto" else "OFF"
        logger.write(f"{what}device feature store {tag} ({why}); "
                     "using host wire")
        return None
    store = DeviceFeatureStore.build(
        dataset, transfer_dtype=cfg.transfer_dtype, mesh=mesh,
        shard=cfg.shard_feature_store)
    logger.write(f"{what}device feature store: {store.describe()}")
    return store


def _shard_state_tp(state: TrainState, mesh) -> TrainState:
    """Tensor-parallel state placement on a 2-D (data x model) mesh:
    params/grad-accum per ``param_shardings`` (classifier vocab, PARALIND
    rank, Megatron column/row tucker-prj pairs), optimizer state and
    counters replicated."""
    from vqatpu.parallel import shard_params

    return TrainState(
        params=shard_params(state.params, mesh),
        opt_state=replicate(state.opt_state, mesh),
        grad_accum=shard_params(state.grad_accum, mesh),
        accum_count=replicate(state.accum_count, mesh),
        step=replicate(state.step, mesh),
    )


class _NullLogger:
    """Non-primary processes log nothing (all hosts may share a filesystem;
    the log.txt contract is single-writer)."""

    def write(self, *_args, **_kw):
        pass


def _evaluate_multiproc(model, params, loader, cfg: TrainConfig, task: str,
                        mesh):
    """Epoch eval in the multi-process regime: every host runs the same
    seeded loader over the FULL val set, contributes its row slice of each
    global batch, and reads back only the replicated device-side score
    scalars (per-row logits are not host-addressable across processes)."""
    from vqatpu.parallel.distributed import (global_batch_from_local,
                                             local_batch_slice)
    from vqatpu.train.steps import make_eval_step

    eval_step = make_eval_step(model, mc_scoring=(task == "mc"),
                               compute_dtype=cfg.compute_dtype)
    score = upper = 0.0
    n = 0
    for batch in loader:
        valid = batch.pop("valid")
        if task == "mc":
            batch = expand_mc_batch(batch)
        db = _device_batch(batch, transfer_dtype=cfg.transfer_dtype)
        db = global_batch_from_local(local_batch_slice(db), mesh)
        out = eval_step(params, db)
        score += float(np.asarray(out["score"]))
        if "upper_bound" in out:
            upper += float(np.asarray(out["upper_bound"]))
        n += int(valid.sum())
    if task == "mc":
        upper = float(n)
    return score / max(n, 1), upper / max(n, 1)


def train(model, train_ds, eval_ds, cfg: TrainConfig, output: str,
          task: str = "ffoe", state: Optional[TrainState] = None,
          start_epoch: int = 0, tfidf_loaded: bool = False,
          use_mesh: bool = True, print_interval: int = 200,
          use_native_loader: bool = True,
          profile_dir: Optional[str] = None,
          num_devices: Optional[int] = None,
          tp: int = 1, best_eval: float = 0.0) -> TrainState:
    """Run the full training schedule; returns the final state.

    ``best_eval``: the best eval score seen so far — pass the value
    recorded in the checkpoint being resumed (the CLIs do) so a resumed
    run cannot overwrite a better existing ``model_epoch_best``.  The
    reference resets its local ``best_eval_score = 0`` on every
    ``train()`` call (``FFOE/train.py:41``), silently clobbering the best
    checkpoint on resume — a deliberate divergence-fix, default-compatible
    (0.0 == reference behavior when no value is known).

    Multi-process (one process per pod host): call
    ``parallel.distributed.init_distributed`` first — when
    ``jax.process_count() > 1`` the loop builds the global mesh, every
    process runs the same seeded loader and contributes its batch slice,
    and only process 0 writes logs / pickle checkpoints (orbax saves are
    collective).  ``tp > 1`` trains on a 2-D data x model mesh
    (single-process): classifier vocab / PARALIND rank / t_net tucker
    shardings from ``parallel.sharding.param_shardings``.
    """
    multiproc = jax.process_count() > 1
    primary = jax.process_index() == 0
    os.makedirs(output, exist_ok=True)
    logger = (Logger(os.path.join(output, "log.txt")) if primary
              else _NullLogger())
    logger.write(f"config: {cfg}")

    if state is None:
        state = make_train_state(model, jax.random.PRNGKey(cfg.seed),
                                 tfidf_loaded,
                                 optim_state_dtype=cfg.optim_state_dtype)
    logger.write(f"nParams=\t{count_params(state.params)}")
    logger.write(
        "optim: adamax lr=%.4f, decay_step=%d, decay_rate=%.2f, grad_clip=%.2f"
        % (cfg.lr, cfg.lr_decay_step, cfg.lr_decay_rate, cfg.clip_norm)
    )

    mesh = None
    if use_mesh and multiproc:
        from vqatpu.parallel.distributed import (global_mesh,
                                                 replicate_tree_global)

        assert tp == 1, "tensor parallel over multiple hosts is not wired"
        mesh = global_mesh(num_devices=num_devices)
        state = TrainState(*[replicate_tree_global(x, mesh) for x in state])
    elif use_mesh and tp > 1:
        from vqatpu.parallel import make_mesh_2d

        # fused_v_tucker concatenates the replicated t_att tucker with
        # model-sharded t_net tuckers -> per-step all-gather (see
        # ModelConfig.fused_v_tucker)
        assert not model.cfg.fused_v_tucker, \
            "fused_v_tucker is incompatible with a model (tp) axis"
        ndev = num_devices if num_devices is not None else len(jax.devices())
        assert ndev % tp == 0, (ndev, tp)
        mesh = make_mesh_2d(ndev // tp, tp)
        logger.write(f"mesh: data={ndev // tp} x model={tp}")
        state = _shard_state_tp(state, mesh)
    elif use_mesh:
        mesh = make_mesh(num_devices)
        state = TrainState(*[replicate(x, mesh) for x in state])

    step_fn = make_train_step(model, cfg, tfidf_loaded,
                              mc_scoring=(task == "mc"))
    dev_store = _make_device_store(train_ds, cfg, task, multiproc, mesh,
                                   logger)
    if dev_store is not None:
        # v/b/v_mask never cross the host wire: the loader ships fields +
        # sample indices only (same shuffle RNG/seed as the full loader,
        # so the trajectory is bit-identical to the wire path).
        # cfg.sparse_targets additionally ships targets as t_label/t_score
        # pairs, densified on device — also bit-identical (densify_target),
        # measured a wash on the bench host (config.py).  FFOE-only: MC
        # builds its 2-class target from the candidate labels at expansion.
        from vqatpu.data.batching import max_target_labels

        k = (max_target_labels(train_ds)
             if cfg.sparse_targets and task == "ffoe" else 0)
        loader = PrefetchLoader(
            BatchLoader(train_ds, cfg.batch_size, shuffle=True,
                        seed=cfg.seed, drop_last=True, fields_only=True,
                        sparse_target_k=k))
    else:
        loader = _make_loader(train_ds, cfg, use_native_loader,
                              logger=logger)
    eval_loader = None  # built lazily on the first eval epoch, then reused
    eval_dev_store = _UNSET if dev_store is not None else None
    rng = jax.random.PRNGKey(cfg.seed)

    wall_start = time.time()
    for epoch in range(start_epoch, cfg.epochs):
        lr = lr_for_epoch(cfg, epoch)
        if epoch < len(cfg.warmup_factors):
            logger.write("gradual warmup lr: %.8f" % lr)
        elif epoch in range(cfg.lr_decay_start, cfg.lr_decay_end,
                            cfg.lr_decay_step):
            # the reference logs decay epochs distinctly (FFOE/train.py:66-67)
            logger.write("decreased lr: %.8f" % lr)
        else:
            logger.write("lr: %.8f" % lr)

        t0 = time.time()
        num_oom = 0
        # Metrics stay on-device until print/epoch boundaries: a per-step
        # float() would sync the host into every step and stall dispatch.
        # Per-update scalars accumulate into device-side RUNNING SUMS (3
        # tiny async adds per update) instead of a per-update list — the
        # epoch-end reduction is then 3 readbacks total, not 3 x n_updates
        # sequential round trips over the tunnel.
        # The update cadence is host-deterministic ((i+1) % update_freq), so
        # no device read is needed to know which steps applied an update.
        _SUM_KEYS = ("loss", "grad_norm", "batch_score")
        metric_sums = None
        num_updates = 0
        print_every = max(1, print_interval // cfg.update_freq)
        n_batches = len(loader)
        micro_count = 0  # mirrors the device-side accumulation counter
        for i, batch in enumerate(loader):
            batch.pop("valid", None)
            if task == "mc":
                batch = expand_mc_batch(batch)
            ds_idx = batch.pop("ds_idx", None)
            db = _device_batch(batch, transfer_dtype=cfg.transfer_dtype)
            if multiproc and mesh is not None:
                # identical seeded loaders on every host -> identical global
                # batch; each host hands over only its row slice
                from vqatpu.parallel.distributed import (
                    global_batch_from_local, local_batch_slice)

                db = global_batch_from_local(local_batch_slice(db), mesh)
            elif mesh is not None:
                db = shard_batch(db, mesh)
            if dev_store is not None:
                # feature slabs straight out of HBM (placement already
                # matches shard_batch's P(data) on a mesh)
                db.update(dev_store.gather(ds_idx))
            rng, step_rng = jax.random.split(rng)
            # the reference flushes accumulation on each epoch's LAST batch
            # (FFOE/train.py:78-82) so microbatches never straddle epochs.
            # With update_freq == 1 every step updates anyway — keep force
            # False so jit compiles ONE program, not a second for the flag.
            force = cfg.update_freq > 1 and (i == n_batches - 1)
            try:
                state, metrics = step_fn(state, db, jnp.float32(lr), step_rng,
                                         force)
            except jax.errors.JaxRuntimeError as e:
                # best-effort batch-skip recovery, the reference's OOM policy
                # (FFOE/trainer.py:206-219); the functional state is
                # untouched by a failed step, so we just move on.
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                num_oom += 1
                logger.write(f"| WARNING: out of memory, skipping batch {i}")
                if cfg.update_freq > 1:
                    # the reference's recovery zero-grads (trainer.py:217),
                    # dropping any buffered microbatches — mirror it so the
                    # device accumulation window and host micro_count stay
                    # in sync (critically: when the epoch's forced
                    # last-batch flush is the step that failed, buffered
                    # grads must not straddle into the next epoch)
                    state = state._replace(
                        grad_accum=jax.tree.map(jnp.zeros_like,
                                                state.grad_accum),
                        accum_count=jnp.zeros_like(state.accum_count))
                    micro_count = 0
                continue
            # profile a few steady-state steps of the first epoch
            # (jax.profiler, TensorBoard-loadable — the observability upgrade
            # over the reference's wall-clock prints, SURVEY.md §5)
            if profile_dir and epoch == start_epoch:
                if i == 1:
                    jax.profiler.start_trace(profile_dir)
                elif i == min(6, n_batches - 1):
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
            micro_count += 1
            did_update = force or micro_count >= cfg.update_freq
            if did_update:
                num_updates += 1
                micro_count = 0
                if metric_sums is None:
                    metric_sums = {k: metrics[k] for k in _SUM_KEYS}
                else:  # async device-side scalar adds, no host sync
                    metric_sums = {k: metric_sums[k] + metrics[k]
                                   for k in _SUM_KEYS}
            if (primary and did_update and num_updates
                    and num_updates % print_every == 0):
                running = float(np.asarray(metric_sums["loss"]))
                # running / (num_updates + 1) reproduces the reference's own
                # in-loop print (FFOE/train.py:89-90 divides total_loss by
                # num_updates + 1); the epoch-end log line below divides by
                # num_updates exactly as train.py:94 does.
                print("Iter: {}, Loss {:.4f}, Norm: {:.4f}, Num updates: {},"
                      " Wall time: {:.2f}, ETA: {}".format(
                          i + 1, running / (num_updates + 1),
                          float(np.asarray(metrics["grad_norm"])),
                          num_updates, time.time() - wall_start,
                          time_since(t0, i / max(len(loader), 1))))

        if metric_sums is not None:
            total_loss = float(np.asarray(metric_sums["loss"])) / num_updates
            total_norm = float(np.asarray(metric_sums["grad_norm"]))
            train_score = float(np.asarray(metric_sums["batch_score"]))
        else:
            total_loss = total_norm = train_score = 0.0
        count_norm = num_updates
        # MC batch_score is already per 4-candidate group (MC/train.py:99)
        denom = num_updates * cfg.batch_size
        train_score = 100.0 * train_score / max(denom, 1)

        eval_score, bound = 0.0, 0.0
        if eval_ds is not None:
            # reference evaluates with a 2x batch (FFOE/main.py:146); loader
            # built ONCE — NativeBatchLoader construction does a
            # field-precompute pass + ring allocation worth reusing
            if eval_loader is None:
                if eval_dev_store is _UNSET:
                    eval_dev_store = _make_eval_device_store(
                        eval_ds, cfg, task, multiproc, mesh, logger)
                eval_loader = make_eval_loader(
                    eval_ds, cfg.batch_size * 2,
                    use_native=use_native_loader,
                    quantize=(cfg.transfer_dtype == "int8"),
                    fields_only=eval_dev_store is not None)
            if multiproc and mesh is not None:
                eval_score, bound = _evaluate_multiproc(
                    model, state.params, eval_loader, cfg, task, mesh)
            else:
                if task == "mc":
                    eval_score, bound = evaluate_mc(
                        model, state.params, eval_loader, mesh=mesh,
                        compute_dtype=cfg.compute_dtype,
                        transfer_dtype=cfg.transfer_dtype,
                        dev_store=eval_dev_store)
                else:
                    eval_score, bound = evaluate_ffoe(
                        model, state.params, eval_loader, mesh=mesh,
                        compute_dtype=cfg.compute_dtype,
                        transfer_dtype=cfg.transfer_dtype,
                        dev_store=eval_dev_store)

        logger.write("epoch %d, time: %.2f" % (epoch, time.time() - t0))
        logger.write("\ttrain_loss: %.2f, norm: %.4f, score: %.2f"
                     % (total_loss, total_norm / max(count_norm, 1), train_score))
        if num_oom:
            logger.write("\tskipped %d batches (OOM)" % num_oom)
        if eval_ds is not None:
            logger.write("\teval score: %.2f (%.2f)"
                         % (100 * eval_score, 100 * bound))

        if epoch >= cfg.saving_epoch:
            # orbax saves are collective (every process participates in
            # writing the global arrays); pickle is process-0-only (state is
            # fully replicated across hosts, so one copy suffices)
            write = cfg.ckpt_backend == "orbax" or primary
            new_best = eval_ds is not None and eval_score > best_eval
            if new_best:
                best_eval = eval_score
            # stamp the model family so restore can name the mismatch on a
            # wrong-model resume instead of a raw pytree structure error;
            # best_eval rides along so a resume can't clobber a better
            # existing model_epoch_best (see the train() docstring)
            extra = {"model": getattr(getattr(model, "cfg", None), "model",
                                      None),
                     "best_eval": best_eval}
            if write:
                _save_ckpt(output, f"model_epoch{epoch}", state, epoch,
                           cfg.ckpt_backend, extra=extra)
            if new_best and write:
                _save_ckpt(output, "model_epoch_best", state, epoch,
                           cfg.ckpt_backend, extra=extra)
    return state


def _save_ckpt(output: str, name: str, state: TrainState, epoch: int,
               backend: str, extra: Optional[dict] = None) -> None:
    if backend == "orbax":
        import shutil

        path = os.path.join(output, name + ".orbax")
        if os.path.exists(path):  # orbax refuses to overwrite (the 'best' slot)
            shutil.rmtree(path)
        save_checkpoint_orbax(path, state, epoch)
    else:
        save_checkpoint(os.path.join(output, name + ".ckpt"), state, epoch,
                        extra=extra)
