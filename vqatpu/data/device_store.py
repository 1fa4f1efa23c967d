"""HBM-resident feature store for training: upload the feature table to
device memory ONCE, then gather each batch's boxes BY INDEX on device.

The reference re-ships every batch's ``[B, boxes, 2048]`` feature slab from
host RAM through the DataLoader every step (``FFOE/dataset.py:282-287``
reads the whole HDF5 into host RAM; ``trim_collate`` re-stacks it per
batch).  On a TPU host the resulting H2D wire is the dominant end-to-end
term (PROFILE.md: the int8 wire cut epoch wall −55% on the bench host).
This module deletes the term instead of shrinking it:

- the WHOLE store lives in HBM as flat box-row tables — int8 rows +
  per-row dequant scales when the wire contract is int8 (~10 GB for
  VQA-2.0 trainval adaptive at 2048-d; f32 would not fit v5e HBM) — plus
  one all-zero sentinel row for box padding;
- per batch, the host ships ONLY ``rows`` (``[B, max_boxes]`` int32 flat
  row indices, ~50 KB at B=256) next to the question/answer/target
  fields; a jitted gather materializes ``v``/``v_scale``/``b``/``v_mask``
  straight out of HBM.

Bit-equality contract: the gathered batch is BIT-IDENTICAL to the host
wire path for every ``transfer_dtype`` (int8 quantization is exactly
idempotent; f16/bf16 casts happen once at build instead of once per
batch), so ``--device_features`` trajectories match wire trajectories
exactly (tests/test_device_store.py).

Sharded mode (``shard=True``): stores bigger than one chip's HBM
row-shard the flat tables across the mesh's data axis.  Each device
all-gathers the (tiny) index slab, gathers + dequantizes the rows IT
owns, and a ``psum_scatter`` over the batch axis hands every device
exactly its own DP slice — non-owned contributions are exact zeros, so
values still match the wire path bit-for-bit (f32 adds with 0.0 are
exact).  The collective rides ICI at ``B*max_boxes*v_dim*4/n_dev`` bytes
per device per batch.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def store_flat_arrays(store) -> Tuple[np.ndarray, Optional[np.ndarray],
                                      np.ndarray]:
    """Flatten a :class:`~vqatpu.data.features.FeatureStore` to box-row
    tables: ``(flat_f [T, v_dim], scales [T] or None, flat_sp [T, s_dim])``.
    Adaptive stores are already flat; fixed ``[N, K, ...]`` stores reshape.
    """
    if store.adaptive:
        flat_f = np.asarray(store.features)
        flat_sp = np.asarray(store.spatials)
        scales = store.feat_scales
        if scales is not None:
            scales = np.asarray(scales, np.float32)
    else:
        f = np.asarray(store.features)
        flat_f = f.reshape(-1, f.shape[-1])
        flat_sp = np.asarray(store.spatials).reshape(-1, store.s_dim)
        scales = (None if store.feat_scales is None
                  else np.asarray(store.feat_scales, np.float32).reshape(-1))
    return flat_f, scales, flat_sp


def store_rows_table(store, max_boxes: int, row_offset: int,
                     sentinel: int) -> np.ndarray:
    """Per-image ``[n_images, max_boxes]`` int32 table of flat row indices
    (``row_offset`` added for multi-store concats), padded with
    ``sentinel`` (the shared all-zero row).  Mirrors ``FeatureStore.get``'s
    box selection exactly: adaptive images clip to ``max_boxes`` boxes from
    ``pos_boxes`` (reference ``FFOE/dataset.py:350-357``), fixed images
    take the first ``min(K, max_boxes)``."""
    if store.adaptive:
        pos = np.asarray(store.pos_boxes)
        n_images = pos.shape[0]
        table = np.full((n_images, max_boxes), sentinel, np.int32)
        for i, (lo, hi) in enumerate(pos):
            c = min(int(hi) - int(lo), max_boxes)
            table[i, :c] = row_offset + np.arange(int(lo), int(lo) + c)
    else:
        n_images, k = np.asarray(store.features).shape[:2]
        c = min(k, max_boxes)
        table = np.full((n_images, max_boxes), sentinel, np.int32)
        table[:, :c] = (row_offset + np.arange(n_images)[:, None] * k
                        + np.arange(c)[None, :])
    return table


def _dataset_members(dataset) -> list:
    return list(getattr(dataset, "datasets", [])) or [dataset]


def devstore_capable(dataset, task: str = "ffoe") -> Tuple[bool, str]:
    """Whether :meth:`DeviceFeatureStore.build` can serve this dataset:
    every member (ConcatDataset aware) must expose an in-memory
    FeatureStore + entries with image indices.

    Both tasks qualify: FFOE gathers one image per row; MC's x4 candidate
    expansion simply tiles ``ds_idx`` (``mc_dataset.expand_mc_batch``), so
    the same gather materializes the expanded ``[B*4, boxes, d]`` slabs —
    the expansion that QUADRUPLED the host wire costs nothing on device."""
    if task not in ("ffoe", "mc"):
        return False, f"device_features does not support task {task!r}"
    for d in _dataset_members(dataset):
        if not (hasattr(d, "store") and hasattr(d, "entries")):
            return False, "dataset has no FeatureStore/entries"
        if not getattr(d.store, "in_memory", True):
            return False, ("streaming store (--stream_features) can't be "
                           "uploaded to HBM — drop one of the two flags")
    return True, ""


def normalize_device_features(value) -> str:
    """Tri-state ``--device_features`` knob: ``"auto"`` (the default —
    build the store when the dataset is capable AND the tables fit the
    HBM budget), ``"on"`` (build, declining loudly when impossible),
    ``"off"``.  Bools are accepted for back-compat (True -> on,
    False -> off)."""
    if value is True:
        return "on"
    if value is False or value is None:
        return "off"
    v = str(value).lower()
    if v not in ("auto", "on", "off"):
        raise ValueError(
            f"device_features must be auto/on/off, got {value!r}")
    return v


def estimate_hbm_bytes(dataset, transfer_dtype: str = "float32") -> int:
    """Predicted HBM footprint of :meth:`DeviceFeatureStore.build` WITHOUT
    building it — pure shape arithmetic following build's dtype rules
    (int8 rows + f32 scales under an int8 wire or all-int8-resident f32
    wire; wire-width casts otherwise; spatials f16 under int8).  Used by
    the ``auto`` mode's fit check before any host/device allocation."""
    stores, seen = [], set()
    for d in _dataset_members(dataset):
        if id(d.store) not in seen:
            seen.add(id(d.store))
            stores.append(d.store)
    int8_resident = all(s.feat_scales is not None for s in stores)
    want_int8 = transfer_dtype == "int8" or (
        transfer_dtype == "float32" and int8_resident)
    wire_width = {"float32": 4, "float16": 2, "bfloat16": 2, "int8": 1}
    total = 0
    for s in stores:
        f_shape = np.shape(s.features)
        rows = f_shape[0] if s.adaptive else f_shape[0] * f_shape[1]
        v_dim = f_shape[-1]
        s_dim = np.shape(s.spatials)[-1]
        per_feat = (v_dim + 4) if want_int8 \
            else v_dim * wire_width[transfer_dtype]
        per_sp = s_dim * (2 if transfer_dtype != "float32" else 4)
        total += rows * (per_feat + per_sp)
    return int(total)


def hbm_budget_bytes(device=None) -> Tuple[int, str]:
    """(budget, source) for the auto-mode fit check: the
    ``VQATPU_DEVSTORE_BUDGET_MB`` override if set, else 50% of the
    backend-reported free device memory (leaving room for activations /
    grad buffers the step allocates later), else a conservative 4 GiB
    when the backend publishes no memory stats (CPU tests)."""
    env = os.environ.get("VQATPU_DEVSTORE_BUDGET_MB")
    if env:
        return int(float(env) * 2**20), "VQATPU_DEVSTORE_BUDGET_MB"
    dev = device if device is not None else jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:  # noqa: BLE001 — backends without stats
        stats = {}
    limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    if limit:
        free = max(0, int(limit) - int(stats.get("bytes_in_use", 0)))
        return free // 2, "50% of free device memory"
    return 4 * 2**30, "4 GiB default (no backend memory stats)"


def devstore_decision(dataset, mode, transfer_dtype: str,
                      task: str = "ffoe",
                      shard: bool = False) -> Tuple[bool, str]:
    """Resolve the tri-state knob to ``(build?, reason-if-not)``.

    ``off`` -> (False, "") — silent, the user opted out.  ``on`` (or
    ``shard``, which implies it) -> capability check only; incapable
    declines with a loud reason.  ``auto`` -> capability check PLUS the
    HBM fit check (:func:`estimate_hbm_bytes` vs
    :func:`hbm_budget_bytes`), so the 20x input-pipeline win is the
    default experience whenever it is safe."""
    mode = normalize_device_features(mode)
    if shard:
        mode = "on"
    if mode == "off":
        return False, ""
    ok, why = devstore_capable(dataset, task)
    if not ok:
        return False, why
    if mode == "auto":
        est = estimate_hbm_bytes(dataset, transfer_dtype)
        budget, src = hbm_budget_bytes()
        if est > budget:
            return False, (
                f"auto: estimated tables {est / 2**20:.0f} MiB exceed the "
                f"budget {budget / 2**20:.0f} MiB ({src}) — force with "
                "--device_features on, or row-shard across the mesh with "
                "--shard_feature_store")
    return True, ""


_WIRE_NP = {"float16": np.float16, "bfloat16": jnp.bfloat16,
            "float32": np.float32}


class DeviceFeatureStore:
    """Device-resident gather tables + the per-batch gather function.

    Build with :meth:`build`; per batch call :meth:`gather` with the
    loader's ``ds_idx`` (dataset sample indices) to get the
    ``v``/``v_scale``/``b``/``v_mask`` device tensors the train/eval steps
    consume.  ``rows_table`` covers every member dataset's images, with
    unique stores deduplicated (the VisualGenome member shares the train
    split's store object)."""

    def __init__(self, feats, scales, spats, rows_table: np.ndarray,
                 sample_img: np.ndarray, sentinel: int,
                 mesh=None, data_axis: str = "data",
                 sharded: bool = False, t_local: int = 0):
        self.feats = feats          # device [T(+pad), v_dim]
        self.scales = scales        # device [T(+pad)] f32 or None
        self.spats = spats          # device [T(+pad), s_dim]
        self.rows_table = rows_table      # host [n_images_total, max_boxes]
        self.sample_img = sample_img      # host [n_samples] -> rows_table row
        self.sentinel = int(sentinel)
        self.mesh = mesh
        self.data_axis = data_axis
        self.sharded = sharded
        self._t_local = t_local     # table rows per shard (sharded mode)
        self._gather_fn = None

    # -- construction --------------------------------------------------------

    @classmethod
    def build(cls, dataset, transfer_dtype: str = "float32",
              mesh=None, data_axis: str = "data",
              shard: bool = False) -> "DeviceFeatureStore":
        """Upload the dataset's store(s) as HBM gather tables.

        Table dtypes follow the wire contract (``train.steps.wire_cast``)
        so gathered batches are bit-identical to host-shipped ones:

        - ``int8``: rows int8 + f32 scales (idempotent re-quantization of
          f32 stores; int8-resident stores upload as-is), spatials f16;
        - ``float16``/``bfloat16``: rows + spatials cast once at build
          (int8-resident members dequantize first, exactly as the host
          path's ``store.get`` does before ``wire_cast``);
        - ``float32``: f32 rows — unless EVERY member store is
          int8-resident (``--quantize_store``), which keeps rows int8 and
          dequantizes on device (the same per-row ``q*s`` f32 product the
          host path computes in ``store.get``).
        """
        members = _dataset_members(dataset)
        stores, store_slot = [], {}
        for d in members:
            if id(d.store) not in store_slot:
                store_slot[id(d.store)] = len(stores)
                stores.append(d.store)
        max_boxes = {d.max_boxes for d in members}
        assert len(max_boxes) == 1, \
            f"members disagree on max_boxes: {max_boxes}"
        max_boxes = max_boxes.pop()

        flats = [store_flat_arrays(s) for s in stores]
        if transfer_dtype == "int8":
            want_int8 = True
        elif transfer_dtype == "float32":
            want_int8 = all(f[1] is not None for f in flats)
        else:
            want_int8 = False
        parts_f, parts_s, parts_sp = [], [], []
        for flat_f, scales, flat_sp in flats:
            if want_int8 and scales is None:
                from vqatpu.data.native import quantize_rows_any
                flat_f, scales = quantize_rows_any(flat_f)
            elif not want_int8 and scales is not None:
                # int8-resident store under a float wire: match the host
                # path, which dequantizes per row in store.get
                flat_f = flat_f.astype(np.float32) * scales[:, None]
                scales = None
            parts_f.append(flat_f)
            parts_s.append(scales)
            parts_sp.append(flat_sp)

        if want_int8:
            flat_f = np.concatenate(
                parts_f + [np.zeros((1, parts_f[0].shape[1]), np.int8)], 0)
            scales = np.concatenate(
                [np.asarray(s, np.float32) for s in parts_s]
                + [np.ones((1,), np.float32)], 0)
        else:
            wire = _WIRE_NP[transfer_dtype]
            # copy=False: under the default f32 wire this table is the
            # multi-GB concat result itself — a copying astype would
            # transiently double host RAM for a no-op cast
            flat_f = np.concatenate(
                [np.asarray(f, np.float32) for f in parts_f]
                + [np.zeros((1, parts_f[0].shape[1]), np.float32)],
                0).astype(wire, copy=False)
            scales = None
        # b's wire dtype follows transfer_dtype alone (wire_cast ships b
        # f16 under int8, untouched under f32 — even when the RESIDENT v
        # stays int8 because every member store is --quantize_store)
        spat_dtype = (np.float16 if transfer_dtype == "int8"
                      else _WIRE_NP[transfer_dtype])
        flat_sp = np.concatenate(
            [np.asarray(sp, np.float32) for sp in parts_sp]
            + [np.zeros((1, parts_sp[0].shape[1]), np.float32)],
            0).astype(spat_dtype, copy=False)
        sentinel = flat_f.shape[0] - 1

        # per-image row tables: one block per unique store, global offsets
        tables, off = [], 0
        img_off = []
        for s, flat in zip(stores, flats):
            img_off.append(sum(t.shape[0] for t in tables))
            tables.append(store_rows_table(s, max_boxes, off, sentinel))
            off += flat[0].shape[0]
        rows_table = np.concatenate(tables, 0)

        # dataset sample index -> global image row (ConcatDataset order)
        sample_img = np.concatenate([
            np.asarray([e["image"] for e in d.entries], np.int64)
            + img_off[store_slot[id(d.store)]]
            for d in members])

        t_local = 0
        if shard:
            assert mesh is not None and data_axis in mesh.axis_names, \
                "shard=True needs a mesh with the data axis"
            n_dev = int(mesh.shape[data_axis])
            t_local = -(-flat_f.shape[0] // n_dev)  # ceil division
            pad = t_local * n_dev - flat_f.shape[0]
            if pad:
                flat_f = np.concatenate(
                    [flat_f,
                     np.zeros((pad,) + flat_f.shape[1:], flat_f.dtype)], 0)
                flat_sp = np.concatenate(
                    [flat_sp,
                     np.zeros((pad,) + flat_sp.shape[1:], flat_sp.dtype)], 0)
                if scales is not None:
                    scales = np.concatenate(
                        [scales, np.ones((pad,), np.float32)], 0)
            sh = NamedSharding(mesh, P(data_axis))
        elif mesh is not None:
            sh = NamedSharding(mesh, P())
        else:
            sh = None

        put = (lambda x: jax.device_put(x, sh)) if sh is not None \
            else jnp.asarray
        return cls(put(flat_f), None if scales is None else put(scales),
                   put(flat_sp), rows_table, sample_img, sentinel,
                   mesh=mesh, data_axis=data_axis, sharded=shard,
                   t_local=t_local)

    # -- stats ----------------------------------------------------------------

    @property
    def hbm_bytes(self) -> int:
        n = self.feats.size * self.feats.dtype.itemsize \
            + self.spats.size * self.spats.dtype.itemsize
        if self.scales is not None:
            n += self.scales.size * 4
        return int(n)

    def describe(self) -> str:
        kind = "sharded" if self.sharded else "replicated"
        return (f"{self.feats.shape[0]} box rows x {self.feats.shape[1]}d "
                f"{self.feats.dtype}, {self.hbm_bytes / 2**20:.1f} MiB HBM "
                f"({kind}), {self.rows_table.shape[0]} images")

    # -- per-batch gather ------------------------------------------------------

    def rows_for(self, ds_idx) -> np.ndarray:
        """Host half: dataset sample indices ``[B]`` -> flat row indices
        ``[B, max_boxes]`` int32 (two tiny numpy gathers).  Negative
        indices (the loader's final-batch padding) map to all-sentinel
        rows — zero boxes, all-False mask, exactly the wire path's
        zero-padded rows."""
        ds_idx = np.asarray(ds_idx, np.int64)
        rows = self.rows_table[self.sample_img[np.maximum(ds_idx, 0)]]
        if (ds_idx < 0).any():
            rows = np.where(ds_idx[:, None] < 0, np.int32(self.sentinel),
                            rows)
        return rows

    def gather(self, ds_idx) -> dict:
        """Device batch slabs for the given dataset sample indices:
        ``{"v", "b", "v_mask"[, "v_scale"]}`` with the exact dtypes the
        wire path ships (see :meth:`build`).  Output arrays are sharded
        ``P(data)`` on a mesh, matching ``parallel.shard_batch``."""
        rows = self.rows_for(ds_idx)
        if self.mesh is not None:
            rows = jax.device_put(
                rows, NamedSharding(self.mesh, P(self.data_axis)))
        if self._gather_fn is None:
            self._gather_fn = (self._make_sharded_gather() if self.sharded
                               else self._make_replicated_gather())
        return self._gather_fn(rows)

    def _make_replicated_gather(self):
        sentinel = self.sentinel
        feats, scales, spats = self.feats, self.scales, self.spats

        @jax.jit
        def f(rows):
            out = {"v": jnp.take(feats, rows, axis=0),
                   "b": jnp.take(spats, rows, axis=0),
                   "v_mask": rows != sentinel}
            if scales is not None:
                out["v_scale"] = jnp.take(scales, rows)
            return out

        return f

    def _make_sharded_gather(self):
        """Row-sharded tables: all-gather the index slab, gather + zero-mask
        the locally-owned rows, ``psum_scatter`` over the batch axis.
        Emits f32 ``v``/``b`` (dequant happens pre-collective; each row is
        owned by exactly one shard and non-owned contributions are exact
        zeros, so values equal the wire path bit-for-bit)."""
        axis, t_loc, sentinel = self.data_axis, self._t_local, self.sentinel
        has_scales = self.scales is not None
        mesh = self.mesh

        def f(feats, scales, spats, rows):
            # feats [t_loc, v_dim] local shard; rows [B/D, mb] global ids
            rows_all = jax.lax.all_gather(rows, axis, axis=0, tiled=True)
            loc = rows_all - jax.lax.axis_index(axis) * t_loc
            owned = (loc >= 0) & (loc < t_loc)
            loc = jnp.clip(loc, 0, t_loc - 1)
            v = jnp.take(feats, loc, axis=0).astype(jnp.float32)
            if has_scales:
                v = v * jnp.take(scales, loc)[..., None]
            v = jnp.where(owned[..., None], v, 0.0)
            b = jnp.where(owned[..., None],
                          jnp.take(spats, loc, axis=0).astype(jnp.float32),
                          0.0)
            v = jax.lax.psum_scatter(v, axis, scatter_dimension=0,
                                     tiled=True)
            b = jax.lax.psum_scatter(b, axis, scatter_dimension=0,
                                     tiled=True)
            return {"v": v, "b": b, "v_mask": rows != sentinel}

        specs = {"v": P(axis), "b": P(axis), "v_mask": P(axis)}
        if has_scales:
            sm = jax.shard_map(f, mesh=mesh,
                               in_specs=(P(axis), P(axis), P(axis), P(axis)),
                               out_specs=specs)
            feats, scales, spats = self.feats, self.scales, self.spats
            return jax.jit(lambda rows: sm(feats, scales, spats, rows))
        g = lambda feats, spats, rows: f(feats, None, spats, rows)  # noqa: E731
        sm = jax.shard_map(g, mesh=mesh,
                           in_specs=(P(axis), P(axis), P(axis)),
                           out_specs=specs)
        feats, spats = self.feats, self.spats
        return jax.jit(lambda rows: sm(feats, spats, rows))
