"""ctypes binding for the native batch-assembly runtime (native/vqadata.cc).

``NativeFeatureStore`` wraps a FeatureStore's arrays for zero-copy gather+pad
in C++; ``NativeBatchLoader`` is a drop-in BatchLoader replacement whose
feature slab assembly and shuffle/prefetch loop run on a background C++
thread pool.  Falls back to the pure-Python loader when the shared library
is absent and cannot be built (``available()`` reports state).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvqadata.so")

_lib = None
_lib_failed = False  # cache build/load failure: callers hit this per batch
# (steps.wire_cast -> quantize_rows_any on the int8 wire), and re-spawning
# a failing `make` subprocess every batch would silently cost ~100 ms each


def _load_library():
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            _lib_failed = True
            print(f"vqatpu native runtime unavailable (build failed: {e!r});"
                  " falling back to numpy paths", flush=True)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        _lib_failed = True
        print(f"vqatpu native runtime unavailable (load failed: {e!r});"
              " falling back to numpy paths", flush=True)
        return None
    lib.vqadata_store_create.restype = ctypes.c_void_p
    lib.vqadata_store_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.vqadata_store_destroy.argtypes = [ctypes.c_void_p]
    lib.vqadata_assemble.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.vqadata_loader_create.restype = ctypes.c_void_p
    lib.vqadata_loader_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int64]
    lib.vqadata_loader_push_order.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.vqadata_loader_register_slot.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p]
    lib.vqadata_loader_swap_vb.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
    lib.vqadata_loader_next.restype = ctypes.c_int64
    lib.vqadata_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.vqadata_loader_destroy.argtypes = [ctypes.c_void_p]
    try:  # newer symbols — tolerate a stale prebuilt .so
        lib.vqadata_loader_create_multi.restype = ctypes.c_void_p
        lib.vqadata_loader_create_multi.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int64]
        lib.vqadata_quantize_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.vqadata_loader_set_quantize.argtypes = [
            ctypes.c_void_p, ctypes.c_int]
        lib.vqadata_loader_register_slot_q8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.vqadata_loader_swap_vq8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.vqadata_assemble_q8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64]
        lib.vqadata_store_create_q8.restype = ctypes.c_void_p
        lib.vqadata_store_create_q8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64]
    except AttributeError:
        pass
    _lib = lib
    return lib


def available() -> bool:
    return _load_library() is not None


def quantize_rows(v: np.ndarray, num_threads: int = 2):
    """C++ single-pass per-row int8 quantization (the steps.quantize_v
    contract: scale = absmax/127, all-zero rows scale 1).  Each minor row is
    read once hot in L1; the numpy expression pays 3-4 cold full-array
    passes (~8x slower at [256,50,2048] on the 1-core bench host).
    Returns None when the native library (or symbol) is unavailable."""
    lib = _load_library()
    if lib is None or not hasattr(lib, "vqadata_quantize_rows"):
        return None
    v = np.ascontiguousarray(v, np.float32)
    rows = int(np.prod(v.shape[:-1])) if v.ndim > 1 else 1
    d = v.shape[-1]
    q = np.empty(v.shape, np.int8)
    scale = np.empty(v.shape[:-1], np.float32)
    lib.vqadata_quantize_rows(_ptr(v), rows, d, _ptr(q), _ptr(scale),
                              num_threads)
    return q, scale


def quantize_rows_any(v: np.ndarray):
    """THE host-side per-row int8 quantizer (scale = absmax/127, all-zero
    rows scale 1, round-half-even): C++ single-pass when the library
    builds, bit-identical numpy fallback otherwise.  Every host quantize
    site (steps.quantize_v, FeatureStore.quantize, serve) delegates here —
    one implementation, one contract."""
    v = np.asarray(v, np.float32)
    try:
        out = quantize_rows(v)
        if out is not None:
            return out
    except Exception:
        pass
    # numpy fallback: max/-min reductions avoid the full-size |v| temp
    amax = np.maximum(v.max(axis=-1), -v.min(axis=-1))
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.rint(v * (1.0 / scale)[..., None]).astype(np.int8)
    return q, scale


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def _aligned_empty(shape, dtype, align: int = 64) -> np.ndarray:
    """Uninitialized array whose data pointer is ``align``-byte aligned.

    JAX's CPU backend hands sufficiently-aligned numpy buffers to XLA
    ZERO-COPY (device_put/jit arguments alias the source memory; ~32-byte
    alignment required, and numpy's own allocator only hits it by luck).
    Aligning the ring buffers makes the fast path deterministic — and makes
    the buffer-lifetime discipline below mandatory rather than
    alignment-roulette."""
    size = int(np.prod(shape)) * np.dtype(dtype).itemsize
    buf = np.empty(size + align, np.uint8)
    off = (-buf.ctypes.data) % align
    return buf[off:off + size].view(dtype).reshape(shape)


class NativeFeatureStore:
    """Registers feature arrays with the native runtime."""

    def __init__(self, store):
        lib = _load_library()
        assert lib is not None, "libvqadata.so unavailable"
        self._lib = lib
        self.quantized = bool(getattr(store, "quantized", False))
        # keep references so the arrays outlive the C handle
        if self.quantized:
            assert hasattr(lib, "vqadata_store_create_q8"), \
                "stale libvqadata.so: rebuild with `make -C native`"
            self.features = np.ascontiguousarray(store.features, np.int8)
            self.feat_scales = np.ascontiguousarray(
                store.feat_scales, np.float32).reshape(-1)
        else:
            self.features = np.ascontiguousarray(store.features, np.float32)
        self.spatials = np.ascontiguousarray(store.spatials, np.float32)
        self.adaptive = store.adaptive
        if self.adaptive:
            self.pos_boxes = np.ascontiguousarray(store.pos_boxes, np.int64)
            pos_ptr = _ptr(self.pos_boxes)
            n_images = self.pos_boxes.shape[0]
            fixed = 0
            self.v_dim = self.features.shape[1]
            self.s_dim = self.spatials.shape[1]
        else:
            self.pos_boxes = None
            pos_ptr = None
            n_images = self.features.shape[0]
            fixed = self.features.shape[1]
            self.v_dim = self.features.shape[2]
            self.s_dim = self.spatials.shape[2]
        if self.quantized:
            self._handle = lib.vqadata_store_create_q8(
                _ptr(self.features), _ptr(self.feat_scales),
                _ptr(self.spatials), pos_ptr, n_images, fixed, self.v_dim,
                self.s_dim)
        else:
            self._handle = lib.vqadata_store_create(
                _ptr(self.features), _ptr(self.spatials), pos_ptr,
                n_images, fixed, self.v_dim, self.s_dim)

    def assemble(self, image_idx: np.ndarray, max_boxes: int,
                 num_threads: int = 8):
        n = len(image_idx)
        idx = np.ascontiguousarray(image_idx, np.int64)
        out_v = np.empty((n, max_boxes, self.v_dim), np.float32)
        out_b = np.empty((n, max_boxes, self.s_dim), np.float32)
        out_m = np.empty((n, max_boxes), np.uint8)
        self._lib.vqadata_assemble(self._handle, _ptr(idx), n, max_boxes,
                                   _ptr(out_v), _ptr(out_b), _ptr(out_m),
                                   num_threads)
        return out_v, out_b, out_m.astype(bool)

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.vqadata_store_destroy(self._handle)
            self._handle = None


class NativeBatchLoader:
    """Background-prefetching loader over a dataset with the standard
    ``sample()`` protocol.  Feature slabs (v/b/v_mask) are assembled in C++;
    small per-row fields (q/a/target/qid) are precomputed once as dense
    numpy arrays and sliced per batch.

    DETERMINISM CONTRACT: the per-epoch row order is drawn HERE with the
    same seeded ``np.random.RandomState`` the pure-Python ``BatchLoader``
    uses and pushed to the native worker — same seed => byte-identical
    batch sequence from either loader (asserted in tests/test_native.py).
    Multi-host lockstep ordering therefore holds with either loader."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 1204, drop_last: bool = False,
                 assemble_threads: int = 0, quantize: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.quantize = quantize
        if assemble_threads <= 0:
            # leave one core for the consumer/dispatch thread
            assemble_threads = max(1, (os.cpu_count() or 1) - 1)
        self._rng = np.random.RandomState(seed)  # matches BatchLoader._rng
        lib = _load_library()
        assert lib is not None, "libvqadata.so unavailable"
        self._lib = lib
        # ConcatDataset (train + val + VisualGenome, the reference's
        # `--use_both --use_vg` headline config, README.md:49-58): one
        # NativeFeatureStore per DISTINCT member store (VG shares the VQA
        # stores, so 4 members -> 2 stores in practice) and per-row
        # (store, image) indirection in the C++ loader.
        members = list(getattr(dataset, "datasets", [])) or [dataset]
        self.stores = []
        member_store = []
        store_index: Dict[int, int] = {}
        for d in members:
            key = id(d.store)
            if key not in store_index:
                store_index[key] = len(self.stores)
                self.stores.append(NativeFeatureStore(d.store))
            member_store.append(store_index[key])
        self.store = self.stores[0]
        assert all(s.v_dim == self.store.v_dim and s.s_dim == self.store.s_dim
                   for s in self.stores), "member stores must share v/s dims"
        self.max_boxes = dataset.max_boxes

        n = len(dataset)
        self._row_to_image = np.empty(n, np.int64)
        self._row_to_store = np.empty(n, np.int32)
        rows = []
        off = 0
        for mi, d in enumerate(members):
            m = len(d)
            self._row_to_image[off:off + m] = [
                d.entries[i]["image"] for i in range(m)]
            self._row_to_store[off:off + m] = member_store[mi]
            # precompute small fields once (dense, cheap) — via
            # sample_fields when the member offers it, so construction never
            # runs the full store.get gather+pad pass it exists to replace
            fields_fn = getattr(d, "sample_fields", None)
            if fields_fn is None:
                def fields_fn(i, _d=d):
                    return {k: v for k, v in _d.sample(i).items()
                            if k not in ("v", "b", "v_mask")}
            rows.extend(fields_fn(i) for i in range(m))
            off += m
        keys = set(rows[0])
        assert all(set(r) == keys for r in rows), \
            "concat members must expose identical per-row fields"
        self._fields: Dict[str, np.ndarray] = {
            key: np.stack([r[key] for r in rows], 0) for key in rows[0]}

        if quantize:
            # checked BEFORE loader_create: failing after it would leak the
            # C Loader and its (parked) worker thread on every fallback
            assert hasattr(lib, "vqadata_loader_set_quantize"), \
                "stale libvqadata.so: rebuild with `make -C native`"
        if len(self.stores) == 1:
            self._handle = lib.vqadata_loader_create(
                self.store._handle, _ptr(self._row_to_image), n, batch_size,
                self.max_boxes, int(drop_last), assemble_threads)
        else:
            assert hasattr(lib, "vqadata_loader_create_multi"), \
                "stale libvqadata.so: rebuild with `make -C native`"
            handles = (ctypes.c_void_p * len(self.stores))(
                *[s._handle for s in self.stores])
            self._handle = lib.vqadata_loader_create_multi(
                handles, len(self.stores), _ptr(self._row_to_image),
                _ptr(self._row_to_store), n, batch_size, self.max_boxes,
                int(drop_last), assemble_threads)
        if quantize:
            # int8 quantize-on-assembly (transfer_dtype="int8" wire): the
            # worker quantizes each box row straight out of the store
            # (steps.quantize_v contract) — 4x fewer bytes written than f32
            # assembly, and the f32 slab is never materialized.
            lib.vqadata_loader_set_quantize(self._handle, 1)
        # Zero-copy ring with OWNERSHIP ROTATION: the worker assembles
        # straight into registered numpy buffers, and a yielded batch keeps
        # its big rotating buffers (v/b, plus v_scale in int8 mode) FOREVER
        # (consumers — including JAX's CPU backend, which aliases aligned
        # numpy memory into jax.Arrays — may hold them indefinitely).
        # Before a slot is recycled, fresh buffers are swapped in
        # (vqadata_loader_swap_vb / _swap_vq8); retired buffers return
        # through ``_retired`` and are reused only once their refcount
        # shows every external holder has dropped them.  mask/indices stay
        # slot-resident: next_batch copies them out synchronously.
        self._slots = []
        for _ in range(3):
            rot = self._alloc_rot()
            mask = np.zeros((batch_size, self.max_boxes), np.uint8)
            idx = np.zeros((batch_size,), np.int64)
            register = (lib.vqadata_loader_register_slot_q8 if quantize
                        else lib.vqadata_loader_register_slot)
            register(self._handle, *(_ptr(a) for a in rot), _ptr(mask),
                     _ptr(idx))
            self._slots.append((rot, mask, idx))
        self._held_slot = -1
        self._retired: list = []  # rotating-buffer tuples awaiting ownership

    def _alloc_b(self) -> np.ndarray:
        return _aligned_empty(
            (self.batch_size, self.max_boxes, self.store.s_dim), np.float32)

    def _alloc_rot(self):
        """One set of per-batch rotating buffers: (v, b) in f32 mode,
        (v_q, v_scale, b) in int8 mode."""
        shape_v = (self.batch_size, self.max_boxes, self.store.v_dim)
        if self.quantize:
            return (_aligned_empty(shape_v, np.int8),
                    _aligned_empty((self.batch_size, self.max_boxes),
                                   np.float32),
                    self._alloc_b())
        return (_aligned_empty(shape_v, np.float32), self._alloc_b())

    def _fresh_rot(self):
        """Reuse a retired buffer set iff nothing else references any of its
        arrays (the caller's batch dict, a JAX zero-copy alias, or an
        in-flight device transfer all hold a reference; getrefcount == 3
        counts exactly the retired tuple's slot, the genexpr binding, and
        the getrefcount argument).  Otherwise allocate fresh — the steady
        state retires into reuse within a batch or two, so allocation is a
        cold-start cost only."""
        import sys

        for i, bufs in enumerate(self._retired):
            if all(sys.getrefcount(a) == 3 for a in bufs):
                self._retired.pop(i)
                return bufs
        # cap the scan list; dropped entries are freed by their last holder
        if len(self._retired) > 8:
            self._retired.pop(0)
        return self._alloc_rot()

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset), dtype=np.int64)
        if self.shuffle:
            self._rng.shuffle(order)  # identical draw to BatchLoader.__iter__
        order = np.ascontiguousarray(order)
        self._lib.vqadata_loader_push_order(self._handle, _ptr(order),
                                            len(order))
        for _ in range(len(self)):
            yield self.next_batch()

    def next_batch(self) -> Dict[str, np.ndarray]:
        bs = self.batch_size
        rows_out = np.zeros((1,), np.int64)
        prev = self._held_slot
        if prev >= 0:
            # rotate ownership BEFORE recycling: the handed-out buffers of
            # the previous batch stay with their holders; the slot gets
            # fresh buffers for the worker's next assembly
            fresh = self._fresh_rot()
            swap = (self._lib.vqadata_loader_swap_vq8 if self.quantize
                    else self._lib.vqadata_loader_swap_vb)
            swap(self._handle, prev, *(_ptr(a) for a in fresh))
            old_rot, m, idx = self._slots[prev]
            self._slots[prev] = (fresh, m, idx)
            self._retired.append(old_rot)
        slot = self._lib.vqadata_loader_next(self._handle, prev,
                                             _ptr(rows_out))
        assert slot >= 0, "native loader stopped"
        self._held_slot = slot
        rows = int(rows_out[0])
        rot, out_m, out_idx = self._slots[slot]
        # partial FINAL batches arrive with zeroed tails (vqadata.cc) —
        # identical to BatchLoader.pad_final, so eval sweeps are exact
        if self.quantize:
            out_v, out_scale, out_b = rot
            batch = {"v": out_v, "v_scale": out_scale, "b": out_b,
                     "v_mask": out_m.astype(bool)}
        else:
            out_v, out_b = rot
            batch = {"v": out_v, "b": out_b, "v_mask": out_m.astype(bool)}
        valid = np.zeros((bs,), bool)
        valid[:rows] = True
        idx = out_idx[:rows]
        for key, table in self._fields.items():
            field = np.zeros((bs,) + table.shape[1:], table.dtype)
            field[:rows] = table[idx]
            batch[key] = field
        batch["valid"] = valid
        return batch

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.vqadata_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        self.close()
