"""Host-side A/B: batch assembly cost across store/wire modes.

Times the SYNCHRONOUS native assembly entry points (no prefetch thread, so
the 1-core bench host measures the pure assembly pass) at serving/training
shape [256, 50, 2048], interleaved reps:

  f32_assemble      — f32 store -> f32 slab (memcpy, 100 MB written)
  q8_on_assembly    — f32 store -> int8 slab (absmax+rint, 25 MB written)
  q8_resident       — int8 store -> int8 slab (pure memcpy, 25 MB written)
  f32_from_q8       — int8 store -> f32 slab (dequant multiply)
  py_assemble       — pure-Python BatchLoader store.get loop (f32 baseline)

Run: python scripts/ab_store_quant.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vqatpu.data import native
from vqatpu.data.features import FeatureStore

B, MAXB, VDIM, SDIM = 256, 50, 2048, 6
N_IMAGES = 600
REPS = 6


def main():
    assert native.available()
    rng = np.random.RandomState(0)
    counts = rng.randint(10, 51, size=N_IMAGES)
    ends = np.cumsum(counts)
    pos = np.stack([ends - counts, ends], 1).astype(np.int64)
    total = int(ends[-1])
    feats = (rng.randn(total, VDIM) * rng.rand(total, 1) * 4).astype(np.float32)
    spats = rng.rand(total, SDIM).astype(np.float32)

    f32_store = FeatureStore(feats, spats, pos)
    q8_store = f32_store.quantize()
    nf = native.NativeFeatureStore(f32_store)
    nq = native.NativeFeatureStore(q8_store)

    idx = rng.randint(0, N_IMAGES, size=B).astype(np.int64)
    out_v = np.empty((B, MAXB, VDIM), np.float32)
    out_q = np.empty((B, MAXB, VDIM), np.int8)
    out_s = np.empty((B, MAXB), np.float32)
    out_b = np.empty((B, MAXB, SDIM), np.float32)
    out_m = np.empty((B, MAXB), np.uint8)

    import ctypes

    def ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    lib = native._load_library()

    def f32_assemble(store):
        lib.vqadata_assemble(store._handle, ptr(idx), B, MAXB, ptr(out_v),
                             ptr(out_b), ptr(out_m), 1)

    def q8_assemble(store):
        lib.vqadata_assemble_q8(store._handle, ptr(idx), B, MAXB, ptr(out_q),
                                ptr(out_s), ptr(out_b), ptr(out_m), 1)

    def py_assemble():
        for i in range(B):
            f32_store.get(int(idx[i]), MAXB)

    variants = {
        "f32_assemble": lambda: f32_assemble(nf),
        "q8_on_assembly": lambda: q8_assemble(nf),
        "q8_resident": lambda: q8_assemble(nq),
        "f32_from_q8": lambda: f32_assemble(nq),
        "py_assemble": py_assemble,
    }
    for fn in variants.values():  # warm caches / page in
        fn()
    times = {k: [] for k in variants}
    for _ in range(REPS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            times[name].append((time.perf_counter() - t0) * 1e3)
    for name, ts in times.items():
        print(f"{name:16s} best {min(ts):7.2f} ms  "
              f"median {sorted(ts)[len(ts) // 2]:7.2f} ms")


if __name__ == "__main__":
    main()
