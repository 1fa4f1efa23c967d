"""Region-feature store: HDF5 ingestion with the adaptive ``pos_boxes``
layout (reference ``FFOE/dataset.py:280-287,350-357``) plus static-shape
extraction.

Layouts:
- fixed:    ``image_features [N, 36, v_dim]``, ``spatial_features [N, 36, 6]``
- adaptive: ``image_features [total_boxes, v_dim]`` + ``pos_boxes [N, 2]``
            (start, end) index pairs per image, 10-100 boxes each.

TPU-first differences from the reference:
- instead of ``trim_collate``'s pad-to-batch-max (dynamic shapes =>
  recompilation), every sample is padded to a *static* ``max_boxes`` with an
  explicit validity mask — one XLA program for the whole run.
- the reference reads the WHOLE feature file into RAM at dataset
  construction (``FFOE/dataset.py:282-287`` — tens of GB for VQA trainval).
  ``from_hdf5(..., in_memory=False)`` instead keeps the HDF5 open and
  streams per-image slices on demand, so low-RAM hosts can train; the
  index-only ``pos_boxes`` table stays resident either way.
- ``from_hdf5(..., quantize=True)`` keeps the resident features int8
  (per-box symmetric quantization, the ``steps.quantize_v`` contract) —
  a 4x host-RAM cut, loaded CHUNK-WISE so the f32 block never peaks in
  RAM.  Quantization is exactly idempotent (re-quantizing ``q*s``
  recovers ``(q, s)`` bit-for-bit), so the int8 H2D wire ships the same
  bytes whether the store is quantized or not.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover - h5py is present in the image
    h5py = None


class ZeroArray:
    """Lazy all-zeros stand-in for a spatials array that is zero by
    construction (the V7W grid-feature path, reference
    ``MC/dataset.py:150-158``) — avoids materializing a features-sized zero
    block when the store itself is streaming from disk.

    Supports exactly the access pattern :meth:`FeatureStore.get` uses on the
    fixed layout: integer indexing of the leading axis.
    """

    def __init__(self, shape):
        self.shape = tuple(int(s) for s in shape)
        self.dtype = np.dtype(np.float32)

    def __getitem__(self, idx):
        if isinstance(idx, (int, np.integer)):
            return np.zeros(self.shape[1:], np.float32)
        if isinstance(idx, slice):
            n = len(range(*idx.indices(self.shape[0])))
            return np.zeros((n,) + self.shape[1:], np.float32)
        raise TypeError(f"ZeroArray supports int/slice indexing, got {idx!r}")

    def __array__(self, dtype=None, copy=None):
        # np.asarray(store.spatials) — e.g. FeatureStore.materialize() or
        # NativeFeatureStore registration — gets a real zeros block
        return np.zeros(self.shape, dtype or self.dtype)


def _quantize_rows(v: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-minor-row symmetric int8 quantization — delegates to the single
    canonical host quantizer (``native.quantize_rows_any``; C++ when the
    library builds, bit-identical numpy fallback otherwise)."""
    from vqatpu.data.native import quantize_rows_any

    return quantize_rows_any(v)


class FeatureStore:
    def __init__(self, features, spatials,
                 pos_boxes: Optional[np.ndarray] = None, h5file=None,
                 feat_scales: Optional[np.ndarray] = None):
        self.features = features
        self.spatials = spatials
        self.pos_boxes = pos_boxes
        self._h5 = h5file
        # int8-resident mode: per-box-row dequantization scales
        # ([total_boxes] adaptive / [N, K] fixed); None for f32 stores
        self.feat_scales = feat_scales

    @property
    def adaptive(self) -> bool:
        return self.pos_boxes is not None

    @property
    def quantized(self) -> bool:
        """True when the resident features are int8 (+ ``feat_scales``)."""
        return self.feat_scales is not None

    @property
    def in_memory(self) -> bool:
        """False when features/spatials are live HDF5 datasets (streaming)."""
        return self._h5 is None

    @property
    def v_dim(self) -> int:
        return int(self.features.shape[1 if self.adaptive else 2])

    @property
    def s_dim(self) -> int:
        return int(self.spatials.shape[1 if self.adaptive else 2])

    @classmethod
    def from_hdf5(cls, path: str, adaptive: bool = True,
                  in_memory: bool = True, quantize: bool = False,
                  quantize_chunk_bytes: int = 1 << 26) -> "FeatureStore":
        assert h5py is not None, "h5py unavailable"
        if quantize:
            # int8-resident load: quantize chunk-wise straight off the HDF5
            # so peak RAM ≈ the int8 block + one chunk (the f32 features are
            # never whole in memory — the 4x RAM cut applies at LOAD time)
            if not in_memory:
                raise ValueError(
                    "quantize=True requires a resident store — drop "
                    "--stream_features (--quantize_store IS the low-RAM "
                    "mode: int8-resident features, 4x less RAM)")
            with h5py.File(path, "r") as hf:
                feats = hf["image_features"]
                spatials = np.asarray(hf.get("spatial_features"))
                pos_boxes = (np.asarray(hf.get("pos_boxes")) if adaptive
                             else None)
                q = np.empty(feats.shape, np.int8)
                scales = np.empty(feats.shape[:-1], np.float32)
                chunk = max(1, quantize_chunk_bytes // max(
                    1, int(np.prod(feats.shape[1:])) * 4))  # ~64 MB f32
                for lo in range(0, feats.shape[0], chunk):
                    hi = min(feats.shape[0], lo + chunk)
                    q[lo:hi], scales[lo:hi] = _quantize_rows(feats[lo:hi])
            return cls(q, spatials, pos_boxes, feat_scales=scales)
        if in_memory:
            with h5py.File(path, "r") as hf:
                features = np.asarray(hf.get("image_features"))
                spatials = np.asarray(hf.get("spatial_features"))
                pos_boxes = np.asarray(hf.get("pos_boxes")) if adaptive else None
            return cls(features, spatials, pos_boxes)
        hf = h5py.File(path, "r")
        # pos_boxes is the tiny (N, 2) index table — always resident.
        pos_boxes = np.asarray(hf.get("pos_boxes")) if adaptive else None
        return cls(hf["image_features"], hf["spatial_features"], pos_boxes,
                   h5file=hf)

    def quantize(self) -> "FeatureStore":
        """Return an int8-resident copy of an f32 in-memory store (no-op
        when already quantized)."""
        if self.quantized:
            return self
        if not self.in_memory:
            raise ValueError("quantize a streaming store via "
                             "from_hdf5(quantize=True)")
        q, scales = _quantize_rows(np.asarray(self.features))
        return FeatureStore(q, np.asarray(self.spatials), self.pos_boxes,
                            feat_scales=scales)

    @classmethod
    def from_npz(cls, path: str) -> "FeatureStore":
        data = np.load(path)
        pos = data["pos_boxes"] if "pos_boxes" in data.files else None
        return cls(data["image_features"], data["spatial_features"], pos)

    def materialize(self) -> "FeatureStore":
        """Return an in-memory copy (no-op when already resident)."""
        if self.in_memory:
            return self
        return FeatureStore(np.asarray(self.features),
                            np.asarray(self.spatials),
                            self.pos_boxes)

    def close(self) -> None:
        if self._h5 is not None:
            self._h5.close()
            self._h5 = None

    def get(self, image_idx: int, max_boxes: int
            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (features [max_boxes, v_dim], spatials [max_boxes, s_dim],
        mask [max_boxes] bool). Padded rows are zero (the reference's
        mask-inference convention, ``attention.py:36``)."""
        if self.adaptive:
            s, e = self.pos_boxes[image_idx]
            e = min(int(e), int(s) + max_boxes)
            feats = self.features[int(s):e]
            spats = self.spatials[int(s):e]
            if self.quantized:
                feats = (feats.astype(np.float32)
                         * self.feat_scales[int(s):e, None])
        else:
            feats = self.features[int(image_idx)][:max_boxes]
            spats = self.spatials[int(image_idx)][:max_boxes]
            if self.quantized:
                feats = (feats.astype(np.float32)
                         * self.feat_scales[int(image_idx)][:max_boxes, None])
        n = feats.shape[0]
        out_f = np.zeros((max_boxes, feats.shape[1]), np.float32)
        out_s = np.zeros((max_boxes, spats.shape[1]), np.float32)
        out_f[:n] = feats
        out_s[:n] = spats
        mask = np.zeros((max_boxes,), bool)
        mask[:n] = True
        return out_f, out_s, mask
