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


class FeatureStore:
    def __init__(self, features, spatials,
                 pos_boxes: Optional[np.ndarray] = None, h5file=None):
        self.features = features
        self.spatials = spatials
        self.pos_boxes = pos_boxes
        self._h5 = h5file

    @property
    def adaptive(self) -> bool:
        return self.pos_boxes is not None

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
                  in_memory: bool = True) -> "FeatureStore":
        assert h5py is not None, "h5py unavailable"
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
        else:
            feats = self.features[int(image_idx)][:max_boxes]
            spats = self.spatials[int(image_idx)][:max_boxes]
        n = feats.shape[0]
        out_f = np.zeros((max_boxes, feats.shape[1]), np.float32)
        out_s = np.zeros((max_boxes, spats.shape[1]), np.float32)
        out_f[:n] = feats
        out_s[:n] = spats
        mask = np.zeros((max_boxes,), bool)
        mask[:n] = True
        return out_f, out_s, mask
