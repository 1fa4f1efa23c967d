"""Region-feature store: HDF5 ingestion with the adaptive ``pos_boxes``
layout (reference ``FFOE/dataset.py:280-287,350-357``) plus static-shape
extraction.

Layouts:
- fixed:    ``image_features [N, 36, v_dim]``, ``spatial_features [N, 36, 6]``
- adaptive: ``image_features [total_boxes, v_dim]`` + ``pos_boxes [N, 2]``
            (start, end) index pairs per image, 10-100 boxes each.

TPU-first difference from the reference: instead of ``trim_collate``'s
pad-to-batch-max (dynamic shapes => recompilation), every sample is padded to
a *static* ``max_boxes`` with an explicit validity mask — one XLA program for
the whole run.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover - h5py is present in the image
    h5py = None


class FeatureStore:
    def __init__(self, features: np.ndarray, spatials: np.ndarray,
                 pos_boxes: Optional[np.ndarray] = None):
        self.features = features
        self.spatials = spatials
        self.pos_boxes = pos_boxes

    @property
    def adaptive(self) -> bool:
        return self.pos_boxes is not None

    @property
    def v_dim(self) -> int:
        return int(self.features.shape[1 if self.adaptive else 2])

    @property
    def s_dim(self) -> int:
        return int(self.spatials.shape[1 if self.adaptive else 2])

    @classmethod
    def from_hdf5(cls, path: str, adaptive: bool = True) -> "FeatureStore":
        assert h5py is not None, "h5py unavailable"
        with h5py.File(path, "r") as hf:
            features = np.asarray(hf.get("image_features"))
            spatials = np.asarray(hf.get("spatial_features"))
            pos_boxes = np.asarray(hf.get("pos_boxes")) if adaptive else None
        return cls(features, spatials, pos_boxes)

    @classmethod
    def from_npz(cls, path: str) -> "FeatureStore":
        data = np.load(path)
        pos = data["pos_boxes"] if "pos_boxes" in data.files else None
        return cls(data["image_features"], data["spatial_features"], pos)

    def get(self, image_idx: int, max_boxes: int
            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (features [max_boxes, v_dim], spatials [max_boxes, s_dim],
        mask [max_boxes] bool). Padded rows are zero (the reference's
        mask-inference convention, ``attention.py:36``)."""
        if self.adaptive:
            s, e = self.pos_boxes[image_idx]
            feats = self.features[s:e][:max_boxes]
            spats = self.spatials[s:e][:max_boxes]
        else:
            feats = self.features[image_idx][:max_boxes]
            spats = self.spatials[image_idx][:max_boxes]
        n = feats.shape[0]
        out_f = np.zeros((max_boxes, feats.shape[1]), np.float32)
        out_s = np.zeros((max_boxes, spats.shape[1]), np.float32)
        out_f[:n] = feats
        out_s[:n] = spats
        mask = np.zeros((max_boxes,), bool)
        mask[:n] = True
        return out_f, out_s, mask
