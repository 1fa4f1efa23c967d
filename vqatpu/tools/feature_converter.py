"""Bottom-up-attention TSV -> HDF5 feature conversion.

Reference: ``tools/detection_features_converter.py`` (fixed 36 boxes) and
``tools/adaptive_detection_features_converter.py`` (adaptive 10-100 boxes
with the flat ``image_features [total_boxes, 2048]`` + ``pos_boxes [N, 2]``
layout).  TSV rows: image_id, image_w, image_h, num_boxes, boxes (base64
float32 [n, 4]), features (base64 float32 [n, 2048]).

Spatial features are the 6-d scaled geometry
``(x1/w, y1/h, x2/w, y2/h, bw/w, bh/h)``
(``detection_features_converter.py:94-103``).

Run: ``python -m vqatpu.tools.feature_converter --split train --tsv x.tsv
      --out data_vqa`` (add ``--fixed 36`` for the fixed-box layout).
"""

from __future__ import annotations

import argparse
import base64
import csv
import os
import pickle
import sys
from typing import Iterable, List

import numpy as np

FIELDNAMES = ["image_id", "image_w", "image_h", "num_boxes", "boxes", "features"]
FEATURE_LENGTH = 2048


def decode_row(row: dict, feature_length: int = FEATURE_LENGTH):
    num_boxes = int(row["num_boxes"])
    boxes = np.frombuffer(
        base64.b64decode(row["boxes"]), np.float32).reshape(num_boxes, 4)
    features = np.frombuffer(
        base64.b64decode(row["features"]), np.float32).reshape(
            num_boxes, feature_length)
    return int(row["image_id"]), float(row["image_w"]), float(row["image_h"]), \
        num_boxes, boxes, features


def spatial_features(boxes: np.ndarray, image_w: float, image_h: float) -> np.ndarray:
    """[n, 4] xyxy -> [n, 6] scaled (x1, y1, x2, y2, w, h)."""
    scaled_w = (boxes[:, 2] - boxes[:, 0]) / image_w
    scaled_h = (boxes[:, 3] - boxes[:, 1]) / image_h
    return np.column_stack([
        boxes[:, 0] / image_w,
        boxes[:, 1] / image_h,
        boxes[:, 2] / image_w,
        boxes[:, 3] / image_h,
        scaled_w,
        scaled_h,
    ]).astype(np.float32)


def iter_tsv(paths: Iterable[str]):
    csv.field_size_limit(sys.maxsize)
    for path in paths:
        with open(path, "r+") as f:
            for row in csv.DictReader(f, delimiter="\t", fieldnames=FIELDNAMES):
                yield row


def convert_adaptive(split: str, tsv_files: List[str], out_dir: str,
                     feature_length: int = FEATURE_LENGTH) -> None:
    """Adaptive layout: flat features + pos_boxes ranges."""
    import h5py

    all_feats, all_spats, all_bbs, pos = [], [], [], []
    img_id2idx = {}
    offset = 0
    for row in iter_tsv(tsv_files):
        image_id, w, h, n, boxes, feats = decode_row(row, feature_length)
        img_id2idx[image_id] = len(pos)
        pos.append([offset, offset + n])
        offset += n
        all_bbs.append(boxes)
        all_feats.append(feats)
        all_spats.append(spatial_features(boxes, w, h))

    os.makedirs(out_dir, exist_ok=True)
    with h5py.File(os.path.join(out_dir, f"{split}.hdf5"), "w") as hf:
        hf.create_dataset("image_features", data=np.concatenate(all_feats, 0))
        hf.create_dataset("image_bb", data=np.concatenate(all_bbs, 0))
        hf.create_dataset("spatial_features", data=np.concatenate(all_spats, 0))
        hf.create_dataset("pos_boxes", data=np.asarray(pos, np.int64))
    with open(os.path.join(out_dir, f"{split}_imgid2idx.pkl"), "wb") as f:
        pickle.dump(img_id2idx, f)
    print(f"{split}: {len(pos)} images, {offset} boxes")


def convert_fixed(split: str, tsv_files: List[str], out_dir: str,
                  num_fixed_boxes: int = 36,
                  feature_length: int = FEATURE_LENGTH) -> None:
    """Fixed-k layout: [N, k, 2048] (``detection_features_converter.py``)."""
    import h5py

    feats, spats, bbs = [], [], []
    img_id2idx = {}
    for row in iter_tsv(tsv_files):
        image_id, w, h, n, boxes, f_ = decode_row(row, feature_length)
        assert n == num_fixed_boxes, (image_id, n)
        img_id2idx[image_id] = len(feats)
        feats.append(f_)
        bbs.append(boxes)
        spats.append(spatial_features(boxes, w, h))

    os.makedirs(out_dir, exist_ok=True)
    with h5py.File(os.path.join(out_dir, f"{split}{num_fixed_boxes}.hdf5"), "w") as hf:
        hf.create_dataset("image_features", data=np.stack(feats, 0))
        hf.create_dataset("image_bb", data=np.stack(bbs, 0))
        hf.create_dataset("spatial_features", data=np.stack(spats, 0))
    with open(os.path.join(out_dir,
                           f"{split}{num_fixed_boxes}_imgid2idx.pkl"), "wb") as f:
        pickle.dump(img_id2idx, f)
    print(f"{split}: {len(feats)} images x {num_fixed_boxes} boxes")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--split", required=True)
    parser.add_argument("--tsv", nargs="+", required=True)
    parser.add_argument("--out", default="data_vqa")
    parser.add_argument("--fixed", type=int, default=None,
                        help="fixed box count (omit for adaptive layout)")
    args = parser.parse_args(argv)
    if args.fixed:
        convert_fixed(args.split, args.tsv, args.out, args.fixed)
    else:
        convert_adaptive(args.split, args.tsv, args.out)


if __name__ == "__main__":
    main()
