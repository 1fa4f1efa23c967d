"""Visual7W multiple-choice dataset (reference ``src/MC/dataset.py``).

Per question: 4 MC candidate answers + ground-truth from
``answer_{split}.json`` (``MC/dataset.py:98-118,135-137``); question length
12, answer length 6 tokens; grid-feature alternative path supported via
``use_feature='grid'`` (``:150-153``).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import List

import numpy as np

from vqatpu.data.dictionary import Dictionary
from vqatpu.data.features import FeatureStore

MC_QUESTION_LEN = 12
MC_ANS_LEN = 6  # MC/dataset.py:189
NUM_CANDIDATES = 4


def _load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def load_v7w_entries(dataroot: str, name: str, img_id2idx: dict,
                     ans_candidates: dict) -> List[dict]:
    with open(os.path.join(dataroot, f"v7w_{name}_questions.json")) as f:
        questions = sorted(json.load(f)["questions"], key=lambda x: x["question_id"])
    entries = []
    for question in questions:
        cand = ans_candidates[str(question["question_id"])]
        entries.append({
            "question_id": question["question_id"],
            "image_id": question["image_id"],
            "image": img_id2idx[question["image_id"]],
            "question": question["question"],
            "label": cand["label"],
            "ans_gt": cand["ans_gt"],
            "ans_mc": cand["mc"],
        })
    return entries


class V7WDataset:
    def __init__(self, name: str, dictionary: Dictionary,
                 dataroot: str = "data_v7w", max_boxes: int = 50,
                 question_len: int = MC_QUESTION_LEN, adaptive: bool = True,
                 use_feature: str = "bottom-up",
                 features_in_memory: bool = True,
                 quantize_features: bool = False):
        assert name in ("train", "val", "test")
        self.dictionary = dictionary
        self.max_boxes = max_boxes
        self.adaptive = adaptive

        with open(os.path.join(dataroot, f"answer_{name}.json")) as f:
            self.answer_candidates = json.load(f)
        self.ans2label = _load_pickle(
            os.path.join(dataroot, "cache", "trainval_ans2label.pkl"))
        self.label2ans = _load_pickle(
            os.path.join(dataroot, "cache", "trainval_label2ans.pkl"))
        self.num_ans_candidates = len(self.ans2label)

        suffix = "" if adaptive else "36"
        if use_feature == "grid":
            # 196 fixed grid cells, zero spatials (MC/dataset.py:150-158)
            self.adaptive = False
            self.img_id2idx = _load_pickle(
                os.path.join(dataroot, "v7w", f"{name}_imgid2idx.pkl"))
            feat_base = os.path.join(dataroot, "v7w", name)
        else:
            self.img_id2idx = _load_pickle(
                os.path.join(dataroot, f"{name}{suffix}_imgid2idx.pkl"))
            feat_base = os.path.join(dataroot, f"{name}{suffix}")
        if os.path.exists(feat_base + ".hdf5"):
            self.store = FeatureStore.from_hdf5(feat_base + ".hdf5",
                                                adaptive=self.adaptive,
                                                in_memory=features_in_memory,
                                                quantize=quantize_features)
        else:
            self.store = FeatureStore.from_npz(feat_base + ".npz")
            if quantize_features:
                self.store = self.store.quantize()
        if use_feature == "grid":
            # zero spatials by construction (MC/dataset.py:150-158); lazy
            # stores get a zero *stand-in* rather than a features-sized
            # block (spatials stay f32 even over an int8-quantized store)
            self.store.spatials = (
                np.zeros(self.store.features.shape, np.float32)
                if self.store.in_memory
                else ZeroArray(self.store.features.shape))

        self.entries = load_v7w_entries(dataroot, name, self.img_id2idx,
                                        self.answer_candidates)
        # the MC tokenizer also strips '.' (MC/dataset.py:49), unlike FFOE's
        for e in self.entries:
            e["q_token"] = np.asarray(
                dictionary.tokenize_padded(e["question"], question_len,
                                           strip_period=True), np.int32)
            e["ans_gt_token"] = np.asarray(
                dictionary.tokenize_padded(e["ans_gt"], MC_ANS_LEN,
                                           strip_period=True), np.int32)
            e["ans_mc_token"] = np.asarray(
                [dictionary.tokenize_padded(a, MC_ANS_LEN, strip_period=True)
                 for a in e["ans_mc"]],
                np.int32)

    @property
    def v_dim(self) -> int:
        return self.store.v_dim

    @property
    def s_dim(self) -> int:
        return self.store.s_dim

    def sample_fields(self, index: int) -> dict:
        e = self.entries[index]
        return {
            "q": e["q_token"],
            "label": np.asarray(e["label"], np.float32),  # [4] 0/1 per candidate
            "ans_mc": e["ans_mc_token"],  # [4, MC_ANS_LEN]
            "ans_gt": e["ans_gt_token"],
            "qid": np.int64(e["question_id"]),
        }

    def sample(self, index: int) -> dict:
        out = self.sample_fields(index)
        feats, spats, mask = self.store.get(self.entries[index]["image"],
                                            self.max_boxes)
        out.update(v=feats, b=spats, v_mask=mask)
        return out

    def __len__(self) -> int:
        return len(self.entries)


def expand_mc_batch(batch: dict) -> dict:
    """x4 candidate expansion (``MC/train.py:74-83``): tile v/b/q per
    candidate, flatten ans_mc, build 2-class [a, 1-a] targets.  Pure numpy on
    the host, feeding a static [B*4, ...] device batch.

    Feature slabs (v/b/v_mask/v_scale) are tiled when present; a
    ``fields_only`` batch (the device-feature-store wire) instead tiles
    ``ds_idx``, and the HBM gather of the repeated indices materializes the
    expanded slabs directly — the x4 wire amplification never happens."""
    B = batch["q"].shape[0]
    n = NUM_CANDIDATES

    def tile(x):
        return np.repeat(x[:, None], n, axis=1).reshape((B * n,) + x.shape[1:])

    a = batch["label"].reshape(B * n, 1)
    out = {
        "q": tile(batch["q"]),
        "a": batch["ans_mc"].reshape(B * n, -1),
        "target": np.concatenate([a, 1.0 - a], axis=1).astype(np.float32),
        "qid": tile(batch["qid"]),
    }
    # int8-wire side tensor (v_scale) rides with its v
    for k in ("v", "b", "v_mask", "v_scale", "ds_idx"):
        if k in batch:
            out[k] = tile(batch[k])
    return out
