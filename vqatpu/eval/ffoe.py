"""FFOE evaluation / inference export.

Reference: ``/root/reference/src/FFOE/test.py`` — batched no-grad logit sweep
(``get_logits``, ``:78-111``), EvalAI submission JSON (``make_json``,
``:114-122``), and the CTI teacher-logits pkl dump (``make_json_with_logits``,
``:125-130``) that closes the knowledge-distillation loop.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Tuple

import numpy as np

from vqatpu.data.batching import BatchLoader
from vqatpu.train.steps import make_eval_step, wire_cast


def _eval_batch(batch: dict, transfer_dtype: str, dev_store) -> dict:
    """Wire fields (+ device-store feature gather when a
    :class:`~vqatpu.data.device_store.DeviceFeatureStore` is active — the
    loader must then be ``fields_only``, shipping ``ds_idx`` instead of
    the v/b slabs)."""
    ds_idx = batch.pop("ds_idx", None)
    db = wire_cast({k: v for k, v in batch.items()
                    if k in ("v", "v_scale", "b", "q", "a", "v_mask",
                             "target")},
                   transfer_dtype)
    if dev_store is not None:
        db.update(dev_store.gather(ds_idx))
    return db


def get_logits(model, params, loader: BatchLoader,
               compute_dtype: str = "float32",
               transfer_dtype: str = "float32",
               dev_store=None) -> Tuple[np.ndarray, np.ndarray]:
    """Sweep the loader; -> (pred [N, num_ans], qids [N])."""
    eval_step = make_eval_step(model, compute_dtype=compute_dtype)
    preds, qids = [], []
    for batch in loader:
        valid = batch.pop("valid")
        db = _eval_batch(batch, transfer_dtype, dev_store)
        out = eval_step(params, db)
        logits = np.asarray(out["logits"])[valid]
        preds.append(logits)
        qids.append(batch["qid"][valid])
    return np.concatenate(preds, 0), np.concatenate(qids, 0)


_warned_eval_fallback = False


def _maybe_shard(db: dict, mesh):
    """Shard an eval batch over the data mesh when one is active (in-loop
    eval then runs on every chip, like the train step); padded eval batches
    are always full-size, so divisibility only depends on the batch size."""
    if mesh is None:
        return db
    from vqatpu.parallel import DATA_AXIS, shard_batch

    # only the leading axis shards, over the DATA axis — on a 2-D
    # data x model mesh the divisor is dp, not dp*tp
    dp = int(mesh.shape.get(DATA_AXIS, 1))
    batch = next(iter(db.values())).shape[0]
    if batch % dp != 0:
        global _warned_eval_fallback
        if not _warned_eval_fallback:
            print(f"| WARNING: eval batch {batch} not divisible by the "
                  f"data-mesh size {dp}; evaluating without batch sharding "
                  "(slower on pods — pick a divisible eval batch)")
            _warned_eval_fallback = True
        return db
    return shard_batch(db, mesh)


def evaluate(model, params, loader: BatchLoader, mesh=None,
             compute_dtype: str = "float32",
             transfer_dtype: str = "float32",
             dev_store=None) -> Tuple[float, float]:
    """Soft-accuracy + upper bound over a val loader
    (``FFOE/train.py:119-149``).  ``dev_store``: gather v/b/v_mask from
    HBM tables (caller guarantees the loader is ``fields_only`` and, on a
    mesh, that the eval batch divides the data axis — the store's gather
    is always P(data)-sharded on its mesh)."""
    eval_step = make_eval_step(model, compute_dtype=compute_dtype)
    score = 0.0
    upper = 0.0
    n = 0
    slab_keys = ("v", "v_scale", "b", "v_mask")
    for batch in loader:
        valid = batch.pop("valid")
        db = _eval_batch(batch, transfer_dtype, dev_store)
        if dev_store is None:
            db = _maybe_shard(db, mesh)
        else:
            # store-gathered slabs are already P(data) on the store's mesh;
            # only the wire fields need placing
            wire = _maybe_shard({k: v for k, v in db.items()
                                 if k not in slab_keys}, mesh)
            db = dict(wire, **{k: db[k] for k in slab_keys if k in db})
        out = eval_step(params, db)
        logits = np.asarray(out["logits"])
        target = np.asarray(batch["target"])
        one_hot = np.eye(logits.shape[1], dtype=np.float32)[logits.argmax(1)]
        score += float((one_hot * target)[valid].sum())
        upper += float(target.max(1)[valid].sum())
        n += int(valid.sum())
    return score / max(n, 1), upper / max(n, 1)


def compute_score_with_embedding(pred_emb: np.ndarray, labels: np.ndarray,
                                 ans_emb: np.ndarray) -> np.ndarray:
    """Embedding-distance scoring (``FFOE/test.py:68-75``): predict the
    answer whose embedding is nearest (L2) to the model output, score it
    against the soft targets.  ``pred_emb [N, D]``, ``ans_emb [num_ans, D]``,
    ``labels [N, num_ans]`` -> per-sample soft scores [N]."""
    # [N, num_ans] pairwise distances
    d = np.linalg.norm(pred_emb[:, None, :] - ans_emb[None, :, :], axis=2)
    pick = d.argmin(axis=1)
    return labels[np.arange(labels.shape[0]), pick]


def ensemble_logits(paths) -> Tuple[np.ndarray, np.ndarray]:
    """Average raw-logit dumps from N ensemble members -> (logits, qids).

    The reference parses ``--ensemble`` (``FFOE/test.py:19``) and dumps
    per-member raw logits to ``logits/<model><op><hid>_<label>/
    logits<index>.pth`` (``:172-175``) but ships no combiner — members are
    averaged offline.  This closes that loop over vqatpu's npz dumps
    (``ffoe_test --logits``).  Members are aligned by ``question_id`` so
    sweeps may batch/order differently; mismatched question sets raise.
    """
    if not paths:
        raise ValueError("ensemble needs at least one logits dump")
    logit_sum = None
    ref_qids = None
    for p in paths:
        with np.load(p) as d:
            logits, qids = d["logits"], d["question_ids"]
        if np.unique(qids).size != qids.size:
            raise ValueError(
                f"{p}: duplicate question_ids in dump — members align by "
                "qid, duplicates (e.g. concatenated dumps) would average "
                "misaligned rows")
        order = np.argsort(qids, kind="stable")
        logits, qids = logits[order], qids[order]
        if ref_qids is None:
            ref_qids = qids
            logit_sum = logits.astype(np.float64)
        else:
            if not np.array_equal(qids, ref_qids):
                raise ValueError(
                    f"{p}: question_ids differ from {paths[0]} — ensemble "
                    "members must cover the same split")
            if logits.shape != logit_sum.shape:
                raise ValueError(
                    f"{p}: logits shape {logits.shape} != {logit_sum.shape}")
            logit_sum += logits
    return (logit_sum / len(paths)).astype(np.float32), ref_qids


def make_json(logits: np.ndarray, qids: np.ndarray, label2ans) -> list:
    """EvalAI format: [{question_id, answer}] (``test.py:114-122``)."""
    assert logits.shape[0] == len(qids)
    return [
        {"question_id": int(qids[i]), "answer": label2ans[int(logits[i].argmax())]}
        for i in range(logits.shape[0])
    ]


def make_json_with_logits(logits: np.ndarray, qids: np.ndarray) -> dict:
    """Teacher-logit dump {qid: float16 logits} (``test.py:125-130``) —
    the input format of ``VQAFeatureDataset(distillation=True)``."""
    assert logits.shape[0] == len(qids)
    return {int(qids[i]): logits[i].astype(np.float16)
            for i in range(logits.shape[0])}


def export_results(output_dir: str, split: str, model_name: str, op: str,
                   num_hid: int, epoch, logits: np.ndarray, qids: np.ndarray,
                   label2ans, dump_teacher_logits: bool = False) -> dict:
    """Write the reference's result artifacts (``test.py:177-187``)."""
    os.makedirs(output_dir, exist_ok=True)
    paths = {}
    json_path = os.path.join(
        output_dir, f"{split}_{model_name}{op}{num_hid}_epoch{epoch}.json")
    with open(json_path, "w") as f:
        json.dump(make_json(logits, qids, label2ans), f)
    paths["json"] = json_path
    if dump_teacher_logits:
        pkl_path = os.path.join(output_dir, f"cti_{split}_logits.pkl")
        with open(pkl_path, "wb") as f:
            pickle.dump(make_json_with_logits(logits, qids), f)
        paths["teacher_logits"] = pkl_path
    return paths
