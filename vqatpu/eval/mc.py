"""MC (Visual7W) scoring and evaluation.

Reference: ``MC/train.py:14-19`` (``compute_score_mc``) and ``MC/test.py``.
Logits come from the x4-expanded batch: per 4-candidate group, the argmax of
the class-0 ("match") probability picks the candidate; score is that
candidate's ground-truth label.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from vqatpu.data.batching import BatchLoader
from vqatpu.data.mc_dataset import NUM_CANDIDATES, expand_mc_batch
from vqatpu.train.steps import make_eval_step


def compute_score_mc(logits: np.ndarray, labels: np.ndarray) -> float:
    """logits [B*4, 2], labels [B*4, 2] -> number of correct picks."""
    n = NUM_CANDIDATES
    groups = logits.shape[0] // n
    # softmax is monotone: argmax over class-0 prob == argmax over
    # (logit0 - logit1) within the group
    score01 = logits[:, 0] - logits[:, 1]
    pick = score01.reshape(groups, n).argmax(1)
    return float(labels[:, 0].reshape(groups, n)[np.arange(groups), pick].sum())


def compute_score_with_emb(pred_emb: np.ndarray, mc_emb: np.ndarray,
                           gt_emb: np.ndarray) -> np.ndarray:
    """Embedding-space MC scoring (``MC/trainer.py:302-312``): pick the
    candidate whose embedding is nearest to the prediction; correct when it
    coincides with the ground-truth embedding.  ``pred_emb [B, D]``,
    ``mc_emb [B, 4, D]``, ``gt_emb [B, D]`` -> bool [B].

    Faithful to the reference's ``(chosen - gt).sum() == 0`` equality test —
    note it treats distinct vectors with equal coordinate sums as a match
    (harmless for real learned embeddings, surprising for synthetic ones)."""
    d = np.linalg.norm(pred_emb[:, None, :] - mc_emb, axis=2)  # [B, 4]
    pick = d.argmin(axis=1)
    chosen = mc_emb[np.arange(mc_emb.shape[0]), pick]
    return (chosen - gt_emb).sum(axis=1) == 0


def evaluate_mc(model, params, loader: BatchLoader, mesh=None,
                compute_dtype: str = "float32",
                transfer_dtype: str = "float32",
                dev_store=None) -> Tuple[float, float]:
    """-> (accuracy, upper_bound=1.0). Uses the same x4 expansion as
    training (``MC/test.py:89-126``).

    ``dev_store``: gather v/b from the HBM tables (the loader must then be
    ``fields_only``, shipping ``ds_idx``; expansion tiles the indices so
    the gather returns the expanded slabs).  The gathered ``v_mask`` is
    DROPPED to match this wire path, which never ships one — the model
    derives it from the zero-padded feature rows
    (``models.common.box_mask_from_features``), and sentinel rows gather
    to exact zeros, so logits stay bit-equal."""
    from vqatpu.eval.ffoe import _maybe_shard
    from vqatpu.train.steps import wire_cast

    eval_step = make_eval_step(model, compute_dtype=compute_dtype)
    score = 0.0
    n = 0
    for batch in loader:
        valid = batch.pop("valid")
        ex = expand_mc_batch(batch)
        ds_idx = ex.pop("ds_idx", None)
        db = wire_cast({k: ex[k] for k in ("v", "v_scale", "b", "q", "a")
                        if k in ex},
                       transfer_dtype)
        if dev_store is not None:
            # wire fields still need mesh placement; the gathered slabs are
            # already P(data) on the store's mesh (cf. eval.ffoe.evaluate)
            db = _maybe_shard(db, mesh)
            g = dev_store.gather(ds_idx)
            db.update({k: g[k] for k in ("v", "v_scale", "b") if k in g})
        else:
            db = _maybe_shard(db, mesh)
        out = eval_step(params, db)
        logits = np.asarray(out["logits"])
        groups = np.repeat(valid, NUM_CANDIDATES)
        # score only valid groups
        lv = logits[groups]
        tv = ex["target"][groups]
        if lv.shape[0]:
            score += compute_score_mc(lv, tv)
        n += int(valid.sum())
    return score / max(n, 1), 1.0
