"""Inference/serving session: checkpoint -> answer strings.

The reference has no serving story beyond the offline ``test.py`` sweep;
this is the production-facing API the framework adds on top:

- one jit-compiled predict function per (batch, boxes) bucket — static
  shapes mean each bucket compiles once and stays hot;
- micro-batching: ragged request lists are packed into the smallest
  bucket, padded rows masked out;
- outputs: argmax answer strings (EvalAI semantics, ``FFOE/test.py:66-67``)
  and optionally raw logits.

Usage::

    sess = InferenceSession.from_checkpoint(ckpt, model_cfg, label2ans)
    answers = sess.answer(features, spatials, question_tokens, answer_tokens)
"""

from __future__ import annotations

import bisect
import os
import pickle
import queue
import threading
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig
from vqatpu.models import build_model
from vqatpu.train.checkpoints import load_checkpoint


class ResidentFeatures:
    """Server-resident image features for by-id serving.

    The upload endpoints mirror the reference's offline-sweep calling
    convention (``FFOE/test.py:78-111``): every request ships its own
    ``[N, boxes, 2048]`` feature tensor — ~2 MB per 32-row request and the
    dominant serving term (BENCH_MATRIX serve rows: b32 fast8 169 ms vs
    ~7.7 ms compute).  By-id serving keeps the features server-side and a
    request carries only image ids + question tokens:

    - ``placement="host"``: the store stays in host RAM; each request
      gathers + pads on host and still pays the host->device feature copy.
    - ``placement="device"`` (the TPU-native mode): the WHOLE store lives
      in HBM — int8 box rows + per-row dequant scales + a per-image
      ``[max_boxes]`` row-index table — and the jitted predict gathers and
      dequantizes ON DEVICE.  Per request, the only feature-sized traffic
      anywhere is the HBM gather itself; the wire moves ~200 bytes of row
      indices per image.  (VQA-2.0 val at 2048-d adaptive boxes is ~5 GB
      int8 — fits v5e HBM next to the 53M-param model; f32 would not.)
    """

    def __init__(self, store, img_id2idx: dict, max_boxes: int = 50):
        self.store = store
        self.img_id2idx = img_id2idx
        self.max_boxes = max_boxes

    @classmethod
    def from_dataroot(cls, dataroot: str, split: str = "val",
                      max_boxes: int = 50,
                      quantize: bool = False) -> "ResidentFeatures":
        """Load ``{split}_imgid2idx.pkl`` + ``{split}.hdf5``/``.npz`` (the
        adaptive layout, ``data/datasets.py``), falling back to the fixed-36
        ``{split}36`` naming.  ``quantize`` keeps the resident features int8
        (identical semantics to ``--quantize_store``)."""
        from vqatpu.data.features import FeatureStore

        for suffix, adaptive in (("", True), ("36", False)):
            idx_path = os.path.join(dataroot, f"{split}{suffix}_imgid2idx.pkl")
            if not os.path.exists(idx_path):
                continue
            with open(idx_path, "rb") as f:
                img_id2idx = pickle.load(f)
            h5 = os.path.join(dataroot, f"{split}{suffix}.hdf5")
            if os.path.exists(h5):
                store = FeatureStore.from_hdf5(h5, adaptive=adaptive,
                                               quantize=quantize)
            else:
                store = FeatureStore.from_npz(
                    os.path.join(dataroot, f"{split}{suffix}.npz"))
                if quantize:
                    store = store.quantize()
            return cls(store, img_id2idx, max_boxes)
        raise FileNotFoundError(
            f"no {split}_imgid2idx.pkl or {split}36_imgid2idx.pkl under "
            f"{dataroot}")

    def image_index(self, image_ids: Sequence[int]) -> np.ndarray:
        try:
            return np.asarray([self.img_id2idx[int(i)] for i in image_ids],
                              np.int64)
        except KeyError as e:
            raise KeyError(f"unknown image_id {e.args[0]} — not in this "
                           "split's imgid2idx") from None

    def gather(self, image_ids: Sequence[int]):
        """Host gather+pad: -> (v [N, max_boxes, v_dim] f32,
        b [N, max_boxes, s_dim] f32)."""
        vs, bs = [], []
        for idx in self.image_index(image_ids):
            v, b, _ = self.store.get(int(idx), self.max_boxes)
            vs.append(v)
            bs.append(b)
        return np.stack(vs, 0), np.stack(bs, 0)

    def device_tables(self, quantize: bool = True):
        """Build the HBM-resident gather tables.

        -> ``(feats, scales, spats, rows_table, sentinel)`` where ``feats``
        is ``[T+1, v_dim]`` int8 (or f32 when ``quantize=False`` on an f32
        store), ``scales`` ``[T+1]`` f32 or None, ``spats`` ``[T+1, s_dim]``
        f32, and ``rows_table`` is a HOST ``[n_images, max_boxes]`` int32
        table of flat row indices (padded with ``sentinel = T``, a zero
        row).  The jitted predict receives ``rows_table[image_index]`` and
        does ``feats[rows]`` on device."""
        from vqatpu.data.device_store import (store_flat_arrays,
                                              store_rows_table)
        from vqatpu.data.features import _quantize_rows

        # same flatten + row-table semantics as the training device store
        # (one shared implementation, so a box-selection or scale-layout
        # change can never diverge serving gathers from training gathers)
        flat_f, scales, flat_sp = store_flat_arrays(self.store)
        if quantize and scales is None:
            flat_f, scales = _quantize_rows(flat_f)
        T = flat_f.shape[0]
        feats = np.concatenate(
            [flat_f, np.zeros((1, flat_f.shape[1]), flat_f.dtype)], 0)
        spats = np.concatenate(
            [flat_sp, np.zeros((1, flat_sp.shape[1]), flat_sp.dtype)], 0)
        if scales is not None:
            scales = np.concatenate(
                [np.asarray(scales, np.float32), np.ones((1,), np.float32)])
        rows_table = store_rows_table(self.store, self.max_boxes,
                                      row_offset=0, sentinel=T)
        return feats, scales, spats, rows_table, T


class InferenceSession:
    def __init__(self, model, params, label2ans: Sequence[str],
                 batch_buckets: Sequence[int] = (1, 8, 32, 128),
                 max_boxes: int = 50, transfer_dtype=None,
                 compute_dtype: str = "float32"):
        self.model = model
        # compute_dtype="bfloat16" runs the forward in bf16 (params cast
        # ONCE here, features cast device-side; logits return f32) — the
        # measured BAN throughput knob (-27% step, PROFILE.md r3).  f32
        # default keeps logits bit-exact with eval/test.
        self.compute_dtype = compute_dtype
        if compute_dtype == "bfloat16":
            from vqatpu.train.steps import cast_floats
            params = cast_floats(params, jnp.bfloat16)
        self.params = params
        self.label2ans = list(label2ans)
        self.batch_buckets = sorted(batch_buckets)
        self.max_boxes = max_boxes
        # Serving latency is dominated by the host->device copy of the
        # [N, boxes, 2048] features, not compute (BENCH_MATRIX.json: 47 ms
        # b1 / 920 ms b32 on the tunnel vs 7.7 ms compute for 256 rows).
        # transfer_dtype=np.float16 halves the wire bytes; "int8" ships v
        # symmetric-quantized per box (4x cut, see steps.quantize_v); the
        # jitted predict dequantizes on device (~1e-3-level logit change —
        # measure for your deployment before enabling).
        self.transfer_dtype = transfer_dtype
        self._predict_cache: Dict[int, callable] = {}
        # by-id serving (attach_features): resident store + device tables
        self.features: Optional[ResidentFeatures] = None
        self._placement = None
        self._dev: Optional[tuple] = None  # (feats, scales, spats) on device
        self._rows_table: Optional[np.ndarray] = None  # host [n_img, mb]
        self._by_id_cache: Dict[int, callable] = {}

    @classmethod
    def from_checkpoint(cls, path: str, cfg: ModelConfig,
                        label2ans: Sequence[str], **kw) -> "InferenceSession":
        model = build_model(cfg)
        payload = load_checkpoint(path)
        params = jax.tree.map(jnp.asarray, payload["params"])
        return cls(model, params, label2ans, **kw)

    def _predict_fn(self, bucket: int):
        if bucket not in self._predict_cache:
            model = self.model

            act = (jnp.bfloat16 if self.compute_dtype == "bfloat16"
                   else jnp.float32)

            @jax.jit
            def predict(params, batch):
                if "v_scale" in batch:  # int8 wire: dequantize on device
                    batch = dict(batch)
                    scale = batch.pop("v_scale")
                    batch["v"] = batch["v"].astype(act) * scale[..., None].astype(act)
                if "v" in batch and batch["v"].dtype != act:
                    batch = dict(batch, v=batch["v"].astype(act))
                if "b" in batch and batch["b"].dtype != act:
                    batch = dict(batch, b=batch["b"].astype(act))
                logits, _ = model.apply(params, batch)
                return logits.astype(jnp.float32)

            self._predict_cache[bucket] = predict
        return self._predict_cache[bucket]

    def _bucket_for(self, n: int) -> int:
        i = bisect.bisect_left(self.batch_buckets, n)
        if i == len(self.batch_buckets):
            return self.batch_buckets[-1]
        return self.batch_buckets[i]

    def logits(self, v: np.ndarray, b: Optional[np.ndarray],
               q: np.ndarray, a: Optional[np.ndarray] = None) -> np.ndarray:
        """Batched raw logits. ``v [N, boxes<=max_boxes, v_dim]``,
        ``q [N, Q]`` int tokens, ``a [N, A]`` (CTI).  N may exceed the
        largest bucket; requests are chunked.

        Chunks are software-pipelined one deep: chunk *i*'s host->device
        transfer and compute are dispatched (both async under jax) before
        chunk *i-1*'s blocking logit readback, so the dominant feature copy
        (see ``transfer_dtype`` note above) overlaps the previous chunk's
        compute + readback instead of serializing after it.
        """
        n = v.shape[0]
        if n == 0:  # empty request batch: nothing to dispatch
            return np.zeros((0, self.model.cfg.num_classes), np.float32)
        out = []
        largest = self.batch_buckets[-1]
        pending = None  # (rows, device logits) of the previous chunk
        for start in range(0, n, largest):
            dev, rows = self._dispatch_chunk(
                v[start:start + largest],
                None if b is None else b[start:start + largest],
                q[start:start + largest],
                None if a is None else a[start:start + largest])
            if pending is not None:
                out.append(np.asarray(pending[1])[:pending[0]])
            pending = (rows, dev)
        out.append(np.asarray(pending[1])[:pending[0]])
        return np.concatenate(out, 0)

    def _dispatch_chunk(self, v, b, q, a):
        """Enqueue one chunk's transfer + predict; returns the (not yet
        read back) device logits and the real row count."""
        if v.shape[1] > self.max_boxes:  # same contract as MicroBatcher's
            v = v[:, :self.max_boxes]    # pad_boxes: truncate extra boxes
            if b is not None:
                b = b[:, :self.max_boxes]
        n = v.shape[0]
        bucket = self._bucket_for(n)

        def pad_rows(x):
            if x is None or x.shape[0] == bucket:
                return x
            pad = np.zeros((bucket - x.shape[0],) + x.shape[1:], x.dtype)
            return np.concatenate([x, pad], 0)

        def pad_boxes(x):
            if x is None or x.shape[1] == self.max_boxes:
                return x
            pad = np.zeros((x.shape[0], self.max_boxes - x.shape[1]) + x.shape[2:],
                           x.dtype)
            return np.concatenate([x, pad], 1)

        mask = np.zeros((v.shape[0], self.max_boxes), bool)
        mask[:, :v.shape[1]] = np.abs(v).sum(-1) != 0

        wire = self.transfer_dtype or np.float32
        batch = {
            "q": jnp.asarray(pad_rows(q.astype(np.int32))),
            "v_mask": jnp.asarray(pad_rows(mask)),
        }
        if wire in ("int8", np.int8):
            from vqatpu.train.steps import quantize_v

            vq, scale = quantize_v(pad_rows(pad_boxes(v)))
            batch["v"] = jnp.asarray(vq)
            batch["v_scale"] = jnp.asarray(scale)
            if b is not None:
                batch["b"] = jnp.asarray(
                    pad_rows(pad_boxes(b.astype(np.float16))))
        else:
            batch["v"] = jnp.asarray(pad_rows(pad_boxes(v.astype(wire))))
            if b is not None:
                batch["b"] = jnp.asarray(pad_rows(pad_boxes(b.astype(wire))))
        if a is not None:
            batch["a"] = jnp.asarray(pad_rows(a.astype(np.int32)))
        return self._predict_fn(bucket)(self.params, batch), n

    def answer(self, v, b, q, a=None) -> List[str]:
        """Argmax answer strings for a batch of requests."""
        logits = self.logits(v, b, q, a)
        return [self.label2ans[int(i)] for i in logits.argmax(1)]

    # -- by-image-id serving (server-resident features) --------------------
    def attach_features(self, features: ResidentFeatures,
                        placement: str = "device",
                        quantize: bool = True) -> None:
        """Enable :meth:`logits_by_id`/:meth:`answer_by_id`.

        ``placement="device"`` uploads the store's gather tables to HBM once
        (int8 rows by default — see :meth:`ResidentFeatures.device_tables`);
        the jitted predict gathers + dequantizes on device, so per-request
        wire traffic is ids + tokens only.  ``placement="host"`` gathers on
        host and reuses the upload path (features still cross host->device
        per request — the low-HBM fallback)."""
        assert placement in ("device", "host"), placement
        assert features.max_boxes == self.max_boxes, \
            (features.max_boxes, self.max_boxes)
        self.features = features
        self._placement = placement
        if placement == "device":
            feats, scales, spats, rows_table, _ = features.device_tables(
                quantize=quantize)
            self._dev = (jnp.asarray(feats),
                         None if scales is None else jnp.asarray(scales),
                         jnp.asarray(spats))
            self._rows_table = rows_table
            self._by_id_cache.clear()

    def _by_id_fn(self, bucket: int):
        if bucket not in self._by_id_cache:
            model = self.model
            act = (jnp.bfloat16 if self.compute_dtype == "bfloat16"
                   else jnp.float32)
            sentinel = self._dev[0].shape[0] - 1

            @jax.jit
            def predict(params, feats, scales, spats, rows, q, a):
                # rows [N, max_boxes] int32 into the flat [T+1, ...] tables;
                # the padded sentinel row (index T) is all-zero and masked
                v = jnp.take(feats, rows, axis=0)
                if scales is not None:
                    v = v.astype(act) * jnp.take(scales, rows)[..., None].astype(act)
                elif v.dtype != act:
                    v = v.astype(act)
                batch = {
                    "v": v,
                    "b": jnp.take(spats, rows, axis=0).astype(act),
                    "q": q,
                    "v_mask": rows != sentinel,
                }
                if a is not None:
                    batch["a"] = a
                logits, _ = model.apply(params, batch)
                return logits.astype(jnp.float32)

            self._by_id_cache[bucket] = predict
        return self._by_id_cache[bucket]

    def logits_by_id(self, image_ids: Sequence[int], q: np.ndarray,
                     a: Optional[np.ndarray] = None) -> np.ndarray:
        """Batched raw logits from server-resident features: ``image_ids``
        [N] ints (the split's COCO ids), ``q`` [N, Q] tokens.  Requires
        :meth:`attach_features`.  Chunked and software-pipelined like
        :meth:`logits`."""
        assert self.features is not None, "call attach_features() first"
        if len(image_ids) == 0:  # empty request batch
            return np.zeros((0, self.model.cfg.num_classes), np.float32)
        if self._placement == "host":
            v, b = self.features.gather(image_ids)
            return self.logits(v, b, q, a)
        img_idx = self.features.image_index(image_ids)
        rows_all = self._rows_table[img_idx]  # [N, max_boxes] int32
        n = rows_all.shape[0]
        largest = self.batch_buckets[-1]
        sentinel = np.int32(self._dev[0].shape[0] - 1)
        out, pending = [], None
        for start in range(0, n, largest):
            rows = rows_all[start:start + largest]
            qc = q[start:start + largest]
            ac = None if a is None else a[start:start + largest]
            m = rows.shape[0]
            bucket = self._bucket_for(m)
            if m < bucket:
                rows = np.concatenate(
                    [rows, np.full((bucket - m, rows.shape[1]), sentinel,
                                   np.int32)], 0)
                qc = np.concatenate(
                    [qc, np.zeros((bucket - m,) + qc.shape[1:], qc.dtype)], 0)
                if ac is not None:
                    ac = np.concatenate(
                        [ac, np.zeros((bucket - m,) + ac.shape[1:],
                                      ac.dtype)], 0)
            feats, scales, spats = self._dev
            dev = self._by_id_fn(bucket)(
                self.params, feats, scales, spats, jnp.asarray(rows),
                jnp.asarray(qc.astype(np.int32)),
                None if ac is None else jnp.asarray(ac.astype(np.int32)))
            if pending is not None:
                out.append(np.asarray(pending[1])[:pending[0]])
            pending = (m, dev)
        out.append(np.asarray(pending[1])[:pending[0]])
        return np.concatenate(out, 0)

    def answer_by_id(self, image_ids: Sequence[int], q: np.ndarray,
                     a: Optional[np.ndarray] = None) -> List[str]:
        logits = self.logits_by_id(image_ids, q, a)
        return [self.label2ans[int(i)] for i in logits.argmax(1)]

    def mc_scores(self, v, b, q, ans_mc: np.ndarray) -> np.ndarray:
        """Candidate match probabilities for MC (2-class) models.

        Reference semantics: each sample expands over its candidates
        (``MC/train.py:74-83``; spatials ARE expanded here — the reference
        forgets them, its documented as-committed BAN bug) and scores are
        the class-0 (match) softmax probabilities (``compute_score_mc``,
        ``MC/train.py:14-19``).  ``ans_mc [N, C, A]`` int candidate tokens
        -> ``[N, C]`` probabilities.
        """
        return _mc_scores(self.logits, v, b, q, ans_mc)

    def answer_mc(self, v, b, q, ans_mc: np.ndarray,
                  candidates: Optional[Sequence[Sequence[str]]] = None):
        """Pick each sample's best MC candidate.  Returns indices ``[N]``,
        or the candidate strings when ``candidates`` (``[N][C]``) is given
        (Visual7W serving: the choices come with the request, not from a
        global answer vocabulary)."""
        return _answer_mc(self.logits, v, b, q, ans_mc, candidates)

    def answer_by_embedding(self, v, b, q, ans_emb: np.ndarray,
                            a=None) -> List[str]:
        """Embedding-distance decoding (``FFOE/test.py:68-75``): treat the
        model output as an embedding and answer with the nearest row of
        ``ans_emb [num_ans, D]`` (the ``answer_embedding.pkl`` table from
        ``vqatpu.tools.create_embedding``)."""
        pred = self.logits(v, b, q, a)
        d = np.linalg.norm(pred[:, None, :] - ans_emb[None, :, :], axis=2)
        return [self.label2ans[int(i)] for i in d.argmin(1)]


def _mc_scores(logits_fn, v, b, q, ans_mc: np.ndarray) -> np.ndarray:
    """Candidate-expansion + class-0 softmax over any ``logits(v,b,q,a)``
    callable (works identically through a MicroBatcher, whose coalescing
    then batches the expanded rows with other traffic)."""
    n, c = ans_mc.shape[:2]
    vx = np.repeat(v, c, axis=0)
    bx = None if b is None else np.repeat(b, c, axis=0)
    qx = np.repeat(q, c, axis=0)
    logits = logits_fn(vx, bx, qx, np.asarray(ans_mc).reshape(n * c, -1))
    z = logits - logits.max(1, keepdims=True)
    p = np.exp(z)
    p /= p.sum(1, keepdims=True)
    return p[:, 0].reshape(n, c)


def _answer_mc(logits_fn, v, b, q, ans_mc, candidates=None):
    pick = _mc_scores(logits_fn, v, b, q, ans_mc).argmax(1)
    if candidates is None:
        return pick.tolist()
    return [candidates[i][j] for i, j in enumerate(pick)]


class MicroBatcher:
    """Dynamic micro-batching front end over an :class:`InferenceSession`.

    The HTTP server (``vqatpu.cli.serve``) runs one thread per connection;
    without coalescing, K concurrent single-question requests dispatch K
    separate bucket-1 predicts that serialize on the device and each pay
    the full dispatch + host->device overhead (the dominant serving term —
    BENCH_MATRIX ``serve_latency_b1`` ≈ 40 ms vs ``b32`` ≈ 170-400 ms, so
    32 coalesced rows cost ~5-12 ms each instead of ~40).  The batcher
    parks each caller on an event, drains the queue up to ``max_batch``
    rows (waiting at most ``max_wait_ms`` after the first request — the
    latency bound an idle server adds), packs compatible requests into ONE
    bucketed predict, and scatters the logits back.

    Requests are compatible when they agree on the presence of spatials /
    answer tokens, question width, and feature dim; each drained wave runs
    one predict per compatibility group (normally exactly one).  Thread-
    safe; exceptions propagate to the caller that submitted the bad row.
    """

    def __init__(self, session: InferenceSession, max_batch: int = 32,
                 max_wait_ms: float = 3.0):
        self.session = session
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        self._stop = False
        self.batches_run = 0  # observability: predicts actually dispatched
        self.rows_served = 0
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="vqatpu-microbatcher")
        self._thread.start()

    # -- caller side ------------------------------------------------------
    def logits(self, v, b, q, a=None) -> np.ndarray:
        """Blocking; same contract as ``InferenceSession.logits``."""
        v = np.asarray(v, np.float32)
        done = threading.Event()
        slot: dict = {}
        self._q.put((v, b, q, a, done, slot))
        done.wait()
        if "err" in slot:
            raise slot["err"]
        return slot["out"]

    def answer(self, v, b, q, a=None) -> List[str]:
        logits = self.logits(v, b, q, a)
        return [self.session.label2ans[int(i)] for i in logits.argmax(1)]

    def mc_scores(self, v, b, q, ans_mc) -> np.ndarray:
        """MC candidate scoring through the batcher: the expanded rows
        coalesce with other queued traffic like any logits call."""
        return _mc_scores(self.logits, v, b, q, ans_mc)

    def answer_mc(self, v, b, q, ans_mc, candidates=None):
        return _answer_mc(self.logits, v, b, q, ans_mc, candidates)

    # by-id requests bypass coalescing (they carry no feature payload, so
    # the per-request overhead micro-batching amortizes — the host->device
    # feature copy — does not exist on this path)
    @property
    def features(self):
        return self.session.features

    def logits_by_id(self, image_ids, q, a=None):
        return self.session.logits_by_id(image_ids, q, a)

    def answer_by_id(self, image_ids, q, a=None):
        return self.session.answer_by_id(image_ids, q, a)

    def close(self):
        self._stop = True
        self._q.put(None)  # wake the worker
        self._thread.join(timeout=5)

    # -- worker side ------------------------------------------------------
    def _drain(self, first):
        """Collect up to max_batch rows, waiting at most max_wait after the
        first request arrived."""
        items = [first]
        rows = first[0].shape[0]
        deadline = time.monotonic() + self.max_wait
        while rows < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                item = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if item is None:  # close() sentinel — requeue for the loop
                self._q.put(None)
                break
            items.append(item)
            rows += item[0].shape[0]
        return items

    @staticmethod
    def _group_key(v, b, q, a):
        return (b is None, a is None, q.shape[1],
                v.shape[2] if v.ndim == 3 else -1,
                None if a is None else np.asarray(a).shape[1])

    def _run_group(self, items):
        sess = self.session

        def pad_boxes(x):
            if x.shape[1] >= sess.max_boxes:
                return x[:, :sess.max_boxes]
            pad = np.zeros((x.shape[0], sess.max_boxes - x.shape[1])
                           + x.shape[2:], x.dtype)
            return np.concatenate([x, pad], 1)

        # assembly is INSIDE the try: a malformed request (mismatched
        # spatial dims, 1-D q, ragged candidate counts) must fail its
        # waiting callers, not escape and kill the worker thread
        try:
            counts = [it[0].shape[0] for it in items]
            V = np.concatenate([pad_boxes(it[0]) for it in items], 0)
            b0 = items[0][1]
            B = (None if b0 is None else np.concatenate(
                [pad_boxes(np.asarray(it[1], np.float32)) for it in items], 0))
            Q = np.concatenate([np.asarray(it[2], np.int32) for it in items], 0)
            a0 = items[0][3]
            A = (None if a0 is None else np.concatenate(
                [np.asarray(it[3], np.int32) for it in items], 0))
            out = sess.logits(V, B, Q, A)
            self.batches_run += 1
            self.rows_served += sum(counts)
        except Exception as e:
            for _v, _b, _q, _a, done, slot in items:
                slot["err"] = e
                done.set()
            return
        at = 0
        for (_v, _b, _q, _a, done, slot), n in zip(items, counts):
            slot["out"] = out[at:at + n]
            at += n
            done.set()

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                if self._stop:
                    return
                continue
            items = self._drain(item)
            # one predict per compatibility group (normally one group)
            groups: dict = {}
            for it in items:
                try:
                    key = self._group_key(*it[:4])
                except Exception as e:  # malformed request: fail ONLY its
                    it[5]["err"] = e    # caller; keep serving the rest
                    it[4].set()
                    continue
                groups.setdefault(key, []).append(it)
            for group in groups.values():
                try:
                    self._run_group(group)
                except BaseException as e:  # last-resort guard: the worker
                    # thread must NEVER die — parked callers would block
                    # forever on done.wait() with no one to wake them
                    for _v, _b, _q, _a, done, slot in group:
                        slot.setdefault("err", e)
                        done.set()
