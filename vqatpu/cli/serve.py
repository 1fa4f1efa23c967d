"""HTTP serving front end over :class:`vqatpu.serve.InferenceSession`.

Stdlib-only (http.server) production shim: loads a checkpoint once, answers
batched POST requests with EvalAI-style answers.

Endpoints:
- ``GET  /healthz``  -> {"status": "ok", "model": ...}
- ``POST /answer``   body: {"features": [[[f]]], "spatials": [[[s]]]?,
                            "question_tokens": [[q]], "answer_tokens": [[a]]?}
                     -> {"answers": [...], "latency_ms": ...}
- ``POST /logits``   same body -> raw logits
- ``POST /answer_mc`` (``--task mc`` checkpoints) body adds
                     ``mc_tokens [N, C, A]`` or ``mc_answers [N][C]``
                     candidate strings -> per-candidate match scores +
                     picked answers (MC/train.py:14-19 semantics)
- ``POST /answer_by_id`` / ``/logits_by_id`` (``--feature_split``): body
                     {"image_ids": [N], "question_tokens" | "questions",
                     "answer_tokens"?} — features stay server-resident
                     (HBM by default), so the request wire carries no
                     feature payload at all

Both POST endpoints also accept ``Content-Type: application/x-npz``: the
body is ``np.savez`` bytes with the same keys as the JSON form (arrays
``features``, ``question_tokens``, optional ``spatials`` /
``answer_tokens``).  JSON-encoding a 50x2048 feature tensor costs ~400 KB
and tens of host-CPU ms per request to parse; the npz wire carries the
same request in ~28 KB (float16 features) and parses in microseconds, so
a loaded server stays device-bound instead of parse-bound.  An npz
``/logits`` request gets an npz response (key ``logits``).

Run: ``python -m vqatpu.cli.serve --input saved_models/cti --epoch 12
     --dataroot data_vqa --model cti --port 8399``
"""

from __future__ import annotations

import argparse
import io
import json
import os
import pickle
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def build_session(args):
    from vqatpu.cli.common import model_config_from_args
    from vqatpu.data import Dictionary, VQAFeatureDataset
    from vqatpu.serve import InferenceSession

    task = getattr(args, "task", "ffoe")
    dictionary = Dictionary.load_from_file(
        os.path.join(args.dataroot, "dictionary.pkl"))
    if task == "mc":
        # 2-class match/non-match head — answers arrive per request as MC
        # candidates, there is no global answer vocabulary (MC/dataset.py)
        label2ans = ["match", "nonmatch"]
    else:
        with open(os.path.join(args.dataroot, "cache",
                               "trainval_label2ans.pkl"), "rb") as f:
            label2ans = pickle.load(f)

    class _DS:  # minimal surface for model_config_from_args
        pass

    ds = _DS()
    ds.dictionary = dictionary
    ds.v_dim = args.v_dim
    ds.num_ans_candidates = len(label2ans)
    cfg = model_config_from_args(args, ds, task=task)
    ckpt = os.path.join(args.input, f"model_epoch{args.epoch}.ckpt")
    # --transfer_dtype float16 narrows the host->device wire (the serving
    # bottleneck on PCIe-constrained hosts); --compute_dtype bfloat16 runs
    # the forward in bf16 (the BAN throughput knob) — both measured in
    # PROFILE.md r3, both default off for bit-exact logits.
    import jax.numpy as jnp

    wire = {"float32": None, "float16": np.float16,
            "bfloat16": jnp.bfloat16, "int8": "int8"}[
        getattr(args, "transfer_dtype", "float32")]
    return InferenceSession.from_checkpoint(
        ckpt, cfg, label2ans, max_boxes=args.max_boxes, transfer_dtype=wire,
        compute_dtype=getattr(args, "compute_dtype", "float32")), dictionary


def make_handler(session, dictionary, model_name: str, task: str = "ffoe"):
    """``session`` may be an InferenceSession or a MicroBatcher wrapping
    one (same answer/logits surface) — with the batcher, concurrent
    requests coalesce into one bucketed predict (ThreadingHTTPServer runs
    a thread per connection, so under load K single-question posts become
    one batch-K device call instead of K serialized bucket-1 calls)."""
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "model": model_name})
            else:
                self._json(404, {"error": "unknown path"})

        def _by_id(self):
            """POST /answer_by_id | /logits_by_id: features stay server-
            resident (``--feature_split``); body carries only
            ``{"image_ids": [N], "question_tokens" | "questions",
            "answer_tokens"?}`` — ~100 bytes/question instead of ~2 MB of
            features per b32 request (the upload endpoints' dominant term)."""
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length))
                ids = req["image_ids"]
                if "question_tokens" in req:
                    q = np.asarray(req["question_tokens"], np.int32)
                else:
                    q = np.asarray([dictionary.tokenize_padded(s, 12)
                                    for s in req["questions"]], np.int32)
                a = req.get("answer_tokens")
                a = None if a is None else np.asarray(a, np.int32)
                t0 = time.perf_counter()
                if self.path == "/answer_by_id":
                    out = {"answers": session.answer_by_id(ids, q, a)}
                else:
                    out = {"logits": session.logits_by_id(ids, q, a).tolist()}
                out["latency_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
                self._json(200, out)
            except Exception as e:  # surface errors as JSON, keep serving
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

        def _npz(self, arrays: dict):
            buf = io.BytesIO()
            np.savez(buf, **arrays)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-npz")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path not in ("/answer", "/logits", "/answer_mc",
                                 "/answer_by_id", "/logits_by_id"):
                self._json(404, {"error": "unknown path"})
                return
            if self.path.endswith("_by_id"):
                if getattr(session, "features", None) is None:
                    self._json(400, {"error": "server not started with "
                                              "--feature_split"})
                    return
                self._by_id()
                return
            if self.path == "/answer_mc" and task != "mc":
                # against an FFOE checkpoint mc_scores would compute a
                # meaningless class-0 softmax over the answer vocabulary —
                # refuse instead of returning plausible-looking scores
                self._json(400, {"error": "server not started with "
                                          "--task mc"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                binary = self.headers.get(
                    "Content-Type", "").startswith("application/x-npz")
                if binary:
                    with np.load(io.BytesIO(body),
                                 allow_pickle=False) as z:
                        # features may arrive float16/int8-scaled narrow;
                        # the session's transfer_dtype handles the device
                        # wire — here only widen to the f32 entry contract
                        v = np.asarray(z["features"], np.float32)
                        b = (np.asarray(z["spatials"], np.float32)
                             if "spatials" in z.files else None)
                        q = np.asarray(z["question_tokens"], np.int32)
                        a = (np.asarray(z["answer_tokens"], np.int32)
                             if "answer_tokens" in z.files else None)
                        mc_npz = (np.asarray(z["mc_tokens"], np.int32)
                                  if "mc_tokens" in z.files else None)
                else:
                    req = json.loads(body)
                    v = np.asarray(req["features"], np.float32)
                    b = req.get("spatials")
                    b = None if b is None else np.asarray(b, np.float32)
                    if "question_tokens" in req:
                        q = np.asarray(req["question_tokens"], np.int32)
                    else:
                        q = np.asarray(
                            [dictionary.tokenize_padded(s, 12)
                             for s in req["questions"]], np.int32)
                    a = req.get("answer_tokens")
                    a = None if a is None else np.asarray(a, np.int32)
                t0 = time.perf_counter()
                if self.path == "/answer_mc":
                    # MC serving: candidates per request — "mc_tokens"
                    # [N, C, A] pre-tokenized, or "mc_answers" [N][C]
                    # strings tokenized here (answer len 6, MC/dataset.py)
                    cands = None
                    if binary:
                        if mc_npz is None:
                            raise KeyError("mc_tokens")
                        mc = mc_npz
                    elif "mc_tokens" in req:
                        mc = np.asarray(req["mc_tokens"], np.int32)
                    else:
                        cands = req["mc_answers"]
                        mc = np.asarray(
                            [[dictionary.tokenize_padded(s, 6) for s in row]
                             for row in cands], np.int32)
                    scores = session.mc_scores(v, b, q, mc)
                    pick = scores.argmax(1)
                    out = {"scores": scores.tolist(),
                           "picks": pick.tolist()}
                    if cands is not None:
                        out["answers"] = [cands[i][j]
                                          for i, j in enumerate(pick)]
                elif self.path == "/answer":
                    out = {"answers": session.answer(v, b, q, a)}
                elif binary:
                    self._npz({"logits": session.logits(v, b, q, a)})
                    return
                else:
                    out = {"logits": session.logits(v, b, q, a).tolist()}
                out["latency_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
                self._json(200, out)
            except Exception as e:  # surface errors as JSON, keep serving
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class _Server(ThreadingHTTPServer):
    # default listen backlog (5) resets connections under a concurrent
    # request wave — the exact load micro-batching exists to serve
    request_queue_size = 128


def make_server(session, dictionary, model_name: str, port: int,
                host: str = "127.0.0.1",
                task: str = "ffoe") -> ThreadingHTTPServer:
    return _Server(
        (host, port), make_handler(session, dictionary, model_name, task))


def serve_in_thread(session, dictionary, model_name: str, port: int,
                    host: str = "127.0.0.1",
                    task: str = "ffoe") -> ThreadingHTTPServer:
    server = make_server(session, dictionary, model_name, port, host, task)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def main(argv=None):
    from vqatpu.cli.common import add_common_args, validate_args

    parser = argparse.ArgumentParser()
    add_common_args(parser)
    parser.add_argument("--epoch", type=str, default="12")
    parser.add_argument("--port", type=int, default=8399)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--v_dim", type=int, default=2048)
    parser.add_argument("--task", type=str, default="ffoe",
                        choices=("ffoe", "mc"),
                        help="mc serves a Visual7W 2-class checkpoint; "
                             "POST /answer_mc with per-request candidates")
    parser.add_argument("--feature_split", type=str, default=None,
                        help="serve POST /answer_by_id from a server-"
                             "resident feature store: the split "
                             "({split}.hdf5 + {split}_imgid2idx.pkl under "
                             "--dataroot) whose images requests may "
                             "reference by id — requests then carry ids + "
                             "tokens only, no feature payload")
    parser.add_argument("--feature_placement", type=str, default="device",
                        choices=("device", "host"),
                        help="device: the whole store lives in HBM (int8 "
                             "rows + dequant scales by default) and the "
                             "jitted predict gathers on device — zero "
                             "per-request feature transfer; host: gather "
                             "in host RAM, features still cross "
                             "host->device per request (low-HBM fallback)")
    parser.add_argument("--feature_f32", action="store_true", default=False,
                        help="keep device-placed features float32 (4x the "
                             "HBM of the int8 default; bit-exact with the "
                             "upload path)")
    parser.add_argument("--micro_batch", type=int, default=0,
                        help="coalesce concurrent requests into one "
                             "predict of up to this many rows (0 = off); "
                             "adds at most --micro_batch_wait_ms latency")
    parser.add_argument("--micro_batch_wait_ms", type=float, default=3.0,
                        help="max wait after the first queued request "
                             "before the coalesced predict dispatches")
    # --transfer_dtype comes from add_common_args (shared with train/test);
    # the store flags (--quantize_store/--stream_features) are inert here —
    # serving takes features per request, not from a resident store — but
    # the cross-flag validation stays consistent with the other CLIs
    args = parser.parse_args(argv)
    validate_args(args)

    session, dictionary = build_session(args)
    if args.feature_split:
        from vqatpu.serve import ResidentFeatures

        rf = ResidentFeatures.from_dataroot(
            args.dataroot, args.feature_split, max_boxes=args.max_boxes,
            quantize=args.quantize_store)
        session.attach_features(rf, placement=args.feature_placement,
                                quantize=not args.feature_f32)
        print(f"by-id serving: {args.feature_split} features "
              f"({len(rf.img_id2idx)} images) resident on "
              f"{args.feature_placement}")
    if args.micro_batch > 0:
        from vqatpu.serve import MicroBatcher

        session = MicroBatcher(session, max_batch=args.micro_batch,
                               max_wait_ms=args.micro_batch_wait_ms)
    server = make_server(session, dictionary, args.model, args.port,
                         args.host, task=args.task)
    print(f"serving {args.model} on http://{args.host}:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
