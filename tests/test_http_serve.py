"""HTTP serving front end: health, /answer, /logits, malformed requests."""

import json
import urllib.request
import urllib.error

import numpy as np
import pytest

import jax

from vqatpu.cli.serve import serve_in_thread
from vqatpu.data.dictionary import Dictionary
from tests.test_serve import ANS, NUM_ANS, V_DIM, make_session

PORT = 8937


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    sess = make_session(tmp_path_factory.mktemp("http_ck"))
    d = Dictionary()
    d.tokenize("what color is the cat dog red blue", add_word=True)
    srv = serve_in_thread(sess, d, "cti", PORT)
    yield srv
    srv.shutdown()


def _post(path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{PORT}/healthz",
                                timeout=10) as r:
        out = json.loads(r.read())
    assert out == {"status": "ok", "model": "cti"}


def test_answer_mc_rejected_on_ffoe_server(server, rng):
    """/answer_mc against an FFOE session must 400, not compute a
    meaningless class-0 softmax over the answer vocabulary (r3 ADVICE)."""
    payload = {
        "features": rng.randn(1, 6, V_DIM).astype(np.float32).tolist(),
        "question_tokens": rng.randint(0, 30, (1, 12)).tolist(),
        "mc_answers": [["red", "blue", "green", "dog"]],
    }
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post("/answer_mc", payload)
    assert ei.value.code == 400
    assert "--task mc" in json.loads(ei.value.read())["error"]


def test_answer_endpoint(server, rng):
    n = 3
    payload = {
        "features": rng.randn(n, 6, V_DIM).astype(np.float32).tolist(),
        "question_tokens": rng.randint(0, 30, (n, 12)).tolist(),
        "answer_tokens": rng.randint(0, 30, (n, 3)).tolist(),
    }
    out = _post("/answer", payload)
    assert len(out["answers"]) == n
    assert all(a in ANS for a in out["answers"])
    assert out["latency_ms"] > 0

    # raw question strings are tokenized server-side
    payload2 = dict(payload)
    del payload2["question_tokens"]
    payload2["questions"] = ["what color is the cat?"] * n
    out2 = _post("/answer", payload2)
    assert len(out2["answers"]) == n


def test_answer_mc_endpoint(tmp_path_factory, rng):
    """POST /answer_mc: per-request MC candidates (strings tokenized
    server-side, or pre-tokenized mc_tokens) -> scores + picked answers."""
    from vqatpu.config import ModelConfig
    from vqatpu.models import build_model
    from vqatpu.serve import InferenceSession
    from vqatpu.train.checkpoints import save_checkpoint
    from vqatpu.train.steps import make_train_state

    tmp = tmp_path_factory.mktemp("http_mc")
    cfg = ModelConfig(ntoken=30, v_dim=V_DIM, num_ans_candidates=2,
                      task="mc", model="tan", num_hid=16, h_mm=8, rank=2,
                      gamma=2)
    m = build_model(cfg)
    save_checkpoint(str(tmp / "mc.ckpt"),
                    make_train_state(m, jax.random.PRNGKey(0)), 0)
    sess = InferenceSession.from_checkpoint(
        str(tmp / "mc.ckpt"), cfg, ["match", "nonmatch"],
        batch_buckets=(2, 4, 8, 16), max_boxes=10)
    d = Dictionary()
    d.tokenize("what color is the cat dog red blue green", add_word=True)
    port = PORT + 4
    srv = serve_in_thread(sess, d, "tan", port, task="mc")
    try:
        n, c = 2, 4
        feats = rng.randn(n, 6, V_DIM).astype(np.float32).tolist()
        qs = rng.randint(0, 30, (n, 12)).tolist()
        cands = [["red", "blue", "green", "dog"],
                 ["cat", "dog", "red cat", "blue dog"]]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/answer_mc",
            data=json.dumps({"features": feats, "question_tokens": qs,
                             "mc_answers": cands}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert np.asarray(out["scores"]).shape == (n, c)
        assert out["answers"] == [cands[i][j]
                                  for i, j in enumerate(out["picks"])]

        # pre-tokenized candidates give the same scores
        mc_tokens = [[d.tokenize_padded(s, 6) for s in row] for row in cands]
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/answer_mc",
            data=json.dumps({"features": feats, "question_tokens": qs,
                             "mc_tokens": mc_tokens}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req2, timeout=60) as r:
            out2 = json.loads(r.read())
        np.testing.assert_allclose(out2["scores"], out["scores"], rtol=1e-5)
        assert "answers" not in out2  # no strings without mc_answers
    finally:
        srv.shutdown()


def test_logits_endpoint(server, rng):
    payload = {
        "features": rng.randn(2, 6, V_DIM).astype(np.float32).tolist(),
        "question_tokens": rng.randint(0, 30, (2, 12)).tolist(),
        "answer_tokens": rng.randint(0, 30, (2, 3)).tolist(),
    }
    out = _post("/logits", payload)
    logits = np.asarray(out["logits"])
    assert logits.shape == (2, NUM_ANS)


def test_npz_binary_wire(server, rng):
    """application/x-npz requests: /answer matches the JSON wire on the
    same inputs; /logits returns an npz body with the same logits."""
    import io

    n = 2
    feats = rng.randn(n, 6, V_DIM).astype(np.float32)
    qtok = rng.randint(0, 30, (n, 12))
    atok = rng.randint(0, 30, (n, 3))
    buf = io.BytesIO()
    np.savez(buf, features=feats, question_tokens=qtok, answer_tokens=atok)
    body = buf.getvalue()

    def post_npz(path):
        req = urllib.request.Request(
            f"http://127.0.0.1:{PORT}{path}", data=body,
            headers={"Content-Type": "application/x-npz"})
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.headers.get("Content-Type"), r.read()

    ctype, raw = post_npz("/answer")
    assert ctype == "application/json"
    want = _post("/answer", {"features": feats.tolist(),
                             "question_tokens": qtok.tolist(),
                             "answer_tokens": atok.tolist()})
    assert json.loads(raw)["answers"] == want["answers"]

    ctype, raw = post_npz("/logits")
    assert ctype == "application/x-npz"
    with np.load(io.BytesIO(raw)) as z:
        logits = z["logits"]
    want_logits = np.asarray(_post("/logits", {
        "features": feats.tolist(), "question_tokens": qtok.tolist(),
        "answer_tokens": atok.tolist()})["logits"])
    np.testing.assert_allclose(logits, want_logits, atol=1e-6)


def test_malformed_request_is_400_and_server_survives(server, rng):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post("/answer", {"features": "not an array"})
    assert exc.value.code == 400
    # server still healthy afterwards
    test_healthz(server)


def test_build_session_from_checkpoint_cli_path(tmp_path, rng):
    """The serve CLI's build_session: dataroot artifacts + checkpoint ->
    working InferenceSession (the main() path minus the socket loop)."""
    import argparse
    import os

    import jax

    from vqatpu.cli.common import model_config_from_args
    from vqatpu.cli.serve import build_session
    from vqatpu.data import VQAFeatureDataset
    from vqatpu.data.synthetic import make_vqa_fixture
    from vqatpu.models import build_model
    from vqatpu.train.checkpoints import save_checkpoint
    from vqatpu.train.steps import make_train_state

    root = str(tmp_path)
    d = make_vqa_fixture(os.path.join(root, "data_vqa"), n_train=8, n_val=4,
                         n_images=4, v_dim=16)
    ds = VQAFeatureDataset("val", d, dataroot=os.path.join(root, "data_vqa"),
                           max_boxes=12)
    ns = argparse.Namespace(
        model="cti", num_hid=32, op="c", gamma=2, activation="relu",
        dropout=0.5, use_counter=False, num_stacks=2, h_mm=16, h_out=1,
        rank=4, k=1, kernel_backend="xla", v_block_size=0, remat=False)
    cfg = model_config_from_args(ns, ds)
    m = build_model(cfg)
    st = make_train_state(m, jax.random.PRNGKey(0))
    save_checkpoint(os.path.join(root, "sm", "model_epoch0.ckpt"), st, 0)

    args = argparse.Namespace(
        dataroot=os.path.join(root, "data_vqa"), input=os.path.join(root, "sm"),
        epoch="0", v_dim=16, max_boxes=12, model="cti", num_hid=32, op="c",
        gamma=2, activation="relu", dropout=0.5, use_counter=False,
        num_stacks=2, h_mm=16, h_out=1, rank=4, k=1, kernel_backend="xla",
        v_block_size=0, remat=False)
    sess, dictionary = build_session(args)
    v = rng.randn(2, 8, 16).astype(np.float32)
    q = np.asarray([dictionary.tokenize_padded("what color is the cat?", 12)] * 2,
                   np.int32)
    a = rng.randint(0, 20, (2, 3)).astype(np.int32)
    answers = sess.answer(v, None, q, a)
    assert len(answers) == 2 and all(isinstance(x, str) for x in answers)

    # the fast-path CLI flags build a session with the narrowed wire format
    # and bf16 forward, and it answers identically-shaped output
    args.transfer_dtype = "float16"
    args.compute_dtype = "bfloat16"
    fast, _ = build_session(args)
    assert fast.transfer_dtype == np.float16
    assert fast.compute_dtype == "bfloat16"
    fast_answers = fast.answer(v, None, q, a)
    assert len(fast_answers) == 2


def test_serve_cli_parser_constructs():
    """Regression: serve.py once re-registered --transfer_dtype on top of
    add_common_args's copy -> argparse.ArgumentError on EVERY invocation
    (r3 code-review finding).  --help must reach argparse's normal exit."""
    import pytest

    from vqatpu.cli import serve

    with pytest.raises(SystemExit) as e:
        serve.main(["--help"])
    assert e.value.code == 0


def test_micro_batched_server_concurrent_posts(tmp_path_factory, rng):
    """--micro_batch path: concurrent HTTP posts through a MicroBatcher-
    wrapped session coalesce into few predicts and all answers are
    correct (equal to the unbatched session's)."""
    import threading

    from vqatpu.serve import MicroBatcher

    sess = make_session(tmp_path_factory.mktemp("http_mb"))
    mb = MicroBatcher(sess, max_batch=8, max_wait_ms=100.0)
    d = Dictionary()
    d.tokenize("what color is the cat dog red blue", add_word=True)
    port = PORT + 1
    srv = serve_in_thread(mb, d, "cti", port)
    try:
        n = 6
        feats = rng.randn(n, 6, V_DIM).astype(np.float32)
        qtok = rng.randint(0, 30, (n, 12))
        atok = rng.randint(0, 30, (n, 3))
        want = sess.answer(feats, None, qtok, atok)
        got = [None] * n
        barrier = threading.Barrier(n)

        def post(i):
            barrier.wait()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/answer",
                data=json.dumps({
                    "features": feats[i:i + 1].tolist(),
                    "question_tokens": qtok[i:i + 1].tolist(),
                    "answer_tokens": atok[i:i + 1].tolist(),
                }).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=60) as r:
                got[i] = json.loads(r.read())["answers"][0]

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert got == want
        assert mb.rows_served == n
        assert mb.batches_run <= 4, mb.batches_run  # coalesced, not 6x b1
    finally:
        srv.shutdown()
        mb.close()


def test_answer_by_id_endpoint(tmp_path_factory, rng):
    """POST /answer_by_id: features resident server-side (device placement,
    f32 tables) — the request carries only image ids + tokens, and answers
    match /answer with the same features uploaded (r3 verdict item 6)."""
    from vqatpu.data.synthetic import make_vqa_fixture
    from vqatpu.serve import ResidentFeatures
    from tests.test_serve import make_session

    tmp = tmp_path_factory.mktemp("http_byid")
    root = str(tmp / "data_vqa")
    make_vqa_fixture(root, n_train=8, n_val=8, n_images=6, v_dim=V_DIM)
    sess = make_session(tmp)
    rf = ResidentFeatures.from_dataroot(root, "val", max_boxes=10)
    sess.attach_features(rf, placement="device", quantize=False)
    d = Dictionary()
    d.tokenize("what color is the cat dog red blue", add_word=True)
    port = PORT + 7
    srv = serve_in_thread(sess, d, "cti", port)
    try:
        ids = sorted(rf.img_id2idx)[:3]
        q = rng.randint(0, 30, (3, 12)).tolist()
        a = rng.randint(0, 30, (3, 3)).tolist()

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        out = post("/answer_by_id", {"image_ids": ids, "question_tokens": q,
                                     "answer_tokens": a})
        v, b = rf.gather(ids)
        want = post("/answer", {"features": v.tolist(), "spatials": b.tolist(),
                                "question_tokens": q, "answer_tokens": a})
        assert out["answers"] == want["answers"]

        lg = post("/logits_by_id", {"image_ids": ids, "question_tokens": q,
                                    "answer_tokens": a})
        assert np.asarray(lg["logits"]).shape == (3, NUM_ANS)

        # unknown image id -> JSON error, server keeps serving
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/answer_by_id", {"image_ids": [424242],
                                   "question_tokens": q[:1]})
        assert ei.value.code == 400
        assert "unknown image_id" in json.loads(ei.value.read())["error"]
    finally:
        srv.shutdown()


def test_answer_by_id_rejected_without_store(server, rng):
    """Without --feature_split there is no resident store: 400, not a
    crash."""
    payload = {"image_ids": [1], "question_tokens": [[0] * 12]}
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post("/answer_by_id", payload)
    assert ei.value.code == 400
    assert "--feature_split" in json.loads(ei.value.read())["error"]
