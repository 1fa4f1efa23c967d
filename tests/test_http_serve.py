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


def test_logits_endpoint(server, rng):
    payload = {
        "features": rng.randn(2, 6, V_DIM).astype(np.float32).tolist(),
        "question_tokens": rng.randint(0, 30, (2, 12)).tolist(),
        "answer_tokens": rng.randint(0, 30, (2, 3)).tolist(),
    }
    out = _post("/logits", payload)
    logits = np.asarray(out["logits"])
    assert logits.shape == (2, NUM_ANS)


def test_malformed_request_is_400_and_server_survives(server, rng):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post("/answer", {"features": "not an array"})
    assert exc.value.code == 400
    # server still healthy afterwards
    test_healthz(server)
