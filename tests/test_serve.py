"""Serving API: checkpoint -> bucketed batched inference -> answer strings."""

import numpy as np

import jax

from vqatpu.config import ModelConfig
from vqatpu.serve import InferenceSession
from vqatpu.models import build_model
from vqatpu.train.checkpoints import save_checkpoint
from vqatpu.train.steps import make_train_state

NTOKEN, V_DIM, NUM_ANS = 30, 16, 7
ANS = [f"ans{i}" for i in range(NUM_ANS)]


def make_session(tmp_path, model="cti"):
    cfg = ModelConfig(ntoken=NTOKEN, v_dim=V_DIM, num_ans_candidates=NUM_ANS,
                      model=model, num_hid=16, h_mm=8, rank=2, gamma=2)
    m = build_model(cfg)
    state = make_train_state(m, jax.random.PRNGKey(0))
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, state, epoch=0)
    return InferenceSession.from_checkpoint(
        path, cfg, ANS, batch_buckets=(2, 4, 8), max_boxes=10)


def reqs(rng, n, boxes=6):
    v = rng.randn(n, boxes, V_DIM).astype(np.float32)
    b = rng.rand(n, boxes, 6).astype(np.float32)
    q = rng.randint(0, NTOKEN + 1, (n, 12))
    a = rng.randint(0, NTOKEN + 1, (n, 3))
    return v, b, q, a


def test_answers_and_bucketing(tmp_path, rng):
    sess = make_session(tmp_path)
    v, b, q, a = reqs(rng, 3)
    answers = sess.answer(v, b, q, a)
    assert len(answers) == 3
    assert all(ans in ANS for ans in answers)
    # 3 requests -> bucket 4 compiled; only that bucket cached
    assert list(sess._predict_cache) == [4]
    # single request reuses a smaller bucket
    sess.answer(v[:1], b[:1], q[:1], a[:1])
    assert sorted(sess._predict_cache) == [2, 4]


def test_padding_invariance(tmp_path, rng):
    """Padded rows must not change the real rows' logits."""
    sess = make_session(tmp_path)
    v, b, q, a = reqs(rng, 4)
    full = sess.logits(v, b, q, a)
    partial = sess.logits(v[:3], b[:3], q[:3], a[:3])  # padded to bucket 4
    np.testing.assert_allclose(partial, full[:3], atol=1e-5)


def test_chunking_beyond_largest_bucket(tmp_path, rng):
    sess = make_session(tmp_path)
    v, b, q, a = reqs(rng, 19)  # > largest bucket 8 -> 3 chunks
    out = sess.logits(v, b, q, a)
    assert out.shape == (19, NUM_ANS)
    np.testing.assert_allclose(out[:4], sess.logits(v[:4], b[:4], q[:4], a[:4]),
                               atol=1e-5)


def test_answer_mc(tmp_path, rng):
    """MC serving: x4 candidate expansion + class-0 softmax pick matches a
    per-sample loop over session.logits (reference MC/train.py:14-19,
    74-83)."""
    cfg = ModelConfig(ntoken=NTOKEN, v_dim=V_DIM, num_ans_candidates=2,
                      task="mc", model="tan", num_hid=16, h_mm=8, rank=2,
                      gamma=2)
    m = build_model(cfg)
    state = make_train_state(m, jax.random.PRNGKey(0))
    path = str(tmp_path / "mc.ckpt")
    save_checkpoint(path, state, epoch=0)
    sess = InferenceSession.from_checkpoint(
        path, cfg, ["match", "nonmatch"], batch_buckets=(2, 4, 8),
        max_boxes=10)

    n, c = 3, 4
    v, b, q, _ = reqs(rng, n)
    ans_mc = rng.randint(0, NTOKEN + 1, (n, c, 6))
    scores = sess.mc_scores(v, b, q, ans_mc)
    assert scores.shape == (n, c)
    np.testing.assert_allclose(scores.sum(), scores.sum())  # finite
    # oracle: score each (sample, candidate) pair independently
    for i in range(n):
        lg = sess.logits(np.repeat(v[i:i + 1], c, 0),
                         np.repeat(b[i:i + 1], c, 0),
                         np.repeat(q[i:i + 1], c, 0), ans_mc[i])
        p0 = np.exp(lg[:, 0]) / np.exp(lg).sum(1)
        np.testing.assert_allclose(scores[i], p0, rtol=1e-5, atol=1e-6)

    cands = [[f"c{i}{j}" for j in range(c)] for i in range(n)]
    picked = sess.answer_mc(v, b, q, ans_mc, cands)
    assert picked == [cands[i][int(scores[i].argmax())] for i in range(n)]
    assert sess.answer_mc(v, b, q, ans_mc) == [int(s.argmax()) for s in scores]


def test_answer_by_embedding(tmp_path, rng):
    """Embedding-distance decoding: the nearest ans_emb row wins."""
    sess = make_session(tmp_path)
    v, b, q, a = reqs(rng, 2)
    logits = sess.logits(v, b, q, a)  # [2, NUM_ANS] used as "embeddings"
    # construct a table whose row k equals sample k's prediction -> sample k
    # must decode to answer k (distance exactly 0)
    ans_emb = rng.randn(NUM_ANS, logits.shape[1]).astype(np.float32) * 10
    ans_emb[3] = logits[0]
    ans_emb[5] = logits[1]
    out = sess.answer_by_embedding(v, b, q, ans_emb, a)
    assert out == [ANS[3], ANS[5]]


def test_transfer_dtype_halves_wire_precision_only(session_fixture_args=None):
    """float16 wire transfer: logits match the f32 session closely (the
    upcast happens on device; only the input copy narrows)."""
    import numpy as np
    import jax

    from vqatpu.config import ModelConfig
    from vqatpu.models import build_model
    from vqatpu.serve import InferenceSession
    from vqatpu.train.steps import make_train_state

    cfg = ModelConfig(ntoken=50, v_dim=16, num_ans_candidates=11, model="cti",
                      num_hid=16, h_mm=8, rank=2, gamma=2)
    model = build_model(cfg)
    params = make_train_state(model, jax.random.PRNGKey(0)).params
    rng = np.random.RandomState(0)
    v = rng.randn(3, 6, 16).astype(np.float32)
    q = rng.randint(0, 50, (3, 12))
    a = rng.randint(0, 50, (3, 3))
    s32 = InferenceSession(model, params, ["x"] * 11, batch_buckets=(4,),
                           max_boxes=6)
    s16 = InferenceSession(model, params, ["x"] * 11, batch_buckets=(4,),
                           max_boxes=6, transfer_dtype=np.float16)
    l32 = s32.logits(v, None, q, a)
    l16 = s16.logits(v, None, q, a)
    np.testing.assert_allclose(l16, l32, atol=5e-2)
    assert not np.array_equal(l16, l32)  # genuinely narrowed on the wire

    # bf16 forward (the BAN serving throughput knob): f32 logits out, close
    # to the f32 path, composes with the narrowed wire format
    sbf = InferenceSession(model, params, ["x"] * 11, batch_buckets=(4,),
                           max_boxes=6, transfer_dtype=np.float16,
                           compute_dtype="bfloat16")
    lbf = sbf.logits(v, None, q, a)
    assert lbf.dtype == np.float32
    np.testing.assert_allclose(lbf, l32, atol=2e-1, rtol=2e-1)
    assert not np.array_equal(lbf, l32)


def test_transfer_dtype_int8_wire(tmp_path, rng):
    """int8 wire (4x byte cut): per-box symmetric quantization on the host,
    dequantization inside the jitted predict; logits stay close to f32, and
    the b spatials ride f16.  Covers b=None (CTI serve without spatials)
    and the BAN+b path."""
    sess32 = make_session(tmp_path)
    sess8 = InferenceSession(sess32.model, sess32.params, ANS,
                             batch_buckets=(2, 4, 8), max_boxes=10,
                             transfer_dtype="int8")
    v, b, q, a = reqs(rng, 3)
    l32 = sess32.logits(v, b, q, a)
    l8 = sess8.logits(v, b, q, a)
    np.testing.assert_allclose(l8, l32, atol=5e-2, rtol=5e-2)
    assert not np.array_equal(l8, l32)  # genuinely quantized on the wire

    # without spatials (b=None)
    np.testing.assert_allclose(sess8.logits(v, None, q, a),
                               sess32.logits(v, None, q, a),
                               atol=5e-2, rtol=5e-2)


def test_micro_batcher_coalesces_and_matches(tmp_path, rng):
    """Concurrent single-row requests coalesce into few bucketed predicts
    and every caller gets the same logits as a direct session call."""
    import threading

    from vqatpu.serve import MicroBatcher

    sess = make_session(tmp_path)
    mb = MicroBatcher(sess, max_batch=8, max_wait_ms=100.0)
    try:
        v, b, q, a = reqs(rng, 8)
        want = sess.logits(v, b, q, a)
        got = [None] * 8
        start = threading.Barrier(8)

        def call(i):
            start.wait()
            got[i] = mb.logits(v[i:i + 1], b[i:i + 1], q[i:i + 1],
                               a[i:i + 1])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(8):
            np.testing.assert_allclose(got[i][0], want[i], atol=1e-5)
        assert mb.rows_served == 8
        # 8 simultaneous rows (barrier) must coalesce into FEW predicts —
        # strictly fewer than one per request, normally 1-2
        assert mb.batches_run <= 4, mb.batches_run
    finally:
        mb.close()


def test_micro_batcher_groups_and_errors(tmp_path, rng):
    """Incompatible requests (different question widths) run as separate
    groups, both correct; a malformed request's error reaches only its own
    caller."""
    import threading

    from vqatpu.serve import MicroBatcher

    sess = make_session(tmp_path)
    mb = MicroBatcher(sess, max_batch=8, max_wait_ms=100.0)
    try:
        v, b, q, a = reqs(rng, 4)
        q_short = q[2:4, :9]  # GRU scans any length -> a distinct group
        want_12 = sess.logits(v[:2], b[:2], q[:2], a[:2])
        want_9 = sess.logits(v[2:4], b[2:4], q_short, a[2:4])
        results = {}
        start = threading.Barrier(3)

        def wide():
            start.wait()
            results["w"] = mb.logits(v[:2], b[:2], q[:2], a[:2])

        def narrow():
            start.wait()
            results["n"] = mb.logits(v[2:4], b[2:4], q_short, a[2:4])

        def bad():
            start.wait()
            try:
                mb.logits(rng.randn(1, 6, V_DIM + 3).astype(np.float32),
                          b[:1], q[:1], a[:1])
                results["bad"] = "no error"
            except Exception as e:
                results["bad"] = type(e).__name__

        threads = [threading.Thread(target=f)
                   for f in (wide, narrow, bad)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        np.testing.assert_allclose(results["w"], want_12, atol=1e-5)
        np.testing.assert_allclose(results["n"], want_9, atol=1e-5)
        assert results["bad"] != "no error"
    finally:
        mb.close()


def _by_id_setup(tmp_path, placement, quantize, v_dim=V_DIM):
    """Session over the synthetic VQA fixture's val store + resident
    features attached; returns (sess, ids, fixture ResidentFeatures)."""
    from vqatpu.data.synthetic import make_vqa_fixture
    from vqatpu.serve import ResidentFeatures

    root = str(tmp_path / "data_vqa")
    make_vqa_fixture(root, n_train=8, n_val=8, n_images=6, v_dim=v_dim)
    sess = make_session(tmp_path)
    rf = ResidentFeatures.from_dataroot(root, "val", max_boxes=10)
    sess.attach_features(rf, placement=placement, quantize=quantize)
    ids = sorted(rf.img_id2idx)
    return sess, ids, rf


def test_logits_by_id_device_f32_matches_upload(tmp_path, rng):
    """Device-resident by-id serving (f32 tables): the jitted on-device
    gather + mask must reproduce the upload path's logits on the same
    gathered features — including adaptive per-image box counts padded by
    the sentinel row (r3 verdict item 6: serve-by-image-id)."""
    sess, ids, rf = _by_id_setup(tmp_path, "device", quantize=False)
    n = len(ids)
    q = rng.randint(0, NTOKEN + 1, (n, 12))
    a = rng.randint(0, NTOKEN + 1, (n, 3))
    got = sess.logits_by_id(ids, q, a)
    v, b = rf.gather(ids)
    want = sess.logits(v, b, q, a)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert sess.answer_by_id(ids, q, a) == [
        sess.label2ans[int(i)] for i in want.argmax(1)]


def test_logits_by_id_int8_close_and_host_exact(tmp_path, rng):
    """int8 device tables (the HBM-budget default) stay logit-close to f32;
    host placement routes through the upload path bit-exactly."""
    sess, ids, rf = _by_id_setup(tmp_path, "device", quantize=True)
    n = len(ids)
    q = rng.randint(0, NTOKEN + 1, (n, 12))
    a = rng.randint(0, NTOKEN + 1, (n, 3))
    got8 = sess.logits_by_id(ids, q, a)
    v, b = rf.gather(ids)
    want = sess.logits(v, b, q, a)
    # int8 per-box symmetric quantization: small logit delta (same class
    # of divergence as --transfer_dtype int8, measured ~2.6e-3 at full
    # scale in scripts/int8_logit_delta.py)
    assert np.max(np.abs(got8 - want)) < 0.1
    assert (got8.argmax(1) == want.argmax(1)).mean() > 0.8

    sess.attach_features(rf, placement="host")
    np.testing.assert_array_equal(sess.logits_by_id(ids, q, a), want)


def test_by_id_unknown_image_raises(tmp_path, rng):
    import pytest

    sess, ids, rf = _by_id_setup(tmp_path, "device", quantize=False)
    q = rng.randint(0, NTOKEN + 1, (1, 12))
    with pytest.raises(KeyError, match="unknown image_id"):
        sess.logits_by_id([999999], q)


def test_empty_and_oversized_requests(tmp_path, rng):
    """Degenerate request shapes: an EMPTY batch returns [0, num_ans]
    without dispatching, and boxes beyond max_boxes truncate on the direct
    path exactly like the MicroBatcher's pad_boxes does (the two entry
    points must agree)."""
    sess = make_session(tmp_path)  # max_boxes=10
    v, b, q, a = reqs(rng, 3)
    out = sess.logits(v[:0], b[:0], q[:0], a[:0])
    assert out.shape == (0, NUM_ANS) and out.dtype == np.float32

    extra_v = rng.randn(3, 8, V_DIM).astype(np.float32)
    extra_b = rng.rand(3, 8, 6).astype(np.float32)
    v_big = np.concatenate([v, extra_v], 1)  # 14 boxes > max_boxes=10
    b_big = np.concatenate([b, extra_b], 1)
    got = sess.logits(v_big, b_big, q, a)
    want = sess.logits(v_big[:, :10], b_big[:, :10], q, a)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_micro_batcher_survives_malformed_requests(tmp_path, rng):
    """A request that breaks GROUP ASSEMBLY itself (1-D q crashes
    _group_key before any predict) must fail only its own caller — the
    worker thread stays alive and keeps serving (a dead worker would park
    every later caller on done.wait() forever)."""
    import threading

    from vqatpu.serve import MicroBatcher

    sess = make_session(tmp_path)
    mb = MicroBatcher(sess, max_batch=8, max_wait_ms=20.0)
    try:
        v, b, q, a = reqs(rng, 2)
        done = threading.Event()
        slot: dict = {}
        # bypass mb.logits so a regression shows as a failed wait, not a
        # test hang: q[0] is 1-D — _group_key's q.shape[1] raises
        mb._q.put((v[:1], b[:1], q[0], a[:1], done, slot))
        assert done.wait(timeout=60), \
            "worker died without failing the malformed caller"
        assert "err" in slot
        assert mb._thread.is_alive()
        # the worker keeps serving valid traffic after the failure
        out = mb.logits(v, b, q, a)
        np.testing.assert_allclose(out, sess.logits(v, b, q, a), atol=1e-5)
    finally:
        mb.close()
