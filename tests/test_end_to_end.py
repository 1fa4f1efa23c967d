"""End-to-end slices on synthetic fixtures (SURVEY.md §7 step 2):
train -> eval -> checkpoint -> EvalAI export -> KD teacher loop -> MC."""

import json
import os
import pickle

import numpy as np
import pytest

import jax

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.data import BatchLoader, V7WDataset, VQAFeatureDataset
from vqatpu.data.synthetic import make_v7w_fixture, make_vqa_fixture
from vqatpu.eval import evaluate, export_results, get_logits, mean_per_type
from vqatpu.models import build_model
from vqatpu.train.loop import train


def small_cfg(ds, model, task="ffoe", **kw):
    return ModelConfig(
        ntoken=ds.dictionary.ntoken, v_dim=ds.v_dim,
        num_ans_candidates=ds.num_ans_candidates, model=model, task=task,
        num_hid=32, h_mm=16, rank=4, gamma=2, **kw)


@pytest.fixture(scope="module")
def vqa_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e_vqa"))
    d = make_vqa_fixture(root, n_train=40, n_val=16, n_images=10, v_dim=16)
    return root, d


def test_ffoe_ban_end_to_end(vqa_root, tmp_path):
    root, d = vqa_root
    train_ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12)
    val_ds = VQAFeatureDataset("val", d, dataroot=root, max_boxes=12)
    cfg = TrainConfig(epochs=2, batch_size=8, update_freq=1, saving_epoch=0)
    model = build_model(small_cfg(train_ds, "ban"))
    out = str(tmp_path / "saved_models")

    state = train(model, train_ds, val_ds, cfg, out, use_mesh=True)
    assert os.path.exists(os.path.join(out, "model_epoch1.ckpt"))
    assert os.path.exists(os.path.join(out, "model_epoch_best.ckpt"))
    assert os.path.exists(os.path.join(out, "log.txt"))

    score, bound = evaluate(model, state.params,
                            BatchLoader(val_ds, 8))
    assert 0.0 <= score <= bound <= 1.0

    # EvalAI export
    logits, qids = get_logits(model, state.params, BatchLoader(val_ds, 8))
    assert logits.shape == (16, val_ds.num_ans_candidates)
    paths = export_results(str(tmp_path / "results"), "val", "ban", "c", 32,
                           1, logits, qids, val_ds.label2ans)
    with open(paths["json"]) as f:
        results = json.load(f)
    assert len(results) == 16
    assert set(results[0]) == {"question_id", "answer"}
    assert all(r["answer"] in val_ds.label2ans for r in results)


def test_cti_teacher_logits_close_kd_loop(vqa_root, tmp_path):
    """CTI teacher dump -> BAN student with distillation consumes it
    (FFOE/test.py:184-187 <-> FFOE/dataset.py:265-268)."""
    root, d = vqa_root
    train_ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12)
    cti = build_model(small_cfg(train_ds, "cti"))
    params = cti.init(jax.random.PRNGKey(0))

    # teacher sweep over the TRAIN split; dump logits pkl into dataroot
    logits, qids = get_logits(cti, params, BatchLoader(train_ds, 8))
    from vqatpu.eval import make_json_with_logits
    dump = make_json_with_logits(logits, qids)
    with open(os.path.join(root, "train_teacher_logits.pkl"), "wb") as f:
        pickle.dump(dump, f)

    # student training with KD
    kd_ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12,
                              distillation=True)
    s = kd_ds.sample(0)
    assert s["t_logits"].shape == (kd_ds.num_ans_candidates,)
    ban = build_model(small_cfg(kd_ds, "ban"))
    cfg = TrainConfig(epochs=1, batch_size=8, update_freq=2, saving_epoch=0,
                      distillation=True, T=5.0, alpha=0.005)
    state = train(ban, kd_ds, None, cfg, str(tmp_path / "kd"), use_mesh=False)
    assert state.step > 0


def test_mc_cti_end_to_end(tmp_path):
    root = str(tmp_path / "v7w")
    d = make_v7w_fixture(root, n_train=24, n_val=8, n_images=8, v_dim=16)
    train_ds = V7WDataset("train", d, dataroot=root, max_boxes=12)
    val_ds = V7WDataset("val", d, dataroot=root, max_boxes=12)
    cfg = TrainConfig(epochs=1, batch_size=8, update_freq=1, saving_epoch=0)
    model = build_model(small_cfg(train_ds, "cti", task="mc"))
    state = train(model, train_ds, val_ds, cfg, str(tmp_path / "mc_out"),
                  task="mc", use_mesh=False)
    from vqatpu.eval import evaluate_mc
    acc, _ = evaluate_mc(model, state.params, BatchLoader(val_ds, 8))
    assert 0.0 <= acc <= 1.0


def test_tdiuc_metrics(tmp_path):
    gt_ann = [
        {"question_id": 1, "question_type": "color",
         "answers": [{"answer": "red"}]},
        {"question_id": 2, "question_type": "color",
         "answers": [{"answer": "blue"}]},
        {"question_id": 3, "question_type": "counting",
         "answers": [{"answer": "two"}]},
        {"question_id": 4, "question_type": "counting",
         "answers": [{"answer": "two"}]},
    ]
    answerkey = {"red": 0, "blue": 1, "two": 2}
    preds_path = str(tmp_path / "preds.json")
    with open(preds_path, "w") as f:
        json.dump([
            {"question_id": 1, "answer": "red"},
            {"question_id": 2, "answer": "red"},
            {"question_id": 3, "answer": "two"},
            {"question_id": 4, "answer": "two"},
        ], f)
    from vqatpu.eval import align_predictions
    preds = align_predictions(preds_path, gt_ann, answerkey)
    m = mean_per_type(preds, gt_ann, answerkey)
    assert m["types"]["color"] == 50.0
    assert m["types"]["counting"] == 100.0
    assert np.isclose(m["arithmetic_mpt"], 75.0)
    assert np.isclose(m["harmonic_mpt"], 2 / (1 / 50 + 1 / 100), atol=1e-6)
    assert np.isclose(m["overall"], 75.0)
    # per-answer normalization: color {red: 1/1, blue: 0/1} -> 50
    assert np.isclose(m["types_norm"]["color"], 50.0)


def test_embedding_distance_scorers(rng):
    from vqatpu.eval import compute_score_mc  # noqa: F401 (surface check)
    from vqatpu.eval.ffoe import compute_score_with_embedding
    from vqatpu.eval.mc import compute_score_with_emb

    # FFOE: nearest answer embedding picks the right label
    ans_emb = np.eye(4, dtype=np.float32)  # 4 answers, orthogonal
    pred = np.asarray([[0.9, 0.1, 0, 0], [0, 0, 0.1, 0.95]], np.float32)
    labels = np.zeros((2, 4), np.float32)
    labels[0, 0] = 0.6  # answer 0 has soft score .6
    labels[1, 3] = 1.0
    scores = compute_score_with_embedding(pred, labels, ans_emb)
    np.testing.assert_allclose(scores, [0.6, 1.0])

    # MC: nearest candidate embedding == ground truth embedding.
    # candidates get distinct coordinate SUMS (the reference's equality test
    # is sum-based, MC/trainer.py:310-312)
    mc = np.tile((np.eye(4, dtype=np.float32) * np.arange(1, 5))[None, :3],
                 (2, 1, 1))  # [2, 3, 4]
    gt = mc[:, 1]  # truth is candidate 1
    pred_emb = np.asarray([[0, 1.9, 0.1, 0], [0.9, 0.1, 0, 0]], np.float32)
    out = compute_score_with_emb(pred_emb, mc, gt)
    np.testing.assert_array_equal(out, [True, False])


def test_sharded_eval_matches_single_device(vqa_root):
    """In-loop eval sharded over the 8-device data mesh returns exactly the
    single-device score (VERDICT r1 weak #5)."""
    from vqatpu.parallel import make_mesh, replicate

    root, d = vqa_root
    val_ds = VQAFeatureDataset("val", d, dataroot=root, max_boxes=12)
    model = build_model(small_cfg(val_ds, "cti"))
    params = model.init(jax.random.PRNGKey(3))

    want = evaluate(model, params, BatchLoader(val_ds, 8))
    mesh = make_mesh()
    got = evaluate(model, replicate(params, mesh),
                   BatchLoader(val_ds, 8), mesh=mesh)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_log_format_parity(vqa_root, tmp_path):
    """log.txt lines match the reference formats exactly
    (FFOE/train.py:63-69, 103-106): warmup/decay lr lines, epoch timing,
    train_loss/norm/score, eval score with upper bound."""
    import re

    root, d = vqa_root
    train_ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12)
    val_ds = VQAFeatureDataset("val", d, dataroot=root, max_boxes=12)
    cfg = TrainConfig(epochs=2, batch_size=8, update_freq=1, saving_epoch=99,
                      warmup_factors=(0.5,), lr_decay_start=1,
                      lr_decay_step=2, lr_decay_end=3)
    model = build_model(small_cfg(train_ds, "ban"))
    out = str(tmp_path / "logfmt")
    train(model, train_ds, val_ds, cfg, out, use_mesh=False)

    with open(os.path.join(out, "log.txt")) as f:
        log = f.read().splitlines()

    patterns = [
        r"^gradual warmup lr: \d+\.\d{8}$",
        r"^decreased lr: \d+\.\d{8}$",
        r"^epoch \d+, time: \d+\.\d{2}$",
        r"^\ttrain_loss: \d+\.\d{2}, norm: \d+\.\d{4}, score: \d+\.\d{2}$",
        r"^\teval score: \d+\.\d{2} \(\d+\.\d{2}\)$",
    ]
    for pat in patterns:
        assert any(re.match(pat, line) for line in log), (pat, log)


def test_orbax_backend_in_train_loop(vqa_root, tmp_path):
    """--ckpt_backend orbax: the loop writes .orbax checkpoints and the eval
    CLIs' resolver reads them back (VERDICT r1 weak #7)."""
    from vqatpu.train.checkpoints import load_params_any

    root, d = vqa_root
    train_ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12)
    val_ds = VQAFeatureDataset("val", d, dataroot=root, max_boxes=12)
    cfg = TrainConfig(epochs=1, batch_size=8, update_freq=1, saving_epoch=0,
                      ckpt_backend="orbax")
    model = build_model(small_cfg(train_ds, "ban"))
    out = str(tmp_path / "orbax_loop")
    state = train(model, train_ds, val_ds, cfg, out, use_mesh=False)
    assert os.path.isdir(os.path.join(out, "model_epoch0.orbax"))
    assert os.path.isdir(os.path.join(out, "model_epoch_best.orbax"))

    params = load_params_any(out, 0, model)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
