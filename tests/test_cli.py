"""CLI smoke tests on synthetic fixtures: the reference's command surface
(`--model`, `--use_TDIUC`, `--distillation`, splits, outputs) end to end."""

import json
import os

import pytest

from vqatpu.cli import evaluate_tdiuc, ffoe_test, ffoe_train, mc_test, mc_train
from vqatpu.data.synthetic import make_tdiuc_fixture, make_v7w_fixture, make_vqa_fixture

SMALL = [
    "--num_hid", "32", "--h_mm", "16", "--rank", "4",
    "--epochs", "1", "--batch_size", "8", "--max_boxes", "12",
    "--print_interval", "1000", "--no_mesh",
]


def test_ffoe_train_and_test_cli(tmp_path):
    root = str(tmp_path / "data_vqa")
    make_vqa_fixture(root, n_train=24, n_val=16, n_images=8, v_dim=16)
    out = str(tmp_path / "saved_models")
    ffoe_train.main([
        "--model", "cti", "--dataroot", root, "--output", out, *SMALL,
    ])
    # saving_epoch=9 > epochs => no epoch ckpt; rerun with more epochs is slow,
    # so verify the log exists and train() ran
    assert os.path.exists(os.path.join(out, "log.txt"))

    # run 10 epochs-worth? too slow; instead train with saving by reusing the
    # loop directly is covered in test_end_to_end. Here exercise test CLI via
    # a manually saved checkpoint.
    import jax
    from vqatpu.data import Dictionary, VQAFeatureDataset
    from vqatpu.cli.common import model_config_from_args
    from vqatpu.models import build_model
    from vqatpu.train.steps import make_train_state
    from vqatpu.train.checkpoints import save_checkpoint

    d = Dictionary.load_from_file(os.path.join(root, "dictionary.pkl"))
    ds = VQAFeatureDataset("val", d, dataroot=root, max_boxes=12)
    args = ffoe_test.parse_args([
        "--model", "cti", "--dataroot", root, *SMALL,
        "--split", "val", "--input", out, "--epoch", "0",
        "--results", str(tmp_path / "results"),
    ])
    model = build_model(model_config_from_args(args, ds))
    state = make_train_state(model, jax.random.PRNGKey(0))
    save_checkpoint(os.path.join(out, "model_epoch0.ckpt"), state, 0)

    ffoe_test.main([
        "--model", "cti", "--dataroot", root, *SMALL,
        "--split", "val", "--input", out, "--epoch", "0",
        "--results", str(tmp_path / "results"),
    ])
    json_path = os.path.join(str(tmp_path / "results"),
                             "val_ctic32_epoch0.json")
    assert os.path.exists(json_path)
    with open(json_path) as f:
        assert len(json.load(f)) == 16
    # CTI dumps teacher logits for the KD loop
    assert os.path.exists(os.path.join(str(tmp_path / "results"),
                                       "cti_val_logits.pkl"))


def test_tdiuc_train_cli(tmp_path):
    root = str(tmp_path / "data_TDIUC")
    make_tdiuc_fixture(root, n_train=16, n_val=8, n_images=6, v_dim=16)
    out = str(tmp_path / "out")
    ffoe_train.main([
        "--model", "ban", "--use_TDIUC", "--TDIUC_dir", root,
        "--output", out, *SMALL,
    ])
    assert os.path.exists(os.path.join(out, "log.txt"))


def test_mc_train_and_test_cli(tmp_path):
    root = str(tmp_path / "data_v7w")
    make_v7w_fixture(root, n_train=16, n_val=8, n_images=6, v_dim=16)
    out = str(tmp_path / "mc_out")
    mc_train.main([
        "--model", "cti", "--dataroot", root, "--output", out, *SMALL,
    ])
    # MC saving_epoch=0 => checkpoint written for epoch 0
    assert os.path.exists(os.path.join(out, "model_epoch0.ckpt"))
    mc_test.main([
        "--model", "cti", "--dataroot", root, *SMALL,
        "--split", "test", "--input", out, "--epoch", "0",
    ])


def test_evaluate_tdiuc_cli(tmp_path, capsys):
    gt = {"annotations": [
        {"question_id": 1, "question_type": "color",
         "answers": [{"answer": "red"}]},
        {"question_id": 2, "question_type": "color",
         "answers": [{"answer": "blue"}]},
    ]}
    gt_path = str(tmp_path / "gt.json")
    with open(gt_path, "w") as f:
        json.dump(gt, f)
    pred_path = str(tmp_path / "pred.json")
    with open(pred_path, "w") as f:
        json.dump([{"question_id": 1, "answer": "red"},
                   {"question_id": 2, "answer": "red"}], f)
    key_path = str(tmp_path / "key.csv")
    with open(key_path, "w") as f:
        f.write("red,0\nblue,1\n")
    evaluate_tdiuc.main(["--gt_ann", gt_path, "--pred_ann", pred_path,
                         "--answerkey", key_path])
    out = capsys.readouterr().out
    assert "Arithmetic MPT Accuracy is 50.00" in out


def test_ffoe_train_resume_cli(tmp_path):
    """--input resume (cli/ffoe_train.py:74-76): restores model+optimizer
    and continues at epoch+1, exactly like the reference (FFOE/main.py:
    121-128)."""
    import jax

    from vqatpu.cli.common import model_config_from_args
    from vqatpu.data import Dictionary, VQAFeatureDataset
    from vqatpu.models import build_model
    from vqatpu.train.checkpoints import save_checkpoint
    from vqatpu.train.steps import make_train_state

    root = str(tmp_path / "data_vqa")
    make_vqa_fixture(root, n_train=16, n_val=8, n_images=6, v_dim=16)
    out = str(tmp_path / "resume_out")
    os.makedirs(out)

    d = Dictionary.load_from_file(os.path.join(root, "dictionary.pkl"))
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12)
    args = ffoe_train.parse_args(
        ["--model", "cti", "--dataroot", root, *SMALL])
    model = build_model(model_config_from_args(args, ds))
    state = make_train_state(model, jax.random.PRNGKey(0),
                             tfidf_loaded=True)
    ckpt = os.path.join(out, "model_epoch0.ckpt")
    save_checkpoint(ckpt, state, epoch=0)

    ffoe_train.main([
        "--model", "cti", "--dataroot", root, "--output", out, *SMALL,
        "--input", ckpt, "--epochs", "2",
    ])
    log = open(os.path.join(out, "log.txt")).read()
    # resumed at epoch 1: exactly ONE epoch ran, and it was epoch 1
    assert "epoch 1," in log and "epoch 0," not in log


def test_ffoe_train_distillation_cli(tmp_path):
    """--distillation consumes {split}_teacher_logits.pkl through the full
    CLI (the KD-student path, FFOE/trainer.py:168-192)."""
    root = str(tmp_path / "data_vqa")
    make_vqa_fixture(root, n_train=16, n_val=8, n_images=6, v_dim=16,
                     with_teacher_logits=True)
    out = str(tmp_path / "kd_out")
    ffoe_train.main([
        "--model", "ban", "--dataroot", root, "--output", out, *SMALL,
        "--distillation", "--T", "2.0", "--alpha", "0.3",
    ])
    log = open(os.path.join(out, "log.txt")).read()
    assert "train_loss" in log


def test_ffoe_test_raw_logits_dump(tmp_path):
    """--logits writes the raw [N, num_ans] npz (reference's torch.save
    dump, FFOE/test.py:173-175)."""
    import jax
    import numpy as np

    from vqatpu.cli.common import model_config_from_args
    from vqatpu.data import Dictionary, VQAFeatureDataset
    from vqatpu.models import build_model
    from vqatpu.train.checkpoints import save_checkpoint
    from vqatpu.train.steps import make_train_state

    root = str(tmp_path / "data_vqa")
    make_vqa_fixture(root, n_train=16, n_val=8, n_images=6, v_dim=16)
    out = str(tmp_path / "m")
    os.makedirs(out)
    d = Dictionary.load_from_file(os.path.join(root, "dictionary.pkl"))
    ds = VQAFeatureDataset("val", d, dataroot=root, max_boxes=12)
    args = ffoe_test.parse_args(["--model", "ban", "--dataroot", root, *SMALL])
    model = build_model(model_config_from_args(args, ds))
    save_checkpoint(os.path.join(out, "model_epoch0.ckpt"),
                    make_train_state(model, jax.random.PRNGKey(0)), 0)
    res = str(tmp_path / "results")
    ffoe_test.main([
        "--model", "ban", "--dataroot", root, *SMALL, "--split", "val",
        "--input", out, "--epoch", "0", "--results", res,
        "--logits", "1",
    ])
    raw = np.load(os.path.join(res, "val_ban_logits.npz"))
    assert raw["logits"].shape == (8, ds.num_ans_candidates)
    assert raw["question_ids"].shape == (8,)

    # --label/--index route the dump into the reference's ensemble layout
    # (logits/<model><op><num_hid>_<label>/logits<index>, test.py:172-175)
    ffoe_test.main([
        "--model", "ban", "--dataroot", root, *SMALL, "--split", "val",
        "--input", out, "--epoch", "0", "--results", res,
        "--logits", "1", "--label", "ens", "--index", "1",
    ])
    member = np.load(os.path.join(res, "logits", "banc32_ens",
                                  "logits1.npz"))
    np.testing.assert_array_equal(member["logits"], raw["logits"])

    # re-dumping the same label/index (member paths carry no split
    # component, mirroring the reference) must refuse, not clobber
    with pytest.raises(SystemExit, match="refusing to overwrite"):
        ffoe_test.main([
            "--model", "ban", "--dataroot", root, *SMALL, "--split", "val",
            "--input", out, "--epoch", "0", "--results", res,
            "--logits", "1", "--label", "ens", "--index", "1",
        ])


def test_ffoe_test_device_features_cli(tmp_path):
    """ffoe_test --device_features sweeps from the HBM store: raw logits
    bit-equal to the wire sweep."""
    import jax
    import numpy as np

    from vqatpu.cli.common import model_config_from_args
    from vqatpu.data import Dictionary, VQAFeatureDataset
    from vqatpu.models import build_model
    from vqatpu.train.checkpoints import save_checkpoint
    from vqatpu.train.steps import make_train_state

    root = str(tmp_path / "data_vqa")
    make_vqa_fixture(root, n_train=16, n_val=8, n_images=6, v_dim=16)
    out = str(tmp_path / "m")
    os.makedirs(out)
    d = Dictionary.load_from_file(os.path.join(root, "dictionary.pkl"))
    ds = VQAFeatureDataset("val", d, dataroot=root, max_boxes=12)
    args = ffoe_test.parse_args(["--model", "ban", "--dataroot", root, *SMALL])
    model = build_model(model_config_from_args(args, ds))
    save_checkpoint(os.path.join(out, "model_epoch0.ckpt"),
                    make_train_state(model, jax.random.PRNGKey(0)), 0)
    base = ["--model", "ban", "--dataroot", root, *SMALL, "--split", "val",
            "--input", out, "--epoch", "0", "--logits", "1"]
    ffoe_test.main(base + ["--results", str(tmp_path / "r_wire")])
    ffoe_test.main(base + ["--results", str(tmp_path / "r_dev"),
                           "--device_features"])
    wire = np.load(str(tmp_path / "r_wire" / "val_ban_logits.npz"))
    dev = np.load(str(tmp_path / "r_dev" / "val_ban_logits.npz"))
    np.testing.assert_array_equal(wire["question_ids"], dev["question_ids"])
    np.testing.assert_array_equal(wire["logits"], dev["logits"])


def test_ffoe_train_use_both_vg_cli(tmp_path):
    """--use_both --use_vg trains on the train+val+VG concat (reference
    FFOE/main.py:130-140) — the headline test2015 configuration.  With
    use_both there is no held-out eval (eval_ds=None), so the log carries
    train lines only."""
    from vqatpu.data.synthetic import add_visualgenome_fixture

    root = str(tmp_path / "data_vqa")
    make_vqa_fixture(root, n_train=24, n_val=16, n_images=8, v_dim=16)
    add_visualgenome_fixture(root)
    out = str(tmp_path / "both_out")
    ffoe_train.main([
        "--model", "ban", "--dataroot", root, "--output", out, *SMALL,
        "--use_both", "--use_vg",
    ])
    log = open(os.path.join(out, "log.txt")).read()
    assert "train_loss" in log
    assert "eval score" not in log


def test_ensemble_cli(tmp_path):
    """vqatpu-ensemble averages member npz dumps (aligned by question_id)
    into an EvalAI JSON + optional teacher pkl — the combiner the reference's
    --ensemble/--label/--index workflow (FFOE/test.py:19,172-175) leaves to
    offline scripts."""
    import pickle

    import numpy as np

    from vqatpu.cli import ensemble

    rng = np.random.RandomState(0)
    qids = np.array([11, 7, 42, 3], dtype=np.int64)
    l2a = [f"ans{i}" for i in range(5)]
    root = str(tmp_path / "data_vqa")
    os.makedirs(os.path.join(root, "cache"))
    with open(os.path.join(root, "cache", "trainval_label2ans.pkl"),
              "wb") as f:
        pickle.dump(l2a, f)

    members = []
    logits = []
    for i in range(3):
        lg = rng.randn(4, 5).astype(np.float32)
        # member 1 dumps in a different sample order: alignment is by qid
        order = np.argsort(qids) if i == 1 else np.arange(4)
        p = str(tmp_path / f"member{i}.npz")
        np.savez(p, logits=lg[order], question_ids=qids[order])
        members.append(p)
        logits.append(lg)
    res = str(tmp_path / "results")
    ensemble.main(["--inputs", *members, "--dataroot", root,
                   "--split", "val", "--results", res, "--name", "tri",
                   "--teacher_pkl"])

    with open(os.path.join(res, "val_tri_3members.json")) as f:
        preds = json.load(f)
    mean = np.mean(logits, axis=0)
    order = np.argsort(qids, kind="stable")
    expect = {int(qids[i]): l2a[int(mean[i].argmax())] for i in range(4)}
    assert {p["question_id"]: p["answer"] for p in preds} == expect
    assert [p["question_id"] for p in preds] == [int(q) for q in qids[order]]

    with open(os.path.join(res, "tri_val_logits.pkl"), "rb") as f:
        teacher = pickle.load(f)
    np.testing.assert_allclose(teacher[42], mean[2].astype(np.float16))

    # mismatched question sets must raise, not silently misalign
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, logits=logits[0], question_ids=qids + 1)
    with pytest.raises(ValueError, match="question_ids differ"):
        ensemble.main(["--inputs", members[0], bad, "--dataroot", root,
                       "--results", res])

    # duplicate qids within one dump (e.g. concatenated dumps) must raise:
    # stable argsort would align the duplicates arbitrarily and average
    # misaligned rows silently
    dup = str(tmp_path / "dup.npz")
    np.savez(dup, logits=np.concatenate([logits[0], logits[0][:1]]),
             question_ids=np.concatenate([qids, qids[:1]]))
    with pytest.raises(ValueError, match="duplicate question_ids"):
        ensemble.main(["--inputs", dup, "--dataroot", root,
                       "--results", res])


def test_mc_train_resume_cli(tmp_path):
    """MC resume: saving_epoch=0 writes epoch-0 checkpoints the CLI can
    restore from (--input), continuing at epoch 1."""
    root = str(tmp_path / "data_v7w")
    make_v7w_fixture(root, n_train=16, n_val=8, n_images=6, v_dim=16)
    out = str(tmp_path / "mc_out")
    mc_train.main([
        "--model", "cti", "--dataroot", root, "--output", out, *SMALL,
    ])
    ckpt = os.path.join(out, "model_epoch0.ckpt")
    assert os.path.exists(ckpt)
    out2 = str(tmp_path / "mc_out2")
    mc_train.main([
        "--model", "cti", "--dataroot", root, "--output", out2, *SMALL,
        "--input", ckpt, "--epochs", "2",
    ])
    log = open(os.path.join(out2, "log.txt")).read()
    assert "epoch 1," in log and "epoch 0," not in log


def test_compilation_cache_flag(tmp_path):
    """--compilation_cache_dir populates a persistent XLA cache the next
    process reloads compiled binaries from (measured 293 s -> 9 s full-dim
    CTI cold start on TPU; here just the populate + config plumbing)."""
    import jax

    from vqatpu.cli.common import enable_compilation_cache

    cache = str(tmp_path / "xla_cache")
    prev = jax.config.jax_compilation_cache_dir
    prev_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_bytes = jax.config.jax_persistent_cache_min_entry_size_bytes
    # thresholds so the tiny CPU compile below qualifies for the cache
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    try:
        enable_compilation_cache(cache)
        assert jax.config.jax_compilation_cache_dir == cache

        @jax.jit
        def f(x):
            return (x * 3.0).sum()

        f(jax.numpy.arange(7.0)).block_until_ready()
        assert os.listdir(cache), "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          prev_bytes)

    # '' and None are explicit off switches
    enable_compilation_cache("")
    enable_compilation_cache(None)
    assert jax.config.jax_compilation_cache_dir == prev
