"""Mechanical verification of the README runbook (VERDICT r4 #6).

Extracts EVERY ``python -m vqatpu.*`` command from README.md's code blocks
and executes each one against synthetic fixture dataroots, appending
tiny-dim / fixture-path overrides AFTER the documented flags (argparse
last-wins) — so a renamed, removed, or mistyped flag in the docs fails
this smoke loudly, and a README command this script doesn't know how to
stage fails it too (both directions of drift).

A few GLUE steps provide artifacts the docs assume pre-exist (the released
teacher checkpoint, the TDIUC ground-truth annotations + answerkey, the
teacher-logits pkl the KD student consumes); glue uses the same CLI
surface and is labeled in the transcript.

Each command runs in a fresh subprocess with the platform pinned to CPU
(`jax.config.update` — the env var alone is overridden by the host
sitecustomize, CLAUDE.md) via runpy with the exact module + argv, inside a
temp workdir whose relative dir names match the docs (data_vqa,
data_TDIUC, data_v7w, saved_models/, results/).

Run: ``make runbook-smoke`` (or ``python scripts/runbook_smoke.py``).
~10-20 min on the 1-core CPU host (every stage is a fresh-process jit).
"""

from __future__ import annotations

import glob as globmod
import json
import os
import pickle
import shlex
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tiny dims shared by every train/test CLI run (same rule as the verify
# skill: train and test must agree or checkpoint shapes mismatch)
SMALL = ["--num_hid", "32", "--h_mm", "16", "--rank", "4",
         "--batch_size", "8", "--max_boxes", "12",
         "--print_interval", "1000", "--no_mesh",
         "--compilation_cache_dir", os.path.join(REPO, ".xla_cache")]
# FFOE checkpoints save from epoch 9 (reference saving_epoch policy), so
# train stages that must leave a checkpoint behind run 10 tiny epochs
EPOCHS10 = ["--epochs", "10"]
EPOCH9 = ["--epoch", "9"]


def extract_commands(readme: str):
    """``python -m vqatpu.*`` commands from fenced code blocks, backslash
    continuations joined, ``...`` placeholder tokens dropped."""
    cmds, in_block, cur = [], False, None
    for raw in open(readme):
        line = raw.rstrip("\n")
        if line.strip().startswith("```"):
            in_block, cur = not in_block, None
            continue
        if not in_block:
            continue
        if cur is not None:
            cur += " " + line.strip().rstrip("\\").strip()
            if not line.rstrip().endswith("\\"):
                cmds.append(cur)
                cur = None
            continue
        st = line.strip()
        if st.startswith("python -m vqatpu."):
            if line.rstrip().endswith("\\"):
                cur = st.rstrip("\\").strip()
            else:
                cmds.append(st)
    out = []
    for c in cmds:
        toks = [t for t in shlex.split(c, comments=True) if t != "..."]
        assert toks[:2] == ["python", "-m"], c
        out.append((toks[2], toks[3:]))  # (module, argv)
    return out


def run_cli(work: str, module: str, argv, tag: str, timeout: int = 900):
    """Execute ``python -m module argv`` with the platform pinned to CPU
    (runpy keeps module + argv verbatim, so argparse sees the documented
    command line)."""
    code = ("import jax, sys, runpy; "
            "jax.config.update('jax_platforms', 'cpu'); "
            f"sys.argv = [{module!r}] + {list(argv)!r}; "
            f"runpy.run_module({module!r}, run_name='__main__')")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [REPO, "/root/.axon_site", env.get("PYTHONPATH", "")] if p)
    t0 = time.time()
    try:
        proc = subprocess.run([sys.executable, "-c", code], cwd=work, env=env,
                              capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired as e:
        # the smoke's whole point is loud, attributable failure: label the
        # stage and show the child's partial output instead of a raw
        # traceback (TimeoutExpired carries what was captured so far)
        print(f"[{tag}] FAIL timeout>{timeout}s: "
              f"python -m {module} {' '.join(argv)}", flush=True)
        for stream in (e.stdout, e.stderr):
            if stream:
                text = (stream.decode(errors="replace")
                        if isinstance(stream, bytes) else stream)
                print(text[-3000:])
        raise SystemExit(f"runbook command timed out after {timeout}s: "
                         f"python -m {module} {' '.join(argv)}") from None
    status = "OK" if proc.returncode == 0 else f"FAIL rc={proc.returncode}"
    print(f"[{tag}] {status} ({time.time() - t0:.0f}s): "
          f"python -m {module} {' '.join(argv)}", flush=True)
    if proc.returncode != 0:
        print(proc.stdout[-3000:])
        print(proc.stderr[-3000:])
        raise SystemExit(f"runbook command failed: python -m {module} "
                         f"{' '.join(argv)}")
    return proc.stdout


def must_exist(work: str, relpath_glob: str):
    hits = globmod.glob(os.path.join(work, relpath_glob))
    assert hits, f"expected artifact missing: {relpath_glob}"
    return hits


# ---------------------------------------------------------------- fixtures


def build_raw_inputs(work: str):
    """Raw artifacts the offline tools consume (data_raw/): question +
    annotation JSONs, a bottom-up-attention TSV, a tiny GloVe file."""
    raw = os.path.join(work, "data_raw")
    os.makedirs(os.path.join(raw, "glove"), exist_ok=True)
    rng = np.random.RandomState(0)
    words = ["what", "color", "is", "the", "cat", "dog", "red", "blue"]
    for split in ("train", "val"):
        qs = [{"question_id": i, "image_id": 10 + i,
               "question": "What color is the cat?"} for i in range(6)]
        with open(os.path.join(
                raw, f"v2_OpenEnded_mscoco_{split}2014_questions.json"),
                "w") as f:
            json.dump({"questions": qs}, f)
        ann = [{"question_id": i, "image_id": 10 + i,
                "multiple_choice_answer": "red",
                "answers": [{"answer": "red"}] * 7 + [{"answer": "blue"}] * 3}
               for i in range(6)]
        with open(os.path.join(
                raw, f"v2_mscoco_{split}2014_annotations.json"), "w") as f:
            json.dump({"annotations": ann}, f)
    with open(os.path.join(raw, "glove", "glove.6B.300d.txt"), "w") as f:
        for w in words:
            vec = " ".join(f"{x:.4f}" for x in rng.randn(300) * 0.1)
            f.write(f"{w} {vec}\n")
    # bottom-up-attention TSV (2048-d features, the converter's default);
    # shared encoder with tests/test_tools.py (vqatpu.data.synthetic)
    from vqatpu.data.synthetic import write_bottomup_tsv

    write_bottomup_tsv(os.path.join(work, "trainval.tsv"),
                       [(10, 5), (11, 7)], v_dim=2048)


def build_tdiuc_eval_inputs(work: str):
    """GT annotations + answerkey for evaluate_tdiuc, derived from the
    TDIUC fixture (the real files ship with the TDIUC download)."""
    root = os.path.join(work, "data_TDIUC")
    with open(os.path.join(root, "cache", "trainval_label2ans.pkl"),
              "rb") as f:
        label2ans = pickle.load(f)
    with open(os.path.join(root, "TDIUC_val_questions.json")) as f:
        questions = json.load(f)["questions"]
    with open(os.path.join(root, "cache", "val_target.pkl"), "rb") as f:
        targets = {t["question_id"]: t for t in pickle.load(f)}
    ann = [{"question_id": q["question_id"],
            "question_type": q["question_type"],
            "answers": [{"answer":
                         label2ans[targets[q["question_id"]]["labels"][0]]}]}
           for q in questions]
    with open(os.path.join(root, "val_annotations.json"), "w") as f:
        json.dump({"annotations": ann}, f)
    with open(os.path.join(work, "sample_answerkey.csv"), "w") as f:
        for i, a in enumerate(label2ans):
            f.write(f"{a},{i}\n")


# ---------------------------------------------------------------- dispatch


def classify(module: str, argv) -> str:
    """Stage key for a README command (drift in the doc's command set shows
    up as an unknown key or a missing required stage)."""
    s = " ".join(argv)
    short = module.rsplit("vqatpu.", 1)[-1]
    if short.startswith("tools."):
        return short.split(".", 1)[1]
    if short == "cli.ffoe_train":
        return "ffoe_train_tdiuc" if "--use_TDIUC" in s else "ffoe_train_vqa"
    if short == "cli.ffoe_test":
        if "--logits" in s:
            return f"logits_dump_{argv[argv.index('--index') + 1]}"
        if "--use_TDIUC" in s:
            return "ffoe_test_tdiuc"
        return ("ffoe_test_cti" if "cti" in s else "ffoe_test_ban")
    if short == "cli.mc_train":
        return "mc_train"
    if short == "cli.mc_test":
        return "mc_test"
    if short == "cli.evaluate_tdiuc":
        return "evaluate_tdiuc"
    if short == "cli.ensemble":
        return "ensemble"
    raise SystemExit(f"README has a vqatpu command this smoke doesn't "
                     f"stage: python -m {module} {' '.join(argv)}")


REQUIRED_STAGES = {
    "create_dictionary", "compute_softscore", "feature_converter",
    "create_embedding", "ffoe_train_vqa", "ffoe_train_tdiuc", "mc_train",
    "ffoe_test_cti", "ffoe_test_ban", "ffoe_test_tdiuc", "mc_test",
    "evaluate_tdiuc", "ensemble", "logits_dump_0", "logits_dump_1",
}


def main():
    cmds = extract_commands(os.path.join(REPO, "README.md"))
    staged: dict = {}
    for module, argv in cmds:
        staged.setdefault(classify(module, argv), []).append((module, argv))
    missing = REQUIRED_STAGES - set(staged)
    assert not missing, f"README lost runbook commands: {sorted(missing)}"

    work = tempfile.mkdtemp(prefix="runbook_smoke_")
    print(f"workdir: {work} ({sum(map(len, staged.values()))} README "
          "commands staged)", flush=True)
    sys.path.insert(0, REPO)
    from vqatpu.data.synthetic import (make_tdiuc_fixture, make_v7w_fixture,
                                       make_vqa_fixture)

    make_vqa_fixture(os.path.join(work, "data_vqa"), n_train=24, n_val=16,
                     n_images=8, v_dim=16)
    make_tdiuc_fixture(os.path.join(work, "data_TDIUC"), n_train=16, n_val=8,
                       n_images=6, v_dim=16)
    make_v7w_fixture(os.path.join(work, "data_v7w"), n_train=16, n_val=8,
                     n_images=6, v_dim=16)
    build_raw_inputs(work)
    build_tdiuc_eval_inputs(work)

    executed: set = set()  # staged keys actually run (completeness check)

    def run_all(key, extra, tag=None, timeout=900):
        executed.add(key)
        for module, argv in staged[key]:
            run_cli(work, module, argv + extra, tag or key, timeout)

    # -- offline preprocessing (README "Data preparation") into data_raw
    run_all("create_dictionary", ["--dataroot", "data_raw"])
    must_exist(work, "data_raw/dictionary.pkl")
    must_exist(work, "data_raw/glove6b_init_300d.npy")
    run_all("compute_softscore", ["--dataroot", "data_raw",
                                  "--min_occurence", "1"])
    must_exist(work, "data_raw/cache/trainval_ans2label.pkl")
    must_exist(work, "data_raw/cache/train_target.pkl")
    run_all("feature_converter", ["--out", "data_raw"])
    must_exist(work, "data_raw/train.hdf5")
    run_all("create_embedding", ["--dataroot", "data_vqa",
                                 "--num_hid", "32"])
    must_exist(work, "data_vqa/answer_embedding.pkl")

    # -- GLUE: the CTI "released checkpoint" the runbook drops in (step 2)
    run_cli(work, "vqatpu.cli.ffoe_train",
            ["--model", "cti", "--dataroot", "data_vqa",
             "--output", "saved_models/VQA2.0/cti", *SMALL, *EPOCHS10],
            "GLUE cti-teacher-train")
    must_exist(work, "saved_models/VQA2.0/cti/model_epoch9.ckpt")

    # -- runbook 3a: VQA EvalAI JSON (fixture has train/val -> --split val)
    run_all("ffoe_test_cti",
            [*SMALL, "--dataroot", "data_vqa", "--split", "val", *EPOCH9,
             "--input", "saved_models/VQA2.0/cti", "--results",
             "results_vqa"])
    must_exist(work, "results_vqa/val_ctic32_epoch9.json")
    must_exist(work, "results_vqa/cti_val_logits.pkl")

    # -- GLUE: KD teacher pkls (train-split sweep; README: "CTI also dumps
    # results/cti_<split>_logits.pkl — the teacher logits the distillation
    # datasets consume")
    run_cli(work, "vqatpu.cli.ffoe_test",
            ["--model", "cti", *SMALL, "--dataroot", "data_vqa",
             "--split", "train", *EPOCH9, "--input", "saved_models/VQA2.0/cti",
             "--results", "results_vqa"], "GLUE cti-teacher-dump")
    shutil.copy(os.path.join(work, "results_vqa/cti_train_logits.pkl"),
                os.path.join(work, "data_vqa/train_teacher_logits.pkl"))
    shutil.copy(os.path.join(work, "results_vqa/cti_val_logits.pkl"),
                os.path.join(work, "data_vqa/val_teacher_logits.pkl"))

    # -- README "Training": BAN student + CTI distillation (the paper
    # config); 10 epochs so the ban test below finds a checkpoint
    run_all("ffoe_train_vqa",
            [*SMALL, *EPOCHS10, "--dataroot", "data_vqa",
             "--output", "saved_models/VQA2.0/ban"], timeout=1500)
    must_exist(work, "saved_models/VQA2.0/ban/log.txt")
    must_exist(work, "saved_models/VQA2.0/ban/model_epoch9.ckpt")

    # -- README "Testing / export": BAN EvalAI JSON
    run_all("ffoe_test_ban",
            [*SMALL, "--dataroot", "data_vqa", "--split", "val", *EPOCH9,
             "--input", "saved_models/VQA2.0/ban", "--results",
             "results_vqa"])
    must_exist(work, "results_vqa/val_banc32_epoch9.json")

    # -- TDIUC: GLUE teacher train + dump, then the README KD train
    run_cli(work, "vqatpu.cli.ffoe_train",
            ["--model", "cti", "--use_TDIUC", "--TDIUC_dir", "data_TDIUC",
             "--output", "saved_models/TDIUC/cti", *SMALL, *EPOCHS10],
            "GLUE tdiuc-teacher-train")
    run_cli(work, "vqatpu.cli.ffoe_test",
            ["--model", "cti", "--use_TDIUC", "--TDIUC_dir", "data_TDIUC",
             *SMALL, "--split", "train", *EPOCH9,
             "--input", "saved_models/TDIUC/cti", "--results",
             "results_tdiuc"], "GLUE tdiuc-teacher-dump")
    shutil.copy(os.path.join(work, "results_tdiuc/cti_train_logits.pkl"),
                os.path.join(work, "data_TDIUC/train_teacher_logits.pkl"))
    run_all("ffoe_train_tdiuc",
            [*SMALL, "--epochs", "1", "--dataroot", "data_vqa",
             "--output", "saved_models/TDIUC/ban"])
    must_exist(work, "saved_models/TDIUC/ban/log.txt")

    # -- runbook 3b: TDIUC predictions + MPT metrics
    run_all("ffoe_test_tdiuc",
            [*SMALL, "--split", "val", *EPOCH9,
             "--input", "saved_models/TDIUC/cti", "--results",
             "results_tdiuc"])
    must_exist(work, "results_tdiuc/val_ctic32_epoch9.json")
    executed.add("evaluate_tdiuc")
    for module, argv in staged["evaluate_tdiuc"]:
        out = run_cli(work, module,
                      argv + ["--gt_ann", "data_TDIUC/val_annotations.json",
                              "--pred_ann",
                              "results_tdiuc/val_ctic32_epoch9.json",
                              "--answerkey", "sample_answerkey.csv"],
                      "evaluate_tdiuc")
        assert "Arithmetic MPT Accuracy" in out, out[-500:]

    # -- runbook 3c: Visual7W MC (MC checkpoints save from epoch 0)
    run_all("mc_train", [*SMALL, "--epochs", "1", "--dataroot", "data_v7w",
                         "--output", "saved_models/V7W/cti"])
    must_exist(work, "saved_models/V7W/cti/model_epoch0.ckpt")
    out_acc = None
    executed.add("mc_test")
    for module, argv in staged["mc_test"]:
        out_acc = run_cli(work, module,
                          argv + [*SMALL, "--dataroot", "data_v7w",
                                  "--epoch", "0",
                                  "--input", "saved_models/V7W/cti"],
                          "mc_test")
    assert out_acc and "accuracy" in out_acc.lower(), out_acc[-500:]

    # -- README "Ensembling": two member dumps + the combiner
    for idx in ("0", "1"):
        run_all(f"logits_dump_{idx}",
                [*SMALL, "--dataroot", "data_vqa", "--split", "val", *EPOCH9,
                 "--input", "saved_models/VQA2.0/cti", "--results",
                 "results_vqa"])
    members = must_exist(work, "results_vqa/logits/*_sweep/logits*.npz")
    assert len(members) >= 2, members
    run_all("ensemble",
            ["--inputs", *sorted(members), "--dataroot", "data_vqa",
             "--split", "val", "--results", "results_vqa",
             "--name", "smoke_ensemble"])
    must_exist(work, "results_vqa/val_*smoke_ensemble*.json")

    # completeness, the other direction: every staged README command must
    # have been EXECUTED — a new doc command classify() happens to accept
    # (an unforeseen tools.* module, a third ensemble member index) would
    # otherwise be staged, skipped, and reported as OK
    skipped = set(staged) - executed
    assert not skipped, (
        f"README commands staged but never executed: {sorted(skipped)} — "
        "teach main() to run them (and add them to REQUIRED_STAGES)")

    shutil.rmtree(work, ignore_errors=True)
    print("RUNBOOK SMOKE OK — every README vqatpu command executed "
          "against the synthetic fixtures")


if __name__ == "__main__":
    main()
