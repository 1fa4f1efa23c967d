"""Live-oracle parity for the FFOE VQA dataset layer.

Constructs the reference's own ``src/FFOE/dataset.py:VQAFeatureDataset`` on
the same synthetic fixture vqatpu's datasets use (the fixture reproduces the
reference's on-disk layout exactly) and compares, per sample: entry order,
question/answer token ids, the adaptive pos_boxes feature slice, the
scattered soft-target vector, and teacher logits.

Deliberately NOT reproduced (documented in datasets.py:6-13) and therefore
invisible here by construction: the ``questions[:10000]`` debug truncation
(fixture < 10k) and the broken test2015 ``_create_entry`` call (train split
only).
"""

import sys
import types

import numpy as np
import pytest

from vqatpu.data import Dictionary, VQAFeatureDataset
from vqatpu.data.synthetic import make_vqa_fixture

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_ffoe_dataset():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "torch._six" not in sys.modules:  # torch-1.1 era shim (utils.py:18)
        six = types.ModuleType("torch._six")
        six.string_classes = (str, bytes)
        six.int_classes = (int,)
        six.inf = float("inf")
        sys.modules["torch._six"] = six
    import src.FFOE.dataset as ffoe_dataset
    return ffoe_dataset


def test_vqa_dataset_matches_reference(ref_ffoe_dataset, tmp_path):
    root = str(tmp_path / "data_vqa")
    make_vqa_fixture(root, n_train=48, n_val=16, n_images=10, v_dim=16,
                     with_teacher_logits=True)

    d_got = Dictionary.load_from_file(f"{root}/dictionary.pkl")
    got = VQAFeatureDataset("train", d_got, dataroot=root, max_boxes=12,
                            distillation=True)

    d_ref = ref_ffoe_dataset.Dictionary.load_from_file(
        f"{root}/dictionary.pkl")
    args = types.SimpleNamespace(distillation=True)
    ref = ref_ffoe_dataset.VQAFeatureDataset(
        "train", args, d_ref, dataroot=root, max_boxes=12, question_len=12,
        adaptive=True)

    assert len(got) == len(ref)
    assert got.num_ans_candidates == ref.num_ans_candidates
    assert got.v_dim == ref.v_dim and got.s_dim == ref.s_dim

    for i in range(len(got)):
        s = got.sample(i)
        (r_feats, r_spats, r_q, r_target, r_ans, r_qid,
         r_tlogit) = ref[i]
        assert int(s["qid"]) == int(r_qid)

        # reference returns the raw [n, dim] slice; vqatpu pads to
        # max_boxes with an explicit mask (the static-shape TPU decision)
        n = r_feats.shape[0]
        assert int(s["v_mask"].sum()) == n
        np.testing.assert_array_equal(s["v"][:n], r_feats.numpy())
        np.testing.assert_array_equal(s["b"][:n], r_spats.numpy())
        assert not s["v"][n:].any() and not s["b"][n:].any()

        np.testing.assert_array_equal(s["q"], r_q.numpy())
        np.testing.assert_array_equal(s["a"], r_ans.numpy())
        np.testing.assert_allclose(s["target"], r_target.numpy(), atol=1e-7)
        np.testing.assert_allclose(s["t_logits"],
                                   np.float32(np.asarray(r_tlogit)),
                                   atol=1e-7)


def test_v7w_dataset_matches_reference(ref_ffoe_dataset, tmp_path):
    """Same treatment for the MC layer: the reference's V7WDataset
    (``src/MC/dataset.py:128-268``) vs vqatpu on the shared fixture —
    entry order, MC candidate/gt tokens ('.'-stripping MC tokenizer),
    labels, and adaptive feature slices."""
    import src.MC.dataset as mc_dataset

    from vqatpu.data import V7WDataset
    from vqatpu.data.synthetic import make_v7w_fixture

    root = str(tmp_path / "data_v7w")
    make_v7w_fixture(root)

    d_got = Dictionary.load_from_file(f"{root}/dictionary.pkl")
    got = V7WDataset("train", d_got, dataroot=root, max_boxes=12,
                     question_len=12)

    d_ref = mc_dataset.Dictionary.load_from_file(f"{root}/dictionary.pkl")
    args = types.SimpleNamespace(use_feature="bottom-up")
    ref = mc_dataset.V7WDataset("train", args, d_ref, dataroot=root,
                                max_boxes=12, question_len=12, adaptive=True)

    assert len(got) == len(ref)
    assert got.v_dim == ref.v_dim and got.s_dim == ref.s_dim
    for i in range(len(got)):
        s = got.sample(i)
        r_feats, r_spats, r_q, r_label, r_mc, r_gt = ref[i]
        assert int(s["qid"]) == int(ref.entries[i]["question_id"])
        n = r_feats.shape[0]
        assert int(s["v_mask"].sum()) == n
        np.testing.assert_array_equal(s["v"][:n], r_feats.numpy())
        np.testing.assert_array_equal(s["b"][:n], r_spats.numpy())
        assert not s["v"][n:].any()
        np.testing.assert_array_equal(s["q"], r_q.numpy())
        np.testing.assert_array_equal(s["ans_mc"], np.asarray(r_mc))
        np.testing.assert_array_equal(s["ans_gt"], np.asarray(r_gt))
        np.testing.assert_allclose(s["label"], np.asarray(r_label, np.float32))


def test_tdiuc_reference_broken_as_committed(ref_ffoe_dataset, tmp_path):
    """As-committed reference bug (discovered by this oracle, r3): the
    TDIUC loader passes 4 of 5 args to ``_create_entry``
    (``FFOE/dataset.py:183`` vs the 5-param signature at ``:97``) — EVERY
    reference TDIUC run crashes at dataset construction, so the published
    87.0 TDIUC accuracy cannot come from this code state.  vqatpu builds
    complete TDIUC entries on the same fixture (documented divergence,
    ``vqatpu/data/datasets.py:7-13``)."""
    from vqatpu.data import TDIUCFeatureDataset
    from vqatpu.data.synthetic import make_tdiuc_fixture

    root = str(tmp_path / "data_TDIUC")
    make_tdiuc_fixture(root, n_train=16, n_val=8, n_images=6, v_dim=16)

    d_ref = ref_ffoe_dataset.Dictionary.load_from_file(
        f"{root}/dictionary.pkl")
    args = types.SimpleNamespace(distillation=False)
    with pytest.raises(TypeError, match="teacher_logit"):
        ref_ffoe_dataset.TDIUCFeatureDataset(
            "train", args, d_ref, dataroot=root, max_boxes=12,
            question_len=12, adaptive=True)

    d_got = Dictionary.load_from_file(f"{root}/dictionary.pkl")
    got = TDIUCFeatureDataset("train", d_got, dataroot=root, max_boxes=12)
    assert len(got) == 16
    s = got.sample(0)
    assert s["v"].shape == (12, got.v_dim) and s["target"].sum() > 0


def test_visualgenome_entries_match_reference(ref_ffoe_dataset, tmp_path):
    """VG augmentation entry building vs the reference's
    ``_load_visualgenome`` (``FFOE/dataset.py:189-249``): COCO-id mapping,
    answer normalization, vocab filtering, score-1.0 targets.  Two
    identical fixture copies so each side writes its own
    ``cache/vg_*_target.pkl`` (no cross-reading)."""
    import pickle

    from vqatpu.data.datasets import build_visualgenome_entries
    from vqatpu.data.synthetic import add_visualgenome_fixture

    roots = {}
    for sub in ("ref", "got"):
        root = str(tmp_path / sub / "data_vqa")
        make_vqa_fixture(root, n_train=48, n_val=16, n_images=10, v_dim=16)
        add_visualgenome_fixture(root)
        roots[sub] = root

    with open(f"{roots['ref']}/train_imgid2idx.pkl", "rb") as f:
        img_id2idx = pickle.load(f)
    with open(f"{roots['ref']}/cache/trainval_label2ans.pkl", "rb") as f:
        label2ans = pickle.load(f)
    with open(f"{roots['got']}/cache/trainval_ans2label.pkl", "rb") as f:
        ans2label = pickle.load(f)

    want = ref_ffoe_dataset._load_visualgenome(
        roots["ref"], "train", img_id2idx, label2ans, adaptive=True)
    got = build_visualgenome_entries(roots["got"], "train", img_id2idx,
                                     ans2label, adaptive=True)
    assert len(got) == len(want) > 0
    assert got == want


def test_create_dictionary_matches_reference(ref_ffoe_dataset, tmp_path):
    """Vocabulary building vs the reference's ``tools/create_dictionary.py``
    (same four VQA question files, same extension order, '.'-strip
    tokenizer).  The reference tool resolves ``from dataset import
    Dictionary`` only with ``src/`` itself on sys.path."""
    import importlib.util
    import json

    from vqatpu.tools.create_dictionary import create_dictionary

    if f"{REF}/src" not in sys.path:
        sys.path.insert(0, f"{REF}/src")
    spec = importlib.util.spec_from_file_location(
        "ref_create_dictionary", f"{REF}/tools/create_dictionary.py")
    ref_tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_tool)

    rng = np.random.RandomState(9)
    words = ["what", "color", "is", "the", "cat", "dog", "u.s.", "dr.",
             "it's", "3.5", "a", "an"]
    root = str(tmp_path)
    for name in ("train2014", "val2014", "test2015", "test-dev2015"):
        qs = [{"question": " ".join(rng.choice(words, size=5)) + "?"}
              for _ in range(12)]
        with open(f"{root}/v2_OpenEnded_mscoco_{name}_questions.json",
                  "w") as f:
            json.dump({"questions": qs}, f)

    want = ref_tool.create_dictionary(root)
    got = create_dictionary(root)
    assert got.idx2word == want.idx2word
    assert got.word2idx == want.word2idx
