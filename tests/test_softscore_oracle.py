"""Live-oracle parity for VQA answer normalization + soft-score targets.

Imports the reference's ``tools/compute_softscore.py`` itself (not a
re-derivation) and asserts:

- the programmatically DERIVED contraction table (`vqa_normalize.py` builds
  it from the base-word lists instead of pasting the 120-entry dict,
  ``compute_softscore.py:18-63``) equals the reference's dict EXACTLY, plus
  the digit map / articles / punctuation list;
- ``preprocess_answer`` agrees on a battery of adversarial strings;
- the full filter -> ans2label -> compute_target pipeline produces
  identical pickles on synthetic annotations.  (vqatpu's
  ``preprocessed=True`` mode mirrors the reference's compute_target, which
  never normalizes the per-annotator answers — ``compute_softscore.py:
  184-218``; the default mode fixes that quirk and is NOT oracle-matched
  on un-normalized strings by design.)
"""

import importlib.util
import pickle
import sys
import types

import pytest

from vqatpu.tools import vqa_normalize
from vqatpu.tools.compute_softscore import (compute_target, create_ans2label,
                                            filter_answers)

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "torch._six" not in sys.modules:  # torch-1.1 era shim (utils.py:18)
        six = types.ModuleType("torch._six")
        six.string_classes = (str, bytes)
        six.int_classes = (int,)
        six.inf = float("inf")
        sys.modules["torch._six"] = six
    spec = importlib.util.spec_from_file_location(
        "ref_compute_softscore", f"{REF}/tools/compute_softscore.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_normalization_tables_match_reference(ref):
    assert vqa_normalize.CONTRACTIONS == ref.contractions
    assert vqa_normalize.DIGIT_MAP == ref.manual_map
    assert list(vqa_normalize.ARTICLES) == ref.articles
    assert vqa_normalize._PUNCT == ref.punct


def test_preprocess_answer_matches_reference(ref):
    battery = [
        "Yes", "NO!", "a cat", "the red one", "an apple.",
        "arent you", "isnt it", "youll see", "hed've gone",
        "one", "ten", "none", "3.5", "1,000", "10,000 feet",
        "semi-circle", "black/white", "what?!", "don't know",
        "left; right", "it's (probably) fine", "u.s.a.",
        "couldnt've", "maam", "y'all", "2:30 pm", "50%",
        "  spaced   out  ", "MixedCase Answer", "the the the",
    ]
    for s in battery:
        assert vqa_normalize.preprocess_answer(s) == ref.preprocess_answer(s), s


def test_softscore_pipeline_matches_reference(ref, tmp_path):
    # normalized-form answers so the reference's no-preprocess compute_target
    # and vqatpu's preprocessed=True mode see identical strings
    import numpy as np
    rng = np.random.RandomState(3)
    vocab = ["yes", "no", "2", "red", "cat", "frisbee"]
    annotations = []
    for qid in range(60):
        gt = vocab[rng.randint(len(vocab))]
        answers = [{"answer": vocab[rng.randint(len(vocab))]}
                   for _ in range(10)]
        annotations.append({"question_id": qid, "image_id": 1000 + qid,
                            "multiple_choice_answer": gt,
                            "answers": answers})

    occ_ref = ref.filter_answers(annotations, 3)
    occ = filter_answers(annotations, 3)
    assert set(occ) == set(occ_ref)
    assert {a: qs for a, qs in occ.items()} == {a: qs for a, qs
                                                in occ_ref.items()}

    a2l_ref = ref.create_ans2label(occ_ref, "ref", str(tmp_path / "ref"))
    a2l = create_ans2label(occ, "got", str(tmp_path / "got"))
    assert a2l == a2l_ref

    ref.compute_target(annotations, a2l_ref, "ref", str(tmp_path / "ref"))
    compute_target(annotations, a2l, "got", str(tmp_path / "got"),
                   preprocessed=True)
    with open(tmp_path / "ref" / "ref_target.pkl", "rb") as f:
        want = pickle.load(f)
    with open(tmp_path / "got" / "got_target.pkl", "rb") as f:
        got = pickle.load(f)
    assert got == want
