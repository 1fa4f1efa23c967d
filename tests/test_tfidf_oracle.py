"""Live-oracle parity for tf-idf GloVe extension.

Runs the reference's own ``src/dataset.py:tfidf_from_questions`` (torch
sparse) against ``vqatpu.data.tfidf`` on the same question fixture and
dictionary, comparing the coalesced stochastic matrix entry-by-entry and
the extended-vocab GloVe weight rows.

Corpus constraint: every token has document frequency exactly 1.  The
reference's tf-idf weighting divides ``vals[col]`` (a token id used as a
*position* index, ``dataset.py:165-167``) instead of ``vals[idx]`` — vqatpu
deliberately fixes that (upstream bottom-up-attention-vqa semantics,
documented in PARITY.md).  With all df == 1 every division is by 1 and the
two semantics coincide, so the rest of the pipeline (co-occurrence
population, dictionary extension, row normalization, coalescing, GloVe row
lookup) is oracle-checkable exactly.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

from vqatpu.data import Dictionary
from vqatpu.data.tfidf import tfidf_from_questions

REF = "/root/reference"

# two questions with fully disjoint words, none repeated => df == 1 for all
Q1 = "what color is cat?"
Q2 = "where did dog go fast?"
BASE_WORDS = "what color is cat where did dog"  # 'go'/'fast' extend the dict


@pytest.fixture(scope="module")
def ref_dataset():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "torch._six" not in sys.modules:  # torch-1.1 era shim (utils.py:18)
        six = types.ModuleType("torch._six")
        six.string_classes = (str, bytes)
        six.int_classes = (int,)
        six.inf = float("inf")
        sys.modules["torch._six"] = six
    import src.dataset as ref_dataset
    return ref_dataset


def _fixture_root(tmp_path):
    root = str(tmp_path)
    with open(os.path.join(root,
                           "v2_OpenEnded_mscoco_train2014_questions.json"),
              "w") as f:
        json.dump({"questions": [{"question": Q1}, {"question": Q2}]}, f)
    os.makedirs(os.path.join(root, "glove"), exist_ok=True)
    rng = np.random.RandomState(0)
    with open(os.path.join(root, "glove", "glove.6B.300d.txt"), "w") as f:
        for w in ("go", "fast", "unrelated"):
            vec = " ".join(f"{x:.6f}" for x in rng.randn(300))
            f.write(f"{w} {vec}\n")
    return root


def _base_dictionary():
    d = Dictionary()
    d.tokenize(BASE_WORDS, add_word=True)
    return d


def test_tfidf_matrix_and_weights_match_reference(ref_dataset, tmp_path):
    root = _fixture_root(tmp_path)

    d_ref = _base_dictionary()
    ref_tfidf, ref_weights = ref_dataset.tfidf_from_questions(
        ["train"], d_ref, dataroot=root, target=["vqa"])

    d_got = _base_dictionary()
    got_tfidf, got_weights = tfidf_from_questions(
        ["train"], d_got, dataroot=root, target=("vqa",))

    # both extend the dictionary identically
    assert d_got.idx2word == d_ref.idx2word

    dense_ref = np.zeros((len(d_ref), len(d_ref)), np.float64)
    idx = ref_tfidf._indices().numpy()
    val = ref_tfidf._values().numpy()
    dense_ref[idx[0], idx[1]] = val

    dense_got = np.zeros_like(dense_ref)
    dense_got[got_tfidf.row, got_tfidf.col] = got_tfidf.val

    np.testing.assert_allclose(dense_got, dense_ref, atol=1e-6)
    assert dense_got.sum() > 0  # non-trivial fixture

    np.testing.assert_allclose(np.asarray(got_weights),
                               np.asarray(ref_weights), atol=1e-6)
    assert np.abs(got_weights).sum() > 0  # glove rows actually looked up
