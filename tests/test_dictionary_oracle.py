"""Live-oracle parity for tokenization against ALL THREE reference
tokenizers.

The reference ships three ``Dictionary.tokenize`` variants that differ in
one rule: ``src/dataset.py:46`` (dictionary building / tfidf / answer
tools) and ``MC/dataset.py:49`` strip ``'.'``; the FFOE runtime tokenizer
(``FFOE/dataset.py:64``) does not.  vqatpu's single Dictionary exposes the
difference as ``strip_period``; this test drives each reference class on a
period-heavy battery and asserts vqatpu's matching mode produces identical
vocab extension and identical UNK-lookup ids.
"""

import sys
import types

import pytest

from vqatpu.data import Dictionary

REF = "/root/reference"

BATTERY = [
    "What's the U.S. flag?",
    "is it 3.5 or 4?",
    "dr. who's cat, isn't it?",
    "a.m. or p.m.?",
    "the dog's bone.",
    "no periods here at all",
    "trailing dots...",
    "1,000.5 meters?",
]


@pytest.fixture(scope="module")
def ref_dicts():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "torch._six" not in sys.modules:  # torch-1.1 era shim (utils.py:18)
        six = types.ModuleType("torch._six")
        six.string_classes = (str, bytes)
        six.int_classes = (int,)
        six.inf = float("inf")
        sys.modules["torch._six"] = six
    import src.dataset as shared
    import src.FFOE.dataset as ffoe
    import src.MC.dataset as mc
    return {"shared": shared.Dictionary, "ffoe": ffoe.Dictionary,
            "mc": mc.Dictionary}


@pytest.mark.parametrize("variant,strip", [
    ("shared", True), ("mc", True), ("ffoe", False)])
def test_tokenize_matches_reference_variant(ref_dicts, variant, strip):
    ref_d = ref_dicts[variant]()
    got_d = Dictionary()

    # vocab building: identical extension order and ids
    for s in BATTERY:
        assert (got_d.tokenize(s, add_word=True, strip_period=strip)
                == ref_d.tokenize(s, True)), (variant, s)
    assert got_d.idx2word == ref_d.idx2word
    assert got_d.word2idx == ref_d.word2idx

    # lookup mode: same ids, same UNK (= padding_idx - 1) for unseen words
    for s in BATTERY + ["entirely unseen words zz.z"]:
        assert (got_d.tokenize(s, strip_period=strip)
                == ref_d.tokenize(s, False)), (variant, s)
