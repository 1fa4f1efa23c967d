"""Live-oracle parity for the TDIUC MPT metrics.

Runs the reference's own ``evaluate_TDIUC.mean_per_class``
(``/root/reference/src/evaluate_TDIUC.py:26-94`` — print-only, so stdout is
captured and parsed) against ``vqatpu.eval.tdiuc.mean_per_type`` on a
randomized prediction set that exercises every branch: multiple question
types, per-answer normalization, and ground-truth answers missing from the
answerkey (the ``notfound``/-1 path).  The r3 lesson behind this test:
hand-derived oracles shared a wrong assumption the live reference caught
(tests/test_reference_trajectory.py docstring) — prefer running the
reference itself.
"""

import importlib.util
import io
import re
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest

from vqatpu.eval.tdiuc import mean_per_type

REF_PATH = "/root/reference/src/evaluate_TDIUC.py"


@pytest.fixture(scope="module")
def ref_eval():
    pytest.importorskip("scipy")
    spec = importlib.util.spec_from_file_location("ref_evaluate_tdiuc",
                                                  REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _parse_reference_stdout(text):
    """-> (types, a_mpt, h_mpt, overall, types_norm, a_mpt_n, h_mpt_n)."""
    # "NOT USING ..." also contains the split token -> 3 chunks:
    # [preamble+"NOT ", plain-metrics, normalized-metrics]
    parts = text.split("USING PER-ANSWER NORMALIZATION")
    assert len(parts) == 3
    plain, norm = parts[1], parts[2]

    def grab(chunk):
        types = dict(re.findall(r"Accuracy for (\S+) is ([\d.]+)", chunk))
        mpts = re.findall(r"(Arithmetic|Harmonic) MPT Accuracy is ([\d.]+)",
                          chunk)
        overall = re.findall(r"^([\d.]+)$", chunk, flags=re.M)
        return ({k: float(v) for k, v in types.items()},
                float(dict(mpts)["Arithmetic"]), float(dict(mpts)["Harmonic"]),
                float(overall[-1]))

    t, a, h, o = grab(plain)
    tn, an, hn, on = grab(norm)
    assert o == on  # reference prints the same overall twice
    return t, a, h, o, tn, an, hn


def test_mpt_metrics_match_reference_oracle(ref_eval):
    rng = np.random.RandomState(11)
    answers = [f"ans{i}" for i in range(6)]
    answerkey = {a: i for i, a in enumerate(answers)}
    qtypes = ["color", "counting", "absurd", "position"]

    gt_ann = []
    for qid in range(240):
        ans = (answers[rng.randint(6)] if rng.rand() > 0.05
               else "NOT_IN_KEY")  # exercise the notfound/-1 branch
        gt_ann.append({"question_id": qid,
                       "question_type": qtypes[rng.randint(len(qtypes))],
                       "answers": [{"answer": ans}]})
    predictions = rng.randint(0, 6, size=len(gt_ann))

    buf = io.StringIO()
    with redirect_stdout(buf):
        ref_eval.mean_per_class(predictions, gt_ann,
                                {k: str(v) for k, v in answerkey.items()})
    t, a_mpt, h_mpt, overall, tn, a_n, h_n = _parse_reference_stdout(
        buf.getvalue())
    m = re.search(r"(\d+) of validation answers were not in the answerkey",
                  buf.getvalue())
    ref_notfound = int(m.group(1))

    got = mean_per_type([int(p) for p in predictions], gt_ann, answerkey)

    assert got["notfound"] == ref_notfound > 0
    # reference prints %.2f — compare at that precision
    for tp in qtypes:
        assert round(got["types"][tp], 2) == t[tp], tp
        assert round(got["types_norm"][tp], 2) == tn[tp], tp
    assert round(got["arithmetic_mpt"], 2) == a_mpt
    assert round(got["harmonic_mpt"], 2) == h_mpt
    assert round(got["overall"], 2) == overall
    assert round(got["arithmetic_mpt_norm"], 2) == a_n
    assert round(got["harmonic_mpt_norm"], 2) == h_n
