"""Ensemble combiner CLI: average raw-logit dumps -> EvalAI JSON.

The reference's ensemble workflow dumps per-member raw logits
(``FFOE/test.py:172-175``, driven by ``--label``/``--index``) and parses an
``--ensemble`` flag (``:19``) without shipping a combiner — members are
averaged offline.  This CLI is that missing step over vqatpu's npz dumps::

    vqatpu-ffoe-test --logits --label sweep --index 0 ...   # member 0
    vqatpu-ffoe-test --logits --label sweep --index 1 ...   # member 1
    vqatpu-ensemble --inputs results/logits/ctic1024_sweep/logits*.npz \\
        --dataroot data_vqa --split test2015

Optionally re-dumps the averaged logits as a CTI teacher pkl so an
ensembled teacher can drive the BAN/SAN distillation loop
(``--teacher_pkl``; format of ``VQAFeatureDataset(distillation=True)``).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

from vqatpu.eval import ensemble_logits, make_json, make_json_with_logits


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--inputs", nargs="+", required=True,
                        help="raw-logit npz dumps (ffoe_test --logits)")
    parser.add_argument("--dataroot", type=str, default="data_vqa",
                        help="dataroot holding cache/trainval_label2ans.pkl")
    parser.add_argument("--split", type=str, default="test2015")
    parser.add_argument("--results", type=str, default="results")
    parser.add_argument("--name", type=str, default="ensemble",
                        help="tag for the output JSON filename")
    parser.add_argument("--teacher_pkl", action="store_true", default=False,
                        help="also dump {qid: float16 logits} teacher pkl "
                             "from the averaged logits (KD-loop input)")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    logits, qids = ensemble_logits(args.inputs)
    with open(os.path.join(args.dataroot, "cache",
                           "trainval_label2ans.pkl"), "rb") as f:
        label2ans = pickle.load(f)
    os.makedirs(args.results, exist_ok=True)
    out = os.path.join(
        args.results,
        f"{args.split}_{args.name}_{len(args.inputs)}members.json")
    with open(out, "w") as f:
        json.dump(make_json(logits, qids, label2ans), f)
    print(f"wrote ensemble json: {out}")
    if args.teacher_pkl:
        pkl = os.path.join(args.results,
                           f"{args.name}_{args.split}_logits.pkl")
        with open(pkl, "wb") as f:
            pickle.dump(make_json_with_logits(logits, qids), f)
        print(f"wrote teacher logits: {pkl}")


if __name__ == "__main__":
    main()
