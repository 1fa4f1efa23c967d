"""Build the question vocabulary + GloVe init matrix
(reference ``tools/create_dictionary.py``).

Run: ``python -m vqatpu.tools.create_dictionary --dataroot data_vqa``.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from vqatpu.data.dictionary import Dictionary
from vqatpu.data.tfidf import create_glove_embedding_init

VQA_QUESTION_FILES = (
    "v2_OpenEnded_mscoco_train2014_questions.json",
    "v2_OpenEnded_mscoco_val2014_questions.json",
    "v2_OpenEnded_mscoco_test2015_questions.json",
    "v2_OpenEnded_mscoco_test-dev2015_questions.json",
)


def create_dictionary(dataroot: str, files=VQA_QUESTION_FILES) -> Dictionary:
    d = Dictionary()
    for path in files:
        full = os.path.join(dataroot, path)
        if not os.path.exists(full):
            continue
        with open(full) as f:
            for q in json.load(f)["questions"]:
                # the dictionary builder strips '.' (src/dataset.py:46)
                d.tokenize(q["question"], add_word=True, strip_period=True)
    return d


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataroot", default="data_vqa")
    parser.add_argument("--emb_dim", type=int, default=300)
    args = parser.parse_args(argv)

    d = create_dictionary(args.dataroot)
    d.dump_to_file(os.path.join(args.dataroot, "dictionary.pkl"))
    print(f"dictionary: {d.ntoken} words")

    glove_file = os.path.join(args.dataroot, "glove",
                              f"glove.6B.{args.emb_dim}d.txt")
    weights, _ = create_glove_embedding_init(d.idx2word, glove_file)
    out = os.path.join(args.dataroot, f"glove6b_init_{args.emb_dim}d.npy")
    np.save(out, weights)
    print(f"wrote {out} {weights.shape}")


if __name__ == "__main__":
    main()
