"""tf-idf weighted GloVe embedding initialization for out-of-GloVe vocab.

Reference: ``/root/reference/src/dataset.py:100-189`` (the *live*
``tfidf_from_questions`` consumed by ``utils.tfidf_loading``,
``utils.py:377-409``).  Builds a sparse word-coocurrence stochastic matrix
from question text so rows for extended-vocab words become tf-idf mixes of
GloVe rows.

Documented divergence: the reference has an indexing typo
(``vals[col] /= df[col]`` at ``dataset.py:165``) where its upstream
(hengyuan-hu/ban-vqa) uses ``vals[idx] /= df[col]``; we implement the
intended upstream math.

No torch.sparse: duplicates are coalesced by summation in scipy-free COO
accumulation, and the mix is applied row-wise without materializing a dense
N x N matrix.
"""

from __future__ import annotations

import itertools
import json
import os
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

from vqatpu.data.dictionary import Dictionary


def _populate(inds, df, dictionary: Dictionary, text: str, N: int):
    tokens = dictionary.tokenize(text, add_word=True)
    for t in tokens:
        df[t] = df.get(t, 0) + 1
    for c0, c1 in itertools.combinations(tokens, 2):
        if c0 < N:
            inds[0].append(c0)
            inds[1].append(c1)
        if c1 < N:
            inds[0].append(c1)
            inds[1].append(c0)


def _iter_question_texts(names: Sequence[str], dataroot: str,
                         target: Sequence[str]):
    if "TDIUC" in target:
        for name in names:
            path = os.path.join(dataroot, f"TDIUC_{name}_questions.json")
            with open(path) as f:
                for q in json.load(f)["questions"]:
                    yield q["question"]
    if "vqa" in target:
        for name in names:
            suffix = name + "2014" if name[:4] != "test" else name
            path = os.path.join(
                dataroot, f"v2_OpenEnded_mscoco_{suffix}_questions.json")
            if not os.path.exists(path):
                continue
            with open(path) as f:
                for q in json.load(f)["questions"]:
                    yield q["question"]
    if "vg" in target:
        path = os.path.join(dataroot, "question_answers.json")
        with open(path) as f:
            for vg in json.load(f):
                for q in vg["qas"]:
                    yield q["question"]
    if "v7w" in target:
        for name in names:
            path = os.path.join(dataroot, f"v7w_{name}_questions.json")
            with open(path) as f:
                for q in json.load(f)["questions"]:
                    yield q["question"]
            stat_path = os.path.join(dataroot, f"v7w_{name}_stat_words.json")
            if os.path.exists(stat_path):
                with open(stat_path) as f:
                    for s in json.load(f).values():
                        yield " ".join(",".join(s).split(","))


class SparseRowStochastic:
    """Row-stochastic sparse matrix as {row: {col: val}} — applied row-wise."""

    def __init__(self, rows: Dict[int, Dict[int, float]], shape: Tuple[int, int]):
        self.rows = rows
        self.shape = shape

    def matmul_dense(self, dense: np.ndarray) -> np.ndarray:
        """[N, N'] @ [N', F] without densifying; only for rows present."""
        out = np.zeros((self.shape[0], dense.shape[1]), np.float32)
        for r, cols in self.rows.items():
            acc = out[r]
            for c, v in cols.items():
                if c < dense.shape[0]:
                    acc += v * dense[c]
        return out

    __matmul__ = matmul_dense


def tfidf_from_questions(names: Sequence[str], dictionary: Dictionary,
                         dataroot: str = "data_vqa",
                         target: Sequence[str] = ("vqa",),
                         glove_file: str = None
                         ) -> Tuple[SparseRowStochastic, np.ndarray]:
    """Returns (tfidf row-stochastic matrix, GloVe rows for extended vocab).

    Side effect (as in the reference): extends ``dictionary`` with every word
    seen in the target question files.
    """
    inds: List[List[int]] = [[], []]
    df: Dict[int, int] = {}
    N = len(dictionary)
    for text in _iter_question_texts(names, dataroot, target):
        _populate(inds, df, dictionary, text, N)

    # tf-idf values then row-stochastic normalization (coalescing duplicates)
    rows: Dict[int, Dict[int, float]] = defaultdict(lambda: defaultdict(float))
    for r, c in zip(inds[0], inds[1]):
        rows[r][c] += 1.0 / df[c]
    for r, cols in rows.items():
        z = sum(cols.values())
        for c in cols:
            cols[c] /= z
    tfidf = SparseRowStochastic(
        {r: dict(c) for r, c in rows.items()},
        (max(rows, default=0) + 1, len(dictionary)),
    )

    # GloVe rows for the words the question files appended to the dictionary
    if glove_file is None:
        glove_file = os.path.join(dataroot, "glove", "glove.6B.300d.txt")
    if os.path.exists(glove_file):
        weights, _ = create_glove_embedding_init(dictionary.idx2word[N:], glove_file)
    else:
        weights = np.zeros((len(dictionary) - N, 300), np.float32)
    return tfidf, weights


def create_glove_embedding_init(idx2word: Sequence[str], glove_file: str
                                ) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """GloVe txt -> [len(idx2word), emb_dim] matrix (``dataset.py:79-98``)."""
    word2emb: Dict[str, np.ndarray] = {}
    with open(glove_file, encoding="utf-8") as f:
        entries = f.readlines()
    emb_dim = len(entries[0].split(" ")) - 1
    weights = np.zeros((len(idx2word), emb_dim), np.float32)
    for entry in entries:
        vals = entry.split(" ")
        word2emb[vals[0]] = np.asarray(list(map(float, vals[1:])), np.float32)
    for idx, word in enumerate(idx2word):
        if word in word2emb:
            weights[idx] = word2emb[word]
    return weights, word2emb


def _read_embedding_cache(path: str):
    """Read ``embed_tfidf_weights.pkl`` in either format: our plain pickle
    {"emb", "emb_"}, or the reference's torch.save of the whole WordEmbedding
    module (``utils.py:398-401``) — drop-in dataroot compatibility.  Returns
    None when unreadable (caller recomputes)."""
    import pickle

    try:
        with open(path, "rb") as f:
            cached = pickle.load(f)
        if isinstance(cached, dict) and "emb" in cached:
            return cached
    except Exception:
        pass
    try:  # torch.save zipfile format holding the reference nn.Module.
        # The reference's module classes (src.language_model.WordEmbedding)
        # aren't importable here, so unresolvable classes unpickle into
        # permissive stubs; the tensors themselves reconstruct via torch's
        # own (importable) rebuild machinery.
        import pickle as _pickle
        import types

        import torch

        class _Stub:
            def __init__(self, *a, **k):
                pass

        class _Unpickler(_pickle.Unpickler):
            def find_class(self, mod, name):
                try:
                    return super().find_class(mod, name)
                except (ImportError, AttributeError):
                    return type(name, (_Stub,), {})

        pm = types.SimpleNamespace(__name__="vqatpu_stub_pickle",
                                   Unpickler=_Unpickler, load=_pickle.load)
        obj = torch.load(path, map_location="cpu", pickle_module=pm,
                         weights_only=False)

        def weight_of(o, name):
            sub = o.__dict__.get("_modules", {}).get(name)
            if sub is None:
                return None
            w = sub.__dict__.get("_parameters", {}).get("weight")
            return None if w is None else np.asarray(w.detach().numpy())

        emb = weight_of(obj, "emb")
        if emb is None:
            return None
        return {"emb": emb, "emb_": weight_of(obj, "emb_") if
                weight_of(obj, "emb_") is not None else emb}
    except Exception:
        return None


def tfidf_loading(model_we, params, dataroot: str, dictionary: Dictionary,
                  names: Sequence[str] = ("train", "val", "test2015"),
                  target: Sequence[str] = ("vqa",), cache: bool = True):
    """Full tf-idf loading path with the reference's pickle cache
    (``embed_tfidf_weights.pkl``, ``utils.py:383-402``); returns updated
    params with ``emb`` = GloVe and ``emb_`` = tf-idf-mixed rows."""
    import pickle

    cache_path = os.path.join(dataroot, "embed_tfidf_weights.pkl")
    if cache and os.path.isfile(cache_path):
        cached = _read_embedding_cache(cache_path)
        if cached is not None:
            return {**params, "emb": np.asarray(cached["emb"]),
                    "emb_": np.asarray(cached["emb_"])} if "emb_" in params else \
                   {**params, "emb": np.asarray(cached["emb"])}

    glove_npy = os.path.join(dataroot, "glove6b_init_300d.npy")
    weight_init = np.load(glove_npy)
    tfidf, weights = tfidf_from_questions(list(names), dictionary, dataroot,
                                          target)
    base = weight_init
    if weights.size > 0:
        base = np.concatenate([weight_init, weights], 0)
    mixed = tfidf.matmul_dense(base)
    new_params = model_we.load_pretrained(params, weight_init)
    if "emb_" in new_params:
        emb_ = np.asarray(new_params["emb_"]).copy()
        n = min(mixed.shape[0], model_we.ntoken)
        emb_[:n] = mixed[:n]
        new_params = dict(new_params, emb_=emb_)
    if cache:
        with open(cache_path, "wb") as f:
            pickle.dump({"emb": np.asarray(new_params["emb"]),
                         "emb_": np.asarray(new_params.get("emb_", new_params["emb"]))},
                        f)
    return new_params
