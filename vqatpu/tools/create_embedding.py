"""Answer-string embedding tools.

- ``create_answer_glove``: GloVe matrices for the 3,129 answer strings,
  multi-size 50/100/200/300 hstack (reference ``tools/create_embedding.py``;
  note its variant averages GloVe rows over the words of multi-word answers).
- ``create_answer_embedding``: encode every answer through
  WordEmbedding + GRU -> ``answer_embedding.pkl [num_ans, num_hid]``
  (reference ``tools/create_answer_embedding.py``) — consumed by
  VisualGenomeFeatureDataset and embedding-distance scoring.
- ``create_bert_embedding``: 768-d per-vocab-word BERT embeddings
  (reference ``tools/create_bert_embedding.py``), gated on ``transformers``.
"""

from __future__ import annotations

import argparse
import os
import pickle
from typing import Dict, Sequence

import numpy as np


def glove_rows_with_fallback(strings: Sequence[str],
                             word2emb: Dict[str, np.ndarray],
                             emb_dim: int) -> np.ndarray:
    """GloVe row per string; multi-word strings sum their word rows
    (``create_embedding.py:30-42``)."""
    weights = np.zeros((len(strings), emb_dim), np.float32)
    for idx, s in enumerate(strings):
        if s in word2emb:
            weights[idx] = word2emb[s]
        else:
            for w in s.split(" "):
                if w in word2emb:
                    weights[idx] += word2emb[w]
    return weights


def create_answer_glove(dataroot: str, emb_dims=(50, 100, 200, 300)) -> str:
    from vqatpu.data.tfidf import create_glove_embedding_init

    with open(os.path.join(dataroot, "cache", "trainval_label2ans.pkl"), "rb") as f:
        label2ans = pickle.load(f)
    parts = []
    for emb_dim in emb_dims:
        glove_file = os.path.join(dataroot, "glove", f"glove.6B.{emb_dim}d.txt")
        _, word2emb = create_glove_embedding_init([], glove_file)
        parts.append(glove_rows_with_fallback(label2ans, word2emb, emb_dim))
    out = os.path.join(dataroot, f"glove6b_emb_{sum(emb_dims)}d.npy")
    np.save(out, np.hstack(parts))
    return out


def create_answer_embedding(dataroot: str, num_hid: int = 1024,
                            op: str = "c", seed: int = 0) -> str:
    """Encode all answers via WordEmbedding + GRU (eval mode, GloVe init)."""
    import jax
    import jax.numpy as jnp

    from vqatpu.data.dictionary import Dictionary
    from vqatpu.ops import QuestionEmbedding, WordEmbedding

    dictionary = Dictionary.load_from_file(os.path.join(dataroot, "dictionary.pkl"))
    with open(os.path.join(dataroot, "cache", "trainval_ans2label.pkl"), "rb") as f:
        ans2label = pickle.load(f)
    ans_list = list(ans2label)

    w_emb = WordEmbedding(dictionary.ntoken, 300, 0.0, op)
    ans_emb = QuestionEmbedding(w_emb.out_dim, num_hid)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    p_w = w_emb.init(k1)
    glove = np.load(os.path.join(dataroot, "glove6b_init_300d.npy"))
    p_w = w_emb.load_pretrained(p_w, glove)
    p_g = ans_emb.init(k2)

    # create_answer_embedding.py uses src/dataset.py's tokenizer ('.'-strip)
    tokens = np.asarray(
        [dictionary.tokenize_padded(a, 3, strip_period=True)
         for a in ans_list], np.int32)
    emb = w_emb.apply(p_w, jnp.asarray(tokens))
    enc = ans_emb.apply_last(p_g, emb)  # [num_ans, num_hid]

    out = os.path.join(dataroot, "answer_embedding.pkl")
    with open(out, "wb") as f:
        pickle.dump(np.asarray(enc), f)
    return out


def bert_embedding_matrix(idx2word, model, tokenizer) -> np.ndarray:
    """Per-word pooled-BERT embedding matrix
    (``tools/create_bert_embedding.py:7-14``): each vocab word is tokenized
    to wordpieces and its ``pooler_output`` becomes the row."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("torch unavailable for BERT embeddings") from e

    hidden = int(model.config.hidden_size)
    weights = np.zeros((len(idx2word), hidden), np.float32)
    with torch.no_grad():
        for idx, word in enumerate(idx2word):
            ids = tokenizer.convert_tokens_to_ids(tokenizer.tokenize(word))
            if not ids:
                continue
            out = model(torch.tensor([ids]))
            pooled = out[1] if isinstance(out, tuple) else out.pooler_output
            weights[idx] = pooled[0].numpy()
    return weights


def create_bert_embedding(dataroot: str,
                          model_name: str = "bert-base-uncased",
                          model=None, tokenizer=None) -> str:
    """Per-vocab-word BERT pooled embeddings; ``model``/``tokenizer`` may be
    injected (tests use a tiny random-init BertModel — no download)."""
    if model is None or tokenizer is None:  # pragma: no cover — needs egress
        try:
            from transformers import BertModel, BertTokenizer
        except ImportError as e:
            raise RuntimeError(
                "transformers unavailable for BERT embeddings") from e
        tokenizer = tokenizer or BertTokenizer.from_pretrained(model_name)
        model = model or BertModel.from_pretrained(model_name)

    from vqatpu.data.dictionary import Dictionary

    model.eval()
    d = Dictionary.load_from_file(os.path.join(dataroot, "dictionary.pkl"))
    weights = bert_embedding_matrix(d.idx2word, model, tokenizer)
    out_path = os.path.join(dataroot, "bert_embedding.npy")
    np.save(out_path, weights)
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataroot", default="data_vqa")
    parser.add_argument("--kind", choices=["glove", "gru", "bert"],
                        default="gru")
    parser.add_argument("--num_hid", type=int, default=1024)
    args = parser.parse_args(argv)
    if args.kind == "glove":
        print(create_answer_glove(args.dataroot))
    elif args.kind == "gru":
        print(create_answer_embedding(args.dataroot, args.num_hid))
    else:
        print(create_bert_embedding(args.dataroot))


if __name__ == "__main__":
    main()
