"""Preprocessing tools: VQA answer normalization, soft scores, dictionary,
feature conversion, answer embeddings."""

import json
import os
import pickle

import numpy as np
import pytest

from vqatpu.tools.vqa_normalize import (
    CONTRACTIONS,
    get_score,
    preprocess_answer,
    process_digit_article,
    process_punctuation,
)


class TestNormalization:
    def test_contraction_table_spot_checks(self):
        # canonical entries from the official VQA eval table
        assert CONTRACTIONS["cant"] == "can't"
        assert CONTRACTIONS["couldnt've"] == "couldn't've"
        assert CONTRACTIONS["couldn'tve"] == "couldn't've"
        assert CONTRACTIONS["yall'd've"] == "y'all'd've"
        assert CONTRACTIONS["y'alld've"] == "y'all'd've"
        assert CONTRACTIONS["y'all'dve"] == "y'all'd've"
        assert CONTRACTIONS["oclock"] == "o'clock"
        assert CONTRACTIONS["twas"] == "'twas"
        assert CONTRACTIONS["'ows'at"] == "'ow's'at"
        # quirks
        assert CONTRACTIONS["let's"] == "let's"
        assert CONTRACTIONS["somebody'd"] == "somebodyd"
        assert "couldntve" not in CONTRACTIONS  # only drop-ONE variants
        assert len(CONTRACTIONS) == 120  # exact size of the published table

    def test_digit_and_article(self):
        assert process_digit_article("the two dogs") == "2 dogs"
        assert process_digit_article("A one") == "1"
        assert process_digit_article("none") == "0"
        assert process_digit_article("dont stop") == "don't stop"

    def test_punctuation(self):
        # attached punctuation becomes space; free-standing is removed
        assert process_punctuation("red/blue") == "red blue"
        assert process_punctuation("red / blue") == "red  blue"
        assert process_punctuation("1,000") == "1000"

    def test_preprocess_answer(self):
        assert preprocess_answer("The Cat!") == "cat"
        # '-' -> space, then the per-word digit map hits "two"
        assert preprocess_answer("twenty-two") == "twenty 2"
        assert preprocess_answer("ONE") == "1"

    def test_get_score(self):
        assert [get_score(i) for i in range(6)] == [0.0, 0.3, 0.6, 0.9, 1.0, 1.0]


def test_softscore_pipeline(tmp_path):
    from vqatpu.tools.compute_softscore import (
        compute_target,
        create_ans2label,
        filter_answers,
    )

    def entry(qid, gt, answers):
        return {
            "question_id": qid, "image_id": qid * 2,
            "multiple_choice_answer": gt,
            "answers": [{"answer": a} for a in answers],
        }

    dset = [entry(i, "cat", ["cat"] * 7 + ["dog"] * 3) for i in range(9)]
    dset += [entry(100 + i, "dog", ["dog"] * 10) for i in range(9)]
    dset += [entry(200, "rare bird", ["rare bird"] * 10)]  # below min occurrence

    occ = filter_answers(dset, min_occurence=9)
    assert set(occ) == {"cat", "dog"}
    cache = str(tmp_path / "cache")
    ans2label = create_ans2label(occ, "trainval", cache)
    assert os.path.exists(os.path.join(cache, "trainval_ans2label.pkl"))
    with open(os.path.join(cache, "trainval_label2ans.pkl"), "rb") as f:
        label2ans = pickle.load(f)
    assert [ans2label[a] for a in label2ans] == list(range(len(label2ans)))

    target = compute_target(dset[:1], ans2label, "train", cache)
    t = target[0]
    # 7x cat -> 1.0, 3x dog -> 0.9
    scores = dict(zip(t["labels"], t["scores"]))
    assert scores[ans2label["cat"]] == 1.0
    assert scores[ans2label["dog"]] == 0.9


def test_create_dictionary(tmp_path):
    from vqatpu.tools.create_dictionary import create_dictionary

    root = str(tmp_path)
    qs = {"questions": [{"question": "What color is the cat?"},
                        {"question": "Where's the dog?"}]}
    with open(os.path.join(root, "v2_OpenEnded_mscoco_train2014_questions.json"), "w") as f:
        json.dump(qs, f)
    d = create_dictionary(root)
    for w in ("what", "color", "is", "the", "cat", "where", "'s", "dog"):
        assert w in d.word2idx, w


def test_feature_converter_roundtrip(tmp_path):
    pytest.importorskip("h5py")
    from vqatpu.data.features import FeatureStore
    from vqatpu.tools.feature_converter import convert_adaptive, spatial_features

    from vqatpu.data.synthetic import write_bottomup_tsv

    tsv = str(tmp_path / "feat.tsv")
    write_bottomup_tsv(tsv, [(10, 12), (11, 15)], v_dim=8)

    import vqatpu.tools.feature_converter as fc
    old = fc.FEATURE_LENGTH
    fc.FEATURE_LENGTH = 8
    try:
        convert_adaptive("train", [tsv], str(tmp_path), feature_length=8)
    finally:
        fc.FEATURE_LENGTH = old

    store = FeatureStore.from_hdf5(str(tmp_path / "train.hdf5"), adaptive=True)
    assert store.features.shape == (27, 8)
    assert store.pos_boxes.tolist() == [[0, 12], [12, 27]]
    feats, spats, mask = store.get(1, max_boxes=20)
    assert mask.sum() == 15
    with open(str(tmp_path / "train_imgid2idx.pkl"), "rb") as f:
        assert pickle.load(f) == {10: 0, 11: 1}
    # spatial geometry: x1/w scaling
    boxes = np.array([[32.0, 48.0, 320.0, 240.0]], np.float32)
    s = spatial_features(boxes, 640, 480)
    np.testing.assert_allclose(s[0], [0.05, 0.1, 0.5, 0.5, 0.45, 0.4])


def test_create_answer_embedding(tmp_path):
    from vqatpu.data.synthetic import make_vqa_fixture
    from vqatpu.tools.create_embedding import create_answer_embedding

    root = str(tmp_path)
    make_vqa_fixture(root, n_train=4, n_val=2, n_images=2, v_dim=8)
    out = create_answer_embedding(root, num_hid=16)
    with open(out, "rb") as f:
        emb = pickle.load(f)
    assert emb.shape[1] == 16
    assert np.all(np.isfinite(emb))


def test_fixed_layout_feature_store(tmp_path, rng):
    """Fixed-36-style layout: [N, K, dim] arrays, no pos_boxes."""
    from vqatpu.data.features import FeatureStore

    feats = rng.randn(3, 5, 8).astype(np.float32)
    spats = rng.rand(3, 5, 6).astype(np.float32)
    store = FeatureStore(feats, spats, pos_boxes=None)
    assert not store.adaptive and store.v_dim == 8 and store.s_dim == 6
    v, b, mask = store.get(1, max_boxes=7)
    assert v.shape == (7, 8)
    np.testing.assert_array_equal(v[:5], feats[1])
    np.testing.assert_array_equal(v[5:], 0)
    assert mask.sum() == 5
    # truncation when max_boxes < K
    v2, _, m2 = store.get(2, max_boxes=3)
    np.testing.assert_array_equal(v2, feats[2][:3])
    assert m2.all()


def test_create_answer_glove(tmp_path):
    from vqatpu.tools.create_embedding import create_answer_glove

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "cache"))
    os.makedirs(os.path.join(root, "glove"))
    with open(os.path.join(root, "cache", "trainval_label2ans.pkl"), "wb") as f:
        pickle.dump(["red", "blue bird", "unknownword"], f)
    for dim in (2, 3):
        with open(os.path.join(root, "glove", f"glove.6B.{dim}d.txt"), "w") as f:
            f.write("red " + " ".join(["1.0"] * dim) + "\n")
            f.write("blue " + " ".join(["2.0"] * dim) + "\n")
            f.write("bird " + " ".join(["3.0"] * dim) + "\n")
    out = create_answer_glove(root, emb_dims=(2, 3))
    emb = np.load(out)
    assert emb.shape == (3, 5)
    np.testing.assert_allclose(emb[0], [1, 1, 1, 1, 1])  # direct hit
    np.testing.assert_allclose(emb[1], [5, 5, 5, 5, 5])  # multi-word sum
    np.testing.assert_allclose(emb[2], 0)  # OOV stays zero


def test_compute_softscore_cli(tmp_path):
    from vqatpu.tools import compute_softscore

    root = str(tmp_path)
    for split in ("train", "val"):
        ann = [{"question_id": i, "image_id": i,
                "multiple_choice_answer": "red",
                "answers": [{"answer": "red"}] * 10} for i in range(6)]
        with open(os.path.join(root, f"v2_mscoco_{split}2014_annotations.json"),
                  "w") as f:
            json.dump({"annotations": ann}, f)
    compute_softscore.main(["--dataroot", root, "--min_occurence", "2"])
    with open(os.path.join(root, "cache", "trainval_ans2label.pkl"), "rb") as f:
        assert pickle.load(f) == {"red": 0}
    with open(os.path.join(root, "cache", "train_target.pkl"), "rb") as f:
        targets = pickle.load(f)
    assert targets[0]["labels"] == [0] and targets[0]["scores"] == [1.0]


def test_create_bert_embedding_with_tiny_model(tmp_path):
    """BERT answer-embedding path (tools/create_bert_embedding.py:7-23)
    end-to-end with a tiny random-init BertModel and a wordpiece-free stub
    tokenizer — no network, real transformers forward."""
    import torch
    from transformers import BertConfig, BertModel

    from vqatpu.data.dictionary import Dictionary
    from vqatpu.tools.create_embedding import create_bert_embedding

    d = Dictionary()
    d.tokenize("what color is the cat", add_word=True)
    d.dump_to_file(str(tmp_path / "dictionary.pkl"))

    torch.manual_seed(0)
    model = BertModel(BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=8))

    class StubTokenizer:
        def tokenize(self, word):
            return list(word)[:4]

        def convert_tokens_to_ids(self, tokens):
            return [ord(t) % 64 for t in tokens]

    out = create_bert_embedding(str(tmp_path), model=model,
                                tokenizer=StubTokenizer())
    weights = np.load(out)
    assert weights.shape == (d.ntoken, 16)
    assert np.abs(weights).sum() > 0  # every vocab word got a real row
    assert np.isfinite(weights).all()
    # deterministic: same model + tokenizer -> identical matrix
    out2 = create_bert_embedding(str(tmp_path), model=model,
                                 tokenizer=StubTokenizer())
    np.testing.assert_array_equal(weights, np.load(out2))
