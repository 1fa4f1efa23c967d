"""Data layer: dictionary tokenization parity, synthetic fixtures, static
batching, MC candidate expansion."""

import numpy as np
import pytest

from vqatpu.data import (
    BatchLoader,
    Dictionary,
    TDIUCFeatureDataset,
    V7WDataset,
    VQAFeatureDataset,
    expand_mc_batch,
)
from vqatpu.data.synthetic import make_tdiuc_fixture, make_v7w_fixture, make_vqa_fixture


def test_dictionary_tokenize_rules():
    d = Dictionary()
    ids = d.tokenize("What's the cat, doing?", add_word=True)
    # lowercase, comma/qmark stripped, 's split
    assert d.idx2word == ["what", "'s", "the", "cat", "doing"]
    assert ids == [0, 1, 2, 3, 4]
    # unknown word maps to padding_idx - 1
    assert d.tokenize("zebra")[0] == d.padding_idx - 1


def test_dictionary_roundtrip(tmp_path):
    d = Dictionary()
    d.tokenize("red blue green", add_word=True)
    p = str(tmp_path / "dict.pkl")
    d.dump_to_file(p)
    d2 = Dictionary.load_from_file(p)
    assert d2.word2idx == d.word2idx and d2.idx2word == d.idx2word


def test_tokenize_padded_truncates_and_pads():
    d = Dictionary()
    d.tokenize("a b c d e", add_word=True)
    toks = d.tokenize_padded("a b c d e", 3)
    assert len(toks) == 3
    toks = d.tokenize_padded("a b", 5)
    assert toks[2:] == [d.padding_idx] * 3  # pad at END


@pytest.fixture(scope="module")
def vqa_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data_vqa"))
    d = make_vqa_fixture(root, with_teacher_logits=True)
    return root, d


def test_vqa_dataset_shapes(vqa_root):
    root, d = vqa_root
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=15,
                           distillation=True)
    assert len(ds) == 64
    s = ds.sample(0)
    assert s["v"].shape == (15, ds.v_dim)
    assert s["b"].shape == (15, 6)
    assert s["q"].shape == (12,)
    assert s["a"].shape == (3,)
    assert s["target"].shape == (ds.num_ans_candidates,)
    assert s["t_logits"].shape == (ds.num_ans_candidates,)
    # padded box rows are zero exactly where mask is False
    assert np.all(s["v"][~s["v_mask"]] == 0)
    assert np.any(s["v"][s["v_mask"]] != 0)
    # at least 10 real boxes (adaptive min)
    assert s["v_mask"].sum() >= 10
    # target scatter: scores land on label positions
    e = ds.entries[0]
    for lbl, sc in zip(e["answer"]["labels"], e["answer"]["scores"]):
        assert s["target"][lbl] == np.float32(sc)


def test_vqa_entries_sorted_and_aligned(vqa_root):
    root, d = vqa_root
    ds = VQAFeatureDataset("val", d, dataroot=root)
    qids = [e["question_id"] for e in ds.entries]
    assert qids == sorted(qids)
    # CTI answer stream: argmax answer string tokenized to len 3
    assert all(e["ans"] in ([""] + ds.label2ans) for e in ds.entries)


def test_batch_loader_static_shapes(vqa_root):
    root, d = vqa_root
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=15,
                           distillation=False)
    loader = BatchLoader(ds, batch_size=10, shuffle=True)
    batches = list(loader)
    assert len(batches) == 7  # 64 / 10 -> 6 full + 1 padded partial
    for b in batches:
        assert b["v"].shape == (10, 15, ds.v_dim)  # static across batches
    assert b["valid"].sum() == 4  # final partial: 64 - 60
    total_valid = sum(int(x["valid"].sum()) for x in batches)
    assert total_valid == 64
    # shuffling changes order between epochs
    b1 = next(iter(loader))
    assert not np.array_equal(batches[0]["qid"], b1["qid"])


def test_tdiuc_dataset(tmp_path):
    root = str(tmp_path / "tdiuc")
    d = make_tdiuc_fixture(root)
    ds = TDIUCFeatureDataset("val", d, dataroot=root, max_boxes=15)
    s = ds.sample(3)
    assert s["target"].sum() == 1.0  # TDIUC: single hard label
    assert np.all(s["a"] == d.padding_idx)  # no answer stream


def test_v7w_dataset_and_expansion(tmp_path):
    root = str(tmp_path / "v7w")
    d = make_v7w_fixture(root)
    ds = V7WDataset("train", d, dataroot=root, max_boxes=15)
    s = ds.sample(0)
    assert s["ans_mc"].shape == (4, 6)
    assert s["label"].sum() == 1.0

    loader = BatchLoader(ds, batch_size=8, drop_last=True)
    batch = next(iter(loader))
    ex = expand_mc_batch(batch)
    assert ex["v"].shape == (32, 15, ds.v_dim)
    assert ex["q"].shape == (32, 12)
    assert ex["a"].shape == (32, 6)
    assert ex["target"].shape == (32, 2)
    # rows of each 4-group share v and q
    np.testing.assert_array_equal(ex["v"][0], ex["v"][3])
    np.testing.assert_array_equal(ex["q"][4], ex["q"][7])
    # exactly one positive candidate per group
    pos = ex["target"][:, 0].reshape(8, 4).sum(1)
    np.testing.assert_array_equal(pos, np.ones(8))
    # [a, 1-a] structure
    np.testing.assert_allclose(ex["target"].sum(1), np.ones(32))

    # quantize_features on the MC dataset: int8-resident store, samples
    # dequantize to the quantize_v roundtrip of the f32 samples; the int8
    # wire's v_scale tiles through the x4 expansion alongside its v
    from vqatpu.train.steps import quantize_v, wire_cast

    dq = V7WDataset("train", d, dataroot=root, max_boxes=15,
                    quantize_features=True)
    assert dq.store.quantized
    a, b = ds.sample(0), dq.sample(0)
    q, s = quantize_v(a["v"])
    np.testing.assert_array_equal(b["v"], q.astype(np.float32)
                                  * s[..., None])
    wired = wire_cast(dict(batch), "int8")
    exw = expand_mc_batch(wired)
    assert exw["v"].dtype == np.int8 and exw["v_scale"].shape == (32, 15)
    np.testing.assert_array_equal(exw["v_scale"][0], exw["v_scale"][3])


def test_streaming_feature_store(vqa_root):
    """features_in_memory=False streams per-image HDF5 slices; every sample
    must be bit-equal to the resident path (FFOE/dataset.py:282-287 reads
    the whole file — the streaming mode is the low-RAM alternative)."""
    root, d = vqa_root
    ds_mem = VQAFeatureDataset("train", d, dataroot=root, max_boxes=15)
    ds_str = VQAFeatureDataset("train", d, dataroot=root, max_boxes=15,
                               features_in_memory=False)
    assert ds_mem.store.in_memory and not ds_str.store.in_memory
    assert ds_str.v_dim == ds_mem.v_dim
    for i in (0, 5, len(ds_mem) - 1):
        a, b = ds_mem.sample(i), ds_str.sample(i)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    mat = ds_str.store.materialize()
    assert mat.in_memory
    np.testing.assert_array_equal(np.asarray(mat.features),
                                  np.asarray(ds_mem.store.features))
    ds_str.store.close()
    assert ds_str.store.in_memory  # closed => no live h5 handle


def test_quantized_store_roundtrip(vqa_root):
    """quantize_features=True keeps the resident features int8: every
    sample's v must be exactly dequantize(quantize_v(f32 v)), b/mask
    untouched — and re-quantizing the dequantized rows must recover the
    resident (q, scale) BIT-FOR-BIT (idempotency: the int8 wire ships the
    same bytes whether the store is quantized or not)."""
    from vqatpu.train.steps import quantize_v

    root, d = vqa_root
    ds_f = VQAFeatureDataset("train", d, dataroot=root, max_boxes=15)
    ds_q = VQAFeatureDataset("train", d, dataroot=root, max_boxes=15,
                             quantize_features=True)
    assert ds_q.store.quantized and ds_q.store.features.dtype == np.int8
    assert not ds_f.store.quantized
    # 4x smaller resident features (+ scales at ~0.05%)
    assert ds_q.store.features.nbytes * 4 == ds_f.store.features.nbytes
    for i in (0, 3, len(ds_f) - 1):
        a, b = ds_f.sample(i), ds_q.sample(i)
        q, s = quantize_v(a["v"])
        np.testing.assert_array_equal(b["v"], q.astype(np.float32)
                                      * s[..., None])
        for k in ("b", "v_mask", "q", "a", "target"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        # idempotency — bit-exact (the absmax element maps to ±127)
        q2, s2 = quantize_v(b["v"])
        np.testing.assert_array_equal(q2, q)
        np.testing.assert_array_equal(s2, s)
    # the chunked HDF5 load equals quantize() of the f32 resident store,
    # including with a chunk size that forces many partial reads
    st = ds_f.store.quantize()
    np.testing.assert_array_equal(st.features, ds_q.store.features)
    np.testing.assert_array_equal(st.feat_scales, ds_q.store.feat_scales)
    import glob
    import os

    from vqatpu.data.features import FeatureStore
    h5 = glob.glob(os.path.join(root, "train.hdf5"))[0]
    tiny = FeatureStore.from_hdf5(h5, quantize=True,
                                  quantize_chunk_bytes=4096)
    np.testing.assert_array_equal(tiny.features, st.features)
    np.testing.assert_array_equal(tiny.feat_scales, st.feat_scales)


def test_zero_array_standin():
    """Lazy zero spatials for the V7W grid path under streaming stores."""
    from vqatpu.data.features import ZeroArray

    z = ZeroArray((4, 3, 5))
    assert z.shape == (4, 3, 5) and z.dtype == np.float32
    assert z[1].shape == (3, 5) and not z[1].any()
    assert z[1:3].shape == (2, 3, 5) and not z[1:3].any()
    with pytest.raises(TypeError):
        z[[0, 1]]
    # np.asarray path (FeatureStore.materialize, native registration):
    # a real zeros block, not a 0-d object scalar (r3 code-review finding)
    dense = np.asarray(z)
    assert dense.shape == (4, 3, 5) and dense.dtype == np.float32
    assert not dense.any()


def test_streaming_store_skips_native_loader(vqa_root):
    """The C++ loader needs resident numpy pointers; a streaming store must
    fall back to the Python BatchLoader instead of slurping the HDF5."""
    from types import SimpleNamespace

    from vqatpu.train.loop import _make_loader

    root, d = vqa_root
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=15,
                           features_in_memory=False)
    cfg = SimpleNamespace(batch_size=8, seed=0)
    loader = _make_loader(ds, cfg, use_native=True)
    from vqatpu.data import PrefetchLoader
    assert type(loader) is PrefetchLoader  # python fallback, prefetch-wrapped
    assert type(loader.inner) is BatchLoader
    batch = next(iter(loader))
    assert batch["v"].shape == (8, 15, ds.v_dim)
    ds.store.close()


def test_prefetch_loader_order_and_errors(vqa_root):
    """PrefetchLoader must yield the exact same batch sequence as the bare
    loader (multi-host lockstep contract) and surface worker exceptions."""
    from vqatpu.data import PrefetchLoader

    root, d = vqa_root
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=15)
    a = BatchLoader(ds, 8, shuffle=True, seed=7, drop_last=True)
    b = PrefetchLoader(BatchLoader(ds, 8, shuffle=True, seed=7,
                                   drop_last=True), depth=2)
    assert len(a) == len(b) and b.num_samples == a.num_samples
    for _ in range(2):  # RNG state advances identically across epochs
        batches_a, batches_b = list(a), list(b)
        assert len(batches_a) == len(batches_b)
        for ba, bb in zip(batches_a, batches_b):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)

    class _Boom:
        def __iter__(self):
            yield {"x": np.zeros(1)}
            raise RuntimeError("worker failed")

    it = iter(PrefetchLoader(_Boom()))
    next(it)
    with pytest.raises(RuntimeError, match="worker failed"):
        next(it)


def test_visualgenome_augmentation(vqa_root):
    from vqatpu.data import ConcatDataset, VisualGenomeFeatureDataset
    from vqatpu.data.synthetic import add_visualgenome_fixture

    root, d = vqa_root
    add_visualgenome_fixture(root)
    base = VQAFeatureDataset("train", d, dataroot=root, max_boxes=15)
    vg = VisualGenomeFeatureDataset("train", base.store, d, dataroot=root,
                                    max_boxes=15,
                                    img_id2idx=base.img_id2idx)
    assert len(vg) > 0
    s = vg.sample(0)
    assert s["v"].shape == (15, base.v_dim)
    assert s["target"].sum() == 1.0  # single hard label, score 1.0
    # entry cache written for reuse
    import os
    assert os.path.exists(os.path.join(root, "cache", "vg_train_adaptive_target.pkl"))

    both = ConcatDataset([base, vg])
    assert len(both) == len(base) + len(vg)
    # indices past the base dataset resolve into VG
    s2 = both.sample(len(base))
    np.testing.assert_array_equal(s2["q"], vg.sample(0)["q"])


def test_mode_product_and_fcstl(rng):
    import jax
    import jax.numpy as jnp
    from vqatpu.ops import FCSTL, mode_product

    core = jnp.asarray(rng.randn(1, 4, 5, 6, 2).astype(np.float32))
    m1 = jnp.asarray(rng.randn(3, 7, 4).astype(np.float32))
    m2 = jnp.asarray(rng.randn(3, 8, 5).astype(np.float32))
    m3 = jnp.asarray(rng.randn(3, 9, 6).astype(np.float32))
    out = mode_product(core, m1, m2, m3)
    want = np.einsum("bix,bjy,blz,oxyzw->bijlw", m1, m2, m3, core)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)

    stl = FCSTL(6, 4)
    p = stl.init(jax.random.PRNGKey(0))
    y = stl.apply(p, jnp.ones((2, 6)))
    assert y.shape == (2, 4)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh-bounded


def test_tfidf_from_questions_math(tmp_path):
    """Row-stochastic co-occurrence mix: rows sum to 1, df weighting favors
    rarer co-occurring words, extended vocab rows mix base GloVe rows."""
    import json
    import os
    from vqatpu.data.tfidf import tfidf_from_questions

    root = str(tmp_path)
    d = Dictionary()
    d.tokenize("what color is", add_word=True)  # base vocab: 3 words
    n_base = d.ntoken
    qs = {"questions": [
        {"question": "what color is the cat?"},
        {"question": "what color is the dog?"},
        {"question": "what is blue?"},
    ]}
    with open(os.path.join(root, "v2_OpenEnded_mscoco_train2014_questions.json"), "w") as f:
        json.dump(qs, f)
    tfidf, weights = tfidf_from_questions(
        ["train"], d, dataroot=root, target=("vqa",))
    # dictionary extended with the/cat/dog/blue
    assert d.ntoken > n_base
    # rows are stochastic
    for r, cols in tfidf.rows.items():
        assert abs(sum(cols.values()) - 1.0) < 1e-6
    # only base-vocab rows exist (inds gated on c < N at build time)
    assert all(r < n_base for r in tfidf.rows)
    # matmul against a dense basis mixes rows convexly
    basis = np.eye(d.ntoken, 4, dtype=np.float32)
    mixed = tfidf.matmul_dense(basis)
    assert mixed.shape[0] == max(tfidf.rows) + 1
    # 'what' co-occurs with everything; its row must be a strict mix
    what_row = tfidf.rows[d.word2idx["what"]]
    assert len(what_row) >= 4
    # rarer words (df=1, e.g. 'blue') get more weight than common ones
    blue = what_row[d.word2idx["blue"]]
    color = what_row[d.word2idx["color"]]
    assert blue > 0 and color > 0
    # 'color' has df=2 (two questions) vs 'blue' df=1, and 'color'
    # co-occurs with 'what' twice: contributions 2*(1/2) vs 1*(1/1) tie
    np.testing.assert_allclose(blue, color, rtol=1e-6)


class _CacheWE:
    """Module-level so torch.save can pickle it; deleted before load to
    simulate the reference's unimportable module classes."""

    _cls = None

    @staticmethod
    def build():
        import torch.nn as nn

        class CacheWE(nn.Module):
            def __init__(self):
                super().__init__()
                self.emb = nn.Embedding(7, 4)
                self.emb_ = nn.Embedding(7, 4)

        _CacheWE._cls = CacheWE
        return CacheWE()


def test_tfidf_cache_reads_torch_module_format(tmp_path):
    """Drop-in dataroot compat: the reference caches embed_tfidf_weights.pkl
    as a torch.save of the whole WordEmbedding module (utils.py:398-401);
    its module classes are never importable here, so loading goes through
    the stub unpickler."""
    import sys
    import torch
    from vqatpu.data.tfidf import _read_embedding_cache

    we = _CacheWE.build()
    # expose the class where pickle can find it at SAVE time...
    mod = sys.modules[__name__]
    mod.CacheWE = _CacheWE._cls
    _CacheWE._cls.__qualname__ = "CacheWE"
    _CacheWE._cls.__module__ = __name__
    path = str(tmp_path / "embed_tfidf_weights.pkl")
    with open(path, "wb") as f:
        torch.save(we, f)
    # ...then remove it so LOAD must use the stub fallback (the real case)
    del mod.CacheWE
    out = _read_embedding_cache(path)
    assert out is not None
    np.testing.assert_allclose(out["emb"], we.emb.weight.detach().numpy())
    np.testing.assert_allclose(out["emb_"], we.emb_.weight.detach().numpy())

    # our own plain-pickle format still reads
    import pickle
    ours = str(tmp_path / "ours.pkl")
    with open(ours, "wb") as f:
        pickle.dump({"emb": np.ones((3, 2)), "emb_": np.zeros((3, 2))}, f)
    out2 = _read_embedding_cache(ours)
    np.testing.assert_array_equal(out2["emb"], np.ones((3, 2)))

    # garbage -> None (caller recomputes)
    bad = str(tmp_path / "bad.pkl")
    with open(bad, "wb") as f:
        f.write(b"not a pickle")
    assert _read_embedding_cache(bad) is None


def test_tfidf_scale_vqa2_sized(tmp_path):
    """VQA-2.0-scale build + mix completes in seconds (the reference gets
    this from torch.sparse.mm, dataset.py:170-189): 20k vocab, 500k
    questions, millions of nonzeros."""
    import time
    from vqatpu.data.tfidf import _build_row_stochastic

    rs = np.random.RandomState(0)
    n_vocab, n_q = 20_000, 500_000
    lens = rs.randint(4, 13, n_q)
    flat = rs.zipf(1.3, lens.sum()).clip(max=n_vocab - 1).astype(np.int64)

    t0 = time.time()
    tfidf = _build_row_stochastic(flat, lens, n_base=n_vocab // 2,
                                  n_vocab=n_vocab)
    dense = rs.randn(n_vocab, 300).astype(np.float32)
    mixed = tfidf.matmul_dense(dense)
    elapsed = time.time() - t0

    assert tfidf.row.size > 1_000_000  # genuinely at scale
    assert mixed.shape == (tfidf.shape[0], 300)
    # rows are stochastic
    rowsum = np.bincount(tfidf.row, weights=tfidf.val)
    present = np.bincount(tfidf.row).astype(bool)
    np.testing.assert_allclose(rowsum[present], 1.0, rtol=1e-9)
    # ~10s uncontended on the 1-core host (in-place int32 key sort); the
    # bound is generous because the suite shares that core — it exists to
    # catch a regression to the O(minutes) python-dict/np.unique builds.
    assert elapsed < 90.0, f"tf-idf scale build took {elapsed:.1f}s"


def test_tfidf_large_vocab_key_dtype():
    """When n_base * n_vocab exceeds int32, the packed-key coalesce must
    switch to int64 — same math as the small-vocab path."""
    from vqatpu.data.tfidf import _build_row_stochastic

    n_vocab = 50_000  # 50k * 50k > 2^31 -> int64 keys
    flat = np.asarray([5, 49_999, 5, 7, 49_999, 7], np.int64)
    lens = np.asarray([3, 3], np.int64)
    t = _build_row_stochastic(flat, lens, n_base=n_vocab, n_vocab=n_vocab)
    rows = t.rows
    # question 1: tokens (5, 49999, 5) -> pairs (5,49999)x2 (directed both
    # ways), (5,5); df[5]=2? no: df counts all occurrences -> df[5]=2,
    # df[7]=2, df[49999]=2
    np.testing.assert_allclose(sum(rows[5].values()), 1.0, rtol=1e-9)
    np.testing.assert_allclose(sum(rows[49_999].values()), 1.0, rtol=1e-9)
    assert 49_999 in rows[5] and 5 in rows[5]  # self-pair from duplicate


def test_sample_fields_matches_sample(vqa_root):
    """sample_fields (the native loader's store-free precompute path) must
    equal sample() minus the feature slabs, for both FFOE and MC datasets."""
    from vqatpu.data.synthetic import make_v7w_fixture

    root, d = vqa_root
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=15,
                           distillation=True)
    for i in (0, 7):
        want = {k: v for k, v in ds.sample(i).items()
                if k not in ("v", "b", "v_mask")}
        got = ds.sample_fields(i)
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
