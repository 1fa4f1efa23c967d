"""Native C++ batch-assembly runtime vs the pure-Python path."""

import numpy as np
import pytest

from vqatpu.data import BatchLoader, VQAFeatureDataset
from vqatpu.data.synthetic import make_vqa_fixture

native = pytest.importorskip("vqatpu.data.native")

if not native.available():  # toolchain missing
    pytest.skip("libvqadata.so could not be built", allow_module_level=True)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native_vqa"))
    d = make_vqa_fixture(root, n_train=40, n_val=8, n_images=12, v_dim=32)
    return VQAFeatureDataset("train", d, dataroot=root, max_boxes=16)


def test_native_assemble_matches_python(dataset):
    store = native.NativeFeatureStore(dataset.store)
    idx = np.asarray([e["image"] for e in dataset.entries[:10]], np.int64)
    v, b, mask = store.assemble(idx, max_boxes=16)
    for i, image in enumerate(idx):
        pv, pb, pm = dataset.store.get(int(image), 16)
        np.testing.assert_array_equal(v[i], pv)
        np.testing.assert_array_equal(b[i], pb)
        np.testing.assert_array_equal(mask[i], pm)


def test_native_loader_matches_python_loader(dataset):
    py = BatchLoader(dataset, batch_size=16, shuffle=False)
    nat = native.NativeBatchLoader(dataset, batch_size=16, shuffle=False)
    try:
        for pb, nb in zip(py, nat):
            assert set(pb) == set(nb)
            for k in pb:
                np.testing.assert_array_equal(pb[k], nb[k], err_msg=k)
    finally:
        nat.close()


def test_native_loader_shuffles_and_cycles(dataset):
    nat = native.NativeBatchLoader(dataset, batch_size=8, shuffle=True,
                                   drop_last=True)
    try:
        epoch1 = [b["qid"].copy() for b in nat]
        epoch2 = [b["qid"].copy() for b in nat]
        assert len(epoch1) == len(dataset) // 8
        # different order across epochs, same multiset of qids
        flat1 = np.concatenate(epoch1)
        flat2 = np.concatenate(epoch2)
        assert not np.array_equal(flat1, flat2)
        np.testing.assert_array_equal(np.sort(flat1), np.sort(flat2))
    finally:
        nat.close()
