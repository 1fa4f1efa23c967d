"""Device-resident feature store (data/device_store.py): the gathered
batch must be BIT-IDENTICAL to the host wire path (``wire_cast``) for
every transfer dtype, through ConcatDataset, final-batch padding, the
replicated mesh path, and the row-sharded (shard_map + psum_scatter)
path."""

import numpy as np
import pytest

import jax

from vqatpu.data import BatchLoader, VQAFeatureDataset
from vqatpu.data.datasets import ConcatDataset, VisualGenomeFeatureDataset
from vqatpu.data.device_store import DeviceFeatureStore, devstore_capable
from vqatpu.data.synthetic import add_visualgenome_fixture, make_vqa_fixture
from vqatpu.train.steps import wire_cast


@pytest.fixture(scope="module")
def root_and_dict(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("devstore_vqa"))
    d = make_vqa_fixture(root, n_train=40, n_val=10, n_images=12, v_dim=32)
    return root, d


@pytest.fixture(scope="module")
def dataset(root_and_dict):
    root, d = root_and_dict
    return VQAFeatureDataset("train", d, dataroot=root, max_boxes=16)


def _wire_batches(ds, bs, transfer_dtype, **kw):
    out = []
    for b in BatchLoader(ds, bs, shuffle=False, **kw):
        b.pop("valid", None)
        b.pop("qid", None)
        out.append(wire_cast(b, transfer_dtype))
    return out


def _gathered_batches(ds, bs, store, **kw):
    out = []
    for b in BatchLoader(ds, bs, shuffle=False, fields_only=True, **kw):
        g = store.gather(b["ds_idx"])
        out.append({k: np.asarray(v) for k, v in g.items()})
    return out


def _assert_slabs_equal(wire, dev, dequant_dev=False):
    assert len(wire) == len(dev)
    for wb, db in zip(wire, dev):
        if dequant_dev:
            # quantized-store-under-f32-wire: the host path dequantized in
            # store.get; the device path dequantizes the same q*s product
            v = db["v"].astype(np.float32) * db["v_scale"][..., None]
            np.testing.assert_array_equal(wb["v"], v)
        else:
            assert wb["v"].dtype == db["v"].dtype
            np.testing.assert_array_equal(wb["v"], db["v"])
            if "v_scale" in wb or "v_scale" in db:
                np.testing.assert_array_equal(wb["v_scale"], db["v_scale"])
        assert np.asarray(wb["b"]).dtype == db["b"].dtype
        np.testing.assert_array_equal(np.asarray(wb["b"]), db["b"])
        np.testing.assert_array_equal(wb["v_mask"], db["v_mask"])


@pytest.mark.parametrize("transfer_dtype", ["float32", "float16", "int8"])
def test_gather_matches_wire(dataset, transfer_dtype):
    store = DeviceFeatureStore.build(dataset, transfer_dtype=transfer_dtype)
    wire = _wire_batches(dataset, 8, transfer_dtype, drop_last=True)
    dev = _gathered_batches(dataset, 8, store, drop_last=True)
    _assert_slabs_equal(wire, dev)


def test_quantized_store_int8_wire_bit_equal(root_and_dict):
    """--quantize_store + int8 wire: the int8-resident store uploads
    as-is; quantization idempotence makes it bit-equal to quantizing the
    f32 wire batch."""
    root, d = root_and_dict
    qds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=16,
                            quantize_features=True)
    fds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=16)
    store = DeviceFeatureStore.build(qds, transfer_dtype="int8")
    wire = _wire_batches(fds, 8, "int8", drop_last=True)
    dev = _gathered_batches(qds, 8, store, drop_last=True)
    _assert_slabs_equal(wire, dev)


def test_quantized_store_f32_wire_dequantizes_on_device(root_and_dict):
    root, d = root_and_dict
    qds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=16,
                            quantize_features=True)
    store = DeviceFeatureStore.build(qds, transfer_dtype="float32")
    assert store.feats.dtype == np.int8  # stays int8-resident in HBM
    wire = _wire_batches(qds, 8, "float32", drop_last=True)
    dev = _gathered_batches(qds, 8, store, drop_last=True)
    _assert_slabs_equal(wire, dev, dequant_dev=True)


def test_concat_dataset_shared_store(root_and_dict):
    """train + VisualGenome concat: VG shares the train split's store
    OBJECT — the builder must dedupe it (one table, two entry blocks)."""
    root, d = root_and_dict
    add_visualgenome_fixture(root, n_questions=12)
    train = VQAFeatureDataset("train", d, dataroot=root, max_boxes=16)
    vg = VisualGenomeFeatureDataset("train", train.store, d, dataroot=root,
                                    max_boxes=16)
    both = ConcatDataset([train, vg])
    store = DeviceFeatureStore.build(both, transfer_dtype="int8")
    # deduped: table rows == the single store's box count (+1 sentinel)
    assert store.feats.shape[0] == np.asarray(train.store.features).shape[0] + 1
    wire = _wire_batches(both, 8, "int8", drop_last=True)
    dev = _gathered_batches(both, 8, store, drop_last=True)
    _assert_slabs_equal(wire, dev)


def test_final_batch_padding_gathers_zeros(dataset):
    store = DeviceFeatureStore.build(dataset, transfer_dtype="float32")
    wire = _wire_batches(dataset, 16, "float32")   # 40 samples -> pad 8
    dev = _gathered_batches(dataset, 16, store)
    _assert_slabs_equal(wire, dev)
    assert not dev[-1]["v_mask"][-8:].any()
    assert (dev[-1]["v"][-8:] == 0).all()


def test_capability_gate(dataset):
    ok, _ = devstore_capable(dataset)
    assert ok
    # r4-late: MC rides the store too (tiled-index x4 expansion)
    ok, _ = devstore_capable(dataset, task="mc")
    assert ok
    ok, why = devstore_capable(dataset, task="nope")
    assert not ok and "nope" in why
    ok, why = devstore_capable(object())
    assert not ok


def test_normalize_device_features():
    from vqatpu.data.device_store import normalize_device_features as norm

    assert norm("auto") == norm("AUTO") == "auto"
    assert norm("on") == norm(True) == "on"
    assert norm("off") == norm(False) == norm(None) == "off"
    with pytest.raises(ValueError):
        norm("maybe")


@pytest.mark.parametrize("transfer_dtype", ["float32", "float16", "int8"])
def test_estimate_matches_built_store(dataset, transfer_dtype):
    """estimate_hbm_bytes (pure shape arithmetic, runs before any
    allocation) must track the built store's actual hbm_bytes — the only
    allowed slack is the one all-zero sentinel row build appends."""
    from vqatpu.data.device_store import estimate_hbm_bytes

    est = estimate_hbm_bytes(dataset, transfer_dtype)
    built = DeviceFeatureStore.build(dataset, transfer_dtype=transfer_dtype)
    assert 0 <= built.hbm_bytes - est <= 64 * 1024


def test_devstore_decision_tristate(dataset, root_and_dict, monkeypatch):
    from vqatpu.data.device_store import devstore_decision

    # off: silent no-build
    assert devstore_decision(dataset, "off", "float32") == (False, "")
    assert devstore_decision(dataset, False, "float32") == (False, "")
    # auto: capable + tiny fixture fits any sane budget
    build, why = devstore_decision(dataset, "auto", "float32")
    assert build, why
    # auto: a zero budget declines with an actionable reason
    monkeypatch.setenv("VQATPU_DEVSTORE_BUDGET_MB", "0")
    build, why = devstore_decision(dataset, "auto", "float32")
    assert not build and "budget" in why and "--device_features on" in why
    # ... but an explicit on overrides the budget check
    build, why = devstore_decision(dataset, "on", "float32")
    assert build, why
    monkeypatch.delenv("VQATPU_DEVSTORE_BUDGET_MB")
    # on + incapable dataset: loud reason
    root, d = root_and_dict
    streaming = VQAFeatureDataset("train", d, dataroot=root, max_boxes=16,
                                  features_in_memory=False)
    build, why = devstore_decision(streaming, "on", "float32")
    assert not build and "streaming" in why
    # auto + incapable: declines with the capability reason, no crash
    build, why = devstore_decision(streaming, "auto", "float32")
    assert not build and "streaming" in why


def test_train_default_auto_rides_store(root_and_dict, tmp_path,
                                        monkeypatch):
    """The DEFAULT TrainConfig (device_features='auto') builds the store
    for a capable in-memory dataset — the 20x input-pipeline win is the
    default experience — and auto-declines LOUDLY when the HBM budget
    can't fit the tables."""
    from vqatpu.config import ModelConfig, TrainConfig
    from vqatpu.models import build_model
    from vqatpu.train.loop import train

    root, d = root_and_dict
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=16)
    mcfg = ModelConfig(ntoken=d.ntoken, v_dim=ds.v_dim,
                       num_ans_candidates=ds.num_ans_candidates,
                       model="ban", num_hid=32, gamma=2)
    cfg = TrainConfig(epochs=1, batch_size=8, saving_epoch=99)
    assert cfg.device_features == "auto"
    train(build_model(mcfg), ds, None, cfg, str(tmp_path / "auto_on"),
          use_mesh=False, use_native_loader=False)
    log = (tmp_path / "auto_on" / "log.txt").read_text()
    assert "device feature store:" in log

    monkeypatch.setenv("VQATPU_DEVSTORE_BUDGET_MB", "0")
    train(build_model(mcfg), ds, None, cfg, str(tmp_path / "auto_off"),
          use_mesh=False, use_native_loader=False)
    log = (tmp_path / "auto_off" / "log.txt").read_text()
    assert "device feature store auto-OFF" in log and "budget" in log


@pytest.mark.parametrize("shard", [False, True])
def test_mesh_gather(dataset, shard):
    """8-virtual-device mesh: replicated tables (int8 out) and row-sharded
    tables (f32 out, psum_scatter) both match the wire values."""
    from vqatpu.parallel import make_mesh

    mesh = make_mesh(8)
    store = DeviceFeatureStore.build(dataset, transfer_dtype="int8",
                                     mesh=mesh, shard=shard)
    wire = _wire_batches(dataset, 8, "int8", drop_last=True)
    dev = _gathered_batches(dataset, 8, store, drop_last=True)
    if shard:
        # sharded mode emits dequantized f32 v and f32 b (values equal:
        # dequant is per-row, non-owned contributions are exact zeros)
        for wb, db in zip(wire, dev):
            v = wb["v"].astype(np.float32) * wb["v_scale"][..., None]
            np.testing.assert_array_equal(v, db["v"])
            np.testing.assert_array_equal(
                np.asarray(wb["b"]).astype(np.float32), db["b"])
            np.testing.assert_array_equal(wb["v_mask"], db["v_mask"])
    else:
        _assert_slabs_equal(wire, dev)


@pytest.mark.parametrize("transfer_dtype", ["float32", "int8"])
def test_train_trajectory_bit_equal(root_and_dict, tmp_path, transfer_dtype):
    """train() with --device_features produces the SAME final params as the
    host wire path: batches are bit-identical and the loaders share the
    shuffle RNG, so the trajectories coincide exactly."""
    from vqatpu.config import ModelConfig, TrainConfig
    from vqatpu.models import build_model
    from vqatpu.train.loop import train

    root, d = root_and_dict
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=16)
    mcfg = ModelConfig(ntoken=d.ntoken, v_dim=ds.v_dim,
                       num_ans_candidates=ds.num_ans_candidates,
                       model="cti", num_hid=32, h_mm=16, rank=4, gamma=2)
    model = build_model(mcfg)
    states = {}
    for dev in (False, True):
        cfg = TrainConfig(epochs=2, batch_size=8, update_freq=1,
                          saving_epoch=99, transfer_dtype=transfer_dtype,
                          device_features=dev)
        states[dev] = train(model, ds, None, cfg,
                            str(tmp_path / f"out_{transfer_dtype}_{dev}"),
                            use_mesh=False, use_native_loader=False)
    for a, b in zip(jax.tree.leaves(states[False].params),
                    jax.tree.leaves(states[True].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    log = (tmp_path / f"out_{transfer_dtype}_True" / "log.txt").read_text()
    assert "device feature store:" in log


def test_loud_fallback_when_unsupported(root_and_dict, tmp_path):
    """--device_features with a streaming store must fall back LOUDLY."""
    from vqatpu.config import ModelConfig, TrainConfig
    from vqatpu.models import build_model
    from vqatpu.train.loop import train

    root, d = root_and_dict
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=16,
                           features_in_memory=False)
    mcfg = ModelConfig(ntoken=d.ntoken, v_dim=ds.v_dim,
                       num_ans_candidates=ds.num_ans_candidates,
                       model="ban", num_hid=32, gamma=2)
    cfg = TrainConfig(epochs=1, batch_size=8, saving_epoch=99,
                      device_features=True)
    train(build_model(mcfg), ds, None, cfg, str(tmp_path / "out"),
          use_mesh=False, use_native_loader=False)
    log = (tmp_path / "out" / "log.txt").read_text()
    assert "device feature store OFF" in log


def test_sparse_target_roundtrip(dataset):
    """sparsify_target (host) -> densify_target (device one-hot matmul)
    reproduces the dense target BIT-exactly, including zero-score labels
    and empty targets."""
    from vqatpu.data.batching import max_target_labels, sparsify_target
    from vqatpu.train.steps import densify_target

    k = max_target_labels(dataset)
    n_ans = dataset.num_ans_candidates
    dense, sparse = [], []
    for i in range(12):
        s = dataset.sample_fields(i)
        dense.append(s["target"].copy())
        sparse.append(sparsify_target(dict(s), k))
    batch = {"t_label": np.stack([s["t_label"] for s in sparse]),
             "t_score": np.stack([s["t_score"] for s in sparse])}
    out = densify_target(batch, n_ans)
    assert "t_label" not in out
    np.testing.assert_array_equal(np.asarray(out["target"]),
                                  np.stack(dense))
    # empty target (test-split rows): all-pad -> exact zeros
    empty = densify_target({"t_label": np.zeros((1, k), np.int32),
                            "t_score": np.zeros((1, k), np.float32)}, n_ans)
    assert (np.asarray(empty["target"]) == 0).all()


def test_sparse_vs_dense_devstore_trajectory(root_and_dict, tmp_path):
    """sparse_targets on/off through train() with the device store: same
    final params (the one-hot densify is bit-exact)."""
    from vqatpu.config import ModelConfig, TrainConfig
    from vqatpu.models import build_model
    from vqatpu.train.loop import train

    root, d = root_and_dict
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=16)
    mcfg = ModelConfig(ntoken=d.ntoken, v_dim=ds.v_dim,
                       num_ans_candidates=ds.num_ans_candidates,
                       model="ban", num_hid=32, gamma=2)
    model = build_model(mcfg)
    states = {}
    for sparse in (False, True):
        cfg = TrainConfig(epochs=1, batch_size=8, saving_epoch=99,
                          device_features=True, sparse_targets=sparse)
        states[sparse] = train(model, ds, None, cfg,
                               str(tmp_path / f"sp_{sparse}"),
                               use_mesh=False, use_native_loader=False)
    for a, b in zip(jax.tree.leaves(states[False].params),
                    jax.tree.leaves(states[True].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_matches_wire(root_and_dict):
    """get_logits / evaluate with the device store == the wire path,
    including the padded (non-divisible) final eval batch."""
    from vqatpu.config import ModelConfig
    from vqatpu.data.batching import make_eval_loader
    from vqatpu.eval.ffoe import evaluate, get_logits
    from vqatpu.models import build_model

    root, d = root_and_dict
    ds = VQAFeatureDataset("val", d, dataroot=root, max_boxes=16)
    mcfg = ModelConfig(ntoken=d.ntoken, v_dim=ds.v_dim,
                       num_ans_candidates=ds.num_ans_candidates,
                       model="ban", num_hid=32, gamma=2)
    model = build_model(mcfg)
    params = model.init(jax.random.PRNGKey(3))
    store = DeviceFeatureStore.build(ds, transfer_dtype="float32")
    wire_loader = make_eval_loader(ds, 8, use_native=False)
    dev_loader = make_eval_loader(ds, 8, fields_only=True)
    lw, qw = get_logits(model, params, wire_loader)
    ld, qd = get_logits(model, params, dev_loader, dev_store=store)
    np.testing.assert_array_equal(qw, qd)
    np.testing.assert_array_equal(lw, ld)
    sw = evaluate(model, params, wire_loader)
    sd = evaluate(model, params, dev_loader, dev_store=store)
    assert sw == sd


def test_train_with_eval_devstore(root_and_dict, tmp_path):
    from vqatpu.config import ModelConfig, TrainConfig
    from vqatpu.models import build_model
    from vqatpu.train.loop import train

    root, d = root_and_dict
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=16)
    val = VQAFeatureDataset("val", d, dataroot=root, max_boxes=16)
    mcfg = ModelConfig(ntoken=d.ntoken, v_dim=ds.v_dim,
                       num_ans_candidates=ds.num_ans_candidates,
                       model="ban", num_hid=32, gamma=2)
    cfg = TrainConfig(epochs=1, batch_size=8, saving_epoch=99,
                      device_features=True)
    train(build_model(mcfg), ds, val, cfg, str(tmp_path / "out"),
          use_mesh=True, num_devices=1, use_native_loader=False)
    log = (tmp_path / "out" / "log.txt").read_text()
    assert "eval device feature store:" in log
    assert "eval score:" in log


def test_sharded_gather_2d_mesh(dataset):
    """Sharded tables on the 2-D (data x model) TP mesh: tables shard over
    ``data`` only, replicate over ``model``; values still match."""
    from vqatpu.parallel import make_mesh_2d

    mesh = make_mesh_2d(4, 2)
    store = DeviceFeatureStore.build(dataset, transfer_dtype="float32",
                                     mesh=mesh, shard=True)
    wire = _wire_batches(dataset, 8, "float32", drop_last=True)
    dev = _gathered_batches(dataset, 8, store, drop_last=True)
    _assert_slabs_equal(wire, dev)


def test_sharded_table_padding_rows_unreferenced(dataset):
    from vqatpu.parallel import make_mesh

    mesh = make_mesh(8)
    store = DeviceFeatureStore.build(dataset, transfer_dtype="float32",
                                     mesh=mesh, shard=True)
    assert store.feats.shape[0] % 8 == 0
    assert (store.rows_table < store.sentinel + 1).all()


# -- MC task (V7W): x4 candidate expansion tiles ds_idx, the gather does
# -- the expansion on device (mc_dataset.expand_mc_batch) ------------------


@pytest.fixture(scope="module")
def v7w(tmp_path_factory):
    from vqatpu.data.mc_dataset import V7WDataset
    from vqatpu.data.synthetic import make_v7w_fixture

    root = str(tmp_path_factory.mktemp("devstore_v7w"))
    d = make_v7w_fixture(root, n_train=24, n_val=8, n_images=6, v_dim=16)
    return root, d


def _mc_model(ds):
    from vqatpu.config import ModelConfig
    from vqatpu.models import build_model

    return build_model(ModelConfig(
        ntoken=ds.dictionary.ntoken, v_dim=ds.v_dim,
        num_ans_candidates=ds.num_ans_candidates, model="ban", task="mc",
        num_hid=32, gamma=2))


def test_mc_expanded_gather_matches_tiled_wire(v7w):
    """gather(tile(ds_idx)) == tile(wire slabs) bit-for-bit — the device
    expansion IS the gather of repeated row indices."""
    from vqatpu.data.mc_dataset import V7WDataset, expand_mc_batch

    root, d = v7w
    ds = V7WDataset("train", d, dataroot=root, max_boxes=12)
    store = DeviceFeatureStore.build(ds, transfer_dtype="float32")
    wire = iter(BatchLoader(ds, 8, shuffle=False))
    for fb in BatchLoader(ds, 8, shuffle=False, fields_only=True):
        wb = next(wire)
        wb.pop("valid", None)
        fb.pop("valid", None)
        exw = expand_mc_batch(wb)
        exf = expand_mc_batch(fb)
        assert "v" not in exf and exf["ds_idx"].shape[0] == exw["v"].shape[0]
        g = store.gather(exf["ds_idx"])
        np.testing.assert_array_equal(exw["v"], np.asarray(g["v"]))
        np.testing.assert_array_equal(exw["b"], np.asarray(g["b"]))
        np.testing.assert_array_equal(exw["v_mask"], np.asarray(g["v_mask"]))
        np.testing.assert_array_equal(exw["q"], exf["q"])
        np.testing.assert_array_equal(exw["target"], exf["target"])


def test_mc_eval_matches_wire(v7w):
    """evaluate_mc with the device store == the wire path (bit-equal
    logits -> equal accuracy), including the padded final batch."""
    from vqatpu.data.batching import make_eval_loader
    from vqatpu.data.mc_dataset import V7WDataset
    from vqatpu.eval import evaluate_mc

    root, d = v7w
    ds = V7WDataset("val", d, dataroot=root, max_boxes=12)
    model = _mc_model(ds)
    params = model.init(jax.random.PRNGKey(5))
    store = DeviceFeatureStore.build(ds, transfer_dtype="float32")
    accw, _ = evaluate_mc(model, params,
                          make_eval_loader(ds, 8, use_native=False))
    accd, _ = evaluate_mc(model, params,
                          make_eval_loader(ds, 8, fields_only=True),
                          dev_store=store)
    assert accw == accd


def test_mc_train_devstore_trajectory(v7w, tmp_path):
    """train(task='mc') with --device_features: same final params as the
    wire path (the tiled-index gather is bit-identical to host tiling)."""
    from vqatpu.config import TrainConfig
    from vqatpu.data.mc_dataset import V7WDataset
    from vqatpu.train.loop import train

    root, d = v7w
    ds = V7WDataset("train", d, dataroot=root, max_boxes=12)
    val = V7WDataset("val", d, dataroot=root, max_boxes=12)
    model = _mc_model(ds)
    states = {}
    for dev in (False, True):
        cfg = TrainConfig(epochs=1, batch_size=8, saving_epoch=99,
                          device_features=dev)
        states[dev] = train(model, ds, val, cfg,
                            str(tmp_path / f"mc_{dev}"), task="mc",
                            use_mesh=False, use_native_loader=False)
    log = (tmp_path / "mc_True" / "log.txt").read_text()
    assert "device feature store:" in log
    assert "eval device feature store:" in log
    for a, b in zip(jax.tree.leaves(states[False].params),
                    jax.tree.leaves(states[True].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
